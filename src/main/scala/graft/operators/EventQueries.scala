package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Event-time analytics: tumbling/sliding windows, sessionization, funnels, cohort retention, as-of joins, anomaly/seasonality/attribution.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object EventQueries {

  val all: Seq[Q] = Seq(

    Q("q25_events_hourly",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("event_hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          // decimal-exact sum; DOUBLE only at the output boundary (the
          // driver's pandas comparator str-normalizes cells, and decimal
          // trailing zeros don't survive that channel — see ParityQueries)
          sum(col("value").cast(Money)).cast(Money).cast("double")
            .as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_hour", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS event_hour, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
             |       AS DOUBLE) AS sum_value,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sliding event-time window (1h window, 30m slide) — the batch
    // equivalent of the Structured Streaming windowed aggregation
    // (graft.streaming.EventStreams). Spark's window() starts are
    // epoch-aligned; the oracle reproduces them with epoch arithmetic.

    Q("q26_events_sliding",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"))
        .orderBy("window_start", "event_type"),
      Some("""WITH b AS (
             |  SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
             |           * 1000000) AS bucket, event_type
             |  FROM events
             |), w AS (
             |  SELECT bucket + (t.i * INTERVAL 30 MINUTE) AS window_start,
             |         event_type
             |  FROM b CROSS JOIN (VALUES (0), (-1)) t(i)
             |)
             |SELECT window_start, event_type,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q34_sessions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_s", lag(col("ts").cast("long"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_s").isNull ||
              col("ts").cast("long") - col("prev_s") > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("new_session").as("n_sessions"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             |         LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             |           PARTITION BY user_id
             |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_s
             |  FROM events
             |), f AS (
             |  SELECT user_id,
             |         CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM e
             |)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(new_session) AS BIGINT) AS n_sessions
             |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Term frequency with deterministic top-k (count desc, token asc) —
    // the explode/unnest + LIMIT surface.

    Q("q43_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val snapshots = ev
          .groupBy(col("user_id"),
            date_trunc("day", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("snap_events"))
        AsOf.asofJoinExec(
          ev.select("event_id", "user_id", "ts"),
          snapshots, keys = Seq("user_id"),
          leftTime = "ts", rightTime = "snap_ts",
          valueCols = Seq("snap_ts", "snap_events"))
          .select(col("event_id"), col("user_id"), col("snap_ts"),
            col("snap_events"))
          .orderBy("event_id")
      },
      Some("""WITH snapshots AS (
             |  SELECT user_id, date_trunc('day', ts) AS snap_ts,
             |         CAST(COUNT(*) AS BIGINT) AS snap_events
             |  FROM events GROUP BY 1, 2
             |)
             |SELECT e.event_id, e.user_id,
             |       CAST(s.snap_ts AS TIMESTAMP) AS snap_ts, s.snap_events
             |FROM events e
             |ASOF LEFT JOIN snapshots s
             |  ON e.user_id = s.user_id AND e.ts >= s.snap_ts
             |ORDER BY e.event_id""".stripMargin)),

    // (q49_chunk_fingerprints, the JVM-hash chunking variant, retired
    // with q29/q30 above — q74_chunk_fnv_portable is the canonical
    // oracled formulation; the kernel stays pinned by FunctionsSpec +
    // RollingHashSpec + Round10Spec.)

    // Multi-level aggregation: ROLLUP over (status, product bucket) with
    // NULLS FIRST ordering aligned across engines.

    Q("q58_recent_pairs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val win = 600L
        val a = ev.select(col("user_id"), col("event_id").as("id_a"),
            col("ts").as("ts_a"))
          .withColumn("epoch", floor(col("ts_a").cast("long") / win))
        val b = ev.select(col("user_id"), col("event_id").as("id_b"),
            col("ts").as("ts_b"))
          .withColumn("e0", floor(col("ts_b").cast("long") / win))
          .withColumn("epoch", explode(array(col("e0"), col("e0") + 1)))
          .drop("e0")
        a.join(b, Seq("user_id", "epoch"))
          .filter(col("ts_b") >= col("ts_a") - expr("INTERVAL 600 SECONDS")
            && col("ts_b") < col("ts_a"))
          .select("user_id", "id_a", "id_b")
          .orderBy("user_id", "id_a", "id_b")
      },
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |WHERE b.ts >= a.ts - INTERVAL 600 SECONDS AND b.ts < a.ts
             |ORDER BY a.user_id, id_a, id_b""".stripMargin)),

    // Semi-structured props column: JSON field extraction + aggregation.

    Q("q33_events_props",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
          max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |       CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Gopher-style repetition metrics, entirely map-side via the native
    // one-pass census kernel (RepetitionStats; the sort+run-length HOF
    // twin is cross-checked in FunctionsSpec). The oracle uses the naive
    // explode → GROUP BY formulation — same values, different plan.

    Q("q87_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val counts = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
          .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
          .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
        val base = s1.agg(count(lit(1)).as("n1"))
        counts.crossJoin(broadcast(base))
          .select(col("stage"), col("n"),
            floor(col("n") * lit(10000) / col("n1")).cast("long")
              .as("conv_bp"))
          .orderBy("stage")
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id
             |), s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2
             |  FROM events e JOIN s1 ON s1.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t1
             |  GROUP BY e.user_id
             |), s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t3
             |  FROM events e JOIN s2 ON s2.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             |  GROUP BY e.user_id
             |), counts AS (
             |  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM s1
             |  UNION ALL
             |  SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s2
             |  UNION ALL
             |  SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
             |), base AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM s1
             |)
             |SELECT stage, n,
             |       CAST(floor(n * 10000 / n1) AS BIGINT) AS conv_bp
             |FROM counts CROSS JOIN base ORDER BY stage""".stripMargin)),

    // Weekly cohort retention: cohort = Monday-truncated week of the
    // user's first event; the activity matrix counts distinct users per
    // (cohort, week offset); retention in exact basis points off the
    // cohort size. Two user-grain aggregations + one (cohort, offset)
    // aggregation — all integer/date-exact arithmetic.

    Q("q88_cohort_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val first = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
        val active = ev.select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
          .join(first, Seq("user_id"))
          .select(col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast("int")
              .as("week_offset"))
        val sizes = first.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_size"))
        active.groupBy(col("cohort"), col("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), Seq("cohort"))
          .select(col("cohort"), col("week_offset"), col("n_active"),
            col("cohort_size"),
            floor(col("n_active") * lit(10000) / col("cohort_size"))
              .cast("long").as("retention_bp"))
          .orderBy("cohort", "week_offset")
      },
      Some("""WITH first AS (
             |  SELECT user_id,
             |         CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
             |  FROM events GROUP BY user_id
             |), act AS (
             |  SELECT DISTINCT user_id,
             |         CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events
             |), active AS (
             |  SELECT f.cohort,
             |         CAST(date_diff('day', f.cohort, a.wk) // 7
             |           AS INTEGER) AS week_offset
             |  FROM act a JOIN first f ON f.user_id = a.user_id
             |), sizes AS (
             |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
             |  FROM first GROUP BY cohort
             |)
             |SELECT v.cohort, v.week_offset,
             |       CAST(COUNT(*) AS BIGINT) AS n_active, s.cohort_size,
             |       CAST(floor(COUNT(*) * 10000 / s.cohort_size)
             |         AS BIGINT) AS retention_bp
             |FROM active v JOIN sizes s ON s.cohort = v.cohort
             |GROUP BY v.cohort, v.week_offset, s.cohort_size
             |ORDER BY v.cohort, v.week_offset""".stripMargin)),

    // Quality-aware cluster representative: real curation keeps the
    // BEST-quality member of each near-dup cluster, not the smallest
    // id — argmax by (alpha_bp, n_words, id) over the memoized cluster
    // table joined with the quality census. The oracle recomputes
    // clusters via the recursive walk and quality via the q72 CTEs.

    Q("q103_range_join",
      (s, dir) => {
        // Range-join aggregate WITHOUT materializing point-interval
        // pairs. The query only needs per-order window TOTALS (count,
        // sum_qty over a 14-day shipdate window), so decompose:
        //
        //   pairs(o)  = windowTotal(o) − selfMatches(o)     (incl–excl)
        //
        // windowTotal comes from a day-grain prefix sum: lineitem is
        // pre-aggregated per l_shipdate (calendar-bounded — a few
        // thousand rows at ANY data scale), cumulated over a dense
        // calendar, and each order does two O(1) broadcast-hash lookups
        // (cum[d+13] − cum[d−1]). selfMatches (the l_orderkey =
        // o_orderkey exclusion) is a plain shuffled equi-join on
        // orderkey. Total cost is linear in |orders| + |lineitem| with
        // no pair materialization — r13 measured the pair-building
        // RangeJoin variant at 30.9× for 10× data (127 s at sf1); this
        // plan is the scale path. RangeJoin.pointInInterval remains the
        // library operator for queries that need the pair ROWS.
        import org.apache.spark.sql.expressions.Window
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48)
          .select(col("l_orderkey"), col("l_shipdate").cast("date").as("d"),
            col("l_quantity").cast("long").as("qty"))
        val ords = Tables.load(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))

        // Day-grain census of qualifying lineitems (calendar-bounded).
        val day = li.groupBy(col("d"))
          .agg(count(lit(1)).as("day_cnt"), sum(col("qty")).as("day_qty"))
        // Dense calendar spanning every lookup target: [min ship − 1,
        // max(ship, order window end)] so cum[d−1] and cum[d+13] always
        // hit a row (left edge carries cum = 0 via the fill below).
        val bounds = day
          .select(date_sub(col("d"), 1).as("lo"), col("d").as("hi"))
          .unionByName(ords.select(date_sub(col("od"), 1).as("lo"),
            date_add(col("od"), 13).as("hi")))
          .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"))
        val cal = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
        // Unpartitioned window over the CALENDAR, not the data — and the
        // calendar-bounded contract is runtime-enforced, not comment-
        // enforced: 40k rows ≈ a century of days, so any drift that
        // makes this frame data-sized (e.g. a sub-day grain) fails fast
        // instead of funnelling the corpus through one task.
        val byDay = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // STANDING: the dense-calendar frame (≤40k rows) memoizes per
        // (session, dir) — its upstream is the day-grain lineitem
        // aggregation, the expensive pass of this query
        val calDays = graft.sources.Standing.frame(s, dir,
          "q103-dense-calendar") {
          graft.functions.Bounded.globalWindowFrame(
            cal.join(day, Seq("d"), "left")
              .na.fill(0L, Seq("day_cnt", "day_qty")),
            maxRows = 40000,
            contract = "q103 day-grain prefix sum: frame = dense calendar")
        }
        val prefix = calDays
          .select(col("d"),
            sum(col("day_cnt")).over(byDay).as("cum_cnt"),
            sum(col("day_qty")).over(byDay).as("cum_qty"))

        // Self-matches per order (the `l_orderkey <> o_orderkey`
        // exclusion): shuffled equi-join on orderkey, window re-check.
        val selfM = ords.join(li, col("o_orderkey") === col("l_orderkey"))
          .filter(col("d").between(col("od"), date_add(col("od"), 13)))
          .groupBy(col("o_orderkey").as("sk"))
          .agg(count(lit(1)).as("self_cnt"), sum(col("qty")).as("self_qty"))

        val hiP = prefix.select(col("d").as("hd"),
          col("cum_cnt").as("hi_cnt"), col("cum_qty").as("hi_qty"))
        val loP = prefix.select(col("d").as("ld"),
          col("cum_cnt").as("lo_cnt"), col("cum_qty").as("lo_qty"))
        ords
          .join(broadcast(hiP), date_add(col("od"), 13) === col("hd"))
          .join(broadcast(loP), date_sub(col("od"), 1) === col("ld"))
          .join(selfM, col("o_orderkey") === col("sk"), "left")
          .na.fill(0L, Seq("self_cnt", "self_qty"))
          .select(col("o_orderkey"), col("od"),
            (col("hi_cnt") - col("lo_cnt") - col("self_cnt")).as("pairs"),
            (col("hi_qty") - col("lo_qty") - col("self_qty")).as("pqty"))
          .filter(col("pairs") > 0)
          .groupBy(date_trunc("month", col("od")).as("month"))
          .agg(sum(col("pairs")).as("n_pairs"),
            count(lit(1)).as("n_orders"),
            sum(col("pqty")).as("sum_qty"))
          .orderBy("month")
      },
      Some("""SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
             |         AS month,
             |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT)
             |         AS n_orders,
             |       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
             |         AS sum_qty
             |FROM orders o JOIN lineitem l
             |  ON CAST(l.l_shipdate AS DATE)
             |       BETWEEN CAST(o.o_orderdate AS DATE)
             |           AND CAST(o.o_orderdate AS DATE) + INTERVAL 13 DAY
             | AND l.l_orderkey <> o.o_orderkey
             |WHERE year(o.o_orderdate) = 1997 AND l.l_quantity >= 48
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Fuzzy self-join over part names: q-gram blocking + count filter +
    // levenshtein verify (the filter-verification shape) — the oracle is
    // the full n² cross join the blocking provably equals (every name is
    // ≥ q·(d+1) chars, so the count-filter completeness bound applies).

    Q("q108_sliding_windows",
      (s, dir) => Mixing.slidingWindows(
          Tables.load(s, dir, "documents"), window = 32, stride = 24)
        .orderBy("doc_id", "win_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         CASE WHEN length(trim(text)) = 0
             |              THEN CAST([] AS VARCHAR[])
             |              ELSE string_split_regex(trim(text), '\s+')
             |         END AS w
             |  FROM documents
             |), st AS (
             |  SELECT doc_id, w,
             |         unnest(generate_series(0,
             |           ((len(w) - 1) // 24) * 24, 24)) AS s
             |  FROM d WHERE len(w) > 0
             |)
             |SELECT doc_id, CAST(s // 24 AS BIGINT) AS win_id,
             |       CAST(s AS BIGINT) AS start_tok,
             |       CAST(least(32, len(w) - s) AS BIGINT)
             |         AS n_win_tokens,
             |       array_to_string(w[s + 1 : s + 32], ' ')
             |         AS window_text
             |FROM st ORDER BY doc_id, win_id""".stripMargin)),

    // Containment-scored pairs (asymmetric near-dup / quote detection):
    // |A∩B|/|A| in basis points, both directions, over the SAME banded-
    // LSH candidates as q44 — Jaccard misses a short doc embedded in a
    // long one (big union); one-sided containment is the signal that
    // catches it. The oracle reuses the near-dup CTE chain (cand/shc/
    // inter) with the containment denominators.

    Q("q169_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val snapshots = ev
          .groupBy(col("user_id"),
            date_trunc("day", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("snap_events"))
        AsOf.asofJoinTolerant(
          ev.select("event_id", "user_id", "ts"),
          snapshots, keys = Seq("user_id"),
          leftTime = "ts", rightTime = "snap_ts",
          valueCols = Seq("snap_ts", "snap_events"),
          tolerance = "12 HOURS")
          .select(col("event_id"), col("user_id"), col("snap_ts"),
            col("snap_events"))
          .orderBy("event_id")
      },
      Some("""WITH snapshots AS (
             |  SELECT user_id, date_trunc('day', ts) AS snap_ts,
             |         CAST(COUNT(*) AS BIGINT) AS snap_events
             |  FROM events GROUP BY 1, 2
             |), j AS (
             |  SELECT e.event_id, e.user_id, e.ts,
             |         CAST(s.snap_ts AS TIMESTAMP) AS snap_ts,
             |         s.snap_events
             |  FROM events e
             |  ASOF LEFT JOIN snapshots s
             |    ON e.user_id = s.user_id AND e.ts >= s.snap_ts
             |)
             |SELECT event_id, user_id,
             |       CASE WHEN snap_ts >= ts - INTERVAL 12 HOUR
             |            THEN snap_ts ELSE NULL END AS snap_ts,
             |       CASE WHEN snap_ts >= ts - INTERVAL 12 HOUR
             |            THEN snap_events ELSE NULL END AS snap_events
             |FROM j ORDER BY event_id""".stripMargin)),

    // Corpus data card: the per-source summary a dataset release ships
    // (datasheets/data-statements practice) — volume, token mass, size
    // distribution, language mix, census-quality pass rate, and the
    // exact-duplicate rate (docs sharing a fingerprint with ANY doc in
    // the corpus, the cross-source leak measure). One census pass +
    // one fingerprint aggregation + one per-source rollup; every
    // metric an exact integer.

    Q("q183_event_anomalies",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("c"))
        val tw = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(-24, -1)
        hourly
          // one select = the three same-frame folds fuse into ONE
          // WindowExec pass (the q252 rule)
          .select(col("event_type"), col("hr"), col("c"),
            count(col("c")).over(tw).as("nw"),
            coalesce(sum(col("c")).over(tw), lit(0L)).as("s"),
            coalesce(sum(col("c") * col("c")).over(tw), lit(0L))
              .as("q"))
          .select(col("event_type"), col("hr"), col("c"), col("nw"),
            ((col("c") * col("nw") - col("s"))
              * (col("c") * col("nw") - col("s"))).as("dev2"),
            (lit(9L) * (col("nw") * col("q") - col("s") * col("s")))
              .as("bound"))
          .withColumn("is_anomaly",
            col("nw") >= 12 && col("dev2") > col("bound"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH h AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hr,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2
             |), w AS (
             |  SELECT event_type, hr, c,
             |         CAST(COUNT(c) OVER tw AS BIGINT) AS nw,
             |         CAST(COALESCE(SUM(c) OVER tw, 0) AS BIGINT) AS s,
             |         CAST(COALESCE(SUM(c * c) OVER tw, 0) AS BIGINT)
             |           AS q
             |  FROM h WINDOW tw AS (PARTITION BY event_type
             |    ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
             |)
             |SELECT event_type, CAST(hr AS TIMESTAMP) AS hr, c, nw,
             |       CAST((c * nw - s) * (c * nw - s) AS BIGINT)
             |         AS dev2,
             |       CAST(9 * (nw * q - s * s) AS BIGINT) AS bound,
             |       nw >= 12 AND (c * nw - s) * (c * nw - s)
             |         > 9 * (nw * q - s * s) AS is_anomaly
             |FROM w ORDER BY event_type, hr""".stripMargin)),

    // Embedding-distribution drift: two embedding populations compare
    // per PROJECTED dimension — the q155 Rademacher projection folds
    // 64-d vectors to 8 exact-integer coordinates map-side, and q121's
    // factored-integer PSI runs per dimension (psiDriftByGroup), so a
    // shift confined to one direction isn't averaged away. The high-d
    // drift monitor with nothing high-d ever shuffled.

    Q("q191_event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, dir)
          .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("from_type").isNotNull)
          .select(col("from_type"), col("event_type").as("to_type"))
        val counts = trans.groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy("from_type")
          .agg(sum(col("n")).as("from_total"))
        counts.join(totals, Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            col("from_total"),
            expr("n * 1000000 div from_total").as("p_micro"))
          .orderBy("from_type", "to_type")
      },
      Some(transitionCtes +
        """SELECT from_type, to_type, n, from_total,
          |       CAST(n * 1000000 // from_total AS BIGINT) AS p_micro
          |FROM model ORDER BY from_type, to_type""".stripMargin)),

    // Behavioral anomaly scores: each user's event stream scored under
    // the corpus transition model (Σ ln P(to|from), floored micro-nats
    // — the q83 LM discipline on events instead of text). Users whose
    // behavior the fleet's model finds improbable surface at the
    // bottom of avg_micro.

    Q("q192_behavior_scores",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, dir)
          .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("from_type").isNotNull)
          .select(col("user_id"), col("from_type"),
            col("event_type").as("to_type"))
        val counts = trans.groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        val model = counts.join(
            counts.groupBy("from_type")
              .agg(sum(col("n")).as("from_total")),
            Seq("from_type"))
          .select(col("from_type"), col("to_type"),
            floor(log(col("n").cast("double")
              / col("from_total").cast("double")) * 1e6)
              .cast("long").as("lp_micro"))
        trans.join(broadcast(model), Seq("from_type", "to_type"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_trans"),
            sum(col("lp_micro")).as("score_micro"))
          .withColumn("avg_micro",
            expr("score_micro div n_trans"))
          .orderBy("user_id")
      },
      Some(transitionCtes +
        """, scored AS (
          |  SELECT t.user_id,
          |         CAST(floor(ln(CAST(m.n AS DOUBLE)
          |           / CAST(m.from_total AS DOUBLE)) * 1000000.0)
          |           AS BIGINT) AS lp_micro
          |  FROM trans t JOIN model m
          |    ON m.from_type = t.from_type AND m.to_type = t.to_type
          |)
          |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
          |       CAST(SUM(lp_micro) AS BIGINT) AS score_micro,
          |       CAST(SUM(lp_micro) // COUNT(*) AS BIGINT)
          |         AS avg_micro
          |FROM scored GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // KWIC snippet extraction (search-result highlighting): for each
    // query's top-3 BM25 docs, the 10-token span with the most
    // query-term hits, earliest-start tiebreak — the argmax is one
    // map-side array_max over (hits, −start) structs; the oracle
    // re-derives every window's hit count and the tie rule.

    Q("q198_interarrival_sla",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byType = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byType))
          .filter(col("prev_ts").isNotNull)
          .select(col("event_type"),
            (unix_timestamp(col("ts"))
              - unix_timestamp(col("prev_ts"))).as("gap_s"))
        Sketches.percentilesByValue(gaps, "event_type", "gap_s",
            Seq(50, 95, 99))
          .orderBy("event_type")
      },
      Some("""WITH g0 AS (
             |  SELECT event_type, ts,
             |         LAG(ts) OVER (PARTITION BY event_type
             |           ORDER BY ts, event_id) AS prev_ts
             |  FROM events
             |), g AS (
             |  SELECT event_type,
             |         CAST(date_diff('second', prev_ts, ts) AS BIGINT)
             |           AS v
             |  FROM g0 WHERE prev_ts IS NOT NULL
             |), c AS (
             |  SELECT event_type, v, COUNT(*) AS cnt
             |  FROM g GROUP BY 1, 2
             |), cum AS (
             |  SELECT event_type, v,
             |         SUM(cnt) OVER (PARTITION BY event_type
             |           ORDER BY v) AS cum,
             |         SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM c
             |)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             |       CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
             |         THEN v END) AS BIGINT) AS p50,
             |       CAST(MIN(CASE WHEN cum >= (n * 95 + 99) // 100
             |         THEN v END) AS BIGINT) AS p95,
             |       CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100
             |         THEN v END) AS BIGINT) AS p99
             |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Near-dup cluster-size distribution: how much of the corpus sits
    // in how-big duplicate families (the release-notes figure behind
    // the q63 dedup rate) — size histogram over the memoized cluster
    // table, singletons included.

    Q("q201_seasonal_baseline",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("c"))
          .withColumn("h24", hour(col("hr")).cast("long"))
        val baseline = hourly.groupBy("event_type", "h24")
          .agg(expr("sum(c) * 1000 div count(1)").as("baseline_milli"))
        hourly.join(baseline, Seq("event_type", "h24"))
          .select(col("event_type"), col("hr"), col("h24"), col("c"),
            col("baseline_milli"),
            expr("(c * 1000 - baseline_milli) * 10000 " +
              "div baseline_milli").as("dev_bp"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH h AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hr,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2
             |), hh AS (
             |  SELECT event_type, hr, c,
             |         CAST(hour(hr) AS BIGINT) AS h24
             |  FROM h
             |), bl AS (
             |  SELECT event_type, h24,
             |         CAST(SUM(c) * 1000 // COUNT(*) AS BIGINT)
             |           AS baseline_milli
             |  FROM hh GROUP BY 1, 2
             |)
             |SELECT hh.event_type, CAST(hh.hr AS TIMESTAMP) AS hr,
             |       hh.h24, hh.c, bl.baseline_milli,
             |       CAST((hh.c * 1000 - bl.baseline_milli) * 10000
             |         // bl.baseline_milli AS BIGINT) AS dev_bp
             |FROM hh JOIN bl ON bl.event_type = hh.event_type
             |  AND bl.h24 = hh.h24
             |ORDER BY hh.event_type, hh.hr""".stripMargin)),

    // Theil-Sen robust trend (Sen 1968): per event type, the MEDIAN of
    // all pairwise daily-count slopes — the trend estimate a single
    // outlier day cannot drag (unlike least squares). Slopes in exact
    // milli-counts/day; the median via the q111 histogram rule. The
    // pairwise stage is per-GROUP quadratic in the number of DAYS — a
    // bounded time-series domain, never row-count — the same
    // bounded-group contract as the radix quantiles.

    Q("q202_theil_sen_trend",
      (s, dir) => {
        // x-axis is EPOCH DAY, not dayofmonth: day-of-month merges the
        // same calendar slot across months (Jan 3 + Feb 3) and breaks
        // slope spacing on multi-month data; epoch day keeps the
        // (b.d - a.d) arithmetic exact-integer at the true daily grain
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01"))
              .cast("long").as("d"))
          .agg(count(lit(1)).as("c"))
        val slopes = daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            expr("((b.c - a.c) * 1000) div (b.d - a.d)")
              .as("slope_milli"))
        Sketches.percentilesByValue(slopes, "event_type",
            "slope_milli", Seq(50))
          .select(col("event_type"), col("n").as("n_pairs"),
            col("p50").as("slope_milli_p50"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         CAST(date_diff('day', DATE '1970-01-01',
             |           CAST(ts AS DATE)) AS BIGINT) AS d,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2
             |), sl AS (
             |  SELECT a.event_type,
             |         CAST((b.c - a.c) * 1000 // (b.d - a.d)
             |           AS BIGINT) AS v
             |  FROM daily a JOIN daily b
             |    ON b.event_type = a.event_type AND a.d < b.d
             |), cc AS (
             |  SELECT event_type, v, COUNT(*) AS cnt
             |  FROM sl GROUP BY 1, 2
             |), cum AS (
             |  SELECT event_type, v,
             |         SUM(cnt) OVER (PARTITION BY event_type
             |           ORDER BY v) AS cum,
             |         SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM cc
             |)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
             |       CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
             |         THEN v END) AS BIGINT) AS slope_milli_p50
             |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Graded retrieval evaluation (TREC metrics): MRR and binary NDCG@10
    // of the BM25 ranking against the q176 id-derived labels — the
    // measurement layer that closes the retrieval loop. MRR is the
    // exact rational 10^6 div first_rank; DCG/IDCG terms quantize to
    // micro BEFORE the sum (float sums are addition-order-dependent)
    // with log2 spelled ln(x)/ln(2) in both engines.

    Q("q208_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lookback = 7L * 86400L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"))
          .rangeBetween(-lookback, -1L)
        val touch = when(
          col("event_type") === "click" || col("event_type") === "view",
          struct(col("ts_s"), col("event_id"), col("event_type")))
        val attributed = Tables.events(s, dir)
          .withColumn("ts_s", col("ts").cast("long"))
          // one select = both extrema fuse into ONE WindowExec pass
          // (the q252 rule)
          .select(col("event_type"),
            min(touch).over(w).as("first_t"),
            max(touch).over(w).as("last_t"))
          .filter(col("event_type") === "purchase")
        def model(name: String, c: org.apache.spark.sql.Column) =
          attributed
            .select(coalesce(c.getField("event_type"), lit("none"))
              .as("touch_type"))
            .groupBy("touch_type")
            .agg(count(lit(1)).as("n_conv"))
            .select(lit(name).as("model"), col("touch_type"),
              col("n_conv"))
        model("first_touch", col("first_t"))
          .unionByName(model("last_touch", col("last_t")))
          .orderBy("model", "touch_type")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
             |  FROM events
             |), p AS (
             |  SELECT user_id, event_id, ts_s FROM e
             |  WHERE event_type = 'purchase'
             |), ft AS (
             |  SELECT p.event_id,
             |         (SELECT t.event_type FROM e t
             |          WHERE t.user_id = p.user_id
             |            AND t.event_type IN ('click', 'view')
             |            AND t.ts_s >= p.ts_s - 604800
             |            AND t.ts_s <= p.ts_s - 1
             |          ORDER BY t.ts_s, t.event_id LIMIT 1) AS first_type,
             |         (SELECT t.event_type FROM e t
             |          WHERE t.user_id = p.user_id
             |            AND t.event_type IN ('click', 'view')
             |            AND t.ts_s >= p.ts_s - 604800
             |            AND t.ts_s <= p.ts_s - 1
             |          ORDER BY t.ts_s DESC, t.event_id DESC LIMIT 1)
             |           AS last_type
             |  FROM p
             |)
             |SELECT model, touch_type, CAST(COUNT(*) AS BIGINT) AS n_conv
             |FROM (
             |  SELECT 'first_touch' AS model,
             |         COALESCE(first_type, 'none') AS touch_type FROM ft
             |  UNION ALL
             |  SELECT 'last_touch', COALESCE(last_type, 'none') FROM ft
             |)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Embedding-cluster quality report (the quantizer-retraining
    // signal): per IVF cell — size, cohesion (mean member-to-own-
    // centroid cosine, exact micro-units via sum-then-div), separation
    // (own centroid's highest cosine to any OTHER centroid), and the
    // Davies-Bouldin-flavoured ratio separation/cohesion in bp (lower =
    // tighter, better-isolated cell). Centroid table is cells-sized
    // (broadcast); members aggregate map-side per cell; the centroid
    // pairwise pass is cells² — trivial at any corpus size.

    Q("q211_decayed_engagement",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_s", col("ts").cast("long"))
        val nowRow = broadcast(ev.agg(max(col("ts_s")).as("now_s")))
        val weight = typedLit(Map("purchase" -> 5L, "signup" -> 3L,
          "click" -> 1L, "view" -> 1L, "error" -> 0L))
        ev.crossJoin(nowRow)
          .withColumn("halflives",
            expr("least((now_s - ts_s) DIV 604800, 40)"))
          .withColumn("w", coalesce(weight(col("event_type")), lit(0L)))
          .withColumn("decayed_micro",
            expr("w * shiftright(CAST(1000000 AS BIGINT)," +
              " CAST(halflives AS INT))"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("decayed_micro")).as("engagement_micro"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
             |  FROM events
             |), nw AS (
             |  SELECT MAX(ts_s) AS now_s FROM e
             |), d AS (
             |  SELECT e.user_id,
             |         CASE e.event_type WHEN 'purchase' THEN 5
             |           WHEN 'signup' THEN 3 WHEN 'click' THEN 1
             |           WHEN 'view' THEN 1 ELSE 0 END
             |         * (CAST(1000000 AS BIGINT) >> CAST(least(
             |             (nw.now_s - e.ts_s) // 604800, 40) AS INT))
             |           AS decayed_micro
             |  FROM e CROSS JOIN nw
             |)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(decayed_micro) AS BIGINT) AS engagement_micro
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sequence-length bucket / padding-waste report (the batch-inference
    // twin of q65's training-side packing): docs bucket to the next
    // power-of-two token length (pure INTEGER log2 via binary-string
    // length — no float log near exact powers), each bucket reports doc
    // count, real token mass, padded mass and waste bp — the table that
    // decides bucket boundaries for padded batching (high waste ⇒ add a
    // bucket; the packing-vs-padding tradeoff made measurable). One
    // map-side bucket expression + one aggregate.

    Q("q221_event_burstiness",
      (s, dir) => {
        // calendar-day grain (date_trunc, the q178/q202 rule):
        // dayofmonth would merge Jan 3 with Feb 3 into one bucket and
        // understate dispersion on multi-month event data
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(col("c")).as("total"),
            sum(col("c").cast("decimal(19,0)") * col("c"))
              .as("s2"))
          .select(col("event_type"), col("n_days"), col("total"),
            expr("CAST(((CAST(n_days AS DECIMAL(38,0)) * s2" +
              " - CAST(total AS DECIMAL(38,0)) * total) * 1000000)" +
              " DIV (CAST(n_days AS DECIMAL(38,0)) * total)" +
              " AS BIGINT)").as("dispersion_micro"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, date_trunc('day', ts) AS d,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2
             |), st AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             |         CAST(SUM(c) AS BIGINT) AS total,
             |         SUM(CAST(c AS HUGEINT) * c) AS s2
             |  FROM daily GROUP BY 1
             |)
             |SELECT event_type, n_days, total,
             |       CAST(((CAST(n_days AS HUGEINT) * s2
             |         - CAST(total AS HUGEINT) * total) * 1000000)
             |         // (CAST(n_days AS HUGEINT) * total)
             |         AS BIGINT) AS dispersion_micro
             |FROM st ORDER BY event_type""".stripMargin)),

    // Token-mass concentration per source (Gini coefficient of the
    // doc-length distribution): ≈0 when every doc contributes equally,
    // →1e6 micro when a few giant docs carry the mass — the signal
    // that a source's token count is really three megadocs and a tail
    // of stubs. Exact integers end-to-end via the sorted-rank closed
    // form G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) (ranks ordered
    // (length, doc_id) so ties are deterministic in both engines);
    // rank-weighted sums accumulate in DECIMAL/HUGEINT. Volume: one
    // rank window per source (the q217 shape) + a sources-sized
    // rollup; empty-mass sources report -1, never a silent 0 (the
    // q178 zero-denominator rule).

    Q("q224_hourly_entropy",
      (s, dir) => {
        val hc = Tables.events(s, dir)
          .groupBy(col("event_type"),
            hour(col("ts")).cast("long").as("h24"))
          .agg(count(lit(1)).as("ni"))
          .localCheckpoint()
        val tot = hc.groupBy("event_type")
          .agg(sum(col("ni")).as("n"),
            count(lit(1)).as("n_hours"),
            max(col("ni")).as("peak"))
        hc.join(tot, Seq("event_type"))
          .withColumn("term_micro",
            floor((lit(1000000L) * col("ni"))
              * log(col("n").cast("double") / col("ni"))
              / col("n")))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_events"),
            max(col("n_hours")).as("n_hours"),
            sum(col("term_micro")).as("entropy_micro"),
            expr("max(peak) * 10000 div max(n)").as("peak_bp"))
          .orderBy("event_type")
      },
      Some("""WITH hc AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h24,
             |         CAST(COUNT(*) AS BIGINT) AS ni
             |  FROM events GROUP BY 1, 2
             |), tot AS (
             |  SELECT event_type, CAST(SUM(ni) AS BIGINT) AS n,
             |         CAST(COUNT(*) AS BIGINT) AS n_hours,
             |         CAST(MAX(ni) AS BIGINT) AS peak
             |  FROM hc GROUP BY 1
             |)
             |SELECT h.event_type, MAX(t.n) AS n_events,
             |       MAX(t.n_hours) AS n_hours,
             |       CAST(SUM(CAST(FLOOR((1000000 * h.ni)
             |         * ln(CAST(t.n AS DOUBLE) / h.ni)
             |         / t.n) AS BIGINT)) AS BIGINT) AS entropy_micro,
             |       CAST(MAX(t.peak) * 10000 // MAX(t.n) AS BIGINT)
             |         AS peak_bp
             |FROM hc h JOIN tot t USING (event_type)
             |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin)),

    // PII density BY SOURCE — the governance rollup of the q149
    // scanner (same regex dialect, same synthetic enrichment so the
    // oracle carries real match traffic): per source, match counts by
    // kind, documents carrying any PII, and that as bp of the
    // source's corpus — the table a takedown/compliance pass is
    // prioritized from. Map-side regexp_count per doc (the q149
    // kernel), one bounded source-grain aggregate; no text ever
    // shuffles.

    Q("q252_attribution_windows",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val touch = when(
          col("event_type") === "click" || col("event_type") === "view",
          struct(col("ts_s"), col("event_id"), col("event_type")))
        val lbs = Seq(1L, 3L, 7L)
        def w(d: Long) = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s")).rangeBetween(-d * 86400L, -1L)
        // ONE select carrying all six window expressions: Spark fuses
        // them (same partitioning/ordering, frames differ) into ONE
        // WindowExec — a single pass over one (user) shuffle
        // (withColumn folds would wall each expression into its own
        // Project and yield six passes; Round12Spec pins this shape)
        val withCols = Tables.events(s, dir)
          .withColumn("ts_s", col("ts").cast("long"))
          .select(col("event_type") +: lbs.flatMap(d => Seq(
            min(touch).over(w(d)).as(s"f$d"),
            max(touch).over(w(d)).as(s"l$d"))): _*)
          .filter(col("event_type") === "purchase")
          .localCheckpoint() // six bounded rollups read it
        def model(lb: Long, name: String,
                  c: Column): org.apache.spark.sql.DataFrame =
          withCols.select(
              coalesce(c.getField("event_type"), lit("none"))
                .as("touch_type"))
            .groupBy("touch_type")
            .agg(count(lit(1)).as("n_conv"))
            .select(lit(lb).as("lookback_days"), lit(name).as("model"),
              col("touch_type"), col("n_conv"))
        lbs.flatMap(d => Seq(model(d, "first_touch", col(s"f$d")),
            model(d, "last_touch", col(s"l$d"))))
          .reduce(_ unionByName _)
          .orderBy("lookback_days", "model", "touch_type")
      },
      Some {
        val arms = Seq(1, 3, 7).map { d =>
          val sec = d * 86400
          s"""ft$d AS (
             |  SELECT p.event_id,
             |         (SELECT t.event_type FROM e t
             |          WHERE t.user_id = p.user_id
             |            AND t.event_type IN ('click', 'view')
             |            AND t.ts_s >= p.ts_s - $sec
             |            AND t.ts_s <= p.ts_s - 1
             |          ORDER BY t.ts_s, t.event_id LIMIT 1)
             |           AS first_type,
             |         (SELECT t.event_type FROM e t
             |          WHERE t.user_id = p.user_id
             |            AND t.event_type IN ('click', 'view')
             |            AND t.ts_s >= p.ts_s - $sec
             |            AND t.ts_s <= p.ts_s - 1
             |          ORDER BY t.ts_s DESC, t.event_id DESC LIMIT 1)
             |           AS last_type
             |  FROM p
             |)""".stripMargin
        }.mkString(", ", ", ", "")
        val union = Seq(1, 3, 7).map { d =>
          s"""  SELECT CAST($d AS BIGINT) AS lookback_days,
             |         'first_touch' AS model,
             |         COALESCE(first_type, 'none') AS touch_type
             |  FROM ft$d
             |  UNION ALL
             |  SELECT CAST($d AS BIGINT), 'last_touch',
             |         COALESCE(last_type, 'none')
             |  FROM ft$d""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""WITH e AS (
           |  SELECT user_id, event_id, event_type,
           |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
           |  FROM events
           |), p AS (
           |  SELECT user_id, event_id, ts_s FROM e
           |  WHERE event_type = 'purchase'
           |)$arms
           |SELECT lookback_days, model, touch_type,
           |       CAST(COUNT(*) AS BIGINT) AS n_conv
           |FROM (
           |$union
           |)
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      }),

    // Sequence-length profile by source — exact p10/p50/p90 of per-doc
    // token counts per source via the q111 sort-free histogram rule
    // (the (source × length-domain) histogram is bounded by the longest
    // document, never by row count): the table that sets per-source
    // packing budgets and length-bucket boundaries next to q212's
    // global padding-waste card.

    Q("q259_props_profile",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("k").isNotNull, 1L).otherwise(0L))
            .as("n_with_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .select(col("event_type"), col("n_events"), col("n_with_k"),
          expr("n_with_k * 10000 div n_events").as("fill_bp"),
          col("min_k"), col("max_k"), col("sum_k"),
          col("n_distinct_k"))
        .orderBy("event_type"),
      Some("""WITH x AS (
             |  SELECT event_type,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT)
             |           AS k
             |  FROM events
             |)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_with_k,
             |       CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
             |         * 10000 // COUNT(*) AS BIGINT) AS fill_bp,
             |       MIN(k) AS min_k, MAX(k) AS max_k,
             |       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k,
             |       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
             |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Embedding norm audit — the vector-quality card: histogram of L2
    // norms in deci-units over the whole embedding table (zero/near-
    // zero buckets = dead encoder outputs, a fat high tail = unscaled
    // features; cosine pipelines silently absorb both). One map-side
    // kernel dot per vector (the sequential fold both engines replay
    // identically — the q28 discipline), one bounded histogram
    // aggregate; vectors never shuffle.

    Q("q267_session_funnel",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        val sess = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            col("ts").cast("long").as("t"))
          .withColumn("brk",
            when(col("t") - lag(col("t"), 1).over(w) > 1800 ||
              lag(col("t"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("sid", sum("brk").over(
            w.rowsBetween(Long.MinValue, 0)))
        val per = sess.groupBy("user_id", "sid")
          .agg(min(when(col("event_type") === "view", col("t")))
              .as("tv"),
            min(when(col("event_type") === "click", col("t")))
              .as("tc"),
            min(when(col("event_type") === "purchase", col("t")))
              .as("tp"))
        per.agg(count(lit(1)).as("n_sessions"),
            sum(when(col("tv").isNotNull, 1L).otherwise(0L))
              .as("n_view"),
            sum(when(col("tv").isNotNull && col("tc") > col("tv"), 1L)
              .otherwise(0L)).as("n_view_click"),
            sum(when(col("tv").isNotNull && col("tc") > col("tv") &&
              col("tp") > col("tc"), 1L).otherwise(0L))
              .as("n_full_funnel"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS t
             |  FROM events
             |), m AS (
             |  SELECT user_id, event_type, t,
             |         CASE WHEN lag(t) OVER w IS NULL
             |              OR t - lag(t) OVER w > 1800
             |           THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
             |), sx AS (
             |  SELECT user_id, event_type, t,
             |         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
             |           ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m
             |), per AS (
             |  SELECT user_id, sid,
             |         MIN(CASE WHEN event_type = 'view' THEN t END)
             |           AS tv,
             |         MIN(CASE WHEN event_type = 'click' THEN t END)
             |           AS tc,
             |         MIN(CASE WHEN event_type = 'purchase' THEN t END)
             |           AS tp
             |  FROM sx GROUP BY 1, 2
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
             |       CAST(SUM(CASE WHEN tv IS NOT NULL
             |         THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |       CAST(SUM(CASE WHEN tv IS NOT NULL AND tc > tv
             |         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
             |       CAST(SUM(CASE WHEN tv IS NOT NULL AND tc > tv
             |         AND tp > tc THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_full_funnel
             |FROM per""".stripMargin)),

    // Deterministic holdout (A/B) lift card: users split into two arms
    // by the portable md5 hash of their id (the q64 stratified-split
    // discipline — replayable in any engine, no RNG state), per arm
    // reach/conversion in exact ppm + the arm delta. With id-derived
    // traffic both arms read alike — the card's job in production is
    // the guardrail that a REAL experiment's split is balanced before
    // anyone reads lift off it. Map-side arm tag + a 2-row aggregate.

    Q("q268_ab_lift",
      (s, dir) => {
        val arms = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("converted"))
          .select(pmod(Dedup.md5Hash64(col("user_id").cast("string")),
            lit(2L)).as("arm"), col("converted"))
        arms.groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
            sum("converted").as("n_converted"))
          .select(col("arm"), col("n_users"), col("n_converted"),
            expr("n_converted * 1000000 div n_users").as("conv_ppm"))
          .orderBy("arm")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         MAX(CASE WHEN event_type = 'purchase'
             |           THEN 1 ELSE 0 END) AS converted
             |  FROM events GROUP BY 1
             |), a AS (
             |  SELECT ((('0x'||substr(md5(CAST(user_id AS VARCHAR)),
             |           1,15))::BIGINT % 2) + 2) % 2 AS arm,
             |         converted
             |  FROM u
             |)
             |SELECT CAST(arm AS BIGINT) AS arm,
             |       CAST(COUNT(*) AS BIGINT) AS n_users,
             |       CAST(SUM(converted) AS BIGINT) AS n_converted,
             |       CAST(SUM(converted) * 1000000 // COUNT(*)
             |         AS BIGINT) AS conv_ppm
             |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Nation trade-balance card — the star-schema geography rollup the
    // region/nation dims exist for: per nation, the line-item mass its
    // CUSTOMERS buy (lineitem→orders→customer) vs the mass its
    // SUPPLIERS ship (lineitem→supplier), in exact cents, with the
    // net balance. Both legs share one lineitem scan projection; all
    // dims ride broadcasts (the J4 contract) — the fact table shuffles
    // only for its two key-grain aggregates. Output = nations.

    Q("q275_asof_staleness",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val snapshots = ev
          .groupBy(col("user_id"),
            date_trunc("day", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("snap_events"))
        AsOf.asofJoinExec(
            ev.select("event_id", "user_id", "ts"),
            snapshots, keys = Seq("user_id"),
            leftTime = "ts", rightTime = "snap_ts",
            valueCols = Seq("snap_ts"))
          .select(when(col("snap_ts").isNull, lit(-1L))
            .otherwise(expr("(CAST(ts AS LONG)" +
              " - CAST(snap_ts AS LONG)) div 3600"))
            .as("staleness_h"))
          .groupBy("staleness_h")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("staleness_h")
      },
      Some("""WITH snapshots AS (
             |  SELECT user_id, date_trunc('day', ts) AS snap_ts
             |  FROM events GROUP BY 1, 2
             |), j AS (
             |  SELECT e.event_id,
             |         CASE WHEN s.snap_ts IS NULL THEN -1
             |           ELSE (CAST(floor(epoch(e.ts)) AS BIGINT)
             |             - CAST(floor(epoch(s.snap_ts)) AS BIGINT))
             |             // 3600 END AS staleness_h
             |  FROM events e
             |  ASOF LEFT JOIN snapshots s
             |    ON e.user_id = s.user_id AND e.ts >= s.snap_ts
             |)
             |SELECT CAST(staleness_h AS BIGINT) AS staleness_h,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dedup threshold-sensitivity card: the SAME LSH-scored pair set
    // cut at τ ∈ {2000, 5000, 8000} bp — pairs surviving and docs
    // touched per threshold, the two numbers that move when a dedup
    // threshold is negotiated (q129 answers recall at one τ, q239 the
    // banding; this is the material-impact sweep across τ). One scored
    // pair set computed once, three bounded filters.

    Q("q280_weekly_churn",
      (s, dir) => {
        val uw = Tables.events(s, dir)
          .select(col("user_id"),
            expr("CAST(ts AS LONG) div 604800").as("wk"))
          .distinct()
          .localCheckpoint() // both join sides + the max probe read it
        val maxWk = uw.agg(max("wk").as("max_wk"))
        uw.as("a")
          .join(uw.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.wk") + 1 === col("b.wk"), "left")
          .groupBy(col("a.wk").as("wk"))
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("b.user_id").isNotNull, 1L).otherwise(0L))
              .as("n_retained"))
          .crossJoin(broadcast(maxWk))
          .select(col("wk"), col("n_active"), col("n_retained"),
            expr("CASE WHEN wk = max_wk THEN -1" +
              " ELSE (n_active - n_retained) * 10000 div n_active END")
              .as("churn_bp"))
          .orderBy("wk")
      },
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
             |  FROM events
             |), mx AS (
             |  SELECT MAX(wk) AS max_wk FROM uw
             |), r AS (
             |  SELECT a.wk, CAST(COUNT(*) AS BIGINT) AS n_active,
             |         CAST(SUM(CASE WHEN b.user_id IS NOT NULL
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
             |  FROM uw a LEFT JOIN uw b
             |    ON b.user_id = a.user_id AND b.wk = a.wk + 1
             |  GROUP BY 1
             |)
             |SELECT r.wk, r.n_active, r.n_retained,
             |       CAST(CASE WHEN r.wk = mx.max_wk THEN -1
             |         ELSE (r.n_active - r.n_retained) * 10000
             |           // r.n_active END AS BIGINT) AS churn_bp
             |FROM r CROSS JOIN mx ORDER BY r.wk""".stripMargin)),

    // Brand × size-bucket PIVOT — the relational pivot API surface
    // (`RelationalGroupedDataset.pivot` with an EXPLICIT bounded value
    // list — never the value-discovering overload, which adds a
    // collect pass and unbounded columns): part counts per brand
    // across four fixed size buckets, the assortment-matrix dashboard
    // shape. Oracle restates the pivot as conditional aggregation.

    // Point-in-interval PAIR ROWS — RangeJoin.pointInInterval's
    // correctness anchor. q103's r14 rewrite computes window TOTALS
    // from day-grain prefix sums and no longer materializes pairs, so
    // without this query the library operator (the path for queries
    // that need the pair rows themselves) would be tested-but-unproven.
    // Shape: purchases landing inside error-spike windows — the top-4
    // error days (count desc, date asc tie-break: scale-stable where a
    // fixed count threshold would select everything at sf1 and nothing
    // at sf0.001), each spanning [d, d+2]. binDays=3 keeps per-point
    // probes at ≤ 2 bins; salt spreads the ~10 bins of a month-long
    // timeline across the cluster (the timeline-short contract in
    // RangeJoin's scaladoc — unsalted, 10 join keys would serialize
    // into 10 tasks at any cluster size).
    Q("q282_spike_window_pairs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val spikes = ev.filter(col("event_type") === "error")
          .groupBy(col("ts").cast("date").as("d0"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("d0").asc).limit(4)
          .select(col("d0"), date_add(col("d0"), 2).as("d1"))
        val pts = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts").cast("date").as("pd"))
        RangeJoin.pointInInterval(pts, "pd", spikes, "d0", "d1",
            binDays = 3, salt = s.sparkContext.defaultParallelism)
          .select(col("event_id"), col("d0").as("window_start"),
            datediff(col("pd"), col("d0")).cast("long").as("day_offset"))
          .orderBy("event_id", "window_start")
      },
      Some("""WITH ed AS (
             |  SELECT CAST(ts AS DATE) AS d0, COUNT(*) AS n
             |  FROM events WHERE event_type = 'error' GROUP BY 1
             |), spikes AS (
             |  SELECT d0, d0 + 2 AS d1 FROM ed
             |  ORDER BY n DESC, d0 ASC LIMIT 4
             |)
             |SELECT e.event_id, s.d0 AS window_start,
             |       CAST(CAST(e.ts AS DATE) - s.d0 AS BIGINT) AS day_offset
             |FROM events e JOIN spikes s
             |  ON CAST(e.ts AS DATE) BETWEEN s.d0 AND s.d1
             |WHERE e.event_type = 'purchase'
             |ORDER BY e.event_id, s.d0""".stripMargin)),
  )
}
