package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Mergeable sketches and robust stats: KLL, HLL, KMV, Count-Min, heavy hitters, quantiles, PSI/KS drift, winsorize/MAD, Benford.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object SketchQueries {

  val all: Seq[Q] = Seq(

    Q("q51_value_outliers",
      (s, dir) => {
        val d = (p: Int, sc: Int) => DecimalType(p, sc)
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            col("value").cast(d(12, 2)).as("v"))
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).cast(d(10, 0)).as("n10"),
          sum(col("v")).cast(d(19, 2)).as("s"),
          sum((col("v") * col("v")).cast(d(26, 4))).cast(d(28, 4)).as("ss"))
        val joined = ev.join(broadcast(stats), Seq("event_type"))
          .withColumn("diff",
            (col("n10") * col("v") - col("s")).cast(d(19, 2)))
          .withColumn("lhs", (col("diff") * col("diff")).cast(d(38, 4)))
          .withColumn("variance",
            ((col("n10") * col("ss")).cast(d(38, 4))
              - (col("s") * col("s")).cast(d(38, 4))).cast(d(34, 4)))
        joined.filter(col("lhs") > lit(9) * col("variance"))
          .select(col("event_type"), col("event_id"),
            col("v").cast("double").as("v"))
          .orderBy("event_type", "event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |         CAST(value AS DECIMAL(12,2)) AS v
             |  FROM events
             |), stats AS (
             |  SELECT event_type,
             |         CAST(COUNT(*) AS DECIMAL(10,0)) AS n10,
             |         CAST(SUM(v) AS DECIMAL(19,2)) AS s,
             |         CAST(SUM(CAST(v * v AS DECIMAL(26,4))) AS DECIMAL(28,4)) AS ss
             |  FROM ev GROUP BY event_type
             |), j AS (
             |  SELECT e.event_type, e.event_id, e.v,
             |         CAST(t.n10 * e.v - t.s AS DECIMAL(19,2)) AS diff,
             |         CAST(t.n10 * t.ss AS DECIMAL(38,4))
             |           - CAST(t.s * t.s AS DECIMAL(38,4)) AS variance_w
             |  FROM ev e JOIN stats t ON e.event_type = t.event_type
             |)
             |SELECT event_type, event_id, CAST(v AS DOUBLE) AS v FROM j
             |WHERE CAST(diff * diff AS DECIMAL(38,4))
             |      > 9 * CAST(variance_w AS DECIMAL(34,4))
             |ORDER BY event_type, event_id""".stripMargin)),

    // Pivot: per-product quantity totals spread over status columns
    // (oracle as portable conditional aggregation).

    Q("q80_kmv_distinct",
      (s, dir) => Sketches.kmvDistinctHashed(
          Tables.load(s, dir, "documents")
            .select(col("source"),
              explode(Dedup.shingleHashesFast(col("text"), 3)).as("h")),
          "source", "h", k = 64)
        .orderBy("source"),
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, source, generate_subscripts(w, 1) AS i,
             |         unnest(w) AS t, len(w) AS n
             |  FROM tok
             |), sh0 AS (
             |  SELECT doc_id, source, i, n,
             |         t || ' ' || lead(t, 1) OVER win || ' ' ||
             |           lead(t, 2) OVER win AS shingle
             |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
             |), h AS (
             |  SELECT DISTINCT source,
             |         ('0x'||substr(md5(shingle),1,15))::BIGINT AS hv
             |  FROM sh0 WHERE i <= n - 2
             |), rk AS (
             |  SELECT source, hv,
             |         ROW_NUMBER() OVER (PARTITION BY source
             |           ORDER BY hv) AS r
             |  FROM h
             |), agg AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nd,
             |         MAX(CASE WHEN r = 64 THEN hv END) AS kth
             |  FROM rk GROUP BY source
             |)
             |SELECT source,
             |       CAST(CASE WHEN nd < 64 THEN nd ELSE 64 END
             |         AS BIGINT) AS n_mins,
             |       kth AS kth_hash,
             |       CASE WHEN kth IS NOT NULL
             |            THEN round(63.0 * 1152921504606846976.0
             |                   / CAST(kth AS DOUBLE), 3)
             |            ELSE CAST(nd AS DOUBLE) END AS est_distinct
             |FROM agg ORDER BY source""".stripMargin)),

    // Adjacent-bigram PMI collocations (phrase mining): bigrams built
    // map-side by zipping the token array against its own tail, ONE
    // explode→groupBy shuffle; vocabulary-sized unigram counts broadcast
    // back; corpus totals ride the one-row broadcast. ln() of a ratio of
    // exact integer counts — a fixed IEEE op sequence.

    Q("q84_profile",
      (s, dir) => Sketches.profile(Tables.load(s, dir, "lineitem"),
          Seq("l_partkey", "l_quantity", "l_returnflag", "l_shipdate"),
          k = 256)
        .orderBy("col_name"),
      Some(profileOracle("lineitem",
        Seq("l_partkey", "l_quantity", "l_returnflag", "l_shipdate"),
        k = 256))),

    // Multi-query BM25 through the INDEX join path (q76 is the scan
    // path): a broadcast query table semi-filters the (term, doc) tf
    // relation, doc lengths join on doc_id, per-term df broadcasts.
    // Each contribution is floored to integer micro-units before the
    // per-(query, doc) sum, so scores are exact under any summation
    // order and ranks are integer-deterministic. One query term is
    // absent from the corpus on purpose (contributes nothing, both
    // engines agree by inner-join semantics).

    Q("q95_incremental_profile",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val cols = Seq("l_partkey", "l_quantity", "l_returnflag",
          "l_shipdate")
        val standing = Tables.memoTable(s, dir, "profile_state256") {
          Sketches.profileState(
            li.filter(col("l_orderkey") % 4 =!= 0), cols, k = 256)
        }
        val batch = Sketches.profileState(
          li.filter(col("l_orderkey") % 4 === 0), cols, k = 256)
        Sketches.renderProfile(
          Sketches.mergeProfileStates(standing, batch, cols, k = 256),
          cols, k = 256)
          .orderBy("col_name")
      },
      Some(profileOracle("lineitem",
        Seq("l_partkey", "l_quantity", "l_returnflag", "l_shipdate"),
        k = 256))),

    // Exact repeated-span audit (the k-gram face of exact-substring
    // dedup, Lee et al. 2022): per doc, how many of its 8-gram spans
    // (every position counts) occur in ≥ 2 documents — the boilerplate
    // signal span-level dedup acts on. Spans cross the shuffle as
    // portable 60-bit md5 longs; dup_bp is integral division.

    Q("q106_heavy_hitters",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(Sketches.freqItems(col("event_type"), 16).as("hh"))
        .select(col("day"), posexplode(col("hh")))
        .select(col("day"), col("pos").cast("long").as("rank"),
          col("col.item").as("event_type"), col("col.cnt").as("cnt"))
        .orderBy("day", "rank"),
      Some("""WITH c AS (
             |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |         event_type, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2
             |)
             |SELECT day,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY day
             |         ORDER BY cnt DESC, event_type) - 1 AS BIGINT)
             |         AS rank,
             |       event_type, cnt
             |FROM c ORDER BY day, rank""".stripMargin)),

    // Per-language QUOTA sampling (corpus balancing): at most quota(lang)
    // docs per language, chosen as the smallest portable hashes — an
    // absolute cap, where q64's rate sampling keeps a percentage. The
    // selection is a bounded MinKAgg per stratum (mergeable, no
    // per-stratum sort window), then one broadcast semi-join.

    Q("q111_value_percentiles",
      (s, dir) => Sketches.percentilesByValue(
          Tables.load(s, dir, "lineitem"), groupCol = "l_returnflag",
          valueCol = "l_quantity", percentiles = Seq(25, 50, 90, 99))
        .orderBy("l_returnflag"),
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |         CAST(floor(l_quantity) AS BIGINT) AS v,
             |         COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2
             |), cum AS (
             |  SELECT l_returnflag, v,
             |         SUM(cnt) OVER (PARTITION BY l_returnflag
             |           ORDER BY v) AS cum,
             |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
             |  FROM c
             |)
             |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
             |       CAST(MIN(CASE WHEN cum >= (n * 25 + 99) // 100
             |         THEN v END) AS BIGINT) AS p25,
             |       CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
             |         THEN v END) AS BIGINT) AS p50,
             |       CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100
             |         THEN v END) AS BIGINT) AS p90,
             |       CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100
             |         THEN v END) AS BIGINT) AS p99
             |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic weighted sampling (Efraimidis-Spirakis A-Res over
    // the portable hash): 5 docs per source, P(selection) ∝ n_chars,
    // bit-identical on replay in any engine (keys quantized to integer
    // picounits). Selection is the bounded MinKAgg per stratum — no
    // per-stratum sort window.

    Q("q113_incremental_hh",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("ts"), col("event_type"), col("event_id"))
          .withColumn("day", date_trunc("day", col("ts")))
        val standing = Tables.memoTable(s, dir, "hh_hist") {
          Sketches.freqState(ev.filter(col("event_id") % 10 =!= 7),
            "day", "event_type", k = 16)
        }
        val batch = Sketches.freqState(
          ev.filter(col("event_id") % 10 === 7), "day", "event_type",
          k = 16)
        Sketches.mergeFreqStates(standing, batch, k = 16, "day")
          .select(col("day"), col("item").as("event_type"), col("cnt"))
          .orderBy(col("day"), desc("cnt"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |       event_type, CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM events GROUP BY 1, 2
             |ORDER BY day, cnt DESC, event_type""".stripMargin)),

    // Bloom-filter semi-join reduction (the runtime-filter pattern): a
    // selective month of orders thins the lineitem side MAP-SIDE via a
    // broadcast 64Kbit Bloom image before any shuffle; the exact
    // semi-join culls the false positives, so the composition IS the
    // plain semi-join — which is exactly what the oracle states.

    Q("q116_bisect_quantiles",
      (s, dir) => Sketches.bisectQuantiles(
          Tables.load(s, dir, "lineitem"), "l_extendedprice",
          Seq(1, 25, 50, 75, 90, 99))
        .orderBy("p"),
      Some("""WITH s AS (
             |  SELECT l_extendedprice AS v,
             |         ROW_NUMBER() OVER (ORDER BY l_extendedprice)
             |           AS rn,
             |         COUNT(*) OVER () AS n
             |  FROM lineitem
             |), t AS (
             |  SELECT unnest([1, 25, 50, 75, 90, 99]) AS p
             |)
             |SELECT CAST(t.p AS BIGINT) AS p,
             |       CAST(s.rn AS BIGINT) AS rk,
             |       CAST(s.n AS BIGINT) AS n,
             |       s.v AS value
             |FROM t JOIN s ON s.rn = (s.n * t.p + 99) // 100
             |ORDER BY p""".stripMargin)),

    // Z-order (Morton) layout quality report: each dimension normalizes
    // to a 16-bit fixed-point fraction of its [min, max] range (exact
    // integer arithmetic, one-row broadcast stats), rows land in the
    // fixed grid bucket = top 6 bits of the 32-bit interleave, and each
    // bucket reports the min/max pruning stats a file written from it
    // would carry — tight in BOTH dimensions, the point of z-ordering.
    // One map-side-combinable aggregate; no sort, no row shuffle. The
    // oracle restates the interleave as a 32-term sum of shifted bit
    // tests.

    Q("q120_group_quantiles",
      (s, dir) => Sketches.bisectQuantilesByGroup(
          Tables.load(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", Seq(25, 50, 95))
        .orderBy("l_returnflag", "p"),
      Some("""WITH s AS (
             |  SELECT l_returnflag AS g, l_extendedprice AS v,
             |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |           ORDER BY l_extendedprice) AS rn,
             |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM lineitem
             |), t AS (
             |  SELECT unnest([25, 50, 95]) AS p
             |)
             |SELECT s.g AS l_returnflag, CAST(t.p AS BIGINT) AS p,
             |       CAST(s.rn AS BIGINT) AS rk,
             |       CAST(s.n AS BIGINT) AS n, s.v AS value
             |FROM t JOIN s ON s.rn = (s.n * t.p + 99) // 100
             |ORDER BY 1, 2""".stripMargin)),

    // PSI drift report between the month's two halves of the event
    // value distribution: union-bin Laplace smoothing, then the per-bin
    // (p−q)·ln(p/q) contribution factored so the only non-integer step
    // is ONE ln per bin on an integer-derived ratio (floored to
    // millinats) — contrib = (x−y)·floor(1000·ln(x/y)) is exact int64
    // and PSI = Σ contrib / (D·1000). Two bin-domain aggregates + a
    // one-row totals broadcast; no row-sized shuffle.

    Q("q121_psi_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Sketches.psiDrift(
          ev.filter(dayofmonth(col("ts")) <= 15),
          ev.filter(dayofmonth(col("ts")) > 15),
          "value", binWidth = 10.0)
          .orderBy("bin")
      },
      Some("""WITH ea AS (
             |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
             |         COUNT(*) AS c
             |  FROM events WHERE day(ts) <= 15 GROUP BY 1
             |), eb AS (
             |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
             |         COUNT(*) AS c
             |  FROM events WHERE day(ts) > 15 GROUP BY 1
             |), j AS (
             |  SELECT COALESCE(ea.bin, eb.bin) AS bin,
             |         COALESCE(ea.c, 0) AS ca, COALESCE(eb.c, 0) AS cb
             |  FROM ea FULL OUTER JOIN eb ON ea.bin = eb.bin
             |), t AS (
             |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
             |         CAST(SUM(cb) AS BIGINT) AS nb,
             |         CAST(COUNT(*) AS BIGINT) AS n_bins
             |  FROM j
             |), f AS (
             |  SELECT j.bin, j.ca, j.cb, t.na, t.nb, t.n_bins,
             |         (j.ca + 1) * (t.nb + t.n_bins) AS x,
             |         (j.cb + 1) * (t.na + t.n_bins) AS y
             |  FROM j CROSS JOIN t
             |)
             |SELECT bin, CAST(ca AS BIGINT) AS cnt_a,
             |       CAST(cb AS BIGINT) AS cnt_b,
             |       na AS n_a, nb AS n_b, n_bins,
             |       CAST(x - y AS BIGINT) AS delta_num,
             |       CAST(floor(ln(CAST(x AS DOUBLE) / CAST(y AS DOUBLE))
             |         * 1000) AS BIGINT) AS ln_milli,
             |       CAST((x - y) * CAST(floor(ln(CAST(x AS DOUBLE)
             |         / CAST(y AS DOUBLE)) * 1000) AS BIGINT)
             |         AS BIGINT) AS contrib
             |FROM f ORDER BY bin""".stripMargin)),

    // ANN recall harness: recall@10 of the IVF multi-probe path (q62)
    // against the brute-force exact ranking (q28), per query, in
    // integral basis points — the evaluation loop that decides
    // cells/nprobe in production. Both rankings are deterministic
    // (sim rounded to 6, ties by id), so the intersection — and the
    // recall — is exactly reproducible; the oracle recomputes both
    // stacks and the overlap count.

    Q("q124_count_min",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val cm = Sketches.countMin(li, "l_partkey", width = 256,
          depth = 3)
        val probes = li.filter(col("l_partkey") <= 20)
        val exact = probes
          .groupBy(col("l_partkey").cast("string").as("item"))
          .agg(count(lit(1)).as("exact"))
        Sketches.cmEstimate(cm, probes, "l_partkey", width = 256,
            depth = 3)
          .join(exact, Seq("item"))
          .select(col("item"), col("est"), col("exact"),
            (col("est") - col("exact")).as("overcount"))
          .orderBy("item")
      },
      Some("""WITH js AS (
             |  SELECT unnest([0, 1, 2]) AS j
             |), cells AS (
             |  SELECT js.j,
             |         ('0x'||substr(md5('cm:'||js.j||':'
             |           ||CAST(l_partkey AS VARCHAR)),1,15))::BIGINT
             |           % 256 AS cell,
             |         COUNT(*) AS cnt
             |  FROM lineitem CROSS JOIN js
             |  GROUP BY 1, 2
             |), probes AS (
             |  SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS item
             |  FROM lineitem WHERE l_partkey <= 20
             |), pe AS (
             |  SELECT p.item, js.j,
             |         ('0x'||substr(md5('cm:'||js.j||':'||p.item),1,15))
             |           ::BIGINT % 256 AS cell
             |  FROM probes p CROSS JOIN js
             |), est AS (
             |  SELECT pe.item, MIN(COALESCE(c.cnt, 0)) AS est
             |  FROM pe LEFT JOIN cells c
             |    ON c.j = pe.j AND c.cell = pe.cell
             |  GROUP BY 1
             |), ex AS (
             |  SELECT CAST(l_partkey AS VARCHAR) AS item,
             |         COUNT(*) AS exact
             |  FROM lineitem WHERE l_partkey <= 20 GROUP BY 1
             |)
             |SELECT e.item, CAST(e.est AS BIGINT) AS est,
             |       CAST(x.exact AS BIGINT) AS exact,
             |       CAST(e.est - x.exact AS BIGINT) AS overcount
             |FROM est e JOIN ex x ON e.item = x.item
             |ORDER BY e.item""".stripMargin)),

    // Join-shape diagnostic for orders ⋈ lineitem on the order key:
    // per-side row/NDV counts, matching-key count, the EXACT join
    // output cardinality Σ cnt_a·cnt_b, and the heaviest key by
    // contribution — computed from the two key-count tables, never by
    // running the join. The decide-before-you-salt numbers, all exact
    // integers.

    Q("q130_cm_join_estimate",
      (s, dir) => {
        val cmO = Sketches.countMin(Tables.load(s, dir, "orders"),
          "o_orderkey", width = 256, depth = 3)
        val cmL = Sketches.countMin(Tables.load(s, dir, "lineitem"),
          "l_orderkey", width = 256, depth = 3)
        val exact = Tables.load(s, dir, "orders")
          .groupBy(col("o_orderkey").as("k"))
          .agg(count(lit(1)).as("ca"))
          .join(Tables.load(s, dir, "lineitem")
            .groupBy(col("l_orderkey").as("k"))
            .agg(count(lit(1)).as("cb")), Seq("k"))
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
            .as("exact_out_rows"))
        Sketches.cmJoinSizeEstimate(cmO, cmL)
          .crossJoin(broadcast(exact))
          .select(col("est_out_rows"), col("exact_out_rows"),
            (col("est_out_rows") - col("exact_out_rows"))
              .as("overcount"))
      },
      Some("""WITH js AS (
             |  SELECT unnest([0, 1, 2]) AS j
             |), ca AS (
             |  SELECT js.j,
             |         ('0x'||substr(md5('cm:'||js.j||':'
             |           ||CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT
             |           % 256 AS cell,
             |         COUNT(*) AS cnt
             |  FROM orders CROSS JOIN js GROUP BY 1, 2
             |), cb AS (
             |  SELECT js.j,
             |         ('0x'||substr(md5('cm:'||js.j||':'
             |           ||CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT
             |           % 256 AS cell,
             |         COUNT(*) AS cnt
             |  FROM lineitem CROSS JOIN js GROUP BY 1, 2
             |), ip AS (
             |  SELECT a.j, SUM(a.cnt * b.cnt) AS ip
             |  FROM ca a JOIN cb b ON a.j = b.j AND a.cell = b.cell
             |  GROUP BY 1
             |), est AS (
             |  SELECT CAST(MIN(ip) AS BIGINT) AS est_out_rows FROM ip
             |), ex AS (
             |  SELECT CAST(COALESCE(SUM(oa.c * lb.c), 0) AS BIGINT)
             |    AS exact_out_rows
             |  FROM (SELECT o_orderkey AS k, COUNT(*) AS c
             |        FROM orders GROUP BY 1) oa
             |  JOIN (SELECT l_orderkey AS k, COUNT(*) AS c
             |        FROM lineitem GROUP BY 1) lb
             |    ON oa.k = lb.k
             |)
             |SELECT est.est_out_rows, ex.exact_out_rows,
             |       CAST(est.est_out_rows - ex.exact_out_rows AS BIGINT)
             |         AS overcount
             |FROM est CROSS JOIN ex""".stripMargin)),

    // THREE-dimension z-order layout report (part, supplier, order):
    // each dimension normalizes to a 21-bit fraction of its range, rows
    // land in the top-6-bit grid of the 63-bit Morton code, and every
    // bucket carries min/max pruning stats in ALL THREE dimensions —
    // predicates on any of the three columns skip. Same one-aggregate
    // shape as q117; the oracle restates the interleave as a 63-term
    // sum of shifted bit tests.

    Q("q132_psi_by_type",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Sketches.psiDriftByGroup(
          ev.filter(dayofmonth(col("ts")) <= 15),
          ev.filter(dayofmonth(col("ts")) > 15),
          "event_type", "value", binWidth = 25.0)
          .orderBy("event_type", "bin")
      },
      Some("""WITH ea AS (
             |  SELECT event_type AS g,
             |         CAST(floor(value / 25.0) AS BIGINT) AS bin,
             |         COUNT(*) AS c
             |  FROM events WHERE day(ts) <= 15 GROUP BY 1, 2
             |), eb AS (
             |  SELECT event_type AS g,
             |         CAST(floor(value / 25.0) AS BIGINT) AS bin,
             |         COUNT(*) AS c
             |  FROM events WHERE day(ts) > 15 GROUP BY 1, 2
             |), j AS (
             |  SELECT COALESCE(ea.g, eb.g) AS g,
             |         COALESCE(ea.bin, eb.bin) AS bin,
             |         COALESCE(ea.c, 0) AS ca, COALESCE(eb.c, 0) AS cb
             |  FROM ea FULL OUTER JOIN eb
             |    ON ea.g = eb.g AND ea.bin = eb.bin
             |), t AS (
             |  SELECT g, CAST(SUM(ca) AS BIGINT) AS na,
             |         CAST(SUM(cb) AS BIGINT) AS nb,
             |         CAST(COUNT(*) AS BIGINT) AS n_bins
             |  FROM j GROUP BY 1
             |), f AS (
             |  SELECT j.g, j.bin, j.ca, j.cb, t.na, t.nb, t.n_bins,
             |         (j.ca + 1) * (t.nb + t.n_bins) AS x,
             |         (j.cb + 1) * (t.na + t.n_bins) AS y
             |  FROM j JOIN t ON j.g = t.g
             |)
             |SELECT g AS event_type, bin, CAST(ca AS BIGINT) AS cnt_a,
             |       CAST(cb AS BIGINT) AS cnt_b,
             |       na AS n_a, nb AS n_b, n_bins,
             |       CAST(x - y AS BIGINT) AS delta_num,
             |       CAST(floor(ln(CAST(x AS DOUBLE) / CAST(y AS DOUBLE))
             |         * 1000) AS BIGINT) AS ln_milli,
             |       CAST((x - y) * CAST(floor(ln(CAST(x AS DOUBLE)
             |         / CAST(y AS DOUBLE)) * 1000) AS BIGINT)
             |         AS BIGINT) AS contrib
             |FROM f ORDER BY 1, 2""".stripMargin)),

    // KLL-class mergeable quantile sketch (plans/KllAgg) — the missing
    // quantile member of the standing-sketch family: per-language
    // document-length percentiles answered FROM the landed O(k) sketch,
    // not a sort (contrast q116's four passes, q120's grouped radix
    // select). k = 4096 ≫ any language's document count at test scales,
    // so the sketch sits in its EXACT regime (every weight 1, the array
    // IS the sorted multiset) and rank selection is exactly
    // percentile_disc — the oracle-checkable contract, mirroring
    // freqItems' ≤ k case; KllSpec property-tests the compacted regime.

    Q("q133_kll_quantiles",
      (s, dir) => {
        val sk = Tables.load(s, dir, "documents")
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
          .groupBy(col("lang"))
          .agg(Sketches.kllSketch(col("n_chars"), 4096).as("sk"))
        Sketches.kllQuantileReport(sk, "sk", Seq(25, 50, 95))
          .orderBy("lang", "p")
      },
      Some(kllOracle)),

    // The same report computed INCREMENTALLY: the corpus arrives in
    // three deterministic hash waves, each wave reduces to per-language
    // KLL sketches, and the waves fold into a standing sketch table by
    // mergeKllSketches (q119's recipe lifted to quantiles — levelwise
    // concat + compaction, history never re-read). In the exact regime
    // merged ≡ rebuilt bit-for-bit, so the report hash-matches the SAME
    // one-shot oracle as q133 — the merged-equals-rebuilt contract of
    // the standing-artifact family (index q92, profile q95, degrees
    // q119, now quantiles).

    Q("q134_kll_merged",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
        val wave = pmod(col("doc_id"), lit(3))
        val merged = (0 to 2).map(b => docs.filter(wave === b)
            .groupBy(col("lang"))
            .agg(Sketches.kllSketch(col("n_chars"), 4096).as("sk")))
          .reduce(_.unionByName(_))
          .groupBy(col("lang"))
          .agg(Sketches.mergeKllSketches(col("sk"), 4096).as("sk"))
        Sketches.kllQuantileReport(merged, "sk", Seq(25, 50, 95))
          .orderBy("lang", "p")
      },
      Some(kllOracle)),

    // Z-order bucket stats over a DECLARED fixed domain, maintained
    // INCREMENTALLY (q117's report made mergeable): because the grid
    // is declared a priori instead of derived from the table's global
    // min/max, each wave's stats are a pure function of the wave, and
    // the standing report folds by count addition + min/max combine —
    // merged ≡ rebuilt exactly, so the three-wave fold hash-matches the
    // one-shot oracle. Out-of-domain values clamp into edge cells
    // (raw bounds still reported). This is the layout monitor an
    // append-heavy 100 TB table runs per batch to decide WHEN to
    // OPTIMIZE, with no history rescans (MonitorStreams.zorderBatch).

    Q("q173_hll_distinct",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Sketches.hllEstimate(
            Sketches.hllRegisters(ev, "event_type", "user_id"),
            "event_type")
          .join(ev.groupBy("event_type")
            .agg(countDistinct(col("user_id")).as("n_exact")),
            Seq("event_type"))
          .select(col("event_type"), col("n_exact"), col("occupied"),
            col("zeros"), col("estimate"))
          .orderBy("event_type")
      },
      Some(hllCtes +
        """SELECT f.event_type, x.n_exact, f.occupied, f.zeros,
          |       CAST(CASE WHEN f.zeros > 0 AND f.est_raw <= 1280.0
          |            THEN floor(512.0 * ln(512.0
          |                   / CAST(f.zeros AS DOUBLE)))
          |            ELSE floor(f.est_raw) END AS BIGINT) AS estimate
          |FROM fin f JOIN (
          |  SELECT event_type,
          |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
          |  FROM events GROUP BY 1) x USING (event_type)
          |ORDER BY f.event_type""".stripMargin)),

    // Merged ≡ rebuilt for the HLL standing artifact: three disjoint
    // event waves sketch independently, registers fold by elementwise
    // max, and the estimate matches the one-shot oracle exactly — the
    // property that lets a 100 TB corpus keep per-day register tables
    // and answer corpus-wide distincts without ever rescanning history.

    Q("q174_hll_merged",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val waves = (0 until 3).map(i =>
          Sketches.hllRegisters(
            ev.filter(pmod(col("event_id"), lit(3)) === i),
            "event_type", "user_id"))
        val merged = waves.reduce(Sketches.mergeHll(_, _, "event_type"))
        Sketches.hllEstimate(merged, "event_type")
          .orderBy("event_type")
      },
      Some(hllCtes +
        """SELECT f.event_type, f.occupied, f.zeros,
          |       CAST(CASE WHEN f.zeros > 0 AND f.est_raw <= 1280.0
          |            THEN floor(512.0 * ln(512.0
          |                   / CAST(f.zeros AS DOUBLE)))
          |            ELSE floor(f.est_raw) END AS BIGINT) AS estimate
          |FROM fin f ORDER BY f.event_type""".stripMargin)),

    // UniMax token-budget allocation (Chung et al. 2023): spend a 40k-
    // token budget as uniformly as possible across sources, capping each
    // at 2 epochs — exact integer waterfilling via capacity-sorted
    // prefix sums. Small sources get their full cap; large ones split
    // the remainder at one common level.

    Q("q186_winsorize",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cuts = Sketches.percentilesByValue(ev, "event_type",
          "value", Seq(5, 95))
        ev.select(col("event_id"), col("event_type"),
            floor(col("value")).cast("long").as("v"))
          .join(broadcast(cuts.select(col("event_type"), col("p5"),
            col("p95"))), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("v"),
            greatest(least(col("v"), col("p95")), col("p5"))
              .as("v_wins"),
            (col("v") < col("p5")).as("clipped_lo"),
            (col("v") > col("p95")).as("clipped_hi"))
          .orderBy("event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
             |         COUNT(*) AS cnt
             |  FROM events GROUP BY 1, 2
             |), cum AS (
             |  SELECT event_type, v,
             |         SUM(cnt) OVER (PARTITION BY event_type
             |           ORDER BY v) AS cum,
             |         SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM c
             |), cuts AS (
             |  SELECT event_type,
             |         CAST(MIN(CASE WHEN cum >= (n * 5 + 99) // 100
             |           THEN v END) AS BIGINT) AS p5,
             |         CAST(MIN(CASE WHEN cum >= (n * 95 + 99) // 100
             |           THEN v END) AS BIGINT) AS p95
             |  FROM cum GROUP BY 1
             |)
             |SELECT e.event_id, e.event_type,
             |       CAST(floor(e.value) AS BIGINT) AS v,
             |       greatest(least(CAST(floor(e.value) AS BIGINT),
             |         c.p95), c.p5) AS v_wins,
             |       CAST(floor(e.value) AS BIGINT) < c.p5 AS clipped_lo,
             |       CAST(floor(e.value) AS BIGINT) > c.p95 AS clipped_hi
             |FROM events e JOIN cuts c ON c.event_type = e.event_type
             |ORDER BY e.event_id""".stripMargin)),

    // Median/MAD robust outliers per event type (the robust z-score):
    // med and MAD both from the q111 histogram-percentile rule, the
    // 3·1.4826·MAD test kept integral as 10000·|v−med| > 44478·MAD —
    // no sqrt, no floats, immune to the outliers it hunts (unlike the
    // mean/σ test, whose baseline the outlier itself inflates).

    Q("q187_mad_outliers",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            floor(col("value")).cast("long").as("v"))
        val med = Sketches.percentilesByValue(ev, "event_type", "v",
          Seq(50))
        val dev = ev.join(broadcast(med.select(col("event_type"),
            col("p50").as("med"))), Seq("event_type"))
          .withColumn("d", abs(col("v") - col("med")))
        val mad = Sketches.percentilesByValue(dev, "event_type", "d",
          Seq(50))
        dev.join(broadcast(mad.select(col("event_type"),
            col("p50").as("mad"))), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("v"),
            col("med"), col("mad"), col("d"),
            (col("d") * 10000L > col("mad") * 44478L).as("is_outlier"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |         CAST(floor(value) AS BIGINT) AS v
             |  FROM events
             |), c AS (
             |  SELECT event_type, v, COUNT(*) AS cnt
             |  FROM ev GROUP BY 1, 2
             |), cum AS (
             |  SELECT event_type, v,
             |         SUM(cnt) OVER (PARTITION BY event_type
             |           ORDER BY v) AS cum,
             |         SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM c
             |), med AS (
             |  SELECT event_type,
             |         CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
             |           THEN v END) AS BIGINT) AS med
             |  FROM cum GROUP BY 1
             |), dv AS (
             |  SELECT e.event_id, e.event_type, e.v, m.med,
             |         abs(e.v - m.med) AS d
             |  FROM ev e JOIN med m ON m.event_type = e.event_type
             |), dc AS (
             |  SELECT event_type, d, COUNT(*) AS cnt
             |  FROM dv GROUP BY 1, 2
             |), dcum AS (
             |  SELECT event_type, d,
             |         SUM(cnt) OVER (PARTITION BY event_type
             |           ORDER BY d) AS cum,
             |         SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM dc
             |), mad AS (
             |  SELECT event_type,
             |         CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
             |           THEN d END) AS BIGINT) AS mad
             |  FROM dcum GROUP BY 1
             |)
             |SELECT dv.event_id, dv.event_type, dv.v, dv.med,
             |       ma.mad, CAST(dv.d AS BIGINT) AS d,
             |       dv.d * 10000 > ma.mad * 44478 AS is_outlier
             |FROM dv JOIN mad ma ON ma.event_type = dv.event_type
             |ORDER BY dv.event_id""".stripMargin)),

    // Hilbert-curve layout stats — q117's report with the locality-
    // preserving curve instead of Morton: consecutive positions are
    // always grid neighbours, so each bucket is one connected curve
    // segment with a tighter bounding box. The oracle UNROLLS the
    // 16-round xy2d bit recursion into a generated 16-step CTE chain —
    // rotation state, quadrant offsets and all — so the kernel's every
    // bit decision is hash-checked in DuckDB.

    Q("q200_hll_overlap",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val regs = Sketches.hllRegisters(ev, "event_type", "user_id")
        val du = ev.select(col("event_type"), col("user_id")).distinct()
        val exact = du.as("a")
          .join(du.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ga"),
            col("b.event_type").as("gb"))
          .agg(count(lit(1)).as("n_exact_inter"))
        Sketches.hllPairOverlaps(regs, "event_type")
          .join(exact, Seq("ga", "gb"), "left")
          .select(col("ga"), col("gb"),
            coalesce(col("n_exact_inter"), lit(0L))
              .as("n_exact_inter"),
            col("est_a"), col("est_b"), col("est_union"),
            col("est_inter"))
          .orderBy("ga", "gb")
      },
      Some("""WITH hh AS (
             |  SELECT event_type,
             |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
             |           1, 15))::BIGINT AS h
             |  FROM events
             |), rw AS (
             |  SELECT event_type, h >> 51 AS idx,
             |         h & ((1::BIGINT << 51) - 1) AS wv
             |  FROM hh
             |), regs AS (
             |  SELECT event_type, idx,
             |         MAX(CASE WHEN wv = 0 THEN 52
             |             ELSE 52 - length(bin(wv)) END) AS rho
             |  FROM rw GROUP BY 1, 2
             |), tys AS (
             |  SELECT DISTINCT event_type FROM events
             |), prs AS (
             |  SELECT a.event_type AS ga, b.event_type AS gb
             |  FROM tys a JOIN tys b ON a.event_type < b.event_type
             |), ureg AS (
             |  SELECT p.ga, p.gb, r.idx, MAX(r.rho) AS rho
             |  FROM prs p JOIN regs r
             |    ON r.event_type = p.ga OR r.event_type = p.gb
             |  GROUP BY 1, 2, 3
             |), agg1 AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS occupied,
             |         CAST(SUM(1::BIGINT << CAST(52 - rho AS INT))
             |           AS BIGINT) AS s_occ
             |  FROM regs GROUP BY 1
             |), fin1 AS (
             |  SELECT event_type, occupied,
             |         512 - occupied AS zeros,
             |         (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
             |           * CAST(1::BIGINT << 52 AS DOUBLE)
             |           / CAST(s_occ + (512 - occupied)
             |                  * (1::BIGINT << 52) AS DOUBLE)
             |           AS est_raw
             |  FROM agg1
             |), est1 AS (
             |  SELECT event_type,
             |         CAST(CASE WHEN zeros > 0 AND est_raw <= 1280.0
             |              THEN floor(512.0 * ln(512.0
             |                     / CAST(zeros AS DOUBLE)))
             |              ELSE floor(est_raw) END AS BIGINT) AS est
             |  FROM fin1
             |), aggu AS (
             |  SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS occupied,
             |         CAST(SUM(1::BIGINT << CAST(52 - rho AS INT))
             |           AS BIGINT) AS s_occ
             |  FROM ureg GROUP BY 1, 2
             |), finu AS (
             |  SELECT ga, gb, occupied,
             |         512 - occupied AS zeros,
             |         (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
             |           * CAST(1::BIGINT << 52 AS DOUBLE)
             |           / CAST(s_occ + (512 - occupied)
             |                  * (1::BIGINT << 52) AS DOUBLE)
             |           AS est_raw
             |  FROM aggu
             |), estu AS (
             |  SELECT ga, gb,
             |         CAST(CASE WHEN zeros > 0 AND est_raw <= 1280.0
             |              THEN floor(512.0 * ln(512.0
             |                     / CAST(zeros AS DOUBLE)))
             |              ELSE floor(est_raw) END AS BIGINT) AS est
             |  FROM finu
             |), ex AS (
             |  SELECT a.event_type AS ga, b.event_type AS gb,
             |         CAST(COUNT(*) AS BIGINT) AS n_exact_inter
             |  FROM (SELECT DISTINCT event_type, user_id
             |        FROM events) a
             |  JOIN (SELECT DISTINCT event_type, user_id
             |        FROM events) b
             |    ON b.user_id = a.user_id
             |   AND a.event_type < b.event_type
             |  GROUP BY 1, 2
             |)
             |SELECT p.ga, p.gb,
             |       COALESCE(x.n_exact_inter, 0) AS n_exact_inter,
             |       ea.est AS est_a, eb.est AS est_b,
             |       u.est AS est_union,
             |       CAST(greatest(0, ea.est + eb.est - u.est)
             |         AS BIGINT) AS est_inter
             |FROM prs p
             |JOIN est1 ea ON ea.event_type = p.ga
             |JOIN est1 eb ON eb.event_type = p.gb
             |JOIN estu u ON u.ga = p.ga AND u.gb = p.gb
             |LEFT JOIN ex x ON x.ga = p.ga AND x.gb = p.gb
             |ORDER BY p.ga, p.gb""".stripMargin)),

    // Seasonal baseline + deviation (the q183 complement): each hourly
    // count compares against its HOUR-OF-DAY's long-run mean per type
    // — the "is 3am traffic normal FOR 3am" question a trailing window
    // can't ask. Baseline in exact milli-counts, deviation in bp; all
    // integer floor division.

    Q("q240_ks_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val binned = ev.select(
            floor(col("value") / 10.0).cast("long").as("bin"),
            when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L)
              .as("ca"),
            when(dayofmonth(col("ts")) > 15, 1L).otherwise(0L)
              .as("cb"))
          .groupBy("bin").agg(sum("ca").as("ca"), sum("cb").as("cb"))
        // bounded frame: one row per occupied value/10 bin
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("bin").rowsBetween(Long.MinValue, 0)
        val cum = binned.select(col("bin"),
          sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
        val tot = binned.agg(sum("ca").as("na"), sum("cb").as("nb"))
        cum.crossJoin(broadcast(tot))
          .select(col("bin"), col("na"), col("nb"),
            expr("CAST(abs(CAST(cuma AS DECIMAL(38,0)) * nb" +
              " - CAST(cumb AS DECIMAL(38,0)) * na) * 1000000" +
              " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)")
              .as("d_ppm"))
          .groupBy("na", "nb")
          .agg(max(struct(col("d_ppm"), (-col("bin")).as("nbin")))
            .as("m"))
          .select(col("m.d_ppm").as("ks_ppm"),
            (-col("m.nbin")).as("at_bin"), col("na"), col("nb"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
             |         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS ca,
             |         CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END AS cb
             |  FROM events
             |), b AS (
             |  SELECT bin, SUM(ca) AS ca, SUM(cb) AS cb
             |  FROM e GROUP BY 1
             |), c AS (
             |  SELECT bin,
             |         SUM(ca) OVER (ORDER BY bin
             |           ROWS UNBOUNDED PRECEDING) AS cuma,
             |         SUM(cb) OVER (ORDER BY bin
             |           ROWS UNBOUNDED PRECEDING) AS cumb
             |  FROM b
             |), t AS (
             |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
             |         CAST(SUM(cb) AS BIGINT) AS nb
             |  FROM b
             |), d AS (
             |  SELECT bin,
             |         CAST(abs(CAST(cuma AS HUGEINT) * nb
             |           - CAST(cumb AS HUGEINT) * na) * 1000000
             |           // (CAST(na AS HUGEINT) * nb) AS BIGINT)
             |           AS d_ppm
             |  FROM c CROSS JOIN t
             |)
             |SELECT d_ppm AS ks_ppm, bin AS at_bin, na, nb
             |FROM d CROSS JOIN t
             |ORDER BY d_ppm DESC, bin LIMIT 1""".stripMargin)),

    // The STREAMED Naive-Bayes count table's end state — IndexStreams'
    // nbBatch maintainer certified end-to-end against q153's oracle
    // VERBATIM: the q153 training split streams in three doc_id-mod
    // waves (each doc arrives once — the corpus-partitioning
    // contract), each wave tokenizes only itself and folds in by count
    // addition (_SUCCESS-gated predecessor read, overwrite v=N), and
    // the model derived from the final committed version ≡ one-shot
    // training. History is never re-tokenized.

    Q("q258_benford",
      (s, dir) => {
        val spark2 = s; import spark2.implicits._
        val th = (1 to 9).map(d => (d.toLong,
            math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
              .toLong))
          .toDF("digit", "benford_ppm")
        val c = Tables.load(s, dir, "orders")
          .select(substring(floor(col("o_totalprice") * 100 + 0.5)
            .cast("long").cast("string"), 1, 1).cast("long")
            .as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        c.crossJoin(broadcast(c.agg(sum("n_orders").as("n_total"))))
          .join(broadcast(th), Seq("digit"))
          .select(col("digit"), col("n_orders"),
            expr("n_orders * 1000000 div n_total").as("obs_ppm"),
            col("benford_ppm"),
            expr("n_orders * 1000000 div n_total - benford_ppm")
              .as("dev_ppm"))
          .orderBy("digit")
      },
      Some {
        val th = (1 to 9).map(d => s"($d, ${
          math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
            .toLong})").mkString(", ")
        s"""WITH d AS (
           |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100
           |           + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
           |           AS digit
           |  FROM orders
           |), c AS (
           |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
           |  FROM d GROUP BY 1
           |), t AS (
           |  SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM c
           |), th(digit, benford_ppm) AS (
           |  VALUES $th
           |)
           |SELECT c.digit, c.n_orders,
           |       CAST(c.n_orders * 1000000 // t.n_total AS BIGINT)
           |         AS obs_ppm,
           |       CAST(th.benford_ppm AS BIGINT) AS benford_ppm,
           |       CAST(c.n_orders * 1000000 // t.n_total
           |         - th.benford_ppm AS BIGINT) AS dev_ppm
           |FROM c CROSS JOIN t JOIN th ON th.digit = c.digit
           |ORDER BY c.digit""".stripMargin
      }),

    // Semi-structured payload profile — the JSON surface: extract the
    // props field's key per event type and report fill rate, range,
    // mass and cardinality — the schema-inference card that decides
    // whether a JSON field graduates to a real column. Map-side
    // get_json_object (codegen'd) + one type-grain aggregate; DuckDB
    // replays with json_extract_string. At 100 TB the extraction is
    // the scan itself — nothing but the type-grain rollup shuffles.
  )
}
