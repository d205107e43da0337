package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable bounded-state sketches. The motivating contrast at 100 TB:
  * exact COUNT(DISTINCT x) per group is a two-phase plan whose first
  * shuffle carries every distinct value; a KMV sketch carries k longs per
  * group — the classic accuracy-for-bytes trade, with the estimate's
  * standard error ~ 1/sqrt(k-2).
  */
object Sketches {

  /** The k smallest DISTINCT longs of the group, ascending
    * (graft.plans.MinKAgg — a mergeable TypedImperativeAggregate; partial
    * buffers are capped at k longs). */
  def minK(values: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.MinKAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** Misra-Gries heavy-hitters summary of a string column: ≤ k
    * (item, cnt) structs, count-descending (graft.plans.FreqItemsAgg —
    * mergeable; EXACT whenever the group has ≤ k distinct items,
    * otherwise every count undercounts by at most n/(k+1) and every
    * true heavy hitter above that bar is present). */
  def freqItems(values: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.FreqItemsAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** Single-pass multi-column data profiler (the Deequ/DataSketches-
    * shaped operator a pipeline runs before trusting a new drop of
    * data): for every requested column — row count, non-null count,
    * min/max (as strings, one schema for any column type), and a KMV
    * distinct-count estimate.
    *
    * ONE aggregation pass over the table computes every metric for every
    * column simultaneously: per-column state is (two scalars + a k-long
    * MinK buffer), so profiling C columns costs one scan and
    * C·(k+2) values of agg state — not C separate COUNT(DISTINCT)
    * subqueries each with its own shuffle of the column's full distinct
    * set. The one-row result explodes into a per-column report at the
    * end (driver-side cost zero; it's a single row).
    */
  def profile(table: DataFrame, cols: Seq[String],
              k: Int = 256): DataFrame =
    renderProfile(profileState(table, cols, k), cols, k)

  /** The MERGEABLE form of [[profile]]: one row of per-column typed
    * state — non-null count, min/max on the NATIVE column type (kept
    * unrendered: a string-typed min of "10" vs "9" would merge wrong
    * for numerics), and the MinK hash buffer. Land it as a standing
    * table and fold new drops in with [[mergeProfileStates]]. */
  def profileState(table: DataFrame, cols: Seq[String],
                   k: Int): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        minK(Dedup.md5Hash64(col(c).cast("string")), k).as(s"mins_$c"))
    }
    // project to the profiled columns, then floor the parallelism
    // (guide §2.3/§2.5): the per-row cost is |cols| md5 hashes + MinK
    // updates in the PARTIAL aggregate, which a single-file scan runs on
    // one core; the fan's exchange carries only the profiled columns and
    // the aggregate output is one row (the q124 countMin shape —
    // measured there 1.91 -> 0.82 s)
    val proj = graft.sources.Tables.fanOut(
      table.select(cols.map(col): _*), struct(cols.map(col): _*))
    proj.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Merge two profile states over DISJOINT row sets: counts add,
    * min/max combine on the native types, and the MinK buffers merge
    * by k smallest DISTINCT of their union (both inputs are ascending
    * distinct k-mins, so sort→distinct→slice of the concatenation IS
    * the union sketch — MinKAgg's semilattice lifted to the table
    * level, the q92 pattern applied to profiling). The distinct step
    * matters: a value present in both slices sits in both buffers, and
    * keeping the duplicate would shift the k-th minimum. */
  def mergeProfileStates(a: DataFrame, b: DataFrame, cols: Seq[String],
                         k: Int): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(col(s"cnt_$c")).as(s"cnt_$c"),
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"),
        slice(array_distinct(array_sort(flatten(
          collect_list(col(s"mins_$c"))))), 1, k).as(s"mins_$c"))
    }
    a.unionByName(b).agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** Explode a profile state into the per-column report ([[profile]]'s
    * output shape; min/max stringify HERE, after any merging). */
  def renderProfile(state: DataFrame, cols: Seq[String],
                    k: Int): DataFrame = {
    val space = math.pow(2.0, 60)
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"cnt_$c").as("n_nonnull"),
        col(s"min_$c").cast("string").as("min_val"),
        col(s"max_$c").cast("string").as("max_val"),
        col(s"mins_$c").as("mins"))
    }: _*)
    state.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_nonnull").as("n_nonnull"),
        col("e.min_val").as("min_val"), col("e.max_val").as("max_val"),
        coalesce(size(col("e.mins")), lit(0)).cast("long").as("n_mins"),
        when(coalesce(size(col("e.mins")), lit(0)) === k,
          element_at(col("e.mins"), k)).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNotNull,
          round(lit((k - 1).toDouble) * lit(space)
            / col("kth_hash").cast("double"), 3))
          .otherwise(col("n_mins").cast("double")))
  }

  /** KMV (k minimum values) distinct-count estimate per group, over the
    * portable 60-bit md5 hash family (Dedup.md5Hash64) so the whole
    * computation — hashes, k-th minimum, estimate arithmetic — is
    * reproducible in any engine with md5.
    *
    * For a group with ≥ k distinct values the k-th smallest hash h_k
    * estimates cardinality as (k-1) · S / h_k with S = 2^60 the hash
    * space; with fewer than k the sketch degenerates to the exact count
    * (the buffer simply holds every distinct hash). Emits the k-th hash
    * itself (exact integer — the oracle-pinnable part) alongside the
    * rounded estimate.
    *
    * Scale: the only state per group crossing the shuffle is the bounded
    * MinKAgg buffer. Hash collisions at 60 bits are negligible at any
    * realistic group cardinality (~2^30 before birthday effects).
    */
  def kmvDistinct(rows: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame =
    kmvDistinctHashed(
      rows.select(col(groupCol), Dedup.md5Hash64(col(valueCol)).as("h")),
      groupCol, "h", k)

  /** kmvDistinct over an already-hashed 60-bit column — for callers whose
    * values come out of a fused kernel (e.g. shingleHashesFast) with the
    * hash computed in the same pass that built the value. */
  def kmvDistinctHashed(rows: DataFrame, groupCol: String,
                        hashCol: String, k: Int): DataFrame = {
    val space = math.pow(2.0, 60)
    rows.select(col(groupCol), col(hashCol).as("h"))
      .groupBy(col(groupCol))
      .agg(minK(col("h"), k).as("mins"))
      .select(col(groupCol), size(col("mins")).cast("long").as("n_mins"),
        when(size(col("mins")) === k,
          element_at(col("mins"), k)).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNotNull,
          round(lit((k - 1).toDouble) * lit(space)
            / col("kth_hash").cast("double"), 3))
          .otherwise(col("n_mins").cast("double")))
  }

  /** Heavy-hitter STATE for a group column: freqItems exploded to
    * (group, item, cnt) rows — the landable/mergeable form (the array
    * stays inside the aggregate; state tables on disk want plain
    * columns). */
  def freqState(df: DataFrame, groupCol: String, itemCol: String,
                k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(freqItems(col(itemCol), k).as("hh"))
      .select(col(groupCol), explode(col("hh")).as("e"))
      .select(col(groupCol), col("e.item").as("item"),
        col("e.cnt").as("cnt"))

  /** Merge two heavy-hitter states (the table-level face of
    * FreqItemsAgg's mergeIn — the PODS-2012 mergeable-summaries step):
    * counts add pointwise, then the (k+1)-th largest count subtracts
    * from everything and non-positives drop, restoring the ≤ k bound.
    * Exact whenever the union stays within k items (both states exact
    * and same support) — merged ≡ rebuilt, the incremental-family
    * contract (q92/q93/q95/q100/q101 shape).
    *
    * Scale posture: the union/sum is state-sized (≤ 2k rows per group),
    * and the rank window partitions over those SAME ≤ 2k rows — bounded
    * by construction, not by data (contrast a per-group window over raw
    * events). History events are never re-read. */
  def mergeFreqStates(standing: DataFrame, batch: DataFrame, k: Int,
                      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val summed = standing.unionByName(batch)
      .groupBy(col(groupCol), col("item"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy(groupCol)
      .orderBy(desc("cnt"), asc("item"))
    val ranked = summed.withColumn("rk", row_number().over(w))
    val thresh = ranked.filter(col("rk") === k + 1)
      .select(col(groupCol), col("cnt").as("thr"))
    ranked.join(thresh, Seq(groupCol), "left")
      .withColumn("cnt", col("cnt") - coalesce(col("thr"), lit(0L)))
      .filter(col("cnt") > 0)
      .select(col(groupCol), col("item"), col("cnt"))
  }

  /** Sort-free EXACT percentiles over a low-cardinality integer domain
    * (the value-histogram formulation): instead of sorting the data per
    * group (the percentile_disc plan — a full shuffle+sort of every
    * row), aggregate to (group, value, count), take a cumulative sum
    * over the DOMAIN-sized histogram, and read each percentile as the
    * smallest value whose cumulative count reaches ceil(n·p/100).
    *
    * Exactly percentile_disc semantics, but the sorted frame is the
    * histogram (|group| × |domain| rows), not the data: quantities,
    * ratings, ages, status codes — domains of tens to thousands — cost
    * a map-side countable aggregate however many billions of rows feed
    * them. The per-group window is domain-bounded by the same argument
    * (documented contract: this is for BOUNDED domains; continuous
    * doubles want a t-digest-style sketch instead). The rank threshold
    * is pure integer arithmetic ((n·p + 99) div 100) — no float
    * boundary to diverge on. */
  def percentilesByValue(df: DataFrame, groupCol: String,
                         valueCol: String,
                         percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(groupCol)))
    val pcols = percentiles.map(p =>
      min(when(col("cum") >= expr(s"(n * $p + 99) div 100"), col("v")))
        .as(s"p$p"))
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), pcols: _*)
  }

  /** Order-preserving double → unsigned-sortable long (native kernel,
    * graft.plans.DoubleSortableBits). */
  def doubleSortableBits(v: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.DoubleSortableBits(
        org.apache.spark.sql.graftops.ColumnBridge.expression(v)))

  /** Sort-free EXACT percentiles over a CONTINUOUS double domain — the
    * radix-select companion to [[percentilesByValue]] (which covers
    * bounded integer domains). percentile_disc semantics: for each p,
    * the value whose ascending rank is ceil(n·p/100).
    *
    * A global percentile_disc plan sorts the whole column through one
    * range shuffle; this operator never sorts and never shuffles data
    * rows at all. Each double maps to its unsigned-sortable 64-bit
    * image (order-preserving bijection, plans/SortableBits.scala); the
    * quantile is then radix-selected in FOUR aggregation passes, one
    * per 16-bit digit: each pass histograms the current digit of only
    * the rows matching each target's resolved prefix (map-side partial
    * aggregation, ≤ 65 536 counters per open prefix), the driver walks
    * the ≤ |targets|·65 536 counts to fix the next digit, and after the
    * last pass the full 64-bit image IS the answer (inverted back to
    * its double). Selection state on the driver is a few longs per
    * target — the same bounded-driver-state discipline as the IVF
    * centroid loop — and the column is scanned 4× with pushed
    * projection, the trade a 100 TB sort can't offer.
    *
    * NULL and NaN rows are excluded (NaN has no defined rank). Returns
    * one row per requested percentile: (p, rk, n, value). */
  def bisectQuantiles(df: DataFrame, valueCol: String,
                      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    val spark = df.sparkSession
    import spark.implicits._
    val m = df
      .filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(doubleSortableBits(col(valueCol).cast("double")).as("m"))

    // digit histogram at `depth` (0-based, high digit first) for the
    // open prefixes; returns (prefix, digit) -> count
    def digitHist(depth: Int, prefixes: Seq[Long]): Map[(Long, Int), Long] = {
      val shift = 48 - 16 * depth
      val pfx =
        if (depth == 0) lit(0L)
        else shiftrightunsigned(col("m"), shift + 16)
      val rows = m.withColumn("pfx", pfx)
        .filter(if (depth == 0) lit(true) else col("pfx").isin(prefixes: _*))
        .withColumn("d",
          shiftrightunsigned(col("m"), shift).bitwiseAND(lit(0xffffL))
            .cast("int"))
        .groupBy("pfx", "d").agg(count(lit(1)).as("c"))
        .collect()
      rows.map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    }

    val first = digitHist(0, Seq(0L))
    val n = first.valuesIterator.sum
    val ps = percentiles.distinct.sorted
    if (n == 0L) {
      return ps.map(p => (p.toLong, 0L, 0L, Option.empty[Double]))
        .toDF("p", "rk", "n", "value")
    }
    // state per target: (resolved prefix, rank remaining WITHIN prefix)
    var state: Map[Int, (Long, Long)] =
      ps.map(p => p -> (0L, (n * p + 99) / 100)).toMap

    def advance(hist: Map[(Long, Int), Long]): Unit =
      state = state.map { case (p, (pfx, rem)) =>
        val buckets = (0 until 65536).iterator
          .map(d => d -> hist.getOrElse((pfx, d), 0L))
          .filter(_._2 > 0)
        var cum = 0L
        var res: (Long, Long) = null
        while (res == null && buckets.hasNext) {
          val (d, c) = buckets.next()
          if (cum + c >= rem) res = ((pfx << 16) | d.toLong, rem - cum)
          else cum += c
        }
        require(res != null, s"rank $rem not reachable under prefix $pfx")
        p -> res
      }

    advance(first)
    (1 to 3).foreach { depth =>
      advance(digitHist(depth, state.values.map(_._1).toSeq.distinct))
    }
    ps.map { p =>
      val u = state(p)._1
      (p.toLong, (n * p + 99) / 100, n,
        Some(graft.plans.SortableBitsKernel.fromSortable(u)))
    }.toDF("p", "rk", "n", "value")
  }

  /** Count-Min sketch state over the portable md5-60 hash family — the
    * point-frequency member of the sketch family (Misra-Gries answers
    * "what are the heavy items", Count-Min answers "about how often is
    * THIS item" in width×depth cells of memory however many distinct
    * items exist). Each of the `depth` hash rows buckets every
    * occurrence into `width` cells; a cell's count is an EXACT sum —
    * the sketch's CONTENT is deterministic data (only point queries
    * approximate) — so the table is mergeable by plain count addition
    * (a standing-artifact candidate like the degree table) and exactly
    * restatable in any engine with md5 (the q123 hash discipline).
    *
    * Plan: one ×depth explode + one (width·depth)-bounded hash
    * aggregate with map-side combine; nothing row-sized shuffles. */
  def countMin(df: DataFrame, itemCol: String, width: Int,
               depth: Int, fan: Boolean = true): DataFrame = {
    require(width > 0 && depth > 0,
      s"width/depth must be positive, got $width/$depth")
    // project to the item column BEFORE the fan-out (guide §2.3), then
    // floor the parallelism: depth md5 hashes per input row is the
    // query's dominant kernel and a single-file scan runs it on one core.
    // `fan = false` for MICRO-BATCH callers (SketchStreams.cmBatch): a
    // batch is small by contract, so the exchange is pure overhead next
    // to its kernel — measured r19: q250 1.92 s -> 2.62 s isolated with
    // the fan, the exact inverse of q124's one-shot 1.91 -> 0.82 win.
    val proj = df.select(col(itemCol).cast("string").as("item"))
    val items =
      if (fan) graft.sources.Tables.fanOut(proj, col("item")) else proj
    items.select(explode(array((0 until depth).map(lit): _*)).as("j"),
        col("item"))
      .select(col("j"), cmCell(col("j"), col("item"), width).as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
  }

  private def cmCell(j: Column, item: Column, width: Int): Column =
    pmod(Dedup.md5Hash64(concat(lit("cm:"), j.cast("string"), lit(":"),
      item)), lit(width.toLong))

  /** Merge two Count-Min states built with the same geometry over
    * disjoint row sets: cell counts add. */
  def mergeCountMin(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "cell").agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates from a Count-Min state: for each probe
    * item, min over hash rows of its cell count — always ≥ the true
    * count (collisions only ever inflate), within εn with probability
    * 1−δ for width = e/ε, depth = ln(1/δ). The probe side is
    * probe-set-sized; the sketch is width×depth rows — both tiny. */
  def cmEstimate(cm: DataFrame, items: DataFrame, itemCol: String,
                 width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0,
      s"width/depth must be positive, got $width/$depth")
    items.select(col(itemCol).cast("string").as("item")).distinct()
      .select(col("item"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("cell", cmCell(col("j"), col("item"), width))
      .join(cm, Seq("j", "cell"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Count-Min JOIN-SIZE estimate (the CM inner-product estimator,
    * Cormode & Muthukrishnan 2005): for two sketches with the same
    * geometry over the two join keys, Σ_cells cm_a·cm_b per hash row,
    * minimized over rows, upper-bounds the true equi-join output
    * cardinality — collisions only ever inflate the product. The
    * sketch-budget counterpart of Skew.joinDiagnostics' exact pass:
    * diagnostics cost a key-count shuffle per side; this costs two
    * standing width×depth tables you may already maintain
    * (SketchStreams.cmBatch) and a (width·depth)-row join.
    *
    * A hash row whose cells don't overlap at all has a true inner
    * product of 0, so it must still reach the min — the per-row IPs
    * are rebuilt over the full j domain (left join + coalesce 0)
    * rather than taken from the overlap join alone. Disjoint key sets
    * therefore estimate 0 (one row), not an empty frame; two empty
    * sketches estimate 0 as well (an empty input joins with nobody). */
  def cmJoinSizeEstimate(cmA: DataFrame, cmB: DataFrame): DataFrame = {
    val overlap = cmA.select(col("j"), col("cell"), col("cnt").as("ca"))
      .join(cmB.select(col("j"), col("cell"), col("cnt").as("cb")),
        Seq("j", "cell"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
    // every input row populates all depth hash rows, so either sketch's
    // distinct j IS the row domain (union covers the one-side-empty edge)
    cmA.select("j").union(cmB.select("j")).distinct()
      .join(overlap, Seq("j"), "left")
      .agg(coalesce(min(coalesce(col("ip"), lit(0L))), lit(0L))
        .as("est_out_rows"))
  }

  /** KLL-class mergeable quantile sketch of a long column
    * (graft.plans.KllAgg): array<struct<v:long, w:long>> sorted by
    * (v, w) — a weighted sample whose total weight is EXACTLY the
    * group's item count. EXACT while the group has ≤ k items (no
    * compaction: every w = 1 and the array IS the sorted multiset — the
    * oracle-checkable regime, like freqItems' ≤ k distinct contract);
    * past k, rank queries err by a bounded fraction of n (KllSpec
    * property-tests the bound). This is the missing quantile member of
    * the standing-sketch family: unlike [[bisectQuantiles]] (exact but
    * four batch passes over the column), a landed KLL state answers
    * quantile queries from O(k) bytes and folds new batches in without
    * re-reading history ([[mergeKllSketches]] /
    * streaming.MonitorStreams.kllBatch). */
  def kllSketch(values: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.KllAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** Merge externalized KLL sketches (the array form [[kllSketch]]
    * emits): the level structure is recoverable from w = 2^level, so
    * merging is levelwise concatenation + the same compaction — merged
    * ≡ rebuilt bit-for-bit while the combined count stays ≤ k (the
    * exact regime), within the rank-error bound beyond. */
  def mergeKllSketches(sketches: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.KllAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(sketches),
        k, fromSketches = true).toAggregateExpression())

  /** Quantile report from a sketch table: one row per (group row ×
    * requested percentile) with percentile_disc semantics over the
    * weighted sample — rank target ceil(n·p/100) in the same integer
    * arithmetic as [[percentilesByValue]]/[[bisectQuantiles]], answered
    * by a linear scan of the (v-sorted) sketch array. All sketch-sized
    * work (the arrays are O(k)); no shuffle beyond whatever built the
    * sketch table. Output: input columns minus the sketch, plus
    * (p, rk, n, value). Rows with a NULL sketch are dropped (a group
    * with no input has no quantiles). */
  def kllQuantileReport(sketches: DataFrame, sketchCol: String,
                        percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    val keep = sketches.columns.filterNot(_ == sketchCol).map(col)
    val accT = "struct<cum:bigint,ans:bigint>"
    val withN = sketches.filter(col(sketchCol).isNotNull)
      // Project boundary: n is referenced once per percentile below;
      // materializing it here keeps the HOF fold from re-running per
      // reference (CollapseProject protects non-cheap multi-ref aliases
      // across boundaries only)
      .withColumn("_kll_n", aggregate(col(sketchCol), lit(0L),
        (acc, x) => acc + x.getField("w")))
    val targets = array(percentiles.distinct.sorted.map { p =>
      struct(lit(p.toLong).as("p"),
        expr(s"(_kll_n * $p + 99) div 100").as("rk"))
    }: _*)
    withN
      .select(keep :+ col(sketchCol) :+ col("_kll_n").as("n") :+
        explode(targets).as("t"): _*)
      .withColumn("value", aggregate(col(sketchCol),
        struct(lit(0L).as("cum"), lit(null).cast("long").as("ans"))
          .cast(accT),
        (acc, x) => when(acc.getField("ans").isNotNull, acc)
          .otherwise(struct(
            (acc.getField("cum") + x.getField("w")).as("cum"),
            when(acc.getField("cum") + x.getField("w") >= col("t.rk"),
              x.getField("v")).as("ans")).cast(accT)),
        acc => acc.getField("ans")))
      .select(keep :+ col("t.p").as("p") :+ col("t.rk").as("rk") :+
        col("n") :+ col("value"): _*)
  }

  /** Population-stability-index (PSI) drift report between two
    * snapshots of a value distribution — the monitoring operator a
    * pipeline runs before trusting a new drop of data against the last
    * one (the drift member of the profiling family: [[profile]] checks
    * shape, this checks SHIFT). Values land in fixed-width bins; counts
    * get Laplace +1 smoothing over the union bin set (both sides
    * defined on every bin); and the per-bin PSI contribution
    * (p−q)·ln(p/q) is factored so everything but one logarithm is
    * EXACT integer arithmetic: with x = (cnt_a+1)(n_b+B) and
    * y = (cnt_b+1)(n_a+B), p−q = (x−y)/D for the bin-independent
    * D = (n_a+B)(n_b+B), so contrib = (x−y)·floor(1000·ln(x/y)) is an
    * exact int64 and PSI = Σ contrib / (D·1000). The single ln per bin
    * is one IEEE operation on an integer-derived ratio — deterministic
    * in any engine (the q105 millinats discipline).
    *
    * Plan: two map-side bin aggregates (bin-domain-sized state), a
    * full-outer join of the two bin tables, a one-row totals broadcast
    * — nothing row-sized ever shuffles. Contract: (max count + 1) ×
    * (n + B) must fit int64 — daily/weekly monitoring slices, not
    * all-history totals. */
  def psiDrift(a: DataFrame, b: DataFrame, valueCol: String,
               binWidth: Double): DataFrame =
    psiFromBins(binCounts(a, valueCol, binWidth),
      binCounts(b, valueCol, binWidth))

  /** Fixed-width bin histogram of a value column: (bin, cnt) — the
    * landable/mergeable state behind [[psiDrift]] (two snapshots'
    * states compare via [[psiFromBins]]; a standing state folds new
    * batches in by count addition — streaming/MonitorStreams). */
  def binCounts(df: DataFrame, valueCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.select(floor(col(valueCol).cast("double") / binWidth)
        .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** [[psiDrift]] over two PRE-BINNED (bin, cnt) states — the form a
    * monitoring pipeline uses against a landed reference histogram. */
  def psiFromBins(binsA: DataFrame, binsB: DataFrame): DataFrame = {
    val joined = binsA.select(col("bin"), col("cnt").as("cnt_a"))
      .join(binsB.select(col("bin"), col("cnt").as("cnt_b")),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = joined.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"), count(lit(1)).as("n_bins"))
    joined.crossJoin(broadcast(totals))
      .withColumn("x", (col("cnt_a") + 1) * (col("n_b") + col("n_bins")))
      .withColumn("y", (col("cnt_b") + 1) * (col("n_a") + col("n_bins")))
      .withColumn("delta_num", col("x") - col("y"))
      .withColumn("ln_milli",
        floor(log(col("x").cast("double") / col("y").cast("double"))
          * lit(1e3)).cast("long"))
      .select(col("bin"), col("cnt_a"), col("cnt_b"), col("n_a"),
        col("n_b"), col("n_bins"), col("delta_num"), col("ln_milli"),
        (col("delta_num") * col("ln_milli")).as("contrib"))
  }

  /** [[psiDrift]] per GROUP — drift monitored per segment (per source,
    * per event type, per language) instead of corpus-wide, so a shift
    * confined to one segment isn't averaged away by the stable rest.
    * Same factored-integer contributions; the bin tables and totals
    * carry the group key and the totals join is group-table-sized
    * (never broadcast-hinted — group counts are unbounded in
    * principle). Output adds the group column ahead of q121's shape. */
  def psiDriftByGroup(a: DataFrame, b: DataFrame, groupCol: String,
                      valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bins(df: DataFrame, cname: String) = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        floor(col(valueCol).cast("double") / binWidth)
          .cast("long").as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as(cname))
    val joined = bins(a, "cnt_a")
      .join(bins(b, "cnt_b"), Seq("g", "bin"), "full_outer")
      .select(col("g"), col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = joined.groupBy("g")
      .agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"),
        count(lit(1)).as("n_bins"))
    joined.join(totals, Seq("g"))
      .withColumn("x", (col("cnt_a") + 1) * (col("n_b") + col("n_bins")))
      .withColumn("y", (col("cnt_b") + 1) * (col("n_a") + col("n_bins")))
      .withColumn("delta_num", col("x") - col("y"))
      .withColumn("ln_milli",
        floor(log(col("x").cast("double") / col("y").cast("double"))
          * lit(1e3)).cast("long"))
      .select(col("g").as(groupCol), col("bin"), col("cnt_a"),
        col("cnt_b"), col("n_a"), col("n_b"), col("n_bins"),
        col("delta_num"), col("ln_milli"),
        (col("delta_num") * col("ln_milli")).as("contrib"))
  }

  /** Per-GROUP radix-select exact quantiles over a continuous double
    * domain — [[bisectQuantiles]] lifted to groups the way
    * [[percentilesByValue]] is the grouped histogram form. Same four
    * digit-histogram passes; each pass aggregates (group, prefix,
    * digit) counts for only the OPEN (group, prefix) pairs (a literal
    * disjunction — |groups|·|percentiles| terms at most), so the
    * contract is a BOUNDED group count (dashboard dimensions: return
    * flags, languages, sources), mirroring percentilesByValue's
    * bounded-domain contract. Driver state stays a few longs per
    * (group, percentile). NULL groups and NULL/NaN values are
    * excluded. Output: (groupCol, p, rk, n, value).
    *
    * The bounded-group contract is ENFORCED, not just documented:
    * the call fails fast once the observed group count exceeds
    * `maxGroups` (raise it deliberately for a wider dashboard
    * dimension) rather than growing the literal frontier predicate
    * and the collected histogram without bound. */
  def bisectQuantilesByGroup(df: DataFrame, groupCol: String,
                             valueCol: String,
                             percentiles: Seq[Int],
                             maxGroups: Int = 64): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    require(maxGroups > 0, s"maxGroups must be positive, got $maxGroups")
    val spark = df.sparkSession
    val m = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(col(groupCol).as("g"),
        doubleSortableBits(col(valueCol).cast("double")).as("m"))

    def hist(depth: Int,
             open: Seq[(Any, Long)]): Map[(Any, Long, Int), Long] = {
      val shift = 48 - 16 * depth
      val pfxCol =
        if (depth == 0) lit(0L)
        else shiftrightunsigned(col("m"), shift + 16)
      val base = m.withColumn("pfx", pfxCol)
      val filtered =
        if (depth == 0) base
        else base.filter(open.map { case (gv, p) =>
          col("g") === lit(gv) && col("pfx") === lit(p)
        }.reduce(_ || _))
      filtered
        .withColumn("d",
          shiftrightunsigned(col("m"), shift).bitwiseAND(lit(0xffffL))
            .cast("int"))
        .groupBy("g", "pfx", "d").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.get(0), r.getLong(1), r.getInt(2)) -> r.getLong(3))
        .toMap
    }

    val gField = df.schema(groupCol)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      gField.copy(nullable = false),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rk",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType, nullable = false)))

    val first = hist(0, Nil)
    if (first.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    val groups = first.keysIterator.map(_._1).toSeq.distinct
    require(groups.size <= maxGroups,
      s"bisectQuantilesByGroup saw ${groups.size} groups in '$groupCol' " +
        s"(cap $maxGroups): the per-pass frontier predicate and driver " +
        "histogram grow linearly in the group count — pre-aggregate the " +
        "dimension or raise maxGroups deliberately")
    val nByG = groups.map(g =>
      g -> first.iterator.collect {
        case ((gg, _, _), c) if gg == g => c
      }.sum).toMap
    val ps = percentiles.distinct.sorted
    var state: Map[(Any, Int), (Long, Long)] =
      (for { g <- groups; p <- ps }
        yield (g, p) -> (0L, (nByG(g) * p + 99) / 100)).toMap

    def advance(h: Map[(Any, Long, Int), Long]): Unit =
      state = state.map { case ((g, p), (pfx, rem)) =>
        var cum = 0L
        var res: (Long, Long) = null
        var d = 0
        while (res == null && d < 65536) {
          val c = h.getOrElse((g, pfx, d), 0L)
          if (c > 0) {
            if (cum + c >= rem) res = ((pfx << 16) | d.toLong, rem - cum)
            else cum += c
          }
          d += 1
        }
        require(res != null, s"rank $rem unreachable in group $g")
        (g, p) -> res
      }

    advance(first)
    (1 to 3).foreach { depth =>
      // .toSeq BEFORE mapping: mapping the Map directly would rebuild a
      // Map keyed by group and silently drop all but one open prefix
      // per group
      advance(hist(depth,
        state.toSeq.map { case ((g, _), (pfx, _)) => (g, pfx) }.distinct))
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList[org.apache.spark.sql.Row]()
    for { g <- groups; p <- ps } rows.add(org.apache.spark.sql.Row(
      g, p.toLong, (nByG(g) * p + 99) / 100, nByG(g),
      graft.plans.SortableBitsKernel.fromSortable(state((g, p))._1)))
    spark.createDataFrame(rows, outSchema)
  }

  /** HyperLogLog register table (Flajolet, Fusy, Gandouet & Meunier,
    * AofA 2007) over the portable md5-60 hash family — the
    * distinct-count member of the standing-sketch family next to KMV
    * ([[kmvDistinct]]): KMV keeps k hash VALUES (mergeable by min-k
    * re-merge), HLL keeps 2^p bounded REGISTERS mergeable by plain
    * elementwise max, the property that makes it the industry-standard
    * streaming distinct counter. idx = top p bits of the 60-bit hash,
    * rho = leading-zero count of the remaining (60-p) bits + 1 (the
    * Spark face uses conv-to-binary length; the DuckDB face bin() —
    * both exact integer ops on the same hash, so the register CONTENT
    * is engine-portable data, like the Count-Min cell table).
    *
    * Only OCCUPIED registers are materialized (absent idx ⇒ rho 0);
    * the table is ≤ 2^p rows per group after the one bounded hash
    * aggregate (map-side partial max), so at 100 TB the shuffle carries
    * ≤ m·partitions narrow rows per group, never the value column. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val wBits = 60 - p
    val h = Dedup.md5Hash64(col(valueCol).cast("string"))
    df.select(col(groupCol), h.as("h"))
      .select(col(groupCol), shiftright(col("h"), wBits).as("idx"),
        col("h").bitwiseAND(lit((1L << wBits) - 1)).as("wv"))
      .select(col(groupCol), col("idx"),
        when(col("wv") === 0, lit(wBits + 1).cast("long"))
          .otherwise((lit(wBits + 1) - length(conv(col("wv"), 10, 2)))
            .cast("long"))
          .as("rho"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge two HLL register tables with the same p over any row sets
    * (not necessarily disjoint — max is idempotent, unlike Count-Min's
    * sum): registers take the elementwise max. */
  def mergeHll(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("rho"))

  /** HLL set-operation estimates over all unordered group PAIRS: union
    * cardinality from the max-merged registers (exact for HLL — the
    * union sketch IS the sketch of the union), intersection by
    * inclusion-exclusion (est_a + est_b − est_union, clamped at 0 —
    * the standard estimator; its error grows as the true intersection
    * shrinks, which is why the exact count should ride along where
    * auditable). This is the audience-overlap query a standing
    * register table answers WITHOUT rescanning any data: pairs ×
    * register-table-sized joins only. */
  def hllPairOverlaps(regs: DataFrame, groupCol: String,
                      p: Int = 9): DataFrame = {
    val pairs = regs.select(col(groupCol)).distinct()
      .select(col(groupCol).as("ga"))
      .join(regs.select(col(groupCol)).distinct()
        .select(col(groupCol).as("gb")), col("ga") < col("gb"))
    val ra = pairs.join(
      regs.select(col(groupCol).as("ga"), col("idx"), col("rho")),
      Seq("ga"))
    val rb = pairs.join(
      regs.select(col(groupCol).as("gb"), col("idx"), col("rho")),
      Seq("gb"))
    // pair key is a STRUCT, not a string concat: group values containing
    // the would-be separator can't alias two distinct pairs into one key
    // (which would silently max-merge their registers)
    val unionRegs = ra.unionByName(rb)
      .withColumn("pk", struct(col("ga"), col("gb")))
      .groupBy(col("pk"), col("idx")).agg(max(col("rho")).as("rho"))
    val estU = hllEstimate(unionRegs, "pk", p)
      .select(col("pk"), col("estimate").as("est_union"))
    val est1 = hllEstimate(regs, groupCol, p)
    pairs
      .join(est1.select(col(groupCol).as("ga"),
        col("estimate").as("est_a")), Seq("ga"))
      .join(est1.select(col(groupCol).as("gb"),
        col("estimate").as("est_b")), Seq("gb"))
      .withColumn("pk", struct(col("ga"), col("gb")))
      .join(estU, Seq("pk"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(lit(0L),
          col("est_a") + col("est_b") - col("est_union"))
          .as("est_inter"))
  }

  /** Cardinality estimates from an HLL register table. The harmonic
    * sum is computed in EXACT int64 — Σ_j 2^(rMax − rho_j) with
    * rMax = 60−p+1, absent registers contributing 2^rMax — so both
    * engines reach the identical integer before the one fixed float
    * expression (the q167/q168 determinism discipline); the classic
    * small-range correction switches to linear counting (m·ln(m/V))
    * while any register is empty and the raw estimate is below 5m/2.
    * Estimates floor to whole counts. */
  def hllEstimate(regs: DataFrame, groupCol: String,
                  p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = (1 << p).toLong
    val rMax = 60 - p + 1
    // alpha_m as the literal expression both engines evaluate identically:
    // the closed form 0.7213/(1+1.079/m) is Flajolet 2007 §4's constant
    // for m ≥ 128; below that the paper prescribes the measured constants
    // 0.673 / 0.697 / 0.709 for m = 16 / 32 / 64 (using the closed form
    // there biases estimates noticeably).
    val alpha = m match {
      case 16L => "0.673"
      case 32L => "0.697"
      case 64L => "0.709"
      case _   => s"(0.7213 / (1.0 + 1.079 / $m.0))"
    }
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(cast(1 as bigint), $rMax - cast(rho as int))"))
          .as("s_occ"))
      .withColumn("zeros", lit(m) - col("occupied"))
      .withColumn("s_int",
        col("s_occ") + col("zeros") * lit(1L << rMax))
      .withColumn("est_raw",
        expr(s"$alpha * $m.0 * $m.0 * cast(shiftleft(cast(1 as bigint), " +
          s"$rMax) as double) / cast(s_int as double)"))
      .withColumn("estimate",
        when(col("zeros") > 0 && col("est_raw") <= lit(2.5 * m),
          floor(expr(s"$m.0 * ln($m.0 / cast(zeros as double))")))
          .otherwise(floor(col("est_raw"))).cast("long"))
      .select(col(groupCol), col("occupied"), col("zeros"),
        col("estimate"))
  }
}
