package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators (the OPTIMIZE ZORDER face of
  * table maintenance): at 100 TB the scan you never run is the cheapest,
  * and what decides whether a predicate prunes files is the LAYOUT —
  * how rows were clustered when written — not the query plan. Z-order
  * clustering sorts by the Morton interleave of two key columns so
  * per-file min/max stats stay tight in BOTH dimensions, where a
  * single-column sort leaves the second dimension's bounds spanning the
  * whole domain (zero pruning).
  */
object Layout {

  /** 62-bit Morton code of two long columns in [0, 2^31) (native
    * kernel, graft.plans.InterleaveBits31). */
  def zOrderKey(x: Column, y: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.InterleaveBits31(
        org.apache.spark.sql.graftops.ColumnBridge.expression(x),
        org.apache.spark.sql.graftops.ColumnBridge.expression(y)))

  /** Per-bucket layout-quality report for a FIXED-GRID z-order
    * bucketing: each dimension first normalizes to a 16-bit fixed-point
    * fraction of its [min, max] range (pure integer arithmetic — the
    * min/max pair is a one-row broadcast, the A5 scalar pattern — so
    * the grid adapts to the actual domain instead of assuming keys fill
    * 31 bits), rows land in bucket = top `bucketBits` bits of the
    * 32-bit Morton code of the normalized pair (deterministic — no
    * sampled range boundaries), and each bucket reports its row count
    * and per-dimension min/max — the pruning stats a file written from
    * that bucket would carry. The report itself is ONE
    * map-side-combinable aggregate (2^bucketBits × 6 longs of state);
    * nothing sorts and nothing shuffles data rows.
    *
    * Reading the report: a z-ordered grid bucket covers a contiguous
    * Morton range, so its x/y bounding boxes are ~√buckets× tighter per
    * dimension than a one-dimensional bucketing of either key alone —
    * which is exactly the file-skipping win.
    *
    * Range contract (int64 fit, like psiDrift's overflow note): the
    * fixed-point normalization computes (x − min) · 65535 in int64, so
    * each dimension's [min, max] RANGE must stay ≤ 2^47 (≤ 2^42 for
    * the 3-D variant's 21-bit scale); a wider domain silently corrupts
    * bucket assignment. Wider domains should pre-scale (divide first)
    * or use [[zOrderBucketStatsFixed]], which enforces the contract
    * loudly on its declared bounds.
    *
    * This form normalizes by the table's GLOBAL min/max — the tightest
    * grid, but bucket stats cannot fold incrementally (a wave can't
    * know the final range). For a standing, mergeable report use
    * [[zOrderBucketStatsFixed]]. */
  def zOrderBucketStats(df: DataFrame, xCol: String, yCol: String,
                        bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val k = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val mm = k.agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    k.crossJoin(broadcast(mm))
      .withColumn("xn", expr("CASE WHEN mxx = mnx THEN CAST(0 AS BIGINT) " +
        "ELSE ((x - mnx) * 65535) DIV (mxx - mnx) END"))
      .withColumn("yn", expr("CASE WHEN mxy = mny THEN CAST(0 AS BIGINT) " +
        "ELSE ((y - mny) * 65535) DIV (mxy - mny) END"))
      .withColumn("z", zOrderKey(col("xn"), col("yn")))
      .groupBy(shiftrightunsigned(col("z"), 32 - bucketBits)
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** [[zOrderBucketStats]] over DECLARED absolute domain bounds — the
    * INCREMENTAL form: because the grid is fixed a priori instead of
    * derived from the table's global min/max, a wave's bucket stats are
    * a pure function of the wave's rows, so standing stats fold by
    * count addition + min/max combine ([[mergeZOrderStats]] — the q119
    * recipe) and a streaming maintainer can keep the layout report of
    * an append-heavy table current without ever rescanning history
    * (streaming.MonitorStreams.zorderBatch). Values outside the
    * declared bounds CLAMP into the edge cells (their raw values still
    * report in min/max, so the evidence of an out-of-domain write is
    * visible in the edge buckets' bounds).
    *
    * Beyond mergeability this is also map-side cheaper than the global
    * form: no min/max pre-pass, no one-row broadcast — one fixed-grid
    * aggregate, full stop. The price is grid tightness: declare bounds
    * close to the real domain or the rows crowd into few cells.
    *
    * Range contract enforced loudly: each declared range must be
    * positive and ≤ 2^47 (the 16-bit fixed-point product must fit
    * int64). */
  def zOrderBucketStatsFixed(df: DataFrame, xCol: String, yCol: String,
                             bucketBits: Int, xMin: Long, xMax: Long,
                             yMin: Long, yMax: Long): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    require(xMax > xMin && yMax > yMin,
      s"declared domains must be non-empty: [$xMin,$xMax] [$yMin,$yMax]")
    require(xMax - xMin <= (1L << 47) && yMax - yMin <= (1L << 47),
      "declared range exceeds 2^47: the 16-bit fixed-point product " +
        "would overflow int64 — pre-scale the column instead")
    val k = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    k.withColumn("xc", least(greatest(col("x"), lit(xMin)), lit(xMax)))
      .withColumn("yc", least(greatest(col("y"), lit(yMin)), lit(yMax)))
      .withColumn("xn",
        expr(s"((xc - $xMin) * 65535) DIV (${xMax - xMin})"))
      .withColumn("yn",
        expr(s"((yc - $yMin) * 65535) DIV (${yMax - yMin})"))
      .withColumn("z", zOrderKey(col("xn"), col("yn")))
      .groupBy(shiftrightunsigned(col("z"), 32 - bucketBits)
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** Fold two fixed-grid bucket-stat reports built with the SAME
    * declared domain and bucketBits (the standing-artifact merge:
    * counts add, bounds combine — exactly associative/commutative, so
    * merged ≡ rebuilt bit-for-bit, q135's oracle-checked contract). */
  def mergeZOrderStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket")
      .agg(sum(col("n")).as("n"),
        min(col("min_x")).as("min_x"), max(col("max_x")).as("max_x"),
        min(col("min_y")).as("min_y"), max(col("max_y")).as("max_y"))

  /** Hilbert position of two long columns in [0, 2^16) (native kernel,
    * graft.plans.HilbertIndex) — the locality-preserving alternative to
    * [[zOrderKey]]: consecutive positions are always grid neighbours,
    * so buckets are connected blobs with tighter bounding boxes. */
  def hilbertKey(x: Column, y: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.HilbertIndex(
        org.apache.spark.sql.graftops.ColumnBridge.expression(x),
        org.apache.spark.sql.graftops.ColumnBridge.expression(y), 16))

  /** [[zOrderBucketStats]] with the Hilbert key instead of Morton —
    * identical normalization, bucketing and aggregate shape (and the
    * same ≤ 2^47 range contract), so the two reports compare
    * bucket-for-bucket: the Hilbert buckets' per-dimension bounding
    * boxes are the tighter ones on range probes (its buckets are
    * connected curve segments; a same-size Morton bucket can span two
    * disconnected quadrants at every power-of-two seam). */
  def hilbertBucketStats(df: DataFrame, xCol: String, yCol: String,
                         bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val k = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val mm = k.agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    k.crossJoin(broadcast(mm))
      .withColumn("xn", expr("CASE WHEN mxx = mnx THEN CAST(0 AS BIGINT) " +
        "ELSE ((x - mnx) * 65535) DIV (mxx - mnx) END"))
      .withColumn("yn", expr("CASE WHEN mxy = mny THEN CAST(0 AS BIGINT) " +
        "ELSE ((y - mny) * 65535) DIV (mxy - mny) END"))
      .withColumn("h", hilbertKey(col("xn"), col("yn")))
      .groupBy(shiftrightunsigned(col("h"), 32 - bucketBits)
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** 63-bit Morton code of three long columns in [0, 2^21) (native
    * kernel, graft.plans.InterleaveBits3x21). */
  def zOrderKey3(x: Column, y: Column, z: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.InterleaveBits3x21(
        org.apache.spark.sql.graftops.ColumnBridge.expression(x),
        org.apache.spark.sql.graftops.ColumnBridge.expression(y),
        org.apache.spark.sql.graftops.ColumnBridge.expression(z)))

  /** [[zOrderBucketStats]] for THREE dimensions: each normalizes to a
    * 21-bit fixed-point fraction of its range, buckets are the top
    * `bucketBits` bits of the 63-bit Morton code, and every bucket
    * reports min/max in all three dimensions — the pruning stats that
    * let predicates on ANY of the three columns skip files. Same
    * single-aggregate shape as the 2-D form. Range contract: each
    * dimension's [min, max] range must stay ≤ 2^42 (21-bit scale in
    * int64 — see [[zOrderBucketStats]]' overflow note). */
  def zOrderBucketStats3(df: DataFrame, xCol: String, yCol: String,
                         zCol: String, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val k = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"), col(zCol).cast("long").as("z"))
    val mm = k.agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"),
      min(col("z")).as("mnz"), max(col("z")).as("mxz"))
    val scale = (1 << 21) - 1
    k.crossJoin(broadcast(mm))
      .withColumn("xn", expr("CASE WHEN mxx = mnx THEN CAST(0 AS BIGINT) " +
        s"ELSE ((x - mnx) * $scale) DIV (mxx - mnx) END"))
      .withColumn("yn", expr("CASE WHEN mxy = mny THEN CAST(0 AS BIGINT) " +
        s"ELSE ((y - mny) * $scale) DIV (mxy - mny) END"))
      .withColumn("zn", expr("CASE WHEN mxz = mnz THEN CAST(0 AS BIGINT) " +
        s"ELSE ((z - mnz) * $scale) DIV (mxz - mnz) END"))
      .withColumn("m", zOrderKey3(col("xn"), col("yn"), col("zn")))
      .groupBy(shiftrightunsigned(col("m"), 63 - bucketBits)
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
  }

  /** Prepare a frame for a z-order-clustered WRITE: range-partition by
    * the Morton key into `numFiles` partitions and sort within each, so
    * every written file covers a disjoint z range (and therefore a
    * tight bounding box in both dimensions). The range boundaries are
    * Spark's sampled ones — the right tool for a writer, where balance
    * matters and determinism doesn't; the oracle-checked face of the
    * layout is [[zOrderBucketStats]]' fixed grid. */
  def zOrderCluster(df: DataFrame, xCol: String, yCol: String,
                    numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("z",
        zOrderKey(col(xCol).cast("long"), col(yCol).cast("long")))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
  }

  /** Per-FILE pruning stats of a landed parquet table: for each file,
    * row count and min/max of both dimensions — exactly the footer
    * stats a reader's file-skipping consults. */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("file")
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** One-row layout-quality summary of a landed table: file count and
    * the summed per-file extents/bounding-box areas — the quantity a
    * point/range predicate's expected file-skip rate is inversely
    * proportional to. */
  def layoutReport(spark: org.apache.spark.sql.SparkSession,
                   path: String, xCol: String, yCol: String,
                   label: String): DataFrame =
    fileStats(spark, path, xCol, yCol)
      .agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
        sum(col("max_x") - col("min_x")).as("sum_x_extent"),
        sum(col("max_y") - col("min_y")).as("sum_y_extent"),
        sum((col("max_x") - col("min_x"))
          * (col("max_y") - col("min_y"))).as("sum_area"))
      .select(lit(label).as("layout"), col("n_files"), col("n_rows"),
        col("sum_x_extent"), col("sum_y_extent"), col("sum_area"))

  /** [[zOrderCluster]]'s Hilbert-curve sibling: normalize both
    * dimensions to the curve's 2^16 grid (16-bit fixed point over the
    * table's global min/max — a one-row broadcast, the A5 scalar
    * pattern; the Hilbert kernel's domain is [0, 2^16) where Morton's
    * is [0, 2^31), hence the explicit normalization here), then
    * range-partition + sort by the Hilbert position. Because
    * consecutive Hilbert positions are always grid NEIGHBOURS, each
    * written file covers one connected blob of the plane — no
    * power-of-two seam jumps — so per-file bounding boxes on a
    * diagonal range probe are tighter than the Morton layout's
    * (Round10Spec pins files-touched hilbert ≤ z-order). */
  def hilbertCluster(df: DataFrame, xCol: String, yCol: String,
                     numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val mm = df.agg(
      min(col(xCol).cast("long")).as("_mnx"),
      max(col(xCol).cast("long")).as("_mxx"),
      min(col(yCol).cast("long")).as("_mny"),
      max(col(yCol).cast("long")).as("_mxy"))
    // fixed-point scaling in DECIMAL(38,0): (x − min)·65535 overflows
    // int64 once the column RANGE exceeds ~2^47 (and max − min itself
    // overflows for mixed-sign extremes), which would silently scramble
    // the layout — in decimal the worst case (2^64 range · 65535 ≈
    // 1.2e24) fits with 14 digits to spare and the DIV quotient is back
    // in [0, 65535], so hilbertCluster carries NO range contract
    // (unlike the declared-domain hilbertBucketStats, whose grid math
    // stays int64 and keeps its documented ≤ 2^47 requirement)
    // the per-row coordinate goes through BIGINT FIRST (truncation,
    // matching the min/max row's own cast) and only then widens to
    // DECIMAL: casting a fractional double straight to DECIMAL(38,0)
    // ROUNDS half-up, which would push e.g. x=5.6 above a truncated
    // _mxx=5 and normalize outside the [0, 65535] grid
    df.crossJoin(broadcast(mm))
      .withColumn("_xn",
        expr(s"CASE WHEN _mxx = _mnx THEN CAST(0 AS BIGINT) " +
          s"ELSE CAST(((CAST(CAST(`$xCol` AS BIGINT) AS DECIMAL(38,0))" +
          s" - _mnx) * 65535) " +
          s"DIV (CAST(_mxx AS DECIMAL(38,0)) - _mnx) AS BIGINT) END"))
      .withColumn("_yn",
        expr(s"CASE WHEN _mxy = _mny THEN CAST(0 AS BIGINT) " +
          s"ELSE CAST(((CAST(CAST(`$yCol` AS BIGINT) AS DECIMAL(38,0))" +
          s" - _mny) * 65535) " +
          s"DIV (CAST(_mxy AS DECIMAL(38,0)) - _mny) AS BIGINT) END"))
      .withColumn("h", hilbertKey(col("_xn"), col("_yn")))
      .drop("_mnx", "_mxx", "_mny", "_mxy", "_xn", "_yn")
      .repartitionByRange(numFiles, col("h"))
      .sortWithinPartitions(col("h"))
  }

  /** The OPTIMIZE maintenance job: read a landed table, rewrite it
    * curve-clustered (`curve` = "zorder" | "hilbert") into `numFiles`
    * files at `outPath` (idempotent overwrite — re-runs rewrite the
    * same layout), and return the before/after [[layoutReport]] pair.
    * A clustered rewrite's per-file bounding boxes cover ~1/files of
    * the plane instead of ~all of it (Round8Spec pins the area
    * reduction), which is precisely the file-skipping win a reader
    * gets on BOTH columns; the Hilbert curve's connected buckets prune
    * strictly better on diagonal range probes (Round10Spec). The
    * rewrite is one range shuffle of the table — the once-per-
    * maintenance-window cost that every subsequent scan amortizes. */
  def optimize(spark: org.apache.spark.sql.SparkSession,
               inPath: String, outPath: String, xCol: String,
               yCol: String, numFiles: Int,
               curve: String = "zorder"): DataFrame = {
    require(inPath != outPath,
      "optimize rewrites to a NEW path (swap after commit); " +
        "overwriting the input while reading it would corrupt the table")
    val before = layoutReport(spark, inPath, xCol, yCol, "before")
    val clustered = curve match {
      case "zorder" =>
        zOrderCluster(spark.read.parquet(inPath), xCol, yCol, numFiles)
          .drop("z")
      case "hilbert" =>
        hilbertCluster(spark.read.parquet(inPath), xCol, yCol, numFiles)
          .drop("h")
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other': expected zorder or hilbert")
    }
    clustered.write.mode("overwrite").parquet(outPath)
    before.unionByName(
      layoutReport(spark, outPath, xCol, yCol, s"after_$curve"))
  }

  /** Back-compat face of [[optimize]] with curve = zorder. */
  def optimizeZOrder(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String, xCol: String,
                     yCol: String, numFiles: Int): DataFrame =
    optimize(spark, inPath, outPath, xCol, yCol, numFiles, "zorder")
}
