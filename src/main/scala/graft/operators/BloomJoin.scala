package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftops.ColumnBridge

/** Bloom-filter semi-join reduction — the runtime-filter pattern: thin
  * the BIG side of a selective join MAP-SIDE, before its shuffle, with
  * a broadcast Bloom filter of the key side.
  *
  * A key set of n longs broadcasts as ~10n BITS at a 1% false-positive
  * rate (vs ≥ 64n bits as a hash relation plus overhead) — the regime
  * where the dim side is too big to broadcast-join but its Bloom image
  * is not, so the fact side drops non-matching rows at the scan instead
  * of shuffling them. The exact semi-join that follows culls the false
  * positives, making the composition EXACTLY the plain semi-join — the
  * filter is semantically transparent (which is what lets the q114
  * oracle be the plain join), only the shuffle volume changes.
  */
object BloomJoin {

  /** One-row Bloom bitset (array<bigint>) over a long key column. */
  def bloomOf(key: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      graft.plans.BloomAgg(ColumnBridge.expression(key), numBits,
        numHashes).toAggregateExpression())

  /** Membership probe against a bitset built with the same geometry. */
  def mightContain(bits: Column, key: Column, numBits: Int,
                   numHashes: Int): Column =
    ColumnBridge.column(
      graft.plans.BloomContains(ColumnBridge.expression(bits),
        ColumnBridge.expression(key), numHashes, numBits))

  /** File-granular Bloom skipping index — Delta-style column Bloom
    * filters recast as a standing table: ONE Bloom image per parquet
    * file over a key column (a grouped aggregate by input_file_name,
    * map-side partial OR; the index is files × bits/8 bytes however
    * many rows the table has). This is min/max pruning's complement:
    * footer min/max skips nothing for a high-cardinality UNCLUSTERED
    * key, while a point probe against the per-file Blooms names the few
    * files that might contain it. */
  def fileBloomIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, keyCol: String,
                     numBits: Int = 1 << 16,
                     numHashes: Int = 5): DataFrame = {
    val df = spark.read.parquet(path)
    requireIntegralKey(df, keyCol, "fileBloomIndex")
    df.select(org.apache.spark.sql.functions.input_file_name().as("file"),
        col(keyCol).cast("long").as("k"))
      .groupBy("file")
      .agg(bloomOf(col("k"), numBits, numHashes).as("bloom"))
  }

  /** The file-index surface probes with Seq[Long] literals, so its key
    * contract is integral — enforced loudly here: a blind long cast on
    * a string key would NULL out and build Blooms that match nothing,
    * and the "no false negatives" promise would silently invert.
    * (reducedSemiJoin has no literal probe side and instead HASHES
    * non-integral keys portably on both sides.) */
  private def requireIntegralKey(df: DataFrame, keyCol: String,
                                 who: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$who requires an integral key column; $keyCol is $other " +
          "(a long cast would yield NULL for every row and the index " +
          "would match nothing)")
    }
  }

  /** Files a probe key set might touch, per the index (no false
    * negatives — an absent file provably holds none of the keys). */
  def probeFiles(index: DataFrame, keys: Seq[Long], numBits: Int,
                 numHashes: Int): DataFrame = {
    require(keys.nonEmpty, "probeFiles needs at least one key")
    index.filter(keys.map(k =>
        mightContain(col("bloom"), lit(k), numBits, numHashes))
      .reduce(_ || _)).select("file")
  }

  /** Point lookup through the skipping index: consult the standing
    * index for the probable file list (a files-count-bounded driver
    * collect — the same metadata granularity a catalog serves), read
    * ONLY those files, and exact-filter. Equals the plain filter over
    * the whole table (Bloom has no false negatives; false-positive
    * files only cost a read), but a selective probe touches a handful
    * of files instead of the table (Round8Spec pins both claims). */
  def scanWithBloomIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, keyCol: String, keys: Seq[Long],
                         index: DataFrame, numBits: Int = 1 << 16,
                         numHashes: Int = 5): DataFrame = {
    val files = probeFiles(index, keys, numBits, numHashes)
      .collect().map(_.getString(0))
    if (files.isEmpty)
      spark.read.parquet(path).filter(col(keyCol).isin(keys: _*))
        .limit(0)
    else
      spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col(keyCol).isin(keys: _*))
  }

  /** Point+range probe through TWO standing indexes at once — the
    * capstone composition over a z-ordered layout: the per-file Bloom
    * index answers "which files might hold these exact keys" and the
    * per-file min/max stats (Layout.fileStats over (keyCol, rangeCol) —
    * the footer stats a z-ordered rewrite makes tight in BOTH
    * dimensions) answer "which files overlap this range"; the scan
    * reads only their INTERSECTION, then exact-filters. Equals the
    * plain filter over the whole table (Bloom has no false negatives;
    * stats bounds are conservative), but on a z-ordered table the
    * intersection is strictly smaller than either pruner alone —
    * a Bloom-probable column of z-quadrants × a range-overlapping row
    * of them meet in ~one cell (Round8Spec pins strictness and
    * equality). Both indexes are standing artifacts (catalog-
    * granularity metadata); the probe collects only file names. */
  def scanWithBloomAndStats(spark: org.apache.spark.sql.SparkSession,
                            path: String, keyCol: String,
                            keys: Seq[Long], index: DataFrame,
                            stats: DataFrame, rangeCol: String,
                            lo: Long, hi: Long, numBits: Int = 1 << 16,
                            numHashes: Int = 5): DataFrame = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val bloomFiles = probeFiles(index, keys, numBits, numHashes)
    val rangeFiles = stats
      .filter(col("min_y") <= hi && col("max_y") >= lo).select("file")
    val files = bloomFiles.join(rangeFiles, Seq("file"), "left_semi")
      .collect().map(_.getString(0))
    val pred = col(keyCol).isin(keys: _*) &&
      col(rangeCol).between(lo, hi)
    if (files.isEmpty)
      spark.read.parquet(path).filter(pred).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*).filter(pred)
  }

  /** `big` semi-joined to `keys`, with the Bloom reduction in front:
    * build the filter over the key side (one-row aggregate, map-side
    * partial OR), broadcast it, drop big-side rows map-side, then run
    * the exact semi-join over the survivors. Key typing: integral keys
    * feed the Bloom as their long value; any other type feeds as its
    * portable md5-60 image on BOTH sides (Skew.portableKey — same
    * membership, no silent long-cast NULL degeneration), and the exact
    * semi-join still compares the raw values. */
  def reducedSemiJoin(big: DataFrame, bigKey: String, keys: DataFrame,
                      keyCol: String, numBits: Int = 1 << 20,
                      numHashes: Int = 5): DataFrame = {
    val (dtb, dtk) =
      (big.schema(bigKey).dataType, keys.schema(keyCol).dataType)
    val bf = keys.agg(bloomOf(Skew.portableKey(dtb, dtk, col(keyCol)),
      numBits, numHashes).as("_bf"))
    big.crossJoin(broadcast(bf))
      .filter(mightContain(col("_bf"),
        Skew.portableKey(dtb, dtk, col(bigKey)), numBits, numHashes))
      .drop("_bf")
      .join(keys.select(col(keyCol).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
