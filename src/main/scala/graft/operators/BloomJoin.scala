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

  /** `big` semi-joined to `keys`, with the Bloom reduction in front:
    * build the filter over the key side (one-row aggregate, map-side
    * partial OR), broadcast it, drop big-side rows map-side, then run
    * the exact semi-join over the survivors. */
  def reducedSemiJoin(big: DataFrame, bigKey: String, keys: DataFrame,
                      keyCol: String, numBits: Int = 1 << 20,
                      numHashes: Int = 5): DataFrame = {
    val bf = keys.agg(bloomOf(col(keyCol).cast("long"), numBits,
      numHashes).as("_bf"))
    big.crossJoin(broadcast(bf))
      .filter(mightContain(col("_bf"), col(bigKey).cast("long"),
        numBits, numHashes))
      .drop("_bf")
      .join(keys.select(col(keyCol).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
