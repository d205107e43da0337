package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Mixing, TextAnalysis}

/** The curation driver — the training-data counterpart of [[Pipeline]]:
  * one call runs quality filtering → near-dup clustering with a
  * QUALITY-AWARE representative → benchmark decontamination → sequence
  * packing over the survivors, landing the curated corpus and the packed
  * layout as idempotent Parquet writes.
  *
  * Stage order is cost order: the census-kernel quality pass (map-side)
  * prunes first, clustering runs over the full corpus (a near-dup of a
  * discarded doc must still absorb its twin), decontamination scores
  * only quality∩representative survivors map-side, packing is one shard
  * shuffle at the end. Every stage's formulation is individually
  * oracle-pinned (q72 / q61+q89 / q68 / q65); this object is their
  * production composition — the q73 capstone, upgraded to the
  * keep-the-BEST-duplicate policy and wired to sinks.
  */
object CurationPipeline {

  final case class Config(
      outputDir: String,
      evalModulus: Long = 17, // doc_id % m == 0 → held-out eval set
      minJaccardBp: Long = 2000,
      packBudget: Int = 512,
      // Pile-style per-source epoch weights in hundredths (250 = 2.5
      // epochs); empty = every curated doc exactly once, unmixed
      mixWeightsHundredths: Map[String, Int] = Map.empty)

  final case class Result(
      nInput: Long, nEval: Long, nQualityKept: Long, nAfterDedup: Long,
      nCurated: Long, nMixed: Long, nWindows: Long)

  def run(spark: SparkSession, docs: DataFrame, conf: Config): Result = {
    val eval = docs.filter(col("doc_id") % conf.evalModulus === 0)
    val corpus = docs.filter(col("doc_id") % conf.evalModulus =!= 0)

    // 1. quality gate — one map-side census-kernel pass (q72)
    val kept = TextAnalysis.qualityVerdict(corpus)
      .filter(col("keep")).select("doc_id")

    // 2. near-dup clusters over the FULL corpus; representative = the
    //    best-quality member (q89's argmax policy), so a low-quality
    //    min-id twin never shadows a keepable one
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatesPortable(corpus, "doc_id", "text",
        shingleN = 3, bands = 4, rowsPerBand = 4,
        minJaccardBp = conf.minJaccardBp),
      assumeDistinctPairs = true)
    val memberQuality = TextAnalysis.qualityVerdict(
        corpus.join(clusters.select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("id"), col("alpha_bp"), col("n_words"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(desc("alpha_bp"), desc("n_words"), asc("id"))
    val drop = clusters.join(memberQuality, Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") =!= 1)
      .select(col("id").as("doc_id"))

    val deduped = kept.join(broadcast(drop), Seq("doc_id"), "left_anti")

    // 3. decontamination — eval shingles collapse to one broadcast
    //    array, survivors scored map-side (q68)
    val survivorDocs = corpus.join(deduped, Seq("doc_id"), "left_semi")
    val clean = Dedup.contamination(survivorDocs, eval)
      .filter(col("n_contaminated") === 0)
      .select("doc_id")
    val curated = corpus.join(clean, Seq("doc_id"), "left_semi")

    // 4. optional epoch-weight mixture (q66), then the packed layout
    //    (q65) over the training stream — idempotent overwrites. The
    //    mixed stream's per-shard order key is sched_t (unique within a
    //    shard for weights ≤ 100 epochs — the stride schedule is
    //    strictly increasing), satisfying packSequences' uniqueness
    //    contract where (doc_id, epoch) duplicates would not.
    curated.write.mode("overwrite")
      .parquet(s"${conf.outputDir}/curated")
    val (stream, orderCol) =
      if (conf.mixWeightsHundredths.isEmpty) (curated, "doc_id")
      else (Mixing.mixCorpus(curated, conf.mixWeightsHundredths),
        "sched_t")
    val packed = Mixing.packSequences(stream, conf.packBudget,
      orderCol = orderCol)
    packed.write.mode("overwrite")
      .parquet(s"${conf.outputDir}/packed")

    Result(
      nInput = docs.count(), nEval = eval.count(),
      nQualityKept = kept.count(), nAfterDedup = deduped.count(),
      nCurated = curated.count(),
      nMixed = spark.read.parquet(s"${conf.outputDir}/packed").count(),
      nWindows = spark.read.parquet(s"${conf.outputDir}/packed")
        .select(countDistinct(col("source"), col("seq_id")))
        .collect().head.getLong(0))
  }
}
