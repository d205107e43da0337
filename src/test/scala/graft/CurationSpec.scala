package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end invariants of the curation driver — checked as PROPERTIES
  * of the landed output, not by re-composing the same code:
  *  - no near-dup pair at or above the threshold survives curation,
  *  - no curated doc shares a shingle with the held-out eval set,
  *  - per cluster, the survivor (if any) is the best-quality member,
  *  - counts are monotone through the stages and writes are idempotent.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  lazy val docs = graft.sources.Tables.load(spark, dir, "documents")
  lazy val out = java.nio.file.Files
    .createTempDirectory("graft-curation").toString
  lazy val conf = CurationPipeline.Config(outputDir = out)
  lazy val res = CurationPipeline.run(spark, docs, conf)

  test("counts are monotone and outputs land") {
    assert(res.nInput == docs.count())
    assert(res.nQualityKept <= res.nInput - res.nEval)
    assert(res.nAfterDedup <= res.nQualityKept)
    assert(res.nCurated <= res.nAfterDedup && res.nCurated > 0)
    assert(res.nWindows > 0)
    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.count() == res.nCurated)
  }

  test("no near-dup pair at/above the threshold survives curation") {
    val curated = spark.read.parquet(s"$out/curated")
    val pairs = graft.functions.Dedup.nearDuplicatesPortable(
      curated, "doc_id", "text", shingleN = 3, bands = 4,
      rowsPerBand = 4, minJaccardBp = conf.minJaccardBp)
    assert(pairs.count() == 0)
  }

  test("zero contamination against the eval set") {
    val curated = spark.read.parquet(s"$out/curated")
    val eval = docs.filter(col("doc_id") % conf.evalModulus === 0)
    val dirty = graft.functions.Dedup.contamination(curated, eval)
      .filter(col("contaminated"))
    assert(dirty.count() == 0)
  }

  test("per cluster the survivor is the best-quality member (not " +
    "necessarily the min id)") {
    val curated = spark.read.parquet(s"$out/curated").select("doc_id")
    val corpus = docs.filter(col("doc_id") % conf.evalModulus =!= 0)
    val clusters = graft.functions.Dedup.connectedComponents(
      graft.functions.Dedup.nearDuplicatesPortable(corpus, "doc_id",
        "text", 3, 4, 4, conf.minJaccardBp), assumeDistinctPairs = true)
    val q = graft.functions.TextAnalysis.qualityVerdict(
        corpus.join(clusters.select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("id"), col("alpha_bp"), col("n_words"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(desc("alpha_bp"), desc("n_words"), asc("id"))
    val best = clusters.join(q, Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val members = clusters.select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val survivingMembers = curated.collect().map(_.getLong(0)).toSet
      .intersect(members)
    // every surviving cluster member is its cluster's best — none of the
    // non-best members slipped through
    assert(survivingMembers.subsetOf(best),
      s"non-best survivors: ${(survivingMembers -- best).take(5)}")
  }

  test("epoch-weight mixture: per-doc multiplicity lands in " +
    "[floor(w/100), ceil(w/100)] and the mixed stream packs") {
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-curation-mix").toString
    val weights = Map("src0" -> 250, "src1" -> 50)
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = out2, mixWeightsHundredths = weights))
    assert(r.nCurated == res.nCurated) // mixing doesn't change curation
    assert(r.nMixed > r.nCurated && r.nWindows > 0)
    val packed = spark.read.parquet(s"$out2/packed")
    val mult = packed.groupBy("source", "doc_id")
      .agg(count(lit(1)).as("m"))
      .collect().map(row => (row.getString(0), row.getLong(2))).toSeq
    mult.foreach { case (src, m) =>
      val w = weights.getOrElse(src, 100)
      assert(m >= w / 100 && m <= (w + 99) / 100, s"$src m=$m w=$w")
    }
    // src1 at 0.5 epochs: some docs kept, some dropped — both sides real
    val src1 = mult.filter(_._1 == "src1").map(_._2)
    if (src1.size > 3) assert(src1.contains(1L) || src1.isEmpty)
  }

  test("re-running the pipeline is idempotent (same curated set)") {
    val first = spark.read.parquet(s"$out/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val res2 = CurationPipeline.run(spark, docs, conf)
    spark.catalog.refreshByPath(s"$out/curated")
    val second = spark.read.parquet(s"$out/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(res2.nCurated == res.nCurated && first == second)
  }
}
