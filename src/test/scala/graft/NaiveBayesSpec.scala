package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("hand example: evidence drives the argmax, unseen terms take " +
    "the class default, ties break to the smallest label") {
    val train = corpus(
      (1L, "a", "x x y"), (2L, "a", "x z"),
      (3L, "b", "y y"), (4L, "b", "y z"))
    val counts = NaiveBayes.termCounts(train)
    val m = NaiveBayes.model(counts)
    val stats = NaiveBayes.classStats(counts, train)
    // model values: V=3; class a Nc=5 → lp(a,x)=ln(4/8)·1e6 floored
    val lp = m.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(lp(("a", "x")) == math.floor(math.log(4.0 / 8) * 1e6).toLong)
    assert(lp(("b", "y")) == math.floor(math.log(4.0 / 7) * 1e6).toLong)
    val test = Seq((10L, "x x"), (11L, "y y y"), (12L, "q q"))
      .toDF("doc_id", "text")
    val pred = NaiveBayes.classify(test, m, stats).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "a")
    assert(pred(11L) == "b")
    // unseen-only doc: defaults ln(1/8) vs ln(1/7) → b wins
    assert(pred(12L) == "b")
    // symmetric corpus → equal scores → lexicographically smallest
    val sym = corpus((1L, "a", "x"), (2L, "b", "x"))
    val c2 = NaiveBayes.termCounts(sym)
    val tie = NaiveBayes.classify(
      Seq((9L, "x")).toDF("doc_id", "text"),
      NaiveBayes.model(c2), NaiveBayes.classStats(c2, sym))
      .collect().head
    assert(tie.getString(1) == "a")
  }

  test("incremental training: merged counts rebuild the identical model") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 17 =!= 0)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = NaiveBayes.mergeCounts(
      NaiveBayes.termCounts(a), NaiveBayes.termCounts(b))
    val oneShot = NaiveBayes.termCounts(docs)
    assert(merged.except(oneShot).count() == 0
      && oneShot.except(merged).count() == 0)
    val mm = NaiveBayes.model(merged).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val mo = NaiveBayes.model(oneShot).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(mm == mo && mm.nonEmpty)
    // doc-count statistic merges the same way
    val md = NaiveBayes.mergeDocCounts(
      NaiveBayes.docCounts(a), NaiveBayes.docCounts(b))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val od = NaiveBayes.docCounts(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(md == od)
  }

  test("classify emits one row per evidence-bearing doc, absent for " +
    "token-less docs") {
    val train = corpus((1L, "a", "x y"), (2L, "b", "z w"))
    val c = NaiveBayes.termCounts(train)
    val out = NaiveBayes.classify(
      Seq((5L, "x"), (6L, "   ")).toDF("doc_id", "text"),
      NaiveBayes.model(c), NaiveBayes.classStats(c, train))
    val ids = out.collect().map(_.getLong(0)).toSet
    assert(ids == Set(5L))
  }
}
