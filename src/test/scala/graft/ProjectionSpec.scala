package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Projection, Similarity}

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sign matrix is deterministic and roughly balanced") {
    val m = Projection.signMatrix(16, 64)
    assert(m == Projection.signMatrix(16, 64) ||
      m.map(_.toSeq).toSeq == Projection.signMatrix(16, 64)
        .map(_.toSeq).toSeq)
    assert(m.flatten.forall(s => s == 1 || s == -1))
    val pos = m.flatten.count(_ == 1)
    // md5 nibble parity: close to half of 1024
    assert(math.abs(pos - 512) < 120, s"pos=$pos")
    // rows differ (independent draws per output dim)
    assert(m.map(_.toSeq).distinct.length == 16)
  }

  test("project computes the literal signed sums exactly") {
    val m = Projection.signMatrix(4, 3)
    val v = Seq((1L, Seq(0.5f, -1.25f, 2.0f))).toDF("vec_id", "embedding")
    val got = Projection.project(v, outDim = 4, inDim = 3)
      .collect().head.getSeq[Long](1)
    val micro = Seq(500000L, -1250000L, 2000000L)
    val want = (0 until 4).map(j =>
      (0 until 3).map(i => m(j)(i) * micro(i)).sum)
    assert(got == want)
  }

  test("rpTopK: projected shortlist + exact rerank reaches the pinned " +
    "recall@10 against unprojected brute force") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(outDim: Int, factor: Int): Double = {
      val approx = Projection.rpTopK(emb, q, 10, outDim = outDim,
          shortlistFactor = factor)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val r16 = recallAt(16, 4)
    val r32 = recallAt(32, 8)
    val r48 = recallAt(48, 12)
    info(f"recall@10: 16d/x4=$r16%.3f 32d/x8=$r32%.3f 48d/x12=$r48%.3f")
    assert(r16 >= 0.2, f"recall collapsed: $r16%.3f")
    assert(r32 >= 0.5, f"recall collapsed: $r32%.3f")
    assert(r48 >= r32 - 0.05 && r48 >= 0.7, f"48d: $r48%.3f")
  }
}
