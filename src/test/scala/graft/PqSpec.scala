package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Pq, Similarity}
import graft.sources.Tables

/** Contracts of product quantization (functions/Pq.scala):
  *  - codes are in range and every (vector, subspace) gets exactly one;
  *  - training + encoding are deterministic;
  *  - ADC ranking recovers a usable fraction of the exact-L2 top-k (the
  *    operating-point gate, like the q122/HNSW recall pins) and ADC
  *    distances approximate the exact ones;
  *  - the empty-cell fallback keeps seed centroids instead of dropping
  *    codes.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  val nsub = 8; val dsub = 8; val k = 16

  private def emb = Tables.load(spark, dir, "embeddings")
  private lazy val cb = Pq.codebook(emb, nsub, k, dsub).localCheckpoint()
  private lazy val codes = Pq.encode(emb, cb, nsub, dsub)

  test("every (vector, subspace) gets exactly one in-range code") {
    val n = emb.count()
    assert(codes.count() == n * nsub)
    assert(codes.filter(col("code") < 0 || col("code") >= k).count() == 0)
    assert(codes.groupBy("vec_id", "m").count()
      .filter(col("count") =!= 1).count() == 0)
  }

  test("codebook and encoding are deterministic") {
    val a = Pq.encode(emb, Pq.codebook(emb, nsub, k, dsub), nsub, dsub)
      .collect().map(_.toSeq).toSet
    val b = codes.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ADC recall@10 against exact L2 is a usable operating point " +
    "and distances approximate the exact ones") {
    val queries = emb.filter(col("vec_id") < 20)
    val got = Pq.adcTopK(codes, cb, queries, 10, nsub, dsub)
    // exact L2 brute force over the same pairs
    val d2 = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("v")) +
      Similarity.dot(col("v"), col("v"))
    val exact = emb.select(col("vec_id"), Similarity.asDouble(
        col("embedding")).as("v"))
      .crossJoin(queries.select(col("vec_id").as("query_id"),
        Similarity.asDouble(col("embedding")).as("qv")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(asc("d2"), asc("vec_id"))))
      .filter(col("rank") <= 10)
    val e = exact.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = got.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (e & g).size.toDouble / e.size
    // synthetic unclustered embeddings are PQ's worst case — the raw
    // ADC operating point is deliberately pinned LOW; the production
    // path is the rerank composition pinned high below
    assert(recall >= 0.2, s"ADC recall@10 = $recall")
    // the production composition: ADC shortlist of 50 → exact rerank
    val rr = Pq.adcRerankTopK(codes, cb, emb, queries, 10, 50, nsub, dsub)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrRecall = (e & rr).size.toDouble / e.size
    assert(rrRecall >= 0.7, s"rerank recall@10 = $rrRecall")
    assert(rrRecall > recall, "rerank should improve on raw ADC")
    // distance quality: ~30% mean relative error measured on this
    // synthetic unclustered data (PQ's worst case — quantization error
    // is the residual variance the codebook can't capture); the pin
    // guards against regressions to completely broken arithmetic
    val exactMap = exact.select(col("query_id"), col("vec_id"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val errs = got.select("query_id", "vec_id", "approx_d2_micro")
      .collect().flatMap { r =>
        exactMap.get((r.getLong(0), r.getLong(1))).map { ex =>
          math.abs(r.getLong(2) / 1e6 - ex) / math.max(ex, 1e-9)
        }
      }
    assert(errs.nonEmpty && errs.sum / errs.length < 0.5,
      s"mean relative d2 error ${errs.sum / errs.length}")
  }

  test("compression is real: 8 small codes per 64-float vector, " +
    "codebook is broadcast-sized") {
    assert(cb.count() == nsub.toLong * k)
    val perVec = codes.groupBy("vec_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perVec == Seq(nsub.toLong))
  }

  test("incremental encoding: a batch encoded against the standing " +
    "codebook equals the one-shot encode restricted to it (merged == " +
    "rebuilt, the q86 pattern)") {
    val batch = emb.filter(col("vec_id") >= 400)
    val incr = Pq.encode(batch, cb, nsub, dsub)
      .collect().map(_.toSeq).toSet
    val oneShot = codes.filter(col("vec_id") >= 400)
      .collect().map(_.toSeq).toSet
    assert(incr.nonEmpty && incr == oneShot)
  }

  test("empty-cell fallback: a corpus whose vectors all collapse to " +
    "few cells keeps all k seed centroids") {
    // train on a tiny corpus (20 vecs): most of the 16 cells get no
    // members in the mean round for some subspace — the codebook must
    // still have nsub*k rows with non-null centroid arrays
    val tiny = emb.filter(col("vec_id") < 20)
    val cbT = Pq.codebook(tiny, nsub, k, dsub)
    assert(cbT.count() == nsub.toLong * k)
    assert(cbT.filter(col("cv").isNull).count() == 0)
  }
}
