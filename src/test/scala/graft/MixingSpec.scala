package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mixing

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("packSequences lays shards out contiguously: offsets accumulate, " +
    "windows straddle, shards are independent") {
    // shard A: 3+4+2 tokens, budget 4 -> starts at 0, 3, 7
    val out = Mixing.packSequences(docs(
      (1L, "A", "a b c"),
      (2L, "A", "d e f g"),
      (3L, "A", "h i"),
      (10L, "B", "x y z w v")), budget = 4)
      .select("doc_id", "n_tokens", "start_tok", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),   // fills [0,3)
      (2L, 4L, 3L, 0L, 3L),   // starts in window 0 at offset 3, straddles
      (3L, 2L, 7L, 1L, 3L),   // window 1 — shard A keeps accumulating
      (10L, 5L, 0L, 0L, 0L))) // shard B restarts at 0 independently
  }

  test("packSequences: blank docs occupy zero tokens and don't shift " +
    "the stream") {
    val out = Mixing.packSequences(docs(
      (1L, "A", "a b"), (2L, "A", "   "), (3L, "A", "c")), budget = 8)
      .select("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 2L), (3L, 2L)))
  }

  test("mixCorpus: integer epochs replicate exactly, weight<100 subsets " +
    "deterministically, epoch copies spread across the schedule") {
    val d = docs((0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "big" else "small", "w" * 3)): _*)
    val out = Mixing.mixCorpus(d,
      weightsHundredths = Map("big" -> 200, "small" -> 50))
    val byDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("copies"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // weight 200 = exactly 2 copies of every doc
    assert(byDoc.filter(_._2 == "big").forall(_._3 == 2L))
    // weight 50 = docs appear 0 or 1 times, and roughly half survive
    val small = byDoc.filter(_._2 == "small")
    assert(small.forall(_._3 == 1L))
    assert(small.length < 20)
    // determinism: a rerun yields the identical multiset
    val again = Mixing.mixCorpus(d,
      weightsHundredths = Map("big" -> 200, "small" -> 50))
    assert(out.orderBy("sched_t", "doc_id", "epoch").collect().toSeq ==
      again.orderBy("sched_t", "doc_id", "epoch").collect().toSeq)
    // epoch copies of one doc are exactly one full shard pass apart:
    // with 20 docs at weight 200, doc rank r emits at k=r and k=20+r,
    // so sched_t differs by n*10000/w = 20*10000/200 = 1000.
    val t = out.filter($"doc_id" === 0L).select("sched_t")
      .collect().map(_.getLong(0)).sorted
    assert(t.length == 2 && (t(1) - t(0)) == 1000L)
  }

  test("mixCorpus: fractional-epoch keep decision matches the hash-bucket " +
    "contract (same bucket function as stratifiedSample)") {
    val d = docs((0 until 30).map(i => (i.toLong, "s", "x")): _*)
    val kept = Mixing.mixCorpus(d, weightsHundredths = Map("s" -> 130))
      .filter($"epoch" === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = d.filter(
      graft.functions.TextAnalysis.hashBucket(
        concat_ws(":", $"doc_id", lit(1))) < 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expected)
    // and every doc keeps its epoch-0 copy
    val e0 = Mixing.mixCorpus(d, weightsHundredths = Map("s" -> 130))
      .filter($"epoch" === 0).count()
    assert(e0 == 30)
  }

  test("mixCorpus schedule interleaves proportionally: in any prefix of " +
    "the merged order, shard frequency tracks weight") {
    val d = docs((0 until 60).map(i =>
      (i.toLong, s"s${i % 3}", "x")): _*)
    // s0 weight 300, s1/s2 weight 100 -> s0 is 3/5 of the stream
    val rows = Mixing.mixCorpus(d,
      weightsHundredths = Map("s0" -> 300))
      .orderBy("sched_t", "source", "doc_id", "epoch")
      .select("source").collect().map(_.getString(0))
    val prefix = rows.take(rows.length / 2)
    val s0 = prefix.count(_ == "s0").toDouble / prefix.length
    assert(s0 > 0.45 && s0 < 0.75, s"s0 share in prefix was $s0")
  }
}
