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

  test("packSequences == model: random token counts, per-shard cumsum, " +
    "window and offset arithmetic (200 docs, 3 shards, seeded)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val nTok = rnd.nextInt(40) // 0..39 tokens
      (i.toLong, s"s${i % 3}", Seq.fill(nTok)("w").mkString(" "))
    }
    val budget = 17
    val got = Mixing.packSequences(rows.toDF("doc_id", "source", "text"),
      budget)
      .select("doc_id", "n_tokens", "start_tok", "seq_id", "seq_offset")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // model: scan-left cumsum per shard in doc_id order
    val model = rows.groupBy(_._2).flatMap { case (_, docs) =>
      docs.sortBy(_._1).foldLeft((0L, List.empty[(Long, (Long, Long, Long,
        Long))])) { case ((cum, acc), (id, _, text)) =>
        val n = if (text.trim.isEmpty) 0L
          else text.trim.split("\\s+").length.toLong
        (cum + n, (id -> ((n, cum, cum / budget, cum % budget))) :: acc)
      }._2
    }.toMap
    assert(got == model)
  }

  test("subShard bounds skewed shards deterministically and packing " +
    "stays contiguous within each sub-shard") {
    // 90% of docs in one source — the skew case subShard exists for
    val d = docs((0 until 100).map(i =>
      (i.toLong, if (i < 90) "big" else "small", "a b c")): _*)
      .withColumn("shard",
        Mixing.subShard(col("source"), col("doc_id"), 4))
    val out = Mixing.packSequences(d, budget = 6, shardCol = "shard")
    // sub-shards of "big" each hold a bounded fraction
    val sizes = out.filter($"source" === "big").groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length > 1 && sizes.max < 90)
    // within every sub-shard the stream is contiguous: sorted by doc_id,
    // start_tok is the running sum of preceding n_tokens
    val rows = out.select("shard", "doc_id", "n_tokens", "start_tok")
      .collect()
      .groupBy(_.getString(0))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foldLeft(0L) { (cum, r) =>
        assert(r.getLong(3) == cum, s"shard ${r.getString(0)}")
        cum + r.getLong(2)
      }
    }
    // determinism across reruns
    val again = Mixing.packSequences(d, budget = 6, shardCol = "shard")
      .select("doc_id", "seq_id", "seq_offset").collect().toSeq.toString
    val first = out.select("doc_id", "seq_id", "seq_offset")
      .collect().toSeq.toString
    assert(first == again)
  }

  test("mixCorpusSharded preserves the weight model exactly: the emitted " +
    "(source, doc, epoch) multiset equals the unsharded run on a skewed " +
    "corpus, and sub-shards actually split the dominant source") {
    // 90% of docs in one source, fractional weights on both
    val d = docs((0 until 200).map(i =>
      (i.toLong, if (i < 180) "big" else "small", "a b c")): _*)
    val weights = Map("big" -> 230, "small" -> 80)
    def emissions(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "doc_id", "epoch").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = emissions(Mixing.mixCorpus(d, weights))
    val sharded = Mixing.mixCorpusSharded(d, weights, subShards = 4)
    assert(emissions(sharded) == plain,
      "sub-sharding changed replication or keep decisions")
    // the dominant source's window work is genuinely split: its docs
    // fan out over >1 sub-shard key (the serialization bound)
    val nShards = Mixing
      .mixCorpusSharded(d, weights, subShards = 4)
      .filter($"source" === "big")
      .withColumn("ss", Mixing.subShard($"source", $"doc_id", 4))
      .select("ss").distinct().count()
    assert(nShards > 1, "dominant source not split across sub-shards")
    // each sub-shard still stride-schedules: sched_t is monotone in the
    // per-sub-shard emission rank (spot-check determinism across reruns)
    val a = sharded.orderBy("sched_t", "source", "doc_id", "epoch")
      .select("doc_id", "epoch", "sched_t").collect().toSeq.toString
    val b = Mixing.mixCorpusSharded(d, weights, subShards = 4)
      .orderBy("sched_t", "source", "doc_id", "epoch")
      .select("doc_id", "epoch", "sched_t").collect().toSeq.toString
    assert(a == b)
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

  test("applyPackBatch ≡ full rebuild: shared shards continue at the " +
    "standing offset, batch-only shards bootstrap at zero, history " +
    "rows pass through untouched") {
    val docs = Seq(
      (1L, "A", "a b c"), (2L, "A", "d e"), (3L, "B", "f"),
      // batch: A continues, B continues, C is brand new
      (10L, "A", "g h i j"), (11L, "B", "k l"), (12L, "C", "m")
    ).toDF("doc_id", "source", "text")
    val standing = graft.functions.Mixing.packSequences(
      docs.filter($"doc_id" < 10), budget = 4)
    val applied = graft.functions.Mixing.applyPackBatch(
        standing, docs.filter($"doc_id" >= 10), budget = 4)
      .select("doc_id", "source", "n_tokens", "start_tok", "seq_id",
        "seq_offset")
      .collect().map(_.toSeq).toSet
    val rebuilt = graft.functions.Mixing.packSequences(docs, budget = 4)
      .select("doc_id", "source", "n_tokens", "start_tok", "seq_id",
        "seq_offset")
      .collect().map(_.toSeq).toSet
    assert(applied == rebuilt)
    // and the standing rows really are byte-identical pass-throughs
    val histApplied = applied.filter(_.head.asInstanceOf[Long] < 10)
    val histStanding = standing
      .select("doc_id", "source", "n_tokens", "start_tok", "seq_id",
        "seq_offset")
      .collect().map(_.toSeq).toSet
    assert(histApplied == histStanding)
  }
}
