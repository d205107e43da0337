package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** Contracts of the BPE trainer (functions/Bpe.scala):
  *  - the merge sequence on the classic Sennrich corpus matches the
  *    hand computation (argmax counts, (lsym, rsym) tie-breaks);
  *  - segmentations losslessly reconstruct their words;
  *  - encoding agrees with an independent driver-side replay of the
  *    learned merges;
  *  - a fully-merged corpus stops emitting instead of corrupting state.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsOf(texts: String*) = {
    val spark2 = spark
    import spark2.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** The paper's running example: low×5, lower×2, newest×6, widest×3. */
  private def sennrich = docsOf(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))

  test("merge sequence matches the hand computation on the Sennrich " +
    "corpus (counts + tie-breaks)") {
    val got = Bpe.merges(sennrich, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // round 1: (e,s)=(s,t)=(t,</w>)=9 tie -> lsym asc -> (e,s)
    // round 2: (es,t)=(t,</w>)=9 tie -> (es,t)
    // round 3: (est,</w>)=9
    // round 4: (l,o)=(o,w)=7 tie -> (l,o)
    // round 5: (lo,w)=7 ((w,est</w>)=6, (w,</w>)=5)
    assert(got == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L),
      (5L, "lo", "w", 7L)))
  }

  test("segmentations are lossless: symbols concatenate back to " +
    "word + </w> at every round depth") {
    for (r <- Seq(1, 4, 8)) {
      val (words, _) = Bpe.train(sennrich, rounds = r)
      words.collect().foreach { row =>
        val word = row.getString(0)
        val joined = row.getString(2).replace(" ", "")
        assert(joined == word + Bpe.Eow, s"rounds=$r word=$word")
      }
    }
  }

  test("encode agrees with an independent driver-side replay of the " +
    "learned merges") {
    val docs = docsOf("low lower newest", "widest widest low")
    val rounds = 6
    val merges = Bpe.merges(docs, rounds)
      .collect().map(r => (r.getString(1), r.getString(2)))
    def segment(word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString) :+ Bpe.Eow
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val got = Bpe.encode(docs, rounds).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val texts = Map(0L -> "low lower newest", 1L -> "widest widest low")
    texts.foreach { case (id, text) =>
      val segs = text.split("\\s+").toSeq.map(segment)
      val want = (segs.size.toLong, segs.map(_.size).sum.toLong,
        segs.map(_.size).max.toLong)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("greedy left-to-right merge on overlapping pairs (aaa with " +
    "pair (a,a) merges the LEFT pair)") {
    val docs = docsOf("aaa aaa")
    val (words, merges) = Bpe.train(docs, rounds = 1)
    val m = merges.collect()
    assert(m.length == 1)
    val syms = words.filter(col("word") === "aaa").head.getString(2)
      .split("  ").filter(_.nonEmpty).toSeq
    // (a,a)=4 beats (a,</w>)=2: "a a a </w>" -> "aa a </w>", never
    // "a aa </w>"
    assert(syms == Seq("aa", "a", Bpe.Eow))
  }

  test("exhausted corpus: rounds beyond full merge emit nothing and " +
    "leave the table stable") {
    val docs = docsOf("ab ab")
    val (words, merges) = Bpe.train(docs, rounds = 10)
    // "a b </w>" needs exactly 2 merges to one symbol
    assert(merges.count() == 2)
    val syms = words.head.getString(2).split("  ").filter(_.nonEmpty).toSeq
    assert(syms == Seq("ab" + Bpe.Eow))
  }

  test("training is deterministic across runs") {
    val a = Bpe.merges(sennrich, rounds = 8).collect().map(_.toSeq).toSeq
    val b = Bpe.merges(sennrich, rounds = 8).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
