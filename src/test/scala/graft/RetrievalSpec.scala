package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Graph, Retrieval, Similarity, Sketches}
import graft.plans.{MinKAgg, MinKBuffer}

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a"), (2L, "b c"), (3L, "c c c c")).toDF("doc_id", "text")

  test("bm25 matches the textbook formula on a hand-sized corpus") {
    val got = Retrieval.bm25(corpus, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // N=3, avgdl=3; df(a)=1, df(b)=2
    def idf(df: Double) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def part(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(got(1L) == r6(part(2, 3, 1) + part(1, 3, 2)))
    assert(got(2L) == r6(part(1, 2, 2)))
  }

  test("bm25 scoring plan has no shuffle outside the one-row stats agg") {
    val plan = Retrieval.bm25(corpus, Seq("a"))
      .queryExecution.executedPlan.toString
    // one Exchange pair for the global scalar agg (partial→final) plus
    // the broadcast back; the corpus-side projection must not be
    // RE-KEYED for scoring (no planner-inserted hash exchange). The one
    // allowed hash exchange is the explicit r19 parallelism floor
    // (Tables.fanOut → REPARTITION_BY_NUM), which exists only when the
    // scan is under-parallel and moves each row once without keying the
    // scoring itself.
    val shuffles = "Exchange hashpartitioning[^\\n]*ENSURE_REQUIREMENTS"
      .r.findAllIn(plan).size
    assert(shuffles == 0,
      s"corpus rows entered a planner-keyed hash exchange:\n$plan")
    // and every hash exchange in the plan IS that explicit fan-out
    // (the corpus subtree appears once per consumer — scoring side and
    // stats side — so the fan-out exchange can appear more than once)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size ==
      "Exchange hashpartitioning[^\\n]*REPARTITION_BY_NUM".r
        .findAllIn(plan).size,
      s"a non-fan-out hash exchange keyed the corpus side:\n$plan")
  }

  test("bm25TopKIndexed: index-path scores match the scan-path formula " +
    "in micro-units; absent terms and absent queries vanish") {
    val got = Retrieval.bm25TopKIndexed(corpus,
        Seq("qA" -> Seq("a", "b"), "qB" -> Seq("zzz")), topK = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    def idf(df: Double) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def u(tf: Double, dl: Double, df: Double) = math.floor(
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)) * 1e6)
      .toLong
    val d1 = u(2, 3, 1) + u(1, 3, 2)
    val d2 = u(1, 2, 2)
    assert(got.size == 2) // qB matched nothing
    assert(got(("qA", 1)) == ((1L, d1)) && got(("qA", 2)) == ((2L, d2)))
  }

  test("hybridTopK: RRF fusion is exact integer micro-units over the " +
    "two stacks' ranks, lex-only and dense-only docs included") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.hybridTopK(corpus, vecs,
        Seq(("h1", Seq("a", "b"), 1L)), topK = 10, cells = 1, nprobe = 1)
      .collect().map(r => r.getLong(2) -> ((r.getInt(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Int]),
        Option(r.get(5)).map(_.asInstanceOf[Int])))).toMap
    val lex = Retrieval.bm25TopKIndexed(corpus,
        Seq("h1" -> Seq("a", "b")), topK = 10)
      .collect().map(r => r.getLong(2) -> r.getInt(1)).toMap
    val dense = Similarity.ivfTopKProbed(vecs,
        vecs.filter($"vec_id" === 1), cells = 1, k = 10, nprobe = 1)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    val ids = lex.keySet ++ dense.keySet
    assert(got.keySet == ids && lex.keySet != dense.keySet)
    ids.foreach { id =>
      val want = lex.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        dense.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(got(id)._2 == want, s"doc $id unats")
      assert(got(id)._3 == lex.get(id) && got(id)._4 == dense.get(id))
    }
    // fused rank order = (rrf desc, id asc), ranks 1..n
    val byRank = got.toSeq.sortBy(_._2._1).map(_._1)
    val expect = ids.toSeq.sortBy(id => (-got(id)._2, id))
    assert(byRank == expect)
    assert(got.values.map(_._1).toSeq.sorted == (1 to ids.size))
  }

  test("invertedIndex: df/total_tf exact, postings capped at k smallest") {
    val ix = Retrieval.invertedIndex(corpus, maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(ix("a") == ((1L, 2L, "1")))
    assert(ix("b") == ((2L, 2L, "1,2")))
    assert(ix("c") == ((2L, 5L, "2,3")))
    val capped = Retrieval.invertedIndex(corpus, maxPostings = 1)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(capped == Map("a" -> "1", "b" -> "1", "c" -> "2"))
  }

  test("mergeIndexes ≡ from-scratch rebuild: disjoint batches, shared " +
    "terms, batch-only terms, and posting-cap overflow") {
    val hist = Seq((1L, "a b a"), (2L, "b c"), (10L, "a")).toDF("doc_id", "text")
    val batch = Seq((3L, "c c d"), (4L, "a z")).toDF("doc_id", "text")
    val merged = Retrieval.mergeIndexes(
      Retrieval.invertedIndexArr(hist, 2),
      Retrieval.invertedIndexArr(batch, 2), 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val rebuilt = Retrieval.invertedIndex(hist.unionByName(batch), 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(merged == rebuilt)
    // the cap-overflow case really exercised: 'a' lives in docs 1,10,4
    assert(merged("a") == ((3L, 4L, "1,4")))
    assert(merged("z") == ((1L, 1L, "4"))) // batch-only term
  }

  test("pmiBigrams matches the ln(p(ab)/(p(a)p(b))) model") {
    // bigrams: doc1 [a b, b a], doc2 [b c], doc3 [c c, c c, c c]
    // unigrams: a=2 b=2 c=5 (n1=9), bigram total n2=6
    val got = Retrieval.pmiBigrams(corpus, minCount = 1L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pmi(nab: Double, ca: Double, cb: Double) =
      r6(math.log((nab / 6.0) / ((ca / 9.0) * (cb / 9.0))))
    assert(got("a b") == ((1L, pmi(1, 2, 2))))
    assert(got("b a") == ((1L, pmi(1, 2, 2))))
    assert(got("b c") == ((1L, pmi(1, 2, 5))))
    assert(got("c c") == ((3L, pmi(3, 5, 5))))
    assert(got.size == 4)
  }

  test("pmiBigrams: single-token and empty docs contribute no bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val got = Retrieval.pmiBigrams(docs, 1L).collect()
    assert(got.map(_.getString(0)).toSet == Set("x y"))
  }

  test("MinKBuffer: distinct, capped, sorted; serialize round-trips") {
    val agg = MinKAgg(org.apache.spark.sql.graftops.ColumnBridge
      .expression(lit(0L)), 3)
    val buf = new MinKBuffer(3)
    Seq(5L, 5L, 9L, 1L, 7L, 1L, 3L).foreach(buf.insert)
    assert(buf.vals.take(buf.n).toSeq == Seq(1L, 3L, 5L))
    buf.insert(2L)
    assert(buf.vals.take(buf.n).toSeq == Seq(1L, 2L, 3L))
    buf.insert(8L) // above current max of a full buffer: ignored
    assert(buf.vals.take(buf.n).toSeq == Seq(1L, 2L, 3L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.vals.take(back.n).toSeq == Seq(1L, 2L, 3L))
    val empty = agg.deserialize(agg.serialize(new MinKBuffer(3)))
    assert(empty.n == 0)
  }

  test("minK distributed: merge across partitions equals global k-min; " +
    "all-null group is NULL") {
    val vals = (1L to 1000L).map(i => ("g", (i * 2654435769L) % 10007))
    val df = vals.toDF("g", "v").repartition(7)
    val got = df.groupBy("g").agg(Sketches.minK(col("v"), 16).as("m"))
      .collect().head.getSeq[Long](1)
    val want = vals.map(_._2).distinct.sorted.take(16)
    assert(got == want)
    val nulls = Seq(("g", Option.empty[Long]), ("g", None)).toDF("g", "v")
      .groupBy("g").agg(Sketches.minK(col("v"), 4).as("m")).collect().head
    assert(nulls.isNullAt(1))
  }

  test("kmvDistinct: exact below k, estimate near exact above k") {
    val rows = (1 to 5000).map(i => ("big", s"value-$i")) ++
      (1 to 10).map(i => ("small", s"v$i")) ++
      (1 to 10).map(i => ("small", s"v$i")) // duplicates must not count
    val got = Sketches.kmvDistinct(rows.toDF("g", "v"), "g", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.isNullAt(2), r.getDouble(3)))).toMap
    assert(got("small") == ((10L, true, 10.0)))
    val (nMins, kthNull, est) = got("big")
    assert(nMins == 64L && !kthNull)
    // deterministic (md5-based), so this is a fixed value; the assert
    // documents the sketch accuracy class rather than a flaky bound
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est=$est")
  }

  test("pagerank: integer fixed-point matches a hand model on a path " +
    "graph and conserves total rank up to floor truncation") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.pagerank(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // model: deg(1)=deg(3)=1, deg(2)=2, n=3, SCALE=1e12
    val S = 1000000000000L
    var pr = Map(1L -> S / 3, 2L -> S / 3, 3L -> S / 3)
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val base = (15L * S / 100) / 3
    val in = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    (1 to 3).foreach { _ =>
      pr = pr.map { case (v, _) =>
        v -> (base + 85L * in(v).map(u => pr(u) / deg(u)).sum / 100)
      }
    }
    assert(got == pr)
    val total = got.values.sum
    assert(total <= S && total > S - 1000, s"total=$total")
  }

  test("native md5Hash64 == composable conv(substring(md5))," +
    " incl. unicode and empty strings") {
    val rng = new scala.util.Random(7)
    val strs = Seq("", " ", "a", "naïve café 日本語", "x" * 300) ++
      (1 to 200).map(_ => rng.alphanumeric.take(rng.nextInt(40)).mkString)
    val df = strs.toDF("s")
    val diff = df.select(
        graft.functions.Dedup.md5Hash64($"s").as("fast"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("ref"))
      .filter($"fast" =!= $"ref" || $"fast".isNull)
    assert(diff.count() == 0)
  }

  test("word_ngrams kernel == HOF zip-with-tail formulation, " +
    "order and duplicates included") {
    val texts = Seq("a b a", "b c", "c c c c", "", " ", "solo",
      "  A  B\tc  ", "x " * 50, "Mixed CASE tokens HERE",
      // leading NON-SPACE whitespace: trim strips only 0x20, so split
      // yields a leading "" the kernel must drop like the HOF filter does
      "\tab cd", "\nx y z", "\t \t", "a\t\tb")
    val df = texts.toDF("text")
    val ws = filter(split(lower(trim($"text")), "\\s+"),
      w => length(w) > 0)
    val hof = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val diff = df.select(
        Retrieval.wordNgrams($"text", 2).as("fast"), hof.as("ref"))
      .filter(not($"fast" <=> $"ref"))
    assert(diff.count() == 0)
  }

  test("lmScore: quantized bigram log-probs match the hand model; " +
    "short docs drop out") {
    val got = Retrieval.lmScore(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // bi: "a b":1 "b a":1 "b c":1 "c c":3; starts: a·=1 b·=2 c·=3
    val half = math.floor(math.log(0.5) * 1e6).toLong // -693148
    assert(got(1L) == ((2L, half, -0.346574))) // 0 + ln(1/2)
    assert(got(2L) == ((1L, half, -0.693148)))
    assert(got(3L) == ((3L, 0L, 0.0)))        // ln(3/3) three times
    val short = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(Retrieval.lmScore(short).count() == 0)
  }

  test("mergeProfileStates: merged ≡ rebuilt when both slices share " +
    "values (the union dedups shared hashes); chaining associates") {
    val cols = Seq("v", "s")
    val k = 16
    // id % 100 over a % 3 split: gcd(3,100)=1, so BOTH slices contain
    // every v value — each shared value sits in both MinK buffers and
    // a merge without the distinct step would double it
    val df = spark.range(0, 1000).select(
      (col("id") % 100).as("v"),
      concat(lit("x"), col("id") % 37).as("s"))
    val a = df.filter(col("id") % 3 === 0)
    val b = df.filter(col("id") % 3 =!= 0)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.toSeq).toMap
    val merged = rows(Sketches.renderProfile(
      Sketches.mergeProfileStates(
        Sketches.profileState(a, cols, k),
        Sketches.profileState(b, cols, k), cols, k), cols, k))
    val rebuilt = rows(Sketches.profile(df, cols, k))
    assert(merged == rebuilt)
    // chained three-way merge (a ⊔ b1) ⊔ b2 ≡ rebuilt — a merged state
    // is itself a valid left operand
    val b1 = df.filter(col("id") % 3 === 1)
    val b2 = df.filter(col("id") % 3 === 2)
    val chained = rows(Sketches.renderProfile(
      Sketches.mergeProfileStates(
        Sketches.mergeProfileStates(
          Sketches.profileState(a, cols, k),
          Sketches.profileState(b1, cols, k), cols, k),
        Sketches.profileState(b2, cols, k), cols, k), cols, k))
    assert(chained == rebuilt)
  }

  test("profile: one pass yields counts, min/max, and KMV estimates " +
    "per column; below-k columns report exact distincts") {
    val df = Seq(
      (1L, Some("a"), Option.empty[Long]),
      (2L, Some("b"), Option.empty[Long]),
      (3L, Some("a"), Option.empty[Long]),
      (4L, None, Option.empty[Long])
    ).toDF("id", "s", "z")
    val got = Sketches.profile(df, Seq("id", "s", "z"), k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val idRow = got("id") // 4 distincts > k=3: estimate branch
    assert(idRow.getLong(1) == 4L && idRow.getLong(2) == 4L)
    assert(idRow.getString(3) == "1" && idRow.getString(4) == "4")
    assert(idRow.getLong(5) == 3L && !idRow.isNullAt(6))
    assert(idRow.getDouble(7) > 0.0)
    val sRow = got("s") // 2 distincts < k: exact branch, null kth
    assert(sRow.getLong(2) == 3L && sRow.getLong(5) == 2L)
    assert(sRow.isNullAt(6) && sRow.getDouble(7) == 2.0)
    assert(sRow.getString(3) == "a" && sRow.getString(4) == "b")
    val zRow = got("z") // all-null column
    assert(zRow.getLong(2) == 0L && zRow.getLong(5) == 0L)
    assert(zRow.isNullAt(3) && zRow.isNullAt(6) && zRow.getDouble(7) == 0.0)
  }

  test("incrementalAssign: a new batch lands in the standing quantizer's " +
    "cells without retraining") {
    val hist = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val cents = Similarity.centroids(hist, k = 2, lloydIters = 1)
    val batch = Seq((10L, Seq(0.95f, 0.05f)), (11L, Seq(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.incrementalAssign(cents, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 11L -> 1L))
    // consistency: assigning the HISTORICAL corpus through the standing
    // table equals ivfAssign's in-one-go assignment
    val inc = Similarity.incrementalAssign(cents, hist)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneGo = Similarity.ivfAssign(hist, k = 2, lloydIters = 1)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == oneGo)
  }

  test("semanticDedup drops exactly the lower-id-twinned vectors, " +
    "within cells only") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),         // the two cell seeds
      (2L, Seq(0.99f, 0.01f)), (3L, Seq(0.98f, 0.02f)), // near v0
      (4L, Seq(0.01f, 0.99f))                        // near v1
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, cells = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // cell 0 holds {0,2,3}: 2 twins 0; 3 twins 0 and 2. cell 1 holds
    // {1,4}: 4 twins 1. Seeds 0 and 1 survive (no lower id).
    assert(got == Map(2L -> ((0L, 1L)), 3L -> ((0L, 2L)),
      4L -> ((1L, 1L))))
  }

  test("passageTopK: MaxP surfaces the dense span a whole-doc score " +
    "dilutes") {
    import graft.functions.Retrieval
    // A: 64 fillers then a dense 4-term span; B: short with one hit.
    // Whole-doc BM25 prefers B (tiny dl); passage MaxP must prefer A
    // (its last window is almost pure query terms).
    val docs = Seq(
      (1L, ("x " * 64).trim + " spark spark spark spark"),
      (2L, "spark y")).toDF("doc_id", "text")
    val whole = Retrieval.bm25(docs, Seq("spark"))
      .orderBy(desc("score"), asc("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(whole.head == 2L, s"fixture broken: whole-doc ranked $whole")
    val passage = Retrieval.passageTopK(docs, Seq("spark"),
      window = 32, stride = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(passage.head._1 == 1L, s"MaxP ranked ${passage.toSeq}")
    // A's best window is the one starting at token 64 (win_id 4)
    assert(passage.head._2 == 4L)
    // hit-passage counts: A's span touches the last two windows;
    // B has exactly one
    val byDoc = passage.map(p => p._1 -> p._3).toMap
    assert(byDoc(2L) == 1L && byDoc(1L) >= 2L)
  }

  test("knScore: hand-computed Kneser-Ney probabilities; discounted " +
    "mass keeps observed-successor sums below 1") {
    import graft.functions.Retrieval
    // corpus bigrams: "a b"×2, "b a"×1, "b c"×1
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    // p(b|a) = (2-.75)/2 + .75·(1/2)·(1/3) = 0.75
    // p(a|b) = (1-.75)/2 + .75·(2/2)·(1/3) = 0.375 = p(c|b)
    def lp(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val got = Retrieval.knScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 2 * lp(0.75) + lp(0.375))))
    assert(got(2L) == ((1L, lp(0.375))))
    // observed-successor mass per context stays below 1 (the discount
    // reserves backoff mass): Σ_b p(·|b) = 0.75 here, checked via the
    // per-doc identity above; also every lp is negative
    assert(lp(0.75) < 0 && got.values.forall(_._2 < 0))
  }

  test("kn3Score: hand-computed order-3 KN chain (context-count " +
    "backoff through the bigram layer)") {
    import graft.functions.Retrieval
    val docs = Seq((1L, "a b c a b c"), (2L, "b c d"))
      .toDF("doc_id", "text")
    // dyadic-rational hand chain (see derivation in comments):
    // p3(abc)=0.7890625 p3(bca)=0.359375 p3(cab)=0.578125
    // p3(bcd)=0.359375
    def lp(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val got = Retrieval.kn3Score(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) ==
      ((4L, 2 * lp(0.7890625) + lp(0.359375) + lp(0.578125))))
    assert(got(2L) == ((1L, lp(0.359375))))
    // two-word docs carry no trigram and are absent
    val short = Retrieval.kn3Score(
      Seq((1L, "a b c"), (9L, "x y")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(short == Set(1L))
  }

  test("ccnetBuckets: value-separated thirds per language") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val b = graft.functions.Retrieval.ccnetBuckets(docs)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    val langs = b.map(_._1).distinct
    assert(langs.length >= 3)
    langs.foreach { l =>
      val rows = b.filter(_._1 == l)
      val byB = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      assert(byB.keySet == Set("tail", "middle", "head"), s"lang $l")
      // buckets are separated by VALUE: every tail score < every
      // middle score is not guaranteed (ties share a side), but
      // max(tail) <= min(middle) and max(middle) <= min(head) must
      // hold — the cutoffs are value comparisons
      assert(byB("tail").max <= byB("middle").min, s"lang $l")
      assert(byB("middle").max <= byB("head").min, s"lang $l")
      // roughly thirds: the rank-arithmetic cutoffs keep each bucket
      // within one tie-run of n/3
      val n = rows.length
      assert(byB("tail").length <= n, s"lang $l")
      assert(math.abs(byB("tail").length - n / 3) <= n / 6 + 2,
        s"lang $l tail=${byB("tail").length} n=$n")
    }
  }
}
