package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Mixing, Retrieval, Sketches, TextAnalysis}
import graft.operators.Quality

/** Round-9 fifth-wave operators: ExactSubstr span dedup, HyperLogLog,
  * UniMax allocation, hard negatives, SFT packing, constraint suite,
  * C4 cleaning. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- exactSubstrSpans / exactSubstrCut ---------------------------------

  test("exactSubstrSpans: shared 6-word run marks the loser's maximal " +
    "span; the first-occurrence doc keeps everything") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e f z"),
      (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, windowWords = 5)
      .orderBy("doc_id", "s")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares windows "a b c d e" (pos 2) and "b c d e f" (pos 3)
    // with doc 0 -> merged cover [2, 8)
    assert(spans == Seq((1L, 2L, 8L)))
  }

  test("exactSubstrSpans: within-doc repetition alone is NOT marked " +
    "(cross-doc only; q96 owns self-repetition)") {
    val docs = Seq(
      (0L, "a b c d e z z a b c d e"),
      (1L, "totally different words here five six")).toDF("doc_id", "text")
    assert(Dedup.exactSubstrSpans(docs, 5).count() == 0L)
  }

  test("exactSubstrCut: an exact duplicate doc is fully cut; the winner " +
    "and a bystander are untouched; word counts reconcile") {
    val t = "one two three four five six seven"
    val docs = Seq((3L, t), (9L, t), (5L, "unrelated text of five words ok"))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstrCut(docs, 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (3L, 7L, 0L, t),
      (5L, 6L, 0L, "unrelated text of five words ok"),
      (9L, 7L, 7L, "")))
  }

  test("exactSubstrCut: interior span cut reassembles the survivors in " +
    "order") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "pre1 pre2 a b c d e post1 post2")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrCut(docs, 5).filter(col("doc_id") === 1)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 9L, 5L, "pre1 pre2 post1 post2")))
  }

  test("exactSubstrSpans plan: no cartesian/broadcast-nested-loop join") {
    val docs = Seq((0L, "a b c d e f"), (1L, "a b c d e g"))
      .toDF("doc_id", "text")
    val p = Dedup.exactSubstrSpans(docs, 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  // --- HyperLogLog -------------------------------------------------------

  test("hllRegisters/hllEstimate: estimate lands within the p=9 error " +
    "band on 1000 distinct values, and occupied+zeros == 512") {
    val df = (1 to 1000).map(i => ("g", s"user$i")).toDF("grp", "v")
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, "grp", "v"), "grp")
      .as[(String, Long, Long, Long)].collect().head
    val (_, occupied, zeros, estimate) = est
    assert(occupied + zeros == 512L)
    // 3 sigma at p=9 is ~14%
    assert(math.abs(estimate - 1000L) <= 140L,
      s"estimate $estimate too far from 1000")
  }

  test("hll: merge is idempotent (re-adding the same rows changes " +
    "nothing) and merged-over-split equals one-shot exactly") {
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "v")
    val oneShot = Sketches.hllRegisters(df, "grp", "v")
    val waves = (0 until 4).map(k =>
      Sketches.hllRegisters(df.filter(pmod(col("v"), lit(4)) === k),
        "grp", "v"))
    val merged = waves.reduce(Sketches.mergeHll(_, _, "grp"))
    val again = Sketches.mergeHll(merged, oneShot, "grp")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("grp", "idx").as[(String, Long, Long)].collect().toSeq
    assert(key(merged) == key(oneShot))
    assert(key(again) == key(oneShot))
  }

  test("hllEstimate: tiny group takes the linear-counting branch and " +
    "stays near-exact") {
    val df = Seq(("g", "a"), ("g", "b"), ("g", "c"), ("g", "a"))
      .toDF("grp", "v")
    val r = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", "v"),
        "grp").as[(String, Long, Long, Long)].collect().head
    assert(r._2 == 3L) // occupied = 3 distinct hashes, no collisions
    assert(r._4 == 3L) // m ln(m/(m-3)) floors to 3 at m=512
  }

  test("hllPairOverlaps: identical populations estimate full overlap, " +
    "disjoint populations estimate near-zero; union of disjoint " +
    "halves tracks the sum") {
    val df = ((1 to 400).map(i => ("dup_a", s"u$i")) ++
      (1 to 400).map(i => ("dup_b", s"u$i")) ++
      (1 to 400).map(i => ("left", s"L$i")) ++
      (401 to 800).map(i => ("right", s"L$i"))).toDF("grp", "v")
    val out = Sketches.hllPairOverlaps(
        Sketches.hllRegisters(df, "grp", "v"), "grp")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val dup = out(("dup_a", "dup_b"))
    assert(dup._5 == dup._3 && dup._6 == math.min(dup._3, dup._4))
    val dis = out(("left", "right"))
    // inclusion-exclusion noise on truly disjoint 400+400: small
    assert(dis._6 <= 60L, s"disjoint est_inter ${dis._6}")
    assert(math.abs(dis._5 - 800L) <= 120L,
      s"union estimate ${dis._5} too far from 800")
  }

  // --- unimaxAllocation --------------------------------------------------

  test("unimaxAllocation: waterfilling hand case — small source capped, " +
    "large ones leveled, budget spent exactly") {
    val counts = Seq(("a", 10L), ("b", 100L), ("c", 1000L))
      .toDF("source", "tokens")
    val out = Mixing.unimaxAllocation(counts, budgetTokens = 300L,
        epochCap = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 20L, 20L, 20000L),
      ("b", 100L, 200L, 140L, 14000L),
      ("c", 1000L, 2000L, 140L, 1400L)))
  }

  test("unimaxAllocation: budget above total capacity caps every source " +
    "at epochCap exactly") {
    val counts = Seq(("a", 10L), ("b", 30L)).toDF("source", "tokens")
    val out = Mixing.unimaxAllocation(counts, budgetTokens = 1000L,
        epochCap = 3)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 30L, 30L, 30000L),
      ("b", 30L, 90L, 90L, 30000L)))
  }

  test("unimaxAllocation: nothing capped — equal split with floor " +
    "division") {
    val counts = Seq(("a", 100L), ("b", 101L), ("c", 102L))
      .toDF("source", "tokens")
    val out = Mixing.unimaxAllocation(counts, budgetTokens = 100L,
        epochCap = 1)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._4) == Seq(33L, 33L, 33L))
  }

  test("unimaxAllocation properties on random inputs: caps respected, " +
    "budget never exceeded and exhausted up to floor slack, uncapped " +
    "sources all sit at one common level") {
    val rnd = new scala.util.Random(23)
    (0 until 20).foreach { _ =>
      val n = rnd.nextInt(8) + 2
      val counts = (0 until n)
        .map(i => (s"s$i", (rnd.nextInt(1000) + 1).toLong))
      val budget = (rnd.nextInt(3000) + 100).toLong
      val cap = rnd.nextInt(3) + 1
      val out = Mixing.unimaxAllocation(counts.toDF("source", "tokens"),
          budget, cap)
        .as[(String, Long, Long, Long, Long)].collect()
      val total = out.map(_._4).sum
      val capTotal = out.map(_._3).sum
      out.foreach { case (_, _, capacity, alloc, _) =>
        assert(alloc <= capacity && alloc >= 0) }
      if (capTotal <= budget) assert(total == capTotal)
      else {
        assert(total <= budget && budget - total < n,
          s"slack ${budget - total} at n=$n")
        val uncapped = out.filter(r => r._4 < r._3).map(_._4)
        assert(uncapped.toSet.size <= 1, // one waterfill level
          s"uncapped levels ${uncapped.toSet}")
      }
    }
  }

  // --- hardNegatives -----------------------------------------------------

  test("hardNegatives: labeled positives are excluded, negatives rank " +
    "by score, margin is relative to the best positive") {
    val docs = Seq(
      (0L, "spark spark spark"), // best lexical match - labeled positive
      (1L, "spark spark other"),
      (2L, "spark other other"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val positives = Seq(("q1", 0L)).toDF("qid", "doc_id")
    val out = Retrieval.hardNegatives(docs, Seq("q1" -> Seq("spark")),
        positives, nNeg = 5)
      .orderBy("neg_rank")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(1L, 2L)) // doc 3 shares no term; 0 labeled
    val scored = Retrieval.bm25ScoredAll(docs, Seq("q1" -> Seq("spark")))
      .as[(String, Long, Long)].collect()
      .map { case (_, id, sc) => id -> sc }.toMap
    assert(out.head._4 == scored(1L))
    assert(out.head._5 == scored(1L) - scored(0L))
    assert(out.forall(_._5 < 0L)) // the positive outscores both here
  }

  test("gradedRetrievalMetrics: hand-exact MRR and NDCG — positive at " +
    "rank 2 of 2 gives mrr 500000 and ndcg 6309 bp") {
    val docs = Seq((0L, "spark spark"), (1L, "spark other"))
      .toDF("doc_id", "text")
    val positives = Seq(("q1", 1L)).toDF("qid", "doc_id")
    val m = Retrieval.gradedRetrievalMetrics(docs,
        Seq("q1" -> Seq("spark")), positives, k = 10)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    // (qid, n_pos, n_pos_topk, first_rank, mrr, dcg, idcg, ndcg_bp)
    assert(m == (("q1", 1L, 1L, 2L, 500000L, 630929L, 1000000L, 6309L)))
  }

  // --- packSft -----------------------------------------------------------

  test("packSft: prompt/mask arithmetic and contiguous per-source " +
    "layout; empty docs yield no example") {
    val docs = Seq(
      (0L, "s", "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (1L, "s", "a b c"),
      (2L, "s", "   ")).toDF("doc_id", "source", "text")
    val out = Mixing.packSft(docs, budget = 10)
      .select("doc_id", "prompt_tokens", "n_tokens", "start_tok",
        "seq_id", "seq_offset", "mask_start", "mask_end")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // doc 0: 9 words -> prompt 3, example 12, starts at 0, mask [5, 12)
    // doc 1: 3 words -> prompt 1, example 6, starts at 12 (seq 1 off 2),
    //        mask [15, 18); doc 2 empty -> dropped
    assert(out == Seq(
      (0L, 3L, 12L, 0L, 0L, 0L, 5L, 12L),
      (1L, 1L, 6L, 12L, 1L, 2L, 15L, 18L)))
  }

  // --- verifyConstraints -------------------------------------------------

  test("verifyConstraints: metrics are exact and verdicts respect the " +
    "[lo, hi] band; the whole suite is one pass over one scan") {
    val df = Seq((1L, Some("x")), (2L, Some("y")), (2L, None))
      .toDF("k", "v")
    val checks = Quality.verifyConstraints(df, Seq(
      Quality.Constraint("size", Quality.sizeMetric, 3L, 3L),
      Quality.Constraint("complete(v)", Quality.completenessBp("v"),
        10000L, 10000L), // fails: 2/3 non-null = 6666 bp
      Quality.Constraint("unique(k)", Quality.uniquenessBp("k"),
        10000L, 10000L))) // fails: 2 distinct / 3 rows = 6666 bp
    val got = checks.orderBy("check_name")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("complete(v)", 6666L, false),
      ("size", 3L, true),
      ("unique(k)", 6666L, false)))
    assert(checks.queryExecution.optimizedPlan.collectLeaves().size == 1)
  }

  // --- Aho-Corasick ------------------------------------------------------

  test("AcAutomaton: matches equal the naive per-pattern contains scan " +
    "on random strings, including prefix/overlap pattern sets") {
    val rnd = new scala.util.Random(7)
    val pats = Array("ab", "abc", "bc", "ca", "aa", "cab", "abca")
    val aut = new graft.plans.AcAutomaton(pats)
    (0 until 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))("abc" (rnd.nextInt(3))).mkString
      val got = aut.matches(s).map(_.toString).toSeq
      val want = pats.filter(s.contains(_)).sorted.toSeq
      assert(got == want, s"text '$s'")
    }
    assert(aut.matches("").isEmpty)
  }

  test("AcAutomaton: fail-link crossing finds a pattern that starts " +
    "inside another's match; multi-word phrases work") {
    val aut = new graft.plans.AcAutomaton(
      Array("hash join", "join order", "join"))
    assert(aut.matches("a hash join order b").map(_.toString).toSeq ==
      Seq("hash join", "join", "join order"))
  }

  test("gazetteerTags: one automaton pass over a DataFrame column " +
    "matches per-term instr checks") {
    val pats = Seq("agg", "hash join", "join", "slow")
    val docs = Seq((0L, "the hash join was slow"), (1L, "agg only"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        array_join(TextAnalysis.gazetteerTags(col("text"), pats), ",")
          .as("tags"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "hash join,join,slow"), (1L, "agg"),
      (2L, "")))
  }

  // --- incremental ExactSubstr -------------------------------------------

  test("exactSubstrSpansAgainst: accumulated fold spans equal one-shot " +
    "spans under the append-only id contract") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e f z"),   // dup of doc 0's run
      (2L, "p q r s t u v w"),
      (3L, "m m p q r s t u n n"), // dup of doc 2's run (later wave)
      (4L, "a b c d e tail words here")).toDF("doc_id", "text")
    val oneShot = Dedup.exactSubstrSpans(docs, 5)
      .as[(Long, Long, Long)].collect().toSet
    val waves = Seq(
      docs.filter(col("doc_id") <= 1),
      docs.filter(col("doc_id") === 2 || col("doc_id") === 3),
      docs.filter(col("doc_id") === 4))
    var idx = Dedup.exactSubstrIndex(docs.limit(0), 5)
    val acc = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    waves.foreach { w =>
      acc ++= Dedup.exactSubstrSpansAgainst(idx, w, 5)
        .as[(Long, Long, Long)].collect()
      idx = Dedup.foldExactSubstrIndex(idx, w, 5)
    }
    assert(acc.toSet == oneShot && oneShot.nonEmpty)
    // sanity: the later-wave doc 3 and doc 4 both got marked
    assert(oneShot.map(_._1) == Set(1L, 3L, 4L))
  }

  // --- allPairsSimilarityJoin --------------------------------------------

  test("allPairsSimilarityJoin: prefix-filtered candidates find EVERY " +
    "qualifying pair — blocked ≡ blocking-free brute force on random " +
    "docs (the zero-false-negative contract LSH lacks)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 40L).map(i => (i,
        Seq.fill(rnd.nextInt(15) + 5)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      .toDF("doc_id", "text")
    val tau = 2500
    val got = Dedup.allPairsSimilarityJoin(docs, shingleN = 2,
        minJaccardBp = tau)
      .as[(Long, Long, Long)].collect().toSet
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toLong
      uni = sets(a).size + sets(b).size - inter
      if inter * 10000L >= tau.toLong * uni
    } yield (a, b, inter * 10000L / uni)).toSet
    assert(got == brute && brute.nonEmpty, s"got ${got.size} brute ${brute.size}")
  }

  // --- goldenRecords -----------------------------------------------------

  test("goldenRecords: field-level mode with greatest-value tie rule; " +
    "nulls never win; member count and representative id") {
    val members = Seq(
      (10L, 1L, Some("acme"), "blue"),
      (10L, 2L, Some("acme"), "red"),
      (10L, 3L, Some("acmy"), "red"),
      (10L, 4L, None, "green"),
      (20L, 5L, Some("solo"), "grey"))
      .toDF("entity_id", "rid", "brand", "color")
    val got = Dedup.goldenRecords(members, "entity_id", "rid",
        Seq("brand", "color"))
      .orderBy("entity_id")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    // entity 10: brand acme (2 > 1; null ignored), color red vs blue vs
    // green all count 1..2 -> red has 2; entity 20 singleton
    assert(got == Seq(
      (10L, 4L, 1L, "acme", "red"),
      (20L, 1L, 5L, "solo", "grey")))
  }

  test("goldenRecords: exact tie breaks to the lexicographically " +
    "greatest value") {
    val members = Seq((1L, 1L, "aa"), (1L, 2L, "bb"))
      .toDF("entity_id", "rid", "f1")
    val got = Dedup.goldenRecords(members, "entity_id", "rid", Seq("f1"))
      .as[(Long, Long, Long, String)].collect().head
    assert(got._4 == "bb")
  }

  // --- Hilbert curve -----------------------------------------------------

  test("HilbertKernel: the 4-bit curve is a bijection, inverts " +
    "exactly, and consecutive positions are ALWAYS grid neighbours — " +
    "the locality property the Morton curve lacks") {
    import graft.plans.{HilbertKernel, InterleaveBitsKernel}
    val bits = 4
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)
    val ds = cells.map { case (x, y) => HilbertKernel.xy2d(bits, x, y) }
    assert(ds.toSet == (0L until n.toLong * n).toSet)
    cells.zip(ds).foreach { case ((x, y), d) =>
      val p = HilbertKernel.d2xy(bits, d)
      assert((p >> 32) == x && (p & 0xffffffffL) == y)
    }
    def gridDist(a: Long, b: Long): Long =
      math.abs((a >> 32) - (b >> 32)) +
        math.abs((a & 0xffffffffL) - (b & 0xffffffffL))
    (0L until n.toLong * n - 1).foreach { d =>
      assert(gridDist(HilbertKernel.d2xy(bits, d),
        HilbertKernel.d2xy(bits, d + 1)) == 1, s"jump at d=$d")
    }
    // the motivating contrast: Morton order DOES jump
    val mortonByD = cells.sortBy { case (x, y) =>
      InterleaveBitsKernel.interleave31(x, y) }
    val jumps = mortonByD.sliding(2).count { case Seq(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) > 1 }
    assert(jumps > 0)
  }

  test("hilbertBucketStats: bucket counts cover the table, and the " +
    "summed bounding-box area is no worse than the Morton report's " +
    "on the same data (the pruning win, pinned on this dataset)") {
    val li = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "lineitem")
    val h = graft.functions.Layout
      .hilbertBucketStats(li, "l_partkey", "l_suppkey", 6)
    val z = graft.functions.Layout
      .zOrderBucketStats(li, "l_partkey", "l_suppkey", 6)
    def area(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.collect()
      (rows.map(_.getLong(1)).sum,
        rows.map(r => (r.getLong(3) - r.getLong(2) + 1)
          * (r.getLong(5) - r.getLong(4) + 1)).sum)
    }
    val (hn, ha) = area(h)
    val (zn, za) = area(z)
    assert(hn == li.count() && zn == hn)
    assert(ha <= za, s"hilbert bbox area $ha should be <= morton $za")
  }

  // --- Theil-Sen ---------------------------------------------------------

  test("Theil-Sen median slope shrugs off the outlier day that drags " +
    "a least-squares fit") {
    // daily counts 10,11,12 then an outlier 107: pairwise slopes are
    // [1000,1000,1000, 32333,48000,95000] milli/day -> median 1000
    val daily = Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 107L))
      .toDF("d", "c").withColumn("event_type", lit("t"))
    val slopes = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        expr("((b.c - a.c) * 1000) div (b.d - a.d)").as("slope_milli"))
    val p50 = Sketches.percentilesByValue(slopes, "event_type",
        "slope_milli", Seq(50))
      .collect().head.getLong(2)
    assert(p50 == 1000L)
    // the mean of the same slopes is dragged far above the trend
    val mean = slopes.agg(avg(col("slope_milli"))).head.getDouble(0)
    assert(mean > 20000.0)
  }

  // --- clusteringCoefficients --------------------------------------------

  test("clusteringCoefficients: exact bp on a hand graph — clique " +
    "members at 10000, the hub diluted by its pendant, degree-1 at 0") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
      .toDF("id_a", "id_b")
    val got = graft.functions.Graph.clusteringCoefficients(pairs)
      .orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 3333L), // deg 3, 1 triangle: 2/(3·2) = 3333 bp
      (2L, 2L, 1L, 10000L),
      (3L, 2L, 1L, 10000L),
      (4L, 1L, 0L, 0L)))
  }

  // --- kwicSnippets ------------------------------------------------------

  test("kwicSnippets: densest window wins, ties break to the earliest " +
    "start; short docs yield their whole text") {
    val docs = Seq(
      (0L, "a b spark c d e f g h i j spark spark x"),
      (1L, "spark tiny")).toDF("doc_id", "text")
    val out = Retrieval.kwicSnippets(docs, Seq("q1" -> Seq("spark")),
        topK = 2, window = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_hits", "snippet_start", "snippet")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 0's densest 5-window is [8, 13) — two sparks, and the
    // earlier two-spark window at 8 beats the equal one at 9
    assert(out.head == ((0L, 2L, 8L, "h i j spark spark")))
    assert(out(1) == ((1L, 1L, 0L, "spark tiny")))
  }

  // --- verifyReferential -------------------------------------------------

  test("verifyReferential: orphan rates are exact bp; null child keys " +
    "don't count; duplicate parents don't inflate") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val got = Quality.verifyReferential(Seq(
        Quality.FkCheck("fk_ok_range", child, "fk", parent, "pk",
          0L, 3000L),
        Quality.FkCheck("fk_strict", child, "fk", parent, "pk",
          0L, 0L)))
      .orderBy("check_name")
      .as[(String, Long, Boolean)].collect().toSeq
    // 1 orphan (9) of 4 non-null keys = 2500 bp
    assert(got == Seq(("fk_ok_range", 2500L, true),
      ("fk_strict", 2500L, false)))
  }

  // --- c4Clean -----------------------------------------------------------

  test("c4Clean: every rule fires — no-terminal, short, javascript " +
    "lines drop; lorem-ipsum and brace pages drop; survivors " +
    "reassemble in order") {
    val good = "this line has enough words here."
    val docs = Seq(
      (0L, s"$good\n$good\n$good"),                    // keeps all 3
      (1L, s"$good\n$good"),                           // only 2 -> drop
      (2L, s"$good\nno terminal punctuation line\n$good\n$good"),
      (3L, s"$good\ntoo short.\n$good\n$good"),
      (4L, s"$good\nthe javascript line is banned ok.\n$good\n$good"),
      (5L, s"$good\n$good\n$good\nlorem ipsum dolor sit amet."),
      (6L, s"$good\n$good\n$good\nvar x = {1};.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Boolean, String)].collect().toSeq
    assert(out(0) == ((0L, 3L, 3L, true, s"$good\n$good\n$good")))
    assert(out(1) == ((1L, 2L, 2L, false, "")))
    assert(out(2) == ((2L, 4L, 3L, true, s"$good\n$good\n$good")))
    assert(out(3) == ((3L, 4L, 3L, true, s"$good\n$good\n$good")))
    assert(out(4) == ((4L, 4L, 3L, true, s"$good\n$good\n$good")))
    assert(out(5)._4 == false && out(5)._5 == "")
    assert(out(6)._4 == false && out(6)._5 == "")
  }
}
