package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Mixing, Retrieval, Sketches, TextAnalysis}
import graft.operators.RangeJoin

/** Round-7 operators: segment dedup, sliding windows, quota sampling,
  * fuzzy join, champion lists, heavy hitters, range join, containment. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- Dedup.dedupSegments ------------------------------------------------

  test("dedupSegments: first occurrence wins corpus-wide, text reassembles") {
    val seg = "a b c d"
    val docs = Seq(
      (1L, s"$seg w x y z"),          // segs: [a b c d] [w x y z]
      (2L, s"p q r s $seg"),          // [p q r s] [a b c d=dup]
      (3L, seg),                      // fully duplicate
      (4L, "")                        // empty
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, window = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq == Seq(
      (1L, 2L, 2L, "a b c d w x y z"),
      (2L, 2L, 1L, "p q r s"),
      (3L, 1L, 0L, ""),
      (4L, 0L, 0L, "")))
  }

  test("dedupSegments: duplicate WITHIN one doc collapses to first; " +
    "short tail segment is its own unit") {
    val docs = Seq((7L, "x y x y z")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, window = 2)
      .collect().head
    // segs: [x y] [x y]=dup [z]
    assert((out.getLong(1), out.getLong(2), out.getString(3)) ==
      (3L, 2L, "x y z"))
  }

  // --- Mixing.slidingWindows ----------------------------------------------

  test("slidingWindows: stride/overlap layout, short tail, empty doc") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens, window 4 stride 3
      (2L, "a b"),                  // shorter than window: one short window
      (3L, " ")                     // no windows
    ).toDF("doc_id", "text")
    val out = Mixing.slidingWindows(docs, window = 4, stride = 3)
      .orderBy("doc_id", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 1L, "t6"),
      (2L, 0L, 0L, 2L, "a b")))
  }

  test("slidingWindows: stride == window tiles without overlap and " +
    "covers every token exactly once") {
    val docs = Seq((1L, (0 until 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Mixing.slidingWindows(docs, window = 4, stride = 4)
      .orderBy("win_id").collect()
    assert(out.map(_.getString(4)).mkString(" ") ==
      (0 until 10).map(i => s"w$i").mkString(" "))
    assert(out.map(_.getLong(3)).sum == 10L)
  }

  // --- TextAnalysis.quotaSample -------------------------------------------

  test("quotaSample: caps each stratum at its quota, keeps whole " +
    "strata under quota, determinism across runs") {
    val docs = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val out = TextAnalysis.quotaSample(docs, "doc_id", "lang",
      Map("en" -> 10, "de" -> 1000), defaultQuota = 0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 10L, "de" -> 100L)) // fr: quota 0
    val again = TextAnalysis.quotaSample(docs, "doc_id", "lang",
      Map("en" -> 10, "de" -> 1000), defaultQuota = 0)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("quotaSample: selection is the smallest md5 hashes per stratum " +
    "(matches the window-rank formulation)") {
    val docs = (0L until 120L).map(i => (i, s"s${i % 2}"))
      .toDF("doc_id", "lang")
    val expected = docs
      .withColumn("hv", Dedup.md5Hash64(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy("hv", "doc_id")))
      .filter(col("rk") <= 7).select("doc_id").as[Long].collect().sorted
    val got = TextAnalysis.quotaSample(docs, "doc_id", "lang",
      Map.empty, defaultQuota = 7)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == expected.toSeq)
  }

  // --- TextAnalysis.fuzzyPairs --------------------------------------------

  test("fuzzyPairs: equals the brute-force cross join on strings that " +
    "honor the length contract") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val strs = (0 until 60).map { i =>
      val len = 6 + rnd.nextInt(4)
      i.toLong -> (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = strs.toDF("id", "s")
    val got = TextAnalysis.fuzzyPairs(df, "id", "s", maxDist = 2, q = 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(want.nonEmpty, "fixture produced no close pairs — weak test")
    assert(got == want)
  }

  test("fuzzyPairsAgainst: standing pairs + batch-touching pairs == " +
    "one-shot pairs over the union, on random strings") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abc"
    val strs = (0 until 60).map { i =>
      val len = 6 + rnd.nextInt(4)
      i.toLong -> (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val all = strs.toDF("id", "s")
    val standing = all.filter($"id" % 2 === 0)
    val batch = all.filter($"id" % 2 =!= 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val oneShot = pairSet(
      TextAnalysis.fuzzyPairs(all, "id", "s", maxDist = 2, q = 2))
    val standingPairs = pairSet(
      TextAnalysis.fuzzyPairs(standing, "id", "s", maxDist = 2, q = 2))
    val touching = pairSet(TextAnalysis.fuzzyPairsAgainst(standing,
      batch, "id", "s", maxDist = 2, q = 2))
    // disjoint decomposition: the probe never regenerates a
    // standing-standing pair, and together they are exactly one-shot
    assert(standingPairs.intersect(touching).isEmpty)
    assert(standingPairs ++ touching == oneShot)
    assert(touching.nonEmpty, "fixture produced no batch pairs — weak")
  }

  test("fuzzyPairs: identical strings pair at distance 0 even below " +
    "the length contract (whole-string gram)") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz"))
      .toDF("id", "s")
    val got = TextAnalysis.fuzzyPairs(df, "id", "s", maxDist = 1, q = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  // --- Retrieval.championPairs --------------------------------------------

  test("championPairs: equals the window-rank formulation") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5")
    val docs = (0L until 40L).map { i =>
      i -> (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }.toDF("doc_id", "text")
    val c = 4
    val got = Retrieval.championPairs(docs, championsPerTerm = c)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: explicit window-rank champions + pair self-join
    val tf = docs.select(col("doc_id"),
        explode(Retrieval.tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val n = docs.count()
    val champs = tf.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")
          .orderBy(desc("tf"), asc("doc_id"))))
      .filter(col("rk") <= c)
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = champs.join(dfc, Seq("term"))
      .withColumn("idf", log(lit(1.0) + lit(n.toDouble) / col("df")))
      .withColumn("wm",
        floor((lit(1.0) + log(col("tf").cast("double")))
          * col("idf") * lit(1e3)).cast("long"))
    val want = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("a.wm") * col("b.wm")).as("score_u"))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  // --- Sketches.freqItems (Misra-Gries) -----------------------------------

  test("freqItems: exact when distinct <= k, for any partitioning") {
    val data = (0 until 500).map(i => s"item${i % 9}")
    val df = spark.sparkContext.parallelize(data, 7).toDF("v")
    val got = df.agg(Sketches.freqItems(col("v"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt").as[(String, Long)].collect().toSeq
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (item, c) => (-c, item) }
    assert(got == want)
  }

  test("freqItems: MG bounds beyond capacity — no undercount worse " +
    "than n/(k+1), every true heavy hitter present") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i drawn with weight 1/(i+1)
    val weights = (0 until 60).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val data = (0 until 4000).map { _ =>
      val x = rnd.nextDouble() * total
      s"z${cum.indexWhere(x <= _)}"
    }
    val k = 8
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = spark.sparkContext.parallelize(data, 13).toDF("v")
      .agg(Sketches.freqItems(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt").as[(String, Long)].collect().toMap
    val bound = data.size.toDouble / (k + 1)
    got.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth, s"$item overcounted: $est > $truth")
      assert(truth - est <= bound,
        s"$item undercounted past n/(k+1): $truth - $est > $bound")
    }
    exact.filter(_._2 > bound).keys.foreach { hh =>
      assert(got.contains(hh), s"true heavy hitter $hh evicted")
    }
  }

  test("mergeFreqStates: merged ≡ rebuilt below capacity; MG bound " +
    "holds beyond it") {
    val rnd = new scala.util.Random(17)
    val items = (0 until 3000).map(_ => s"m${rnd.nextInt(40)}")
    val df = items.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .withColumn("g", lit("all"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // below capacity (k=64 > 40 distinct): merged ≡ rebuilt ≡ exact
    val aE = Sketches.freqState(df.filter(col("id") % 2 === 0), "g", "v", 64)
    val bE = Sketches.freqState(df.filter(col("id") % 2 === 1), "g", "v", 64)
    val mergedE = Sketches.mergeFreqStates(aE, bE, 64, "g")
      .select("item", "cnt").as[(String, Long)].collect().toMap
    assert(mergedE == exact)
    // beyond capacity (k=8): counts never overcount, undercount ≤ n/(k+1)
    val k = 8
    val a = Sketches.freqState(df.filter(col("id") % 2 === 0), "g", "v", k)
    val b = Sketches.freqState(df.filter(col("id") % 2 === 1), "g", "v", k)
    val merged = Sketches.mergeFreqStates(a, b, k, "g")
      .select("item", "cnt").as[(String, Long)].collect().toMap
    assert(merged.nonEmpty && merged.size <= k)
    val bound = items.size.toDouble / (k + 1)
    merged.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item overcounted")
      assert(exact(item) - est <= bound, s"$item past the MG bound")
    }
  }

  // --- RangeJoin.pointInInterval ------------------------------------------

  test("pointInInterval: equals the raw range predicate, endpoints " +
    "closed, multi-bin intervals meet each point exactly once") {
    val rnd = new scala.util.Random(3)
    val points = (0 until 200).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate
        .of(1995, 1, 1).plusDays(rnd.nextInt(400))))
    }.toDF("pid", "d")
    val intervals = (0 until 60).map { i =>
      val s = java.time.LocalDate.of(1995, 1, 1)
        .plusDays(rnd.nextInt(380))
      (i.toLong, java.sql.Date.valueOf(s),
        java.sql.Date.valueOf(s.plusDays(rnd.nextInt(40))))
    }.toDF("iid", "s", "e")
    for (binDays <- Seq(1, 7, 30, 365)) {
      val got = RangeJoin.pointInInterval(points, "d",
          intervals, "s", "e", binDays)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = points.join(intervals,
          col("d").between(col("s"), col("e")))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(want.nonEmpty && got == want, s"binDays=$binDays")
    }
  }

  // --- Graph.triangles ----------------------------------------------------

  test("triangles: equals brute-force enumeration on random graphs; " +
    "dups, reversed edges and self-loops are absorbed") {
    val rnd = new scala.util.Random(5)
    for (density <- Seq(0.05, 0.15, 0.4)) {
      val n = 30
      val raw = for {
        a <- 0L until n; b <- 0L until n
        if a != b && rnd.nextDouble() < density
      } yield (a, b) // both orientations + dups possible
      val edges = raw.toDF("id_a", "id_b")
        .union(Seq((3L, 3L)).toDF("id_a", "id_b")) // self-loop dropped
      val got = graft.functions.Graph.triangles(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val und = raw.map { case (a, b) =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val want = (for {
        (a, b) <- und; c <- 0L until n
        if c > b && und.contains((a, c)) && und.contains((b, c))
      } yield (a, b, c)).toSet
      assert(want.nonEmpty, s"density $density fixture has no triangles")
      assert(got == want, s"density $density")
    }
  }

  // --- Sketches.percentilesByValue ----------------------------------------

  test("percentilesByValue: exact percentile_disc semantics vs a " +
    "sorted-list reference, including ties and tiny groups") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 400).map(i =>
      (s"g${i % 3}", rnd.nextInt(12).toLong)) ++ Seq(("tiny", 42L))
    val df = rows.toDF("g", "v")
    val ps = Seq(1, 25, 50, 90, 99, 100)
    val got = Sketches.percentilesByValue(df, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), ps.indices.map(i => r.getLong(2 + i)))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val nn = sorted.length.toLong
      val want = ps.map(p =>
        sorted(((nn * p + 99) / 100 - 1).toInt))
      assert(got(g) == ((nn, want)), s"group $g")
    }
  }

  // --- TextAnalysis.weightedSample ----------------------------------------

  test("weightedSample: matches the window-rank ES formulation; " +
    "zero-weight rows excluded; small strata kept whole") {
    val rnd = new scala.util.Random(21)
    val docs = (0L until 200L).map(i =>
      (i, s"s${i % 3}", if (i % 50 == 0) 0L else 1L + rnd.nextInt(999)))
      .toDF("doc_id", "source", "n_chars") // every 50th weight-0
    val k = 6
    val got = TextAnalysis.weightedSample(docs, "doc_id", "n_chars",
        "source", k)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val esKey = floor(-log(
        (Dedup.md5Hash64(col("doc_id").cast("string")) + 1)
          .cast("double") / lit(1.152921504606846976e18))
      / col("n_chars").cast("double") * lit(1e12)).cast("long")
    val want = docs.filter(col("n_chars") > 0)
      .withColumn("key", esKey)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("key", "doc_id")))
      .filter(col("rk") <= k).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(got == want && got.size == 3 * k)
    assert(!got.exists(_ % 50 == 0), "a zero-weight row was sampled")
    // a stratum smaller than k survives whole
    val small = Seq((1L, "only", 5L), (2L, "only", 7L))
      .toDF("doc_id", "source", "n_chars")
    assert(TextAnalysis.weightedSample(small, "doc_id", "n_chars",
      "source", k).count() == 2)
  }

  test("weightedSample: heavier rows win proportionally more often " +
    "(many independent strata as trials)") {
    // 400 strata of {light w=1, heavy w=9}, k=1: heavy should win ~90%
    val docs = (0 until 400).flatMap { s =>
      Seq((s * 2L, s"t$s", 1L), (s * 2L + 1L, s"t$s", 9L))
    }.toDF("doc_id", "source", "n_chars")
    val heavyWins = TextAnalysis.weightedSample(docs, "doc_id",
        "n_chars", "source", 1)
      .filter(col("doc_id") % 2 === 1).count()
    assert(heavyWins > 320 && heavyWins < 400, // E=360, ±4σ≈24
      s"heavy rows won $heavyWins/400 — ES weighting broken?")
  }

  // --- BloomJoin ----------------------------------------------------------

  test("bloom filter: zero false negatives; false-positive rate near " +
    "theory at 10 bits/key; merge across partitions") {
    val rnd = new scala.util.Random(29)
    val keys = (0 until 1000).map(_ => rnd.nextLong()).distinct
    val numBits = 1 << 14 // ~16 bits/key
    val df = spark.sparkContext.parallelize(keys, 9).toDF("k")
    val bits = df.agg(graft.operators.BloomJoin
        .bloomOf(col("k"), numBits, 5).as("bf"))
      .collect().head.getSeq[Long](0)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bits.toArray)
    keys.foreach { k =>
      assert(graft.plans.BloomOps.contains(arr, k, 5, numBits),
        s"false negative for $k")
    }
    val probes = (0 until 20000).map(_ => rnd.nextLong())
      .filterNot(keys.toSet)
    val fp = probes.count(p =>
      graft.plans.BloomOps.contains(arr, p, 5, numBits))
    // theoretical fp at m/n=16, k=5 is ~0.5%; allow generous headroom
    assert(fp.toDouble / probes.size < 0.03,
      s"fp rate ${fp.toDouble / probes.size}")
  }

  test("reducedSemiJoin ≡ the plain semi-join (false positives culled)") {
    val rnd = new scala.util.Random(31)
    val big = (0 until 5000).map(i => (rnd.nextInt(800).toLong, i))
      .toDF("k", "payload")
    val keys = (0 until 120).map(_ => rnd.nextInt(800).toLong)
      .distinct.toDF("kk")
    // tiny filter (512 bits for ~100 keys) to force real false positives
    val got = graft.operators.BloomJoin.reducedSemiJoin(
        big, "k", keys, "kk", numBits = 512, numHashes = 3)
      .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
    val want = big.join(keys, col("k") === col("kk"), "left_semi")
      .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("bloom_contains probes map-side ahead of the exact join " +
    "(visible in the q114 plan) and is SQL-callable") {
    val p = SparkEntry.queries("q114_bloom_semijoin")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(p.contains("bloom_contains"), p.take(2000))
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      """SELECT bloom_contains(bf, 7L, 3, 256) AS hit,
        |       bloom_contains(bf, 8L, 3, 256) AS miss8
        |FROM (SELECT bloom_agg(v, 256, 3) AS bf
        |      FROM VALUES (7L), (9L) AS t(v))""".stripMargin)
      .collect().head
    assert(r.getBoolean(0)) // no false negatives, ever
  }

  // --- Dedup.containmentPairs ---------------------------------------------

  test("containmentPairs: an embedded doc scores full one-sided " +
    "containment; the scores are the exact set ratios") {
    // 16-bands × 1-row banding for candidate recall in a tiny fixture —
    // the production symmetric-banding recall caveat is in the scaladoc
    val quoted = (0 until 12).map(i => s"q$i").mkString(" ")
    val host = quoted + " extra"       // 13 tokens: 11 shingles, 10 shared
    val other = (0 until 30).map(i => s"o$i").mkString(" ")
    val docs = Seq((1L, host), (2L, quoted), (3L, other))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 1, minContainmentBp = 9000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc 2's 10 shingles all appear among doc 1's 11:
    // contain_ab = floor(10·10000/11) = 9090, contain_ba = 10000
    assert(out.toSeq == Seq((1L, 2L, 9090L, 10000L)))
  }
}
