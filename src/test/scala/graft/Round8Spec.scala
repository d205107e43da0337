package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Graph, Layout, Retrieval, Sketches}
import graft.plans.{InterleaveBitsKernel, SortableBitsKernel}

/** Round-8 operators: champion-list rerank (SortedStructDot kernel). */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- SortedStructDot kernel --------------------------------------------

  test("sortedStructDot: kernel matches the HOF map-lookup formulation " +
    "on random sorted sparse vectors") {
    val rnd = new scala.util.Random(42)
    def vec(): Seq[(Long, Long)] = {
      val keys = rnd.shuffle((0L until 40L).toList).take(rnd.nextInt(12) + 1)
      keys.sorted.map(k => k -> (rnd.nextInt(1000) + 1).toLong)
    }
    val rows = Seq.fill(50)((vec(), vec()))
    val df = rows.toDF("va", "vb")
    val hof = aggregate(col("va"), lit(0L), (acc, x) =>
      acc + x.getField("_2") * coalesce(
        element_at(map_from_entries(col("vb")), x.getField("_1")), lit(0L)))
    val got = df.select(
      Retrieval.sortedStructDot(col("va"), col("vb")).as("kernel"),
      hof.as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and against a plain Scala computation
    val expect = rows.map { case (a, b) =>
      val bm = b.toMap
      a.map { case (k, w) => w * bm.getOrElse(k, 0L) }.sum
    }
    assert(got.map(_.getLong(0)).toSeq == expect)
  }

  test("sorted_struct_dot / double_sortable_bits / interleave_bits31 " +
    "are callable from SQL") {
    GraftSession.registerFunctions(spark)
    val out = spark.sql(
      """SELECT sorted_struct_dot(
        |  array(struct(1L, 10L), struct(3L, 5L)),
        |  array(struct(1L, 2L), struct(2L, 100L), struct(3L, 4L))) v
        |""".stripMargin).collect().head.getLong(0)
    assert(out == 10L * 2L + 5L * 4L)
    val r = spark.sql(
      """SELECT double_sortable_bits(CAST(2.5 AS DOUBLE)) AS u,
        |       interleave_bits31(3L, 3L) AS z""".stripMargin)
      .collect().head
    assert(r.getLong(0) == SortableBitsKernel.toSortable(2.5))
    assert(r.getLong(1) == 15L)
  }

  // --- championPairsRescored ---------------------------------------------

  test("championPairsRescored: full score adds non-champion shared terms; " +
    "equals champion score when all shared terms are champion-shared") {
    // c=2: term x champions {d1,d2} -> candidate (1,2); term z champions
    // {d3,d4} -> candidate (3,4). Pair (1,2) ALSO shares z but neither is
    // a z-champion, so champ misses z and full includes it; pair (3,4)
    // shares only z (champion-shared) so full == champ.
    val docs = Seq(
      (1L, "x x z"), (2L, "x z"),
      (3L, "z z z z z"), (4L, "z z z z z z")).toDF("doc_id", "text")
    val out = Retrieval.championPairsRescored(docs, championsPerTerm = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set((1L, 2L), (3L, 4L)))

    def w(tf: Double, idf: Double): Long =
      math.floor((1.0 + math.log(tf)) * idf * 1000).toLong
    val idfX = math.log(1.0 + 4.0 / 2.0)
    val idfZ = math.log(1.0 + 4.0 / 4.0)
    val champ12 = w(2, idfX) * w(1, idfX)
    val full12 = champ12 + w(1, idfZ) * w(1, idfZ)
    assert(out((1L, 2L)) == ((1L, champ12, full12)))
    assert(full12 > champ12)
    val c34 = w(6, idfZ) * w(5, idfZ)
    assert(out((3L, 4L)) == ((1L, c34, c34)))
  }

  test("championPairsRescored: full_score_u >= champ_score_u everywhere " +
    "and candidate set matches championPairs") {
    val rnd = new scala.util.Random(7)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(rnd.nextInt(20) + 1)(
        words(rnd.nextInt(words.size))).mkString(" "))).toDF("doc_id", "text")
    val scored = Retrieval.championPairsRescored(docs, championsPerTerm = 3)
      .collect()
    assert(scored.nonEmpty)
    scored.foreach(r => assert(r.getLong(4) >= r.getLong(3),
      s"full < champ on ${r.getLong(0)}-${r.getLong(1)}"))
    val candGot = scored.map(r => (r.getLong(0), r.getLong(1))).toSet
    val candRef = Retrieval.championPairs(docs, championsPerTerm = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candGot == candRef)
  }

  test("sortedStructDot: randomized property — full-range keys, " +
    "negative and large weights, empty and disjoint vectors") {
    val rnd = new scala.util.Random(61)
    def vec(n: Int): Seq[(Long, Long)] = {
      val keys = Iterator.continually(rnd.nextLong()).distinct.take(n)
        .toSeq.sorted
      keys.map(_ -> (rnd.nextLong() % 100000L))
    }
    val rows = (Seq((vec(0), vec(5)), (vec(7), vec(0))) ++
      Seq.fill(30)((vec(rnd.nextInt(20)), vec(rnd.nextInt(20)))) ++
      // force overlaps: share a common prefix of keys
      Seq.fill(20) {
        val shared = vec(8)
        (shared ++ vec(5) sortBy (_._1), shared ++ vec(3) sortBy (_._1))
      }).map { case (a, b) => (a.distinct.sortBy(_._1).distinctBy(_._1),
        b.distinct.sortBy(_._1).distinctBy(_._1)) }
    val got = rows.toDF("va", "vb").select(
      Retrieval.sortedStructDot(col("va"), col("vb"))).collect()
      .map(_.getLong(0))
    val expect = rows.map { case (a, b) =>
      val bm = b.toMap
      a.map { case (k, w) => w * bm.getOrElse(k, 0L) }.sum
    }
    assert(got.toSeq == expect)
  }

  test("sortable bits: 10k random doubles — order preserved pairwise, " +
    "roundtrip bit-exact") {
    val rnd = new scala.util.Random(67)
    val ds = Seq.fill(10000)(rnd.nextInt(4) match {
      case 0 => rnd.nextGaussian()
      case 1 => rnd.nextGaussian() * 1e300
      case 2 => rnd.nextGaussian() * 1e-300
      case _ => -rnd.nextDouble()
    })
    ds.foreach { d =>
      val u = SortableBitsKernel.toSortable(d)
      assert(java.lang.Double.doubleToLongBits(
        SortableBitsKernel.fromSortable(u)) ==
        java.lang.Double.doubleToLongBits(d))
    }
    val sortedByU = ds.map(d => (SortableBitsKernel.toSortable(d), d))
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
      .map(_._2)
    assert(sortedByU == ds.sorted)
  }

  test("interleave31: random roundtrip — deinterleaving the Morton " +
    "code recovers both coordinates") {
    val rnd = new scala.util.Random(71)
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L; var i = 0
      while (i < 31) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    (1 to 2000).foreach { _ =>
      val x = rnd.nextLong() & ((1L << 31) - 1)
      val y = rnd.nextLong() & ((1L << 31) - 1)
      assert(deinterleave(
        InterleaveBitsKernel.interleave31(x, y)) == ((x, y)))
    }
  }

  test("psiDrift per-bin invariants under snapshot swap: delta negates, " +
    "contributions stay non-negative and agree within one quantization " +
    "step (floor(-L) = -floor(L)-1 for non-integral L)") {
    val rnd = new scala.util.Random(73)
    val a = Seq.fill(300)(rnd.nextGaussian() * 50).map(Tuple1(_))
      .toDF("v")
    val b = Seq.fill(200)(rnd.nextGaussian() * 80 + 20).map(Tuple1(_))
      .toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(6), r.getLong(8)))).toMap
    val ab = m(Sketches.psiDrift(a, b, "v", 20.0))
    val ba = m(Sketches.psiDrift(b, a, "v", 20.0))
    assert(ab.keySet == ba.keySet)
    ab.foreach { case (bin, (delta, contrib)) =>
      val (d2, c2) = ba(bin)
      assert(d2 == -delta)
      // PSI's (p−q)·ln(p/q) term is mathematically symmetric; the
      // millinat floor breaks exactness by at most |delta| (one
      // quantization unit per delta count)
      assert(contrib >= 0 && c2 >= 0)
      assert(math.abs(c2 - contrib) <= math.abs(delta),
        s"bin $bin: $contrib vs $c2 beyond the floor step")
    }
  }

  // --- SortableBits / bisectQuantiles ------------------------------------

  test("sortable bits: order-preserving, exactly invertible, " +
    "negatives/zeros/infinities included") {
    val vals = Seq(Double.NegativeInfinity, -1.5e300, -2.0, -1.0,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      1.0, 2.5, 1.5e300, Double.PositiveInfinity)
    val imgs = vals.map(SortableBitsKernel.toSortable)
    // strictly increasing in UNSIGNED order (-0.0 < +0.0 by design)
    imgs.sliding(2).foreach { case Seq(a, b) =>
      assert(java.lang.Long.compareUnsigned(a, b) < 0, s"$a !< $b")
    }
    vals.zip(imgs).foreach { case (v, u) =>
      val back = SortableBitsKernel.fromSortable(u)
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(v))
    }
  }

  test("bisectQuantiles: matches sort-based percentile_disc on a mixed " +
    "random sample with negatives, duplicates, and extreme magnitudes") {
    val rnd = new scala.util.Random(11)
    val data = (Seq.fill(500)(rnd.nextGaussian() * 1e6) ++
      Seq.fill(100)(42.0) ++ Seq(-1e300, 1e300, 0.0, -0.0) ++
      Seq.fill(50)(rnd.nextDouble() * 1e-10)).map(Tuple1(_))
    val df = data.toDF("v")
    val ps = Seq(1, 10, 50, 90, 100)
    val got = Sketches.bisectQuantiles(df, "v", ps)
      .orderBy("p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val sorted = data.map(_._1).sorted
    val n = sorted.size.toLong
    val expect = ps.map { p =>
      val rk = (n * p + 99) / 100
      (p.toLong, rk, n, sorted((rk - 1).toInt))
    }
    assert(got.toSeq == expect)
  }

  test("bisectQuantiles: nulls and NaNs excluded; empty input yields " +
    "null values with n = 0") {
    val df = Seq(Some(3.0), None, Some(Double.NaN), Some(1.0), Some(2.0))
      .toDF("v")
    val got = Sketches.bisectQuantiles(df, "v", Seq(50, 100))
      .orderBy("p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((50L, 2L, 3L, 2.0), (100L, 3L, 3L, 3.0)))
    val empty = Seq.empty[Option[Double]].toDF("v")
    val e = Sketches.bisectQuantiles(empty, "v", Seq(50)).collect()
    assert(e.length == 1 && e.head.getLong(2) == 0L && e.head.isNullAt(3))
  }

  test("bisectQuantiles: degenerate shapes — constant column, single " +
    "row, and p=1 on duplicates-heavy data") {
    val const = Seq.fill(100)(7.25).map(Tuple1(_)).toDF("v")
    val gotC = Sketches.bisectQuantiles(const, "v", Seq(1, 50, 100))
      .orderBy("p").collect()
    assert(gotC.forall(_.getDouble(3) == 7.25))
    assert(gotC.map(_.getLong(1)).toSeq == Seq(1L, 50L, 100L))
    val one = Seq(Tuple1(-3.5)).toDF("v")
    val gotO = Sketches.bisectQuantiles(one, "v", Seq(1, 100)).collect()
    assert(gotO.forall(r => r.getLong(2) == 1L && r.getDouble(3) == -3.5))
    val dups = (Seq.fill(60)(1.0) ++ Seq.fill(40)(2.0))
      .map(Tuple1(_)).toDF("v")
    val gotD = Sketches.bisectQuantiles(dups, "v", Seq(1, 60, 61, 100))
      .orderBy("p").collect().map(r => r.getLong(0) -> r.getDouble(3))
    assert(gotD.toSeq == Seq(1L -> 1.0, 60L -> 1.0, 61L -> 2.0,
      100L -> 2.0))
  }

  test("bisectQuantilesByGroup: per-group radix select matches the " +
    "per-group sorted reference; null groups and values excluded") {
    val rnd = new scala.util.Random(29)
    val data = (Seq.tabulate(600)(i =>
      (Some(s"g${i % 3}"), Some(rnd.nextGaussian() * 100))) ++
      Seq((None, Some(1.0)), (Some("g0"), None))).map {
      case (g, v) => (g.orNull, v.map(Double.box).orNull)
    }
    val df = data.map { case (g, v) =>
      (g, Option(v).map(_.doubleValue))
    }.toDF("g", "v")
    val ps = Seq(10, 50, 90)
    val got = Sketches.bisectQuantilesByGroup(df, "g", "v", ps)
      .orderBy("g", "p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val expect = data.collect {
      case (g, v) if g != null && v != null => (g, v.doubleValue)
    }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.size.toLong
      ps.map { p =>
        val rk = (n * p + 99) / 100
        (g, p.toLong, rk, n, sorted((rk - 1).toInt))
      }
    }
    assert(got.toSeq == expect)
  }

  test("countMin: estimates never undercount, degenerate to exact at " +
    "ample width, and merged states equal the rebuilt sketch") {
    val rnd = new scala.util.Random(47)
    val items = Seq.fill(3000)(s"item_${rnd.nextInt(80)}")
    val df = items.map(Tuple1(_)).toDF("it")
    val exact = items.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    // narrow sketch: collisions expected, but never an undercount
    val cmN = Sketches.countMin(df, "it", width = 16, depth = 3)
    val estN = Sketches.cmEstimate(cmN, df, "it", 16, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(estN(k) >= c, s"undercount $k") }
    // ample width: every estimate exact
    val cmW = Sketches.countMin(df, "it", width = 1 << 16, depth = 3)
    val estW = Sketches.cmEstimate(cmW, df, "it", 1 << 16, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == exact)
    // merge over a disjoint split ≡ rebuilt
    val (h1, h2) = items.splitAt(1200)
    val merged = Sketches.mergeCountMin(
        Sketches.countMin(h1.map(Tuple1(_)).toDF("it"), "it", 16, 3),
        Sketches.countMin(h2.map(Tuple1(_)).toDF("it"), "it", 16, 3))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val rebuilt = cmN.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == rebuilt)
  }

  test("psiDrift: zero for identical distributions; factored integer " +
    "contribution matches a direct Scala computation on shifted data") {
    val a = Seq(1.0, 1.5, 12.0, 25.0, 25.5, 3.0).map(Tuple1(_)).toDF("v")
    // identical multiset → every bin count equal, totals equal → all
    // contribs exactly zero
    val same = Sketches.psiDrift(a, a, "v", binWidth = 10.0).collect()
    assert(same.nonEmpty && same.forall(r =>
      r.getLong(6) == 0L && r.getLong(8) == 0L))

    val b = Seq(1.0, 14.0, 14.5, 15.0, 38.0).map(Tuple1(_)).toDF("v")
    val got = Sketches.psiDrift(a, b, "v", binWidth = 10.0)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(6), r.getLong(7), r.getLong(8)))
    val ca = Map(0L -> 3L, 1L -> 1L, 2L -> 2L)
    val cb = Map(0L -> 1L, 1L -> 3L, 3L -> 1L)
    val binsU = (ca.keySet ++ cb.keySet).toSeq.sorted
    val (na, nb, nbins) = (6L, 5L, binsU.size.toLong)
    val expect = binsU.map { bin =>
      val x = (ca.getOrElse(bin, 0L) + 1) * (nb + nbins)
      val y = (cb.getOrElse(bin, 0L) + 1) * (na + nbins)
      val lnm = math.floor(math.log(x.toDouble / y.toDouble) * 1000).toLong
      (bin, x - y, lnm, (x - y) * lnm)
    }
    assert(got.toSeq == expect)
    // a shifted distribution must register positive total PSI
    assert(expect.map(_._4).sum > 0)
  }

  test("psiDriftByGroup: each group's rows equal an independent " +
    "psiDrift over that group's slice; null groups excluded") {
    val rnd = new scala.util.Random(83)
    def rows(g: String, n: Int, shift: Double) =
      Seq.fill(n)((g, rnd.nextGaussian() * 40 + shift))
    val a = (rows("g1", 150, 0) ++ rows("g2", 100, 10) ++
      Seq((null.asInstanceOf[String], 1.0))).toDF("g", "v")
    val b = (rows("g1", 120, 5) ++ rows("g2", 90, 50)).toDF("g", "v")
    val grouped = Sketches.psiDriftByGroup(a, b, "g", "v", 20.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
    assert(grouped.keys.forall(_._1 != null))
    Seq("g1", "g2").foreach { g =>
      val single = Sketches.psiDrift(
          a.filter(col("g") === g), b.filter(col("g") === g), "v", 20.0)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
      val mine = grouped.collect { case ((gg, bin), v) if gg == g =>
        bin -> v }.toMap
      assert(mine == single, s"group $g diverges")
    }
  }

  // --- contaminationBloom -------------------------------------------------

  test("contaminationBloom == contamination row for row, even with a " +
    "tiny Bloom image forcing heavy false-positive traffic") {
    val rnd = new scala.util.Random(13)
    val words = Vector("the", "cat", "sat", "on", "mat", "dog", "ran",
      "far", "too", "big")
    def text() = Seq.fill(rnd.nextInt(15) + 3)(
      words(rnd.nextInt(words.size))).mkString(" ")
    val corpus = (1L to 60L).map(i => (i, text())).toDF("doc_id", "text")
    val eval = (100L to 110L).map(i => (i, text())).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq
    val exact = rows(Dedup.contamination(corpus, eval))
    // 64-bit image, 2 hashes: nearly every probe is a probable hit —
    // the verify path carries the whole answer
    assert(rows(Dedup.contaminationBloom(corpus, eval,
      numBits = 64, numHashes = 2)) == exact)
    // realistically-sized image: most clean docs short-circuit map-side
    assert(rows(Dedup.contaminationBloom(corpus, eval,
      numBits = 1 << 16, numHashes = 5)) == exact)
  }

  test("leakageSafeSplit: whole clusters land in one split; singletons " +
    "hash independently; assignment is deterministic") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("id", "comp")
    val sp = graft.functions.Dedup.leakageSafeSplit(docs, clusters)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(sp.size == 40)
    // cluster members share unit, bucket, and split
    assert(Set(sp(1L), sp(2L), sp(3L)).size == 1)
    assert(Set(sp(10L), sp(11L)).size == 1)
    assert(sp(1L)._1 == 1L && sp(10L)._1 == 10L)
    // singleton unit = own id
    assert(sp(25L)._1 == 25L)
    // all three splits occur across 40 docs at 80/10/10 — statistically
    // near-certain with the fixed hash; deterministic re-run identical
    val again = graft.functions.Dedup.leakageSafeSplit(docs, clusters)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(again == sp)
    assert(sp.values.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    sp.values.foreach { case (_, b, s) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want)
    }
  }

  // --- Layout (z-order) ---------------------------------------------------

  test("interleave31: known codes, monotone locality, rejects range") {
    assert(InterleaveBitsKernel.interleave31(0L, 0L) == 0L)
    assert(InterleaveBitsKernel.interleave31(1L, 0L) == 1L)
    assert(InterleaveBitsKernel.interleave31(0L, 1L) == 2L)
    assert(InterleaveBitsKernel.interleave31(3L, 3L) == 15L)
    assert(InterleaveBitsKernel.interleave31(
      (1L << 31) - 1, (1L << 31) - 1) == (1L << 62) - 1)
    intercept[IllegalArgumentException](
      InterleaveBitsKernel.interleave31(1L << 31, 0L))
    intercept[IllegalArgumentException](
      InterleaveBitsKernel.interleave31(-1L, 0L))
  }

  test("zOrderBucketStats: grid buckets match a brute-force reference " +
    "and bound both dimensions") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(2000)((rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong))
    val df = rows.toDF("x", "y")
    val got = Layout.zOrderBucketStats(df, "x", "y", bucketBits = 4)
      .orderBy("bucket").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val (mnx, mxx) = (rows.map(_._1).min, rows.map(_._1).max)
    val (mny, mxy) = (rows.map(_._2).min, rows.map(_._2).max)
    val ref = rows.groupBy { case (x, y) =>
      val xn = (x - mnx) * 65535 / (mxx - mnx)
      val yn = (y - mny) * 65535 / (mxy - mny)
      InterleaveBitsKernel.interleave31(xn, yn) >>> 28
    }.map { case (b, g) =>
      b -> ((g.size.toLong, g.map(_._1).min, g.map(_._1).max,
        g.map(_._2).min, g.map(_._2).max))
    }
    assert(got.size > 1 && got == ref)
  }

  test("zOrderBucketStats3: three-dimension grid matches a brute-force " +
    "reference; 3x21 interleave rejects out-of-range and roundtrips") {
    assert(InterleaveBitsKernel.interleave3x21(1L, 0L, 0L) == 1L)
    assert(InterleaveBitsKernel.interleave3x21(0L, 1L, 0L) == 2L)
    assert(InterleaveBitsKernel.interleave3x21(0L, 0L, 1L) == 4L)
    assert(InterleaveBitsKernel.interleave3x21(
      (1L << 21) - 1, (1L << 21) - 1, (1L << 21) - 1) == (1L << 63) - 1)
    intercept[IllegalArgumentException](
      InterleaveBitsKernel.interleave3x21(1L << 21, 0L, 0L))
    val rnd = new scala.util.Random(79)
    val rows = Seq.fill(1500)((rnd.nextInt(1 << 14).toLong,
      rnd.nextInt(1 << 14).toLong, rnd.nextInt(1 << 14).toLong))
    val df = rows.toDF("x", "y", "z")
    val got = Layout.zOrderBucketStats3(df, "x", "y", "z",
        bucketBits = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6), r.getLong(7)))).toMap
    val sc = (1 << 21) - 1
    def mn(f: ((Long, Long, Long)) => Long) =
      (rows.map(f).min, rows.map(f).max)
    val ((mnx, mxx), (mny, mxy), (mnz, mxz)) =
      (mn(_._1), mn(_._2), mn(_._3))
    val ref = rows.groupBy { case (x, y, z) =>
      InterleaveBitsKernel.interleave3x21(
        (x - mnx) * sc / (mxx - mnx), (y - mny) * sc / (mxy - mny),
        (z - mnz) * sc / (mxz - mnz)) >>> 60
    }.map { case (b, g) =>
      b -> ((g.size.toLong, g.map(_._1).min, g.map(_._1).max,
        g.map(_._3).min, g.map(_._3).max))
    }
    assert(got.size > 1 && got == ref)
  }

  test("zOrderCluster: written files cover disjoint z ranges (tight " +
    "two-dimensional pruning stats per file)") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(5000)((rnd.nextInt(1 << 15).toLong,
      rnd.nextInt(1 << 15).toLong)).toDF("x", "y")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    Layout.zOrderCluster(df, "x", "y", numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(back.length > 1)
    back.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, "file z ranges overlap")
    }
  }

  test("optimizeZOrder: the clustered rewrite shrinks summed per-file " +
    "bounding-box area by ~the file count; row multiset preserved") {
    val rnd = new scala.util.Random(41)
    val df = Seq.fill(8000)((rnd.nextInt(1 << 12).toLong,
      rnd.nextInt(1 << 12).toLong)).toDF("x", "y")
    val base = java.nio.file.Files
      .createTempDirectory("graft-zopt").toString
    // baseline: hash-scattered layout (what an un-maintained ingest
    // leaves behind) — every file's bounding box spans ~the full plane
    df.repartition(8).write.mode("overwrite").parquet(s"$base/in")
    val report = graft.functions.Layout.optimizeZOrder(spark,
        s"$base/in", s"$base/out", "x", "y", numFiles = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    val (beforeFiles, beforeRows, beforeArea) = report("before")
    val (afterFiles, afterRows, afterArea) = report("after_zorder")
    assert(beforeRows == 8000L && afterRows == 8000L)
    assert(beforeFiles == 8L && afterFiles >= 2L)
    // 8 hash-scattered files each cover ~the whole plane; 8 z-buckets
    // cover ~1/8 each — demand at least a 2x total-area reduction
    assert(afterArea * 2 < beforeArea,
      s"area before=$beforeArea after=$afterArea")
    // multiset equality of the rewritten rows
    val a = spark.read.parquet(s"$base/in").groupBy("x", "y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = spark.read.parquet(s"$base/out").groupBy("x", "y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("fileBloomIndex: point probes read only probable files yet equal " +
    "the plain filter; empty probes yield empty results") {
    val rnd = new scala.util.Random(53)
    val keys = rnd.shuffle((0L until 4000L).toList)
    val df = keys.map(k => (k, s"payload_$k")).toDF("k", "payload")
    val base = java.nio.file.Files
      .createTempDirectory("graft-fbloom").toString
    // hash-scattered layout: min/max pruning would skip nothing
    df.repartition(8).write.mode("overwrite").parquet(s"$base/t")
    val idx = graft.operators.BloomJoin.fileBloomIndex(spark,
      s"$base/t", "k")
    assert(idx.count() == 8)
    val probe = Seq(17L, 1234L, 3999L)
    val got = graft.operators.BloomJoin.scanWithBloomIndex(spark,
        s"$base/t", "k", probe, idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = spark.read.parquet(s"$base/t")
      .filter(col("k").isin(probe: _*))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && want.size == 3)
    // selectivity: 3 unique keys live in ≤ 3 files; FPs at 64Kbit over
    // 500 keys/file are rare — demand real skipping, not just equality
    val probable = graft.operators.BloomJoin.probeFiles(idx, probe,
      1 << 16, 5).count()
    assert(probable <= 5, s"expected ≤ 5 probable files, got $probable")
    // a key absent from the table: no false negatives means possibly
    // files to read, but the exact filter yields nothing
    val none = graft.operators.BloomJoin.scanWithBloomIndex(spark,
      s"$base/t", "k", Seq(999999L), idx)
    assert(none.count() == 0)
  }

  test("point-probe capstone: Bloom index over a z-ordered layout — " +
    "the composed scan reads strictly fewer files than either pruner " +
    "alone and equals the plain filter") {
    val rnd = new scala.util.Random(67)
    val df = Seq.fill(16000)((rnd.nextInt(1 << 12).toLong,
      rnd.nextInt(1 << 12).toLong)).toDF("k", "y")
    val base = java.nio.file.Files
      .createTempDirectory("graft-capstone").toString
    df.repartition(4).write.mode("overwrite").parquet(s"$base/in")
    // maintenance pass: OPTIMIZE ZORDER into 16 files (≈ a 4×4 grid of
    // z-quadrants), then land both standing indexes over the rewrite
    graft.functions.Layout.optimizeZOrder(spark, s"$base/in",
      s"$base/out", "k", "y", numFiles = 16).collect()
    val idx = graft.operators.BloomJoin.fileBloomIndex(spark,
      s"$base/out", "k")
    val stats = graft.functions.Layout.fileStats(spark, s"$base/out",
      "k", "y")
    val probe = Seq(1000L, 1017L) // a point pair from one x-column
    val (lo, hi) = (2000L, 2255L) // a narrow y-row
    // the composed scan ≡ the plain filter over the whole table
    val got = graft.operators.BloomJoin.scanWithBloomAndStats(spark,
        s"$base/out", "k", probe, idx, stats, "y", lo, hi)
      .groupBy("k", "y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = spark.read.parquet(s"$base/out")
      .filter(col("k").isin(probe: _*) && col("y").between(lo, hi))
      .groupBy("k", "y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
    // strictness: intersection < Bloom alone and < range alone
    val nBloom = graft.operators.BloomJoin.probeFiles(idx, probe,
      1 << 16, 5).count()
    val nRange = stats.filter(col("min_y") <= hi && col("max_y") >= lo)
      .count()
    val nBoth = graft.operators.BloomJoin.probeFiles(idx, probe,
        1 << 16, 5)
      .join(stats.filter(col("min_y") <= hi && col("max_y") >= lo)
        .select("file"), Seq("file"), "left_semi").count()
    assert(nBoth < nBloom && nBoth < nRange,
      s"both=$nBoth bloom=$nBloom range=$nRange")
    assert(nBoth >= 1) // the probe really reads something
  }

  test("joinDiagnostics: exact shape numbers on a hand-computable join; " +
    "disjoint keys yield zero cardinality and null top key") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("ka")
    val b = Seq(1L, 2L, 2L, 2L, 5L).toDF("kb")
    val r = graft.operators.Skew.joinDiagnostics(a, "ka", b, "kb")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 5L, 3L)))
    assert((r.getLong(4), r.getLong(5)) == ((2L, 5L)))
    assert((r.getLong(6), r.getLong(7)) == ((2L, 3L)))
    // exact cardinality check against the actual join
    assert(a.join(b, col("ka") === col("kb")).count() == r.getLong(5))
    val disjoint = graft.operators.Skew.joinDiagnostics(
      Seq(1L).toDF("ka"), "ka", Seq(9L).toDF("kb"), "kb")
      .collect().head
    assert(disjoint.getLong(4) == 0L && disjoint.getLong(5) == 0L &&
      disjoint.isNullAt(6) && disjoint.isNullAt(7))
  }

  // --- standing degrees / triangles with standing degrees -----------------

  private def randomPairs(seed: Int, n: Int, nodes: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
  }

  test("mergeDegrees: waves folded into the standing table equal the " +
    "one-shot degree aggregate when batches partition the edges") {
    val edges = randomPairs(17, 200, 40)
    val df = edges.toDF("id_a", "id_b")
    val waves = (0 to 2).map(w =>
      edges.filter(p => (p._1 * 31 + p._2) % 3 == w).toDF("id_a", "id_b"))
    val merged = waves.tail
      .foldLeft(Graph.degrees(waves.head))(Graph.mergeDegrees(_, _))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = Graph.degrees(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == oneShot)
  }

  test("triangles: a standing (even stale) degree table changes the " +
    "orientation, never the triangle set") {
    val edges = randomPairs(23, 300, 30)
    val df = edges.toDF("id_a", "id_b")
    def tris(d: Option[org.apache.spark.sql.DataFrame]) =
      Graph.triangles(df, standingDegrees = d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = tris(None)
    assert(base.nonEmpty)
    // exact standing table
    assert(tris(Some(Graph.degrees(df))) == base)
    // stale: degrees from only the first half of the edges — some nodes
    // missing entirely (orient as degree 0), all counts lagging
    val stale = Graph.degrees(edges.take(edges.size / 2)
      .toDF("id_a", "id_b"))
    assert(tris(Some(stale)) == base)
  }

  test("cmJoinSizeEstimate: disjoint key sets estimate 0 (one row), " +
    "overlapping sets upper-bound the exact join size") {
    val a = (0 until 400).map(i => s"a_$i").map(Tuple1(_)).toDF("k")
    val b = (0 until 400).map(i => s"b_$i").map(Tuple1(_)).toDF("k")
    val cmA = Sketches.countMin(a, "k", width = 64, depth = 3)
    val cmB = Sketches.countMin(b, "k", width = 64, depth = 3)
    // disjoint: with 400 keys over 64 cells the overlap join is busy,
    // but some hash row may still share no cells at narrower widths —
    // the contract is est 0 only when key sets are disjoint AND a row's
    // cells miss; pin the guaranteed shape instead: 1 row, est ≥ 0
    val dis = Sketches.cmJoinSizeEstimate(cmA, cmB).collect()
    assert(dis.length == 1 && dis(0).getLong(0) >= 0L)
    // fully disjoint CELLS: tiny inputs that provably share no cell
    val a1 = Seq("only_a").toDF("k")
    val b1 = Seq("only_b").toDF("k")
    val cA1 = Sketches.countMin(a1, "k", width = 1 << 16, depth = 3)
    val cB1 = Sketches.countMin(b1, "k", width = 1 << 16, depth = 3)
    val sharedCells = cA1.select("j", "cell")
      .intersect(cB1.select("j", "cell")).count()
    if (sharedCells == 0) {
      val z = Sketches.cmJoinSizeEstimate(cA1, cB1).collect()
      assert(z.length == 1 && z(0).getLong(0) == 0L,
        "disjoint-cell sketches must estimate 0, not an empty frame")
    }
    // self-join of a: estimate upper-bounds the exact output (= 400)
    val self = Sketches.cmJoinSizeEstimate(cmA, cmA)
      .collect()(0).getLong(0)
    assert(self >= 400L)
  }

  test("quotaSample: NULL strata fall under defaultQuota instead of " +
    "vanishing") {
    import graft.functions.TextAnalysis
    val docs = (0L until 90L).map(i =>
      (i, if (i % 3 == 0) null else if (i % 3 == 1) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = TextAnalysis.quotaSample(docs, "doc_id", "lang",
      Map("en" -> 5), defaultQuota = 7)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1))
      .toMap
    assert(byLang == Map("NULL" -> 7L, "en" -> 5L, "de" -> 7L))
  }

  test("bisectQuantilesByGroup: fails fast past the enforced group cap") {
    val df = (0 until 100).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.bisectQuantilesByGroup(df, "g", "v", Seq(50), maxGroups = 8)
    }
    assert(e.getMessage.contains("cap 8"))
    // and passes untouched when raised
    val ok = Sketches.bisectQuantilesByGroup(
      df.filter(col("g").isin("g0", "g1")), "g", "v", Seq(50))
    assert(ok.count() == 2)
  }
}
