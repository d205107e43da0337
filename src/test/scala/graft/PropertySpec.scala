package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Procurement

/** Property-based invariants (SURVEY.md §5.4) over the MRP expression:
  * one Spark job evaluates the expression over a seeded random table; the
  * invariants are checked row-by-row against a Scala-side model.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class In(totalOrdered: Option[Int], availableQty: Option[Int],
                reservedQty: Option[Int], safetyStock: Option[Int],
                safetyStockLevel: Int)

  val gen: Gen[In] = for {
    o <- Gen.option(Gen.chooseNum(0, 10000))
    av <- Gen.option(Gen.chooseNum(0, 10000))
    rv <- Gen.option(Gen.chooseNum(0, 10000))
    ss <- Gen.option(Gen.chooseNum(0, 500))
    ssl <- Gen.chooseNum(0, 500)
  } yield In(o, av, rv, ss, ssl)

  val cases: List[In] =
    Gen.listOfN(500, gen).apply(Gen.Parameters.default, Seed(42L)).get

  test("MRP expression == model: clamp, null-defaults, safety fallback") {
    val df = cases
      .map(c => (c.totalOrdered, c.availableQty, c.reservedQty,
        c.safetyStock, c.safetyStockLevel))
      .toDF("total_ordered", "available_qty", "reserved_qty",
        "safety_stock", "safety_stock_level")
      .withColumn("net_demand", Procurement.netDemandExpr)
    val got = df.collect()
    got.zip(cases).foreach { case (r, c) =>
      val expect = math.max(0L,
        c.totalOrdered.getOrElse(0).toLong
          + c.safetyStock.getOrElse(c.safetyStockLevel)
          - (c.availableQty.getOrElse(0).toLong - c.reservedQty.getOrElse(0)))
      val nd = r.getAs[Number]("net_demand").longValue
      assert(nd == expect, s"case $c")
      assert(nd >= 0)
    }
  }

  test("HLL sketch (approx_count_distinct) within 5% of exact on events") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("as-of exec == union+window composition == scala model on seeded " +
    "random data (duplicate times, sparse keys, empty-key probes)") {
    import java.sql.Timestamp
    // deliberately nasty: few keys (collisions), coarse times (exact-tie
    // matches), keys with events but no snapshots and vice versa
    val evGen = for {
      k <- Gen.chooseNum(0L, 6L)
      t <- Gen.chooseNum(0L, 50L)
    } yield (k, t * 3600L)
    val snapGen = for {
      k <- Gen.chooseNum(2L, 8L)
      t <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(1, 999)
    } yield (k, t * 3600L, v)
    val evs = Gen.listOfN(300, evGen)
      .apply(Gen.Parameters.default, Seed(11L)).get.zipWithIndex
      .map { case ((k, s), i) => (i.toLong, k, new Timestamp(s * 1000)) }
    val snaps = Gen.listOfN(80, snapGen)
      .apply(Gen.Parameters.default, Seed(12L)).get
      // one snapshot per (key, time): at-or-before semantics don't define
      // which of two equal-time snapshots wins
      .groupBy(s => (s._1, s._2)).map(_._2.head).toList
      .map { case (k, s, v) => (k, new Timestamp(s * 1000), v) }

    val evDf = evs.toDF("event_id", "k", "ts")
    val snapDf = snaps.toDF("k", "snap_ts", "v")
    def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Int]] =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Integer]("v")).map(_.intValue)).toMap

    val viaExec = collect(graft.operators.AsOf.asofJoinExec(
      evDf, snapDf, Seq("k"), "ts", "snap_ts", Seq("v")))
    val viaWindow = collect(graft.operators.AsOf.asofJoin(
      evDf, snapDf, Seq("k"), "ts", "snap_ts", Seq("v")))
    val model: Map[Long, Option[Int]] = evs.map { case (id, k, ts) =>
      id -> snaps.filter(s => s._1 == k && !s._2.after(ts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(viaExec == model)
    assert(viaWindow == model)
  }

  test("decimal estimated_cost is exact net_demand × unit_cost") {
    val costs = Gen.listOfN(200, Gen.chooseNum(1, 999999))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val rows = costs.zipWithIndex
      .map { case (c, i) => (i + 1L, BigDecimal(c) / 100) }
      .toDF("net_demand", "unit_cost")
      .withColumn("unit_cost",
        col("unit_cost").cast(org.apache.spark.sql.types.DecimalType(10, 2)))
      .withColumn("estimated_cost",
        (col("net_demand") * col("unit_cost"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .collect()
    rows.foreach { r =>
      val expect = new java.math.BigDecimal(r.getAs[Long]("net_demand"))
        .multiply(r.getAs[java.math.BigDecimal]("unit_cost"))
      assert(r.getAs[java.math.BigDecimal]("estimated_cost")
        .compareTo(expect) == 0)
    }
  }

  test("repetition census kernel == Scala-model counts on 300 seeded " +
    "random token strings") {
    val word: Gen[String] = Gen.oneOf("a", "b", "ab", "xyz", "q1", "!", "aa")
    val textGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ", "\t")
    } yield ws.mkString(sep)
    val texts: List[String] =
      Gen.listOfN(300, textGen).apply(Gen.Parameters.default, Seed(7L)).get

    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(($"id" +: graft.functions.TextAnalysis.repetitionMetricsFast(
        $"text")): _*)
      .collect().map(r => r.getLong(0) -> r).toMap

    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      val r = got(i.toLong)
      assert(r.getLong(1) == ws.length, s"n_words of '$t'")
      assert(r.getLong(2) == ws.distinct.length, s"n_distinct of '$t'")
      if (ws.nonEmpty) {
        val topW = ws.groupBy(identity).values.map(_.length).max
        assert(r.getDouble(3) ==
          BigDecimal(topW.toDouble / ws.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"top_word_frac of '$t'")
      }
      if (ws.length >= 2) {
        val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
        val topB = bgs.groupBy(identity).values.map(_.length).max
        assert(r.getDouble(4) ==
          BigDecimal(topB.toDouble / bgs.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"top_bigram_frac of '$t'")
      } else assert(r.isNullAt(4), s"bigram of '$t'")
    }
  }

  test("connected components == union-find model on 50 seeded random " +
    "graphs") {
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.chooseNum(0L, 14L)
      b <- Gen.chooseNum(0L, 14L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    val graphs: List[List[(Long, Long)]] = Gen.listOfN(50,
      Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, edgeGen)))
      .apply(Gen.Parameters.default, Seed(11L)).get

    // run ALL graphs through one Spark job each is slow; model-check the
    // distributed answer per graph
    graphs.zipWithIndex.foreach { case (edges, gi) =>
      val got = graft.functions.Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // union-find model
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map { n =>
        // canonical label = min node of the component
        val root = find(n)
        n -> nodes.filter(m => find(m) == root).min
      }.toMap
      assert(got == want, s"graph #$gi: $edges")
    }
  }

  test("fixed-point pagerank == Scala integer model on seeded random " +
    "graphs; total rank conserved up to floor truncation") {
    val S = 1000000000000L
    val graphs = Gen.listOfN(6, Gen.listOfN(12, for {
      a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.distinct))
      .apply(Gen.Parameters.default, Seed(11L)).get
    graphs.zipWithIndex.filter(_._1.nonEmpty).foreach { case (pairs, gi) =>
      val got = graft.functions.Graph.pagerank(
          pairs.toDF("id_a", "id_b"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val nodes = sym.map(_._1).distinct.sorted
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val in = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val n = nodes.size.toLong
      val base = (15L * S / 100) / n
      var pr = nodes.map(_ -> S / n).toMap
      (1 to 3).foreach { _ =>
        pr = nodes.map { v =>
          v -> (base + 85L * in(v).map(u => pr(u) / deg(u)).sum / 100)
        }.toMap
      }
      assert(got == pr, s"graph #$gi: $pairs")
      val total = got.values.sum
      // each node floors at most ~3 units per round; 3 rounds × n nodes
      assert(total <= S && total > S - 200L * n, s"graph #$gi total=$total")
    }
  }

  test("index merge == rebuild on seeded random corpora and splits") {
    val wordGen = Gen.oneOf("a", "b", "c", "dd", "ee", "fff")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val corpora = Gen.listOfN(4, Gen.listOfN(30, docGen))
      .apply(Gen.Parameters.default, Seed(23L)).get
    corpora.zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val mod = 2 + ci % 3
      val hist = docs.filter(col("doc_id") % mod =!= 0)
      val batch = docs.filter(col("doc_id") % mod === 0)
      val k = 3 + ci
      def img(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val merged = img(graft.functions.Retrieval.mergeIndexes(
        graft.functions.Retrieval.invertedIndexArr(hist, k),
        graft.functions.Retrieval.invertedIndexArr(batch, k), k))
      val rebuilt = img(graft.functions.Retrieval.invertedIndex(docs, k))
      assert(merged == rebuilt, s"corpus #$ci (k=$k, mod=$mod)")
    }
  }
}
