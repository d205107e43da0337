package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Standing, VersionedTable}

/** Round-11 items: the MMR per-query kernel, the bench regression
  * canary, standing-cache release→rebuild, torn-commit recovery, the
  * committed-version gate on the streamed co-occurrence reader, the
  * overflow-free Hilbert normalization, and the graph-scaled k-core
  * round bound. */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- MMR diversification kernel ----------------------------------------

  test("mmrDiversify: pick 2 skips the near-duplicate of pick 1 even " +
    "though it outranks the diverse doc on pure relevance") {
    import graft.functions.Retrieval
    // doc 1: most relevant; doc 2: near-copy of doc 1 (shares almost
    // all shingles, slightly less relevant); doc 3: relevant but about
    // a different aspect (few shared shingles)
    val docs = Seq(
      (1L, "spark table layout spark table scan spark table prune"),
      (2L, "spark table layout spark table scan spark table skip"),
      (3L, "spark engine shuffle exchange partition table")
    ).toDF("doc_id", "text")
    val out = Retrieval.mmrDiversify(docs,
        Seq("q1" -> Seq("spark", "table")), k = 3, pool = 3,
        simWeight = 100L)
      .orderBy("pick").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    val order = out.map(_.getLong(2)).toSeq
    // relevance alone would order 1, 2, 3; MMR demotes the near-dup
    assert(order.head == 1L, s"pick 1 must be the top-relevance doc: $order")
    assert(order(1) == 3L, s"pick 2 must be the diverse doc: $order")
    assert(order(2) == 2L)
    // pick 1 pays no penalty; the near-dup pays a large one when chosen
    assert(out(0).getLong(4) == 0L)
    assert(out(2).getLong(4) > 5000L,
      s"near-dup penalty_bp: ${out(2).getLong(4)}")
  }

  test("mmrDiversify: a pool smaller than k yields exactly pool picks " +
    "per query, and an unmatched query yields none") {
    import graft.functions.Retrieval
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta something else")).toDF("doc_id", "text")
    val out = Retrieval.mmrDiversify(docs,
      Seq("q1" -> Seq("alpha"), "q2" -> Seq("zzz_absent")),
      k = 5, pool = 20, simWeight = 100L).collect()
    assert(out.map(_.getString(0)).forall(_ == "q1"))
    assert(out.length == 2)
  }

  test("mmrSelect standalone: greedy argmax with penalty and lower-id " +
    "ties over literal pool tables") {
    import graft.functions.Retrieval
    val top = Seq(("q", 1L, 1000L), ("q", 2L, 900L), ("q", 3L, 900L))
      .toDF("qid", "doc_id", "score_unats")
    // doc 2 is heavily similar to doc 1; doc 3 is not
    val sim = Seq(("q", 2L, 1L, 8000L), ("q", 1L, 2L, 8000L),
      ("q", 3L, 1L, 0L), ("q", 1L, 3L, 0L),
      ("q", 2L, 3L, 0L), ("q", 3L, 2L, 0L))
      .toDF("qid", "id_a", "id_b", "sim_bp")
    val out = Retrieval.mmrSelect(top, sim, k = 3, simWeight = 1L)
      .orderBy("pick").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    // pick 1: doc 1 (relevance). pick 2: doc 2 scores 900-8000 <0,
    // doc 3 scores 900-0 -- doc 3 wins. pick 3: doc 2, penalty = max
    // of sims to {1, 3} = 8000.
    assert(out.toSeq == Seq((1, 1L, 0L, 1000L), (2, 3L, 0L, 900L),
      (3, 2L, 8000L, 900L - 8000L)))
  }

  test("q205 plan: selection is the cogroup kernel; the pool-shingle " +
    "explode sits above the broadcast pool-id join (corpus is never " +
    "shingle-exploded)") {
    val sf = "/root/testdata/sf0.001"
    val p = SparkEntry.queries("q205_mmr_diversify")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"), p.take(1500))
    import graft.functions.Retrieval
    import graft.sources.Tables
    val docs = Tables.load(spark, sf, "documents")
    val top = Retrieval.mmrPoolTop(docs,
      Seq("q1" -> Seq("spark", "table")), pool = 5)
    // the sim build BEFORE its localCheckpoint truncates the plan:
    // Generate (the shingle explode) must be a parent of the broadcast
    // pool-id join, not below it
    val simPlan = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(broadcast(top.select("doc_id").distinct()), Seq("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.Dedup.shingles(
          lower(trim(col("text"))), 3)).as("shingle"))
      .queryExecution.executedPlan.toString
    val gen = simPlan.indexOf("Generate")
    val bc = simPlan.indexOf("BroadcastHashJoin")
    assert(gen >= 0 && bc >= 0 && gen < bc,
      s"explode must run on the join's survivors: $simPlan")
    graft.sources.Standing.release(spark, sf)
  }

  test("q217 plan: the per-source top-50 rank cut uses WindowGroupLimit") {
    val p = SparkEntry.queries("q217_zipf_slope")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1500))
  }

  // --- bench regression canary -------------------------------------------

  test("Bench.parsePrevQueries extracts the flat queries block and " +
    "ignores the rest of the artifact") {
    val blob = """{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"q01_a":0.436,"q185_b":3.710},""" +
      """"spread":{"q01_a":[0.4,0.5]},"writes":{"w_x":6.52}}"""
    val prev = Bench.parsePrevQueries(blob)
    assert(prev == Map("q01_a" -> 0.436, "q185_b" -> 3.710))
    assert(Bench.parsePrevQueries("{}").isEmpty)
  }

  test("Bench.regressionsAgainst flags >2x AND >0.3s growth only, " +
    "skips new queries, sorts worst first") {
    val prev = Map("a" -> 3.71, "b" -> 0.04, "c" -> 1.0, "d" -> 2.0)
    val now = Seq("a" -> 13.93, // 3.76x and +10s: flagged
      "b" -> 0.09, // 2.25x but +0.05s: noise, not flagged
      "c" -> 2.5, // 2.5x and +1.5s: flagged
      "d" -> 3.9, // 1.95x: not flagged
      "e" -> 99.0) // no baseline: skipped
    val regs = Bench.regressionsAgainst(prev, now)
    assert(regs.map(_._1) == Seq("a", "c"))
    assert(math.abs(regs.head._2 - 13.93 / 3.71) < 1e-9)
  }

  // --- standing-cache lifecycle ------------------------------------------

  test("Standing.frame rebuilds after release and the rebuilt frame is " +
    "value-identical to the first build") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11-standing").toString
    var builds = 0
    def build = {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    }
    val first = Standing.frame(spark, dir, "t")(build)
    Standing.frame(spark, dir, "t")(build)
    assert(builds == 1, "second access must hit the registry")
    val firstRows = first.collect().map(_.toSeq).toSet
    assert(Standing.release(spark, dir) == 1)
    assert(Standing.registered(spark, dir).isEmpty)
    val rebuilt = Standing.frame(spark, dir, "t")(build)
    assert(builds == 2, "post-release access must rebuild")
    assert(rebuilt.collect().map(_.toSeq).toSet == firstRows)
    Standing.release(spark, dir)
  }

  test("a standing-backed registered query returns identical rows after " +
    "releaseAll (the bench's between-pass lifecycle)") {
    val sf = "/root/testdata/sf0.001"
    def rows() = SparkEntry.queries("q03_net_demand")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val before = rows()
    graft.sources.Standing.releaseAll(spark)
    assert(rows() == before)
  }

  test("Standing.frame under concurrent first access registers exactly " +
    "one frame and every caller gets it") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11-race").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        val f = Standing.frame(spark, dir, "raced") {
          Thread.sleep(50) // widen the race window
          Seq((1L, "x")).toDF("k", "v")
        }
        results.add(f)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(Standing.registered(spark, dir) == Seq("raced"))
    val winner = Standing.frame(spark, dir, "raced")(fail("must be cached"))
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_ eq winner),
      "every concurrent caller must receive the registered frame")
    Standing.release(spark, dir)
  }

  // --- torn-commit recovery ----------------------------------------------

  test("VersionedTable: an orphan data dir (crash between land and log " +
    "claim) neither wedges the retry nor gets deleted") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11-torn").toString
    VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), dir)
    // simulate the torn commit: data/v=1 exists, _log/1.json does not
    val orphan = new java.io.File(s"$dir/data/v=1")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data/v=1/part-junk.parquet"), "x")
    // the retry that previously threw ErrorIfExists forever
    val v = VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(v == 1L)
    assert(VersionedTable.read(spark, dir).count() == 2)
    // the log, not the data dir, is the commit point: the orphan stays
    // (a concurrent writer's in-flight dir is indistinguishable) and
    // readers never see it
    assert(orphan.exists())
    assert(VersionedTable.read(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("VersionedTable.mergeBatch converges after a torn first attempt " +
    "(the streaming-sink wedge)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11-mergetorn").toString
    VersionedTable.mergeBatch(spark, dir,
      Seq((1L, "a")).toDF("id", "v"), Seq("id"), batchId = 0L)
    // crash landed data for the NEXT version but never claimed the log
    assert(new java.io.File(s"$dir/data/v=1").mkdirs())
    val v = VersionedTable.mergeBatch(spark, dir,
      Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), Seq("id"),
      batchId = 1L)
    assert(v == 1L)
    val snap = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(1L -> "a2", 2L -> "b"))
    // and the replay of batch 1 is still a no-op
    assert(VersionedTable.mergeBatch(spark, dir,
      Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), Seq("id"),
      batchId = 1L) == 1L)
  }

  // --- streamed co-occurrence commit gate --------------------------------

  test("latestCooccurrence skips a torn version (pc present, no " +
    "ut/_SUCCESS) and serves the last committed one") {
    import graft.streaming.SketchStreams
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11-cooccur").toString
    val b0 = Seq(("u1", "click"), ("u1", "view")).toDF("user_id",
      "event_type")
    val b1 = Seq(("u1", "buy")).toDF("user_id", "event_type")
    SketchStreams.cooccurBatch(b0, 0L, dir)
    SketchStreams.cooccurBatch(b1, 1L, dir)
    val committed = SketchStreams.latestCooccurrence(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(committed ==
      Set(("click", "view"), ("buy", "click"), ("buy", "view")))
    // torn v=2: pc landed, crash before ut — must be invisible
    Seq(("x", "y", 999L)).toDF("type_a", "type_b", "n_ab")
      .write.parquet(s"$dir/v=2/pc")
    val after = SketchStreams.latestCooccurrence(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == committed, "torn version must not surface")
  }

  // --- Hilbert normalization overflow ------------------------------------

  test("hilbertCluster survives a full-int64 column range (mixed-sign " +
    "extremes) with corners mapped to the exact grid corners") {
    import graft.functions.Layout
    val mn = Long.MinValue + 1
    val mx = Long.MaxValue - 1
    val rows = Seq((0, mn, mn), (1, mn, mx), (2, mx, mn), (3, mx, mx),
      (4, 0L, 0L)).toDF("id", "x", "y")
    val got = Layout.hilbertCluster(rows, "x", "y", 1)
      .select("id", "h").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // expected: the same Hilbert kernel evaluated at the grid corners
    // the DECIMAL normalization must land on (old int64 math overflowed
    // (x-min)*65535 here and scrambled the layout silently)
    val exp = Seq((0, 0L, 0L), (1, 0L, 65535L), (2, 65535L, 0L),
      (3, 65535L, 65535L), (4, 32767L, 32767L)).toDF("id", "xn", "yn")
      .select(col("id"), Layout.hilbertKey(col("xn"), col("yn")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exp, s"got $got expected $exp")
  }

  test("hilbertCluster on fractional DOUBLE columns stays inside the " +
    "grid: the per-row cast truncates exactly like the min/max row") {
    import graft.functions.Layout
    // a straight double→DECIMAL cast would ROUND 5.6 to 6, putting the
    // row above the truncated max (5) and off the [0, 65535] grid
    val rows = Seq((0, 0.0, -5.7), (1, 5.6, 0.0), (2, 2.0, -2.9))
      .toDF("id", "x", "y")
    val got = Layout.hilbertCluster(rows, "x", "y", 1)
      .select("id", "h").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // truncation: x ∈ {0, 5, 2} over [0, 5]; y ∈ {-5, 0, -2} over
    // [-5, 0] → grid coords below
    val exp = Seq((0, 0L, 0L), (1, 65535L, 65535L),
      (2, (2L * 65535) / 5, (3L * 65535) / 5))
      .toDF("id", "xn", "yn")
      .select(col("id"), Layout.hilbertKey(col("xn"), col("yn")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exp, s"got $got expected $exp")
  }

  // --- k-core round bound ------------------------------------------------

  test("kcore default bound scales to the graph: a 120-node chain at " +
    "k=2 peels to empty instead of throwing at 50 rounds") {
    import graft.functions.Graph
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // peel depth ~60 (one node per end per round) — the old fixed
    // default of 50 threw on this legitimate input
    assert(Graph.kcore(chain, k = 2).count() == 0)
    // an explicit cap still converge-or-throws
    intercept[IllegalStateException] {
      Graph.kcore(chain, k = 2, maxRounds = 10)
    }
  }
}
