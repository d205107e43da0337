package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing notes:
  *  - an untimed warmup absorbs session/codegen/parquet-footer startup so
  *    measurements reflect steady-state query cost;
  *  - each query is materialized via queryExecution.toRdd.count(), which
  *    executes the query's own plan in full — a plain df.count() would let
  *    Catalyst prune expensive projections (md5, minhash, cosine) out of
  *    scan-shaped queries and under-report them.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Long =
      try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => -1L }

    // Fixed-load calibration probe: a data-independent CPU-bound job
    // (hash-fold over a fixed range) timed at the start AND end of the
    // run. Round 8's bench moved 1.71× uniformly vs round 7 purely from
    // box contention; reporting the same fixed workload's seconds
    // alongside the query numbers lets a reader divide that factor out
    // (and calib_start vs calib_end shows whether contention was
    // sustained across the run). min-of-2 like the queries.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions.{bit_xor, xxhash64, col}
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0, 100000000L, 1, cpus.toInt)
          .select(bit_xor(xxhash64(col("id")))) // xor fold: no ANSI overflow
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once()) // first run absorbs codegen
    }
    val calibStart = calibrate()

    // Warmup (untimed): run every query once so the timed passes measure
    // steady-state execution (codegen class cache, parquet footers, JIT),
    // not first-run compilation.
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Isolation: iterative queries (per-round localCheckpoint loops) run
    // LAST within each pass. Even with eager in-loop unpersist, an
    // iterative query's final checkpoint + its burst of small jobs leave
    // GC/cleaner residue; ordering them last means that residue can only
    // bill the pass boundary, never the next query's timing window.
    // Within the tail the order is FIXED with q61 first: round 9 ran the
    // tail in sorted order (q101, q157, q159, q61), so q61 inherited the
    // residue of three predecessor CC runs and regressed 3.9× with zero
    // code change. Each tail query now also gets a GC barrier before its
    // timing window (gcBarrier below) so no tail position is billed for
    // its predecessors' garbage.
    val iterativeOrder = Seq("q61_dedup_clusters",
      "q101_incremental_clusters", "q157_entity_resolution",
      "q159_incremental_entities", "q207_kcore").filter(names.contains)
    val iterative = iterativeOrder.toSet
    val execOrder = names.filterNot(iterative) ++ iterativeOrder
    execOrder.foreach(run)
    // Standing-cache pressure report: bytes held by the block-manager
    // storage pool after warmup (when every standing memo frame is built)
    // — the pool the iterative queries' own persists must share.
    val (standMem, standDisk) = graft.sources.Standing.storageBytes(spark)

    // Drain JVM garbage + give the ContextCleaner a beat to process
    // queued RDD/broadcast cleanups before a timing window opens. Cheap
    // (~100ms) and only used at iterative-tail boundaries, where the
    // predecessor is guaranteed to have left checkpoint/broadcast litter.
    def gcBarrier(): Unit = { System.gc(); Thread.sleep(200) }

    // Two timed passes, report the min per query: single-pass numbers on a
    // shared 32-thread box carry ±30% GC/scheduling noise that drowns real
    // regressions; min-of-2 is the steady-state cost.
    def timed(name: String): Double = {
      if (iterative(name)) gcBarrier()
      val t0 = System.nanoTime()
      run(name)
      (System.nanoTime() - t0) / 1e9
    }
    val pass1 = execOrder.map(n => n -> timed(n)).toMap
    val pass2 = execOrder.map(n => n -> timed(n)).toMap
    // min-of-3 for sub-second queries: at n-of-2 several flat queries
    // moved ±25% run-to-run; a third pass over only the cheap ones
    // tightens their noise floor for ~a quarter of a pass of wall clock
    // (the expensive queries dominate pass time and keep min-of-2).
    val sub1 = execOrder.filter(n => math.min(pass1(n), pass2(n)) < 1.0)
    val pass3 = sub1.map(n => n -> timed(n)).toMap
    val results = names.map { name =>
      name -> (Seq(pass1(name), pass2(name)) ++ pass3.get(name)).min
    }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.map(_._2).sum

    // Write-side throughput (one pass, reported under its own key so the
    // headline query total stays comparable across rounds): the three
    // standing sink shapes — day-partitioned fact write (repartitioned on
    // the partition column first, one file per day, no small-file spray),
    // bucketed fact write (shuffle-once-at-write join layout), and
    // small-file compaction of the partitioned output.
    def timedOp(op: => Unit): Double = {
      val t0 = System.nanoTime(); op; (System.nanoTime() - t0) / 1e9
    }
    val wdir = java.nio.file.Files
      .createTempDirectory("graft-bench-writes").toString
    val ordersW = graft.operators.Replay.orders(spark, sfDir)
      .filter(graft.operators.Replay.ordersWhen)
    import org.apache.spark.sql.functions.col
    val writes = Seq(
      "w_partitioned_write" -> timedOp(
        graft.sources.Sinks.writePartitionedParquet(
          ordersW.repartition(col("order_date")),
          s"$wdir/orders_by_day", Seq("order_date"))),
      "w_bucketed_write" -> timedOp(
        graft.sources.Sinks.writeBucketed(ordersW, "graft_bench_orders_b",
          Seq("product_id"), 8, sortCols = Seq("product_id"),
          path = Some(s"$wdir/orders_bucketed"))),
      "w_compaction" -> timedOp(
        graft.sources.Sinks.compact(spark, s"$wdir/orders_by_day",
          partitionCols = Seq("order_date"))))
    // files/bytes alongside seconds: write throughput without layout
    // numbers is half a measurement (a fast write that sprays 10k small
    // files is not fast at 100 TB)
    def layout(path: String): (Long, Long) = {
      val root = new java.io.File(path)
      def walk(f: java.io.File): (Long, Long) =
        // listFiles() returns null on I/O error or a dir vanishing mid-walk
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
            .map(walk).fold((0L, 0L)) {
          case ((a, b), (c, d)) => (a + c, b + d)
        }
        else if (f.getName.endsWith(".parquet")) (1L, f.length())
        else (0L, 0L)
      walk(root)
    }
    val (nFiles, nBytes) = layout(s"$wdir/orders_by_day")
    val ws = writes.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val calibEnd = calibrate()

    // Full results go to a FILE; stdout gets a short fixed-size line.
    // Rounds 8 and 9 both lost per-query data to the harness's ~2000-char
    // stdout tail window (r9: 199 queries × 12 chars overflowed it and the
    // driver recorded parsed:null — the totals were unrecoverable). The
    // file has no size constraint, so it carries everything at full
    // precision; the stdout contract line only carries the total and a
    // pointer to the file, and its length is independent of query count
    // (pinned by BenchLineSpec).
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val resultsFile = java.nio.file.Paths
      .get(sys.props("user.dir"), "bench_results.json")
    val fileJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""sf":"$sfDir","n_queries":${results.size},"queries":$qs,""" +
      s""""writes":$ws,"partitioned_files":$nFiles,""" +
      s""""partitioned_bytes":$nBytes,"calib_start":${fmt(calibStart)},""" +
      s""""calib_end":${fmt(calibEnd)},"standing_mem_bytes":$standMem,""" +
      s""""standing_disk_bytes":$standDisk}""" + "\n"
    java.nio.file.Files.write(resultsFile,
      fileJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Stop Spark BEFORE printing so no shutdown log line lands after the
    // contract line; the line the harness parses must be the final thing
    // on stdout.
    spark.stop()
    println(s"""{"metric":"writes","unit":"sec","writes":$ws,""" +
      s""""partitioned_files":$nFiles,"partitioned_bytes":$nBytes,""" +
      s""""calib_start":${fmt(calibStart)},"calib_end":${fmt(calibEnd)}}""")
    println(totalLine(total, results.size, sfDir, resultsFile.toString))
  }

  /** The driver-contract stdout line: total + query count + a pointer to
    * the full per-query artifact. Deliberately does NOT embed the
    * per-query map — the line must stay inside the harness's ~2000-char
    * tail window at ANY query count (BenchLineSpec pins the bound).
    */
  def totalLine(total: Double, nQueries: Int, sfDir: String,
                file: String): String = {
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""n_queries":$nQueries,"sf":"$sfDir","file":"$file"}"""
  }
}
