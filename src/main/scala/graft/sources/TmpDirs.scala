package graft.sources

import org.apache.spark.sql.SparkSession

/** JVM-lifetime registry of graft-owned trees under `java.io.tmpdir`
  * (streamed-query state, single-use run trees, memoized standing
  * tables, bench write scratch), all recursively deleted by ONE
  * shutdown hook — so repeated Verify/Bench runs leave the tmpdir flat
  * instead of accumulating per-application garbage.
  *
  * Deletion happens at SHUTDOWN, not per query: the building lambda
  * returns a *lazy* DataFrame that still reads these trees when the
  * consumer (Verify's parquet dump, Bench's count) finally materializes
  * it, so an eager per-query `finally` delete would race the read.
  * Within one application the trees stay live and convergent — the
  * deterministic per-(application, dir, tag) keying means re-invocations
  * of the same query reuse ONE state tree (idempotent overwrite by
  * batch_id) rather than littering.
  */
object TmpDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  @volatile private var hooked = false
  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach(p => deleteRecursively(new java.io.File(p)))
      }, "graft-tmpdir-cleanup"))
      hooked = true
    }
  }

  /** Register a path for recursive deletion at JVM exit; returns it. */
  def register(path: String): String = {
    ensureHook()
    registered.add(path)
    path
  }

  /** Deterministic per-(application, data-dir, tag) state tree.
    * Streamed end-state queries converge on one tree per application
    * (idempotent overwrite by batch_id), so bench passes and spec
    * re-invocations within a session share it; the whole tree is
    * reclaimed at exit. */
  def appState(s: SparkSession, dir: String, tag: String): String =
    register(new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-$tag-${s.sparkContext.applicationId}-" +
        Integer.toHexString(dir.hashCode)).toString)

  /** Single-use run tree for restart-wave queries whose parquet-sink +
    * checkpoint pair must NOT be reused across invocations (a reused
    * checkpoint with no new data would silently skip the replay).
    * Nested under the registered [[appState]] root, so every run of the
    * same query is reclaimed with it. */
  def freshRun(s: SparkSession, dir: String, tag: String): String =
    s"${appState(s, dir, tag)}/run-${java.util.UUID.randomUUID.toString}"

  private def deleteRecursively(f: java.io.File): Unit = {
    // no symlink chasing: delete the link itself, never walk through it
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
