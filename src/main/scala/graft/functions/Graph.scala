package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists (the near-dup candidate graph, link
  * graphs, citation graphs). Companion to Dedup.connectedComponents —
  * same input shape, different propagation.
  */
object Graph {

  /** Fixed-point PageRank over an undirected pair list: ranks live as
    * BIGINT micro-units (1e-12 of total rank), every step is integer
    * multiply/floor-divide/sum — EXACT, so the result is independent of
    * float summation order and reproducible bit-for-bit in any engine
    * (the portability trick the q47 centroids use, applied to an
    * iterative computation; float PageRank would hash-diverge because
    * SUM(double) order differs per engine/partitioning).
    *
    * damping = 85/100. Per iteration: contrib(u) = pr(u) div deg(u);
    * pr'(v) = teleport + (85 · Σ_{u→v} contrib(u)) div 100 with
    * teleport = (15 · SCALE div 100) div n. Truncation crumbs (≤ deg
    * units per node per round) stay in the fixed-point floor — both
    * engines floor identically, which is the whole point.
    *
    * Scale: each iteration is the canonical edge-join + dst-side
    * hash-aggregation — one shuffle of the edge list per round, partial
    * aggregation on the integer sums. `iters` is fixed and small, so the
    * plan unrolls without checkpointing (unlike connectedComponents,
    * nothing here self-joins: plan depth grows linearly, not
    * exponentially).
    */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val scale = 1000000000000L
    // localCheckpoint the edge list: every iteration references it twice
    // (contrib join + degree join), so an un-truncated plan re-embeds —
    // and re-EXECUTES — the whole upstream candidate pipeline (LSH,
    // shingling) 2·iters times. The edge frame is candidate-pair-sized,
    // orders of magnitude below the corpus — same discipline as
    // Dedup.connectedComponents.
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = broadcast(deg.agg(count(lit(1)).as("n_nodes")))
    var pr = deg.crossJoin(n)
      .select(col("src").as("id"), col("n_nodes"),
        expr(s"CAST($scale AS BIGINT) DIV n_nodes").as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = sym
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("pr DIV deg").as("c"))
      val sums = contrib.groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = pr.select("id", "n_nodes").join(sums, Seq("id"), "left")
        .select(col("id"), col("n_nodes"),
          (expr(s"(15 * $scale DIV 100) DIV n_nodes")
            + expr("(85 * COALESCE(s, CAST(0 AS BIGINT))) DIV 100"))
            .as("pr"))
      it += 1
    }
    pr.select(col("id"), col("pr").as("pr_fp"))
  }
}
