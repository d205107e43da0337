package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives over `array<float>` columns, built from
  * higher-order functions (zip_with / transform / aggregate) — codegen'd,
  * UDF-free, deterministic (sequential left-to-right folds, so the same
  * float math as any single-threaded engine).
  *
  * Scale posture: the brute-force path broadcasts the (small) query set and
  * computes pairs map-side — no shuffle on the corpus. The LSH-bucketed
  * path shuffles once on the bucket key, turning the O(N²) all-pairs
  * problem into per-bucket local joins; at 100 TB the bucket key is the
  * join/partition key and AQE handles residual skew.
  */
object Similarity {

  /** Cast array<float> → array<double> (exact) so all arithmetic is double. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Dot product via the native codegen'd kernel (graft.plans.DotProduct)
    * — bit-identical to `dot` for equal-length arrays with no null
    * elements (same sequential fold), one fused loop. On malformed
    * inputs the two diverge by design: the kernel min-length-scans and
    * zero-substitutes null elements (graceful), while the HOF fold
    * null-poisons to NULL. */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.graftops.ColumnBridge.expression(a),
        org.apache.spark.sql.graftops.ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via higher-order built-ins (reference formulation; same
    * sequential fold order as the native expression below). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd expression (graft.plans
    * .CosineSimilarity): one fused allocation-free loop per row —
    * bit-identical results to cosineHof, markedly faster at scale. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graftops.ColumnBridge.expression(a),
        org.apache.spark.sql.graftops.ColumnBridge.expression(b)))

  /** All (query, candidate) cosine pairs above `threshold`.
    * `queries` must be broadcast-sized; corpus side never shuffles. */
  def cosinePairs(corpus: DataFrame, queries: DataFrame,
                  threshold: Double): DataFrame = {
    // raw float arrays go straight into the native expression (it widens
    // exactly) — no per-row array<double> copy.
    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 6))
      .filter(col("sim") >= threshold)
      .select("query_id", "vec_id", "sim")
  }

  /** Brute-force exact top-k neighbours per query (the correctness
    * baseline for ANN). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val pairs = cosinePairs(corpus, queries, threshold = -1.0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane signature (SimHash for vectors): sign of the dot
    * product against `planes` deterministic pseudo-hyperplanes, packed into
    * a bit string usable as an LSH bucket key.
    *
    * The hyperplanes are derived from (plane index, dimension index) via a
    * integer hash → [-0.5, 0.5) — fully deterministic, no RNG state.
    */
  /** Deterministic hyperplane coefficient for (plane, dimension) —
    * xorshift-style integer mix; same value every run, every engine. A
    * dyadic rational (k/65536 − 0.5), so its decimal literal round-trips
    * exactly through SQL. */
  def hyperplaneCoeff(p: Int, d: Int): Double = {
    var h = p * 1000003 + d * 7919 + 0x9e3779b9
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    (h & 0xffff).toDouble / 65536.0 - 0.5
  }

  def hyperplaneSignature(v: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(hyperplaneCoeff(p, d))): _*)
      // native kernel: one fused loop per plane instead of an interpreted
      // zip_with+fold; same sequential accumulation, so the sign — and
      // the q53 oracle hash — are unchanged for well-formed vectors.
      // Contract for malformed rows: a vector shorter than `dim` or with
      // null elements gets the sign of its partial dot (kernel
      // min-scan), not a NULL-driven '0' bit — deterministic either way
      when(dotFast(v, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** IVF-style partitioned search: vectors are assigned to their
    * nearest-centroid cell (one map-side pass against broadcast
    * centroids), queries probe only their own cell — the coarse-quantizer
    * scale path: at 100 TB the corpus is bucketed once and each query
    * touches 1/k of it (nprobe=1 here; union more cells for recall).
    *
    * Centroids SEED deterministically as the first `k` corpus vectors (no
    * RNG) and are then k-means-refined with `lloydIters` Lloyd rounds
    * (assign → elementwise mean; empty cells keep their previous
    * centroid), making the quantizer adapt to the data instead of being a
    * fixture of its first rows. Everything stays exact-arithmetic
    * deterministic, so an external SQL engine reproduces the same
    * centroids and the same cell assignment.
    */
  /** One Lloyd round per iteration. Scale posture: each round is one
    * map-side assignment pass over the corpus (broadcast centroids,
    * identical plan to ivfAssign) plus an elementwise-mean aggregation —
    * posexplode fans each row to `dim` entries but partial aggregation
    * collapses every task to ≤ k·dim partial sums before the exchange, so
    * the shuffle moves k·dim·tasks rows, never corpus·dim. Centroids are
    * double from the seed on (k rows — the float-array shuffle saving is
    * irrelevant here and the means are double anyway). */
  private def lloydCentroids(corpus: DataFrame, k: Int,
                             lloydIters: Int): DataFrame = {
    var cents = corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"),
        asDouble(col("embedding")).as("cv"))
    var it = 0
    while (it < lloydIters) {
      val carr = broadcast(cents
        .select(struct(col("centroid_id"), col("cv")).as("c"))
        .agg(sort_array(collect_list(col("c"))).as("cs")))
      val assigned = corpus.select(col("embedding"))
        .crossJoin(carr)
        .filter(size(col("cs")) > 0)
        .withColumn("best", array_max(transform(col("cs"), c =>
          struct(cosine(col("embedding"), c.getField("cv")).as("sim"),
            (-c.getField("centroid_id")).as("neg_id"),
            c.getField("centroid_id").as("cell")))))
        .select(col("best").getField("cell").as("cell"), col("embedding"))
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("i"))
        .agg(avg(col("x").cast("double")).as("mx"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("i"), col("mx")))).as("ms"))
        .select(col("cell").as("centroid_id"),
          col("ms").getField("mx").as("mcv"))
      cents = cents.as("p")
        .join(means.as("m"), Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("mcv"), col("p.cv")).as("cv"))
      it += 1
    }
    cents
  }

  /** The k centroids collapsed to ONE broadcast row holding a SORTED
    * struct array — the shared contract between corpus cell assignment
    * (ivfAssign) and query cell ranking (ivfTopKProbed): both sides must
    * fold over the identical array or queries probe cells the corpus was
    * never assigned under. */
  private def centroidArray(corpus: DataFrame, k: Int,
                            lloydIters: Int): DataFrame =
    broadcast(lloydCentroids(corpus, k, lloydIters)
      .select(struct(col("centroid_id"), col("cv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs")))

  /** centroidArray, materialized: the collapsed frame is ONE row, but
    * its plan carries the whole Lloyd refinement — a query that embeds
    * the array in two broadcast subtrees (assignment + probe ranking,
    * or both sides of an in-cell self-join) would otherwise run the
    * refinement once per subtree. localCheckpoint truncates to a
    * one-row leaf; the broadcast hint is re-applied because
    * checkpointing replaces the hinted plan with a LogicalRDD. */
  private def centroidArrayShared(corpus: DataFrame, k: Int,
                                  lloydIters: Int): DataFrame =
    broadcast(lloydCentroids(corpus, k, lloydIters)
      .select(struct(col("centroid_id"), col("cv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .localCheckpoint())

  /** Map-side cell assignment against a prebuilt centroid array. */
  private def assignWith(corpus: DataFrame, carr: DataFrame): DataFrame =
    // The argmax is array_max over (sim, -centroid_id) structs:
    // lexicographic struct ordering gives highest sim first, lowest
    // centroid_id on ties — same ordering the previous
    // row_number()-over-window formulation (and the q42 oracle) pins.
    // A corpus with NO centroid rows (nothing under vec_id < k) yields
    // zero output rows, as the join formulation did — not NULL cells.
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(carr)
      .filter(size(col("cs")) > 0)
      .withColumn("best", array_max(transform(col("cs"), c =>
        struct(cosine(col("embedding"), c.getField("cv")).as("sim"),
          (-c.getField("centroid_id")).as("neg_id"),
          c.getField("centroid_id").as("cell")))))
      .select(col("vec_id"), col("best").getField("cell").as("cell"),
        col("embedding"))

  /** Corpus-scaled IVF seed cutoff — the classic nlist sizing rule
    * (cells ≈ N / target-cell-size) expressed in this library's
    * seed-id-cutoff convention (seeds are the corpus vectors with
    * vec_id < cutoff). A FIXED cell count makes any quantizer whose
    * consumer touches whole cells quadratic in corpus size: in-cell
    * pairwise work is N·(N/cells)/2 and corpus-sized probe sets admit
    * |Q|·nprobe·(N/cells) candidates — both grow as N² when cells is a
    * constant (the r13 sf1 run measured q210 at 44.8× for 10× data).
    * Scaling cells with N pins avg cell size at ~`target`, making both
    * linear.
    *
    * `mult` compensates seed-id density when the corpus is an id-slice
    * (q210 trains on the odd half, so only every second id below the
    * cutoff exists: mult = 2 yields ~cutoff/2 actual seeds). The count
    * is one column-pruned scan at plan-build time — a training-cadence
    * decision, not a per-row data path (same bounded-decision class as
    * the connectedComponents size gate). Floor 8 keeps every sf at or
    * above the historical fixed default, so small-sf oracle results are
    * unchanged. */
  def scaledSeedCutoff(corpus: DataFrame, mult: Int = 1,
                       target: Int = 512): Int = {
    val n = corpus.count()
    math.max(8L, mult * ((n + target - 1) / target)).toInt
  }

  /** The trained coarse quantizer as a frame (centroid_id, cv) — public
    * so callers can MATERIALIZE it as a standing table (Tables.memoTable)
    * and assign future batches against it without retraining. */
  def centroids(corpus: DataFrame, k: Int, lloydIters: Int = 1): DataFrame =
    lloydCentroids(corpus, k, lloydIters)

  /** Incremental ANN indexing: assign a NEW batch of vectors against an
    * already-trained standing centroid table — the embeddings-side
    * analogue of Dedup.incrementalNearDups. The historical corpus is
    * never rescanned: the centroid table is k rows (collapsed and
    * broadcast), the batch assignment is map-side, so daily ingestion
    * costs O(batch), not O(corpus). Retraining cadence is the caller's
    * policy knob (monthly Lloyd refresh vs daily assignment). */
  def incrementalAssign(centroidTable: DataFrame,
                        batch: DataFrame): DataFrame =
    assignWith(batch,
      broadcast(centroidTable
        .select(struct(col("centroid_id"), col("cv")).as("c"))
        .agg(sort_array(collect_list(col("c"))).as("cs"))))
      .select("vec_id", "cell")

  def ivfAssign(corpus: DataFrame, k: Int, lloydIters: Int = 1): DataFrame =
    // Pick each vector's cell with a map-side argmax over the broadcast
    // centroid array — corpus rows never enter an exchange (the only
    // shuffle in the plan is the k-row centroid collapse feeding the
    // broadcast).
    assignWith(corpus, centroidArray(corpus, k, lloydIters))

  /** ANN search over the IVF cells: exact cosine within the query's cell
    * only. Returns top-k per query from its cell. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cells: Int,
              k: Int, lloydIters: Int = 1): DataFrame = {
    val assigned = assignWith(corpus,
      centroidArrayShared(corpus, cells, lloydIters))
    val q = assigned.join(queries.select("vec_id"), Seq("vec_id"))
      .select(col("cell"), col("vec_id").as("query_id"),
        col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("vec_id"))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank", "cell")
  }

  /** Multi-probe IVF ANN: each query probes its `nprobe` nearest cells
    * (the standard recall knob — a query near a cell boundary also
    * searches the adjacent cells) and exact cosine re-ranks the union.
    * The corpus stays single-cell-assigned and map-side (ivfAssign); only
    * the broadcast-sized QUERY set fans out ×nprobe, so the join volume
    * grows with nprobe·|corpus∩probed|, never corpus×cells. nprobe=1
    * degenerates to ivfTopK minus the self-cell shortcut. */
  def ivfTopKProbed(corpus: DataFrame, queries: DataFrame, cells: Int,
                    k: Int, nprobe: Int, lloydIters: Int = 1): DataFrame = {
    val carr = centroidArrayShared(corpus, cells, lloydIters)
    val assigned = assignWith(corpus, carr)
    // rank all centroids per query map-side over the SAME broadcast
    // centroid array the assignment used, keep the nprobe best cells
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .crossJoin(carr)
      .withColumn("ranked", slice(array_sort(transform(col("cs"), c =>
        struct((-cosine(col("qv"), c.getField("cv"))).as("negsim"),
          c.getField("centroid_id").as("cell")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("ranked.cell")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank", "cell")
  }

  /** Candidate volume of a [[ivfTopKProbed]] run — the probe-cost side
    * of the ANN bake-off (q204): how many corpus rows the nprobe probed
    * cells admit to exact scoring, summed over the query set. Reuses
    * the exact centroid/assignment/probe frames of the search itself,
    * so the count is the search's true join volume, not an estimate.
    * One row: (cand_rows). */
  def ivfProbedCandidateCount(corpus: DataFrame, queries: DataFrame,
                              cells: Int, nprobe: Int,
                              lloydIters: Int = 1): DataFrame = {
    val carr = centroidArrayShared(corpus, cells, lloydIters)
    val assigned = assignWith(corpus, carr)
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .crossJoin(carr)
      .withColumn("ranked", slice(array_sort(transform(col("cs"), c =>
        struct((-cosine(col("qv"), c.getField("cv"))).as("negsim"),
          c.getField("centroid_id").as("cell")))), 1, nprobe))
      .select(col("query_id"), explode(col("ranked.cell")).as("cell"))
    assigned.select("vec_id", "cell")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .agg(count(lit(1)).as("cand_rows"))
  }

  /** Raw IVF candidate PAIRS — the multi-probe candidate stage without
    * the scoring/top-k that [[ivfTopKProbed]] adds: each query's nprobe
    * best cells admit their members as (query_id, vec_id) rows. This is
    * the reusable candidate generator for consumers whose scoring isn't
    * plain cosine top-k (the q210 margin miner ranks candidates by
    * neighborhood-relative margin), keeping them off all-pairs joins:
    * volume is |queries|·nprobe·avg-cell, never |queries|·|corpus|. */
  def ivfProbedPairs(corpus: DataFrame, queries: DataFrame, cells: Int,
                     nprobe: Int, lloydIters: Int = 1): DataFrame = {
    val carr = centroidArrayShared(corpus, cells, lloydIters)
    val assigned = assignWith(corpus, carr)
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .crossJoin(carr)
      .withColumn("ranked", slice(array_sort(transform(col("cs"), c =>
        struct((-cosine(col("qv"), c.getField("cv"))).as("negsim"),
          c.getField("centroid_id").as("cell")))), 1, nprobe))
      .select(col("query_id"), explode(col("ranked.cell")).as("cell"))
    assigned.select("vec_id", "cell")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space (the k-means-refined
    * IVF cells), then within each cluster drop every vector that has a
    * LOWER-id near-twin at cosine ≥ tau. Returns the DROP list — each
    * dropped vec with its cell, its representative (the smallest such
    * lower id), and how many in-cell near-twins it had.
    *
    * This is the whole point of the clustering: pairwise cosine runs
    * per-CELL (one equi-join shuffle on the cell key, pair volume
    * Σ|cell|²), never corpus×corpus. With fixed `cells` the expected
    * cell size grows with the corpus, so the DEFAULT path sub-splits
    * every cell the way the LSH bucket join shards hot keys: side B
    * lands in a deterministic md5 bucket of its id, side A replicates
    * once per bucket, and the join key becomes (cell, bucket) — every
    * in-cell pair still meets EXACTLY once (in the task owning its
    * b-side bucket), so the drop list is bit-identical for any
    * `subSplit` (ScaleProbeSpec pins =1 ≡ =8 on a single-cell corpus),
    * while the per-task pair volume drops from |cell|² to |cell|²/s.
    * The cost is an s× replication of the probe side's shuffle — the
    * standard salted-join trade of bytes moved for the elimination of
    * the quadratic hot task.
    */
  def semanticDedup(corpus: DataFrame, cells: Int, tau: Double,
                    lloydIters: Int = 1, subSplit: Int = 8): DataFrame = {
    require(subSplit > 0, s"subSplit must be positive, got $subSplit")
    val assigned = assignWith(corpus,
      centroidArrayShared(corpus, cells, lloydIters))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
        col("embedding").as("va"))
      .withColumn("__sub",
        explode(array((0 until subSplit).map(i => lit(i)): _*)))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_id"),
        col("embedding").as("vb"))
      .withColumn("__sub",
        pmod(TextAnalysis.hashBucket(col("vec_id")), lit(subSplit))
          .cast("int"))
    a.join(b, Seq("cell", "__sub"))
      .filter(col("id_a") < col("vec_id"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= tau)
      .groupBy(col("vec_id"), col("cell"))
      .agg(min(col("id_a")).as("dup_of"), count(lit(1)).as("n_twins"))
  }

  /** Scalar int8 quantization of the embedding column — the vector-DB
    * compression step (IVF-PQ-lite): per vector, amax = max |x_i|,
    * codes c_i = floor(x_i·127/amax + 0.5) ∈ [-127, 127] (half-up via
    * the floor closed form, identical in any engine — round()'s tie
    * rule is not), and the total reconstruction error in integer
    * nano-units: each element's |x_i − c_i·amax/127| floors to a long
    * BEFORE the sum (the fixed-point discipline), so the error metric
    * is exact under any summation order. Entirely map-side; a zero
    * vector quantizes to all-zero codes with amax_micro 0.
    *
    * At scale the 8-bit codes cut ANN probe shuffle bytes ~4× vs
    * float32; the emitted error metric is the recall-budget signal for
    * choosing between code and raw-vector re-ranking. */
  def quantizeInt8(corpus: DataFrame): DataFrame =
    quantizeInt8Arr(corpus)
      .select(col("vec_id"),
        floor(col("amax") * lit(1e6)).cast("long").as("amax_micro"),
        array_join(transform(col("codes"), _.cast("string")), ",")
          .as("codes"),
        col("err_unano"))

  /** quantizeInt8 with the code vector still an array (plus the raw
    * amax) — the form [[quantizedTopK]] searches over. */
  def quantizeInt8Arr(corpus: DataFrame): DataFrame = {
    // two-step projection (the bm25 pattern): amax is non-cheap and
    // referenced by every downstream expression — keep it behind its
    // own Project boundary so the max runs once per row
    val base = corpus
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xd"))
      .select(col("vec_id"), col("xd"),
        array_max(transform(col("xd"), x => abs(x))).as("amax"))
    base
      .withColumn("codes", when(col("amax") === 0.0,
          transform(col("xd"), _ => lit(0L)))
        .otherwise(transform(col("xd"),
          x => floor(x * lit(127.0) / col("amax") + lit(0.5)))))
      .withColumn("err_unano", aggregate(
        zip_with(col("xd"), col("codes"), (x, c) =>
          floor(abs(x - c * col("amax") / lit(127.0)) * lit(1e9))),
        lit(0L), (a, b) => a + b))
      .select(col("vec_id"), col("amax"), col("codes"), col("err_unano"))
  }

  /** Exact top-k search over the int8 CODES — the compressed-index
    * probe that [[quantizeInt8]]'s 4× byte saving buys: the quantized
    * cosine is an INTEGER dot product over two code vectors (exact in
    * any engine, no float fold order to worry about), normalized by
    * the integer self-dots only at presentation. Same join discipline
    * as bruteForceTopK: query codes broadcast, corpus never shuffles;
    * per-row code norms precompute once on each side. Recall vs the
    * float brute force is the quantization-error trade the q97 error
    * metric budgets (SimilaritySpec pins it on the fixture). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    k: Int): DataFrame = {
    val selfDot = (c: Column) => aggregate(
      transform(c, x => x * x), lit(0L), (s, x) => s + x)
    val codes = quantizeInt8Arr(corpus)
      .select(col("vec_id"), col("codes"))
      .withColumn("nrm", selfDot(col("codes")))
    val qc = codes.join(queries.select("vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("codes").as("qc"),
        col("nrm").as("qn"))
    val dot = aggregate(zip_with(col("codes"), col("qc"),
      (a, b) => a * b), lit(0L), (s, x) => s + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim_q"), asc("vec_id"))
    codes.crossJoin(broadcast(qc))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot_q", dot)
      .withColumn("sim_q",
        when(col("nrm") === 0L || col("qn") === 0L, lit(0.0))
          .otherwise(round(col("dot_q")
            / (sqrt(col("nrm").cast("double"))
              * sqrt(col("qn").cast("double"))), 6)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("dot_q"), col("sim_q"))
  }

  /** Corpus-scaled hyperplane count for [[lshNeighbors]]: the smallest
    * p with target·2^p ≥ |corpus|, floored at `minPlanes` and capped at
    * 24 (2 billion vectors — past any tested sf). A FIXED plane count
    * is a scale-killer: bucket count is constant in corpus size, so
    * within-bucket candidate volume grows quadratically — the r16
    * full-suite sf10 sweep measured the fixed-4-plane q53 at 83.7×
    * wall for 10× data (296 s, 6.0 GB shuffle). Scaling p keeps the
    * expected bucket occupancy ≤ `target`, so candidate volume grows
    * linearly with the corpus — the same rule as [[scaledSeedCutoff]]
    * (IVF cells) and MinHash-LSH's band count on the text side.
    *
    * INTEGER arithmetic only (a shift loop, no float log2): the rule
    * must be the IDENTICAL computation in the engine and the SQL
    * oracle (the r13 scaledSeedCutoff discipline), and float log2 of
    * an exact power of two is ulp-fragile across libm implementations.
    * The SQL mirror is a MIN over generate_series with the same shift.
    * Floor 4 keeps every sf ≤ 0.1 at the historical fixed default, so
    * small-sf oracle results are unchanged: n=500 (sf0.01) → 2→4;
    * n=2,000 (sf0.1) → 4; n=20,000 (sf1) → 8; n=200,000 (sf10) → 11.
    * One column-pruned count at plan-build time — a bounded decision,
    * not a per-row data path. */
  def scaledPlanes(corpus: DataFrame, minPlanes: Int = 4,
                   target: Long = 128L): Int = {
    val n = corpus.count()
    var p = 0
    while (p < 24 && (target << p) < n) p += 1
    math.max(minPlanes, p)
  }

  /** ANN via hyperplane-LSH bucketing: candidates share a signature bucket,
    * exact cosine re-ranks within the bucket. Trades recall for turning the
    * corpus×corpus cross join into a per-bucket equi-join. Pass
    * `planes = scaledPlanes(corpus)` unless a fixed recall level is
    * wanted at a known corpus size — fixed planes do not scale (see
    * [[scaledPlanes]]). */
  def lshNeighbors(corpus: DataFrame, planes: Int, dim: Int,
                   threshold: Double): DataFrame = {
    // raw float arrays throughout: the native dot/cosine kernels widen
    // exactly per element, so there's no asDouble transform pass and the
    // bucket-join shuffle moves half the bytes — same doubles out
    val sig = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", hyperplaneSignature(col("v"), planes, dim))
    val a = sig.select(col("bucket"), col("vec_id").as("id_a"),
      col("v").as("va"))
    val b = sig.select(col("bucket"), col("vec_id").as("id_b"),
      col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim", "bucket")
  }
}
