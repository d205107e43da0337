package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH
  * near-dup, SimHash, and n-gram Jaccard — all built from codegen'd
  * built-ins (xxhash64, higher-order array functions); no UDFs.
  *
  * Scale posture: exact dedup is one hash-aggregate (map-side partial
  * combine on the fingerprint). MinHash/LSH shuffles once on the
  * (band_id, band_hash) bucket key — the classic shingle→minhash→band→
  * bucket-join pipeline — so the corpus is never self-joined at large; only
  * bucket-colliding candidates meet, and exact Jaccard re-verifies them.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical text. One
    * hash-aggregate; at scale group on the md5 fingerprint, not the raw
    * text, to keep shuffle rows narrow. */
  def exactByText(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Corpus snapshot diff — the data-versioning primitive (what changed
    * between two landed corpus versions): per id, `added` (new only),
    * `removed` (old only), `modified` (both, content fingerprint
    * differs), `unchanged`. Content compares by md5 fingerprint, never
    * by text: both sides reduce map-side to (id, 32-byte fp), so the
    * ONE full-outer shuffle join moves fingerprint-width rows — at
    * 100 TB the diff costs two narrow scans + one join, and text bytes
    * never enter an exchange. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(idCol), md5(col(textCol)).as("fp_old"))
    val n = newSnap.select(col(idCol), md5(col(textCol)).as("fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("modified"))
          .otherwise(lit("unchanged")))
      .select(col(idCol), col("status"), col("fp_old"), col("fp_new"))
  }

  /** Word-level n-gram shingles of `text` (distinct set; empty when the
    * text has fewer than n tokens — no partial shingles). */
  def shingles(text: Column, n: Int): Column = {
    val tokens = split(trim(text), "\\s+")
    val sh = transform(
      sequence(lit(0), size(tokens) - n),
      i => concat_ws(" ", slice(tokens, i + 1, lit(n))))
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(array_distinct(sh))
  }

  /** Portable 60-bit hash: first 15 hex chars of md5(s) as a long.
    * Identical in any engine with md5 (DuckDB: ('0x'||substr(md5(s),1,15))
    * ::BIGINT) — used where cross-engine-checkable signatures matter;
    * xxhash64 (faster, Spark-native) elsewhere. Backed by the native
    * Md5Prefix60 kernel (thread-local digest, no hex round trip) — same
    * values as the composable conv(substring(md5(s),1,15),16,10), which
    * RetrievalSpec pins on random strings. */
  def md5Hash64(s: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.Md5Prefix60(
        org.apache.spark.sql.graftops.ColumnBridge.expression(s)))

  /** Derive hash-family member j from a base hash by a portable integer
    * mix (xor with j·golden-ratio-32; fits 64-bit signed for j < 2^32). */
  def seedMix(h: Column, seed: Int): Column =
    h.bitwiseXOR(lit(seed.toLong * 2654435769L))

  /** Exact repeated-span audit (the k-gram face of exact-substring
    * dedup, Lee et al. 2022, arXiv:2107.06499): for every document,
    * how many of its word n-gram spans (duplicate-preserving — every
    * position counts) also occur in at least one OTHER document. The
    * per-doc dup fraction is the signal span-level dedup acts on:
    * boilerplate and licence blocks light up long before whole-doc
    * near-dup fires.
    *
    * Plan: spans hash to portable 60-bit longs map-side (word_ngrams
    * kernel + md5 prefix), ONE explode→groupBy shuffle builds the
    * shared-span set (distinct (doc, hash) first, then spans seen in
    * ≥ 2 docs), and the per-doc count is a join on the hash followed
    * by a doc-grain aggregate. Only 8-byte hashes cross any exchange;
    * dup_bp is integral arithmetic (exact in any engine). */
  def duplicatedSpans(docs: DataFrame, n: Int, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spans = docs.select(col(idCol),
        explode(Retrieval.wordNgrams(col(textCol), n)).as("span"))
      .select(col(idCol), md5Hash64(col("span")).as("h"))
    val shared = spans.distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("h"), lit(1).as("_dup"))
    spans.join(shared, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("_dup").isNotNull, 1L).otherwise(0L))
          .as("n_dup_spans"))
      .withColumn("dup_bp", expr("n_dup_spans * 10000 div n_spans"))
  }

  /** MinHash signature on the portable md5 hash family: ONE md5 per
    * shingle (`baseHashes` = transform(sh, md5Hash64)), then k cheap
    * xor-mixed minima — 16× less hashing than md5-per-seed. */
  def minhashSignatureMd5(baseHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(baseHashes, h => seedMix(h, seed)))
    }: _*)

  /** Fused native kernels (graft.plans.ShingleHash*): same values as the
    * composable formulations above, ~20× faster — higher-order functions
    * are interpreted per element; these run one tight loop per document. */
  def shingleHashesFast(text: Column, n: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.ShingleHashes(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text), n))

  def minhashSignatureFast(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.ShingleMinHash(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text), n, k))

  /** Group-level MinHash signature (graft.plans.MinHashAgg, a custom
    * TypedImperativeAggregate): folds per-row base-hash arrays into one
    * k-element signature per group — the signature of the union of the
    * group's shingle sets. Mergeable (elementwise min) → map-side partial
    * aggregation; only k longs per group cross the shuffle. */
  def minhashAgg(baseHashes: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.MinHashAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(baseHashes), k)
        .toAggregateExpression())

  /** |a ∩ b| of two ascending-sorted long arrays (shingleHashesFast output
    * is sorted) — codegen'd merge scan, no per-pair hash set. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.SortedIntersectCount(
        org.apache.spark.sql.graftops.ColumnBridge.expression(a),
        org.apache.spark.sql.graftops.ColumnBridge.expression(b)))

  /** MinHash signature: element j = min over shingles of
    * xxhash64(seed_j, shingle). Deterministic across runs/engines that
    * share xxhash64. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleSet, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Banded LSH: split the signature into `bands` equal bands, hash each →
    * one (band_id, band_hash) row per band per doc. Docs sharing any band
    * bucket are near-dup candidates. */
  def lshBands(docs: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        xxhash64(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)
          .cast("string")).as("band_hash"))
    }
    docs.select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** Exact Jaccard similarity of two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double")
        / size(array_union(a, b)))

  /** Full near-duplicate pipeline: shingle → minhash → band → bucket-join →
    * exact-Jaccard verify. Returns candidate pairs (id_a < id_b) with their
    * verified Jaccard ≥ `minJaccard`.
    *
    * numHashes = bands * rowsPerBand; the (bands, rowsPerBand) choice sets
    * the S-curve threshold ≈ (1/bands)^(1/rowsPerBand).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                     minJaccard: Double = 0.7,
                     exactFirst: Boolean = true): DataFrame = {
    // Exact-dup collapse first (default): a corpus with N byte-identical
    // copies of one text would otherwise put all N in every band bucket —
    // O(N²) candidate pairs out of one hot bucket. Representatives (min id
    // per text) go through LSH; exact groups are exactByText's job.
    val input =
      if (exactFirst)
        docs.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
      else docs
    // The shingle+signature frame feeds three consumers (banding, and the
    // two sides of the verify join). It MUST be materialized (persist):
    // without a barrier, CollapseProject inlines the `sh` expression into
    // all 32 interpreted minhash lambdas — a ~100× blowup. CacheManager
    // dedupes repeated persists of the same plan, so re-invocation reuses
    // one entry. (The production-scale, cache-free formulation is
    // nearDuplicatesPortable below, whose fused kernels make recompute
    // cheaper than a corpus-wide cache.)
    val withSig = input
      .select(col(idCol), col(textCol))
      .withColumn("sh", shingles(col(textCol), shingleN))
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = lshBands(withSig, idCol, "sig", bands, rowsPerBand)
    val a = banded.select(col("band_id"), col("band_hash"),
      col(idCol).as("id_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col(idCol).as("id_b"))
    val candidates = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sh = withSig.select(col(idCol), col("sh"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, majority vote of token
    * hashes. One explode + one aggregate (map-side combinable). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** Hamming distance between two simhash64 values (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash on the PORTABLE md5 hash family (60 bits — the md5Hash64
    * range): per bit, majority vote over all token occurrences. Same
    * explode+aggregate shape as simhash64, but reproducible in any engine
    * with md5 — the cross-engine-checkable twin of the xxhash64 kernel. */
  def simhash60Md5(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", md5Hash64(col("tok")))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** simhash60Md5 via the fused one-pass kernel (graft.plans.SimHash60Md5):
    * same bits, map-side only — tokens never shuffle. */
  def simhash60Md5Fast(text: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.SimHash60Md5(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text)))

  /** Near-duplicate pipeline on the PORTABLE md5 hash family via the fused
    * kernels — same shingle→minhash→band→bucket-join→Jaccard-verify shape
    * as nearDuplicates, but every step reproducible in any engine with
    * md5 (oracle-checked end-to-end as q44). Jaccard is returned in
    * floor'd basis points over the 60-bit hash sets. */
  def nearDuplicatesPortable(docs: DataFrame, idCol: String, textCol: String,
                             shingleN: Int = 3, bands: Int = 4,
                             rowsPerBand: Int = 4,
                             minJaccardBp: Long = 5000): DataFrame = {
    // cache-free multi-consumer shape (see nearDuplicates): aliased
    // self-joins + identical shuffles → ReusedExchange, instead of a
    // corpus-wide persist
    val banded =
      nearDupBandRows(docs, idCol, textCol, shingleN, bands, rowsPerBand)
    val candidates = banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val hs = shingleSets(docs, idCol, textCol, shingleN)
    candidates
      .join(hs.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(hs.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("ninter", sortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jaccard_bp",
        floor(col("ninter") * lit(10000.0)
          / (size(col("hs_a")) + size(col("hs_b")) - col("ninter")))
          .cast("long"))
      .filter(col("jaccard_bp") >= minJaccardBp)
      .select("id_a", "id_b", "jaccard_bp")
  }

  /** Connected components over an undirected pair list — the cluster-
    * assignment step that turns near-duplicate PAIRS into dedup GROUPS
    * (keep min-id representative per component, drop the rest).
    *
    * Iterative min-label propagation WITH pointer jumping: every round,
    * each node adopts the smallest label in its neighborhood, then labels
    * compress one level (comp ← comp's own label — path halving), so
    * convergence needs O(log diameter) rounds, not O(diameter): a
    * 100-node chain closes in ~7 rounds (spec-pinned), cliquish near-dup
    * clusters in 2-3. Scale posture: each round is one shuffle of the
    * EDGE list (groupBy dst) + two label-table-sized joins; all frames
    * are candidate-pair-sized, orders of magnitude below the corpus.
    * Each round's labels are eagerly localCheckpoint'd: iterative
    * DataFrames MUST truncate the logical plan, not just cache — the
    * jump's self-join doubles the plan tree per round, so a
    * persist-only loop grows an exponentially large plan (real OOM in
    * plan stringification by round ~10). Throws if maxIters rounds
    * don't converge rather than returning a partial clustering.
    *
    * Small graphs (≤ `localEdgeLimit` edges, measured by an
    * early-terminating probe) skip the iteration entirely: a driver
    * union-find with identical min-id-label semantics, ~1 MB collected
    * in one job. Distributed delta iterations only pay off past driver
    * scale; under it, every round is pure fixed cost — and a long
    * burst of tiny jobs is maximum exposure to scheduler/GC stalls
    * (the r11 q159 in-suite spread anomaly). Pass localEdgeLimit = 0
    * to force the iterative path (specs pin both).
    */
  def connectedComponents(pairs: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b",
                          maxIters: Int = 25,
                          assumeDistinctPairs: Boolean = false,
                          localEdgeLimit: Int = 1 << 16): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val eRaw = pairs.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Decide-before-iterate (the Skew.autoJoin stats-pass pattern): a
    // graph at or under `localEdgeLimit` edges is solved by driver
    // union-find — ≤ ~1 MB collected, one job — instead of paying the
    // delta iteration's per-round fixed cost (each round is a
    // shuffle+checkpoint job; on an 8-edge contracted batch graph the
    // rounds were 3.6 s of pure overhead and, worse, a ~40-small-job
    // burst whose scheduler-stall exposure produced the r11 q159
    // [4.0, 43.0] s spread). The probe is an early-terminating
    // limit+count on the persisted edge frame; graphs past the limit
    // take the iterative path unchanged, so the 100 TB posture is
    // intact — this is a bounded-decision collect, not a data-path
    // collect.
    val isSmall = eRaw.limit(localEdgeLimit + 1).count() <= localEdgeLimit
    if (isSmall) {
      val edges = eRaw.collect()
      eRaw.unpersist(blocking = false)
      // Union-find that always attaches the LARGER root under the
      // smaller: the root of every set is its minimum id, so labels
      // match the iterative path's "min id in component" exactly.
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def ensure(x: Long): Unit =
        if (!parent.contains(x)) parent(x) = x
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { row =>
        val u = row.getLong(0); val v = row.getLong(1)
        ensure(u); ensure(v)
        val ru = find(u); val rv = find(v)
        if (ru < rv) parent(rv) = ru
        else if (rv < ru) parent(ru) = rv
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.sorted.map(id => (id, find(id)))
        .toDF("id", "comp")
    }
    val e0 = eRaw
    // oriented (a<b) unique pairs — the near-dup pipelines' contract —
    // cannot collide with their own swaps, so the dedup shuffle before
    // the loop is pure waste for those callers; generic callers keep it
    val symRaw = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val sym = (if (assumeDistinctPairs) symRaw else symRaw.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed with the ONE-HOP minimum (id vs smallest neighbor): same
    // shuffle as a plain distinct-nodes init, but the first propagation
    // round comes free
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min("dst").as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("comp"))
      .localCheckpoint(false)
    // Each round's localCheckpoint leaves its predecessor's blocks behind;
    // waiting for GC + ContextCleaner to reclaim them lets one query's
    // cleanup bill whoever runs next in the same JVM (observed as bench
    // bleed into the following query). Track each round's checkpoint RDD
    // and unpersist it EAGERLY the moment the next round has materialized
    // — safe because a superseded round's frame is never re-executed
    // (unpersisting a localCheckpoint'd RDD forfeits recomputation).
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None
      }
    var prevCkpt = ckptRdd(labels)
    // DELTA iteration: labels only ever decrease, so a node can improve
    // in round r only through a neighbor whose label changed in round
    // r-1 (if v's label is older, u already saw it the round after v
    // last changed). Joining the edges against just that frontier —
    // instead of the full label table — shrinks each round's edge work
    // from O(E) to O(edges touching the frontier), which at real scale
    // collapses fast: most of a near-dup graph settles in round 1 and
    // later rounds only chase the deep chains. Round 1's frontier is
    // everyone (the seed changed every label). Pointer-jump changes
    // enter the frontier like any other change (prev vs comp below is
    // measured across the whole round including the jump).
    var frontier = labels
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val neighborMin = sym.join(frontier, sym("dst") === frontier("id"))
        .groupBy(sym("src").as("nid")).agg(min("comp").as("nmin"))
      // carry the previous label through the update so convergence is
      // read off the same frame
      val step = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump (path halving) from round 2 on: comp ← label(comp).
      // Labels are always node ids, so the self-join always matches; at
      // fixpoint label(comp) == comp and the jump is the identity, so
      // the convergence test stays exact. Round 1 skips the jump —
      // cliquish near-dup graphs converge right there (the common case
      // saves a join), while deep chains still get O(log diameter)
      // halving from every later round.
      val jumped =
        if (iters == 0) step
        else step
          .join(step.select(col("id").as("jid"), col("comp").as("jcomp")),
            step("comp") === col("jid"), "left")
          .select(step("id"), step("prev"),
            coalesce(col("jcomp"), step("comp")).as("comp"))
      // LAZY checkpoint: the convergence count right below is the
      // materializing action, so each round is ONE job — and the next
      // round's plan still starts from a leaf
      val next = jumped.localCheckpoint(false)
      val changed = next.filter(col("comp") =!= col("prev")).count()
      // the count above fully materialized `next`, so the previous
      // round's checkpoint blocks are dead — release them now
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = ckptRdd(next)
      labels = next.select("id", "comp")
      // next round's frontier: nodes whose label improved this round
      // (a filter over the checkpointed frame — no extra materialization)
      frontier = next.filter(col("comp") =!= col("prev"))
        .select("id", "comp")
      converged = changed == 0
      iters += 1
      // only the CURRENT round's checkpoint stays persisted — the final
      // one backs the returned frame (label-table-sized) and is released
      // when the caller drops/unpersists the result
    }
    sym.unpersist()
    eRaw.unpersist(blocking = false)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds")
    labels
  }

  /** LSH band rows of the portable md5 minhash signature — one
    * (id, band_id, band_key) row per band per doc. This is the standing
    * near-dup INDEX artifact: materialize it (bucketed on the band key)
    * over the historical corpus once, and each new batch joins against it
    * in O(batch) instead of re-running LSH over the whole corpus. */
  def nearDupBandRows(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 4,
                      rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
          .as("band_key"))
    }
    docs
      .select(col(idCol),
        minhashSignatureFast(col(textCol), shingleN, k).as("sig"))
      .filter(size(col("sig")) > 0)
      .select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  /** Sorted shingle-hash sets, (id, hs) — the verify-stage index artifact
    * (exact Jaccard needs the sets, not just the signatures). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3): DataFrame =
    docs.select(col(idCol),
        shingleHashesFast(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)

  /** Incremental near-duplicate detection: score a NEW batch against a
    * standing index (nearDupBandRows + shingleSets of the historical
    * corpus) plus the batch itself — the production shape for daily
    * ingestion, where re-running corpus×corpus LSH per day would be
    * O(corpus) instead of O(batch).
    *
    * Emits (new_id, dup_id, jaccard_bp): for each new doc, every partner
    * with exact Jaccard ≥ threshold among (a) all indexed docs and (b)
    * earlier new docs (dup_id < new_id — keep-first within the batch).
    *
    * Scale posture: the batch's band rows BROADCAST to the index join, so
    * the corpus-sized index is probed map-side and never shuffles; the
    * verify stage probes the shingle index the same way (broadcast semi-
    * join of candidate ids). Every shuffled frame is batch- or
    * candidate-sized. If a batch is ever too big to broadcast, drop the
    * explicit broadcast and bucket the index on (band_id, band_key) —
    * then only the batch side shuffles.
    */
  def incrementalNearDups(newDocs: DataFrame, indexBands: DataFrame,
                          indexShingles: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int = 3, bands: Int = 4,
                          rowsPerBand: Int = 4,
                          minJaccardBp: Long = 5000): DataFrame =
    incrementalNearDupsFrom(
      nearDupBandRows(newDocs, idCol, textCol, shingleN, bands,
        rowsPerBand),
      shingleSets(newDocs, idCol, textCol, shingleN),
      indexBands, indexShingles, idCol, minJaccardBp)

  /** [[incrementalNearDups]] over PRE-BUILT batch band rows / shingle
    * sets — the probe stage alone. Callers that also LAND nb/ns as index
    * growth (the streaming ingest) build them once, localCheckpoint, and
    * share the frames between the probe and the index writes instead of
    * re-running the text kernels per consumer (the r19 q246/q247 cost
    * audit measured the batch text kernel evaluated ~5x per batch). */
  def incrementalNearDupsFrom(nb: DataFrame, ns: DataFrame,
                              indexBands: DataFrame,
                              indexShingles: DataFrame, idCol: String,
                              minJaccardBp: Long): DataFrame = {
    // new × indexed: the index side stays unshuffled (broadcast probe)
    val candOld = indexBands.as("o")
      .join(broadcast(nb.as("n")),
        col("o.band_id") === col("n.band_id") &&
          col("o.band_key") === col("n.band_key") &&
          // batch and index are disjoint by contract; the guard keeps a
          // caller who violates it from scoring docs against themselves
          col(s"o.$idCol") =!= col(s"n.$idCol"))
      .select(col(s"n.$idCol").as("new_id"), col(s"o.$idCol").as("dup_id"))
    // new × new, keep-first orientation (partner id < new id)
    val candNew = nb.as("a")
      .join(broadcast(nb.as("b")),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"b.$idCol").as("new_id"), col(s"a.$idCol").as("dup_id"))
    val cand = candOld.unionByName(candNew).distinct()
    // verify: exact Jaccard over the shingle sets. Attach the new side's
    // set first (batch-sized join), then broadcast the candidate frame to
    // ONE probe of the shingle index — again no index shuffle, and the
    // candidate pipeline (which itself probes the band index) appears
    // once in the plan instead of being recomputed for a separate
    // dup-id semi-join.
    val withNew = cand
      .join(ns.select(col(idCol).as("new_id"), col("hs").as("hs_new")),
        Seq("new_id"))
    // If a caller violates the disjoint-ids contract, an id present in
    // both sides would appear twice in the union and emit duplicate
    // (new_id, dup_id) rows; the batch copy wins (broadcast anti-join —
    // batch-sized build side, index stays unshuffled).
    indexShingles
      .join(broadcast(ns.select(col(idCol))), Seq(idCol), "left_anti")
      .unionByName(ns).as("hsd")
      .join(broadcast(withNew), col(s"hsd.$idCol") === col("dup_id"))
      .select(col("new_id"), col("dup_id"), col("hs_new"),
        col("hsd.hs").as("hs_dup"))
      .withColumn("ninter", sortedIntersectCount(col("hs_new"), col("hs_dup")))
      .withColumn("jaccard_bp",
        floor(col("ninter") * lit(10000.0)
          / (size(col("hs_new")) + size(col("hs_dup")) - col("ninter")))
          .cast("long"))
      .filter(col("jaccard_bp") >= minJaccardBp)
      .select("new_id", "dup_id", "jaccard_bp")
  }

  /** Fold a batch's new near-dup pairs into a STANDING component table
    * — incremental clustering, the clustering member of the standing-
    * artifact family (index q92, quantizer q86, profile q95, SCD2 q93,
    * packed layout q100). The full pair graph is standing's old-old
    * pairs ∪ `newPairs` (every pair incident to the batch — exactly
    * what [[incrementalNearDups]] emits), so components of the union
    * graph equal components of the CONTRACTED graph where each old
    * node collapses into its component label: map both endpoints of
    * every new pair to their representative (standing comp if known,
    * the id itself otherwise), drop self-loops, and run the iterative
    * propagation over this contracted edge set — batch-incident-sized,
    * NOT corpus-sized. Standing rows relabel through one
    * component-table join; labels stay "min id in component" because
    * the min over representatives IS the global min. History pairs are
    * never re-read.
    */
  def applyClusterBatch(standing: DataFrame,
                        newPairs: DataFrame): DataFrame = {
    val contracted = newPairs
      .join(standing.select(col("id").as("id_a"), col("comp").as("_ra")),
        Seq("id_a"), "left")
      .join(standing.select(col("id").as("id_b"), col("comp").as("_rb")),
        Seq("id_b"), "left")
      .select(coalesce(col("_ra"), col("id_a")).as("u"),
        coalesce(col("_rb"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("id_a"),
        greatest(col("u"), col("v")).as("id_b"))
      .distinct()
    val merged = connectedComponents(contracted, assumeDistinctPairs = true)
    val relabeled = standing
      .join(merged.select(col("id").as("comp"), col("comp").as("_nc")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("_nc"), col("comp")).as("comp"))
    // endpoints not yet in the standing table (new docs, plus old docs
    // whose first-ever pair arrived with this batch)
    val fresh = newPairs.select(col("id_a").as("id"))
      .unionByName(newPairs.select(col("id_b").as("id"))).distinct()
      .join(standing.select("id"), Seq("id"), "left_anti")
    relabeled.unionByName(fresh.join(merged, Seq("id")))
  }

  /** Benchmark decontamination: per-document count of distinct shingles
    * that also occur in an evaluation set — the standard "is my training
    * corpus contaminated with my benchmark?" check.
    *
    * The eval set collapses to ONE sorted array of distinct shingle
    * hashes broadcast to every task (a real eval suite is ~10⁶ n-grams
    * ≈ 8 MB — comfortably broadcastable), so the corpus side is scored
    * entirely map-side by the sorted-merge intersect kernel: zero corpus
    * shuffle, zero explode of corpus tokens. */
  def contamination(docs: DataFrame, evalDocs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    val evalArr = evalDocs
      .select(explode(shingleHashesFast(col(textCol), shingleN)).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("eval_hs"))
    docs
      .select(col(idCol), shingleHashesFast(col(textCol), shingleN).as("hs"))
      .crossJoin(broadcast(evalArr))
      .select(col(idCol),
        size(col("hs")).cast("long").as("n_shingles"),
        sortedIntersectCount(col("hs"), col("eval_hs")).cast("long")
          .as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Bloom-thinned decontamination — [[contamination]] for when the
    * eval shingle set outgrows a comfortably-broadcastable sorted
    * array: the eval set ships as a ~10-bits-per-shingle Bloom image
    * (6× smaller than the 64-bit hash array), every corpus doc counts
    * its PROBABLE hits map-side against the broadcast image, and only
    * docs with > 0 probable hits — the thinned minority — explode
    * their candidate shingles into an exact semi-join against the eval
    * shingle table. Bloom filters have no false negatives, so
    * 0-probable-hit docs are exactly clean without ever reaching the
    * shuffle; false positives are culled by the exact verify. Same
    * result as [[contamination]] row for row (Round8Spec pins it; the
    * q118 oracle is q68's plain formulation). */
  def contaminationBloom(docs: DataFrame, evalDocs: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text", shingleN: Int = 3,
                         numBits: Int = 1 << 20,
                         numHashes: Int = 5): DataFrame = {
    import graft.operators.BloomJoin
    val evalSh = evalDocs
      .select(explode(shingleHashesFast(col(textCol), shingleN)).as("h"))
      .distinct()
    val bf = evalSh.agg(
      BloomJoin.bloomOf(col("h"), numBits, numHashes).as("_bf"))
    val probed = docs
      .select(col(idCol), shingleHashesFast(col(textCol), shingleN).as("hs"))
      .crossJoin(broadcast(bf))
      .select(col(idCol), size(col("hs")).cast("long").as("n_shingles"),
        filter(col("hs"), h =>
          BloomJoin.mightContain(col("_bf"), h, numBits, numHashes))
          .as("cand"))
    val cleanFast = probed.filter(size(col("cand")) === 0)
      .select(col(idCol), col("n_shingles"),
        lit(0L).as("n_contaminated"))
    val suspects = probed.filter(size(col("cand")) > 0)
      .select(col(idCol), col("n_shingles"), col("cand"))
    val verifiedCounts = suspects
      .select(col(idCol), explode(col("cand")).as("h"))
      .join(evalSh, Seq("h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"))
    val verified = suspects
      .join(verifiedCounts, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_contaminated"))
    cleanFast.unionByName(verified)
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** The corpus-level dedup materialization: everything EXCEPT
    * non-representative near-duplicate cluster members (each connected
    * component keeps its min-id doc). The drop list is cluster-membership
    * sized — orders of magnitude below the corpus — so the anti-join's
    * build side is tiny and the corpus itself passes through one
    * broadcast anti-join probe with no shuffle (AQE falls back to SMJ if
    * a pathological corpus ever makes the drop list fact-sized). */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                  minJaccardBp: Long = 5000): DataFrame = {
    val clusters = connectedComponents(
      nearDuplicatesPortable(docs, idCol, textCol, shingleN, bands,
        rowsPerBand, minJaccardBp),
      assumeDistinctPairs = true)
    val drop = clusters.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Near-dup pair EXPLANATION — the manual-review face of the dedup
    * pipeline: for every flagged pair, the exact shared-shingle count
    * and a deterministic sample of the shared evidence (the `sampleK`
    * SMALLEST shared 60-bit shingle fingerprints — smallest, so the
    * sample is reproducible in any engine, not "first seen"). A human
    * auditing dedup decisions gets the why, not just the score.
    *
    * Plan: the flagged pairs are the LSH candidates (pair-sized); each
    * side's sorted shingle array joins back by id and the shared count
    * and sample are ONE merge scan + one intersect slice per pair,
    * map-side. The corpus never self-joins beyond the banded LSH. */
  def explainPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", shingleN: Int = 3,
                   bands: Int = 4, rowsPerBand: Int = 4,
                   minJaccardBp: Long = 2000,
                   sampleK: Int = 4): DataFrame = {
    val pairs = nearDuplicatesPortable(docs, idCol, textCol, shingleN,
      bands, rowsPerBand, minJaccardBp)
    val hs = shingleSets(docs, idCol, textCol, shingleN)
    pairs
      .join(hs.select(col(idCol).as("id_a"), col("hs").as("ha")),
        Seq("id_a"))
      .join(hs.select(col(idCol).as("id_b"), col("hs").as("hb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard_bp"),
        sortedIntersectCount(col("ha"), col("hb")).cast("long")
          .as("n_shared"),
        array_join(transform(
          slice(array_intersect(col("ha"), col("hb")), 1, sampleK),
          h => h.cast("string")), ",").as("sample_hashes"))
  }

  /** LSH operating-point evaluation — recall and candidate precision of
    * the banded MinHash candidate generation against brute-force ground
    * truth: ALL pairs at or above the Jaccard threshold, from the exact
    * n²/2 sorted-merge intersects. The n² side is affordable only on a
    * SAMPLE — which is precisely how the bands/rows knob is tuned in
    * production: measure recall on a bounded sample, apply the setting
    * to the corpus (q122's ANN-recall discipline applied to dedup).
    *
    * One row: n_true (ground truth), n_candidates (raw banded
    * candidates, pre-verify), n_caught (pairs the candidate+verify
    * pipeline keeps — a subset of ground truth by construction, since
    * verify recomputes the same exact Jaccard), recall_bp, and
    * precision_bp (verify-stage yield: how much candidate volume was
    * worth verifying). */
  def lshRecallReport(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", shingleN: Int = 3,
                      bands: Int = 4, rowsPerBand: Int = 4,
                      minJaccardBp: Long = 1000): DataFrame = {
    val hs = shingleSets(docs, idCol, textCol, shingleN)
    val truePairs = hs.as("a")
      .join(hs.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(sortedIntersectCount(col("a.hs"), col("b.hs")).as("ninter"),
        size(col("a.hs")).as("na"), size(col("b.hs")).as("nb"))
      .filter(col("ninter") > 0)
      .filter(floor(col("ninter") * lit(10000.0)
        / (col("na") + col("nb") - col("ninter"))).cast("long")
        >= minJaccardBp)
    val rawCand = nearDuplicatesPortable(docs, idCol, textCol, shingleN,
      bands, rowsPerBand, minJaccardBp = 0)
    val caught = nearDuplicatesPortable(docs, idCol, textCol, shingleN,
      bands, rowsPerBand, minJaccardBp)
    broadcast(truePairs.agg(count(lit(1)).as("n_true")))
      .crossJoin(broadcast(
        rawCand.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(caught.agg(count(lit(1)).as("n_caught"))))
      .select(col("n_true"), col("n_candidates"), col("n_caught"),
        expr("CASE WHEN n_true = 0 THEN NULL " +
          "ELSE n_caught * 10000 DIV n_true END").as("recall_bp"),
        expr("CASE WHEN n_candidates = 0 THEN NULL " +
          "ELSE n_caught * 10000 DIV n_candidates END")
          .as("precision_bp"))
  }

  /** Pairwise GROUP overlap matrix from group-level MinHash signatures
    * — "which sources duplicate each other": each group's k-component
    * signature (the mergeable MinHashAgg over the union of its docs'
    * shingle sets) meets every other group's, and the componentwise
    * agreement fraction estimates the Jaccard similarity of the two
    * groups' shingle UNIONS (the MinHash estimator, in integral basis
    * points: agree·10000 div k). The whole matrix costs one corpus
    * aggregation (k longs per group crossing the shuffle) plus a
    * groups²-row join of k-long arrays — the corpus is never compared
    * pairwise. Estimator, by design: ±1/√k standard error; production
    * raises k or verifies flagged pairs exactly. */
  def groupOverlap(docs: DataFrame, groupCol: String,
                   textCol: String = "text", shingleN: Int = 3,
                   k: Int = 16): DataFrame = {
    val sig = docs
      .select(col(groupCol).as("g"),
        shingleHashesFast(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)
      .groupBy("g").agg(minhashAgg(col("hs"), k).as("sig"))
    sig.as("a").join(sig.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("g_a"), col("b.g").as("g_b"),
        aggregate(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("n_agree"))
      .withColumn("est_jaccard_bp",
        expr(s"n_agree * 10000 DIV $k"))
  }

  /** Cluster-level train/val/test split — the leakage-safe corpus cut:
    * a near-duplicate of a training doc sitting in the eval split leaks
    * training signal straight into evaluation, so the split UNIT is the
    * near-dup cluster, not the document. Every doc carries its cluster
    * label (its own id when unclustered — `clusters` is the (id, comp)
    * table, e.g. the memoized q61 result), the label hashes through the
    * portable md5-60 family into a bucket in [0, 100), and the whole
    * cluster lands in one split — a near-dup pair can never straddle,
    * BY CONSTRUCTION (q123 verifies the zero straddle count anyway).
    *
    * Deterministic (re-runs assign identically — the hash is of the
    * cluster label, not of arrival order), and one narrow left join +
    * map-side hashing over the corpus: the cluster table is
    * candidate-pair-sized, the corpus never shuffles.
    *
    * When to use: splitting BEFORE dedup, or any corpus that retains
    * near-dups (looser dedup threshold than the split threshold,
    * intentionally-kept duplicates, epoch-mixed corpora). A corpus
    * already deduped at the same threshold has no surviving pairs, so
    * a plain doc-hash split of it is equally safe — which is why
    * CurationPipeline does not re-split; its curated output is safe by
    * the q73 invariant. */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
                       idCol: String = "doc_id", valPct: Int = 10,
                       testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"val/test percentages must fit in [0, 100): $valPct/$testPct")
    docs.select(col(idCol))
      .join(clusters.select(col("id").as(idCol), col("comp")),
        Seq(idCol), "left")
      .withColumn("unit", coalesce(col("comp"), col(idCol)))
      .withColumn("bucket",
        pmod(md5Hash64(concat(lit("split:"),
          col("unit").cast("string"))), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 100 - valPct - testPct, "train")
          .when(col("bucket") < 100 - testPct, "val")
          .otherwise("test"))
      .select(col(idCol), col("unit"), col("bucket"), col("split"))
  }

  /** Content-defined chunk fingerprints (Rabin-Karp rolling-hash
    * boundaries + FNV chunk hashes, graft.plans.ContentChunkHashes):
    * sub-document dedup primitive — shared paragraphs share fingerprints
    * regardless of surrounding edits. */
  def contentChunks(text: Column, window: Int = 16,
                    maskBits: Int = 6): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.ContentChunkHashes(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text),
        window, maskBits))

  /** Fixed-boundary FNV-1a chunk fingerprints
    * (graft.plans.FixedChunkFnv): the portable, oracle-checkable twin of
    * [[contentChunks]] — identical fnv kernel, boundaries every
    * `chunkSize` bytes so an external SQL engine can recompute the
    * fingerprints exactly. */
  def fixedChunks(text: Column, chunkSize: Int = 64): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.FixedChunkFnv(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text),
        chunkSize))

  /** SimHash via the native one-pass kernel (graft.plans.SimHash64): same
    * bits as simhash64's explode+groupBy plan, but map-side only — tokens
    * never shuffle. */
  def simhash64Fast(text: Column): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.SimHash64(
        org.apache.spark.sql.graftops.ColumnBridge.expression(text)))

  /** Segment-level exact dedup: split every document into consecutive
    * `window`-word segments, keep only the corpus-wide FIRST occurrence
    * of each distinct segment (ordered by (id, segment position)), and
    * reassemble the surviving text. This is the whole-segment member of
    * the sub-document dedup family (duplicatedSpans audits overlapping
    * n-grams; this one acts): boilerplate headers, licence blocks and
    * quoted paragraphs collapse to one copy while the unique prose
    * around them survives. Whitespace normalizes to single spaces (the
    * segments are rebuilt from the token stream).
    *
    * Output: one row per input document — n_segs, n_kept, and the
    * reassembled clean_text ('' when every segment was a duplicate or
    * the text was empty).
    *
    * Scale posture: segments explode map-side; the first-occurrence
    * choice is ONE hash-aggregate on the 60-bit segment fingerprint
    * (min (id, seg_idx) struct — narrow rows, map-side partial combine),
    * the keep decision joins back on the same fingerprint key, and the
    * reassembly groups by document (per-group state bounded by document
    * size). Nothing is ever corpus × corpus. */
  def dedupSegments(docs: DataFrame, window: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val segs = docs
      .select(col(idCol), toks.as("w"))
      .select(col(idCol),
        // guard the empty doc: sequence(0, -1) would infer step -1 and
        // yield [0, -1] (two phantom segments), not an empty range
        posexplode(when(size(col("w")) === 0,
            array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              ceil(size(col("w")) / lit(window.toDouble)).cast("int") - 1),
            i => concat_ws(" ",
              slice(col("w"), i * window + 1, lit(window)))))))
      .select(col(idCol), col("pos").as("seg_idx"),
        col("col").as("seg_text"))
      .withColumn("h", md5Hash64(col("seg_text")))
    val first = segs.groupBy(col("h"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("keep"))
    val kept = segs.join(first, Seq("h"))
      .filter(col(s"keep.$idCol") === col(idCol) &&
        col("keep.seg_idx") === col("seg_idx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"),
            col("seg_text")))), _.getField("seg_text")), " ")
          .as("clean_text"))
    docs.select(col(idCol),
        ceil(when(length(trim(col(textCol))) === 0, 0)
          .otherwise(size(split(trim(col(textCol)), "\\s+")))
          / lit(window.toDouble)).cast("long").as("n_segs"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Containment-scored candidate pairs (asymmetric near-dup): for LSH
    * candidate pairs, containment_ab = |A∩B| / |A| — the signal Jaccard
    * misses when one document QUOTES another. A short doc fully embedded
    * in a long one has low Jaccard (the union is large) but
    * containment_ab = 1.0; span/quote detection keys on the max of the
    * two directions. Scores are integral basis points (exact in any
    * engine).
    *
    * Same plan as nearDuplicatesPortable (banded LSH bucket join →
    * sorted-merge intersect verify — never all-pairs); only the scoring
    * expression differs, so the scale posture is identical. Note the
    * candidate stage is still symmetric MinHash-LSH: a pair whose
    * Jaccard is far below the banding threshold can be missed even at
    * high one-sided containment (production quote-mining lowers the
    * threshold or bands on the shorter side's shingles). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, bands: Int = 4,
                       rowsPerBand: Int = 4,
                       minContainmentBp: Long = 5000): DataFrame = {
    val banded =
      nearDupBandRows(docs, idCol, textCol, shingleN, bands, rowsPerBand)
    val candidates = banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val hs = shingleSets(docs, idCol, textCol, shingleN)
    candidates
      .join(hs.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(hs.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("ninter", sortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("contain_ab_bp",
        floor(col("ninter") * lit(10000.0) / size(col("hs_a"))).cast("long"))
      .withColumn("contain_ba_bp",
        floor(col("ninter") * lit(10000.0) / size(col("hs_b"))).cast("long"))
      .filter(greatest(col("contain_ab_bp"), col("contain_ba_bp"))
        >= minContainmentBp)
      .select("id_a", "id_b", "contain_ab_bp", "contain_ba_bp")
  }

  /** Tokenize following the q108/oracle idiom: trim + split on runs of
    * whitespace; the empty doc is an empty array (split would yield [""]). */
  private def wsTokens(textCol: String): Column =
    when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))

  /** Cross-document exact-substring duplicated spans — the ACTING face of
    * exact-substring dedup (Lee et al. 2022, arXiv:2107.06499 §4.1,
    * ExactSubstr): where [[duplicatedSpans]] only audits the dup fraction
    * and [[dedupSegments]] cuts at fixed non-overlapping segment
    * boundaries, this marks every maximal duplicated WORD RANGE, at any
    * alignment, via overlapping L-word windows at every position.
    *
    * Keep rule: for each shared window the first occurrence wins — the
    * lowest doc id containing it keeps ALL its copies (within-doc
    * repetition is q96's audit, not this operator's business); every
    * position of that window in every OTHER doc is marked. Marked
    * positions cover word interval [pos, pos+L); overlapping/adjacent
    * covers merge into maximal islands per doc (the classic
    * prev-running-max island scan).
    *
    * Scale: window fingerprints are portable md5-60 longs computed
    * map-side; ONE groupBy on the 8-byte hash finds cross-doc windows
    * (min≠max doc id — no distinct-count), one hash join marks positions,
    * and the island merge is a per-doc window function over only the
    * MARKED positions (dup-fraction-bounded, not corpus-bounded). Token-
    * count input rows of 16 bytes are the same shuffle mass as every
    * shingle pipeline here; nothing is quadratic and full text never
    * shuffles. Returns (idCol, s, e) word-index half-open intervals.
    */
  /** (idCol, pos, h): the L-word window fingerprint at every word
    * position — the shared front of the ExactSubstr family. */
  private def positionWindows(docs: DataFrame, L: Int, idCol: String,
                              textCol: String): DataFrame =
    graft.sources.Tables.fanOut(docs, col(idCol))
      .select(col(idCol), wsTokens(textCol).as("w"))
      .select(col(idCol),
        posexplode(when(size(col("w")) < L, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("w")) - L),
            i => concat_ws(" ", slice(col("w"), i + 1, lit(L)))))))
      .select(col(idCol), col("pos"), md5Hash64(col("col")).as("h"))

  /** Merge marked positions (each covering [pos, pos+L)) into maximal
    * per-doc islands — the prev-running-max scan. */
  private def islandSpans(marked: DataFrame, L: Int,
                          idCol: String): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    marked
      .withColumn("newIsland",
        when(col("pos") > coalesce(max(col("pos") + L).over(prevEnd),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("newIsland")).over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      .select(col(idCol), col("s"), col("e"))
  }

  def exactSubstrSpans(docs: DataFrame, windowWords: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(windowWords > 0, s"windowWords must be positive, got $windowWords")
    val L = windowWords
    // the window table feeds BOTH the owner aggregation and the probe
    // side of the marking join — materialize it once (lazy
    // localCheckpoint, token-count-sized narrow rows, spills past
    // memory) instead of running the tokenize+md5 generator twice
    val spans = positionWindows(docs, L, idCol, textCol)
      .localCheckpoint(false)
    val crossDoc = spans.groupBy(col("h"))
      .agg(min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
      .filter(col("first_id") =!= col("last_id"))
      .select("h", "first_id")
    val marked = spans.join(crossDoc, Seq("h"))
      .filter(col(idCol) =!= col("first_id"))
      .select(col(idCol), col("pos").cast("long").as("pos"))
    islandSpans(marked, L, idCol)
  }

  /** The ExactSubstr standing artifact: per window hash, the lowest doc
    * id that contains it — everything the incremental fold needs
    * (window-vocabulary-sized, 16-byte rows; the occurrence table never
    * persists). */
  def exactSubstrIndex(docs: DataFrame, windowWords: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    positionWindows(docs, windowWords, idCol, textCol)
      .groupBy(col("h")).agg(min(col(idCol)).as("first_id"))

  /** Fold a batch into the standing window index: owners take the min.
    * Under the append-only id contract a standing owner is never
    * displaced, but min is correct (and idempotent) regardless. */
  def foldExactSubstrIndex(standing: DataFrame, batch: DataFrame,
                           windowWords: Int, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    standing.unionByName(
        exactSubstrIndex(batch, windowWords, idCol, textCol))
      .groupBy(col("h")).agg(min(col("first_id")).as("first_id"))

  /** Incremental ExactSubstr (the q67/q159 standing-index recipe):
    * duplicated spans of a NEW batch against everything seen so far.
    * Batch windows probe the standing index UNIONED with their own
    * batch-local owners (batch×standing and batch×batch duplication
    * both mark; standing×standing was marked in earlier folds and is
    * never re-generated) — a batch position is duplicated iff the
    * combined owner of its window is a different doc. Under the
    * append-only id contract, accumulating each fold's spans
    * reproduces the one-shot [[exactSubstrSpans]] row-for-row: a new
    * doc can never displace an old owner, so old spans never change
    * (q180 oracles the accumulated union against the one-shot replay).
    */
  def exactSubstrSpansAgainst(standingIndex: DataFrame, batch: DataFrame,
                              windowWords: Int,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame =
    exactSubstrSpansAndFold(standingIndex, batch, windowWords, idCol,
      textCol)._1

  /** Probe AND fold in one pass: returns (spans, folded index). The
    * combined owner table the probe joins against IS the folded index
    * (groupBy-min over standing UNION batch owners), so callers that need
    * both (q180's wave loop, IndexStreams.substrBatch) compute the
    * window frame and the owner aggregate once instead of re-running
    * positionWindows per consumer. The folded side is localCheckpointed —
    * it is read by the probe join here and again as the next wave's
    * standing index. */
  def exactSubstrSpansAndFold(standingIndex: DataFrame, batch: DataFrame,
                              windowWords: Int,
                              idCol: String = "doc_id",
                              textCol: String = "text")
      : (DataFrame, DataFrame) = {
    val L = windowWords
    // same double-consumer shape as the one-shot: batch windows feed
    // the batch-local owner aggregate AND the probe join
    val w = positionWindows(batch, L, idCol, textCol)
      .localCheckpoint(false)
    val combined = standingIndex.unionByName(
        w.groupBy(col("h")).agg(min(col(idCol)).as("first_id")))
      .groupBy(col("h")).agg(min(col("first_id")).as("first_id"))
      .localCheckpoint(false)
    val marked = w.join(combined, Seq("h"))
      .filter(col(idCol) =!= col("first_id"))
      .select(col(idCol), col("pos").cast("long").as("pos"))
    (islandSpans(marked, L, idCol), combined)
  }

  /** EXACT set-similarity join via prefix filtering (AllPairs, Bayardo
    * Ma & Srikant, WWW 2007) — the deterministic complement of
    * MinHash-LSH: banding can miss a qualifying pair (q129 measures
    * that recall); prefix filtering CANNOT. With each doc's distinct
    * shingle set ordered rarest-token-first (global df, then hash),
    * a pair with Jaccard ≥ τ shares ≥ ⌈τ·|A|⌉ tokens, so A's prefix of
    * length |A| − ⌈τ·|A|⌉ + 1 must contain a shared token — candidates
    * = pairs sharing ANY prefix token, a complete set by construction
    * (Round9Spec pins blocked ≡ brute force on random sets).
    *
    * Plan: one df aggregation (the global order), one per-doc
    * row_number window over token rows, one equi-join on the prefix
    * token (never all-pairs — rare tokens have tiny postings, and the
    * frequent tokens that would blow up the join are exactly the ones
    * the prefix drops), then the q37 sorted-merge intersect verify.
    * The df join stays UNHINTED (corpus-derived — the r8 vocabulary
    * discipline). Threshold math is all integer (inter·10⁴ ≥ τ·union).
    */
  def allPairsSimilarityJoin(docs: DataFrame, shingleN: Int = 3,
                             minJaccardBp: Int = 3000,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    require(minJaccardBp > 0 && minJaccardBp <= 10000,
      s"minJaccardBp must be in (0, 10000], got $minJaccardBp")
    // Width note (r17, measured): an explicit data-scaled repartition
    // was TRIED here and on the pair stream below and made things far
    // worse at sf10 (cold 1108 s vs the honest 293 s; 106 GB spilled):
    // repartitioning the raw pair stream before distinct() bypasses the
    // map-side partial aggregate the planner places BEFORE distinct's
    // exchange, so ~10^9 un-deduped pairs enter a >200-partition
    // sort-shuffle writer. The planner's own exchange placement is the
    // right plan; q185's sf10 cost is candidate-volume work, not a
    // width defect (per-core candidate volume is constant on a real
    // cluster where cores scale with data — PLANS.md r16 audit).
    val hs = shingleSets(docs, idCol, textCol, shingleN)
    val prefix = allPairsPrefix(hs, minJaccardBp, idCol)
    // Bayardo length filter inside the candidate join: J(A,B) ≤
    // min(|A|,|B|)/max(|A|,|B|), so any pair whose sizes differ by more
    // than the threshold ratio can be dropped BEFORE the distinct and
    // the verify — the verify's own inter/uni test would reject it
    // anyway (inter ≤ min, uni ≥ max), so output is unchanged.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          col("a.n") * 10000L >= lit(minJaccardBp.toLong) * col("b.n") &&
          col("b.n") * 10000L >= lit(minJaccardBp.toLong) * col("a.n"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    // Verify only the docs that appear in a candidate pair: without
    // this semi-join the two verify joins below shuffle the FULL
    // shingle-array table twice (corpus-sized rows each carrying ~all
    // the doc's shingles) to serve a candidate set that is orders of
    // magnitude smaller — the dominant cost of the sf10 probe. AQE
    // broadcasts the (small) candidate-id side at runtime, so the
    // pruned table never exchanges corpus-wide; output is unchanged
    // (a semi-join only drops rows the pair joins would drop anyway).
    val candIds = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol)))
      .distinct()
    val hsCand = hs.join(candIds, Seq(idCol), "left_semi")
    cand
      .join(hsCand.select(col(idCol).as("id_a"), col("hs").as("hs_a")),
        Seq("id_a"))
      .join(hsCand.select(col(idCol).as("id_b"), col("hs").as("hs_b")),
        Seq("id_b"))
      .withColumn("inter",
        sortedIntersectCount(col("hs_a"), col("hs_b")).cast("long"))
      .withColumn("uni",
        size(col("hs_a")).cast("long") + size(col("hs_b")) - col("inter"))
      .filter(col("inter") * 10000L >= lit(minJaccardBp.toLong) * col("uni"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 10000 div uni").as("jaccard_bp"))
  }

  /** The prefix-token frame of [[allPairsSimilarityJoin]] — (idCol, h,
    * n) rows where each doc keeps only its |A| − ⌈τ·|A|⌉ + 1 RAREST
    * tokens (global df order, hash tiebreak), carrying the doc's
    * distinct-token count `n` for the candidate join's length filter.
    * Exposed so scale probes can pin the skew invariant directly: a
    * corpus-wide hot token ranks LAST in every doc's ordering and
    * therefore never enters any prefix (for docs with ≥ ⌈1/τ⌉ distinct
    * tokens), which is exactly what keeps the candidate join's
    * postings bounded under pathological skew. Input is the
    * [[shingleSets]] frame (idCol, hs sorted distinct). */
  def allPairsPrefix(hs: DataFrame, minJaccardBp: Int,
                     idCol: String = "doc_id"): DataFrame = {
    val sz = hs.select(col(idCol), size(col("hs")).cast("long").as("n"))
    val tok = hs.select(col(idCol), explode(col("hs")).as("h"))
    val freq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("h"))
    tok.join(freq, Seq("h"))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .join(sz, Seq(idCol))
      .filter(col("rk") <=
        col("n") - expr(s"(n * $minJaccardBp + 9999) div 10000") + 1L)
      .select(col(idCol), col("h"), col("n"))
  }

  /** MDM survivorship: one GOLDEN record per entity cluster — for each
    * listed field, the most frequent non-null value among the entity's
    * member records (ties break to the lexicographically greatest
    * value — one deterministic rule, no engine-chosen row), plus
    * member count and the lowest member id as the representative key.
    *
    * One melt (fields explode to (entity, field, value) rows — field
    * count scales the map side, not the shuffle count) + one counting
    * aggregate + one max(struct) mode pick + one bounded pivot. Full
    * records never shuffle; entity grain bounds every frame. */
  def goldenRecords(records: DataFrame, entityCol: String,
                    idCol: String, modeCols: Seq[String]): DataFrame = {
    require(modeCols.nonEmpty, "goldenRecords needs at least one field")
    val kvs = modeCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val mode = records
      .select(col(entityCol), explode(map(kvs: _*)).as(Seq("f", "v")))
      .filter(col("v").isNotNull)
      .groupBy(col(entityCol), col("f"), col("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(entityCol), col("f"))
      .agg(max(struct(col("c"), col("v"))).as("m"))
      .select(col(entityCol), col("f"), col("m.v").as("v"))
    val wide = mode.groupBy(col(entityCol))
      .pivot("f", modeCols).agg(first(col("v")))
    records.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_members"), min(col(idCol)).as("rep_id"))
      .join(wide, Seq(entityCol), "left")
  }

  /** Apply [[exactSubstrSpans]]: cut every marked word range and reassemble
    * the remaining words (single-space joined, original order). The span
    * table aggregates to one bounded array per affected doc, so the apply
    * step is ONE join of the corpus against only its affected docs plus
    * pure map-side array filtering — full text crosses no exchange beyond
    * that single doc-keyed join. Returns per-doc n_words / n_cut /
    * clean_text (empty when fully covered). */
  def exactSubstrCut(docs: DataFrame, windowWords: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val cutsType = "array<struct<s:bigint,e:bigint>>"
    val perDoc = exactSubstrSpans(docs, windowWords, idCol, textCol)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("s"), col("e"))))
        .as("cuts"))
    docs.select(col(idCol), wsTokens(textCol).as("w"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("cuts", coalesce(col("cuts"), array().cast(cutsType)))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        aggregate(col("cuts"), lit(0L),
          (acc, c) => acc + (c.getField("e") - c.getField("s")))
          .as("n_cut"),
        array_join(filter(col("w"), (word, i) =>
          !exists(col("cuts"), c =>
            i.cast("long") >= c.getField("s") &&
              i.cast("long") < c.getField("e"))), " ")
          .as("clean_text"))
  }
}
