package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Mixing, TextAnalysis}

/** The curation driver — the training-data counterpart of [[Pipeline]]:
  * one call runs quality filtering → near-dup clustering with a
  * QUALITY-AWARE representative → benchmark decontamination → sequence
  * packing over the survivors, landing the curated corpus and the packed
  * layout as idempotent Parquet writes.
  *
  * Stage order is cost order: the census-kernel quality pass (map-side)
  * prunes first, clustering runs over the full corpus (a near-dup of a
  * discarded doc must still absorb its twin), decontamination scores
  * only quality∩representative survivors map-side, packing is one shard
  * shuffle at the end. Every stage's formulation is individually
  * oracle-pinned (q72 / q61+q89 / q68 / q65); this object is their
  * production composition — the q73 capstone, upgraded to the
  * keep-the-best-KEEPABLE-duplicate policy and wired to sinks.
  *
  * Execution discipline (the 100 TB posture):
  *  - each stage runs ONCE: the narrow quality-verdict frame and the
  *    deduped id set are persisted across their consumers, and the
  *    mixing/packing stage plus all output metrics read the LANDED
  *    parquet instead of re-executing the upstream chain;
  *  - the near-dup drop list is corpus-proportional (every
  *    non-representative member of every cluster — tens of percent of
  *    all ids on a web corpus), so it anti-joins as a plain shuffled
  *    join on the narrow id column, never a forced broadcast;
  *  - a dominant source serializes per-shard windows — `subShardBuckets`
  *    routes mixing and packing through the [[Mixing.subShard]] /
  *    [[Mixing.mixCorpusSharded]] levers, which bound every stream to
  *    ~1/n of its source while keeping the emitted (source, doc, epoch)
  *    multiset identical (CurationSpec pins this).
  */
object CurationPipeline {

  final case class Config(
      outputDir: String,
      evalModulus: Long = 17, // doc_id % m == 0 → held-out eval set
      minJaccardBp: Long = 2000,
      packBudget: Int = 512,
      // fixed quality-gate constants (TextAnalysis.qualityVerdict's
      // defaults), used when adaptiveQualityPercentile is None
      minWords: Int = 10,
      maxWords: Int = 5000,
      minAlphaBp: Int = 5000,
      maxTopWordFrac: Double = 0.3,
      // adaptive quality gate (q126): Some(p) derives the keep
      // thresholds from the corpus's own distribution — the p-th
      // percentile of alpha_bp and of n_words via the sort-free
      // histogram percentiles — and gates on
      // alpha_bp >= th_alpha AND n_words >= th_words, ignoring the
      // fixed constants above. The thresholds used are reported in
      // Result (self-describing gate). None = the fixed gate.
      adaptiveQualityPercentile: Option[Int] = None,
      // Pile-style per-source epoch weights in hundredths (250 = 2.5
      // epochs); empty = every curated doc exactly once, unmixed
      mixWeightsHundredths: Map[String, Int] = Map.empty,
      // skew lever: split every source into this many deterministic
      // md5-bucket sub-shards before mixing/packing, so one dominant
      // source cannot serialize the per-shard windows. None = one
      // stream per source.
      subShardBuckets: Option[Int] = None,
      // balance lever: absolute per-source caps applied to the CURATED
      // corpus before mixing/packing (TextAnalysis.quotaSample — the
      // deterministic smallest-hash draw). Sources absent from the map
      // pass through uncapped unless defaultSourceQuota is set; both
      // empty = no balancing.
      sourceQuotas: Map[String, Int] = Map.empty,
      defaultSourceQuota: Option[Int] = None,
      // decontamination transport: None broadcasts the eval shingles as
      // an exact sorted array (Dedup.contamination); Some(bits) ships a
      // Bloom image of that size instead and exact-verifies only the
      // probable hits (Dedup.contaminationBloom) — same curated set
      // either way (no false negatives; FPs culled), choose by eval-set
      // cardinality: ~10 bits/shingle keeps the FP rate ~1%.
      bloomDecontaminationBits: Option[Int] = None,
      // join routing: route the cluster↔quality join-back (the one inner
      // equi-join in the pipeline) through Skew.autoJoin's
      // decide-before-you-shuffle stats pass instead of a fixed plan —
      // broadcast when the quality side is small, salted when one
      // cluster id dominates the join output, plain otherwise. Output is
      // the same multiset for every route (SkewSpec pins the router;
      // CurationSpec pins this composition); Result records the choice.
      routeDedupJoin: Boolean = false,
      // tokenizer-aware packing: Some(r) trains an r-round BPE
      // vocabulary on the balanced corpus (Bpe.train — word-table-sized
      // work) and packs sequences by the SUBWORD counts it assigns
      // (Mixing.packSequences tokenCol routing), so packBudget is model
      // tokens, not whitespace tokens. None = the whitespace census.
      // Docs the encoder never saw (empty text) pack as 0 tokens.
      bpeTokenizerRounds: Option[Int] = None,
      // data-selection lever (DSIR, q146/q147): Some(lang) scores every
      // balanced doc by hashed-token log-likelihood ratio toward that
      // language's distribution and keeps the dsirPerSourceK-strongest
      // ES draws per source before mixing/packing — the selection step
      // that tilts the packed corpus toward the target distribution.
      // Token-less docs score 0 (weight 1) and stay eligible.
      dsirTargetLang: Option[String] = None,
      dsirPerSourceK: Int = 10,
      // versioned landing (sources.VersionedTable): commit the curated
      // corpus as an overwrite snapshot in a commit-log table at
      // <outputDir>/curated instead of a plain parquet dir — same
      // single write, but every run's corpus stays readable by version
      // and a crashed run is invisible to readers. Consumers read via
      // VersionedTable.read/readAsOf; Result.curatedVersion records
      // the committed version.
      versionedCurated: Boolean = false,
      // PII scrub (q149/q150): rewrite every document's text through
      // the three-pattern redactor (Pii.redactCol — map-side codegen
      // regexps, no extra stage) BEFORE the quality gate, so the
      // census, dedup shingles, packed output, and landed corpus all
      // see scrubbed text. Result.nPiiFlagged counts the input docs
      // that carried at least one match (folded into the same input
      // metric scan — no extra pass).
      redactPii: Boolean = false,
      // CCNet perplexity filter (q152): non-empty = keep only docs
      // whose per-language bigram-LM bucket is in this set (the
      // standard cut is Set("head", "middle")); docs with no LM score
      // drop. Composes with the census gate by rewriting the same
      // keep flag, so dedup's representative ranking respects it.
      ccnetKeepBuckets: Set[String] = Set.empty,
      // curriculum packing: order each pack shard easiest-text-first
      // (quality census alpha_bp desc, doc_id tiebreak) instead of
      // doc_id — the curriculum-learning layout lever. Requires an
      // unmixed stream (a mixing schedule already defines the order).
      curriculumPacking: Boolean = false,
      // UniMax budget lever (q175): Some(B) derives the per-source
      // epoch weights from exact waterfilling — spend B tokens as
      // uniformly as possible across sources, capping every source at
      // unimaxEpochCap passes — and routes them into the same mixCorpus
      // schedule a hand-written mixWeightsHundredths would use
      // (weight = allocated epochs in hundredths, floored, min 1).
      // Mutually exclusive with mixWeightsHundredths: one mixing
      // authority. The allocation is a source-dim-sized driver read
      // (the catalog-granularity boundary); Result.unimaxWeights
      // records what was chosen.
      unimaxBudgetTokens: Option[Long] = None,
      unimaxEpochCap: Int = 2)

  final case class Result(
      nInput: Long, nEval: Long, nQualityKept: Long, nAfterDedup: Long,
      nCurated: Long, nBalanced: Long, nMixed: Long, nWindows: Long,
      // the adaptive gate's corpus-derived thresholds (None on the
      // fixed gate) — the gate is self-describing, q126's contract
      thAlpha: Option[Long] = None, thWords: Option[Long] = None,
      // what the join router decided for the cluster join-back
      // ("broadcast" | "salted" | "plain"; None when routeDedupJoin is
      // off) — the run is self-describing about its physical shape
      dedupJoinChoice: Option[String] = None,
      // the BPE rounds the packer's token counts came from (None =
      // whitespace census) — the layout is self-describing
      bpeRounds: Option[Int] = None,
      // docs surviving the DSIR selection lever (None when off)
      nDsirSelected: Option[Long] = None,
      // corpus docs that carried ≥1 PII match before the scrub (None
      // when redactPii is off)
      nPiiFlagged: Option[Long] = None,
      // the commit-log version this run's curated corpus landed as
      // (None when versionedCurated is off)
      curatedVersion: Option[Long] = None,
      // the per-source epoch weights (hundredths) the UniMax budget
      // lever derived and mixed with (None when the lever is off)
      unimaxWeights: Option[Map[String, Int]] = None)

  def run(spark: SparkSession, docs: DataFrame, conf: Config): Result = {
    val corpus0 = docs.filter(col("doc_id") % conf.evalModulus =!= 0)
    // 0. optional PII scrub — three codegen regexp_replace passes fused
    //    into whatever stage first reads the text; no stage boundary
    val corpus =
      if (conf.redactPii)
        corpus0.withColumn("text",
          graft.functions.Pii.redactCol(col("text")))
      else corpus0

    // 1. quality gate — one map-side census-kernel pass (q72). The
    //    verdict frame is narrow (ids + three small numerics, no text);
    //    persisting it lets the keep gate, the representative ranking,
    //    and the nQualityKept metric share one execution. With the
    //    adaptive lever, the corpus-derived thresholds read the SAME
    //    persisted frame (two domain-sized histogram aggregates + a
    //    1-row driver read — the metrics-read pattern), then the keep
    //    column is rewritten on top of it; the census never runs twice.
    val verdict = TextAnalysis.qualityVerdict(corpus, minWords =
        conf.minWords, maxWords = conf.maxWords,
        minAlphaBp = conf.minAlphaBp,
        maxTopWordFrac = conf.maxTopWordFrac)
      .select("doc_id", "alpha_bp", "n_words", "keep").persist()
    val (quality, thresholds) = conf.adaptiveQualityPercentile match {
      case None => (verdict, None)
      case Some(p) =>
        val th = TextAnalysis.adaptiveQualityThresholds(verdict, p)
          .collect().head
        val (ta, tw) = (th.getLong(0), th.getLong(1))
        (verdict.withColumn("keep",
          col("alpha_bp") >= ta && col("n_words") >= tw),
          Some((ta, tw)))
    }
    // CCNet lever (q152): restrict keep to the allowed perplexity
    // buckets of the corpus bigram LM — head/middle is the standard
    // "keep the two lowest-perplexity thirds of each language" cut.
    // The bucket column rewrites the SAME keep flag the census gate
    // produced, so the cluster-representative argmax below respects it
    // too (an excluded-bucket twin can't win a cluster and then fail
    // the gate). Docs with no LM score (fewer than two words) are not
    // in any bucket and drop, as in CCNet.
    val quality1 = conf.ccnetKeepBuckets match {
      case s if s.isEmpty => quality
      case s =>
        val allowed = graft.functions.Retrieval.ccnetBuckets(corpus)
          .filter(col("bucket").isin(s.toSeq: _*))
          .select(col("doc_id"), lit(true).as("ccnet_ok"))
        quality.join(allowed, Seq("doc_id"), "left")
          .withColumn("keep",
            col("keep") && coalesce(col("ccnet_ok"), lit(false)))
          .select("doc_id", "alpha_bp", "n_words", "keep")
    }
    val kept = quality1.filter(col("keep")).select("doc_id")

    // 2. near-dup clusters over the FULL corpus; representative = the
    //    best-quality KEEPABLE member (argmax over kept ∩ members):
    //    ranking ALL members would let a best-but-unkeepable twin win
    //    the cluster, fail the quality gate, and lose the cluster
    //    entirely despite a keepable member
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatesPortable(corpus, "doc_id", "text",
        shingleN = 3, bands = 4, rowsPerBand = 4,
        minJaccardBp = conf.minJaccardBp),
      assumeDistinctPairs = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(desc("alpha_bp"), desc("n_words"), asc("id"))
    val keptQuality = quality1.filter(col("keep"))
      .select(col("doc_id").as("id"), col("alpha_bp"), col("n_words"))
    // the join-back is cluster-membership-sized on the left and
    // kept-corpus-sized on the right; with the router on, the stats pass
    // decides its physical shape before any shuffle (same multiset out
    // on every route)
    val (clusterQuality, routeReport) =
      if (conf.routeDedupJoin) {
        val (j, r) = graft.operators.Skew.autoJoin(clusters, keptQuality,
          "id")
        (j, Some(r))
      } else (clusters.join(keptQuality, Seq("id")), None)
    val drop = clusterQuality
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") =!= 1)
      .select(col("id").as("doc_id"))

    // shuffled anti-join, deliberately un-hinted: the drop list is
    // corpus-proportional, far past broadcast range at scale (AQE will
    // still pick a broadcast when it happens to be small)
    val deduped = kept.join(drop, Seq("doc_id"), "left_anti").persist()

    // 3. decontamination — eval shingles collapse to one broadcast
    //    array, survivors scored map-side (q68)
    val eval = docs.filter(col("doc_id") % conf.evalModulus === 0)
    val survivorDocs = corpus.join(deduped, Seq("doc_id"), "left_semi")
    val scored = conf.bloomDecontaminationBits match {
      case Some(bits) =>
        Dedup.contaminationBloom(survivorDocs, eval, numBits = bits)
      case None => Dedup.contamination(survivorDocs, eval)
    }
    val clean = scored
      .filter(col("n_contaminated") === 0)
      .select("doc_id")
    val curated = corpus.join(clean, Seq("doc_id"), "left_semi")

    // 4. land the curated corpus, then mix/pack the LANDED parquet —
    //    the quality→cluster→decontaminate chain executes exactly once
    //    (for the write); everything downstream re-reads the sink. With
    //    versionedCurated, the run commits ONE overwrite snapshot to
    //    the commit-log table (sources.VersionedTable) and downstream
    //    reads that snapshot — same single write, but every past run's
    //    corpus stays readable by version (the "what did this model
    //    train on" audit), and a crashed run can never leave a
    //    half-visible corpus (log-only planning).
    val curatedVersion = if (conf.versionedCurated) {
      Some(graft.sources.VersionedTable.overwrite(curated,
        s"${conf.outputDir}/curated"))
    } else {
      curated.write.mode("overwrite")
        .parquet(s"${conf.outputDir}/curated")
      None
    }
    val landed0 = curatedVersion match {
      case Some(v) => graft.sources.VersionedTable
        .readAsOf(spark, s"${conf.outputDir}/curated", v)
      case None => spark.read.parquet(s"${conf.outputDir}/curated")
    }

    // optional per-source balancing (quota caps) over the landed corpus:
    // listed sources cap at their quota, the rest pass through unless a
    // default cap is set — the selection is the bounded MinKAgg draw
    // (no per-source sort), reading only the landed parquet
    val balancing =
      conf.sourceQuotas.nonEmpty || conf.defaultSourceQuota.isDefined
    val landed = (conf.sourceQuotas.isEmpty, conf.defaultSourceQuota) match {
      case (true, None) => landed0
      case (_, Some(dq)) => TextAnalysis.quotaSample(landed0, "doc_id",
        "source", conf.sourceQuotas, dq)
      case (false, None) =>
        val listed = conf.sourceQuotas.keys.toSeq
        // coalesce: a bare isin is NULL (not false) on a NULL source,
        // which would drop null-source docs from BOTH branches — they
        // can't match a listed name, so they pass through uncapped
        val isListed = coalesce(col("source").isin(listed: _*), lit(false))
        landed0.filter(!isListed).unionByName(
          TextAnalysis.quotaSample(
            landed0.filter(isListed), "doc_id",
            "source", conf.sourceQuotas, defaultQuota = 0))
    }
    // the balanced frame backs both the pack input and its own metric —
    // persist so the quota draw executes once (stage-once discipline)
    if (balancing) landed.persist()

    // optional DSIR selection (the q146/q147 composition): score the
    // balanced corpus toward the target language's hashed-token
    // distribution, keep the strongest ES draws per source — everything
    // downstream (mixture, BPE vocabulary, packed layout) is built from
    // the SELECTED subset. Token-less docs score 0 (weight 1), staying
    // eligible rather than silently vanishing.
    val selecting = conf.dsirTargetLang.isDefined
    val selected = conf.dsirTargetLang match {
      case Some(tl) =>
        val imp = TextAnalysis.dsirImportance(landed, col("lang") === tl)
        val weighted = landed.join(imp, Seq("doc_id"), "left")
          .withColumn("dsir_w", exp(greatest(least(
            coalesce(col("importance_micro"), lit(0L)) / lit(1e6),
            lit(50.0)), lit(-50.0))))
        TextAnalysis.weightedSample(weighted, "doc_id", "dsir_w",
            "source", conf.dsirPerSourceK)
          .drop("dsir_w", "n_feat", "importance_micro")
      case None => landed
    }
    if (selecting) selected.persist()

    // optional epoch-weight mixture (q66), then the packed layout (q65)
    // over the training stream — the mixed stream's per-shard order key
    // is sched_t (unique within a (sub-)shard for weights ≤ 100 epochs —
    // the stride schedule is strictly increasing), satisfying
    // packSequences' uniqueness contract where (doc_id, epoch)
    // duplicates would not.
    val packShard = conf.subShardBuckets.map(b =>
      Mixing.subShard(col("source"), col("doc_id"), b))
    // UniMax budget lever: derive the epoch weights from exact
    // waterfilling over the SELECTED stream's token mass (the corpus
    // the mixer will actually replicate), then feed them through the
    // ordinary mixCorpus path — the schedule machinery is shared, only
    // the weight authority changes. Source-dim driver read.
    val unimaxWeights: Option[Map[String, Int]] =
      conf.unimaxBudgetTokens.map { budget =>
        require(conf.mixWeightsHundredths.isEmpty,
          "unimaxBudgetTokens and mixWeightsHundredths are both mixing " +
            "authorities — set only one")
        val counts = selected.select(col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("nw"))
          .groupBy("source").agg(sum(col("nw")).as("tokens"))
          .filter(col("tokens") > 0)
        Mixing.unimaxAllocation(counts, budget, conf.unimaxEpochCap)
          .select(col("source"),
            greatest(lit(1L), expr("alloc_tokens * 100 div tokens"))
              .as("w"))
          .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      }
    val mixWeights = unimaxWeights.getOrElse(conf.mixWeightsHundredths)
    val (stream, shardCol, orderCol) =
      (mixWeights.isEmpty, packShard) match {
        case (true, None) => (selected, "source", "doc_id")
        case (true, Some(sh)) =>
          (selected.withColumn("pack_shard", sh), "pack_shard", "doc_id")
        case (false, None) =>
          (Mixing.mixCorpus(selected, mixWeights),
            "source", "sched_t")
        case (false, Some(sh)) =>
          // sched_t comes from the sub-sharded stride schedule, and the
          // pack shard recomputes the same deterministic bucket — so
          // sched_t is unique within each pack_shard
          (Mixing.mixCorpusSharded(selected, mixWeights,
            conf.subShardBuckets.get).withColumn("pack_shard", sh),
            "pack_shard", "sched_t")
      }
    // curriculum lever: order each pack shard easiest-text-first by the
    // quality census (alpha_bp desc; doc_id the unique tiebreak —
    // packSequences' ROWS-frame contract needs a unique order key).
    // The verdict frame is persisted and already paid for; the join is
    // a narrow id→score lookup. Composes with the UNMIXED stream only:
    // a mixing schedule already defines the pack order.
    val (streamC, orderColC) =
      if (!conf.curriculumPacking) (stream, orderCol)
      else {
        require(mixWeights.isEmpty,
          "curriculumPacking requires an unmixed stream " +
            "(no mixWeightsHundredths / unimaxBudgetTokens): the " +
            "mixing schedule already defines the pack order")
        (stream.join(quality.select(col("doc_id"), col("alpha_bp")),
            Seq("doc_id"), "left")
          .withColumn("curr_key",
            (lit(10000L) - coalesce(col("alpha_bp"), lit(0L)))
              * lit(10000000000L) + col("doc_id")),
          "curr_key")
      }
    // tokenizer-aware packing: the vocabulary trains on the BALANCED
    // corpus (the docs actually packed) — word-table-sized work; the
    // per-doc subword counts join back on doc_id (left join + 0 default
    // keeps zero-word docs in the layout, matching the census path)
    val (packInput, packTokenCol) = conf.bpeTokenizerRounds match {
      case Some(r) =>
        val counts = graft.functions.Bpe.encode(selected, r)
          .select(col("doc_id"), col("n_tokens").as("bpe_tokens"))
        (streamC.join(counts, Seq("doc_id"), "left")
          .withColumn("bpe_tokens", coalesce(col("bpe_tokens"), lit(0L))),
          Some("bpe_tokens"))
      case None => (streamC, None)
    }
    Mixing.packSequences(packInput, conf.packBudget, shardCol = shardCol,
        orderCol = orderColC, tokenCol = packTokenCol)
      .drop("bpe_tokens", "curr_key", "alpha_bp")
      .write.mode("overwrite").parquet(s"${conf.outputDir}/packed")
    val packed = spark.read.parquet(s"${conf.outputDir}/packed")

    // metrics: one scan of the input for the two input-side counts, the
    // persisted frames for the mid-pipeline counts, the landed parquet
    // for the output-side counts — nothing re-executes a stage
    val piiHitCol =
      if (conf.redactPii)
        sum(when(col("doc_id") % conf.evalModulus =!= 0 &&
          graft.functions.Pii.patterns.map { case (_, re, _) =>
            regexp_count(col("text"), lit(re))
          }.reduce(_ + _) > 0, 1L).otherwise(0L)).as("npii")
      else lit(null).cast("long").as("npii")
    val io = docs.agg(count(lit(1)).as("n"),
      sum((col("doc_id") % conf.evalModulus === 0).cast("long")).as("ne"),
      piiHitCol)
      .collect().head
    val res = Result(
      nInput = io.getLong(0), nEval = io.getLong(1),
      nQualityKept = kept.count(), nAfterDedup = deduped.count(),
      nCurated = landed0.count(), nBalanced = landed.count(),
      nMixed = packed.count(),
      nWindows = packed
        .select(countDistinct(col(shardCol), col("seq_id")))
        .collect().head.getLong(0),
      thAlpha = thresholds.map(_._1), thWords = thresholds.map(_._2),
      dedupJoinChoice = routeReport.map(_.choice),
      bpeRounds = conf.bpeTokenizerRounds,
      nDsirSelected = if (selecting) Some(selected.count()) else None,
      nPiiFlagged = if (conf.redactPii) Some(io.getLong(2)) else None,
      curatedVersion = curatedVersion,
      unimaxWeights = unimaxWeights)
    verdict.unpersist()
    deduped.unpersist()
    if (balancing) landed.unpersist()
    if (selecting) selected.unpersist()
    res
  }
}
