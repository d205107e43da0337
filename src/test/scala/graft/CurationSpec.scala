package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end invariants of the curation driver — checked as PROPERTIES
  * of the landed output, not by re-composing the same code:
  *  - no near-dup pair at or above the threshold survives curation,
  *  - no curated doc shares a shingle with the held-out eval set,
  *  - per cluster, the survivor (if any) is the best-quality member,
  *  - counts are monotone through the stages and writes are idempotent.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  lazy val docs = graft.sources.Tables.load(spark, dir, "documents")
  lazy val out = java.nio.file.Files
    .createTempDirectory("graft-curation").toString
  lazy val conf = CurationPipeline.Config(outputDir = out)
  lazy val res = CurationPipeline.run(spark, docs, conf)

  test("counts are monotone and outputs land") {
    assert(res.nInput == docs.count())
    assert(res.nQualityKept <= res.nInput - res.nEval)
    assert(res.nAfterDedup <= res.nQualityKept)
    assert(res.nCurated <= res.nAfterDedup && res.nCurated > 0)
    assert(res.nWindows > 0)
    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.count() == res.nCurated)
  }

  test("no near-dup pair at/above the threshold survives curation") {
    val curated = spark.read.parquet(s"$out/curated")
    val pairs = graft.functions.Dedup.nearDuplicatesPortable(
      curated, "doc_id", "text", shingleN = 3, bands = 4,
      rowsPerBand = 4, minJaccardBp = conf.minJaccardBp)
    assert(pairs.count() == 0)
  }

  test("zero contamination against the eval set") {
    val curated = spark.read.parquet(s"$out/curated")
    val eval = docs.filter(col("doc_id") % conf.evalModulus === 0)
    val dirty = graft.functions.Dedup.contamination(curated, eval)
      .filter(col("contaminated"))
    assert(dirty.count() == 0)
  }

  test("per cluster the survivor is the best-quality KEEPABLE member " +
    "(not necessarily the min id)") {
    val curated = spark.read.parquet(s"$out/curated").select("doc_id")
    val corpus = docs.filter(col("doc_id") % conf.evalModulus =!= 0)
    val clusters = graft.functions.Dedup.connectedComponents(
      graft.functions.Dedup.nearDuplicatesPortable(corpus, "doc_id",
        "text", 3, 4, 4, conf.minJaccardBp), assumeDistinctPairs = true)
    // the argmax runs over quality-KEPT members only: a best-but-
    // unkeepable twin must not win the cluster and then fail the gate
    val q = graft.functions.TextAnalysis.qualityVerdict(
        corpus.join(clusters.select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi"))
      .filter(col("keep"))
      .select(col("doc_id").as("id"), col("alpha_bp"), col("n_words"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(desc("alpha_bp"), desc("n_words"), asc("id"))
    val best = clusters.join(q, Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val members = clusters.select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val survivingMembers = curated.collect().map(_.getLong(0)).toSet
      .intersect(members)
    // every surviving cluster member is its cluster's best keepable —
    // none of the non-best members slipped through
    assert(survivingMembers.subsetOf(best),
      s"non-best survivors: ${(survivingMembers -- best).take(5)}")
    // and every cluster with at least one keepable, uncontaminated best
    // member DOES survive — the old all-members argmax lost such
    // clusters when their global-best member failed the quality gate
    val eval = docs.filter(col("doc_id") % conf.evalModulus === 0)
    val cleanBest = graft.functions.Dedup.contamination(
        corpus.join(best.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"),
        eval)
      .filter(col("n_contaminated") === 0)
      .collect().map(_.getLong(0)).toSet
    assert(cleanBest.subsetOf(curated.collect().map(_.getLong(0)).toSet),
      s"lost keepable representatives: ${
        (cleanBest -- curated.collect().map(_.getLong(0)).toSet).take(5)}")
  }

  val weights = Map("src0" -> 250, "src1" -> 50)
  lazy val out2 = java.nio.file.Files
    .createTempDirectory("graft-curation-mix").toString
  lazy val mixRes = CurationPipeline.run(spark, docs,
    conf.copy(outputDir = out2, mixWeightsHundredths = weights))

  test("epoch-weight mixture: per-doc multiplicity lands in " +
    "[floor(w/100), ceil(w/100)] and the mixed stream packs") {
    val r = mixRes
    assert(r.nCurated == res.nCurated) // mixing doesn't change curation
    assert(r.nMixed > r.nCurated && r.nWindows > 0)
    val packed = spark.read.parquet(s"$out2/packed")
    val mult = packed.groupBy("source", "doc_id")
      .agg(count(lit(1)).as("m"))
      .collect().map(row => (row.getString(0), row.getLong(2))).toSeq
    mult.foreach { case (src, m) =>
      val w = weights.getOrElse(src, 100)
      assert(m >= w / 100 && m <= (w + 99) / 100, s"$src m=$m w=$w")
    }
    // src1 at 0.5 epochs: some docs kept, some dropped — both sides real
    val src1 = mult.filter(_._1 == "src1").map(_._2)
    if (src1.size > 3) assert(src1.contains(1L) || src1.isEmpty)
  }

  test("sub-sharded run curates identically and emits the same " +
    "(source, doc, epoch) multiset — the MixingSpec invariant lifted " +
    "to the driver") {
    val outS = java.nio.file.Files
      .createTempDirectory("graft-curation-shard").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outS, mixWeightsHundredths = weights,
        subShardBuckets = Some(4)))
    assert(r.nCurated == mixRes.nCurated)
    assert(r.nMixed == mixRes.nMixed)
    val curA = spark.read.parquet(s"$out2/curated").select("doc_id")
    val curB = spark.read.parquet(s"$outS/curated").select("doc_id")
    assert(curA.except(curB).count() == 0
      && curB.except(curA).count() == 0)
    val a = spark.read.parquet(s"$out2/packed")
      .groupBy("source", "doc_id", "epoch").count()
    val b = spark.read.parquet(s"$outS/packed")
      .groupBy("source", "doc_id", "epoch").count()
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // the sub-shard column landed and every stream is a real split
    val shards = spark.read.parquet(s"$outS/packed")
      .select("pack_shard").distinct().collect().map(_.getString(0))
    assert(shards.forall(_.contains("#")))
  }

  test("balance lever: listed sources cap at their quota, unlisted " +
    "pass through; curation itself is unchanged; the mixed/packed " +
    "stream is built from the balanced subset") {
    res // baseline run first
    // cap the source with the most curated docs at 1 — guaranteed trim
    val base = spark.read.parquet(s"$out/curated")
      .groupBy("source").count().collect()
      .map(row => row.getString(0) -> row.getLong(1))
    val (bigSrc, bigN) = base.maxBy(_._2)
    assert(bigN > 1, "fixture has no source with >1 curated doc")
    val outB = java.nio.file.Files
      .createTempDirectory("graft-curation-bal").toString
    val quota = 1
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outB,
        sourceQuotas = Map(bigSrc -> quota)))
    assert(r.nCurated == res.nCurated) // balancing is post-curation
    assert(r.nBalanced == r.nCurated - bigN + quota)
    assert(r.nMixed == r.nBalanced)
    val bySrc = spark.read.parquet(s"$outB/packed")
      .groupBy("source").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(bySrc(bigSrc) == quota.toLong)
    // unlisted sources pass through whole
    base.foreach { case (src, n) =>
      if (src != bigSrc) assert(bySrc(src) == n, s"$src trimmed")
    }
    // the balanced draw is the deterministic quota sample of the
    // landed corpus — replayable byte-for-byte
    val landed = spark.read.parquet(s"$outB/curated")
    val expect = graft.functions.TextAnalysis.quotaSample(
        landed.filter(org.apache.spark.sql.functions.col("source")
          === bigSrc), "doc_id", "source", Map(bigSrc -> quota), 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotBig = spark.read.parquet(s"$outB/packed")
      .filter(org.apache.spark.sql.functions.col("source") === bigSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotBig == expect)
  }

  test("adaptive quality gate: the run derives its thresholds from the " +
    "corpus (reported in Result) and curates exactly what a manual run " +
    "with those same thresholds as fixed constants curates") {
    val outA = java.nio.file.Files
      .createTempDirectory("graft-cur-adapt").toString
    val resA = CurationPipeline.run(spark, docs,
      CurationPipeline.Config(outputDir = outA,
        adaptiveQualityPercentile = Some(10)))
    // the reported thresholds ARE the corpus's 10th percentiles
    val corpus = docs.filter(col("doc_id") % conf.evalModulus =!= 0)
    val v = graft.functions.TextAnalysis.qualityVerdict(corpus)
      .select("doc_id", "alpha_bp", "n_words")
    val th = graft.functions.TextAnalysis
      .adaptiveQualityThresholds(v, 10).collect().head
    assert(resA.thAlpha.contains(th.getLong(0)) &&
      resA.thWords.contains(th.getLong(1)), s"$resA vs $th")
    // manual run: the same thresholds as FIXED gate constants (the
    // extra fixed-gate conditions neutralized) must curate the same set
    val outM = java.nio.file.Files
      .createTempDirectory("graft-cur-manual").toString
    val resM = CurationPipeline.run(spark, docs,
      CurationPipeline.Config(outputDir = outM,
        minWords = th.getLong(1).toInt,
        minAlphaBp = th.getLong(0).toInt,
        maxWords = Int.MaxValue, maxTopWordFrac = 2.0))
    assert(resM.thAlpha.isEmpty && resM.thWords.isEmpty)
    def ids(p: String) = spark.read.parquet(s"$p/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(outA) == ids(outM))
    assert(resA.copy(thAlpha = None, thWords = None) == resM)
    // and the adaptive gate is a real gate: it kept less than everything
    assert(resA.nQualityKept < resA.nInput - resA.nEval)
  }

  test("routed run (Skew.autoJoin on the cluster join-back) curates " +
    "identically to the fixed-plan run and records the route it took") {
    res // baseline run first
    val outR = java.nio.file.Files
      .createTempDirectory("graft-curation-routed").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outR, routeDedupJoin = true))
    // the router only changes the join's physical shape — every count
    // and the curated set itself must be identical to the baseline
    assert(r.copy(dedupJoinChoice = None) == res)
    val curA = spark.read.parquet(s"$out/curated").select("doc_id")
    val curB = spark.read.parquet(s"$outR/curated").select("doc_id")
    assert(curA.except(curB).count() == 0
      && curB.except(curA).count() == 0)
    // the run is self-describing about the route taken; at this scale
    // the kept-quality side is tiny, so the stats pass must broadcast
    assert(r.dedupJoinChoice.contains("broadcast"))
    // the un-routed baseline records no choice
    assert(res.dedupJoinChoice.isEmpty)
  }

  test("CCNet filter lever: curated docs come only from the allowed " +
    "perplexity buckets; the gate composes with the census keep") {
    res // baseline run first
    val outN = java.nio.file.Files
      .createTempDirectory("graft-curation-ccnet").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outN,
        ccnetKeepBuckets = Set("head", "middle")))
    // strictly tighter gate than the baseline
    assert(r.nQualityKept <= res.nQualityKept && r.nCurated > 0)
    // every curated doc sits in an allowed bucket
    val corpus = docs.filter(col("doc_id") % conf.evalModulus =!= 0)
    val buckets = graft.functions.Retrieval.ccnetBuckets(corpus)
      .collect().map(row => row.getLong(0) -> row.getString(3)).toMap
    val curated = spark.read.parquet(s"$outN/curated")
      .select("doc_id").collect().map(_.getLong(0))
    assert(curated.nonEmpty)
    curated.foreach { id =>
      assert(Set("head", "middle").contains(buckets.getOrElse(id, "?")),
        s"doc $id bucket ${buckets.get(id)}")
    }
    // tail docs that passed the census gate are exactly what was cut
    val expectKept = graft.functions.TextAnalysis.qualityVerdict(corpus)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0))
      .count(id => Set("head", "middle").contains(
        buckets.getOrElse(id, "?")))
    assert(r.nQualityKept == expectKept)
  }

  test("curriculum packing lever: same docs packed, shard order is " +
    "quality-descending") {
    res // baseline run first
    val outC = java.nio.file.Files
      .createTempDirectory("graft-curation-curr").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outC, curriculumPacking = true))
    val packed = spark.read.parquet(s"$outC/packed")
    val base = spark.read.parquet(s"$out/packed")
    // the same document set is packed — only the layout changes
    assert(packed.select("doc_id").except(base.select("doc_id"))
      .count() == 0)
    assert(base.select("doc_id").except(packed.select("doc_id"))
      .count() == 0)
    // every count equals the baseline — the window count is
    // order-invariant (seq_id = running-total div budget per shard)
    assert(r == res)
    // within each shard, start_tok order == (alpha_bp desc, doc_id)
    val q = graft.functions.TextAnalysis.qualityVerdict(
        docs.filter(col("doc_id") % conf.evalModulus =!= 0))
      .select(col("doc_id"), col("alpha_bp"))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    packed.select("source", "doc_id", "start_tok").collect()
      .groupBy(_.getString(0)).foreach { case (src, rows) =>
        val byLayout = rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
        val byCurric = rows.map(_.getLong(1))
          .sortBy(id => (10000L - q.getOrElse(id, 0L), id)).toSeq
        assert(byLayout == byCurric, s"shard $src not curriculum-ordered")
      }
    // the lever refuses a mixed stream (the schedule owns the order)
    intercept[IllegalArgumentException] {
      CurationPipeline.run(spark, docs, conf.copy(
        outputDir = outC + "2", curriculumPacking = true,
        mixWeightsHundredths = Map("src0" -> 200)))
    }
  }

  test("versioned landing lever: same curated set, every run readable " +
    "by version, re-run commits a new snapshot") {
    res // baseline run first (shares the warm session)
    import graft.sources.VersionedTable
    val outV = java.nio.file.Files
      .createTempDirectory("graft-curation-vt").toString
    val a = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outV, versionedCurated = true))
    assert(a.curatedVersion.contains(0L))
    // the committed snapshot is the same curated set as the plain run
    val curV = VersionedTable.readAsOf(spark, s"$outV/curated", 0)
      .select("doc_id")
    val curP = spark.read.parquet(s"$out/curated").select("doc_id")
    assert(curV.except(curP).count() == 0
      && curP.except(curV).count() == 0)
    // every other count matches the baseline
    assert(a.copy(curatedVersion = None) == res)
    // re-run: identical curated set lands as version 1; v0 unchanged
    val b = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outV, versionedCurated = true))
    assert(b.curatedVersion.contains(1L))
    val v0 = VersionedTable.readAsOf(spark, s"$outV/curated", 0)
      .select("doc_id")
    val v1 = VersionedTable.readAsOf(spark, s"$outV/curated", 1)
      .select("doc_id")
    assert(v0.except(v1).count() == 0 && v1.except(v0).count() == 0)
    assert(VersionedTable.history(spark, s"$outV/curated")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((0L, "overwrite"), (1L, "overwrite")))
    // the plain baseline records no version
    assert(res.curatedVersion.isEmpty)
  }

  test("PII scrub lever: the run equals the manual redact-then-curate " +
    "composition and reports the flagged count") {
    res // baseline run first (shares the warm session)
    import graft.functions.Pii
    val enriched = Pii.withSyntheticPii(docs)
    val outA = java.nio.file.Files
      .createTempDirectory("graft-curation-pii").toString
    val a = CurationPipeline.run(spark, enriched,
      conf.copy(outputDir = outA, redactPii = true))
    // manual composition: scrub exactly what the lever scrubs — the
    // NON-eval docs (the eval side feeds decontamination unredacted
    // either way) — then run with the lever off
    val preRedacted = enriched.withColumn("text",
      when(col("doc_id") % conf.evalModulus =!= 0,
        Pii.redactCol(col("text"))).otherwise(col("text")))
    val outB = java.nio.file.Files
      .createTempDirectory("graft-curation-pii-manual").toString
    val b = CurationPipeline.run(spark, preRedacted,
      conf.copy(outputDir = outB))
    assert(a.copy(nPiiFlagged = None) == b)
    val curA = spark.read.parquet(s"$outA/curated")
    val curB = spark.read.parquet(s"$outB/curated")
    assert(curA.except(curB).count() == 0
      && curB.except(curA).count() == 0)
    // flagged count = corpus docs the scanner hits on the enriched input
    val expected = Pii.scan(
        enriched.filter(col("doc_id") % conf.evalModulus =!= 0))
      .filter(col("has_pii")).count()
    assert(a.nPiiFlagged.contains(expected) && expected > 0)
    // the curated text carries zero residual matches
    assert(Pii.scan(curA).filter(col("has_pii")).count() == 0)
    // the un-levered baseline reports no PII metric
    assert(res.nPiiFlagged.isEmpty)
  }

  test("BPE-tokenized packing: the pipeline's layout equals the manual " +
    "train+encode+join+pack composition and self-describes its rounds") {
    res // baseline run first (shares the warm session)
    val outB = java.nio.file.Files
      .createTempDirectory("graft-curation-bpe").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outB, bpeTokenizerRounds = Some(3)))
    assert(r.bpeRounds.contains(3) && res.bpeRounds.isEmpty)
    // curation itself is untouched by the packer's token source (only
    // the window count moves with the token metric)
    assert(r.copy(bpeRounds = None, nWindows = res.nWindows) == res)
    // manual composition over the same curated corpus
    val landed = spark.read.parquet(s"$outB/curated")
    val counts = graft.functions.Bpe.encode(landed, 3)
      .select(col("doc_id"), col("n_tokens").as("bpe_tokens"))
    val want = graft.functions.Mixing.packSequences(
        landed.join(counts, Seq("doc_id"), "left")
          .withColumn("bpe_tokens", coalesce(col("bpe_tokens"), lit(0L))),
        conf.packBudget, shardCol = "source", orderCol = "doc_id",
        tokenCol = Some("bpe_tokens"))
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(s"$outB/packed")
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // and the BPE layout genuinely differs from the whitespace layout
    // (subword counts exceed word counts at 3 merge rounds)
    val ws = spark.read.parquet(s"$out/packed")
      .agg(sum("n_tokens")).head.getLong(0)
    val bpe = spark.read.parquet(s"$outB/packed")
      .agg(sum("n_tokens")).head.getLong(0)
    assert(bpe > ws, s"bpe=$bpe should exceed whitespace=$ws")
  }

  test("DSIR selection lever: the packed stream is built from the " +
    "selected subset, equal to the manual score+sample composition, " +
    "and the run self-describes the count") {
    res // baseline first
    val outD = java.nio.file.Files
      .createTempDirectory("graft-curation-dsir").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outD, dsirTargetLang = Some("en"),
        dsirPerSourceK = 3))
    // curation stages before the lever are untouched
    assert(r.nCurated == res.nCurated && r.nBalanced == res.nBalanced)
    assert(res.nDsirSelected.isEmpty)
    // manual composition over the same landed corpus
    val landed = spark.read.parquet(s"$outD/curated")
    val imp = graft.functions.TextAnalysis.dsirImportance(
      landed, col("lang") === "en")
    val weighted = landed.join(imp, Seq("doc_id"), "left")
      .withColumn("dsir_w", exp(greatest(least(
        coalesce(col("importance_micro"), lit(0L)) / lit(1e6),
        lit(50.0)), lit(-50.0))))
    val wantIds = graft.functions.TextAnalysis.weightedSample(
        weighted, "doc_id", "dsir_w", "source", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r.nDsirSelected.contains(wantIds.size.toLong))
    val packedIds = spark.read.parquet(s"$outD/packed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(packedIds == wantIds)
    // the lever is a real gate at k=3 per source
    assert(wantIds.size < res.nBalanced)
  }

  test("UniMax budget lever: the run equals the manual allocation-to-" +
    "weights mixture and self-describes the weights it chose") {
    res // baseline run first (shares the warm session)
    val outU = java.nio.file.Files
      .createTempDirectory("graft-curation-unimax").toString
    val r = CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outU, unimaxBudgetTokens = Some(3000L)))
    val weights = r.unimaxWeights.get
    assert(weights.nonEmpty && weights.values.forall(_ >= 1))
    assert(res.unimaxWeights.isEmpty)
    // the same weights handed to the ordinary mixing lever reproduce
    // the exact packed layout — one schedule machinery, two authorities
    val outM = java.nio.file.Files
      .createTempDirectory("graft-curation-unimax-manual").toString
    CurationPipeline.run(spark, docs,
      conf.copy(outputDir = outM, mixWeightsHundredths = weights))
    def packed(o: String) = spark.read.parquet(s"$o/packed")
      .select("doc_id", "epoch", "seq_id", "seq_offset")
      .collect().map(_.toSeq).toSet
    assert(packed(outU) == packed(outM))
    // both authorities at once is refused loudly
    intercept[IllegalArgumentException] {
      CurationPipeline.run(spark, docs, conf.copy(
        outputDir = outU, unimaxBudgetTokens = Some(3000L),
        mixWeightsHundredths = Map("src0" -> 100)))
    }
  }

  test("re-running the pipeline is idempotent (same curated set)") {
    val first = spark.read.parquet(s"$out/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val res2 = CurationPipeline.run(spark, docs, conf)
    spark.catalog.refreshByPath(s"$out/curated")
    val second = spark.read.parquet(s"$out/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(res2.nCurated == res.nCurated && first == second)
  }
}
