package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture construction: pack documents into fixed token-budget
  * context windows and weighted-interleave corpus shards into a
  * deterministic training order. These are the two steps between a cleaned
  * corpus (dedup/quality output) and the tokenizer: decide each document's
  * position in the token stream, and decide how often each shard appears.
  *
  * Both are exact integer arithmetic end-to-end (no RNG, no floats), so
  * reruns are reproducible shard-by-shard and results are verifiable in any
  * SQL engine. Scale posture: one shuffle on the shard column each (the
  * per-shard window), nothing global — the 100 TB shape is "each shard's
  * token stream is independent", which is also what lets a 1000-executor
  * cluster write shards concurrently.
  */
object Mixing {

  /** Contiguous (GPT-style) sequence packing: within each shard, documents
    * are laid out back-to-back in `orderCol` order into one token stream;
    * window w of that stream holds tokens [w*budget, (w+1)*budget).
    * Documents straddle window boundaries — nothing is padded or dropped.
    * Emits per doc: token count, stream start offset, the window the doc
    * starts in (`seq_id`), and the offset inside that window.
    *
    * Plan: one shuffle on `shardCol`, then a running-sum window and four
    * map-side projections. No global sort — shards pack independently,
    * which is the property that keeps this embarrassingly parallel at
    * cluster scale.
    */
  def packSequences(docs: DataFrame, budget: Int,
                    shardCol: String = "source",
                    orderCol: String = "doc_id",
                    tokenCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // ROWS frame, not the default RANGE frame: with RANGE, rows tied on
    // `orderCol` would all receive the full peer-group sum and silently
    // overlap their start_tok offsets. With ROWS the layout is still
    // deterministic only if `orderCol` is unique within a shard (ties
    // would pack in an engine-chosen order) — callers must pass a
    // per-shard-unique order column such as the default doc_id.
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      // tokenCol routes a REAL tokenizer's counts into the layout (e.g.
      // Bpe.encode's n_tokens — the pack budget is then model tokens,
      // not whitespace tokens); default stays the whitespace census
      .withColumn("n_tokens", tokenCol match {
        case Some(c) => col(c).cast("long")
        case None => TextAnalysis.tokenCount(col("text")).cast("long")
      })
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer div/mod, not floating division: start_tok is a token
      // offset that reaches ~1e13 on a 100 TB corpus shard.
      .withColumn("seq_id", expr(s"start_tok div ${budget}L"))
      .withColumn("seq_offset", expr(s"start_tok % ${budget}L"))
  }

  /** Incremental sequence packing: extend a STANDING packed layout with
    * a new batch of documents without re-reading (or re-windowing) the
    * packed history — the packed-layout member of the incremental
    * standing-artifact family (near-dup index, ANN quantizer, inverted
    * index, profile state, SCD2 dimension).
    *
    * State per shard is ONE number — the total tokens already laid out
    * (max(start_tok + n_tokens), exact because the stream is
    * contiguous) — so the batch packs per-shard with that base offset
    * and unions on: incremental ≡ full rebuild whenever the batch
    * respects the append contract (every batch `orderCol` greater than
    * every standing one within its shard — a daily drop). At scale the
    * union is logical: a caller lands only the batch rows as a new
    * partition next to the standing parquet.
    *
    * Plan: the base-offset aggregate is shard-cardinality (broadcast);
    * only the BATCH flows through a window. */
  def applyPackBatch(standing: DataFrame, batch: DataFrame, budget: Int,
                     shardCol: String = "source",
                     orderCol: String = "doc_id"): DataFrame = {
    val base = standing.groupBy(col(shardCol))
      .agg(max(col("start_tok") + col("n_tokens")).as("_base"))
    standing.unionByName(
      packSequences(batch, budget, shardCol, orderCol)
        .join(broadcast(base), Seq(shardCol), "left")
        .withColumn("start_tok",
          col("start_tok") + coalesce(col("_base"), lit(0L)))
        .withColumn("seq_id", expr(s"start_tok div ${budget}L"))
        .withColumn("seq_offset", expr(s"start_tok % ${budget}L"))
        .drop("_base"))
  }

  /** Sub-sharding column for skewed corpora: when one source holds most
    * of the data, packing (or any per-shard window) serializes on that
    * shard's partition. Deriving the shard as (source, md5-bucket mod n)
    * bounds every shard to ~1/n of its source with full determinism —
    * the token streams stay contiguous WITHIN each sub-shard, which is
    * what training shards need; there is deliberately no cross-sub-shard
    * order to preserve. Usage:
    * `packSequences(docs.withColumn("shard", subShard(col("source"),
    * col("doc_id"), 16)), budget, shardCol = "shard")`. */
  def subShard(shardCol: Column, keyCol: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    concat_ws("#", shardCol,
      pmod(TextAnalysis.hashBucket(keyCol), lit(buckets)))
  }

  /** Deterministic weighted corpus mixture (The-Pile-style sampling
    * weights): each shard gets a weight in hundredths of an epoch
    * (250 = 2.5 passes, 50 = half a pass). Every document is emitted
    * floor(w/100) times always; the fractional epoch keeps the documents
    * whose md5 bucket of (key ":" epoch) falls under w%100 — the same
    * hash-bucket discipline as [[TextAnalysis.stratifiedSample]], so the
    * subset is reproducible and rerun-stable.
    *
    * Each copy carries a stride-scheduling key `sched_t`: the k-th emission
    * of a shard is scheduled at virtual time (k+1)*10000/w, so shards
    * appear in the merged order with frequency proportional to their
    * weight, and a document's epoch copies land maximally far apart
    * (k = epoch*shardSize + rankInShard). Ordering the union by
    * (sched_t, shard, key) IS the training order — no global row_number is
    * materialized, so producing sharded output stays a local sort per
    * output partition rather than a global total-order shuffle.
    *
    * Plan: one shuffle on `shardCol` (rank + count windows), then the
    * epoch fan-out is a generator and the keep/schedule logic is per-row
    * projections — map-side, RNG-free.
    */
  def mixCorpus(docs: DataFrame, weightsHundredths: Map[String, Int],
                defaultWeightHundredths: Int = 100,
                shardCol: String = "source",
                keyCol: String = "doc_id"): DataFrame = {
    require(defaultWeightHundredths > 0, "default weight must be positive")
    weightsHundredths.foreach { case (s, w) =>
      require(w > 0, s"weight for $s must be positive, got $w")
    }
    val weight = weightsHundredths.foldLeft(lit(defaultWeightHundredths)) {
      case (acc, (value, w)) =>
        when(col(shardCol) === value, lit(w)).otherwise(acc)
    }
    val byShard = Window.partitionBy(shardCol).orderBy(keyCol)
    // internals carry a prefix so user columns named w/rn0/n survive
    docs
      .withColumn("_mix_w", weight)
      .withColumn("_mix_rn0", row_number().over(byShard).cast("long") - 1L)
      .withColumn("_mix_n", count(lit(1))
        .over(Window.partitionBy(shardCol)))
      // epochs 0 .. ceil(w/100)-1; the last (fractional) epoch is filtered
      // per-document below.
      .withColumn("epoch",
        explode(sequence(lit(0),
          expr("cast((_mix_w + 99) div 100 - 1 as int)"))))
      .filter(expr("epoch < _mix_w div 100").or(
        TextAnalysis.hashBucket(
          concat_ws(":", col(keyCol), col("epoch"))) < expr("_mix_w % 100")))
      .withColumn("sched_t",
        expr("(epoch * _mix_n + _mix_rn0 + 1) * 10000L div _mix_w"))
      .drop("_mix_w", "_mix_rn0", "_mix_n")
  }

  /** The skew lever for [[mixCorpus]]: its rank/count windows serialize
    * on a dominant shard exactly the way packing does, so this variant
    * runs them on [[subShard]]-split shards (each bounded to ~1/n of its
    * source) while weights stay keyed on the ORIGINAL shard value.
    *
    * What is preserved exactly — the WEIGHT semantics: a document's
    * replication count and fractional-epoch keep decision depend only on
    * (key, epoch, weight), so the emitted (shard, key, epoch) multiset is
    * IDENTICAL to the unsharded run (MixingSpec pins this). What changes:
    * `sched_t` is a per-sub-shard stride schedule — each sub-shard is its
    * own independent training stream, the same contract sub-sharded
    * packing has (there is deliberately no cross-sub-shard order). */
  def mixCorpusSharded(docs: DataFrame, weightsHundredths: Map[String, Int],
                       subShards: Int,
                       defaultWeightHundredths: Int = 100,
                       shardCol: String = "source",
                       keyCol: String = "doc_id"): DataFrame = {
    require(subShards > 0, s"subShards must be positive, got $subShards")
    val expanded = weightsHundredths.flatMap { case (s, w) =>
      (0 until subShards).map(b => s"$s#$b" -> w)
    }
    mixCorpus(
      docs.withColumn("_mix_subshard",
        subShard(col(shardCol), col(keyCol), subShards)),
      expanded, defaultWeightHundredths, "_mix_subshard", keyCol)
      .drop("_mix_subshard")
  }

  /** Overlapping context windows (the sliding-window chunking long-
    * context pipelines feed to embedders and rerankers): per document,
    * token windows of `window` words starting every `stride` words —
    * consecutive windows overlap by (window − stride) words, so no span
    * falls on a boundary unseen. The final window may be shorter (the
    * document's tail is emitted, never dropped); an empty document
    * yields no windows. Whitespace normalizes to single spaces.
    *
    * Emits (id, win_id, start_tok, n_win_tokens, window_text); win_id
    * counts from 0 in stride order.
    *
    * Scale posture: pure map-side — one `sequence`+`posexplode` over
    * each document's own token array, zero shuffles, zero joins; the
    * operator is embarrassingly parallel at any corpus size (output
    * volume is the input × overlap factor, the price the technique
    * itself chose). */
  def slidingWindows(docs: DataFrame, window: Int, stride: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    docs.select(col(idCol), toks.as("w"))
      .select(col(idCol), col("w"),
        // starts: 0, stride, 2·stride, … while start < n_tokens
        // (empty docs guarded — sequence(0,-1) would count backwards)
        posexplode(when(size(col("w")) === 0,
            array().cast("array<int>"))
          .otherwise(sequence(lit(0),
            floor((size(col("w")) - 1) / lit(stride)).cast("int")
              * stride, lit(stride)))))
      .select(col(idCol), col("pos").cast("long").as("win_id"),
        col("col").cast("long").as("start_tok"),
        least(lit(window), size(col("w")) - col("col"))
          .cast("long").as("n_win_tokens"),
        concat_ws(" ", slice(col("w"), col("col") + 1, lit(window)))
          .as("window_text"))
  }

  /** SFT example packing with loss-mask spans — the instruction-tuning
    * face of [[packSequences]] (the TRL packed-SFT layout: examples
    * concatenate contiguously, boundaries carried as metadata, the
    * trainer masks loss outside completions). Each document becomes one
    * example: prompt = first ⌊n/3⌋ words (≥ 1), completion = the rest,
    * template overhead = 3 specials (bos, prompt/completion separator,
    * eos), so example length = n_words + 3. The loss mask covers the
    * completion + eos: absolute stream span [start_tok + prompt_tokens
    * + 2, start_tok + n_tokens). Empty documents yield no example.
    *
    * Layout inherits packSequences exactly (one shard shuffle + running
    * sum; docs straddle window boundaries — the packed-attention trainer
    * resets attention at mask boundaries, nothing pads or drops). */
  def packSft(docs: DataFrame, budget: Int,
              shardCol: String = "source",
              orderCol: String = "doc_id"): DataFrame = {
    val base = docs
      .withColumn("n_words", TextAnalysis.tokenCount(col("text"))
        .cast("long"))
      .filter(col("n_words") > 0)
      .withColumn("prompt_tokens",
        greatest(lit(1L), expr("n_words div 3")))
      .withColumn("example_tokens", col("n_words") + lit(3L))
    packSequences(base, budget, shardCol, orderCol,
        tokenCol = Some("example_tokens"))
      .withColumn("mask_start",
        col("start_tok") + col("prompt_tokens") + lit(2L))
      .withColumn("mask_end", col("start_tok") + col("n_tokens"))
  }

  /** UniMax token-budget allocation (Chung et al. 2023, arXiv:2304.09151):
    * split a training budget across sources as uniformly as possible while
    * capping every source at `epochCap` passes over its data — the
    * language/source-balancing rule that replaces ad-hoc temperature
    * sampling. This is exact waterfilling: alloc_i = min(capacity_i,
    * level) with capacity_i = epochCap·tokens_i and the unique level at
    * which the budget is spent, found in closed form on the
    * capacity-sorted prefix sums (source j is fully capped iff
    * c_j·(n−j+1) + prefix_{j−1} ≤ B — monotone in j, so the break point
    * is one flagged max).
    *
    * All arithmetic is int64 with floor division (the level underfills by
    * < n_sources tokens — documented, deterministic). The source table is
    * a bounded dim, so the rank/prefix windows are global-on-a-dim (the
    * same contract as every 1-row-stats pattern here); the break-point
    * scalars reduce to ONE row and broadcast back via crossJoin — no
    * driver read.
    *
    * Input: (srcCol, tokensCol) one row per source. Output per source:
    * tokens, capacity, alloc_tokens, epochs_bp (alloc/tokens in basis
    * points). */
  def unimaxAllocation(counts: DataFrame, budgetTokens: Long,
                       epochCap: Int, srcCol: String = "source",
                       tokensCol: String = "tokens"): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(epochCap > 0, s"epochCap must be positive, got $epochCap")
    // BOUNDED single-partition window: `counts` is one row per SOURCE
    // (a bounded dim — tens, not rows-of-corpus) by the input contract
    // above; Round12Spec pins output rows == |sources| and
    // Bounded.globalWindowFrame enforces the dim bound at runtime
    val byCap = Window.orderBy(col("capacity"), col(srcCol))
    val ranked = Bounded.globalWindowFrame(
        counts.select(col(srcCol), col(tokensCol).cast("long").as("tokens")),
        maxRows = 10000, contract = "unimaxAllocation source dim")
      .withColumn("capacity", col("tokens") * epochCap)
      .withColumn("rn", row_number().over(byCap).cast("long"))
      .withColumn("prefix", sum(col("capacity")).over(
        byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .withColumn("capped",
        col("capacity") * (col("n") - col("rn") + 1L) +
          (col("prefix") - col("capacity")) <= budgetTokens)
    val break_ = ranked.agg(
      max(when(col("capped"), col("rn")).otherwise(0L)).as("jstar"),
      max(when(col("capped"), col("prefix")).otherwise(0L)).as("prefix_j"),
      max(col("n")).as("nsrc"))
    ranked.crossJoin(broadcast(break_))
      .withColumn("level",
        when(col("nsrc") > col("jstar"),
          expr(s"($budgetTokens - prefix_j) div (nsrc - jstar)"))
          .otherwise(col("capacity")))
      .withColumn("alloc_tokens",
        when(col("rn") <= col("jstar"), col("capacity"))
          .otherwise(least(col("capacity"), col("level"))))
      .withColumn("epochs_bp",
        expr("alloc_tokens * 10000 div tokens"))
      .select(col(srcCol), col("tokens"), col("capacity"),
        col("alloc_tokens"), col("epochs_bp"))
  }
}
