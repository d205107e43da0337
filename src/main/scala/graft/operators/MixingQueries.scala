package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Corpus curation and layout: stratified/weighted/quota sampling, sequence packing, corpus mixing, z-order/Hilbert layout, manifests, curation pipeline.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object MixingQueries {

  val all: Seq[Q] = Seq(

    Q("q64_stratified_sample",
      (s, dir) => TextAnalysis.stratifiedSample(
        Tables.load(s, dir, "documents"), keyCol = "doc_id",
        stratumCol = "lang", rates = Map("en" -> 40, "de" -> 70),
        defaultRate = 100)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |        ::BIGINT % 100
             |      < (CASE WHEN lang = 'en' THEN 40
             |              WHEN lang = 'de' THEN 70 ELSE 100 END)
             |ORDER BY doc_id""".stripMargin)),

    // Contiguous sequence packing (tokenizer feed): per-source token
    // stream, 512-token context windows, docs straddle boundaries. One
    // shuffle on source + a running-sum window; integer div/mod so the
    // layout is exact at any corpus size. Shards pack independently —
    // the property that keeps this embarrassingly parallel at 100 TB.

    Q("q65_pack_sequences",
      (s, dir) => Mixing.packSequences(
        Tables.load(s, dir, "documents"), budget = 512)
        .select("doc_id", "source", "n_tokens", "start_tok",
          "seq_id", "seq_offset")
        .orderBy("source", "doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE length(string_split_regex(trim(text),
             |                                             '\s+')) END
             |           AS BIGINT) AS n_tokens
             |  FROM documents
             |), cum AS (
             |  SELECT doc_id, source, n_tokens,
             |         CAST(SUM(n_tokens) OVER (PARTITION BY source
             |           ORDER BY doc_id) - n_tokens AS BIGINT) AS start_tok
             |  FROM toks
             |)
             |SELECT doc_id, source, n_tokens, start_tok,
             |       start_tok // 512 AS seq_id,
             |       start_tok % 512 AS seq_offset
             |FROM cum ORDER BY source, doc_id""".stripMargin)),

    // Weighted corpus mixture: per-shard epoch weights in hundredths
    // (src0 2.5 epochs, src1 0.5, src3 1.3), fractional epochs kept by
    // md5 hash bucket (reproducible, RNG-free), stride-scheduling key
    // interleaves shards proportionally to weight without materializing
    // a global row_number. One shuffle on source; fan-out is a
    // generator; keep/schedule logic is map-side integer arithmetic.
    // Skew lever: Mixing.mixCorpusSharded runs the same model over
    // subShard-split shards (identical emissions, MixingSpec-pinned)
    // when one source dominates the per-shard windows.

    Q("q66_corpus_mix",
      (s, dir) => Mixing.mixCorpus(Tables.load(s, dir, "documents"),
        weightsHundredths =
          Map("src0" -> 250, "src1" -> 50, "src3" -> 130),
        defaultWeightHundredths = 100)
        .select("doc_id", "source", "epoch", "sched_t")
        .orderBy("sched_t", "source", "doc_id", "epoch"),
      Some("""WITH rn AS (
             |  SELECT doc_id, source,
             |         CASE WHEN source = 'src0' THEN 250
             |              WHEN source = 'src1' THEN 50
             |              WHEN source = 'src3' THEN 130
             |              ELSE 100 END AS w,
             |         ROW_NUMBER() OVER (PARTITION BY source
             |           ORDER BY doc_id) - 1 AS rn0,
             |         COUNT(*) OVER (PARTITION BY source) AS n
             |  FROM documents
             |), cop AS (
             |  SELECT rn.*, unnest(generate_series(0,
             |           (w + 99) // 100 - 1)) AS epoch
             |  FROM rn
             |)
             |SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch,
             |       CAST((epoch * n + rn0 + 1) * 10000 // w AS BIGINT)
             |         AS sched_t
             |FROM cop
             |WHERE epoch < w // 100
             |   OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |         CAST(epoch AS VARCHAR)), 1, 8))::BIGINT % 100
             |      < w % 100
             |ORDER BY sched_t, source, doc_id, epoch""".stripMargin)),

    // Incremental near-dup: today's batch (doc_id%10==7) scored against
    // the standing corpus index + earlier batch docs. The index side is
    // probed by broadcast and never shuffles — the daily cost is
    // O(batch), not O(corpus). Oracle = the full-corpus LSH pipeline
    // restricted to pairs touching the batch, which is semantically
    // identical because band collision is symmetric.

    Q("q73_curated_corpus",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val nonEval = docs.filter(col("doc_id") % 17 =!= 0)
        val quality = TextAnalysis.qualityVerdict(nonEval)
          .filter(col("keep")).select("doc_id")
        val drop = clustersTable(s, dir)
          .filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id"))
        val survivors = quality.join(broadcast(drop), Seq("doc_id"),
          "left_anti")
        Dedup.contamination(
          docs.join(survivors, Seq("doc_id"), "left_semi"),
          docs.filter(col("doc_id") % 17 === 0))
          .filter(col("n_contaminated") === 0)
          .select("doc_id")
          .orderBy("doc_id")
      },
      Some(neardupScoredCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, pairs AS (
          |  SELECT id_a, id_b FROM scored WHERE jaccard_bp >= 2000
          |), edges AS (
          |  SELECT id_a AS src, id_b AS dst FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs
          |), walk(id, reach) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
          |), comp AS (
          |  SELECT id, MIN(reach) AS comp FROM walk GROUP BY id
          |), qd AS (
          |  SELECT doc_id, text,
          |         list_filter(string_split_regex(text, '\s+'),
          |                     x -> len(x) > 0) AS ws
          |  FROM documents
          |), qtok AS (
          |  SELECT doc_id, unnest(ws) AS w FROM qd
          |), qwc AS (
          |  SELECT doc_id, w, COUNT(*) AS c FROM qtok GROUP BY doc_id, w
          |), qwords AS (
          |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
          |         round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6)
          |           AS top_word_frac
          |  FROM qwc GROUP BY doc_id
          |), qkeep AS (
          |  SELECT qd.doc_id
          |  FROM qd LEFT JOIN qwords qw ON qd.doc_id = qw.doc_id
          |  WHERE COALESCE(qw.n_words, 0) >= 10
          |    AND COALESCE(qw.n_words, 0) <= 5000
          |    AND CASE WHEN length(qd.text) = 0 THEN 0
          |         ELSE floor(length(regexp_replace(qd.text,
          |                '[^A-Za-z]', '', 'g')) * 10000.0
          |              / length(qd.text)) END >= 5000
          |    AND NOT COALESCE(qw.top_word_frac > 0.3, false)
          |), evalh AS (
          |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0
          |), dirty AS (
          |  SELECT DISTINCT d.doc_id
          |  FROM sh d JOIN evalh e ON d.shingle = e.shingle
          |  WHERE d.doc_id % 17 <> 0
          |)
          |SELECT d0.doc_id FROM documents d0
          |WHERE d0.doc_id % 17 <> 0
          |  AND d0.doc_id IN (SELECT doc_id FROM qkeep)
          |  AND d0.doc_id NOT IN (SELECT id FROM comp WHERE id <> comp)
          |  AND d0.doc_id NOT IN (SELECT doc_id FROM dirty)
          |ORDER BY d0.doc_id""".stripMargin)),

    // Fixed-boundary FNV chunk fingerprints: the oracle-checkable face of
    // the q49 chunking kernel. q49's rolling-hash BOUNDARIES are
    // engine-specific (rows-only), but its FNV-1a fingerprint function is
    // not — this twin recomputes the exact fingerprints in DuckDB via a
    // recursive per-byte FNV fold (HUGEINT mod-2^64 arithmetic; the
    // fixture is ASCII so ascii(substring(…)) IS the UTF-8 byte), pinning
    // the kernel the way q52 pins SimHash. RollingHashSpec additionally
    // ties the two expressions to the same fnv() on boundary-free docs.

    Q("q74_chunk_fnv_portable",
      (s, dir) => Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          posexplode(Dedup.fixedChunks(col("text"), chunkSize = 64)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH RECURSIVE idx AS (
             |  SELECT doc_id, text,
             |         CAST(unnest(generate_series(0,
             |           (length(text) - 1) // 64)) AS BIGINT) AS chunk_idx
             |  FROM documents WHERE length(text) > 0
             |), chunks AS (
             |  SELECT doc_id, chunk_idx,
             |         substring(text, chunk_idx * 64 + 1, 64) AS chunk
             |  FROM idx
             |), fnv(doc_id, chunk_idx, chunk, pos, h) AS (
             |  SELECT doc_id, chunk_idx, chunk, 0,
             |         14695981039346656037::HUGEINT FROM chunks
             |  UNION ALL
             |  SELECT doc_id, chunk_idx, chunk, pos + 1,
             |    (xor(h::UBIGINT,
             |         ascii(substring(chunk, pos + 1, 1))::UBIGINT)::HUGEINT
             |       * 1099511628211::HUGEINT)
             |      % 18446744073709551616::HUGEINT
             |  FROM fnv WHERE pos < length(chunk)
             |)
             |SELECT doc_id, chunk_idx,
             |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
             |            THEN h - 18446744073709551616::HUGEINT
             |            ELSE h END AS BIGINT) AS chunk_hash
             |FROM fnv WHERE pos = length(chunk)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // BM25 lexical retrieval — shuffle-free scoring: per-term tf and doc
    // length are HOF projections over the token array (no explode), the
    // only aggregation is ONE global one-row reduce (N, Σdl, per-term df)
    // broadcast back via the scalar-subquery pattern. avgdl enters as
    // Σdl/N — two exact integers divided once — so the double math is a
    // fixed sequence of IEEE ops both engines perform identically.

    Q("q90_encode_tokens",
      (s, dir) => Retrieval.encodeTokens(Tables.load(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(text)),
             |           '\s+'), w -> len(w) > 0) AS ws
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, generate_subscripts(ws, 1) AS i,
             |         unnest(ws) AS t
             |  FROM d
             |), tf AS (
             |  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM tr GROUP BY t
             |), vocab AS (
             |  SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY n DESC,
             |           term) AS INTEGER) AS token_id
             |  FROM tf
             |), enc AS (
             |  SELECT tr.doc_id, tr.i, v.token_id
             |  FROM tr JOIN vocab v ON v.term = tr.t
             |)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |       string_agg(CAST(token_id AS VARCHAR), ','
             |         ORDER BY i) AS ids
             |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Tokenizer-feed capstone: q90's encoding joined against q65's
    // packed layout in ONE plan — each non-empty document carries its
    // context-window coordinates (seq_id, seq_offset) AND its id
    // sequence's head. The two independent token counts (pack side:
    // whitespace tokenCount; encode side: vocabulary-join cardinality)
    // are both emitted, so the hash check pins their equality — the
    // invariant that makes the packed offsets valid for the encoded
    // stream.

    Q("q91_tokenizer_feed",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val packed = Mixing.packSequences(docs, budget = 512)
          .select(col("doc_id"), col("source"),
            col("n_tokens").as("pack_tokens"), col("seq_id"),
            col("seq_offset"))
        val enc = Retrieval.encodeTokens(docs)
        packed.join(enc, Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("seq_id"),
            col("seq_offset"), col("pack_tokens"), col("n_tokens"),
            split(col("ids"), ",").getItem(0).cast("int").as("first_id"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE length(string_split_regex(trim(text),
             |                                             '\s+')) END
             |           AS BIGINT) AS n_tokens
             |  FROM documents
             |), cum AS (
             |  SELECT doc_id, source, n_tokens,
             |         CAST(SUM(n_tokens) OVER (PARTITION BY source
             |           ORDER BY doc_id) - n_tokens AS BIGINT)
             |           AS start_tok
             |  FROM toks
             |), d AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(text)),
             |           '\s+'), w -> len(w) > 0) AS ws
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, generate_subscripts(ws, 1) AS i,
             |         unnest(ws) AS t
             |  FROM d
             |), tf AS (
             |  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM tr GROUP BY t
             |), vocab AS (
             |  SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY n DESC,
             |           term) AS INTEGER) AS token_id
             |  FROM tf
             |), enc AS (
             |  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS enc_tokens,
             |         MIN(CASE WHEN tr.i = 1 THEN v.token_id END)
             |           AS first_id
             |  FROM tr JOIN vocab v ON v.term = tr.t
             |  GROUP BY tr.doc_id
             |)
             |SELECT c.doc_id, c.source,
             |       c.start_tok // 512 AS seq_id,
             |       c.start_tok % 512 AS seq_offset,
             |       c.n_tokens AS pack_tokens, e.enc_tokens AS n_tokens,
             |       CAST(e.first_id AS INTEGER) AS first_id
             |FROM cum c JOIN enc e ON e.doc_id = c.doc_id
             |ORDER BY c.doc_id""".stripMargin)),

    // Incremental inverted-index maintenance: the standing index (built
    // once over the historical corpus, memoized) merges with a new
    // batch's index by count addition + k-min posting union — a
    // vocabulary-sized join, the historical corpus is never re-tokenized.
    // The ORACLE is the from-scratch full-corpus rebuild (q77's SQL
    // verbatim): merged ≡ rebuilt, hash-checked — MinKAgg's semilattice
    // property lifted to the table level.

    Q("q100_incremental_pack",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val standing = Tables.memoTable(s, dir, "packed_hist512") {
          Mixing.packSequences(docs.filter(col("doc_id") < 400),
            budget = 512)
        }
        Mixing.applyPackBatch(standing,
          docs.filter(col("doc_id") >= 400), budget = 512)
          .select("doc_id", "source", "n_tokens", "start_tok",
            "seq_id", "seq_offset")
          .orderBy("source", "doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE length(string_split_regex(trim(text),
             |                                             '\s+')) END
             |           AS BIGINT) AS n_tokens
             |  FROM documents
             |), cum AS (
             |  SELECT doc_id, source, n_tokens,
             |         CAST(SUM(n_tokens) OVER (PARTITION BY source
             |           ORDER BY doc_id) - n_tokens AS BIGINT) AS start_tok
             |  FROM toks
             |)
             |SELECT doc_id, source, n_tokens, start_tok,
             |       start_tok // 512 AS seq_id,
             |       start_tok % 512 AS seq_offset
             |FROM cum ORDER BY source, doc_id""".stripMargin)),

    // Incremental clustering — fold the q67 batch's incident pairs into
    // a standing component table built over the historical corpus only:
    // endpoints contract to their standing representative, the
    // iterative propagation runs over the batch-incident-sized
    // contracted graph, standing rows relabel through one join. History
    // pairs are never re-read. The ORACLE is the full-corpus rebuild
    // (q61's recursive transitive-closure SQL verbatim): applied ≡
    // rebuilt, hash-checked.

    Q("q107_quota_sample",
      (s, dir) => TextAnalysis.quotaSample(
          Tables.load(s, dir, "documents"), keyCol = "doc_id",
          stratumCol = "lang", quotas = Map("en" -> 50, "de" -> 30),
          defaultQuota = 20)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
             |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             |             1, 15))::BIGINT, doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= CASE WHEN lang = 'en' THEN 50
             |                 WHEN lang = 'de' THEN 30 ELSE 20 END
             |ORDER BY doc_id""".stripMargin)),

    // Sliding context windows (long-context chunking): 32-token windows
    // every 24 tokens — consecutive windows overlap by 8 so no span
    // falls on a boundary unseen; the tail window is emitted short.
    // Pure map-side (sequence + posexplode over each doc's own tokens):
    // zero shuffles, zero joins.

    Q("q112_weighted_sample",
      (s, dir) => TextAnalysis.weightedSample(
          Tables.load(s, dir, "documents"), keyCol = "doc_id",
          weightCol = "n_chars", stratumCol = "source", k = 5)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY
             |           CAST(floor(-ln(
             |             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             |               1, 15))::BIGINT + 1)
             |             / 1152921504606846976.0)
             |             / CAST(n_chars AS DOUBLE)
             |             * 1000000000000.0) AS BIGINT),
             |           doc_id) AS rk
             |  FROM documents WHERE n_chars > 0)
             |WHERE rk <= 5 ORDER BY doc_id""".stripMargin)),

    // Incremental heavy hitters: the frequency face of the incremental
    // standing-artifact family (q92 index / q95 profile / q100 pack /
    // q101 clusters). Standing per-day MG state + a batch slice's state
    // merge on the PODS-2012 step — state-sized work, events history
    // never re-read. event_type's domain is under capacity, so merged
    // ≡ rebuilt EXACTLY and the oracle is the full-history rebuild.

    Q("q114_bloom_semijoin",
      (s, dir) => {
        val sel = Tables.load(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997 &&
            month(col("o_orderdate")) === 3)
          .select("o_orderkey")
        BloomJoin.reducedSemiJoin(Tables.load(s, dir, "lineitem"),
            "l_orderkey", sel, "o_orderkey", numBits = 1 << 16,
            numHashes = 5)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
             |       CAST(SUM(CAST(floor(l_quantity) AS BIGINT))
             |         AS BIGINT) AS sum_qty
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders
             |  WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 3)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Champion-list RERANK (the verify stage of q105's candidate
    // generation): each candidate pair joins back to the full
    // per-document ltc weight vectors and re-scores over ALL shared
    // terms — one O(|a|+|b|) merge scan per pair (SortedStructDot
    // kernel), no per-pair hash map, no (pair × term) explode, and the
    // (term, doc) tf shuffle materializes once for both branches
    // (ReusedExchange). full_score_u ≥ champ_score_u by construction.

    Q("q117_zorder_stats",
      (s, dir) => Layout.zOrderBucketStats(
          Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          bucketBits = 6)
        .orderBy("bucket"),
      Some {
        val z = (0 until 16).flatMap(i => Seq(
          s"(((xn >> $i) & 1) << ${2 * i})",
          s"(((yn >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        s"""WITH k AS (
           |  SELECT l_partkey AS x, l_suppkey AS y FROM lineitem
           |), mm AS (
           |  SELECT MIN(x) AS mnx, MAX(x) AS mxx,
           |         MIN(y) AS mny, MAX(y) AS mxy
           |  FROM k
           |), s AS (
           |  SELECT x, y,
           |         CASE WHEN mxx = mnx THEN 0
           |              ELSE ((x - mnx) * 65535) // (mxx - mnx)
           |         END AS xn,
           |         CASE WHEN mxy = mny THEN 0
           |              ELSE ((y - mny) * 65535) // (mxy - mny)
           |         END AS yn
           |  FROM k CROSS JOIN mm
           |), z AS (
           |  SELECT x, y, ($z) AS zv FROM s
           |)
           |SELECT zv >> 26 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |       MIN(x) AS min_x, MAX(x) AS max_x,
           |       MIN(y) AS min_y, MAX(y) AS max_y
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Standing degree table maintained INCREMENTALLY (the node-level
    // member of the standing-artifact family: index q92, profile q95,
    // clusters q101, heavy hitters q113 — now degrees): the distinct
    // order–part edge set splits into three deterministic hash waves,
    // each folded into the standing table by count addition, and the
    // result hash-matches the oracle's one-shot degree aggregate over
    // the full graph. History is never re-aggregated.

    Q("q131_zorder3_stats",
      (s, dir) => Layout.zOrderBucketStats3(
          Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          "l_orderkey", bucketBits = 6)
        .orderBy("bucket"),
      Some {
        val m = (0 until 21).flatMap(i => Seq(
          s"(((xn >> $i) & 1) << ${3 * i})",
          s"(((yn >> $i) & 1) << ${3 * i + 1})",
          s"(((zn >> $i) & 1) << ${3 * i + 2})")).mkString(" + ")
        val sc = (1 << 21) - 1
        s"""WITH k AS (
           |  SELECT l_partkey AS x, l_suppkey AS y, l_orderkey AS z
           |  FROM lineitem
           |), mm AS (
           |  SELECT MIN(x) AS mnx, MAX(x) AS mxx,
           |         MIN(y) AS mny, MAX(y) AS mxy,
           |         MIN(z) AS mnz, MAX(z) AS mxz
           |  FROM k
           |), s AS (
           |  SELECT x, y, z,
           |         CASE WHEN mxx = mnx THEN 0
           |              ELSE ((x - mnx) * $sc) // (mxx - mnx)
           |         END AS xn,
           |         CASE WHEN mxy = mny THEN 0
           |              ELSE ((y - mny) * $sc) // (mxy - mny)
           |         END AS yn,
           |         CASE WHEN mxz = mnz THEN 0
           |              ELSE ((z - mnz) * $sc) // (mxz - mnz)
           |         END AS zn
           |  FROM k CROSS JOIN mm
           |), zc AS (
           |  SELECT x, y, z, ($m) AS mv FROM s
           |)
           |SELECT mv >> 57 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |       MIN(x) AS min_x, MAX(x) AS max_x,
           |       MIN(y) AS min_y, MAX(y) AS max_y,
           |       MIN(z) AS min_z, MAX(z) AS max_z
           |FROM zc GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // q121's PSI drift per SEGMENT (event type): a shift confined to
    // one type isn't averaged away by the stable rest. Same
    // factored-integer per-bin contributions; totals join per group,
    // never broadcast-hinted.

    Q("q135_zorder_incremental",
      (s, dir) => {
        // quantity/price have SCALE-INDEPENDENT domains (quantity
        // 1..50, price bounded by part retail prices) — exactly the
        // kind of column a fixed a-priori grid is declared for
        val li = Tables.load(s, dir, "lineitem")
        val wave = pmod(col("l_orderkey"), lit(3))
        (0 to 2).map(b => Layout.zOrderBucketStatsFixed(
            li.filter(wave === b), "l_quantity", "l_extendedprice",
            bucketBits = 6, xMin = 0L, xMax = 64L,
            yMin = 0L, yMax = 131072L))
          .reduce(Layout.mergeZOrderStats)
          .orderBy("bucket")
      },
      Some {
        val z = (0 until 16).flatMap(i => Seq(
          s"(((xn >> $i) & 1) << ${2 * i})",
          s"(((yn >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        s"""WITH k AS (
           |  SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
           |         CAST(floor(l_extendedprice) AS BIGINT) AS y
           |  FROM lineitem
           |), s AS (
           |  SELECT x, y,
           |         (LEAST(GREATEST(x, 0), 64) * 65535) // 64 AS xn,
           |         (LEAST(GREATEST(y, 0), 131072) * 65535)
           |           // 131072 AS yn
           |  FROM k
           |), z AS (
           |  SELECT x, y, ($z) AS zv FROM s
           |)
           |SELECT zv >> 26 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |       MIN(x) AS min_x, MAX(x) AS max_x,
           |       MIN(y) AS min_y, MAX(y) AS max_y
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // HNSW graph ANN (functions/Hnsw.scala) — the deterministic parts
    // oracled, the graph itself spec-gated (HnswSpec: recall@10 pin in
    // the approximate regime, layer-0 connectivity, incremental ≡
    // rebuilt row-for-row).
    //
    // q136: the portable level draw — geometric(p=1/4) from leading
    // base-4 hex digits of md5 — recomputed verbatim in DuckDB. This is
    // the only random-looking ingredient of the index; pinning it pins
    // the layer skeleton of every graph the builder can produce.

    Q("q170_corpus_datacard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val fp = docs.select(col("source"), col("doc_id"),
          md5(col("text")).as("fp"))
        val dupFp = fp.groupBy("fp").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).select("fp")
        val dupDocs = fp.join(dupFp, Seq("fp"), "left_semi")
          .groupBy("source").agg(count(lit(1)).as("n_dup_docs"))
        val verdict = TextAnalysis.qualityVerdict(docs)
          .select(col("doc_id"), col("n_words"), col("keep"))
        val base = docs.select(col("doc_id"), col("source"),
            col("lang"), col("n_chars"))
          .join(verdict, Seq("doc_id"))
        val langTop = base.groupBy("source", "lang")
          .agg(count(lit(1)).as("nl"))
          .groupBy("source")
          .agg(max(struct(col("nl"), col("lang"))).as("top"),
            countDistinct(col("lang")).as("n_langs"))
          .select(col("source"), col("top.lang").as("top_lang"),
            col("n_langs"))
        base.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("total_words"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("keep").cast("long")).as("n_quality_pass"))
          .join(langTop, Seq("source"))
          .join(dupDocs, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("total_words"),
            col("min_chars"), col("max_chars"),
            floor(col("n_quality_pass") * lit(10000.0) / col("n_docs"))
              .cast("long").as("quality_bp"),
            col("top_lang"), col("n_langs"),
            coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lang, n_chars, text,
             |         list_filter(string_split_regex(text, '\s+'),
             |                     w -> len(w) > 0) AS ws,
             |         md5(text) AS fp
             |  FROM documents
             |), tok AS (
             |  SELECT doc_id, unnest(ws) AS w FROM d
             |), wcn AS (
             |  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
             |), words AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             |         round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6)
             |           AS top_word_frac
             |  FROM wcn GROUP BY doc_id
             |), sig AS (
             |  SELECT d.doc_id,
             |         CAST(COALESCE(w.n_words, 0) AS BIGINT) AS n_words,
             |         CAST(CASE WHEN length(text) = 0 THEN 0
             |              ELSE floor(length(regexp_replace(text,
             |                     '[^A-Za-z]', '', 'g')) * 10000.0
             |                   / length(text)) END AS BIGINT) AS alpha_bp,
             |         w.top_word_frac
             |  FROM d LEFT JOIN words w ON d.doc_id = w.doc_id
             |), keepers AS (
             |  SELECT doc_id, n_words,
             |         (CASE WHEN n_words < 10 THEN 'x'
             |               WHEN n_words > 5000 THEN 'x'
             |               WHEN alpha_bp < 5000 THEN 'x'
             |               WHEN top_word_frac > 0.3 THEN 'x'
             |          END) IS NULL AS keep
             |  FROM sig
             |), dupfp AS (
             |  SELECT fp FROM d GROUP BY fp HAVING COUNT(*) > 1
             |), dups AS (
             |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_dup_docs
             |  FROM d JOIN dupfp f ON f.fp = d.fp GROUP BY 1
             |), lt AS (
             |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
             |  FROM d GROUP BY 1, 2
             |), ltop AS (
             |  SELECT source, lang AS top_lang FROM (
             |    SELECT source, lang,
             |           ROW_NUMBER() OVER (PARTITION BY source
             |             ORDER BY nl DESC, lang DESC) AS rk
             |    FROM lt) WHERE rk = 1
             |), nlang AS (
             |  SELECT source, CAST(COUNT(DISTINCT lang) AS BIGINT)
             |    AS n_langs
             |  FROM d GROUP BY 1
             |)
             |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(k.n_words) AS BIGINT) AS total_words,
             |       MIN(d.n_chars) AS min_chars,
             |       MAX(d.n_chars) AS max_chars,
             |       CAST(floor(SUM(CASE WHEN k.keep THEN 1 ELSE 0 END)
             |         * 10000.0 / COUNT(*)) AS BIGINT) AS quality_bp,
             |       MIN(lt2.top_lang) AS top_lang,
             |       MIN(nlang.n_langs) AS n_langs,
             |       COALESCE(MIN(du.n_dup_docs), 0) AS n_dup_docs
             |FROM d
             |JOIN keepers k ON k.doc_id = d.doc_id
             |JOIN ltop lt2 ON lt2.source = d.source
             |JOIN nlang ON nlang.source = d.source
             |LEFT JOIN dups du ON du.source = d.source
             |GROUP BY d.source
             |ORDER BY d.source""".stripMargin)),

    // Cross-document exact-substring spans (Lee et al. 2022 ExactSubstr,
    // the acting face): overlapping 5-word windows at EVERY position,
    // first-occurrence-wins, covered word ranges merged to maximal
    // islands. Distinct from q96 (within-doc audit) and q102 (fixed
    // non-overlapping segments): these spans are alignment-free.

    Q("q175_unimax_alloc",
      (s, dir) => {
        // STANDING: the per-source token census (a bounded dim — one
        // row per source) memoizes per (session, dir); the corpus-wide
        // tokenize-and-count is this query's only expensive pass
        val counts = graft.sources.Standing.frame(s, dir,
          "q175-source-token-counts") {
          Tables.load(s, dir, "documents")
            .select(col("source"),
              when(length(trim(col("text"))) === 0, 0)
                .otherwise(size(split(trim(col("text")), "\\s+")))
                .as("nw"))
            .groupBy("source").agg(sum(col("nw")).as("tokens"))
        }
        Mixing.unimaxAllocation(counts, budgetTokens = 50000L,
            epochCap = 2)
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |         CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text),
             |                       '\s+')) END AS nw
             |  FROM documents
             |), cnt AS (
             |  SELECT source, CAST(SUM(nw) AS BIGINT) AS tokens
             |  FROM d GROUP BY source
             |), rk AS (
             |  SELECT source, tokens, tokens * 2 AS capacity,
             |         CAST(ROW_NUMBER() OVER (ORDER BY tokens * 2,
             |           source) AS BIGINT) AS rn,
             |         SUM(tokens * 2) OVER (ORDER BY tokens * 2, source
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS prefix,
             |         CAST(COUNT(*) OVER () AS BIGINT) AS n
             |  FROM cnt
             |), fl AS (
             |  SELECT *, capacity * (n - rn + 1) + (prefix - capacity)
             |            <= 50000 AS capped
             |  FROM rk
             |), br AS (
             |  SELECT MAX(CASE WHEN capped THEN rn ELSE 0 END) AS jstar,
             |         MAX(CASE WHEN capped THEN prefix ELSE 0 END)
             |           AS prefix_j,
             |         MAX(n) AS nsrc
             |  FROM fl
             |), alo AS (
             |  SELECT f.source, f.tokens, f.capacity,
             |         CAST(CASE WHEN f.rn <= b.jstar THEN f.capacity
             |              ELSE least(f.capacity,
             |                CASE WHEN b.nsrc > b.jstar
             |                     THEN (50000 - b.prefix_j)
             |                          // (b.nsrc - b.jstar)
             |                     ELSE f.capacity END) END AS BIGINT)
             |           AS alloc_tokens
             |  FROM fl f CROSS JOIN br b
             |)
             |SELECT source, tokens, capacity, alloc_tokens,
             |       CAST(alloc_tokens * 10000 // tokens AS BIGINT)
             |         AS epochs_bp
             |FROM alo ORDER BY source""".stripMargin)),

    // Hard-negative mining (DPR/ANCE data prep): top BM25-scored docs
    // per query that are NOT labeled relevant, with the margin to the
    // best labeled positive. Labels are id-derived (doc_id % 100 = query
    // index) so both engines regenerate the same relevance table — the
    // q149 deterministic-traffic pattern.

    Q("q177_sft_pack",
      (s, dir) => Mixing.packSft(
          Tables.load(s, dir, "documents"), budget = 1024)
        .select(col("doc_id"), col("source"), col("prompt_tokens"),
          col("n_tokens"), col("start_tok"), col("seq_id"),
          col("seq_offset"), col("mask_start"), col("mask_end"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |         CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text),
             |                       '\s+')) END AS n_words
             |  FROM documents
             |), e AS (
             |  SELECT doc_id, source, n_words,
             |         greatest(1, n_words // 3) AS prompt_tokens,
             |         n_words + 3 AS example_tokens
             |  FROM d WHERE n_words > 0
             |), p AS (
             |  SELECT *, SUM(example_tokens) OVER (PARTITION BY source
             |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) - example_tokens
             |           AS start_tok
             |  FROM e
             |)
             |SELECT doc_id, source,
             |       CAST(prompt_tokens AS BIGINT) AS prompt_tokens,
             |       CAST(example_tokens AS BIGINT) AS n_tokens,
             |       CAST(start_tok AS BIGINT) AS start_tok,
             |       CAST(start_tok // 1024 AS BIGINT) AS seq_id,
             |       CAST(start_tok % 1024 AS BIGINT) AS seq_offset,
             |       CAST(start_tok + prompt_tokens + 2 AS BIGINT)
             |         AS mask_start,
             |       CAST(start_tok + example_tokens AS BIGINT)
             |         AS mask_end
             |FROM p ORDER BY doc_id""".stripMargin)),

    // Deequ-style constraint verification (Schelter et al., VLDB 2018):
    // five table-level constraints — size, completeness, two uniqueness
    // checks, a value bound — in ONE aggregation pass; unique(o_custkey)
    // deliberately fails (customers repeat), proving the verdict path.

    Q("q188_hilbert_stats",
      (s, dir) => Layout.hilbertBucketStats(
          Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          bucketBits = 6)
        .orderBy("bucket"),
      Some(hilbertOracle)),

    // Referential-integrity checks (the cross-table Deequ face of
    // q178): orphan rates of three FK edges — two real TPC-H edges
    // that must pass at exactly 0, and one against a deliberately
    // halved parent so a genuine violation rate flows through the
    // verdict path.

    Q("q190_training_manifest",
      (s, dir) => Mixing.packSft(
          Tables.load(s, dir, "documents"), budget = 1024)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_examples"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("mask_end") - col("mask_start")).as("n_mask_tokens"),
          expr("sum(mask_end - mask_start) * 10000 div sum(n_tokens)")
            .as("mask_bp"),
          countDistinct(col("seq_id")).as("n_seqs"))
        .orderBy("source"),
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |         CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text),
             |                       '\s+')) END AS n_words
             |  FROM documents
             |), e AS (
             |  SELECT doc_id, source, n_words,
             |         greatest(1, n_words // 3) AS prompt_tokens,
             |         n_words + 3 AS example_tokens
             |  FROM d WHERE n_words > 0
             |), p AS (
             |  SELECT *, SUM(example_tokens) OVER (PARTITION BY source
             |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) - example_tokens
             |           AS start_tok
             |  FROM e
             |)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_examples,
             |       CAST(SUM(example_tokens) AS BIGINT) AS n_tokens,
             |       CAST(SUM(example_tokens - prompt_tokens - 2)
             |         AS BIGINT) AS n_mask_tokens,
             |       CAST(SUM(example_tokens - prompt_tokens - 2)
             |         * 10000 // SUM(example_tokens) AS BIGINT)
             |         AS mask_bp,
             |       CAST(COUNT(DISTINCT start_tok // 1024) AS BIGINT)
             |         AS n_seqs
             |FROM p GROUP BY source ORDER BY source""".stripMargin)),

    // First-order behavioral Markov model: event-type transition
    // counts and probabilities over each user's (ts, event_id)-ordered
    // stream — the text-LM recipe applied to behavior. One lag window
    // per user + one (from, to)-grain aggregate; probabilities are
    // exact-integer micro-units.

    Q("q212_padding_waste",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(expr("CAST(size(filter(split(trim(text), '\\\\s+')," +
          " x -> length(x) > 0)) AS BIGINT)").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .withColumn("bucket",
          expr("CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)" +
            " ELSE shiftleft(CAST(1 AS BIGINT)," +
            " CAST(length(bin(n_tokens - 1)) AS INT)) END"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("token_mass"))
        .withColumn("padded_mass", col("bucket") * col("n_docs"))
        .withColumn("waste_bp",
          expr("(padded_mass - token_mass) * 10000 DIV padded_mass"))
        .orderBy("bucket"),
      Some("""WITH t AS (
             |  SELECT CAST(len(list_filter(string_split_regex(trim(text),
             |           '\s+'), x -> length(x) > 0)) AS BIGINT)
             |           AS n_tokens
             |  FROM documents
             |), b AS (
             |  SELECT n_tokens,
             |         CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
             |              ELSE CAST(1 AS BIGINT)
             |                << CAST(length(bin(n_tokens - 1)) AS INT)
             |         END AS bucket
             |  FROM t WHERE n_tokens > 0
             |), g AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(n_tokens) AS BIGINT) AS token_mass
             |  FROM b GROUP BY 1
             |)
             |SELECT bucket, n_docs, token_mass,
             |       CAST(bucket * n_docs AS BIGINT) AS padded_mass,
             |       CAST((bucket * n_docs - token_mass) * 10000
             |         // (bucket * n_docs) AS BIGINT) AS waste_bp
             |FROM g ORDER BY bucket""".stripMargin)),

    // Incremental co-occurrence: the q206 market-basket table maintained
    // by FOLDING a daily batch into standing (membership, pair-count)
    // state — the q67/q86/q119 standing-artifact discipline at the
    // association grain. A batch contributes only memberships it is
    // first to introduce; new pairs are (new × full-membership) with a
    // type-order guard on new×new. The oracle is the ONE-SHOT distinct
    // pair aggregate over all events, so folded ≡ rebuilt is
    // hash-certified cross-engine (same code path as the streaming
    // maintainer: SketchStreams.cooccurFold).

    Q("q215_mixture_entropy",
      (s, dir) => {
        // sources×langs rows; truncated because BOTH the per-source
        // rollup and the term join read it — an untruncated plan scans
        // the corpus once per reference (the mmrPoolTop discipline)
        val pl = Tables.load(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("ni"))
          .localCheckpoint()
        val ps = pl.groupBy("source")
          .agg(sum(col("ni")).as("n_docs"),
            count(lit(1)).as("n_langs"))
        pl.join(ps, Seq("source"))
          .withColumn("term_micro",
            floor((lit(1000000L) * col("ni"))
              * log(col("n_docs").cast("double") / col("ni"))
              / col("n_docs")))
          .groupBy("source")
          .agg(max(col("n_docs")).as("n_docs"),
            max(col("n_langs")).as("n_langs"),
            sum(col("term_micro")).as("entropy_micro"))
          .orderBy("source")
      },
      Some("""WITH pl AS (
             |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS ni
             |  FROM documents GROUP BY 1, 2
             |), ps AS (
             |  SELECT source, CAST(SUM(ni) AS BIGINT) AS n_docs,
             |         CAST(COUNT(*) AS BIGINT) AS n_langs
             |  FROM pl GROUP BY 1
             |)
             |SELECT p.source, MAX(s.n_docs) AS n_docs,
             |       MAX(s.n_langs) AS n_langs,
             |       CAST(SUM(CAST(FLOOR((1000000 * p.ni)
             |         * ln(CAST(s.n_docs AS DOUBLE) / p.ni)
             |         / s.n_docs) AS BIGINT)) AS BIGINT) AS entropy_micro
             |FROM pl p JOIN ps s USING (source)
             |GROUP BY p.source ORDER BY p.source""".stripMargin)),

    // Per-source lexical diversity: type-token ratio and distinct-
    // bigram ratio in basis points — the repetitiveness signal
    // (template/boilerplate sources score low; distinct-n is the
    // corpus-side face of the Self-BLEU diversity family). Tokenization
    // and bigram construction are the shared q81 stream (lower/trim/
    // split + the WordNgrams kernel); counts are exact two-phase
    // distinct aggregates per source — partial-agg'd map-side, the only
    // shuffle is (source, gram)-keyed.

    Q("q218_temperature_sampling",
      (s, dir) => {
        // sources-sized; truncated because the totals row re-reads it —
        // an untruncated plan would run the corpus token count twice
        val counts = Tables.load(s, dir, "documents")
          .select(col("source"),
            when(length(trim(col("text"))) === 0, 0)
              .otherwise(size(split(trim(col("text")), "\\s+")))
              .as("nw"))
          .groupBy("source").agg(sum(col("nw")).as("tokens"))
          .withColumn("sqrt_micro",
            floor(sqrt(col("tokens").cast("double"))
              * lit(1000000.0)).cast("long"))
          .localCheckpoint()
        val totals = counts.agg(sum(col("tokens")).as("tot_tokens"),
          sum(col("sqrt_micro")).as("tot_sqrt"))
        // zero-denominator guard (the q178 rule, as in q222/q227): an
        // all-empty-text corpus has tot_tokens = tot_sqrt = 0, where
        // Spark DIV returns NULL but DuckDB // raises — report -1
        counts.crossJoin(broadcast(totals))
          .select(col("source"), col("tokens"), col("sqrt_micro"),
            expr("CAST(CASE WHEN tot_tokens = 0 THEN -1" +
              " ELSE CAST(tokens AS DECIMAL(38,0)) * 1000000" +
              " DIV tot_tokens END AS BIGINT)").as("natural_ppm"),
            expr("CAST(CASE WHEN tot_sqrt = 0 THEN -1" +
              " ELSE CAST(sqrt_micro AS DECIMAL(38,0)) * 1000000" +
              " DIV tot_sqrt END AS BIGINT)").as("temp_ppm"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |         CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text),
             |                       '\s+')) END AS nw
             |  FROM documents
             |), c AS (
             |  SELECT source, CAST(SUM(nw) AS BIGINT) AS tokens
             |  FROM d GROUP BY 1
             |), cs AS (
             |  SELECT source, tokens,
             |         CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))
             |           * 1000000.0) AS BIGINT) AS sqrt_micro
             |  FROM c
             |), t AS (
             |  SELECT CAST(SUM(tokens) AS BIGINT) AS tot_tokens,
             |         CAST(SUM(sqrt_micro) AS BIGINT) AS tot_sqrt
             |  FROM cs
             |)
             |SELECT cs.source, cs.tokens, cs.sqrt_micro,
             |       CAST(CASE WHEN t.tot_tokens = 0 THEN -1
             |         ELSE CAST(cs.tokens AS HUGEINT) * 1000000
             |         // t.tot_tokens END AS BIGINT) AS natural_ppm,
             |       CAST(CASE WHEN t.tot_sqrt = 0 THEN -1
             |         ELSE CAST(cs.sqrt_micro AS HUGEINT) * 1000000
             |         // t.tot_sqrt END AS BIGINT) AS temp_ppm
             |FROM cs CROSS JOIN t
             |ORDER BY cs.source""".stripMargin)),

    // Near-dup cluster SIZE DISTRIBUTION — the dedup health card: a
    // fat tail of large clusters means boilerplate/mirrors dominate
    // the duplicate mass and the per-cluster representative policy
    // matters far more than the pair count suggests. Reads the
    // memoized standing cluster table (computed once per session+dir,
    // the ndTable pattern); the histogram itself is two bounded
    // aggregations over component labels — nothing text-sized moves.

    Q("q274_fold_balance",
      (s, dir) => {
        val folds = Tables.load(s, dir, "documents")
          .select(pmod(Dedup.md5Hash64(col("doc_id").cast("string")),
              lit(5L)).as("fold"),
            size(filter(split(trim(col("text")), "\\s+"),
              w => length(w) > 0)).cast("long").as("n_tokens"))
          .groupBy("fold")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"))
        folds.crossJoin(broadcast(
            folds.agg(sum("n_tokens").as("total_tokens"))))
          .select(col("fold"), col("n_docs"), col("n_tokens"),
            expr("n_tokens * 1000000 div total_tokens")
              .as("token_share_ppm"),
            expr("n_tokens * 1000000 div total_tokens - 200000")
              .as("dev_ppm"))
          .orderBy("fold")
      },
      Some("""WITH f AS (
             |  SELECT ((('0x'||substr(md5(CAST(doc_id AS VARCHAR)),
             |           1,15))::BIGINT % 5) + 5) % 5 AS fold,
             |         CAST(len(list_filter(
             |           string_split_regex(trim(text), '\s+'),
             |           w -> len(w) > 0)) AS BIGINT) AS n_tokens
             |  FROM documents
             |), a AS (
             |  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
             |  FROM f GROUP BY 1
             |), t AS (
             |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
             |  FROM a
             |)
             |SELECT CAST(a.fold AS BIGINT) AS fold, a.n_docs,
             |       a.n_tokens,
             |       CAST(a.n_tokens * 1000000 // t.total_tokens
             |         AS BIGINT) AS token_share_ppm,
             |       CAST(a.n_tokens * 1000000 // t.total_tokens
             |         - 200000 AS BIGINT) AS dev_ppm
             |FROM a CROSS JOIN t ORDER BY a.fold""".stripMargin)),

    // As-of enrichment STALENESS profile — the freshness card over the
    // q43 point-in-time join (the custom AsOfJoinExec physical
    // operator exercised at a second grain): per whole-hour staleness
    // bucket, how many events read a snapshot that old; unmatched
    // events report bucket −1. The operational question behind every
    // as-of enrichment — "how stale is the dimension the median event
    // actually sees" — answered in exact integers (day-grain snapshots
    // ⇒ buckets 0..23 + the miss bucket).

    Q("q276_threshold_sweep",
      (s, dir) => {
        val spark2 = s; import spark2.implicits._
        val pairs = Dedup.nearDuplicatesPortable(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4,
            minJaccardBp = 0)
          .localCheckpoint() // three threshold cuts read it
        Seq(2000L, 5000L, 8000L).map { t =>
          val cut = pairs.filter(col("jaccard_bp") >= t)
          cut.agg(count(lit(1)).as("n_pairs"))
            .crossJoin(cut.select(explode(array(col("id_a"),
                col("id_b"))).as("d")).distinct()
              .agg(count(lit(1)).as("n_docs_touched")))
            .select(lit(t).as("tau_bp"), col("n_pairs"),
              col("n_docs_touched"))
        }.reduce(_ unionByName _).orderBy("tau_bp")
      },
      Some(neardupScoredCtes + """, th(tau_bp) AS (
          |  VALUES (2000), (5000), (8000)
          |), cut AS (
          |  SELECT th.tau_bp, s.id_a, s.id_b
          |  FROM th JOIN scored s ON s.jaccard_bp >= th.tau_bp
          |), docs_t AS (
          |  SELECT tau_bp, COUNT(DISTINCT d) AS n_docs_touched
          |  FROM (
          |    SELECT tau_bp, id_a AS d FROM cut
          |    UNION ALL SELECT tau_bp, id_b FROM cut
          |  ) GROUP BY 1
          |), pairs_t AS (
          |  SELECT tau_bp, COUNT(*) AS n_pairs FROM cut GROUP BY 1
          |)
          |SELECT CAST(th.tau_bp AS BIGINT) AS tau_bp,
          |       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
          |       CAST(COALESCE(d.n_docs_touched, 0) AS BIGINT)
          |         AS n_docs_touched
          |FROM th
          |LEFT JOIN pairs_t p ON p.tau_bp = th.tau_bp
          |LEFT JOIN docs_t d ON d.tau_bp = th.tau_bp
          |ORDER BY th.tau_bp""".stripMargin)),

    // Discount×quantity correlation per return flag — Pearson with the
    // integer-staging discipline: both variables quantized exactly
    // (integral quantities; discounts to centi via the shared
    // floor(·+0.5)), all five sufficient sums staged DECIMAL/HUGEINT
    // (overflow-free at any corpus size), and the one float sequence —
    // two sqrt, one divide, one floor — spelled identically in both
    // engines. The pricing-policy question (do bigger lines get deeper
    // discounts?) as a micro-unit exact integer per group.

    Q("q278_curation_attrition",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val nonEval = docs.filter(col("doc_id") % 17 =!= 0)
        val quality = TextAnalysis.qualityVerdict(nonEval)
          .select(col("doc_id"), col("keep"))
        val drop = clustersTable(s, dir)
          .filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id"), lit(true).as("is_dup"))
        val dirty = Dedup.contamination(nonEval,
            docs.filter(col("doc_id") % 17 === 0))
          .select(col("doc_id"),
            (col("n_contaminated") > 0).as("is_dirty"))
        nonEval.select(col("doc_id"), col("source"))
          .join(quality, Seq("doc_id"))
          .join(broadcast(drop), Seq("doc_id"), "left")
          .join(dirty, Seq("doc_id"))
          .select(col("source"),
            when(!col("keep"), "1_quality")
              .when(coalesce(col("is_dup"), lit(false)), "2_dedup")
              .when(col("is_dirty"), "3_decontam")
              .otherwise("4_survived").as("stage"))
          .groupBy("source", "stage")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "stage")
      },
      Some(neardupScoredCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, pairs AS (
          |  SELECT id_a, id_b FROM scored WHERE jaccard_bp >= 2000
          |), edges AS (
          |  SELECT id_a AS src, id_b AS dst FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs
          |), walk(id, reach) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
          |), comp AS (
          |  SELECT id, MIN(reach) AS comp FROM walk GROUP BY id
          |), qd AS (
          |  SELECT doc_id, text,
          |         list_filter(string_split_regex(text, '\s+'),
          |                     x -> len(x) > 0) AS ws
          |  FROM documents
          |), qtok AS (
          |  SELECT doc_id, unnest(ws) AS w FROM qd
          |), qwc AS (
          |  SELECT doc_id, w, COUNT(*) AS c FROM qtok GROUP BY doc_id, w
          |), qwords AS (
          |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
          |         round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6)
          |           AS top_word_frac
          |  FROM qwc GROUP BY doc_id
          |), qkeep AS (
          |  SELECT qd.doc_id
          |  FROM qd LEFT JOIN qwords qw ON qd.doc_id = qw.doc_id
          |  WHERE COALESCE(qw.n_words, 0) >= 10
          |    AND COALESCE(qw.n_words, 0) <= 5000
          |    AND CASE WHEN length(qd.text) = 0 THEN 0
          |         ELSE floor(length(regexp_replace(qd.text,
          |                '[^A-Za-z]', '', 'g')) * 10000.0
          |              / length(qd.text)) END >= 5000
          |    AND NOT COALESCE(qw.top_word_frac > 0.3, false)
          |), evalh AS (
          |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0
          |), dirty AS (
          |  SELECT DISTINCT d.doc_id
          |  FROM sh d JOIN evalh e ON d.shingle = e.shingle
          |  WHERE d.doc_id % 17 <> 0
          |), st AS (
          |  SELECT d0.doc_id, d0.source,
          |         CASE WHEN d0.doc_id NOT IN (SELECT doc_id FROM qkeep)
          |                THEN '1_quality'
          |              WHEN d0.doc_id IN
          |                (SELECT id FROM comp WHERE id <> comp)
          |                THEN '2_dedup'
          |              WHEN d0.doc_id IN (SELECT doc_id FROM dirty)
          |                THEN '3_decontam'
          |              ELSE '4_survived' END AS stage
          |  FROM documents d0 WHERE d0.doc_id % 17 <> 0
          |)
          |SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS n_docs
          |FROM st GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Embedding contrast histogram — cosine over deterministic
    // adjacent-id pairs (even id vs id+1: an unbiased fixed sample at
    // any scale, no RNG): the distribution-spread card that catches
    // representation collapse (all mass at high cosine — every vector
    // looks like every other — kills contrastive training and ANN
    // selectivity long before q261's per-dimension variance hits
    // zero). Map-side equi-join on vec_id+1, one sqrt pair + divide
    // per pair (the q28 IEEE sequence), ≤21-bucket histogram.
  )
}
