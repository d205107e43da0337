package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Exact/near-duplicate detection: hash dedup, MinHash+LSH banding, SimHash, exact-substring spans (Lee et al.), AllPairs prefix filtering, connected-component clustering, decontamination, incremental variants.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object DedupQueries {

  val all: Seq[Q] = Seq(

    Q("q20_dedup_exact",
      (s, dir) => Dedup.exactByText(Tables.load(s, dir, "documents"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    Q("q21_doc_fingerprint",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q36_minhash_md5",
      (s, dir) => {
        val k = 16
        // long format (doc_id, seed, minhash) via the fused native kernel
        // (one tight loop per doc; values identical to the composable
        // formulation and to the oracle).
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            Dedup.minhashSignatureFast(col("text"), 3, k).as("sig"))
          .filter(size(col("sig")) > 0)
          .select(col("doc_id"), posexplode(col("sig")))
          .select(col("doc_id"), col("pos").as("seed"),
            col("col").as("minhash"))
          .orderBy("doc_id", "seed")
      },
      Some {
        s"""WITH tok AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           |  FROM documents
           |), tr AS (
           |  SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tok,
           |         len(w) AS n
           |  FROM tok
           |), sh0 AS (
           |  SELECT doc_id, i, n,
           |         tok || ' ' || lead(tok, 1) OVER win || ' ' ||
           |           lead(tok, 2) OVER win AS shingle
           |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
           |), sh AS (
           |  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE i <= n - 2
           |)
           |SELECT doc_id, CAST(t.seed AS INTEGER) AS seed,
           |       MIN(xor(('0x'||substr(md5(shingle),1,15))::BIGINT,
           |               t.seed * 2654435769)) AS minhash
           |FROM sh CROSS JOIN generate_series(0, 15) t(seed)
           |GROUP BY doc_id, t.seed ORDER BY doc_id, seed""".stripMargin
      }),

    // Group-level MinHash signatures via the custom
    // TypedImperativeAggregate: one k-element signature per language =
    // the signature of the union of that language's shingle sets
    // (min is duplicate-insensitive, so the oracle is a plain
    // MIN ... GROUP BY lang, seed over the per-doc shingle relation).

    Q("q54_minhash_group_agg",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("lang"),
          Dedup.shingleHashesFast(col("text"), 3).as("hs"))
        .filter(size(col("hs")) > 0)
        .groupBy("lang")
        .agg(Dedup.minhashAgg(col("hs"), 16).as("sig"))
        .select(col("lang"), posexplode(col("sig")))
        .select(col("lang"), col("pos").as("seed"),
          col("col").as("minhash"))
        .orderBy("lang", "seed"),
      Some("""WITH tok AS (
             |  SELECT doc_id, lang,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, lang, generate_subscripts(w, 1) AS i,
             |         unnest(w) AS tok, len(w) AS n
             |  FROM tok
             |), sh0 AS (
             |  SELECT doc_id, lang, i, n,
             |         tok || ' ' || lead(tok, 1) OVER win || ' ' ||
             |           lead(tok, 2) OVER win AS shingle
             |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
             |), sh AS (
             |  SELECT DISTINCT doc_id, lang, shingle FROM sh0 WHERE i <= n - 2
             |)
             |SELECT lang, CAST(t.seed AS INTEGER) AS seed,
             |       MIN(xor(('0x'||substr(md5(shingle),1,15))::BIGINT,
             |               t.seed * 2654435769)) AS minhash
             |FROM sh CROSS JOIN generate_series(0, 15) t(seed)
             |GROUP BY lang, t.seed ORDER BY lang, seed""".stripMargin)),

    // n-gram Jaccard over deterministically-blocked pairs (lang +
    // n_chars bucket), basis-point floor'd — fully oracle-checked.

    Q("q37_jaccard_pairs",
      (s, dir) => {
        // intersect primitive long-hash arrays (fused kernel): the 60-bit
        // md5 prefix is collision-free at corpus scale and an order faster
        // per pair than UTF8 set-intersection. Both join sides are the SAME
        // projection (self-join via alias, not two renamed branches) so the
        // shuffle on (lang, bucket) is planned once and ReusedExchange
        // feeds the probe side — shingles are computed once per doc, not
        // twice. Intersection is a codegen'd merge scan over the sorted
        // hash arrays.
        // DATA-SCALED width (ShuffleWidth.pairWidth): the (lang, bucket)
        // block self-join's in-flight volume is pair-quadratic in block
        // occupancy — at the fixed 128-partition scale-tier width it
        // spilled 11.26 GB at sf10 (the r16 sweep's worst spiller). The
        // census reads metadata columns only (never the shingle kernel);
        // rowBytes sizes the hash-join build side (~8 B/token shingle
        // arrays ≈ 2×n_chars), bytesPerPair the pair stream feeding the
        // final sort. Floors at the session width, so ≤ sf0.1 plans and
        // timings are unchanged.
        val docs = Tables.load(s, dir, "documents")
        val width = graft.plans.ShuffleWidth.pairWidth(s,
          docs.select(col("lang"), (col("n_chars") % 50).as("bucket"),
            col("n_chars")),
          Seq("lang", "bucket"), bytesPerPair = 24L,
          rowBytes = col("n_chars") * 2L)
        val sh = docs
          .select(col("doc_id"), col("lang"),
            (col("n_chars") % 50).as("bucket"),
            Dedup.shingleHashesFast(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .repartition(width, col("lang"), col("bucket"))
        sh.as("a").hint("shuffle_hash").join(sh.as("b").hint("shuffle_hash"),
            col("a.lang") === col("b.lang") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            Dedup.sortedIntersectCount(col("a.sh"), col("b.sh")).as("ninter"),
            (size(col("a.sh")) + size(col("b.sh"))).as("ntot"))
          .withColumn("jaccard_bp",
            floor(col("ninter") * lit(10000.0) / (col("ntot") - col("ninter")))
              .cast("long"))
          .select("id_a", "id_b", "jaccard_bp")
          // NO global sort: the output is corpus-quadratic (660M pairs
          // at sf10), and ordering it was the whole spill — the range
          // exchange moved 4.1 GB and its >200-partition sort-shuffle
          // writer buffered skewed join outputs (9.3 GB spilled, plus a
          // 105 s reduce-side sort doing presentation work). The
          // correctness compare hashes value-sorted rows, so row order
          // was never part of the contract — q185 (the same output
          // class) already ends unsorted.
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tok,
             |         len(w) AS n
             |  FROM tok
             |), sh0 AS (
             |  SELECT doc_id, i, n,
             |         tok || ' ' || lead(tok, 1) OVER win || ' ' ||
             |           lead(tok, 2) OVER win AS shingle
             |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
             |), sh AS (
             |  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE i <= n - 2
             |), shc AS (
             |  SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id
             |), d AS (
             |  SELECT doc_id, lang, n_chars % 50 AS bucket FROM documents
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM d a JOIN d b
             |    ON a.lang = b.lang AND a.bucket = b.bucket
             |   AND a.doc_id < b.doc_id
             |  JOIN shc ca ON ca.doc_id = a.doc_id
             |  JOIN shc cb ON cb.doc_id = b.doc_id
             |), inter AS (
             |  SELECT p.id_a, p.id_b, COUNT(*) AS ninter
             |  FROM pairs p
             |  JOIN sh sa ON sa.doc_id = p.id_a
             |  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
             |  GROUP BY p.id_a, p.id_b
             |)
             |SELECT p.id_a, p.id_b,
             |       CAST(floor(COALESCE(i.ninter, 0) * 10000.0
             |         / (ca.nsh + cb.nsh - COALESCE(i.ninter, 0))) AS BIGINT)
             |         AS jaccard_bp
             |FROM pairs p
             |JOIN shc ca ON ca.doc_id = p.id_a
             |JOIN shc cb ON cb.doc_id = p.id_b
             |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
             |ORDER BY p.id_a, p.id_b""".stripMargin)),

    // Per-language stats with exact interpolating median.

    Q("q53_lsh_neighbors",
      (s, dir) => {
        // CORPUS-SCALED plane count (Similarity.scaledPlanes): 4 at the
        // oracle-checked sfs (unchanged results), 8 at sf1, 11 at sf10 —
        // bucket count grows with the corpus so candidate volume stays
        // linear (the fixed-4-plane variant measured 83.7× wall for 10×
        // data at the r16 sf10 sweep)
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.lshNeighbors(emb,
          planes = Similarity.scaledPlanes(emb), dim = 64,
          threshold = 0.1).orderBy("id_a", "id_b")
      },
      Some {
        // the full 24-plane signature as literals; the bucket is its
        // p-char prefix with p = the scaledPlanes shift rule in pure
        // integer SQL (identical arithmetic to the engine — the
        // scaledSeedCutoff discipline)
        val bits = (0 until 24).map { p =>
          val lits = (0 until 64).map(d =>
            Similarity.hyperplaneCoeff(p, d).toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           |), np AS (
           |  SELECT GREATEST(4, (SELECT MIN(p)
           |    FROM generate_series(0, 24) t(p)
           |    WHERE 128 * (1::BIGINT << p) >= (SELECT COUNT(*) FROM e)))
           |    AS p
           |), sig AS (
           |  SELECT vec_id, v,
           |         substr($bits, 1, (SELECT p FROM np)) AS bucket
           |  FROM e
           |)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |       round(list_dot_product(a.v, b.v)
           |         / (sqrt(list_dot_product(a.v, a.v))
           |            * sqrt(list_dot_product(b.v, b.v))), 6) AS sim,
           |       a.bucket
           |FROM sig a JOIN sig b
           |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE round(list_dot_product(a.v, b.v)
           |        / (sqrt(list_dot_product(a.v, a.v))
           |           * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.1
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // SimHash on the portable md5 family (60-bit): the cross-engine-
    // checkable twin of q30's native xxhash64 kernel — per-bit majority
    // vote over token hashes, reproduced bit-for-bit in the oracle.

    Q("q52_simhash_md5",
      (s, dir) => Tables.load(s, dir, "documents")
        // same row-dropping rule as the explode+groupBy formulation (and
        // the oracle): docs with zero tokens produce no signature
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          Dedup.simhash60Md5Fast(col("text")).as("simhash"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |         unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents
             |), th AS (
             |  SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h
             |  FROM tok WHERE length(tok) > 0
             |), bits AS (
             |  SELECT doc_id, t.b,
             |         SUM(CASE WHEN (h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             |  FROM th CROSS JOIN generate_series(0, 59) t(b)
             |  GROUP BY doc_id, t.b
             |)
             |SELECT doc_id,
             |       CAST(SUM(CASE WHEN s > 0
             |                     THEN (CAST(1 AS BIGINT) << b)
             |                     ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // The FULL near-dup pipeline on the portable md5 hash family —
    // shingle → minhash → band → bucket-join → exact-Jaccard verify,
    // every stage reproduced in the DuckDB oracle.

    Q("q44_neardup_portable",
      (s, dir) => Dedup.nearDuplicatesPortable(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 4, rowsPerBand = 4, minJaccardBp = 2000)
        .orderBy("id_a", "id_b"),
      Some(neardupScoredCtes +
        """SELECT id_a, id_b, jaccard_bp FROM scored
          |WHERE jaccard_bp >= 2000 ORDER BY id_a, id_b""".stripMargin)),

    // As-of join (point-in-time): each event picks up its user's latest
    // daily snapshot at-or-before the event — oracle is DuckDB's native
    // ASOF JOIN; ours is the dedicated physical operator (AsOfJoinExec:
    // per-side sort + streaming merge; the union+window composition is the
    // cross-checked reference formulation, AsOfSpec).

    Q("q61_dedup_clusters",
      (s, dir) => Dedup.connectedComponents(
        Dedup.nearDuplicatesPortable(Tables.load(s, dir, "documents"),
          "doc_id", "text", shingleN = 3, bands = 4, rowsPerBand = 4,
          minJaccardBp = 2000),
        "id_a", "id_b", assumeDistinctPairs = true)
        .orderBy("id"),
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
          |)
          |SELECT id, MIN(reach) AS comp FROM walk GROUP BY id
          |ORDER BY id""".stripMargin)),

    // The dedup MATERIALIZATION: corpus in → deduplicated corpus out.
    // Non-representative cluster members (component ≠ own id) are
    // anti-joined away; every unclustered doc and each cluster's min-id
    // representative survive. Consumes the memoized cluster table (the
    // ndTable pattern — clusters are computed once, read by every
    // consumer; q61 remains the full from-pairs computation). The
    // single-call Dedup.dedupCorpus API wraps the same steps.

    Q("q63_dedup_corpus",
      (s, dir) => {
        val drop = clustersTable(s, dir)
          .filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id"))
        Tables.load(s, dir, "documents")
          .join(drop, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), md5(col("text")).as("fingerprint"))
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
          |)
          |SELECT d.doc_id, md5(d.text) AS fingerprint
          |FROM documents d
          |LEFT JOIN (SELECT id FROM comp WHERE id <> comp) drop_ids
          |  ON d.doc_id = drop_ids.id
          |WHERE drop_ids.id IS NULL
          |ORDER BY d.doc_id""".stripMargin)),

    // Deterministic stratified sampling for corpus mixing: md5-prefix
    // hash buckets (reproducible on any engine, any rerun — unlike RNG
    // sampling) with per-language keep rates; a plain map-side filter,
    // no shuffle, no join.

    Q("q67_incremental_neardup",
      (s, dir) => Dedup.incrementalNearDups(
        Tables.load(s, dir, "documents").filter(newBatchPred),
        ndxBands(s, dir), ndxShingles(s, dir),
        "doc_id", "text", shingleN = 3, bands = 4, rowsPerBand = 4,
        minJaccardBp = 2000)
        .orderBy("new_id", "dup_id"),
      Some(neardupScoredCtes +
        """SELECT CASE WHEN id_b % 10 = 7 THEN id_b ELSE id_a END
          |         AS new_id,
          |       CASE WHEN id_b % 10 = 7 THEN id_a ELSE id_b END
          |         AS dup_id,
          |       jaccard_bp
          |FROM scored
          |WHERE jaccard_bp >= 2000
          |  AND (id_a % 10 = 7 OR id_b % 10 = 7)
          |ORDER BY new_id, dup_id""".stripMargin)),

    // Benchmark decontamination: distinct-shingle overlap of every
    // corpus doc against the eval set (doc_id%17==0). The eval set
    // collapses to one sorted hash array broadcast everywhere; the
    // corpus is scored map-side by the sorted-merge intersect kernel —
    // no corpus shuffle, no token explode.

    Q("q68_decontamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contamination(docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0), "doc_id", "text",
          shingleN = 3)
          .orderBy("doc_id")
      },
      Some(decontaminationOracleSql)),

    // Bloom-thinned decontamination: same answer as q68 (the oracle IS
    // q68's — the Bloom image has no false negatives and the exact
    // verify culls its false positives), but the eval set broadcasts as
    // a 4 Kbit Bloom image — small enough here to force a REAL
    // false-positive rate, so the thin→verify path is materially
    // exercised, not vacuous — and only probable-hit docs reach the
    // exact semi-join.

    Q("q118_bloom_decontamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contaminationBloom(docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0), "doc_id", "text",
          shingleN = 3, numBits = 1 << 12, numHashes = 3)
          .orderBy("doc_id")
      },
      Some(decontaminationOracleSql)),

    // REAL image codec round trip (JDK javax.imageio, no external libs):
    // encode one solid-RGB PNG per document (dims + color derived from
    // the row), then genuinely decode it, walk the raster for channel
    // means, and bilinear-resize to a 4x4 thumbnail. Solid fills make
    // every decoded statistic computable in plain SQL, so the oracle
    // hash-checks the whole encode→decode→resize chain. Both stages are
    // partition-local; payload bytes never shuffle.

    Q("q96_repeated_spans",
      (s, dir) => Dedup.duplicatedSpans(
          Tables.load(s, dir, "documents"), n = 8)
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(text)),
             |           '\s+'), w -> len(w) > 0) AS ws
             |  FROM documents
             |), pos AS (
             |  SELECT doc_id, ws,
             |         unnest(generate_series(1, len(ws) - 7)) AS i
             |  FROM d WHERE len(ws) >= 8
             |), spans AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(array_to_string(ws[i:i+7], ' ')),
             |           1, 15))::BIGINT AS h
             |  FROM pos
             |), shared AS (
             |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM spans)
             |  GROUP BY h HAVING COUNT(*) >= 2
             |)
             |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             |       CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0
             |         END) AS BIGINT) AS n_dup_spans,
             |       CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0
             |         END) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
             |FROM spans s LEFT JOIN shared sh ON sh.h = s.h
             |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin)),

    // Scalar int8 quantization of the embeddings — the vector-DB
    // compression step: codes via the floor(x·127/amax + 0.5) half-up
    // closed form (round()'s tie rule differs per engine, floor's does
    // not), reconstruction error floored to integer nano-units PER
    // ELEMENT before the sum so the metric is exact under any
    // summation order. Entirely map-side.

    Q("q101_incremental_clusters",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val standing = Tables.memoTable(s, dir, "clusters_hist") {
          Dedup.connectedComponents(
            Dedup.nearDuplicatesPortable(docs.filter(!newBatchPred),
              "doc_id", "text", shingleN = 3, bands = 4, rowsPerBand = 4,
              minJaccardBp = 2000),
            "id_a", "id_b", assumeDistinctPairs = true)
        }
        val newPairs = Dedup.incrementalNearDups(
            docs.filter(newBatchPred), ndxBands(s, dir),
            ndxShingles(s, dir), "doc_id", "text", shingleN = 3,
            bands = 4, rowsPerBand = 4, minJaccardBp = 2000)
          .select(least(col("new_id"), col("dup_id")).as("id_a"),
            greatest(col("new_id"), col("dup_id")).as("id_b"))
          .distinct()
        Dedup.applyClusterBatch(standing, newPairs).orderBy("id")
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
          |)
          |SELECT id, MIN(reach) AS comp FROM walk GROUP BY id
          |ORDER BY id""".stripMargin)),

    // Segment-level exact dedup (the acting face of q96's repeated-span
    // audit): consecutive 8-word segments, corpus-wide first occurrence
    // wins (ordered by (doc_id, position)), surviving text reassembled.
    // One hash-aggregate on the 60-bit segment fingerprint + a join
    // back on the same key — never corpus × corpus.

    Q("q102_dedup_segments",
      (s, dir) => Dedup.dedupSegments(
          Tables.load(s, dir, "documents"), window = 8)
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         CASE WHEN length(trim(text)) = 0
             |              THEN CAST([] AS VARCHAR[])
             |              ELSE string_split_regex(trim(text), '\s+')
             |         END AS w
             |  FROM documents
             |), seg0 AS (
             |  SELECT doc_id, w,
             |         unnest(generate_series(0,
             |           CAST(ceil(len(w) / 8.0) AS INT) - 1)) AS seg_idx
             |  FROM d WHERE len(w) > 0
             |), seg AS (
             |  SELECT doc_id, seg_idx,
             |         array_to_string(w[seg_idx*8 + 1 : seg_idx*8 + 8],
             |                         ' ') AS seg_text
             |  FROM seg0
             |), rk AS (
             |  SELECT doc_id, seg_idx, seg_text,
             |         ROW_NUMBER() OVER (PARTITION BY seg_text
             |           ORDER BY doc_id, seg_idx) AS rk
             |  FROM seg
             |), kept AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |         string_agg(seg_text, ' ' ORDER BY seg_idx)
             |           AS clean_text
             |  FROM rk WHERE rk = 1 GROUP BY doc_id
             |)
             |SELECT d.doc_id,
             |       CAST(ceil(len(d.w) / 8.0) AS BIGINT) AS n_segs,
             |       COALESCE(k.n_kept, 0) AS n_kept,
             |       COALESCE(k.clean_text, '') AS clean_text
             |FROM d LEFT JOIN kept k ON k.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Binned date-range join: shipments falling inside each order's
    // 14-day fulfillment window. A raw BETWEEN join would plan as
    // broadcast-nested-loop (no equality key); binning replicates each
    // interval to its ~1-2 day-bins and equi-joins on the bin — every
    // true pair meets exactly once (a point lives in ONE bin), so no
    // dedup and the result is exactly the nested-loop join's.

    Q("q109_containment_pairs",
      (s, dir) => Dedup.containmentPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, bands = 4, rowsPerBand = 4,
          minContainmentBp = 3000)
        .orderBy("id_a", "id_b"),
      Some(neardupScoredCtes +
        """SELECT c.id_a, c.id_b,
          |       CAST(floor(COALESCE(i.ninter, 0) * 10000.0 / ca.nsh)
          |         AS BIGINT) AS contain_ab_bp,
          |       CAST(floor(COALESCE(i.ninter, 0) * 10000.0 / cb.nsh)
          |         AS BIGINT) AS contain_ba_bp
          |FROM cand c
          |JOIN shc ca ON ca.doc_id = c.id_a
          |JOIN shc cb ON cb.doc_id = c.id_b
          |LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          |WHERE greatest(
          |        floor(COALESCE(i.ninter, 0) * 10000.0 / ca.nsh),
          |        floor(COALESCE(i.ninter, 0) * 10000.0 / cb.nsh))
          |      >= 3000
          |ORDER BY c.id_a, c.id_b""".stripMargin)),

    // Triangle enumeration over the near-dup graph (degree-ordered
    // orientation, Schank & Wagner 2005): wedge volume is Σ out-deg² and
    // orientation bounds every out-degree at O(√m) — the O(m^1.5)
    // all-triangles bound. The oracle restates the near-dup chain + the
    // id-ordered triple join (orientation-independent output: each
    // triangle once, ascending ids).

    Q("q123_leakage_safe_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sp = Dedup.leakageSafeSplit(docs, clustersTable(s, dir))
        val pairs = Dedup.nearDuplicatesPortable(docs, "doc_id", "text",
          shingleN = 3, bands = 4, rowsPerBand = 4, minJaccardBp = 2000)
        val leaks = pairs
          .join(sp.select(col("doc_id").as("id_a"),
            col("split").as("sa")), Seq("id_a"))
          .join(sp.select(col("doc_id").as("id_b"),
            col("split").as("sb")), Seq("id_b"))
          .filter(col("sa") =!= col("sb"))
          .agg(count(lit(1)).as("n_leaky"))
        sp.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("unit")).as("n_units"))
          .crossJoin(broadcast(leaks))
          .orderBy("split")
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
          |), spl AS (
          |  SELECT d.doc_id,
          |         COALESCE(c.comp, d.doc_id) AS unit,
          |         ('0x'||substr(md5('split:'
          |           || COALESCE(c.comp, d.doc_id)),1,15))::BIGINT % 100
          |           AS bucket
          |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
          |), named AS (
          |  SELECT doc_id, unit,
          |         CASE WHEN bucket < 80 THEN 'train'
          |              WHEN bucket < 90 THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM spl
          |), leaks AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky
          |  FROM pairs p
          |  JOIN named a ON p.id_a = a.doc_id
          |  JOIN named b ON p.id_b = b.doc_id
          |  WHERE a.split <> b.split
          |)
          |SELECT n.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(COUNT(DISTINCT n.unit) AS BIGINT) AS n_units,
          |       l.n_leaky
          |FROM named n CROSS JOIN leaks l
          |GROUP BY 1, l.n_leaky ORDER BY 1""".stripMargin)),

    // Count-Min sketch (point-frequency member of the sketch family):
    // 3×256 cells of EXACT deterministic counts over the portable
    // md5-60 hash rows — the whole state AND every point estimate is
    // reproducible in any engine with md5, so est (min over rows) and
    // its guaranteed overcount vs the true count are both hash-checked.
    // One ×3 explode + one 768-cell bounded aggregate; the probe side
    // joins the tiny sketch.

    Q("q127_neardup_explain",
      (s, dir) => Dedup.explainPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, bands = 4, rowsPerBand = 4, minJaccardBp = 2000,
          sampleK = 4)
        .orderBy("id_a", "id_b"),
      Some(neardupScoredCtes +
        """, flagged AS (
          |  SELECT id_a, id_b, jaccard_bp FROM scored
          |  WHERE jaccard_bp >= 2000
          |), shared AS (
          |  SELECT f.id_a, f.id_b,
          |         ('0x'||substr(md5(sa.shingle),1,15))::BIGINT AS h
          |  FROM flagged f
          |  JOIN sh sa ON sa.doc_id = f.id_a
          |  JOIN sh sb ON sb.doc_id = f.id_b
          |    AND sb.shingle = sa.shingle
          |)
          |SELECT f.id_a, f.id_b, f.jaccard_bp,
          |       CAST(COUNT(s.h) AS BIGINT) AS n_shared,
          |       array_to_string((list(s.h ORDER BY s.h))[1:4], ',')
          |         AS sample_hashes
          |FROM flagged f
          |LEFT JOIN shared s ON s.id_a = f.id_a AND s.id_b = f.id_b
          |GROUP BY 1, 2, 3
          |ORDER BY 1, 2""".stripMargin)),

    // Source-overlap matrix from group-level MinHash signatures:
    // componentwise agreement of each source pair's 16-long signatures
    // estimates the Jaccard of their shingle UNIONS (agree·10000 div
    // 16 bp) — "which sources duplicate each other" from ONE corpus
    // aggregation (k longs per source through the shuffle) plus a
    // sources²-row join. min is duplicate-insensitive, so the oracle is
    // a plain MIN … GROUP BY source, seed over the shingle relation.

    Q("q128_source_overlap",
      (s, dir) => Dedup.groupOverlap(
          Tables.load(s, dir, "documents"), "source", "text",
          shingleN = 3, k = 16)
        .select(col("g_a").as("src_a"), col("g_b").as("src_b"),
          col("n_agree"), col("est_jaccard_bp"))
        .orderBy("src_a", "src_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, source, generate_subscripts(w, 1) AS i,
             |         unnest(w) AS tok, len(w) AS n
             |  FROM tok
             |), sh0 AS (
             |  SELECT doc_id, source, i, n,
             |         tok || ' ' || lead(tok, 1) OVER win || ' ' ||
             |           lead(tok, 2) OVER win AS shingle
             |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
             |), sh AS (
             |  SELECT DISTINCT doc_id, source, shingle
             |  FROM sh0 WHERE i <= n - 2
             |), sig AS (
             |  SELECT source, CAST(t.seed AS INTEGER) AS seed,
             |         MIN(xor(('0x'||substr(md5(shingle),1,15))::BIGINT,
             |                 t.seed * 2654435769)) AS mh
             |  FROM sh CROSS JOIN generate_series(0, 15) t(seed)
             |  GROUP BY source, t.seed
             |)
             |SELECT a.source AS src_a, b.source AS src_b,
             |       CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_agree,
             |       CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
             |         * 10000 // 16 AS BIGINT) AS est_jaccard_bp
             |FROM sig a JOIN sig b
             |  ON a.seed = b.seed AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // LSH operating-point evaluation on a bounded 300-doc sample:
    // recall and candidate precision of the banded MinHash generation
    // vs brute-force ground truth (the exact n²/2 intersects only a
    // sample affords — exactly how bands/rows get tuned before running
    // the corpus). caught ⊆ true by construction (verify recomputes
    // the same exact Jaccard), so recall_bp is an honest fraction.

    Q("q129_lsh_recall",
      (s, dir) => Dedup.lshRecallReport(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", shingleN = 3, bands = 4, rowsPerBand = 4,
        minJaccardBp = 1000),
      Some(neardupScoredCtes.replaceFirst("FROM documents",
        "FROM (SELECT * FROM documents WHERE doc_id < 300) documents") +
        """, shc2 AS (
          |  SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1
          |), allinter AS (
          |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS ninter
          |  FROM sh a JOIN sh b
          |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |), truep AS (
          |  SELECT i.ia, i.ib
          |  FROM allinter i
          |  JOIN shc2 ca ON ca.doc_id = i.ia
          |  JOIN shc2 cb ON cb.doc_id = i.ib
          |  WHERE CAST(floor(i.ninter * 10000.0
          |          / (ca.nsh + cb.nsh - i.ninter)) AS BIGINT) >= 1000
          |), m AS (
          |  SELECT
          |    (SELECT COUNT(*) FROM truep) AS n_true,
          |    (SELECT COUNT(*) FROM cand) AS n_candidates,
          |    (SELECT COUNT(*) FROM scored WHERE jaccard_bp >= 1000)
          |      AS n_caught
          |)
          |SELECT CAST(n_true AS BIGINT) AS n_true,
          |       CAST(n_candidates AS BIGINT) AS n_candidates,
          |       CAST(n_caught AS BIGINT) AS n_caught,
          |       CASE WHEN n_true = 0 THEN NULL
          |            ELSE CAST(n_caught * 10000 // n_true AS BIGINT)
          |       END AS recall_bp,
          |       CASE WHEN n_candidates = 0 THEN NULL
          |            ELSE CAST(n_caught * 10000 // n_candidates
          |              AS BIGINT)
          |       END AS precision_bp
          |FROM m""".stripMargin)),

    // Count-Min join-size estimate (the CM inner-product estimator) vs
    // the exact cardinality: two 3×256 standing sketches over the two
    // join keys, Σ cells cm_a·cm_b per row minimized over rows — an
    // upper bound by construction (collisions only inflate). Both the
    // estimate AND the exact size are integer-reproducible, so the
    // guaranteed overcount is hash-checked too. The expected inflation
    // is n_a·n_b/width (the estimator's ±ε·n_a·n_b guarantee at
    // ε = e/width): at sf0.01 that is ~15k·60k/256 ≈ 3.5M over an
    // exact 60k — the deliberately narrow width DEMONSTRATES the error
    // scale; production sizes width to the tolerable ε.

    Q("q171_exact_substr_spans",
      (s, dir) => Dedup.exactSubstrSpans(
          Tables.load(s, dir, "documents"), windowWords = 5)
        .orderBy("doc_id", "s"),
      Some(exactSubstrCtes +
        """SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS s,
          |       CAST(MAX(pos) + 5 AS BIGINT) AS e
          |FROM grp GROUP BY doc_id, island
          |ORDER BY doc_id, s""".stripMargin)),

    // Apply the spans: cut every duplicated word range, reassemble the
    // survivors. Full text crosses only the one doc-keyed span join;
    // the filter is pure map-side array work.

    Q("q172_exact_substr_cut",
      (s, dir) => Dedup.exactSubstrCut(
          Tables.load(s, dir, "documents"), windowWords = 5)
        .orderBy("doc_id"),
      Some(exactSubstrCtes +
        """, spans AS (
          |  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 5 AS e
          |  FROM grp GROUP BY doc_id, island
          |), tok AS (
          |  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1)) AS i
          |  FROM d WHERE len(w) > 0
          |), keptw AS (
          |  SELECT t.doc_id, t.i, t.w[t.i + 1] AS word
          |  FROM tok t
          |  WHERE NOT EXISTS (SELECT 1 FROM spans s
          |    WHERE s.doc_id = t.doc_id AND t.i >= s.s AND t.i < s.e)
          |), cutlen AS (
          |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_cut
          |  FROM spans GROUP BY doc_id
          |), clean AS (
          |  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS clean_text
          |  FROM keptw GROUP BY doc_id
          |)
          |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
          |       COALESCE(c.n_cut, 0) AS n_cut,
          |       COALESCE(k.clean_text, '') AS clean_text
          |FROM d
          |LEFT JOIN cutlen c ON c.doc_id = d.doc_id
          |LEFT JOIN clean k ON k.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // HyperLogLog distinct-user estimate per event type (p=9, m=512),
    // next to KMV (q80): registers are engine-portable integer data, the
    // harmonic sum is exact int64, and only the final estimate touches
    // floats (one fixed expression both engines evaluate identically).
    // n_exact rides along so the estimate is self-auditing.

    Q("q180_incremental_substr",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val bounds = Seq((0L, 167L), (167L, 334L), (334L, 1000000L))
        var idx = Dedup.exactSubstrIndex(docs.limit(0), 5)
        val spans = bounds.map { case (lo, hi) =>
          val wave = docs.filter(
            col("doc_id") >= lo && col("doc_id") < hi)
          // probe + fold in ONE pass: the fold's owner table is exactly
          // the combined table the probe joins (and it arrives
          // checkpointed, so wave N+1's standing side is materialized
          // instead of a 2^wave nested re-plan of every earlier wave)
          val (sp, folded) = Dedup.exactSubstrSpansAndFold(idx, wave, 5)
          idx = folded
          sp
        }.reduce(_ unionByName _)
        spans.orderBy("doc_id", "s")
      },
      Some(exactSubstrCtes +
        """SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS s,
          |       CAST(MAX(pos) + 5 AS BIGINT) AS e
          |FROM grp GROUP BY doc_id, island
          |ORDER BY doc_id, s""".stripMargin)),

    // Gazetteer tagging via one compiled Aho-Corasick pass (1975) —
    // nine patterns incl. multi-word phrases, an overlap ("join" ⊂
    // "hash join") and an absent term; the oracle re-derives every tag
    // with per-term substring scans, certifying automaton construction,
    // failure links, and output propagation in one hash match.

    Q("q185_allpairs_join",
      (s, dir) => Dedup.allPairsSimilarityJoin(
          Tables.load(s, dir, "documents"), shingleN = 3,
          minJaccardBp = 3000)
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         CASE WHEN length(trim(text)) = 0
             |              THEN CAST([] AS VARCHAR[])
             |              ELSE string_split_regex(lower(trim(text)),
             |                     '\s+') END AS w
             |  FROM documents
             |), sp AS (
             |  SELECT doc_id, w,
             |         unnest(generate_series(0, len(w) - 3)) AS i
             |  FROM d WHERE len(w) >= 3
             |), shd AS (
             |  SELECT DISTINCT doc_id,
             |         ('0x' || substr(md5(array_to_string(
             |           w[i + 1 : i + 3], ' ')), 1, 15))::BIGINT AS h
             |  FROM sp
             |), sz AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM shd GROUP BY 1
             |), ov AS (
             |  SELECT a.doc_id AS ida, b.doc_id AS idb,
             |         CAST(COUNT(*) AS BIGINT) AS inter
             |  FROM shd a JOIN shd b
             |    ON a.h = b.h AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT ida AS id_a, idb AS id_b,
             |       CAST(inter * 10000
             |         // (za.n + zb.n - inter) AS BIGINT) AS jaccard_bp
             |FROM ov
             |JOIN sz za ON za.doc_id = ida
             |JOIN sz zb ON zb.doc_id = idb
             |WHERE inter * 10000 >= 3000 * (za.n + zb.n - inter)
             |ORDER BY id_a, id_b""".stripMargin)),

    // Winsorization (robust feature scaling): clamp each event's value
    // to its type's [p05, p95] from the sort-free histogram percentiles
    // (q111's rule) — the preprocessing step that stops metric
    // outliers from dominating normalization. Cut frame = one row per
    // type (bounded dim → broadcast); integer grid end to end.

    Q("q194_template_dedup",
      (s, dir) => {
        val enriched = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0,
              concat(lit("invoice customer "), col("doc_id"),
                lit(" amount "), (col("doc_id") * 37) % 1000,
                lit(" thank you")))
              .when(col("doc_id") % 7 === 1,
                concat(lit("receipt customer "), col("doc_id"),
                  lit(" amount "), (col("doc_id") * 37) % 1000,
                  lit(" thank you")))
              .otherwise(concat(col("text"), lit(" order "),
                col("doc_id")))
              .as("text"))
        enriched
          .select(col("doc_id"),
            md5(regexp_replace(col("text"), "[0-9]+", "#"))
              .as("template_fp"))
          .groupBy("template_fp")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("rep_id"))
          .filter(col("n_docs") > 1)
          .orderBy("rep_id")
      },
      Some("""WITH e AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 7 = 0
             |              THEN 'invoice customer '
             |                || CAST(doc_id AS STRING) || ' amount '
             |                || CAST((doc_id * 37) % 1000 AS STRING)
             |                || ' thank you'
             |              WHEN doc_id % 7 = 1
             |              THEN 'receipt customer '
             |                || CAST(doc_id AS STRING) || ' amount '
             |                || CAST((doc_id * 37) % 1000 AS STRING)
             |                || ' thank you'
             |              ELSE text || ' order '
             |                || CAST(doc_id AS STRING)
             |         END AS text
             |  FROM documents
             |), t AS (
             |  SELECT doc_id,
             |         md5(regexp_replace(text, '[0-9]+', '#', 'g'))
             |           AS template_fp
             |  FROM e
             |)
             |SELECT template_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(MIN(doc_id) AS BIGINT) AS rep_id
             |FROM t GROUP BY 1 HAVING COUNT(*) > 1
             |ORDER BY rep_id""".stripMargin)),

    // n-gram novelty vs a reference corpus (the decontamination
    // complement): for each held-out doc, the fraction of its distinct
    // 3-shingles the reference has NEVER seen — low novelty flags
    // derivative/duplicated content, high novelty genuinely new text.
    // One unhinted join against the reference's distinct-shingle set.
  )
}
