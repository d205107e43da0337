package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Dedup observability cards: cluster-size reports, dup-rate matrices, LSH parameter sweeps, contamination matrices.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object DedupReportQueries {

  val all: Seq[Q] = Seq(

    Q("q199_cluster_sizes",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val comp = docs.select(col("doc_id"))
          .join(clustersTable(s, dir),
            docs("doc_id") === col("id"), "left")
          .select(coalesce(col("comp"), col("doc_id")).as("comp"))
        comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("cluster_size")).as("n_docs"))
          .orderBy("cluster_size")
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
          |  SELECT w.id, e.dst FROM walk w JOIN edges e
          |  ON w.reach = e.src
          |), comps AS (
          |  SELECT id, MIN(reach) AS comp FROM walk GROUP BY id
          |), assigned AS (
          |  SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp
          |  FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
          |), sizes AS (
          |  SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |  FROM assigned GROUP BY 1
          |)
          |SELECT cluster_size,
          |       CAST(COUNT(*) AS BIGINT) AS n_clusters,
          |       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
          |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HLL set operations: audience overlap between every event-type
    // pair from the STANDING register table — union via max-merged
    // registers (the union sketch IS the sketch of the union),
    // intersection by inclusion-exclusion, the exact distinct count
    // riding along as the audit column. No event data is rescanned
    // for any pair.

    Q("q219_cluster_size_histogram",
      (s, dir) => {
        val sizes = clustersTable(s, dir)
          .groupBy("comp").agg(count(lit(1)).as("size"))
        sizes.groupBy("size")
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("size")).as("n_docs"))
          .orderBy("size")
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
          |), sz AS (
          |  SELECT comp, CAST(COUNT(*) AS BIGINT) AS size
          |  FROM comp GROUP BY comp
          |)
          |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
          |       CAST(SUM(size) AS BIGINT) AS n_docs
          |FROM sz GROUP BY size ORDER BY size""".stripMargin)),

    // Duplication rate BY SOURCE — which feeds are copying: per source,
    // docs sitting in a near-dup cluster (member grain), the docs the
    // dedup materialization would drop (non-representative members),
    // and both as basis points of the source's corpus share. The
    // provenance-level signal that decides whether to fix a crawler or
    // a mirror list. Cluster membership comes from the memoized
    // standing table; the per-source rollup is one broadcast-sized
    // join (cluster table ≤ candidate pairs) + one aggregate.

    Q("q220_dup_rate_by_source",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
        val members = clustersTable(s, dir)
        val flags = docs
          .join(members.select(col("id").as("doc_id"),
            col("comp")), Seq("doc_id"), "left")
          .select(col("source"),
            when(col("comp").isNotNull, 1L).otherwise(0L)
              .as("in_cluster"),
            when(col("comp").isNotNull
              && col("comp") =!= col("doc_id"), 1L).otherwise(0L)
              .as("dropped"))
        flags.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("in_cluster")).as("n_clustered"),
            sum(col("dropped")).as("n_dropped"))
          .select(col("source"), col("n_docs"), col("n_clustered"),
            col("n_dropped"),
            expr("n_clustered * 10000 div n_docs").as("clustered_bp"),
            expr("n_dropped * 10000 div n_docs").as("dropped_bp"))
          .orderBy("source")
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
          |), fl AS (
          |  SELECT dd.source,
          |         CASE WHEN c.comp IS NOT NULL THEN 1 ELSE 0 END
          |           AS in_cluster,
          |         CASE WHEN c.comp IS NOT NULL
          |              AND c.comp <> dd.doc_id THEN 1 ELSE 0 END
          |           AS dropped
          |  FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id
          |)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(SUM(in_cluster) AS BIGINT) AS n_clustered,
          |       CAST(SUM(dropped) AS BIGINT) AS n_dropped,
          |       CAST(SUM(in_cluster) * 10000 // COUNT(*) AS BIGINT)
          |         AS clustered_bp,
          |       CAST(SUM(dropped) * 10000 // COUNT(*) AS BIGINT)
          |         AS dropped_bp
          |FROM fl GROUP BY source ORDER BY source""".stripMargin)),

    // Per-type traffic burstiness: the index of dispersion
    // (variance/mean) of DAILY event counts — ≈1e6 micro for
    // Poisson-like organic traffic, far above it for bursty/bot-driven
    // types, far below for rate-limited ones. ENTIRELY integer:
    // var/mean = (n·Σc² − (Σc)²) / (n·Σc) over exact daily counts, so
    // no float ever exists on the compare surface (stricter than the
    // ln-based cards); Σc² accumulates in DECIMAL/HUGEINT so per-day
    // counts can reach int32-squared scale without overflow. Volume:
    // one (type, day) aggregate — the q202 daily grain — then a
    // types-sized rollup.

    Q("q227_dedup_token_savings",
      (s, dir) => {
        val nw = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            when(length(trim(col("text"))) === 0, 0L)
              .otherwise(size(split(trim(col("text")), "\\s+"))
                .cast("long")).as("nw"))
        val members = clustersTable(s, dir)
        nw.join(members.select(col("id").as("doc_id"), col("comp")),
            Seq("doc_id"), "left")
          .select(col("source"), col("nw"),
            when(col("comp").isNotNull
              && col("comp") =!= col("doc_id"), col("nw"))
              .otherwise(lit(0L)).as("nw_dropped"))
          .groupBy("source")
          .agg(sum(col("nw")).as("tokens"),
            sum(col("nw_dropped")).as("tokens_dropped"))
          .select(col("source"), col("tokens"), col("tokens_dropped"),
            expr("CASE WHEN tokens = 0 THEN CAST(-1 AS BIGINT)" +
              " ELSE tokens_dropped * 10000 div tokens END")
              .as("savings_bp"))
          .orderBy("source")
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
          |), tw AS (
          |  SELECT dd.source,
          |         CAST(CASE WHEN length(trim(dd.text)) = 0 THEN 0
          |              ELSE len(string_split_regex(trim(dd.text),
          |                       '\s+')) END AS BIGINT) AS nw,
          |         CASE WHEN c.comp IS NOT NULL
          |              AND c.comp <> dd.doc_id THEN 1 ELSE 0 END
          |           AS dropped
          |  FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id
          |)
          |SELECT source, CAST(SUM(nw) AS BIGINT) AS tokens,
          |       CAST(SUM(CASE WHEN dropped = 1 THEN nw ELSE 0 END)
          |         AS BIGINT) AS tokens_dropped,
          |       CAST(CASE WHEN SUM(nw) = 0 THEN -1
          |         ELSE SUM(CASE WHEN dropped = 1 THEN nw ELSE 0 END)
          |           * 10000 // SUM(nw) END AS BIGINT) AS savings_bp
          |FROM tw GROUP BY source ORDER BY source""".stripMargin)),

    // Incremental novelty: the q226 curve answered from a STANDING
    // (bigram → first-occurrence doc) table maintained by folding a
    // batch in — min is associative/idempotent, so folded ≡ rebuilt
    // whatever the batch split (the q119 mergeDegrees discipline at
    // the vocabulary grain: history is never re-tokenized; a batch
    // contributes one bounded (bigram, min) aggregate and a min-merge
    // against standing). The oracle is q226's ONE-SHOT chain, so the
    // fold's equivalence is hash-certified cross-engine.

    Q("q232_contamination_matrix",
      (s, dir) => {
        // fanOut: the shingle explode is the query's dominant kernel and
        // the documents scan is one task at bench scale (guide §2.5) —
        // spread it across the session's cores before the explode
        val ss = Tables.fanOut(Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("text")),
            col("doc_id"))
          .select(col("source"),
            explode(Dedup.shingles(col("text"), 3)).as("sh"))
          .distinct()
          .localCheckpoint() // totals + both join sides read it
        val totals = ss.groupBy("source").agg(count(lit(1)).as("n_sh"))
        val shared = ss.as("a")
          .join(ss.as("b"),
            col("a.sh") === col("b.sh") &&
              col("a.source") =!= col("b.source"))
          .groupBy(col("a.source").as("src"),
            col("b.source").as("other"))
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(broadcast(totals.withColumnRenamed("source", "src")),
            Seq("src"))
          .select(col("src"), col("other"), col("n_shared"), col("n_sh"),
            expr("n_shared * 10000 div n_sh").as("contained_bp"))
          .orderBy("src", "other")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, source, generate_subscripts(w, 1) AS i,
             |         unnest(w) AS tk, len(w) AS n
             |  FROM tok
             |), sh0 AS (
             |  SELECT doc_id, source, i, n,
             |         tk || ' ' || lead(tk, 1) OVER win || ' ' ||
             |           lead(tk, 2) OVER win AS sh
             |  FROM tr WINDOW win AS (PARTITION BY doc_id ORDER BY i)
             |), ss AS (
             |  SELECT DISTINCT source, sh FROM sh0 WHERE i <= n - 2
             |), tot AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
             |  FROM ss GROUP BY 1
             |), shr AS (
             |  SELECT a.source AS src, b.source AS other,
             |         CAST(COUNT(*) AS BIGINT) AS n_shared
             |  FROM ss a JOIN ss b
             |    ON a.sh = b.sh AND a.source <> b.source
             |  GROUP BY 1, 2
             |)
             |SELECT s.src, s.other, s.n_shared, t.n_sh,
             |       CAST(s.n_shared * 10000 // t.n_sh AS BIGINT)
             |         AS contained_bp
             |FROM shr s JOIN tot t ON t.source = s.src
             |ORDER BY s.src, s.other""".stripMargin)),

    // Quality-classifier CALIBRATION card: the cheap map-side alpha
    // score (q23's classifier) bucketed into fixed 1000-bp bins, with
    // the full Gopher gate (q151) as the reference label per bin —
    // n_docs, n_pass, pass rate in bp. A well-calibrated cheap score
    // shows pass-rate rising monotonically with the bin; a flat curve
    // means the cheap score adds nothing over random and gating on it
    // throws away good data. Two map-side passes over the text (census
    // + gopher, the qualityBatch cost shape) joined on doc_id, then one
    // ≤11-row aggregate; zero-doc bins can't exist (group keys come
    // from rows).

    Q("q239_lsh_parameter_sweep",
      (s, dir) => {
        val k = 12
        val settings = Seq((6, 2), (4, 3), (3, 4), (2, 6))
        def theoryPpm(b: Int, r: Int): Long = {
          val den = BigInt(2).pow(r * b)
          val num = den - (BigInt(2).pow(r) - 1).pow(b)
          (num * 1000000 / den).toLong
        }
        val docs = Tables.load(s, dir, "documents")
        val sigs = docs.select(col("doc_id"),
            Dedup.minhashSignatureFast(col("text"), 3, k).as("sig"))
          .filter(size(col("sig")) > 0)
          .localCheckpoint() // one band branch per setting reads it
        val sh = docs.select(col("doc_id"),
            Dedup.shingleHashesFast(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint() // the pair-verify side, built once
        val cands = settings.map { case (nb, nr) =>
          val bands = sigs.select(col("doc_id"), explode(expr(
              s"transform(sequence(0, ${nb - 1}), g -> struct(g AS g, " +
                s"array_join(transform(slice(sig, g * $nr + 1, $nr), " +
                "x -> cast(x AS string)), ',') AS bv))")).as("e"))
            .select(col("doc_id"), col("e.g").as("g"),
              col("e.bv").as("bv"))
          bands.as("x").join(bands.as("y"),
              col("x.g") === col("y.g") && col("x.bv") === col("y.bv") &&
                col("x.doc_id") < col("y.doc_id"))
            .select(lit(nb).as("b"), lit(nr).as("r"),
              col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
            .distinct()
        }.reduce(_ unionByName _)
        val scored = cands.select("ia", "ib").distinct()
          .join(sh.as("x"), col("ia") === col("x.doc_id"))
          .join(sh.as("y"), col("ib") === col("y.doc_id"))
          .select(col("ia"), col("ib"),
            Dedup.sortedIntersectCount(col("x.sh"), col("y.sh"))
              .as("ni"),
            (size(col("x.sh")) + size(col("y.sh"))).as("nt"))
          .select(col("ia"), col("ib"),
            floor(col("ni") * lit(10000.0) / (col("nt") - col("ni")))
              .cast("long").as("j_bp"))
        val spark2 = s; import spark2.implicits._
        val th = settings.map { case (nb, nr) =>
          (nb, nr, theoryPpm(nb, nr)) }.toDF("b", "r", "theory_ppm")
        cands.join(scored, Seq("ia", "ib"))
          .groupBy("b", "r")
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("j_bp") >= 5000, 1L).otherwise(0L))
              .as("n_good"))
          .join(broadcast(th), Seq("b", "r"))
          .select(col("b"), col("r"), col("n_cand"), col("n_good"),
            expr("CASE WHEN n_cand = 0 THEN -1" +
              " ELSE n_good * 10000 div n_cand END").as("precision_bp"),
            col("theory_ppm"))
          .orderBy("r")
      },
      Some {
        val settings = Seq((6, 2), (4, 3), (3, 4), (2, 6))
        def theoryPpm(b: Int, r: Int): Long = {
          val den = BigInt(2).pow(r * b)
          val num = den - (BigInt(2).pow(r) - 1).pow(b)
          (num * 1000000 / den).toLong
        }
        val bandBlocks = settings.map { case (nb, nr) =>
          s""", bands_${nb}_$nr AS (
             |  SELECT doc_id, seed // $nr AS g,
             |         array_to_string(list(CAST(mh AS STRING)
             |           ORDER BY seed), ',') AS bv
             |  FROM mh GROUP BY doc_id, seed // $nr
             |), cand_${nb}_$nr AS (
             |  SELECT DISTINCT $nb AS b, $nr AS r,
             |         x.doc_id AS ia, y.doc_id AS ib
             |  FROM bands_${nb}_$nr x JOIN bands_${nb}_$nr y
             |    ON x.g = y.g AND x.bv = y.bv
             |   AND x.doc_id < y.doc_id
             |)""".stripMargin
        }.mkString
        val candUnion = settings.map { case (nb, nr) =>
          s"SELECT * FROM cand_${nb}_$nr" }
          .mkString("\n  UNION ALL ")
        val thValues = settings.map { case (nb, nr) =>
          s"($nb, $nr, ${theoryPpm(nb, nr)})" }.mkString(", ")
        s"""WITH tok AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           |  FROM documents
           |), tr AS (
           |  SELECT doc_id, generate_subscripts(w, 1) AS i,
           |         unnest(w) AS tok, len(w) AS n
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
           |), mh AS (
           |  SELECT doc_id, CAST(t.seed AS INTEGER) AS seed,
           |         MIN(xor(('0x'||substr(md5(shingle),1,15))::BIGINT,
           |                 t.seed * 2654435769)) AS mh
           |  FROM sh CROSS JOIN generate_series(0, 11) t(seed)
           |  GROUP BY doc_id, t.seed
           |)$bandBlocks, cu AS (
           |  $candUnion
           |), pr AS (
           |  SELECT DISTINCT ia, ib FROM cu
           |), inter AS (
           |  SELECT p.ia, p.ib, COUNT(*) AS ninter
           |  FROM pr p
           |  JOIN sh sa ON sa.doc_id = p.ia
           |  JOIN sh sb ON sb.doc_id = p.ib AND sb.shingle = sa.shingle
           |  GROUP BY p.ia, p.ib
           |), j AS (
           |  SELECT p.ia, p.ib,
           |         CAST(floor(COALESCE(i.ninter, 0) * 10000.0
           |           / (ca.nsh + cb.nsh - COALESCE(i.ninter, 0)))
           |           AS BIGINT) AS j_bp
           |  FROM pr p
           |  JOIN shc ca ON ca.doc_id = p.ia
           |  JOIN shc cb ON cb.doc_id = p.ib
           |  LEFT JOIN inter i ON i.ia = p.ia AND i.ib = p.ib
           |)
           |SELECT CAST(c.b AS INTEGER) AS b, CAST(c.r AS INTEGER) AS r,
           |       CAST(COUNT(*) AS BIGINT) AS n_cand,
           |       CAST(SUM(CASE WHEN j.j_bp >= 5000 THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_good,
           |       CAST(CASE WHEN COUNT(*) = 0 THEN -1
           |         ELSE SUM(CASE WHEN j.j_bp >= 5000 THEN 1 ELSE 0 END)
           |           * 10000 // COUNT(*) END AS BIGINT) AS precision_bp,
           |       CAST(th.theory_ppm AS BIGINT) AS theory_ppm
           |FROM cu c
           |JOIN j ON j.ia = c.ia AND j.ib = c.ib
           |JOIN (VALUES $thValues) th(b, r, theory_ppm)
           |  ON th.b = c.b AND th.r = c.r
           |GROUP BY c.b, c.r, th.theory_ppm
           |ORDER BY c.r""".stripMargin
      }),

    // Binned two-sample Kolmogorov-Smirnov drift between the month's
    // two halves of the event value distribution — the max-CDF-gap
    // companion to q121's PSI (PSI is an average-divergence card and
    // saturates on tail mass; KS localizes WHERE the distributions
    // pull apart and is the classical drift alarm). Exact integers end
    // to end: per-bin counts, cumulative folds over the BOUNDED bin
    // domain (value-range/binWidth buckets — the q121 bin contract;
    // the no-partition window runs on that bin-domain-sized frame,
    // never on rows), and the gap in ppm via HUGEINT/DECIMAL staging
    // so cum·n products cannot overflow at any corpus size. Ties on
    // the max gap break to the smallest bin (struct-max on
    // (gap, -bin) both engines).

    Q("q255_minhash_calibration",
      (s, dir) => {
        val k = 16
        val docs = Tables.load(s, dir, "documents")
        val sigs = docs.select(col("doc_id"),
            Dedup.minhashSignatureFast(col("text"), 3, k).as("sig"))
          .filter(size(col("sig")) > 0)
          .localCheckpoint() // bands + the agreement join read it
        val sh = docs.select(col("doc_id"),
            Dedup.shingleHashesFast(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint()
        val bands = sigs.select(col("doc_id"), explode(expr(
            "transform(sequence(0, 3), g -> struct(g AS g, " +
              "array_join(transform(slice(sig, g * 4 + 1, 4), " +
              "x -> cast(x AS string)), ',') AS bv))")).as("e"))
          .select(col("doc_id"), col("e.g").as("g"), col("e.bv").as("bv"))
        val cands = bands.as("x").join(bands.as("y"),
            col("x.g") === col("y.g") && col("x.bv") === col("y.bv") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
          .distinct()
        cands
          .join(sigs.as("sa"), col("ia") === col("sa.doc_id"))
          .join(sigs.as("sb"), col("ib") === col("sb.doc_id"))
          .select(col("ia"), col("ib"),
            expr("aggregate(zip_with(sa.sig, sb.sig, " +
              "(x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END), " +
              "0L, (acc, v) -> acc + v)").as("m"))
          .join(sh.as("ha"), col("ia") === col("ha.doc_id"))
          .join(sh.as("hb"), col("ib") === col("hb.doc_id"))
          .select(col("m"),
            Dedup.sortedIntersectCount(col("ha.sh"), col("hb.sh"))
              .as("ni"),
            (size(col("ha.sh")) + size(col("hb.sh"))).as("nt"))
          .select(col("m"),
            floor(col("ni") * lit(10000.0) / (col("nt") - col("ni")))
              .cast("long").as("j_bp"))
          .groupBy("m")
          .agg(count(lit(1)).as("n_pairs"), sum("j_bp").as("sj"))
          .select(col("m"), col("n_pairs"),
            (col("m") * lit(625L)).as("est_bp"),
            expr("sj div n_pairs").as("mean_exact_bp"))
          .orderBy("m")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents
             |), tr AS (
             |  SELECT doc_id, generate_subscripts(w, 1) AS i,
             |         unnest(w) AS tok, len(w) AS n
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
             |), mh AS (
             |  SELECT doc_id, CAST(t.seed AS INTEGER) AS seed,
             |         MIN(xor(('0x'||substr(md5(shingle),1,15))::BIGINT,
             |                 t.seed * 2654435769)) AS mh
             |  FROM sh CROSS JOIN generate_series(0, 15) t(seed)
             |  GROUP BY doc_id, t.seed
             |), bands AS (
             |  SELECT doc_id, seed // 4 AS g,
             |         array_to_string(list(CAST(mh AS STRING)
             |           ORDER BY seed), ',') AS bv
             |  FROM mh GROUP BY doc_id, seed // 4
             |), pr AS (
             |  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
             |  FROM bands x JOIN bands y
             |    ON x.g = y.g AND x.bv = y.bv AND x.doc_id < y.doc_id
             |), agree AS (
             |  SELECT p.ia, p.ib,
             |         CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
             |           AS BIGINT) AS m
             |  FROM pr p
             |  JOIN mh a ON a.doc_id = p.ia
             |  JOIN mh b ON b.doc_id = p.ib AND b.seed = a.seed
             |  GROUP BY 1, 2
             |), inter AS (
             |  SELECT p.ia, p.ib, COUNT(*) AS ninter
             |  FROM pr p
             |  JOIN sh sa ON sa.doc_id = p.ia
             |  JOIN sh sb ON sb.doc_id = p.ib AND sb.shingle = sa.shingle
             |  GROUP BY 1, 2
             |), j AS (
             |  SELECT p.ia, p.ib,
             |         CAST(floor(COALESCE(i.ninter, 0) * 10000.0
             |           / (ca.nsh + cb.nsh - COALESCE(i.ninter, 0)))
             |           AS BIGINT) AS j_bp
             |  FROM pr p
             |  JOIN shc ca ON ca.doc_id = p.ia
             |  JOIN shc cb ON cb.doc_id = p.ib
             |  LEFT JOIN inter i ON i.ia = p.ia AND i.ib = p.ib
             |)
             |SELECT a.m, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |       CAST(a.m * 625 AS BIGINT) AS est_bp,
             |       CAST(SUM(j.j_bp) // COUNT(*) AS BIGINT)
             |         AS mean_exact_bp
             |FROM agree a JOIN j ON j.ia = a.ia AND j.ib = a.ib
             |GROUP BY a.m ORDER BY a.m""".stripMargin)),

    // Cross-source near-dup PAIR matrix — which source PAIRS
    // co-duplicate: per unordered source pair, the near-dup pairs
    // straddling them (or within, on the diagonal) with count and mean
    // exact Jaccard. The mirror-detection grain between q220 (how much
    // each source duplicates, no counterpart named), q128 (full-vocab
    // sketch overlap) and q232 (verbatim passage flow): a heavy
    // off-diagonal cell = one feed mirroring another; a heavy diagonal
    // = internal boilerplate. Pair volume is the LSH candidate set;
    // the source join is a broadcast of the doc spine.

    Q("q256_neardup_source_matrix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        Dedup.nearDuplicatesPortable(docs, "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4,
            minJaccardBp = 2000)
          .join(broadcast(src.as("a")), col("id_a") === col("a.doc_id"))
          .join(broadcast(src.as("b")), col("id_b") === col("b.doc_id"))
          .select(least(col("a.source"), col("b.source")).as("src_a"),
            greatest(col("a.source"), col("b.source")).as("src_b"),
            col("jaccard_bp"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_pairs"), sum("jaccard_bp").as("sj"))
          .select(col("src_a"), col("src_b"), col("n_pairs"),
            expr("sj div n_pairs").as("mean_jaccard_bp"))
          .orderBy("src_a", "src_b")
      },
      Some(neardupScoredCtes +
        """, sp AS (
          |  SELECT s.id_a, s.id_b, s.jaccard_bp,
          |         least(da.source, db.source) AS src_a,
          |         greatest(da.source, db.source) AS src_b
          |  FROM scored s
          |  JOIN documents da ON da.doc_id = s.id_a
          |  JOIN documents db ON db.doc_id = s.id_b
          |  WHERE s.jaccard_bp >= 2000
          |)
          |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          |       CAST(SUM(jaccard_bp) // COUNT(*) AS BIGINT)
          |         AS mean_jaccard_bp
          |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Function-word (stopword) profile distance between sources — the
    // authorship/register signal: content words say what a feed talks
    // ABOUT (q223's grain), function-word rates say HOW it writes
    // (register/genre; they survive topic shifts, the classical
    // stylometry feature since Mosteller-Wallace 1964). Per unordered
    // source pair, the L1 distance between 8-dim Gopher-stopword rate
    // profiles in exact ppm — near-zero distance across "different"
    // feeds is one writer/pipeline wearing two names. One token-grain
    // filtered aggregate; everything after is sources²·8-sized.
  )
}
