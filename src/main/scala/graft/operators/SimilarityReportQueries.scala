package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Embedding-space analysis cards: drift, contrastive/hard-negative mining, ANN bakeoff, MMR diversification, cluster quality.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object SimilarityReportQueries {

  val all: Seq[Q] = Seq(

    Q("q176_hard_negatives",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val qidx = Seq(("q1", 0L), ("q2", 1L), ("q3", 2L))
          .toDF("qid", "r")
        val positives = docs.select(col("doc_id"))
          .crossJoin(broadcast(qidx))
          .filter(pmod(col("doc_id"), lit(100L)) === col("r"))
          .select("qid", "doc_id")
        Retrieval.hardNegatives(docs,
            Seq("q1" -> Seq("spark", "table"),
              "q2" -> Seq("query", "data"),
              "q3" -> Seq("window", "zzz_absent_term")),
            positives, nNeg = 10)
          .orderBy("qid", "neg_rank")
      },
      Some(bm25ScoredCtes +
        """, pos AS (
          |  SELECT q.qid, d.doc_id
          |  FROM (VALUES ('q1', 0), ('q2', 1), ('q3', 2)) q(qid, r)
          |  CROSS JOIN documents d
          |  WHERE d.doc_id % 100 = q.r
          |), bp AS (
          |  SELECT s.qid, MAX(s.score_unats) AS best_pos
          |  FROM sc s JOIN pos p
          |    ON p.qid = s.qid AND p.doc_id = s.doc_id
          |  GROUP BY s.qid
          |), neg AS (
          |  SELECT s.qid, s.doc_id, s.score_unats,
          |         ROW_NUMBER() OVER (PARTITION BY s.qid
          |           ORDER BY s.score_unats DESC, s.doc_id) AS neg_rank
          |  FROM sc s
          |  WHERE NOT EXISTS (SELECT 1 FROM pos p
          |    WHERE p.qid = s.qid AND p.doc_id = s.doc_id)
          |)
          |SELECT n.qid, CAST(n.neg_rank AS BIGINT) AS neg_rank,
          |       n.doc_id, n.score_unats,
          |       CAST(n.score_unats - COALESCE(b.best_pos, 0) AS BIGINT)
          |         AS margin_unats
          |FROM neg n LEFT JOIN bp b ON b.qid = n.qid
          |WHERE n.neg_rank <= 10
          |ORDER BY n.qid, n.neg_rank""".stripMargin)),

    // SFT example packing with loss masks (TRL-style packed instruction
    // tuning): prompt/completion split, 3-special template overhead,
    // contiguous per-source layout at a 1024-token budget, absolute
    // loss-mask spans over completions.

    Q("q184_embedding_drift",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        def pop(r: Int) = graft.functions.Projection.project(
            em.filter(pmod(col("vec_id"), lit(2)) === r), 8, 64)
          .select(posexplode(col("proj")).as(Seq("dim", "pv")))
        Sketches.psiDriftByGroup(pop(0), pop(1), "dim", "pv",
            binWidth = 2000000.0)
          .orderBy("dim", "bin")
      },
      Some {
        s"""WITH qv AS (
           |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
           |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS q
           |  FROM embeddings
           |), pz AS (
           |  SELECT vec_id, vec_id % 2 AS pop,
           |    [${rpProjExprs(8).mkString(",\n  ")}] AS projv
           |  FROM qv
           |), pr AS (
           |  SELECT vec_id, pop, projv,
           |         unnest(generate_series(1, 8)) AS i
           |  FROM pz
           |), px AS (
           |  SELECT pop, CAST(i - 1 AS INT) AS g,
           |         CAST(floor(projv[i] / 2000000.0) AS BIGINT) AS bin
           |  FROM pr
           |), ea AS (
           |  SELECT g, bin, COUNT(*) AS c FROM px WHERE pop = 0
           |  GROUP BY 1, 2
           |), eb AS (
           |  SELECT g, bin, COUNT(*) AS c FROM px WHERE pop = 1
           |  GROUP BY 1, 2
           |), j AS (
           |  SELECT COALESCE(ea.g, eb.g) AS g,
           |         COALESCE(ea.bin, eb.bin) AS bin,
           |         COALESCE(ea.c, 0) AS ca, COALESCE(eb.c, 0) AS cb
           |  FROM ea FULL OUTER JOIN eb
           |    ON ea.g = eb.g AND ea.bin = eb.bin
           |), t AS (
           |  SELECT g, CAST(SUM(ca) AS BIGINT) AS na,
           |         CAST(SUM(cb) AS BIGINT) AS nb,
           |         CAST(COUNT(*) AS BIGINT) AS n_bins
           |  FROM j GROUP BY 1
           |), f AS (
           |  SELECT j.g, j.bin, j.ca, j.cb, t.na, t.nb, t.n_bins,
           |         (j.ca + 1) * (t.nb + t.n_bins) AS x,
           |         (j.cb + 1) * (t.na + t.n_bins) AS y
           |  FROM j JOIN t ON j.g = t.g
           |)
           |SELECT g AS dim, bin, CAST(ca AS BIGINT) AS cnt_a,
           |       CAST(cb AS BIGINT) AS cnt_b,
           |       na AS n_a, nb AS n_b, n_bins,
           |       CAST(x - y AS BIGINT) AS delta_num,
           |       CAST(floor(ln(CAST(x AS DOUBLE) / CAST(y AS DOUBLE))
           |         * 1000) AS BIGINT) AS ln_milli,
           |       CAST((x - y) * CAST(floor(ln(CAST(x AS DOUBLE)
           |         / CAST(y AS DOUBLE)) * 1000) AS BIGINT)
           |         AS BIGINT) AS contrib
           |FROM f ORDER BY 1, 2""".stripMargin
      }),

    // EXACT similarity join via AllPairs prefix filtering (Bayardo
    // 2007) — the zero-false-negative complement of MinHash-LSH
    // (q44): every pair at Jaccard ≥ 0.3 on distinct 3-shingle sets,
    // found without an all-pairs comparison. The oracle is the
    // blocking-FREE shared-token join over the same portable hashes,
    // certifying the prefix candidates missed nothing.

    Q("q196_contrastive_pairs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val clusters = clustersTable(s, dir)
        val pos = clusters.filter(col("id") =!= col("comp"))
          .select(col("comp").as("anchor_id"),
            col("id").as("positive_id"))
        // parallelism floor before the shingle kernel + explode: this
        // query's dominant cost is the exploded (doc, shingle) overlap
        // join fed by the single-task documents scan; the fanned source
        // is one small (id, text) exchange, reused by both tok branches.
        // Measured r19: 1.47-1.76 s -> 1.02 s isolated. (A blanket fan
        // inside Dedup.shingleSets was tried and REVERTED: it cost
        // q246/q247 +2 s each — their foreachBatch waves re-execute the
        // exchange per job — and moved nothing else; this is the one
        // call site where the explode volume makes it pay.)
        val hs = Dedup.shingleSets(
          Tables.fanOut(docs.select(col("doc_id"), col("text")),
            col("doc_id")), "doc_id", "text", 3)
        val tok = hs.select(col("doc_id"), explode(col("hs")).as("h"))
        val anchors = pos.select(col("anchor_id").as("doc_id")).distinct()
        val aTok = tok.join(anchors, Seq("doc_id"))
          .select(col("doc_id").as("a"), col("h"))
        val ov = aTok
          .join(tok.select(col("doc_id").as("b"), col("h")), Seq("h"))
          .filter(col("a") =!= col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        val bComp = clusters.select(col("id").as("b"),
          col("comp").as("bcomp"))
        val w = Window.partitionBy(col("a"))
          .orderBy(desc("inter"), asc("b"))
        val neg = ov.join(bComp, Seq("b"), "left")
          .withColumn("bcomp", coalesce(col("bcomp"), col("b")))
          .filter(col("bcomp") =!= col("a"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("a").as("anchor_id"),
            col("b").as("negative_id"), col("inter").as("neg_overlap"))
        pos.join(neg, Seq("anchor_id"), "left")
          .select(col("anchor_id"), col("positive_id"),
            col("negative_id"), col("neg_overlap"))
          .orderBy("anchor_id", "positive_id")
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
          |), pos AS (
          |  SELECT comp AS anchor_id, id AS positive_id
          |  FROM comps WHERE id <> comp
          |), anc AS (
          |  SELECT DISTINCT anchor_id FROM pos
          |), ov AS (
          |  SELECT sa.doc_id AS a, sb.doc_id AS b,
          |         CAST(COUNT(*) AS BIGINT) AS inter
          |  FROM sh sa
          |  JOIN anc ON anc.anchor_id = sa.doc_id
          |  JOIN sh sb ON sb.shingle = sa.shingle
          |    AND sb.doc_id <> sa.doc_id
          |  GROUP BY 1, 2
          |), bc AS (
          |  SELECT o.a, o.b, o.inter,
          |         COALESCE(c.comp, o.b) AS bcomp
          |  FROM ov o LEFT JOIN comps c ON c.id = o.b
          |), neg AS (
          |  SELECT a, b, inter FROM (
          |    SELECT a, b, inter,
          |           ROW_NUMBER() OVER (PARTITION BY a
          |             ORDER BY inter DESC, b ASC) AS rk
          |    FROM bc WHERE bcomp <> a) WHERE rk = 1
          |)
          |SELECT p.anchor_id, p.positive_id,
          |       n.b AS negative_id, n.inter AS neg_overlap
          |FROM pos p LEFT JOIN neg n ON n.a = p.anchor_id
          |ORDER BY p.anchor_id, p.positive_id""".stripMargin)),

    // Local clustering coefficient over the near-dup graph (Watts &
    // Strogatz 1998): per node, how close its neighbourhood is to a
    // clique — exact basis points, per-node triangle credits from the
    // Schank-Wagner enumeration. The node-grain community signal the
    // global triangle count (q110) averages away.

    Q("q204_ann_bakeoff",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sOuter = s
        import sOuter.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 5)
        val nRow = emb.agg(count(lit(1)).as("n_corpus"))
        // exact cosine top-10 (the IVF/HNSW baseline)
        // NOTE (r19, measured): checkpointing every bake-off component
        // (6 eager localCheckpoints) was TRIED here — it shrank the
        // formatted plan (98 -> 38 Exchanges) but RAN SLOWER (isolated
        // min 3.6 s -> 5.4-5.6 s; in-suite 2.7 -> 3.8): the eager
        // materialization serializes six tiny jobs and forfeits the
        // shared-scan reuse AQE finds inside the one mega-plan. Plan
        // size is not execution time; reverted to the lazy shape.
        val exactCos = Similarity.bruteForceTopK(emb, qs, 10)
          .select(col("query_id"), col("vec_id"))
        // HNSW over the standing index in the CERTIFIED exact regime
        // (corpus-scaled shards, same memo as q137; efSearch from
        // Hnsw.certifiedExactEf so the recall-is-exactly-10000 claim
        // holds at every sf and shard count, not just n <= 4096)
        val nsH = Hnsw.scaledShards(emb)
        val idx = Tables.memoTable(s, dir, s"hnsw_idx_${nsH}s_m8") {
          Hnsw.buildIndex(emb, nShards = nsH, m = 8,
            efConstruction = 64).toDF()
        }.as[graft.functions.HnswNode]
        val hnsw = Hnsw.searchIndex(idx, qs, k = 10,
            efSearch = Hnsw.certifiedEfOr(idx, 4096))
          .select(col("query_id"), col("vec_id"))
        // IVF multi-probe + its measured candidate volume
        val ivf = Similarity.ivfTopKProbed(emb, qs, cells = 8, k = 10,
            nprobe = 2, lloydIters = 1)
          .select(col("query_id"), col("vec_id"))
        val ivfCand = Similarity.ivfProbedCandidateCount(emb, qs,
          cells = 8, nprobe = 2, lloydIters = 1)
        // PQ ADC shortlist → exact rerank, vs the exact-d² baseline
        val cb = Tables.memoTable(s, dir, "pq_cb_8x16") {
          graft.functions.Pq.codebook(emb, nsub = 8, k = 16, dsub = 8,
            lloydIters = 1)
        }
        val codes = graft.functions.Pq.encode(emb, cb, nsub = 8,
          dsub = 8)
        val pq = graft.functions.Pq.adcRerankTopK(codes, cb, emb, qs,
            k = 10, shortlist = 50, nsub = 8, dsub = 8)
          .select(col("query_id"), col("vec_id"))
        val qv = qs.select(col("vec_id").as("query_id"),
          col("embedding").as("qe"))
        val wd = Window.partitionBy(col("query_id"))
          .orderBy(asc("d2"), asc("vec_id"))
        val exactD2 = emb.select(col("vec_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("d2", round(
            Similarity.dotFast(col("qe"), col("qe"))
              - lit(2.0) * Similarity.dotFast(col("qe"), col("ve"))
              + Similarity.dotFast(col("ve"), col("ve")), 6))
          .withColumn("rank", row_number().over(wd))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("vec_id"))
        // measured recall: |approx ∩ exact| over |exact|, exact int64
        def hitsAgg(approx: org.apache.spark.sql.DataFrame,
                    exact: org.apache.spark.sql.DataFrame) =
          exact.join(approx, Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("n_hit"))
            .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        val hnswRow = hitsAgg(hnsw, exactCos).crossJoin(nRow)
          .select(lit("hnsw_ef4096").as("family"),
            lit(5L).as("n_queries"),
            expr("CAST(n_hit * 10000 DIV n_exact AS BIGINT)")
              .as("recall_bp"),
            ((col("n_corpus") - 1) * 5).as("exact_evals"),
            lit(0L).as("approx_evals"))
        val ivfRow = hitsAgg(ivf, exactCos).crossJoin(ivfCand)
          .select(lit("ivf_c8_p2").as("family"),
            lit(5L).as("n_queries"),
            expr("CAST(n_hit * 10000 DIV n_exact AS BIGINT)")
              .as("recall_bp"),
            col("cand_rows").as("exact_evals"),
            lit(40L).as("approx_evals"))
        val pqRow = hitsAgg(pq, exactD2).crossJoin(nRow)
          .select(lit("pq_m8_s50").as("family"),
            lit(5L).as("n_queries"),
            expr("CAST(n_hit * 10000 DIV n_exact AS BIGINT)")
              .as("recall_bp"),
            lit(250L).as("exact_evals"),
            ((col("n_corpus") - 1) * 5).as("approx_evals"))
        hnswRow.unionByName(ivfRow).unionByName(pqRow)
          .orderBy("family")
      },
      Some(ivfLloydCtes + """, scored AS (
             |  SELECT e.vec_id, e.v, c.centroid_id,
             |         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             |           list_dot_product(e.v, c.cv)
             |             / (sqrt(list_dot_product(e.v, e.v))
             |                * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |           c.centroid_id) AS rk
             |  FROM e CROSS JOIN c
             |), asg AS (
             |  SELECT vec_id, v, centroid_id AS cell FROM scored
             |  WHERE rk = 1
             |), q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
             |), cellrank AS (
             |  SELECT q.query_id, q.qv, c.centroid_id AS cell,
             |         ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             |           list_dot_product(q.qv, c.cv)
             |             / (sqrt(list_dot_product(q.qv, q.qv))
             |                * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |           c.centroid_id) AS prk
             |  FROM q CROSS JOIN c
             |), pr AS (
             |  SELECT query_id, qv, cell FROM cellrank WHERE prk <= 2
             |), ivsims AS (
             |  SELECT p.query_id, a.vec_id,
             |         round(list_dot_product(p.qv, a.v)
             |           / (sqrt(list_dot_product(p.qv, p.qv))
             |              * sqrt(list_dot_product(a.v, a.v))), 6) AS sim
             |  FROM asg a JOIN pr p ON a.cell = p.cell
             |   AND a.vec_id <> p.query_id
             |), iv10 AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           ROW_NUMBER() OVER (PARTITION BY query_id
             |             ORDER BY sim DESC, vec_id) AS rk
             |    FROM ivsims) WHERE rk <= 10
             |), ivcand AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS cand_rows
             |  FROM asg a JOIN pr p ON a.cell = p.cell
             |   AND a.vec_id <> p.query_id
             |), exsims AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_dot_product(q.qv, e.v)
             |           / (sqrt(list_dot_product(q.qv, q.qv))
             |              * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
             |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
             |), exc AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           ROW_NUMBER() OVER (PARTITION BY query_id
             |             ORDER BY sim DESC, vec_id) AS rk
             |    FROM exsims) WHERE rk <= 10
             |), """.stripMargin + pqOracleTail + """, qp AS (
             |  SELECT vec_id AS query_id, m, sv AS qv2 FROM sv
             |  WHERE vec_id < 5
             |), dt AS (
             |  SELECT qp.query_id, c.m, c.code,
             |         CAST(floor((list_dot_product(qp.qv2, qp.qv2)
             |           - 2 * list_dot_product(qp.qv2, c.cv)
             |           + list_dot_product(c.cv, c.cv)) * 1000000)
             |           AS BIGINT) AS dq
             |  FROM qp JOIN cb1 c ON qp.m = c.m
             |), ap2 AS (
             |  SELECT d.query_id, x.vec_id,
             |         CAST(SUM(d.dq) AS BIGINT) AS approx_d2_micro
             |  FROM codes x JOIN dt d ON x.m = d.m AND x.code = d.code
             |  WHERE x.vec_id <> d.query_id
             |  GROUP BY 1, 2
             |), sl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           ROW_NUMBER() OVER (PARTITION BY query_id
             |             ORDER BY approx_d2_micro, vec_id) AS rk
             |    FROM ap2) WHERE rk <= 50
             |), pqex AS (
             |  SELECT s.query_id, s.vec_id,
             |         round(list_dot_product(eq.v, eq.v)
             |           - 2 * list_dot_product(eq.v, ex0.v)
             |           + list_dot_product(ex0.v, ex0.v), 6) AS d2
             |  FROM sl s
             |  JOIN e eq ON eq.vec_id = s.query_id
             |  JOIN e ex0 ON ex0.vec_id = s.vec_id
             |), pq10 AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           ROW_NUMBER() OVER (PARTITION BY query_id
             |             ORDER BY d2, vec_id) AS rk
             |    FROM pqex) WHERE rk <= 10
             |), exd2all AS (
             |  SELECT q.query_id, e2.vec_id,
             |         round(list_dot_product(eq.v, eq.v)
             |           - 2 * list_dot_product(eq.v, e2.v)
             |           + list_dot_product(e2.v, e2.v), 6) AS d2
             |  FROM q
             |  JOIN e eq ON eq.vec_id = q.query_id
             |  CROSS JOIN e e2
             |  WHERE e2.vec_id <> q.query_id
             |), exd2 AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           ROW_NUMBER() OVER (PARTITION BY query_id
             |             ORDER BY d2, vec_id) AS rk
             |    FROM exd2all) WHERE rk <= 10
             |), nn AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM e
             |), ivhit AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
             |  FROM exc x JOIN iv10 a
             |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
             |), pqhit AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
             |  FROM exd2 x JOIN pq10 a
             |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
             |), exn AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exc
             |), exn2 AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exd2
             |)
             |SELECT * FROM (
             |  SELECT 'hnsw_ef4096' AS family,
             |         CAST(5 AS BIGINT) AS n_queries,
             |         CAST(10000 AS BIGINT) AS recall_bp,
             |         CAST((nn.n_corpus - 1) * 5 AS BIGINT)
             |           AS exact_evals,
             |         CAST(0 AS BIGINT) AS approx_evals
             |  FROM nn
             |  UNION ALL
             |  SELECT 'ivf_c8_p2', CAST(5 AS BIGINT),
             |         CAST(ivhit.n_hit * 10000 // exn.n_exact AS BIGINT),
             |         ivcand.cand_rows, CAST(40 AS BIGINT)
             |  FROM ivhit, exn, ivcand
             |  UNION ALL
             |  SELECT 'pq_m8_s50', CAST(5 AS BIGINT),
             |         CAST(pqhit.n_hit * 10000 // exn2.n_exact AS BIGINT),
             |         CAST(250 AS BIGINT),
             |         CAST((nn.n_corpus - 1) * 5 AS BIGINT)
             |  FROM pqhit, exn2, nn
             |)
             |ORDER BY family""".stripMargin)),

    // MMR result diversification (Carbonell-Goldstein 1998): greedy
    // re-rank of each query's BM25 top-20 where every pick pays
    // 100·(max 3-shingle Jaccard bp vs the already-picked set) — the
    // search/RAG step that keeps near-duplicate results from crowding
    // a context window. All-integer scoring; the greedy loop runs as a
    // per-query in-memory cogroup kernel over ≤20-candidate /
    // ≤380-pair frames (corpus size never enters the selection). The
    // two pool tables — BM25 top-20 and pairwise shingle Jaccard —
    // are the INDEX artifacts of the query set, memoized as standing
    // frames (the media/ANN standing-index pattern): built once per
    // (session, dir), released/rebuilt through the Standing registry,
    // so repeated serving pays only the bounded selection. Oracle:
    // the identical 5 greedy rounds generated as CTE blocks (the
    // bpeOracleCtes unroll pattern).

    Q("q205_mmr_diversify",
      (s, dir) => {
        val mmrQueries = Seq("q1" -> Seq("spark", "table"),
          "q2" -> Seq("query", "data"),
          "q3" -> Seq("window", "zzz_absent_term"))
        val top = graft.sources.Standing.frame(s, dir, "mmr_q205_top")(
          Retrieval.mmrPoolTop(Tables.load(s, dir, "documents"),
            mmrQueries, pool = 20))
        val sim = graft.sources.Standing.frame(s, dir, "mmr_q205_sim")(
          Retrieval.mmrPoolSim(Tables.load(s, dir, "documents"), top))
        Retrieval.mmrSelect(top, sim, k = 5, simWeight = 100L)
          .orderBy("qid", "pick")
      },
      Some(mmrOracle(5))),

    // Event-type co-occurrence lift (the market-basket association
    // table, Agrawal-Srikant style support/confidence/lift at the
    // user grain): which behaviors coincide in the same users beyond
    // what their base rates predict. One distinct (user, type) frame,
    // one per-user self-join over a SMALL bounded type domain (pair
    // volume = users · types², never events²), exact integer lift in
    // micro-units via staged division (t = n_ab·10⁶ div n_a, then
    // t·n_users div n_b — each stage bounded, no 3-factor product to
    // overflow int64 at fleet user counts).

    Q("q209_cluster_quality",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = Similarity.centroids(emb, k = 8, lloydIters = 1)
        val asg = Similarity.incrementalAssign(cents, emb)
        val coh = asg
          .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          .join(broadcast(cents.select(col("centroid_id").as("cell"),
            col("cv"))), Seq("cell"))
          .withColumn("c_micro",
            floor(round(Similarity.cosine(col("embedding"), col("cv")), 6)
              * lit(1000000L)).cast("long"))
          .groupBy("cell")
          .agg(count(lit(1)).as("n"), sum(col("c_micro")).as("s"))
          .select(col("cell"), col("n"),
            expr("CAST(s DIV n AS BIGINT)").as("cohesion_micro"))
        val sep = cents.select(col("centroid_id").as("cell"),
            col("cv").as("cva"))
          .join(cents.select(col("centroid_id").as("other"),
            col("cv").as("cvb")), col("cell") =!= col("other"))
          .withColumn("c_micro",
            floor(round(Similarity.cosine(col("cva"), col("cvb")), 6)
              * lit(1000000L)).cast("long"))
          .groupBy("cell").agg(max(col("c_micro")).as("separation_micro"))
        coh.join(sep, Seq("cell"))
          .withColumn("db_ratio_bp",
            expr("CASE WHEN cohesion_micro <= 0 THEN CAST(-1 AS BIGINT)" +
              " ELSE CAST(separation_micro * 10000 DIV cohesion_micro" +
              " AS BIGINT) END"))
          .orderBy("cell")
      },
      Some(ivfLloydCtes + """, scored AS (
             |  SELECT e.vec_id, e.v, c.centroid_id,
             |         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             |           list_dot_product(e.v, c.cv)
             |             / (sqrt(list_dot_product(e.v, e.v))
             |                * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |           c.centroid_id) AS rk
             |  FROM e CROSS JOIN c
             |), asg AS (
             |  SELECT vec_id, v, centroid_id AS cell FROM scored
             |  WHERE rk = 1
             |), coh AS (
             |  SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(CAST(floor(round(
             |             list_dot_product(a.v, c.cv)
             |               / (sqrt(list_dot_product(a.v, a.v))
             |                  * sqrt(list_dot_product(c.cv, c.cv))), 6)
             |             * 1000000) AS BIGINT)) AS BIGINT) AS s
             |  FROM asg a JOIN c ON c.centroid_id = a.cell
             |  GROUP BY 1
             |), sep AS (
             |  SELECT a.centroid_id AS cell,
             |         MAX(CAST(floor(round(
             |             list_dot_product(a.cv, b.cv)
             |               / (sqrt(list_dot_product(a.cv, a.cv))
             |                  * sqrt(list_dot_product(b.cv, b.cv))), 6)
             |             * 1000000) AS BIGINT)) AS separation_micro
             |  FROM c a JOIN c b ON a.centroid_id <> b.centroid_id
             |  GROUP BY 1
             |)
             |SELECT coh.cell, coh.n,
             |       CAST(coh.s // coh.n AS BIGINT) AS cohesion_micro,
             |       sep.separation_micro,
             |       CASE WHEN coh.s // coh.n <= 0 THEN CAST(-1 AS BIGINT)
             |            ELSE CAST(sep.separation_micro * 10000
             |              // (coh.s // coh.n) AS BIGINT)
             |       END AS db_ratio_bp
             |FROM coh JOIN sep ON sep.cell = coh.cell
             |ORDER BY coh.cell""".stripMargin)),

    // Margin-based alignment mining (Artetxe & Schwenk, ACL 2019 — the
    // CCMatrix/LASER bitext-mining score): across two corpus halves
    // (vec_id parity as the two "languages"), candidate pairs come from
    // the IVF MULTI-PROBE stage (corpus side = odd half indexed into
    // cells, query side = even half probing its 2 best cells — volume
    // |A|·nprobe·avg-cell, NEVER |A|·|B|), then each candidate scores
    // by cosine RELATIVE to both endpoints' neighborhood density over
    // the same candidate graph — margin = 8·cos(x,y) / (Σtop4 cos(x,·)
    // + Σtop4 cos(y,·)) — and each left vector keeps its best partner.
    // Integer milli-margin via one staged division. Mining
    // neighborhoods from the ANN candidate stage is exactly the
    // production CCMatrix recipe; the oracle replays the IVF training,
    // probes, candidate set, windows and division wholesale.

    Q("q210_margin_mining",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.load(s, dir, "embeddings")
        val a = emb.filter(col("vec_id") % 2 === 0)
        val b = emb.filter(col("vec_id") % 2 === 1)
        // corpus-scaled cells (mult = 2: the odd-half corpus has every
        // second id below the cutoff): candidate volume stays
        // |A|·nprobe·512 instead of |A|·nprobe·(|B|/4) — the r13 sf1
        // run measured the fixed-cutoff version at 44.8× for 10× data
        val cand = Similarity.ivfProbedPairs(b, a,
            cells = Similarity.scaledSeedCutoff(b, mult = 2),
            nprobe = 2, lloydIters = 1)
          .select(col("query_id").as("id_a"), col("vec_id").as("id_b"))
        // localCheckpoint: the scored candidate frame is referenced
        // 3x below (two top-4 windows + the final join) — without it
        // the whole IVF train/assign/probe/cosine chain planned and ran
        // three times (guide §3.3)
        val pairs = cand
          .join(emb.select(col("vec_id").as("id_a"),
            col("embedding").as("va")), Seq("id_a"))
          .join(emb.select(col("vec_id").as("id_b"),
            col("embedding").as("vb")), Seq("id_b"))
          .withColumn("c_micro",
            floor(round(Similarity.cosine(col("va"), col("vb")), 6)
              * lit(1000000L)).cast("long"))
          .select("id_a", "id_b", "c_micro").localCheckpoint()
        val wa = Window.partitionBy(col("id_a"))
          .orderBy(desc("c_micro"), asc("id_b"))
        val wb = Window.partitionBy(col("id_b"))
          .orderBy(desc("c_micro"), asc("id_a"))
        val ranked = pairs
          .withColumn("rka", row_number().over(wa))
          .withColumn("rkb", row_number().over(wb))
        val sumA = ranked.filter(col("rka") <= 4)
          .groupBy("id_a").agg(sum(col("c_micro")).as("s4a"))
        val sumB = ranked.filter(col("rkb") <= 4)
          .groupBy("id_b").agg(sum(col("c_micro")).as("s4b"))
        val w1 = Window.partitionBy(col("id_a"))
          .orderBy(desc("margin_milli"), asc("id_b"))
        pairs.join(sumA, Seq("id_a")).join(sumB, Seq("id_b"))
          .filter(col("s4a") + col("s4b") > 0)
          .withColumn("margin_milli",
            expr("CAST(c_micro * 8000 DIV (s4a + s4b) AS BIGINT)"))
          .withColumn("rk", row_number().over(w1))
          .filter(col("rk") === 1)
          .select(col("id_a"), col("id_b"), col("c_micro"),
            col("margin_milli"))
          .orderBy("id_a")
      },
      Some(ivfLloydCtesOverScaled("WHERE vec_id % 2 = 1", 2) +
        """, allv AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), scored AS (
             |  SELECT e.vec_id, e.v, c.centroid_id,
             |         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             |           list_dot_product(e.v, c.cv)
             |             / (sqrt(list_dot_product(e.v, e.v))
             |                * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |           c.centroid_id) AS rk
             |  FROM e CROSS JOIN c
             |), asg AS (
             |  SELECT vec_id, v, centroid_id AS cell FROM scored
             |  WHERE rk = 1
             |), q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM allv
             |  WHERE vec_id % 2 = 0
             |), cellrank AS (
             |  SELECT q.query_id, q.qv, c.centroid_id AS cell,
             |         ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             |           list_dot_product(q.qv, c.cv)
             |             / (sqrt(list_dot_product(q.qv, q.qv))
             |                * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |           c.centroid_id) AS prk
             |  FROM q CROSS JOIN c
             |), pr AS (
             |  SELECT query_id, qv, cell FROM cellrank WHERE prk <= 2
             |), prs AS (
             |  SELECT p.query_id AS id_a, a.vec_id AS id_b,
             |         CAST(floor(round(list_dot_product(p.qv, a.v)
             |             / (sqrt(list_dot_product(p.qv, p.qv))
             |                * sqrt(list_dot_product(a.v, a.v))), 6)
             |           * 1000000) AS BIGINT) AS c_micro
             |  FROM asg a JOIN pr p ON a.cell = p.cell
             |   AND a.vec_id <> p.query_id
             |), ranked AS (
             |  SELECT id_a, id_b, c_micro,
             |         ROW_NUMBER() OVER (PARTITION BY id_a
             |           ORDER BY c_micro DESC, id_b) AS rka,
             |         ROW_NUMBER() OVER (PARTITION BY id_b
             |           ORDER BY c_micro DESC, id_a) AS rkb
             |  FROM prs
             |), sa AS (
             |  SELECT id_a, CAST(SUM(c_micro) AS BIGINT) AS s4a
             |  FROM ranked WHERE rka <= 4 GROUP BY 1
             |), sb AS (
             |  SELECT id_b, CAST(SUM(c_micro) AS BIGINT) AS s4b
             |  FROM ranked WHERE rkb <= 4 GROUP BY 1
             |), m AS (
             |  SELECT p.id_a, p.id_b, p.c_micro,
             |         CAST(p.c_micro * 8000 // (sa.s4a + sb.s4b)
             |           AS BIGINT) AS margin_milli,
             |         ROW_NUMBER() OVER (PARTITION BY p.id_a ORDER BY
             |           CAST(p.c_micro * 8000 // (sa.s4a + sb.s4b)
             |             AS BIGINT) DESC, p.id_b) AS rk
             |  FROM prs p
             |  JOIN sa ON sa.id_a = p.id_a
             |  JOIN sb ON sb.id_b = p.id_b
             |  WHERE sa.s4a + sb.s4b > 0
             |)
             |SELECT id_a, id_b, c_micro, margin_milli FROM m
             |WHERE rk = 1 ORDER BY id_a""".stripMargin)),

    // Time-decayed engagement score: Σ type-weight · 2^-(age/halflife)
    // per user, with the decay EXACT INTEGER — micro-unit weight
    // right-shifted by whole half-lives (7 days), shift capped at 40 —
    // so no pow()/exp() cross-libm drift can enter the compare surface
    // (the float-free analogue of the exponential-decay feature every
    // engagement model keeps). Reference "now" = the corpus max ts, a
    // 1-row broadcast (deterministic replay, the A5 scalar pattern).

    Q("q260_embedding_norms",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(floor(sqrt(Similarity.dotFast(col("embedding"),
            col("embedding"))) * 10).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        .orderBy("bucket"),
      Some("""WITH e AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |)
             |SELECT CAST(floor(sqrt(list_dot_product(v, v)) * 10)
             |         AS BIGINT) AS bucket,
             |       CAST(COUNT(*) AS BIGINT) AS n_vecs
             |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-dimension embedding health profile: mean and variance of
    // each coordinate in exact integer micro-units (values quantized
    // to micro BEFORE any sum — float sums are order-ambiguous, the
    // q83 rule; Σq² staged DECIMAL/HUGEINT so the variance formula is
    // overflow-free at any corpus size). A dead dimension (zero
    // variance) or an off-center one (|mean| ≫ siblings) is the
    // feature-collapse signal that degrades every downstream ANN
    // surface. Volume: one posexplode + a dims-sized aggregate.

    Q("q261_embedding_dims",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim").cast("long").as("dim"),
          floor(col("x").cast("double") * 1e6).cast("long").as("q"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"),
          sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("sq2"))
        .select(col("dim"), col("n"),
          expr("sq div n").as("mean_micro"),
          expr("CAST((n * sq2 - CAST(sq AS DECIMAL(38,0)) * sq)" +
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
            .as("var_micro2"))
        .orderBy("dim"),
      Some("""WITH x AS (
             |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             |         CAST(floor(CAST(unnest(embedding) AS DOUBLE)
             |           * 1000000) AS BIGINT) AS q
             |  FROM embeddings
             |), a AS (
             |  SELECT CAST(dim AS BIGINT) AS dim,
             |         CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(q) AS BIGINT) AS sq,
             |         SUM(CAST(q AS HUGEINT) * q) AS sq2
             |  FROM x GROUP BY 1
             |)
             |SELECT dim, n, CAST(sq // n AS BIGINT) AS mean_micro,
             |       CAST((n * sq2 - CAST(sq AS HUGEINT) * sq)
             |         // (CAST(n AS HUGEINT) * n) AS BIGINT)
             |         AS var_micro2
             |FROM a ORDER BY dim""".stripMargin)),

    // RFM user segmentation — the classical lifecycle card (recency /
    // frequency / monetary, direct-marketing canon): each user lands
    // in a 3×3×3 cell by days-since-last-event, event count, and
    // purchase mass in exact cents (value floored to cents per event
    // BEFORE the sum — the q83 rule; no double ever aggregates).
    // Reference "now" = corpus max ts (1-row broadcast, the q211
    // rule). One user-grain aggregate + a 27-cell rollup.

    Q("q279_embedding_contrast",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        e.filter(col("vec_id") % 2 === 0).as("a")
          .join(e.filter(col("vec_id") % 2 === 1).as("b"),
            col("a.vec_id") + 1 === col("b.vec_id"))
          .select(floor(
            Similarity.dotFast(col("a.embedding"), col("b.embedding"))
              / (sqrt(Similarity.dotFast(col("a.embedding"),
                  col("a.embedding")))
                * sqrt(Similarity.dotFast(col("b.embedding"),
                  col("b.embedding")))) * 10).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
          .orderBy("bucket")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), p AS (
             |  SELECT a.v AS va, b.v AS vb
             |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
             |  WHERE a.vec_id % 2 = 0
             |)
             |SELECT CAST(floor(list_dot_product(va, vb)
             |         / (sqrt(list_dot_product(va, va))
             |           * sqrt(list_dot_product(vb, vb))) * 10)
             |         AS BIGINT) AS bucket,
             |       CAST(COUNT(*) AS BIGINT) AS n_pairs
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weekly user-churn card — the growth dashboard's retention
    // number: per ISO-week-start, active users, how many of them
    // return the NEXT week, and churn in bp (epoch-day // 7 weeks —
    // timezone-free integer arithmetic; the final week reports -1,
    // not a fake 100% churn, since its "next week" lies outside the
    // data). One distinct (user, week) spine, one self-join at the
    // week offset, weeks-sized output.
  )
}
