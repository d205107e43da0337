package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._

/** Graph + record linkage: PageRank, triangles, k-core, clustering coefficients, fuzzy-match entity resolution and golden records.
  *
  * One domain registry of the extension surface; composed (in the
  * original, order-stable sequence) by [[ExtensionQueries.all]].
  */
object GraphQueries {

  val all: Seq[Q] = Seq(

    Q("q82_pagerank",
      (s, dir) => Graph.pagerank(
          Dedup.nearDuplicatesPortable(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4, minJaccardBp = 2000)
            .select("id_a", "id_b"),
          iters = 3)
        .orderBy("id"),
      Some(neardupScoredCtes +
        """, pairs AS (
          |  SELECT id_a, id_b FROM scored WHERE jaccard_bp >= 2000
          |), edges AS (
          |  SELECT id_a AS src, id_b AS dst FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs
          |), deg AS (
          |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          |  FROM edges GROUP BY src
          |), nn AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg
          |), pr0 AS (
          |  SELECT src AS id, 1000000000000 // n_nodes AS pr
          |  FROM deg, nn
          |), it1 AS (
          |  SELECT e.dst AS id, SUM(p.pr // d.deg) AS s
          |  FROM edges e
          |  JOIN pr0 p ON p.id = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |), pr1 AS (
          |  SELECT p.id, ((15 * 1000000000000 // 100) // nn.n_nodes)
          |           + ((85 * COALESCE(i.s, 0)) // 100) AS pr
          |  FROM pr0 p LEFT JOIN it1 i ON i.id = p.id, nn
          |), it2 AS (
          |  SELECT e.dst AS id, SUM(p.pr // d.deg) AS s
          |  FROM edges e
          |  JOIN pr1 p ON p.id = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |), pr2 AS (
          |  SELECT p.id, ((15 * 1000000000000 // 100) // nn.n_nodes)
          |           + ((85 * COALESCE(i.s, 0)) // 100) AS pr
          |  FROM pr1 p LEFT JOIN it2 i ON i.id = p.id, nn
          |), it3 AS (
          |  SELECT e.dst AS id, SUM(p.pr // d.deg) AS s
          |  FROM edges e
          |  JOIN pr2 p ON p.id = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |), pr3 AS (
          |  SELECT p.id, ((15 * 1000000000000 // 100) // nn.n_nodes)
          |           + ((85 * COALESCE(i.s, 0)) // 100) AS pr
          |  FROM pr2 p LEFT JOIN it3 i ON i.id = p.id, nn
          |)
          |SELECT id, CAST(pr AS BIGINT) AS pr_fp FROM pr3
          |ORDER BY id""".stripMargin)),

    // Bigram-LM fluency score (CCNet-style perplexity proxy): each
    // bigram's corpus log-probability is quantized to integer micro-nats
    // BEFORE the per-document sum — summing doubles is order-dependent
    // and would hash-diverge across engines; summing longs is exact.
    // The ln/floor runs once per DISTINCT bigram in the broadcast count
    // table, so the per-row path adds integers only.

    Q("q104_fuzzy_join",
      (s, dir) => {
        val names = Tables.load(s, dir, "part")
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("pid"))
        TextAnalysis.fuzzyPairs(names, "pid", "p_name",
            maxDist = 2, q = 2)
          .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
            col("dist").cast("long").as("dist"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH nm AS (
             |  SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS pid
             |  FROM part GROUP BY p_name
             |)
             |SELECT a.pid AS id_a, b.pid AS id_b,
             |       a.p_name AS s_a, b.p_name AS s_b,
             |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
             |         AS dist
             |FROM nm a JOIN nm b ON a.pid < b.pid
             |WHERE levenshtein(a.p_name, b.p_name) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // Champion-list doc-doc similarity (index pruning, IR §7.1.3): each
    // term's c highest-tf docs form its champion list; pairs arise only
    // within a list (≤ c²/2 per term — a stop-word costs the same as a
    // rare term) and score as Σ w_a·w_b, ltc weights quantized to
    // integer millinats before the product. Champion selection is a
    // BOUNDED aggregate (MinKAgg over (tf desc, id) encoded longs), not
    // a per-term sort window.

    Q("q110_triangles",
      (s, dir) => Graph.triangles(
          Dedup.nearDuplicatesPortable(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4,
            minJaccardBp = 2000))
        .orderBy("id_a", "id_b", "id_c"),
      Some(neardupScoredCtes +
        """, ed AS (
          |  SELECT id_a AS a, id_b AS b FROM scored
          |  WHERE jaccard_bp >= 2000
          |)
          |SELECT e1.a AS id_a, e1.b AS id_b, e2.b AS id_c
          |FROM ed e1
          |JOIN ed e2 ON e2.a = e1.b
          |JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
          |ORDER BY 1, 2, 3""".stripMargin)),

    // Sort-free exact percentiles (value-histogram formulation): the
    // shipment-quantity distribution per return flag. percentile_disc
    // semantics without sorting the data — the sorted frame is the
    // (group × domain)-sized histogram; rank thresholds are integer
    // (n·p + 99) div 100, no float boundary.

    Q("q119_incremental_degrees",
      (s, dir) => {
        // wave BEFORE distinct: every duplicate of an edge lands in the
        // same hash wave (the wave is a function of the edge), so
        // per-wave distinct ≡ partitioned global distinct — and each
        // wave dedups only its third instead of re-running the full
        // corpus-wide distinct three times
        val base = Tables.fanOut(Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").cast("long").as("id_a"),
            (col("l_partkey").cast("long") + 1000000000L).as("id_b")),
          col("id_a"))
        val wave = pmod(col("id_a") * 31 + col("id_b"), lit(3))
        val batches = (0 to 2).map(b =>
          base.filter(wave === b).distinct())
        batches.tail
          .foldLeft(Graph.degrees(batches.head))(Graph.mergeDegrees(_, _))
          .orderBy("id")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT l_orderkey AS u,
             |         l_partkey + 1000000000 AS v
             |  FROM lineitem
             |), d AS (
             |  SELECT u AS id FROM e UNION ALL SELECT v FROM e
             |)
             |SELECT CAST(id AS BIGINT) AS id,
             |       CAST(COUNT(*) AS BIGINT) AS deg
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q116's radix select lifted to GROUPS (bounded group count — the
    // percentilesByValue contract, continuous domain): exact per-flag
    // price percentiles in the same four digit-histogram passes, the
    // open (group, prefix) frontier filtered by a literal disjunction,
    // driver state a few longs per (group, percentile). No sort, no row
    // shuffle, any value domain.

    Q("q157_entity_resolution",
      (s, dir) => {
        val names = Tables.load(s, dir, "part")
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("pid"))
        val pairs = TextAnalysis.fuzzyPairs(names, "pid", "p_name",
          maxDist = 2, q = 2)
        val comps = Dedup.connectedComponents(pairs, "id_a", "id_b",
          assumeDistinctPairs = true)
        names.join(comps, names("pid") === comps("id"), "left")
          .select(col("pid"), col("p_name"),
            coalesce(col("comp"), col("pid")).as("entity_id"))
          .withColumn("is_canonical", col("entity_id") === col("pid"))
          .orderBy("pid")
      },
      Some(entityResolutionOracle)),

    // Incremental entity resolution: the standing entity table absorbs
    // a batch of NEW records without re-comparing history against
    // itself — batch grams probe the union gram table (batch×batch +
    // batch×standing candidates only, the q101 contraction folds them
    // into the standing components). Merged ≡ rebuilt end-to-end: the
    // oracle is q157's blocking-free one-shot closure over ALL names,
    // so the incremental fold hash-matches the full rebuild.
    //
    // The standing-side component table is a Standing-memoized index
    // artifact (the q67/q205 rule: production pays the O(batch) fold
    // per batch, never the O(history) CC rebuild — that build cost is
    // the lifecycle exercise's job). This also retired the r11 spread
    // anomaly: the per-pass CC over history was a ~40-small-job burst
    // whose scheduler/GC stall exposure produced one 43 s pass
    // ([4.0, 43.0] spread) that isolation could never reproduce
    // (BenchOne [4.8, 5.7]); the fold alone is a handful of jobs.

    Q("q159_incremental_entities",
      (s, dir) => {
        val names = Tables.load(s, dir, "part")
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("pid"))
        val standN = names.filter(col("pid") % 5 =!= 0)
        val batchN = names.filter(col("pid") % 5 === 0)
        val standingComp =
          graft.sources.Standing.frame(s, dir, "entity_standing_comp") {
            Dedup.connectedComponents(
              TextAnalysis.fuzzyPairs(standN, "pid", "p_name",
                maxDist = 2, q = 2), "id_a", "id_b",
              assumeDistinctPairs = true)
          }
        val newPairs = TextAnalysis.fuzzyPairsAgainst(standN, batchN,
          "pid", "p_name", maxDist = 2, q = 2)
        val updated = Dedup.applyClusterBatch(standingComp,
          newPairs.select("id_a", "id_b"))
        names.join(updated, names("pid") === updated("id"), "left")
          .select(col("pid"), col("p_name"),
            coalesce(col("comp"), col("pid")).as("entity_id"))
          .withColumn("is_canonical", col("entity_id") === col("pid"))
          .orderBy("pid")
      },
      Some(entityResolutionOracle)),

    // Interpolated Kneser-Ney bigram LM (the KenLM/CCNet smoothing):
    // absolute discount D=0.75 on observed bigrams, freed mass backs
    // off to the CONTINUATION unigram (distinct-predecessor count /
    // total bigram types). The probability is one left-associative
    // IEEE expression replayed token-for-token in the oracle; per-doc
    // sums are exact micro-nat int64. Same silhouette as q83: one
    // bigram explode, vocabulary-sized joins, a 1-row broadcast total.

    Q("q182_golden_records",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val names = part.groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("pid"))
        // consume the memoized entity table (the ndTable pattern —
        // q157 remains the full from-pairs computation)
        val comps = entitiesTable(s, dir)
        val ent = names.join(comps, names("pid") === comps("id"), "left")
          .select(col("p_name"),
            coalesce(col("comp"), col("pid")).as("entity_id"))
        val members = part.join(ent, Seq("p_name"))
          .select(col("entity_id"), col("p_partkey"), col("p_brand"),
            col("p_type"), col("p_size"))
        Dedup.goldenRecords(members, "entity_id", "p_partkey",
            Seq("p_brand", "p_type", "p_size"))
          .orderBy("entity_id")
      },
      Some(entityResolutionCtes +
        """, ent AS (
          |  SELECT n.p_name, COALESCE(c.comp, n.pid) AS entity_id
          |  FROM nm n LEFT JOIN comps c ON c.id = n.pid
          |), mem AS (
          |  SELECT e.entity_id, p.p_partkey,
          |         CAST(p.p_brand AS STRING) AS p_brand,
          |         CAST(p.p_type AS STRING) AS p_type,
          |         CAST(p.p_size AS STRING) AS p_size
          |  FROM part p JOIN ent e ON e.p_name = p.p_name
          |), melt AS (
          |  SELECT entity_id, 'p_brand' AS f, p_brand AS v FROM mem
          |  UNION ALL SELECT entity_id, 'p_type', p_type FROM mem
          |  UNION ALL SELECT entity_id, 'p_size', p_size FROM mem
          |), cnt AS (
          |  SELECT entity_id, f, v, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM melt WHERE v IS NOT NULL GROUP BY 1, 2, 3
          |), md AS (
          |  SELECT entity_id, f, v FROM (
          |    SELECT entity_id, f, v,
          |           ROW_NUMBER() OVER (PARTITION BY entity_id, f
          |             ORDER BY c DESC, v DESC) AS rk
          |    FROM cnt) WHERE rk = 1
          |), agg AS (
          |  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
          |         CAST(MIN(p_partkey) AS BIGINT) AS rep_id
          |  FROM mem GROUP BY 1
          |)
          |SELECT a.entity_id, a.n_members, a.rep_id,
          |       bb.v AS p_brand, tt.v AS p_type, ss.v AS p_size
          |FROM agg a
          |JOIN md bb ON bb.entity_id = a.entity_id AND bb.f = 'p_brand'
          |JOIN md tt ON tt.entity_id = a.entity_id AND tt.f = 'p_type'
          |JOIN md ss ON ss.entity_id = a.entity_id AND ss.f = 'p_size'
          |ORDER BY a.entity_id""".stripMargin)),

    // Hourly volume anomalies per event type: a 3-sigma test against
    // the trailing 24 observed hours computed ENTIRELY in int64 —
    // (c·n − S)² > 9·(n·Q − S²) is the z²>9 test with the variance
    // denominator multiplied through, so there is no sqrt, no float,
    // no engine divergence. Rows with under 12 hours of baseline
    // never flag (cold start).

    Q("q197_clustering_coefficients",
      (s, dir) => Graph.clusteringCoefficients(
          Dedup.nearDuplicatesPortable(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4,
            minJaccardBp = 2000))
        .orderBy("id"),
      Some(neardupScoredCtes +
        """, pr AS (
          |  SELECT id_a, id_b FROM scored WHERE jaccard_bp >= 2000
          |), tri AS (
          |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |  FROM (SELECT id_a AS a, id_b AS b FROM pr) e1
          |  JOIN (SELECT id_a AS a, id_b AS b FROM pr) e2
          |    ON e2.a = e1.b
          |  JOIN (SELECT id_a AS a, id_b AS b FROM pr) e3
          |    ON e3.a = e1.a AND e3.b = e2.b
          |), tcnt AS (
          |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
          |    SELECT x AS id FROM tri
          |    UNION ALL SELECT y FROM tri
          |    UNION ALL SELECT z FROM tri) GROUP BY 1
          |), dg AS (
          |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          |    SELECT id_a AS id FROM pr
          |    UNION ALL SELECT id_b FROM pr) GROUP BY 1
          |)
          |SELECT d.id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
          |       CASE WHEN d.deg >= 2
          |            THEN COALESCE(t.n_tri, 0) * 2 * 10000
          |                 // (d.deg * (d.deg - 1))
          |            ELSE 0 END AS cc_bp
          |FROM dg d LEFT JOIN tcnt t ON t.id = d.id
          |ORDER BY d.id""".stripMargin)),

    // Inter-arrival SLA report: p50/p95/p99 of the seconds between
    // consecutive events per type ((ts, event_id)-ordered), via the
    // q111 sort-free histogram percentiles — the latency-style ops
    // metric, integer seconds end to end.

    Q("q207_kcore",
      (s, dir) => Graph.kcore(
          Dedup.nearDuplicatesPortable(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, bands = 4, rowsPerBand = 4,
            minJaccardBp = 2000)
            .select("id_a", "id_b"),
          k = 2)
        .orderBy("id"),
      Some(kcoreOracle(k = 2, rounds = 8))),

    // Conversion attribution (first-touch / last-touch): every purchase
    // credits the user's earliest / latest click-or-view inside a 7-day
    // lookback. ONE window pass — a conditional (ts_s, event_id, type)
    // struct min/max over a RANGE frame on epoch seconds (purchases and
    // other types null out, so the frame needs no pre-filter) — the
    // per-user stream never joins itself; purchases with an empty
    // lookback attribute to 'none'. Struct ordering = (ts, event_id)
    // with event_id unique, so ties are impossible by construction and
    // the oracle's ORDER BY ... LIMIT-1 replay agrees exactly.
  )
}
