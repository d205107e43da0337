package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables
import ParityQueries.Q

/** The training-data-pipeline extension surface (BASELINE.json north star):
  * dedup, text analysis, similarity search, event-time windows — run over
  * the driver's documents/embeddings/events tables, oracle-checked in
  * DuckDB wherever the computation is portable (exact integer/decimal math,
  * sequential float folds), rows-only otherwise.
  */
object ExtensionQueries {

  private val Money = DecimalType(18, 2)

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

    Q("q22_token_count",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |       ELSE length(string_split_regex(trim(text), '\s+')) END
             |    AS INTEGER) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q23_text_quality",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          TextAnalysis.alphaCount(col("text")).as("alpha_chars"),
          TextAnalysis.digitCount(col("text")).as("digit_chars"),
          TextAnalysis.whitespaceCount(col("text")).as("ws_chars"),
          TextAnalysis.alphaRatioBp(col("text")).as("alpha_bp"),
          TextAnalysis.isQuality(col("text")).as("is_quality"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  length(text) AS n_chars_m,
             |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
             |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_chars,
             |  length(text) - length(regexp_replace(text, '\s', '', 'g')) AS ws_chars,
             |  CAST(CASE WHEN length(text) = 0 THEN 0
             |       ELSE floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |                  * 10000.0 / length(text)) END AS BIGINT) AS alpha_bp,
             |  (length(text) >= 50 AND
             |   CASE WHEN length(text) = 0 THEN 0
             |        ELSE floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |                   * 10000.0 / length(text)) END >= 5000) AS is_quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q24_lang_stopwords",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.stopwordHits(col("text"),
            TextAnalysis.englishStopwords).as("en_hits"))
        .withColumn("looks_english", col("en_hits") >= 3)
        .orderBy("doc_id"),
      Some {
        val hits = TextAnalysis.englishStopwords.map { w =>
          val needle = s" $w "
          s"CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', '$needle', ''))) / ${needle.length} AS INTEGER)"
        }.mkString("(", " + ", ")")
        s"""SELECT doc_id, lang, $hits AS en_hits,
           |       $hits >= 3 AS looks_english
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    Q("q25_events_hourly",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("event_hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(Money)).cast(Money).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS event_hour, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sliding event-time window (1h window, 30m slide) — the batch
    // equivalent of the Structured Streaming windowed aggregation
    // (graft.streaming.EventStreams). Spark's window() starts are
    // epoch-aligned; the oracle reproduces them with epoch arithmetic.
    Q("q26_events_sliding",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"))
        .orderBy("window_start", "event_type"),
      Some("""WITH b AS (
             |  SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
             |           * 1000000) AS bucket, event_type
             |  FROM events
             |), w AS (
             |  SELECT bucket + (t.i * INTERVAL 30 MINUTE) AS window_start,
             |         event_type
             |  FROM b CROSS JOIN (VALUES (0), (-1)) t(i)
             |)
             |SELECT window_start, event_type,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q27_cosine_pairs",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.cosinePairs(emb, emb.filter(col("vec_id") < 5),
            threshold = 0.1)
          .orderBy("query_id", "vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
             |)
             |SELECT q.query_id, e.vec_id,
             |       round(list_dot_product(q.qv, e.v)
             |         / (sqrt(list_dot_product(q.qv, q.qv))
             |            * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
             |FROM e CROSS JOIN q
             |WHERE e.vec_id <> q.query_id
             |  AND round(list_dot_product(q.qv, e.v)
             |        / (sqrt(list_dot_product(q.qv, q.qv))
             |           * sqrt(list_dot_product(e.v, e.v))), 6) >= 0.1
             |ORDER BY q.query_id, e.vec_id""".stripMargin)),

    // Exact ANN baseline: brute-force top-10 per query. Rank ties at equal
    // rounded sim make cross-engine rank assignment fragile → rows-only;
    // ScalaTest pins semantics.
    Q("q28_ann_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
          .orderBy("query_id", "rank")
      },
      None),

    // MinHash-LSH near-dup candidates: xxhash64 has no DuckDB twin →
    // rows-only; Jaccard-verify semantics are ScalaTest-pinned.
    Q("q29_near_duplicates",
      (s, dir) => Dedup.nearDuplicates(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.5)
        .orderBy("id_a", "id_b"),
      None),

    // SimHash signatures: same xxhash64 portability limit → rows-only.
    Q("q30_simhash",
      (s, dir) => Dedup.simhash64(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      None),

    // Multimodal: binary payload column + typed metadata; stats are
    // portable arithmetic (utf-8 byte lengths), so oracle-checked even
    // though the payload pipeline itself is Spark-only.
    Q("q31_media_stats",
      (s, dir) => graft.functions.Multimodal.mediaStats(
        graft.functions.Multimodal.syntheticMedia(s, dir))
        .orderBy("kind"),
      Some("""SELECT CASE CAST(doc_id % 3 AS INTEGER)
             |         WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |         ELSE 'video' END AS kind,
             |       CAST(COUNT(*) AS BIGINT) AS n_media,
             |       CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
             |       CAST(MAX(n_chars * 10) AS BIGINT) AS max_duration_ms
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Multimodal decode/feature-extract path (stubbed codec, real
    // partition-batched plumbing) → rows-only.
    Q("q32_media_features",
      (s, dir) => graft.functions.Multimodal.decodeFeatures(
        graft.functions.Multimodal.syntheticMedia(s, dir))
        .toDF().orderBy("media_id"),
      None),

    // Sessionization: gap>30min starts a new session; lag + running-sum
    // windows, whole-second arithmetic on both sides so boundary events
    // agree across engines.
    Q("q34_sessions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_s", lag(col("ts").cast("long"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_s").isNull ||
              col("ts").cast("long") - col("prev_s") > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("new_session").as("n_sessions"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             |         LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             |           PARTITION BY user_id
             |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_s
             |  FROM events
             |), f AS (
             |  SELECT user_id,
             |         CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM e
             |)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(new_session) AS BIGINT) AS n_sessions
             |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Term frequency with deterministic top-k (count desc, token asc) —
    // the explode/unnest + LIMIT surface.
    Q("q35_term_freq",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token"))
        .limit(100),
      Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |      FROM documents) t
             |WHERE length(token) > 0
             |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)),

    // Semi-structured props column: JSON field extraction + aggregation.
    Q("q33_events_props",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
          max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |       CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
