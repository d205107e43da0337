package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained multinomial Naive Bayes text classifier — the
  * fastText-style supervised filter of the LLM-curation playbook
  * (GPT-3/LLaMA-class pipelines train exactly this shape of model on
  * weak labels to score quality or language). Here the label is the
  * `lang` column, making it a TRAINED language identifier that
  * complements the stopword-profile heuristic (TextAnalysis
  * .classifyLang): the heuristic ships fixed profiles, this one learns
  * its vocabulary from the corpus itself.
  *
  * Determinism discipline (the lmScore/q81 precedent): every
  * log-probability is ONE IEEE divide + ln floored to integer
  * micro-nats; document scores are then exact order-free int64 sums,
  * so training and inference are bit-identical on any engine and the
  * whole surface is DuckDB-oracle-exact. Ties in the argmax break to
  * the lexicographically smallest class.
  *
  * Scale shape: training is one token explode + one (class, term)
  * aggregation — the same silhouette as building an inverted index.
  * Class-level statistics (token totals, priors, unseen-term default)
  * are one row per class — a genuinely bounded dim that rides a
  * broadcast. Inference joins the doc-term frame to the model on the
  * term key, unhinted (AQE broadcasts a small model, shuffle-joins a
  * big one — the r8 vocabulary-join discipline). No driver state, no
  * collect anywhere.
  *
  * The model is count-based, so it is MERGEABLE: `mergeCounts` folds a
  * batch's (class, term) counts into a standing table and retraining
  * from the merged counts equals one-shot training on the union —
  * the standing-artifact recipe (NaiveBayesSpec pins it).
  */
object NaiveBayes {

  /** Raw sufficient statistics: one row per (class, term) with its
    * occurrence count — the standing artifact incremental training
    * folds into. */
  def termCounts(docs: DataFrame, labelCol: String = "lang",
                 textCol: String = "text"): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(Retrieval.tokens(col(textCol))).as("term"))
      .groupBy("label", "term")
      .agg(count(lit(1)).as("n"))

  /** Per-class document counts (the prior's sufficient statistic). */
  def docCounts(docs: DataFrame, labelCol: String = "lang"): DataFrame =
    docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))

  /** Fold a batch's sufficient statistics into the standing tables:
    * counts add on the (label, term) / (label) keys. Merged ≡ rebuilt
    * exactly (integer adds), so incremental training is lossless. */
  def mergeCounts(standing: DataFrame, batch: DataFrame): DataFrame =
    standing.unionByName(batch)
      .groupBy("label", "term").agg(sum(col("n")).as("n"))

  def mergeDocCounts(standing: DataFrame, batch: DataFrame): DataFrame =
    standing.unionByName(batch)
      .groupBy("label").agg(sum(col("n_docs")).as("n_docs"))

  /** Laplace-smoothed log-likelihood table from the sufficient
    * statistics: lp(term|c) = floor(ln((n+1)/(Nc+V))·10⁶). One row per
    * (class, term) carrying the count and the micro-nat weight. */
  def model(counts: DataFrame): DataFrame = {
    val nc = counts.groupBy("label").agg(sum(col("n")).as("nc"))
    val v = counts.agg(countDistinct(col("term")).as("v"))
    counts.join(nc, Seq("label")).crossJoin(broadcast(v))
      .select(col("label"), col("term"), col("n"),
        floor(log((col("n") + 1) / (col("nc") + col("v"))) * lit(1e6))
          .cast("long").as("lp"))
  }

  /** Train from a labeled corpus: [[termCounts]] → [[model]]. */
  def train(docs: DataFrame, labelCol: String = "lang",
            textCol: String = "text"): DataFrame =
    model(termCounts(docs, labelCol, textCol))

  /** Per-class inference constants — one row per class: prior
    * micro-nats ln(n_docs/total) and the unseen-term default
    * ln(1/(Nc+V)). Bounded by the class count, so consumers broadcast
    * it. */
  def classStats(counts: DataFrame, docs: DataFrame,
                 labelCol: String = "lang"): DataFrame = {
    val nc = counts.groupBy("label").agg(sum(col("n")).as("nc"))
    val v = counts.agg(countDistinct(col("term")).as("v"))
    val tot = docs.agg(count(lit(1)).as("nt"))
    docs.crossJoin(broadcast(tot))
      .groupBy(col(labelCol).as("label"), col("nt"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("label"),
        floor(log(col("n_docs") / col("nt")) * lit(1e6))
          .cast("long").as("prior_lp"))
      .join(nc, Seq("label"))
      .crossJoin(broadcast(v))
      .select(col("label"), col("prior_lp"),
        floor(log(lit(1.0) / (col("nc") + col("v"))) * lit(1e6))
          .cast("long").as("default_lp"))
  }

  /** Classify unlabeled docs against a trained model: per-doc argmax
    * over class scores prior + Σ count·lp (unseen terms take the
    * class default). Docs with zero tokens carry no evidence and are
    * absent — route them through a length gate instead.
    *
    * `stats` must be [[classStats]]-shaped; it is crossed in as a
    * broadcast (class-count rows). The model join keys on `term`,
    * unhinted. Output: (id, pred_label, score_u). */
  def classify(docs: DataFrame, modelLp: DataFrame, stats: DataFrame,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol),
        explode(Retrieval.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val scored = dt
      .crossJoin(broadcast(stats))
      .join(modelLp.select(col("label"), col("term"), col("lp")),
        Seq("label", "term"), "left")
      .groupBy(col(idCol), col("label"), col("prior_lp"))
      .agg(sum(col("cnt") * coalesce(col("lp"), col("default_lp")))
        .as("evidence"))
      .select(col(idCol), col("label"),
        (col("prior_lp") + col("evidence")).as("score_u"))
    scored.groupBy(col(idCol))
      .agg(min(struct((-col("score_u")).as("neg"), col("label")))
        .as("best"))
      .select(col(idCol), col("best.label").as("pred_label"),
        (-col("best.neg")).as("score_u"))
  }
}
