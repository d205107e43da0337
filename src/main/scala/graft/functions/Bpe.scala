package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) vocabulary training — Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 (Algorithm 1), the subword tokenizer trainer every LLM data
  * pipeline runs upstream of token counting.
  *
  * Spark-first shape: training NEVER iterates the corpus. One shuffle
  * folds the corpus to the word-frequency table (the classic trick: BPE
  * statistics are a function of word counts, and the word table is
  * vocabulary-sized — millions of rows at 100 TB, not billions); each of
  * the R merge rounds is then (a) a map-side adjacent-pair expansion +
  * one small aggregation over that table, (b) a 1-row argmax frame, and
  * (c) a map-side `replace` of the winning pair, the 1-row frame
  * broadcast into it — no collect anywhere, plan depth reset per round
  * with localCheckpoint (the documented iterative-loop discipline).
  *
  * Everything is deterministic and ENGINE-PORTABLE — the q139/q140
  * oracles replay training round-for-round in DuckDB:
  *  - symbols ride as a double-space-joined, double-space-padded string
  *    ("  l  o  w  </w>  "), so one plain `replace( ' l  o ' -> ' lo ')`
  *    call IS the merge: left-to-right non-overlapping replace-all (the
  *    same semantics in Spark's StringReplace and DuckDB's replace)
  *    exactly implements BPE's greedy left-to-right merge order, and the
  *    single flanking spaces the pattern consumes are restored by the
  *    replacement, preserving the double-space invariant;
  *  - the winning pair each round is argmax(count) with ties broken by
  *    (left, right) string order;
  *  - counts are exact int64 sums of word frequencies.
  *
  * A round whose pair table is empty (fully merged corpus) emits no
  * merge row and leaves the table unchanged — the left-join-on-true
  * keeps that case a no-op instead of annihilating the frame.
  */
object Bpe {

  /** End-of-word marker (its own final symbol, per the paper): merges
    * can't cross word boundaries, and word-final subwords stay
    * distinguishable from word-internal ones. */
  val Eow = "</w>"

  /** "low" → "  l  o  w  </w>  ": each character a symbol, double-space
    * separators AND padding (see the replace-semantics note above). */
  private def symbolize(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "),
      lit(Eow + "  "))

  /** Corpus → word-frequency table (word, wn, sym). The ONLY
    * corpus-sized pass in training. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wn"))
      .withColumn("sym", symbolize(col("word")))

  /** Non-empty symbol array of the padded string. */
  private def symsOf(sym: Column): Column =
    filter(split(sym, "  "), s => length(s) > 0)

  /** Adjacent-pair counts of a word table: map-side zip of each word's
    * symbol array with its own tail, ONE aggregation on (l, r). */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("wn"), symsOf(col("sym")).as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("wn"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1))).as("p"))
      .select(col("wn"), col("p.0").as("lsym"), col("p.1").as("rsym"))
      .groupBy("lsym", "rsym").agg(sum("wn").as("n"))

  /** Fold a batch's word counts into a standing word-frequency table:
    * counts ADD per word, so merged ≡ rebuilt exactly — BPE training
    * state is a pure function of the word table, which makes the table
    * the incremental/streaming artifact (q141): daily ingestion costs
    * O(batch words + table), the corpus is never re-read, and a retrain
    * from the folded table equals a one-shot retrain from everything.
    * Accepts (word, wn[, sym]) frames on either side. */
  def mergeWordTables(standing: DataFrame, batch: DataFrame): DataFrame =
    standing.select("word", "wn").unionByName(batch.select("word", "wn"))
      .groupBy("word").agg(sum("wn").as("wn"))
      .withColumn("sym", symbolize(col("word")))

  /** The trained state after `rounds` merges: the evolved word table and
    * the per-round winning pairs (round, lsym, rsym, n) — fewer than
    * `rounds` rows if the corpus merges to exhaustion first. */
  def train(docs: DataFrame, rounds: Int,
            textCol: String = "text"): (DataFrame, DataFrame) =
    trainFromWords(wordTable(docs, textCol), rounds)

  /** Train from an already-built word-frequency table — the incremental
    * path: callers fold batches with mergeWordTables (or land the table
    * as a standing artifact) and retrain merges from table-sized state. */
  def trainFromWords(wordFreqs: DataFrame,
                     rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = wordFreqs
      .select(col("word"), col("wn"), symbolize(col("word")).as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[DataFrame]
    var r = 1
    while (r <= rounds) {
      val best = pairCounts(words)
        .orderBy(desc("n"), asc("lsym"), asc("rsym")).limit(1)
        .localCheckpoint()
      merges += best.select(lit(r).cast("long").as("round"),
        col("lsym"), col("rsym"), col("n"))
      words = words.join(broadcast(best), lit(true), "left")
        .withColumn("merged",
          when(col("lsym").isNull, col("sym")).otherwise(
            replace(col("sym"),
              concat(lit(" "), col("lsym"), lit("  "), col("rsym"),
                lit(" ")),
              concat(lit(" "), col("lsym"), col("rsym"), lit(" ")))))
        .select(col("word"), col("wn"), col("merged").as("sym"))
        .localCheckpoint()
      r += 1
    }
    (words, merges.result().reduce(_ unionByName _))
  }

  /** The learned merge table (round, lsym, rsym, n) — the artifact a
    * tokenizer ships (q139). */
  def merges(docs: DataFrame, rounds: Int,
             textCol: String = "text"): DataFrame =
    train(docs, rounds, textCol)._2.orderBy("round")

  /** Subword-encode the corpus with a vocabulary trained on it: the
    * trained word table already holds every word's final segmentation,
    * so encoding is ONE join of exploded corpus words against the
    * vocabulary-sized table — per doc: word count, subword count, and
    * the max subwords any single word needed (q140). */
  def encode(docs: DataFrame, rounds: Int, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    encodeWith(docs, train(docs, rounds, textCol)._1, idCol, textCol)

  /** Encode against an already-trained word table (the standing-
    * vocabulary path: train once, memoize/land the evolved word table,
    * encode any corpus slice against it without retraining). */
  def encodeWith(docs: DataFrame, trainedWords: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val trained = trainedWords
      .select(col("word"), size(symsOf(col("sym"))).as("n_subwords"))
    graft.sources.Tables.fanOut(docs, col(idCol)).select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(trained, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum("n_subwords").as("n_tokens"),
        max("n_subwords").cast("long").as("max_word_tokens"))
  }
}
