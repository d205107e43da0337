package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the embedding
  * splits into `nsub` contiguous subvectors, each subspace trains its own
  * small codebook (deterministic first-k seed + one Lloyd mean round, the
  * q42 quantizer recipe per subspace), and a vector compresses to `nsub`
  * small codes — 64 float dims become 8 bytes. Search is ADC (asymmetric
  * distance computation): the query stays exact, each corpus vector's
  * distance is approximated by summing per-subspace distances to the
  * CENTROIDS its codes name — a lookup-table scan, never a full-vector
  * distance.
  *
  * Everything is deterministic and cross-engine checkable (q143/q144):
  *  - seeds are the first k corpus vectors' slices, Lloyd means are
  *    QUANTIZED to integer micro-units (floor(avg·1e6)/1e6) so the
  *    codebook is bit-identical in any engine regardless of the mean's
  *    addition order;
  *  - assignment is argmin squared-L2 with ties to the lowest code
  *    (squared-L2 composed from the same sequential dot folds the cosine
  *    kernels pin: d² = ⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩);
  *  - ADC contributions quantize to integer micro-units BEFORE the
  *    per-vector sum (the lmScore discipline), so the fold over subspaces
  *    is exact int64 arithmetic and ranking ties break on vec_id.
  *
  * Scale posture: the codebook is nsub·k rows (broadcast everywhere);
  * encoding is map-side against it; ADC joins the (corpus × nsub)-row
  * narrow code table to a broadcast (queries × nsub × k) distance table
  * map-side, and the ONLY corpus-sized exchange is the final per-(query,
  * vector) integer sum — at 100 TB the full-precision embeddings are
  * read once at encode time and never again.
  */
object Pq {

  /** Subvector m (0-based) of an embedding with `dsub` dims per
    * subspace — a plain slice, exact. */
  private def sub(v: Column, m: Int, dsub: Int): Column =
    slice(v, lit(m * dsub + 1), lit(dsub))

  /** Squared L2 from the pinned sequential dot folds. */
  private def d2(a: Column, b: Column): Column =
    Similarity.dotFast(a, a) - lit(2.0) * Similarity.dotFast(a, b) +
      Similarity.dotFast(b, b)

  /** The trained codebook (m, code, cv: array<double>): first-k seed per
    * subspace + `lloydIters` mean rounds, means quantized to micro-units.
    * nsub·k rows — a broadcast-sized standing artifact
    * (Tables.memoTable it for reuse across encode calls). */
  def codebook(corpus: DataFrame, nsub: Int, k: Int, dsub: Int,
               lloydIters: Int = 1): DataFrame = {
    val subs = corpus.filter(col("vec_id") < k)
      .select(explode(array((0 until nsub).map(m =>
        struct(lit(m).as("m"), col("vec_id").cast("int").as("code"),
          Similarity.asDouble(sub(col("embedding"), m, dsub)).as("cv"))): _*))
        .as("c"))
      .select(col("c.m"), col("c.code"), col("c.cv"))
    var cents = subs
    var it = 0
    while (it < lloydIters) {
      val carr = broadcast(cents
        .groupBy("m").agg(sort_array(collect_list(
          struct(col("code"), col("cv")))).as("cs")))
      // argmin d² over the subspace's codebook, ties to the lowest code
      val assigned = corpus
        .select(explode(array((0 until nsub).map(m =>
          struct(lit(m).as("m"),
            sub(col("embedding"), m, dsub).as("sv"))): _*)).as("s"))
        .select(col("s.m").as("m"), col("s.sv"))
        .join(carr, Seq("m"))
        .withColumn("best", array_max(transform(col("cs"), c =>
          struct((-d2(col("sv"), c.getField("cv"))).as("negd"),
            (-c.getField("code")).as("negc"),
            c.getField("code").as("code")))))
        .select(col("m"), col("best.code").as("code"), col("sv"))
      val means = assigned
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy("m", "code", "i")
        .agg((floor(avg(col("x").cast("double")) * 1e6) / 1e6).as("mx"))
        .groupBy("m", "code")
        .agg(array_sort(collect_list(struct(col("i"), col("mx")))).as("ms"))
        .select(col("m"), col("code"), col("ms.mx").as("mcv"))
      cents = cents.as("p")
        .join(means.as("n"), Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("mcv"), col("p.cv")).as("cv"))
      it += 1
    }
    cents
  }

  /** Encode the corpus against a trained codebook: (vec_id, m, code) —
    * map-side argmin against the broadcast codebook; the narrow code
    * table is the standing compressed index.
    *
    * This is ALSO the incremental path (the q86 standing-quantizer
    * pattern): codes are a pure per-vector function of the codebook, so
    * daily ingestion encodes ONLY the batch against the standing
    * codebook table and unions the rows in — merged ≡ rebuilt exactly,
    * O(batch) per day, the historical corpus is never re-encoded
    * (PqSpec pins the equality). Retraining cadence is the caller's
    * policy knob, exactly as for the IVF centroids. */
  def encode(corpus: DataFrame, cb: DataFrame, nsub: Int,
             dsub: Int): DataFrame = {
    val carr = broadcast(cb.groupBy("m").agg(sort_array(collect_list(
      struct(col("code"), col("cv")))).as("cs")))
    corpus
      .select(col("vec_id"), explode(array((0 until nsub).map(m =>
        struct(lit(m).as("m"),
          sub(col("embedding"), m, dsub).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv"))
      .join(carr, Seq("m"))
      .withColumn("best", array_max(transform(col("cs"), c =>
        struct((-d2(col("sv"), c.getField("cv"))).as("negd"),
          (-c.getField("code")).as("negc"),
          c.getField("code").as("code")))))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
  }

  /** ADC top-k: per query, squared-L2 to each corpus vector approximated
    * from its codes — the per-(query, m, code) distance table is
    * broadcast (queries × nsub × k rows), contributions quantize to
    * integer micro-units before the per-vector sum (exact int64 fold,
    * order-free), ranking ascends on the integer with vec_id ties. */
  def adcTopK(codes: DataFrame, cb: DataFrame, queries: DataFrame,
              k: Int, nsub: Int, dsub: Int): DataFrame = {
    val dtab = broadcast(queries
      .select(col("vec_id").as("query_id"),
        explode(array((0 until nsub).map(m =>
          struct(lit(m).as("m"),
            sub(col("embedding"), m, dsub).as("qv"))): _*)).as("s"))
      .select(col("query_id"), col("s.m").as("m"), col("s.qv"))
      .join(cb, Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        floor(d2(col("qv"), col("cv")) * 1e6).cast("long").as("dq")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("approx_d2_micro"), asc("vec_id"))
    codes.join(dtab, Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dq").as("approx_d2_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ADC shortlist → exact rerank (the production composition: PQ culls
    * the corpus to `shortlist` candidates per query from codes alone,
    * then ONLY those pairs pay a full-precision distance). The shortlist
    * frame is queries·shortlist rows — broadcast against the corpus, so
    * full embeddings are read map-side and never shuffle; recall is
    * bounded only by the shortlist's coverage (PqSpec pins the
    * operating point). Exact d² rounds to 6dp for cross-engine rank
    * stability (q145's oracle replays the identical arithmetic). */
  def adcRerankTopK(codes: DataFrame, cb: DataFrame, corpus: DataFrame,
                    queries: DataFrame, k: Int, shortlist: Int,
                    nsub: Int, dsub: Int): DataFrame = {
    val short = adcTopK(codes, cb, queries, shortlist, nsub, dsub)
      .select(col("query_id"), col("vec_id"))
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("d2"), asc("vec_id"))
    broadcast(short.join(qv, Seq("query_id")))
      .join(corpus.select(col("vec_id"), col("embedding").as("ve")),
        Seq("vec_id"))
      .withColumn("d2", round(d2(col("qe"), col("ve")), 6))
      .select(col("query_id"), col("vec_id"), col("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
