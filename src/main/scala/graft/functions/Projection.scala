package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection for embedding columns — the
  * dimensionality-reduction step a 100 TB ANN pipeline runs before
  * indexing (distance-preserving sketches at a fraction of the IO).
  * Rademacher (±1) projection: out_j = Σ_i s(j,i)·v_i with signs drawn
  * deterministically from the portable md5 stream, so the matrix is a
  * PLAN LITERAL — no RNG state, no side table, and the DuckDB oracle
  * regenerates the identical matrix from the same function.
  *
  * Determinism discipline: input coordinates quantize to integer
  * micro-units (floor(x·10⁶) — float→double widening is exact, one
  * IEEE multiply+floor), so projections and projected-space distances
  * are exact int64 arithmetic end-to-end. Magnitude contract: |x| must
  * stay below ~10³ for the squared-distance fold to fit in int64 —
  * embedding coordinates are unit-scale in practice.
  *
  * Scale shape: projection is pure map-side (zero shuffles); the
  * shortlist→rerank search keeps the q145 PQ/ADC silhouette — a
  * broadcast query probe over the projected corpus, a bounded
  * shortlist, then the exact metric only on shortlist rows.
  */
object Projection {

  /** Deterministic ±1 sign for (output dim j, input dim i): parity of
    * the first hex nibble of md5("rp:j:i"). Portable: any engine with
    * md5 reproduces it. */
  def sign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1 else -1
  }

  /** The outDim × inDim sign matrix (row j = output dimension j). */
  def signMatrix(outDim: Int, inDim: Int): Array[Array[Int]] =
    Array.tabulate(outDim, inDim)(sign)

  /** Micro-unit quantization of a float/double array column. */
  def microUnits(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e6)).cast("long"))

  /** Project an embedding frame to `outDim` exact-integer coordinates.
    * Output: (idCol, proj array<long>). Map-side only; the quantized
    * vector is materialized once per row and each output dimension
    * folds it against its literal sign row. */
  def project(vecs: DataFrame, outDim: Int, inDim: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val m = signMatrix(outDim, inDim)
    val q = vecs.select(col(idCol), microUnits(col(vecCol)).as("q"))
    val dims = (0 until outDim).map { j =>
      val signs = array(m(j).map(s => lit(s.toLong)): _*)
      aggregate(zip_with(col("q"), signs, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    }
    q.select(col(idCol), array(dims: _*).as("proj"))
  }

  /** Exact squared L2 distance between two long-array columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Shortlist-then-rerank top-k: probe the projected corpus with the
    * projected queries (broadcast), keep the `k·shortlistFactor`
    * nearest by exact integer projected distance, then rerank ONLY the
    * shortlist by exact cosine in the original space. Deterministic at
    * every stage (integer distances, (dist, id) ties; round-6 cosine,
    * (sim desc, id) ties), so the whole composition is oracle-exact;
    * recall vs the unprojected brute force is the spec-pinned
    * operating point. */
  def rpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             outDim: Int = 16, inDim: Int = 64,
             shortlistFactor: Int = 4,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = project(corpus, outDim, inDim, idCol, vecCol)
    val pq = project(queries, outDim, inDim, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("proj").as("qproj"))
    val short = pc.crossJoin(broadcast(pq))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("pdist", sqDist(col("qproj"), col("proj")))
      .withColumn("prank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(asc("pdist"), asc(idCol))))
      .filter(col("prank") <= k * shortlistFactor)
      .select(col("query_id"), col(idCol))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    short
      .join(corpus.select(col(idCol), col(vecCol).as("v")), Seq(idCol))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim",
        round(Similarity.cosine(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(desc("sim"), asc(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("sim"), col("rank"))
  }
}
