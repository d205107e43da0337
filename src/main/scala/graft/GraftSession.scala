package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.CosineSimilarity

/** User-facing session plumbing: recommended configs for the engine and
  * registration of graft's native expressions for SQL callers.
  */
object GraftSession {

  /** Builder with the engine's recommended local-mode configuration:
    * shuffle partitions sized to cores (not 200), AQE on (runtime
    * coalescing/skew handling), UTC, dynamic partition overwrite for
    * idempotent re-runs (SURVEY.md §4).
    */
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .withExtensions(new GraftExtensions)

  /** Register graft's native SQL functions on an existing session (for
    * sessions created elsewhere, e.g. the driver's Verify/Bench). */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)))
  }
}

/** spark.sql.extensions entry point: injects graft's native functions at
  * session build time (`.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    // whole-operator plans (AsOf.asofJoinExec also attaches this lazily
    // via experimental strategies for sessions built without extensions)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
