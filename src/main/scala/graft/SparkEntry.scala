package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator surface: SURVEY.md §2 parity
  * operators (ParityQueries) + training-data-pipeline extensions
  * (ExtensionQueries). Each entry with an `oracleSql` twin is hash-compared
  * against DuckDB at sf0.01 by the driver's Verify run.
  */
object SparkEntry {

  private def registry = ParityQueries.all ++ ExtensionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full net-demand MRP plan: two pre-join aggregations, a top-1-per-
    * group window, four joins (broadcast dims), the GREATEST/COALESCE MRP
    * expression, and the presentation sort (SURVEY.md §3.2).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_net_demand")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }
      .toMap
}
