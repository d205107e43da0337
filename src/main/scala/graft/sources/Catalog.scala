package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog bootstrap — the Spark analogue of the reference's Trino DDL DAG
  * (docker/dags/trino_init_tables_dag.py:33-96: create schema, external
  * partitioned tables, managed result tables; verification at :139-160)
  * and partition metadata sync (utils/trino_client.py:130-151,
  * hdfs_upload_data_dag.py:376-421).
  */
object Catalog {

  def createDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")

  /** S8 — external partitioned Parquet table over an existing location
    * (reference: `WITH (external_location = ..., partitioned_by = ...)`). */
  def createExternalTable(spark: SparkSession, name: String,
                          schema: StructType, partitionCols: Seq[String],
                          location: String): Unit = {
    // Datasource-table DDL: every column (incl. partition columns) typed in
    // the column list; PARTITIONED BY takes bare names.
    val allCols = schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    val partClause =
      if (partitionCols.isEmpty) ""
      else s"PARTITIONED BY (${partitionCols.mkString(", ")})"
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($allCols)
         |USING PARQUET $partClause LOCATION '$location'""".stripMargin)
  }

  /** S9 — register partition directories that appeared on storage after
    * table creation (reference: `CALL hive.system.sync_partition_metadata
    * (..., 'ADD')`). */
  def syncPartitions(spark: SparkSession, table: String): Unit =
    spark.catalog.recoverPartitions(table)

  /** S10 — existence verification (reference raises on missing tables,
    * trino_init_tables_dag.py:147-156). */
  def verifyTables(spark: SparkSession, db: String,
                   expected: Seq[String]): Unit = {
    val have = spark.sql(s"SHOW TABLES IN $db").select("tableName")
      .collect().map(_.getString(0)).toSet
    val missing = expected.filterNot(have.contains)
    require(missing.isEmpty, s"missing tables in $db: ${missing.mkString(", ")}")
  }

  /** S3 — append into a catalog table (the reference's INSERT INTO ...
    * SELECT), by-name column resolution. */
  def insertInto(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)
}
