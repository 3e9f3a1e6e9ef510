package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real query surface lives in [[graft.queries.Catalog]]; this object
  * just adapts it to the driver's expected shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { case (name, spec) => name -> spec.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    Catalog.all.collect { case (name, spec) if spec.oracle.isDefined =>
      name -> spec.oracle.get.trim
    }
}
