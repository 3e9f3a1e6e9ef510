package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single source of truth for fixture-table access (SURVEY.md §7.1 item 1:
  * one shared schema/loader module instead of the reference's triplicated
  * column lists — see reference `sql/init.sql:14-37` vs
  * `core-logic/train_module.py:208-216`).
  *
  * All loaders read the driver-generated parquet under `dir`
  * (`/root/testdata/sf*`). Parquet gives us columnar scans, predicate
  * pushdown and column pruning for free; at cluster scale the same calls
  * work against partitioned object-store layouts — nothing here assumes
  * local files.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized parquet
    * reader rejects; read nanos as long (session conf) and rebuild a proper
    * TimestampType column. Fixture values are micro-precision, so
    * `timestamp_micros(ns/1000)` is lossless and matches DuckDB exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Set lazily rather than at session build: the correctness driver
    // constructs its own SparkSession before calling SparkEntry.queries,
    // so this loader is the only hook we control. Idempotent, and no
    // other conf value is ever correct for this fixture (a check-first
    // guard can't work — conf.getOption reports the DEFAULT, so "unset"
    // is indistinguishable from an explicit false).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
}
