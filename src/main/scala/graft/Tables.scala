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
  /** events.parquet has shipped under three physical encodings across fixture
    * regenerations: TIMESTAMP(NANOS) (read as long via session conf, rebuilt
    * with `timestamp_micros`), TIMESTAMP_MICROS(isAdjustedToUTC=0) (Spark 4
    * yields TIMESTAMP_NTZ), and plain UTC-adjusted micros (TimestampType).
    * Normalize all three to TimestampType micros so downstream
    * `unix_micros`/`cast(... as double)` consumers never see NTZ or raw
    * longs. The session time zone is pinned to UTC in the same hook, which
    * makes the NTZ→LTZ cast a lossless relabeling (identical micros value)
    * and matches DuckDB's naive-timestamp arithmetic exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Set lazily rather than at session build: the correctness driver
    // constructs its own SparkSession before calling SparkEntry.queries,
    // so this loader is the only hook we control. Both confs are
    // idempotent, and no other values are ever correct for this fixture
    // (a check-first guard can't work — conf.getOption reports the
    // DEFAULT, so "unset" is indistinguishable from an explicit choice).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize an event frame's `ts` column to TimestampType micros whatever
    * the physical source type was (long nanos / TIMESTAMP_NTZ / TimestampType).
    * Callers must have the session time zone pinned to UTC (events() does)
    * for the NTZ cast to be a pure relabeling.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
}
