package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S10: bounded Kafka BATCH read — the dashboard's "last N events"
  * tail query (`dashboard/app.py:980-1014`: seek_to_end, rewind N,
  * poll) as a Spark batch source with explicit per-partition offset
  * ranges. Batch (`spark.read`), not a stream: the read has fixed
  * bounds, runs inside a dashboard refresh, and needs no checkpoint.
  *
  * No broker exists in the test environment, so [[boundedRead]] is
  * wiring (same status as the S8/S9 producer/consumer); the offset
  * arithmetic — the part the reference implements by seeking — is the
  * pure function [[tailOffsetsJson]], spec-tested.
  */
object KafkaBatch {

  /** Per-partition offset-range JSON for a tail-N read. `endOffsets`
    * comes from broker introspection (the reference's seek_to_end);
    * each partition starts at max(0, end - lastN) — the reference
    * rewinds each partition by the same N (`dashboard/app.py:997`).
    * Returns (startingOffsets, endingOffsets) option values.
    */
  def tailOffsetsJson(topic: String, endOffsets: Map[Int, Long],
      lastN: Long): (String, String) = {
    def json(f: Long => Long) = endOffsets.toSeq.sortBy(_._1)
      .map { case (p, end) => s""""$p":${f(end)}""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
    (json(end => math.max(0L, end - lastN)), json(identity))
  }

  /** A12: total message count across a topic's partitions — the
    * dashboard's "events in topic" stat (`dashboard/app.py:380-411`,
    * Σ latest − earliest per partition). Pure offset arithmetic;
    * introspection supplies the maps.
    */
  def offsetSpan(earliest: Map[Int, Long], latest: Map[Int, Long]): Long =
    latest.map { case (p, end) =>
      math.max(0L, end - earliest.getOrElse(p, 0L))
    }.sum

  /** Bounded batch read over an explicit offset window, JSON-parsed to
    * the event schema (same shape as `ScoringStream.fromKafka`).
    */
  def boundedRead(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String, endingOffsets: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("user BIGINT, item STRING, action STRING, ts TIMESTAMP")
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("e"))
      .select(col("e.user"), col("e.item"), col("e.action"), col("e.ts"))
  }

  /** The dashboard's tail-N: offsets math + bounded read. */
  def tailRead(spark: SparkSession, bootstrap: String, topic: String,
      endOffsets: Map[Int, Long], lastN: Long): DataFrame = {
    val (start, end) = tailOffsetsJson(topic, endOffsets, lastN)
    boundedRead(spark, bootstrap, topic, start, end)
  }
}
