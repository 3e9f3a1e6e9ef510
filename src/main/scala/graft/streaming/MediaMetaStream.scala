package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.multimodal.{AudioHeaders, ImageHeaders}

/** STREAMING media-metadata extraction — the streaming twin of the
  * batch header-decode stage (q119/q123), the way near-dup detection
  * has its [[NearDupStream]] twin of q36. Continuous media ingestion
  * (a crawler's image/audio firehose) decodes container headers as
  * rows arrive and routes unparseable payloads to a dead-letter sink
  * instead of failing the query — the same log-and-continue contract
  * as the event-parse boundary (ST8,
  * `ScoringStream.parseEvents`).
  *
  * Stateless by design: header decode needs no cross-row state, so
  * the stage is a pure codegen projection ([[ImageHeaders]] /
  * [[AudioHeaders]] expressions) — no watermark, no shuffle, and
  * backpressure-friendly at any input rate. The split into good/dead
  * outputs happens per micro-batch in `foreachBatch` (one decode, two
  * sinks — the standard dual-sink routing shape, since a streaming
  * DataFrame cannot fork).
  *
  * Unified metadata row across modalities: `kind` ∈ image|audio,
  * `fmt` the container, and two modality-interpreted dimensions
  * (image: width/height; audio: sample_rate/bits_per_sample) plus
  * `channels`, which both modalities share.
  */
object MediaMetaStream {

  /** Decode stage: media frame (media_id, ts, payload) → metadata
    * columns + `ok` flag. Pure projection — safe on streaming and
    * batch frames alike (the spec replays it on both).
    */
  def decode(media: DataFrame): DataFrame =
    media
      .withColumn("img", ImageHeaders.imageMeta(col("payload")))
      .withColumn("aud", AudioHeaders.audioMeta(col("payload")))
      .select(
        col("media_id"), col("ts"),
        when(col("img").isNotNull, lit("image"))
          .when(col("aud").isNotNull, lit("audio")).as("kind"),
        coalesce(col("img.fmt"), col("aud.fmt")).as("fmt"),
        coalesce(col("img.width"), col("aud.sample_rate")).as("dim1"),
        coalesce(col("img.height"), col("aud.bits_per_sample")).as("dim2"),
        coalesce(col("img.channels"), col("aud.channels")).as("channels"))
      .withColumn("ok", col("kind").isNotNull)

  /** Dual-sink routing: parsed metadata → `metaDir`, unparseable rows
    * (id + ts only — the payload already failed once, don't copy it
    * around) → `deadDir`. Parquet append per micro-batch.
    */
  def route(media: DataFrame, metaDir: String, deadDir: String): DataStreamWriter[Row] =
    decode(media).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          b.filter(col("ok"))
            .drop("ok")
            .write.mode("append").parquet(metaDir)
          b.filter(!col("ok"))
            .select(col("media_id"), col("ts"))
            .write.mode("append").parquet(deadDir)
        } finally { b.unpersist(); () }
      }
}
