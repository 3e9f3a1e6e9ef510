package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

/** Streaming windowed top-k values — the continuous tail monitor
  * ("largest k observations per series per minute": slowest requests,
  * biggest orders, worst scores): [[TopKAggregator]]'s O(k) bounded
  * partial state IS the streaming aggregation state, so a hot key
  * holds k longs per open window however many events it receives —
  * the same property that makes the aggregator map-side-combinable in
  * batch makes its streaming state bounded (`collect_list` state
  * grows with the window's event count instead). Event-time windows
  * with a watermark; append mode emits each window once, finalized.
  * Values quantized to integer micros (the repo's exact-state rule),
  * joined desc into one deterministic cell.
  */
object TopKStream {

  def windowedTopValues(events: Dataset[MetricEvent], k: Int,
      windowLen: String, watermark: String): DataFrame = {
    val topk = udaf(TopKAggregator(k), Encoders.scalaLong)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("key"))
      .agg(topk(expr("CAST(round(value * 1e6) AS BIGINT)")).as("top_micros"))
      .select(col("w.start").as("win_start"), col("key"), col("top_micros"))
  }
}
