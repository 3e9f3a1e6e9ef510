package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.MinHashBands

/** One (band_key) hit of one document. */
final case class BandHit(band_key: String, band: Int, doc_id: Long, ts: Timestamp)

/** A band collision: `doc_id` shares `band` with the bucket's owner
  * `dup_of` (the earliest-arriving doc holding that band key). One row
  * per shared band — a pair sharing several bands appears several
  * times; the downstream exact-jaccard verify (q35's machinery)
  * deduplicates, mirroring the batch design where LSH emits candidates
  * and verification is a separate stage.
  */
final case class NearDupCandidate(doc_id: Long, dup_of: Long, band: Int)

/** Bucket state: the first-arriving document of a band bucket. */
final case class BucketOwner(owner: Long)

/** STREAMING near-duplicate detection for continuous corpus ingestion —
  * the streaming twin of the batch MinHash+LSH pipeline (q36), the way
  * exact dedup has its watermarked `dropDuplicates` twin.
  *
  * Each arriving doc computes its 4 LSH band keys per row (stateless,
  * [[MinHashBands]]); a single `flatMapGroupsWithState` keyed by
  * band_key holds one long (the bucket owner) per live bucket and emits
  * a candidate for every later doc landing in an owned bucket.
  *
  * Scale/state contract: state is ONE owner id per distinct band key
  * seen within the retention horizon, and EXPIRES via event-time
  * timeout at (max event time in bucket + retention) — so state size is
  * bounded by the distinct-bucket rate times the horizon, never by
  * stream length. A streaming dedup can only see duplicates within its
  * horizon; corpus-wide dedup remains the batch job's contract
  * (q36/q65), exactly as in production ingestion pipelines.
  */
object NearDupStream {

  /** docs must have (idCol: long, textCol: string, tsCol: timestamp). */
  def candidates(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermark: String, retentionMs: Long, parallelism: Int): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = MinHashBands.bandRows(docs, idCol, textCol, tsCol, parallelism)
      .selectExpr(s"band_key", "band", s"$idCol AS doc_id", s"$tsCol AS ts")
      .as[BandHit]
    bands
      .withWatermark("ts", watermark)
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketOwner, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, hits, state: GroupState[BucketOwner]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within-batch order: arrival time, then id
            val batch = hits.toVector.sortBy(h => (h.ts.getTime, h.doc_id))
            val out = Vector.newBuilder[NearDupCandidate]
            var owner = state.getOption.map(_.owner)
            var maxTs = 0L
            batch.foreach { h =>
              maxTs = math.max(maxTs, h.ts.getTime)
              owner match {
                case Some(o) =>
                  if (h.doc_id != o) out += NearDupCandidate(h.doc_id, o, h.band)
                case None =>
                  owner = Some(h.doc_id)
              }
            }
            owner.foreach(o => state.update(BucketOwner(o)))
            // expire the bucket once the watermark passes its horizon
            state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }
}
