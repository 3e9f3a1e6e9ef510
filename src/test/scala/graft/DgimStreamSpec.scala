package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{DgimBucket, DgimReadout, DgimStream, MetricEvent}

/** DGIM sliding-window counting: the ≤2-buckets-per-size invariant,
  * the 50% error bound against exact windowed counts at EVERY readout,
  * the logarithmic state bound, and disordered multi-batch ==
  * sequential replay.
  */
class DgimStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  private val windowMs = 1000L

  /** Deterministic bursty tape: key "a" fires at a mix of dense bursts
    * and gaps (arithmetic instants — no RNG), key "b" sparse.
    */
  private val tape: Seq[MetricEvent] = {
    val aTimes = (1 to 60).map(i => 1000L + (i.toLong * i) % 997 + i * 29L)
      .sorted
    val bTimes = Seq(1000L, 1500L, 2600L, 2700L, 2710L)
    (aTimes.zipWithIndex.map { case (t, i) =>
      MetricEvent("a", 0, ts(t), i.toLong + 1)
    } ++ bTimes.zipWithIndex.map { case (t, i) =>
      MetricEvent("b", 0, ts(t), 100L + i)
    }).sortBy(e => (e.ts.getTime, e.seq))
  }

  /** Exact trailing-window count per readout, from the tape itself. */
  private def exactCounts(t: Seq[MetricEvent]): Map[(String, Long), Long] = {
    val byKey = t.groupBy(_.key)
    t.map { e =>
      val now = byKey(e.key).filter(_.seq <= e.seq).map(_.ts.getTime).max
      val n = byKey(e.key)
        .count(x => x.seq <= e.seq && x.ts.getTime > now - windowMs)
      (e.key, e.seq) -> n.toLong
    }.toMap
  }

  test("bucket invariant: at most two buckets per size, sizes are powers of two") {
    var buckets = List.empty[DgimBucket]
    tape.filter(_.key == "a").foreach { e =>
      buckets = DgimStream.insert(buckets, e.ts.getTime)
      val bySize = buckets.groupBy(_.size)
      assert(bySize.values.forall(_.length <= 2),
        s"three buckets of one size after seq ${e.seq}: $buckets")
      assert(buckets.forall(b => java.lang.Long.bitCount(b.size) == 1),
        s"non-power-of-two bucket: $buckets")
      // newest-first timestamp order is maintained
      assert(buckets.map(_.ts) == buckets.map(_.ts).sorted(
        Ordering[Long].reverse))
    }
  }

  test("estimate is within the DGIM 50% bound of the exact windowed count, state logarithmic") {
    val exact = exactCounts(tape)
    val got = DgimStream.replay(tape, windowMs)
    var perKeySeen = Map.empty[String, Long].withDefaultValue(0L)
    got.foreach { r =>
      val truth = exact((r.key, r.seq))
      assert(math.abs(r.est - truth) <= truth / 2 + 1,
        s"${r.key}/${r.seq}: est ${r.est} vs exact $truth")
      perKeySeen += r.key -> (perKeySeen(r.key) + 1)
      val n = perKeySeen(r.key)
      val logBound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n)) + 2
      assert(r.n_buckets <= logBound,
        s"${r.key}/${r.seq}: ${r.n_buckets} buckets after $n events")
    }
    // the sketch is not trivially exact: at least one readout differs
    assert(got.exists(r => r.est != exact((r.key, r.seq))),
      "every estimate exact — tape never exercised the bucket halving")
  }

  test("disordered multi-batch stream equals the sequential replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = DgimStream.readouts(input.toDS(), windowMs,
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val name = s"dgim_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batches are time-ordered between themselves, disordered within
      val cut1 = 1400L
      val cut2 = 1900L
      val (b1, rest) = tape.partition(_.ts.getTime <= cut1)
      val (b2, b3) = rest.partition(_.ts.getTime <= cut2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.reverse)
        q.processAllAvailable()
      }
      val got = spark.table(name).as[DgimReadout].collect().toSeq
        .map(r => (r.key, r.seq, r.est, r.n_buckets, r.max_size))
        .sortBy(r => (r._1, r._2))
      val expected = DgimStream.replay(tape, windowMs)
        .map(r => (r.key, r.seq, r.est, r.n_buckets, r.max_size))
        .sortBy(r => (r._1, r._2))
      assert(got === expected)
    } finally q.stop()
  }

  /** Sequential fold with the PERSISTED high-water mark semantics the
    * stream implements: per-key hwm is monotone ACROSS batches (never
    * reset batch-locally), so an all-straggler batch expires and
    * estimates against the advanced clock, exactly like stragglers
    * meeting newer state within a batch.
    */
  private def foldBatches(batches: Seq[Seq[MetricEvent]])
      : Seq[(String, Long, Long, Long, Long)] = {
    val st = scala.collection.mutable.Map
      .empty[String, List[DgimBucket]].withDefaultValue(Nil)
    val hwm = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    batches.flatMap { b =>
      b.sortBy(e => (e.ts.getTime, e.seq)).map { e =>
        val mx = math.max(hwm(e.key), e.ts.getTime)
        hwm(e.key) = mx
        val buckets = DgimStream.insert(st(e.key), e.ts.getTime)
          .filter(_.ts > mx - windowMs)
        st(e.key) = buckets
        (e.key, e.seq, DgimStream.estimate(buckets, mx, windowMs),
          buckets.length.toLong,
          if (buckets.isEmpty) 0L else buckets.map(_.size).max)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("an all-straggler batch folds against the persisted high-water mark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = DgimStream.readouts(input.toDS(), windowMs,
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val name = s"dgim_strag_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 = the NEWER half; batch 2 = pure stragglers, every
      // event behind batch 1's per-key max (round-11 ADVICE case: the
      // old batch-local `var maxTs = 0L` regressed "now" here)
      val cut = 2000L
      val fresh = tape.filter(_.ts.getTime > cut)
      val stragglers = tape.filter(_.ts.getTime <= cut)
      assert(fresh.nonEmpty && stragglers.nonEmpty)
      Seq(fresh, stragglers).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      val got = spark.table(name).as[DgimReadout].collect().toSeq
        .map(r => (r.key, r.seq, r.est, r.n_buckets, r.max_size))
        .sortBy(r => (r._1, r._2))
      assert(got === foldBatches(Seq(fresh, stragglers)))
    } finally q.stop()
  }
}
