package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** OPERATOR-UPGRADE contract for stateful streams: a 100 TB deployment
  * cannot replay its tape when the processor changes, so the upgrade
  * path is "restart the NEW operator version on the OLD checkpoint".
  * transformWithState supports exactly one safe evolution without
  * re-encoding: registering an ADDITIONAL state variable (a new column
  * family) — existing variables reload as-is, the new one starts
  * empty. This spec pins that contract end-to-end: V1 folds per-user
  * (n, sum); V2 keeps the same "counts" variable AND adds a "max_amt"
  * ValueState. After the upgrade-restart, counts must CONTINUE from
  * the V1 fold (nothing re-zeroed, nothing lost) while max_amt
  * reflects only post-upgrade rows — proving upgrades are additive,
  * not wipe-and-rebuild.
  */
class StateEvolutionSpec extends SparkSpec {

  import StateEvolutionSpec._

  private def withRocksDb[A](body: => A): A = {
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("V2 processor adds a state variable on a V1 checkpoint; V1 state carries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EvoEvent]
      val ckpt =
        java.nio.file.Files.createTempDirectory("state_evo").toString
      val got =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      def start(v2: Boolean) = {
        val base = input.toDS().groupByKey(_.user)
        val out: DataFrame =
          if (v2) base.transformWithState(new EvoV2(),
            TimeMode.None(), OutputMode.Append()).toDF()
          else base.transformWithState(new EvoV1(),
            TimeMode.None(), OutputMode.Append()).toDF()
        out.writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach(r => got.add(r.toString)); ()
          }
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      }
      val q1 = start(v2 = false)
      try {
        input.addData(EvoEvent(1L, 10L), EvoEvent(1L, 5L), EvoEvent(2L, 7L))
        q1.processAllAvailable()
      } finally q1.stop()

      got.clear()
      val q2 = start(v2 = true)
      try {
        input.addData(EvoEvent(1L, 3L), EvoEvent(2L, 9L), EvoEvent(3L, 1L))
        q2.processAllAvailable()
      } finally q2.stop()

      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toSet
      // user 1: V1 folded (n=2, sum=15); V2 adds one row of 3 and a
      // fresh max over post-upgrade rows only
      assert(rows.contains("[1,3,18,3]"),
        s"user 1 state did not carry across the upgrade: $rows")
      assert(rows.contains("[2,2,16,9]"),
        s"user 2 state did not carry across the upgrade: $rows")
      // user 3 is new entirely: both variables start from zero
      assert(rows.contains("[3,1,1,1]"),
        s"fresh key after upgrade wrong: $rows")
    }
  }

  /** The ROLLBACK path: a bad V2 deploy rolls back to V1 on the same
    * checkpoint — the checkpoint now contains a state variable
    * ("max_amt") the V1 processor never registers. The operational
    * question is whether the orphaned column family is tolerated
    * (rollback = restart) or rejected (rollback = state surgery).
    * This pins the observed contract so a Spark upgrade changing it
    * fails loudly here instead of in an incident.
    */
  test("rollback: V1 processor on a V2 checkpoint (orphaned state variable)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EvoEvent]
      val ckpt =
        java.nio.file.Files.createTempDirectory("state_evo_rb").toString
      val got =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      def start(v2: Boolean) = {
        val base = input.toDS().groupByKey(_.user)
        val out: DataFrame =
          if (v2) base.transformWithState(new EvoV2(),
            TimeMode.None(), OutputMode.Append()).toDF()
          else base.transformWithState(new EvoV1(),
            TimeMode.None(), OutputMode.Append()).toDF()
        out.writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach(r => got.add(r.toString)); ()
          }
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      }
      val q1 = start(v2 = true)
      try {
        input.addData(EvoEvent(1L, 10L), EvoEvent(1L, 5L))
        q1.processAllAvailable()
      } finally q1.stop()

      got.clear()
      val q2 = start(v2 = false)
      val outcome = scala.util.Try {
        input.addData(EvoEvent(1L, 3L))
        q2.processAllAvailable()
      }
      try {
        outcome match {
          case scala.util.Success(_) =>
            // tolerated: V1 continues the shared "counts" fold; the
            // orphaned max_amt column family is simply never read
            info("rollback TOLERATED: orphaned state variable ignored")
            import scala.jdk.CollectionConverters._
            assert(got.asScala.toSet.contains("[1,3,18]"),
              s"rollback run lost the V2 fold: ${got.asScala.toSet}")
          case scala.util.Failure(e) =>
            // rejected: must be the state-schema guard, not a crash in
            // the operator — rollback then requires checkpoint surgery
            def chain(t: Throwable): Seq[String] =
              Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
                .map(x => s"${x.getClass.getSimpleName}: ${String.valueOf(x.getMessage).take(200)}")
                .toSeq
            val msgs = chain(e).mkString(" <- ")
            info(s"rollback REJECTED by the state-schema guard: ${msgs.take(160)}")
            assert(msgs.toLowerCase.contains("state") &&
              (msgs.toLowerCase.contains("schema") ||
                msgs.toLowerCase.contains("column famil") ||
                msgs.toLowerCase.contains("variable")),
              s"rollback failed OUTSIDE the state-schema guard: $msgs")
        }
      } finally q2.stop()
    }
  }

  /** The second supported evolution: with the AVRO state encoding
    * (`spark.sql.streaming.stateStore.encodingFormat=avro`, chosen at
    * the FIRST checkpoint — UnsafeRow bytes cannot evolve), the state
    * STRUCT itself may gain a nullable field: V1's (n, sum) records
    * deserialize under V3's (n, sum, last) schema with last=null.
    * This is the in-place upgrade for "the fold needs another
    * accumulator" — no new variable, no state rewrite.
    */
  test("avro encoding: state struct gains a nullable field across restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val encKey = "spark.sql.streaming.stateStore.encodingFormat"
    withRocksDb {
      spark.conf.set(encKey, "avro")
      try {
        val input = MemoryStream[EvoEvent]
        val ckpt =
          java.nio.file.Files.createTempDirectory("state_evo_avro").toString
        val got =
          java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        def start(v3: Boolean) = {
          val base = input.toDS().groupByKey(_.user)
          val out: DataFrame =
            if (v3) base.transformWithState(new EvoV3(),
              TimeMode.None(), OutputMode.Append()).toDF()
            else base.transformWithState(new EvoV1(),
              TimeMode.None(), OutputMode.Append()).toDF()
          out.writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.collect().foreach(r => got.add(r.toString)); ()
            }
            .option("checkpointLocation", ckpt)
            .outputMode(OutputMode.Append()).start()
        }
        val q1 = start(v3 = false)
        try {
          input.addData(EvoEvent(1L, 10L), EvoEvent(1L, 5L), EvoEvent(2L, 7L))
          q1.processAllAvailable()
        } finally q1.stop()

        got.clear()
        val q2 = start(v3 = true)
        try {
          input.addData(EvoEvent(1L, 3L), EvoEvent(3L, 1L))
          q2.processAllAvailable()
        } finally q2.stop()

        import scala.jdk.CollectionConverters._
        val rows = got.asScala.toSet
        // user 1: V1 fold (2, 15) evolved in place, `last` now tracked
        assert(rows.contains("[1,3,18,3]"),
          s"user 1 evolved state wrong: $rows")
        // user 3: fresh key under the evolved schema
        assert(rows.contains("[3,1,1,1]"),
          s"fresh key under evolved schema wrong: $rows")
      } finally spark.conf.unset(encKey)
    }
  }
}

object StateEvolutionSpec {
  case class EvoEvent(user: Long, amt: Long)
  case class CountsV1(n: Long, sum: Long)
  /** CountsV1 plus a nullable accumulator — the avro-evolvable shape. */
  case class CountsV3(n: Long, sum: Long, last: Option[Long])

  /** V1: one "counts" variable folding (n, sum) per user. */
  class EvoV1 extends StatefulProcessor[Long, EvoEvent, (Long, Long, Long)] {
    @transient private var counts: ValueState[CountsV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[CountsV1](
        "counts", Encoders.product[CountsV1], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EvoEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Long)] = {
      val c0 = Option(counts.get()).getOrElse(CountsV1(0L, 0L))
      val c = rows.foldLeft(c0)((a, e) => CountsV1(a.n + 1L, a.sum + e.amt))
      counts.update(c)
      Iterator((key, c.n, c.sum))
    }
  }

  /** V2: the SAME "counts" variable (same encoder — reloads V1's
    * bytes) plus a NEW "max_amt" variable that V1 never wrote.
    */
  class EvoV2 extends StatefulProcessor[Long, EvoEvent, (Long, Long, Long, Long)] {
    @transient private var counts: ValueState[CountsV1] = _
    @transient private var maxAmt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getValueState[CountsV1](
        "counts", Encoders.product[CountsV1], TTLConfig.NONE)
      maxAmt = getHandle.getValueState[Long](
        "max_amt", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[EvoEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val c0 = Option(counts.get()).getOrElse(CountsV1(0L, 0L))
      val m0 = Option(maxAmt.get()).getOrElse(0L)
      var c = c0
      var m = m0
      rows.foreach { e =>
        c = CountsV1(c.n + 1L, c.sum + e.amt)
        m = math.max(m, e.amt)
      }
      counts.update(c)
      maxAmt.update(m)
      Iterator((key, c.n, c.sum, m))
    }
  }

  /** V3: the SAME "counts" variable under the EVOLVED struct — avro
    * deserializes V1 records with last=None. Emits (user, n, sum,
    * last) with the V1-compatible default when absent.
    */
  class EvoV3 extends StatefulProcessor[Long, EvoEvent, (Long, Long, Long, Long)] {
    @transient private var counts: ValueState[CountsV3] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[CountsV3](
        "counts", Encoders.product[CountsV3], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EvoEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val c0 = Option(counts.get()).getOrElse(CountsV3(0L, 0L, None))
      val c = rows.foldLeft(c0)((a, e) =>
        CountsV3(a.n + 1L, a.sum + e.amt, Some(e.amt)))
      counts.update(c)
      Iterator((key, c.n, c.sum, c.last.getOrElse(0L)))
    }
  }
}
