package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TTLConfig, ValueState}

import ScoringStream.{EventState, RawEvent, Scored}

/** ST2 on Spark 4's `transformWithState` (the `StatefulProcessor` API —
  * SURVEY.md §2.9 names this as the Spark-4-native mapping;
  * `flatMapGroupsWithState` in [[ScoringStream.scoredStream]] is the
  * 3.x-compatible twin with identical semantics, and the spec asserts
  * both produce the same outputs).
  *
  * transformWithState requires the RocksDB state store — which is also
  * the right answer at 100 TB: state lives off-heap per executor,
  * snapshotted incrementally to the checkpoint location, and the
  * operator supports state TTL ([[TTLConfig]]) for key expiry the
  * reference never implements.
  */
class ScoringProcessor
    extends StatefulProcessorWithInitialState[(Long, String), RawEvent, Scored, EventState] {

  @transient private var state: ValueState[EventState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EventState](
      "counters", Encoders.product[EventState], TTLConfig.NONE)

  override def handleInitialState(key: (Long, String), initial: EventState,
      timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
    state.update(initial)

  override def handleInputRows(key: (Long, String), rows: Iterator[RawEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Scored] = {
    val (outs, stN) = ScoringStream.processGroup(
      Option(state.get()).getOrElse(EventState.zero), rows)
    state.update(stN)
    outs.iterator
  }
}

object ScoringProcessor {
  /** The transformWithState pipeline (requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider — set by [[configureRocksDb]]).
    */
  def scoredStreamTws(
      spark: SparkSession,
      events: Dataset[RawEvent],
      initialState: Dataset[((Long, String), EventState)]): Dataset[Scored] = {
    import spark.implicits._
    events.groupByKey(e => (e.user, e.item))
      .transformWithState(new ScoringProcessor(),
        TimeMode.None(), OutputMode.Append(),
        initialState.groupByKey(_._1).mapValues(_._2))
  }

  def configureRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
