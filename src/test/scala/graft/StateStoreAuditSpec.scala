package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.ScoringStream
import graft.streaming.ScoringStream.{EventState, RawEvent}

/** Spark 4's state data source (`spark.read.format("statestore")`) as
  * an AUDIT surface (VERDICT r11 #7a — the last unexplored streaming
  * seam): after a streaming query commits, its checkpointed operator
  * state is read back OUT-OF-BAND and compared field-by-field against
  * the batch twin computed from the same tape. This catches a class of
  * bug the sink-side parity tests cannot: output rows can be right
  * while the persisted state drifts (e.g. a state.update with a stale
  * fold) — wrong state only surfaces as wrong output AFTER a restart,
  * by which time the tape that built it is gone.
  */
class StateStoreAuditSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Runs the body under RocksDB with CHANGELOG checkpointing — the
    * production knob for large state (per-batch delta files replayed
    * over periodic snapshots instead of full-snapshot uploads every
    * commit; VERDICT r12 #5). Both the WRITE half (the streaming query)
    * and the READ half (the statestore source, which must reconstruct
    * a version by replaying changelogs it never wrote itself) run under
    * the mode; each state-kind audit below is registered twice so the
    * changelog replay path is held to the exact same batch-fold oracle
    * as the default format.
    */
  private def withChangelogRocksDb(body: => Unit): Unit = {
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    spark.conf.set(changelogKey, "true")
    try body
    finally {
      spark.conf.unset(changelogKey)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** `key.*` + `value.*`, drilling one level when the value wraps the
    * state object in a single nested struct (the layout varies by
    * operator: dropDuplicates values are empty/null placeholders,
    * flatMapGroupsWithState wraps the encoder's product).
    */
  private def flatten(state: DataFrame): DataFrame = {
    def expand(prefix: String): Seq[String] =
      state.schema(prefix).dataType match {
        case s: StructType if s.fields.length == 1 &&
            s.fields.head.dataType.isInstanceOf[StructType] =>
          Seq(s"$prefix.${s.fields.head.name}.*")
        case _: StructType => Seq(s"$prefix.*")
        case _ => Seq(prefix)
      }
    state.selectExpr(expand("key") ++ expand("value"): _*)
  }

  test("flatMapGroupsWithState: checkpointed counters equal the batch fold") {
    auditFmgws("hdfs")
  }

  test("flatMapGroupsWithState audit holds under RocksDB changelog checkpointing") {
    withChangelogRocksDb { auditFmgws("chlog") }
  }

  private def auditFmgws(tag: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val initial = Seq(
      ((7L, "c1"), EventState(2L, 0L, 0L, 0L, 0L, 2L))).toDS()
    val ckpt = ckptDir(s"ssaudit_fmgws_$tag")
    val out = ScoringStream.scoredStream(spark, input.toDS(), initial)
    val q = out.writeStream.format("memory").queryName(s"ssaudit_scored_$tag")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(RawEvent(7L, "c1", "click", ts(10)),
        RawEvent(7L, "c1", "view", ts(11)),
        RawEvent(8L, "c2", "purchase", ts(12)))
      q.processAllAvailable()
      input.addData(RawEvent(7L, "c1", "error", ts(20)),
        RawEvent(9L, "c3", "zzz-unknown", ts(21))) // dead-letter: state total stays 0
      q.processAllAvailable()
    } finally q.stop()

    // groupByKey on a (Long, String) tuple stores the key as _1/_2
    val state = flatten(
      spark.read.format("statestore").load(ckpt))
      .select(col("_1").as("user"), col("_2").as("item"), col("nClick"),
        col("nView"), col("nPurchase"), col("nSignup"), col("nError"),
        col("total"))
    // batch twin over the SAME tape: per-(user,item) action counts,
    // seeded with the bootstrap snapshot; unknown actions don't count
    // (ST8 dead-letter semantics) but the key still materializes state
    val expected = Set(
      (7L, "c1", 3L, 1L, 0L, 0L, 1L, 5L), // bootstrap 2 clicks + tape
      (8L, "c2", 0L, 0L, 1L, 0L, 0L, 1L),
      (9L, "c3", 0L, 0L, 0L, 0L, 0L, 0L))
    val got = state.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7))).toSet
    assert(got === expected, s"checkpointed state diverged from batch fold")

    // STATE TIME TRAVEL: option("batchId", 0) reads the store AS OF the
    // first commit — it must equal the fold of the tape PREFIX (batch 1
    // only: no error yet for user 7, no c3 key at all). A time-travel
    // read that silently served the latest version would still pass the
    // final-state check above; this pins the versioned read itself.
    val asOf0 = flatten(
      spark.read.format("statestore").option("batchId", 0).load(ckpt))
      .select(col("_1").as("user"), col("_2").as("item"), col("nClick"),
        col("nView"), col("nPurchase"), col("nSignup"), col("nError"),
        col("total"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSet
    assert(asOf0 === Set(
      (7L, "c1", 3L, 1L, 0L, 0L, 0L, 4L), // click+view on the bootstrap
      (8L, "c2", 0L, 0L, 1L, 0L, 0L, 1L)),
      "batchId=0 state read is not the prefix-tape fold")
  }

  test("transformWithState: persisted 'counters' state matches the fMGWS twin") {
    auditTws("rocks")
  }

  test("transformWithState audit holds under RocksDB changelog checkpointing") {
    withChangelogRocksDb { auditTws("chlog") }
  }

  private def auditTws(tag: String): Unit = {
    // The two stateful APIs are asserted output-identical in
    // StreamingSpec; this audits the stronger claim that they PERSIST
    // identical state — the part a restart actually depends on. TWS
    // state is read back per named state variable
    // (option("stateVarName", ...)), here the "counters" ValueState,
    // and must equal the same batch fold the fMGWS audit pins.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try {
      val input = MemoryStream[RawEvent]
      val initial = Seq(
        ((7L, "c1"), EventState(2L, 0L, 0L, 0L, 0L, 2L))).toDS()
      val ckpt = ckptDir(s"ssaudit_tws_$tag")
      val out = graft.streaming.ScoringProcessor
        .scoredStreamTws(spark, input.toDS(), initial)
      val q = out.writeStream.format("memory").queryName(s"ssaudit_tws_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(RawEvent(7L, "c1", "click", ts(10)),
          RawEvent(7L, "c1", "view", ts(11)),
          RawEvent(8L, "c2", "purchase", ts(12)))
        q.processAllAvailable()
        input.addData(RawEvent(7L, "c1", "error", ts(20)),
          RawEvent(9L, "c3", "zzz-unknown", ts(21)))
        q.processAllAvailable()
      } finally q.stop()

      val state = flatten(
        spark.read.format("statestore")
          .option("stateVarName", "counters").load(ckpt))
        .select(col("_1").as("user"), col("_2").as("item"), col("nClick"),
          col("nView"), col("nPurchase"), col("nSignup"), col("nError"),
          col("total"))
      val expected = Set(
        (7L, "c1", 3L, 1L, 0L, 0L, 1L, 5L),
        (8L, "c2", 0L, 0L, 1L, 0L, 0L, 1L),
        (9L, "c3", 0L, 0L, 0L, 0L, 0L, 0L))
      val got = state.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSet
      assert(got === expected,
        "transformWithState persisted state diverged from the batch fold " +
          "(and therefore from the fMGWS twin's audited state)")

      // SNAPSHOT-REPLAY equivalence (changelog leg only — the API
      // starts from an uploaded snapshot and replays changelog files
      // forward, which only exist in this mode): reconstructing every
      // partition via snapshotStartBatchId=0 must equal the plain
      // latest-version read. This is the supported kernel of offline
      // state surgery (rescale/repair reads state this way), and a
      // changelog replay bug that dropped or double-applied a delta
      // would surface here as a diverging row.
      if (tag == "chlog") {
        val plain = spark.read.format("statestore")
          .option("stateVarName", "counters").load(ckpt)
        val parts = plain.select(col("partition_id")).distinct()
          .collect().map(_.getInt(0)).sorted
        // sorted multisets, not Sets (ADVICE r13): a replay bug that
        // drops a row string-equal to another partition's row, or
        // double-applies a delta into a duplicate, would be masked by
        // set collapse
        val plainRows = plain.drop("partition_id").collect()
          .map(_.toString).toSeq.sorted
        val snapRows = parts.map { p =>
            spark.read.format("statestore")
              .option("stateVarName", "counters")
              .option("snapshotStartBatchId", 0)
              .option("snapshotPartitionId", p)
              .load(ckpt)
          }.reduce(_ unionAll _)
          .drop("partition_id").collect().map(_.toString).toSeq.sorted
        assert(snapRows === plainRows,
          s"snapshot-replay read diverged from the latest-version read: " +
            s"missing=${plainRows.diff(snapRows)} " +
            s"extra=${snapRows.diff(plainRows)}")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("MapState+TTL: persisted cart entries equal the batch fold") {
    auditCart("rocks")
  }

  test("MapState+TTL audit holds under RocksDB changelog checkpointing") {
    withChangelogRocksDb { auditCart("chlog") }
  }

  private def auditCart(tag: String): Unit = {
    // Completes the state-kind matrix: ValueState (above), dropDuplicates
    // keys (below), and here the COMPOSITE-KEY MapState with per-entry
    // TTL — one persisted row per (user, item) map entry, read back via
    // stateVarName="cart". A long TTL keeps expiry out of the picture;
    // what is audited is the fold (view +1, purchase removes) as
    // PERSISTED, not as emitted.
    import java.time.Duration
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try {
      val input = MemoryStream[RawEvent]
      val ckpt = ckptDir(s"ssaudit_cart_$tag")
      val out = graft.streaming.CartStream.cartCounts(
        input.toDS(), Duration.ofHours(1))
      // TimeMode.ProcessingTime operators never settle under
      // processAllAvailable (the TTL clock advances batch-by-batch) —
      // pace with a real trigger and poll the sink, the CartStreamSpec
      // discipline
      val q = out.writeStream.format("memory").queryName(s"ssaudit_cart_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("100 milliseconds"))
        .start()
      def awaitSnapshot(user: Long, items: String): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!spark.table(s"ssaudit_cart_$tag").collect()
            .exists(r => r.getLong(0) == user && r.getString(1) == items)) {
          assert(System.currentTimeMillis() < deadline,
            s"timed out waiting for ($user, $items) in " +
              spark.table(s"ssaudit_cart_$tag").collect().mkString(", "))
          Thread.sleep(100)
        }
      }
      try {
        input.addData(RawEvent(5L, "a", "view", ts(1)),
          RawEvent(5L, "b", "view", ts(2)),
          RawEvent(5L, "a", "view", ts(3)),
          RawEvent(6L, "c", "view", ts(4)))
        awaitSnapshot(5L, "a:2|b:1"); awaitSnapshot(6L, "c:1")
        input.addData(RawEvent(5L, "b", "purchase", ts(5)), // removes (5,b)
          RawEvent(6L, "c", "view", ts(6)))
        awaitSnapshot(5L, "a:2"); awaitSnapshot(6L, "c:2")
      } finally q.stop()

      val raw = spark.read.format("statestore")
        .option("stateVarName", "cart").load(ckpt)
      // layout: grouping key struct + the map's user key + the entry
      // value (possibly TTL-wrapped; primitives may sit in single-field
      // structs) — resolve the three paths generically so an upstream
      // layout rename fails with a readable schema, not a wrong audit
      import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
      def firstPath(prefix: String, dt: DataType,
          want: DataType): Option[String] = dt match {
        case `want` => Some(prefix)
        case s: StructType => s.fields.iterator
          .filterNot(_.name.toLowerCase.contains("ttl"))
          .flatMap(f => firstPath(s"$prefix.`${f.name}`", f.dataType, want))
          .nextOption()
        case _ => None
      }
      def resolve(fieldFilter: String => Boolean, want: DataType,
          what: String): String =
        raw.schema.fields.iterator.filter(f => fieldFilter(f.name))
          .flatMap(f => firstPath(s"`${f.name}`", f.dataType, want))
          .nextOption()
          .getOrElse(fail(s"no $what in state layout: ${raw.schema.treeString}"))
      val userPath = resolve(_ == "key", LongType, "grouping-key long under 'key'")
      val countPath = resolve(n => n == "value" || n == "user_map_value",
        LongType, "count long under the map-value column")
      val itemPath = resolve(n => n != "key" && n != "value" &&
        n != "user_map_value" && n != "partition_id", StringType,
        "string map key")
      val got = raw.select(expr(userPath), expr(itemPath), expr(countPath))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((5L, "a", 2L), (6L, "c", 2L)),
        s"persisted cart entries diverged (layout: ${raw.schema.simpleString})")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("dropDuplicates: state keys equal the batch distinct of the tape") {
    auditDedup("hdfs")
  }

  test("dropDuplicates audit holds under RocksDB changelog checkpointing") {
    withChangelogRocksDb { auditDedup("chlog") }
  }

  private def auditDedup(tag: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val ckpt = ckptDir(s"ssaudit_dedup_$tag")
    val out = ScoringStream.dedupStream(input.toDS(), "10 minutes")
    val q = out.writeStream.format("memory").queryName(s"ssaudit_dedup_$tag")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val tape = Seq(
      RawEvent(1L, "a", "view", ts(100)),
      RawEvent(1L, "a", "view", ts(100)), // exact duplicate: one state row
      RawEvent(1L, "a", "view", ts(160)), // same key, new ts: distinct
      RawEvent(2L, "b", "click", ts(120)))
    try {
      input.addData(tape.take(2))
      q.processAllAvailable()
      input.addData(tape.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val stateKeys = flatten(spark.read.format("statestore").load(ckpt))
      .select(col("user"), col("item"), col("action"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3))).toSet
    val batchDistinct = tape.toDF()
      .select(col("user"), col("item"), col("action"), col("ts"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3))).toSet
    assert(stateKeys === batchDistinct,
      "dedup state keys diverged from the batch distinct")
    // and the emitted stream saw exactly one row per distinct key
    assert(spark.table(s"ssaudit_dedup_$tag").count() === batchDistinct.size.toLong)

    // CHANGE FEED: the store's per-batch deltas must match the tape's
    // per-batch NEW keys (batch 0 inserted one deduped key, batch 1 two
    // more; dedup state is insert-only, so no deletes ever appear) —
    // the final-state read above cannot distinguish "written in the
    // right batch" from "all written at the end"; this can.
    val feed = spark.read.format("statestore")
      .option("readChangeFeed", "true")
      .option("changeStartBatchId", "0")
      .load(ckpt)
    val byBatch = feed
      .select(col("batch_id"), col("change_type"),
        col("key.user"), col("key.item"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(byBatch.forall(_._2 == "update"),
      s"dedup state is insert-only; change feed shows: ${byBatch.toSeq}")
    val perBatchKeys = byBatch.groupBy(_._1)
      .view.mapValues(_.map(t => (t._3, t._4)).toSet).toMap
    assert(perBatchKeys(0L) === Set((1L, "a")),
      s"batch 0 delta wrong: ${perBatchKeys.get(0L)}")
    assert(perBatchKeys(1L) === Set((1L, "a"), (2L, "b")),
      s"batch 1 delta wrong: ${perBatchKeys.get(1L)}")
  }

  /** The operational contract behind every stateful stream here: the
    * state partition count is written into the offset-log metadata at
    * the FIRST checkpoint and re-read on every restart —
    * `spark.sql.shuffle.partitions` is ignored from then on. At 100 TB
    * this is a sizing decision you make once, up-front: rescaling
    * state later means an offline read-state/rewrite (which the
    * statestore source used here is the supported read half of), not a
    * conf change. The test pins the behavior: a query checkpointed at
    * 3 partitions and restarted under 7 must keep ALL state (old and
    * newly written) in partitions 0-2 — 50 keys hashed over 7
    * partitions would otherwise land above 2 with certainty — and must
    * lose nothing across the restart.
    */
  test("state partition count is pinned at first checkpoint across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val input = MemoryStream[Int]
    val ckpt = ckptDir("ssaudit_pin")
    def start() = input.toDS().toDF("k").dropDuplicates("k")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => b.collect(); () }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val q1 = start()
      try { input.addData(1 to 40); q1.processAllAvailable() }
      finally q1.stop()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val q2 = start()
      try { input.addData(41 to 50); q2.processAllAvailable() }
      finally q2.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)

    val st = spark.read.format("statestore").load(ckpt)
      .select(col("partition_id"), col("key.k"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(st.map(_._2).toSet === (1 to 50).toSet,
      "state lost or invented keys across the restart")
    val above = st.filter(_._1 >= 3)
    assert(above.isEmpty,
      s"state landed outside the pinned 3 partitions (pinning broken, " +
        s"post-restart writes re-hashed under the new conf): " +
        s"${above.toSeq.sorted.mkString(", ")}")

    // And the state-metadata source (the reader family's third API,
    // beside the final-state and change-feed reads) must report the
    // same contract OUT-OF-BAND: one dedup operator whose store runs
    // at the pinned partition count, covering both batches.
    val meta = spark.read.format("state-metadata").load(ckpt)
      .select(col("operatorName"), col("numPartitions"),
        col("minBatchId"), col("maxBatchId"))
      .collect()
    assert(meta.length === 1, s"expected one stateful operator: ${meta.toSeq}")
    val m = meta.head
    assert(m.getString(0) === "dedupe",
      s"operator name: ${m.getString(0)}")
    assert(m.getInt(1) === 3,
      s"state-metadata reports numPartitions=${m.getInt(1)}, pinned 3")
    assert(m.getLong(2) === 0L && m.getLong(3) === 1L,
      s"batch range ${(m.getLong(2), m.getLong(3))}, expected (0,1)")
  }
}
