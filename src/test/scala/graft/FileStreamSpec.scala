package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The FILE streaming I/O family — the broker-free ingest/egress path
  * a 100 TB lake actually runs on (the Kafka wiring is
  * environment-blocked here; files are not):
  *
  *  - SOURCE: a directory is a stream; new files become new
  *    micro-batches, `maxFilesPerTrigger` bounds admission so a
  *    backlog of thousands of landed files cannot become one
  *    unboundedly large batch.
  *  - SINK: the parquet sink's `_spark_metadata` transactional log is
  *    the source of truth for batch reads — a crashed task's orphan
  *    file in the directory is INVISIBLE to readers (exactly-once
  *    output without a table format), and a kill+restart does not
  *    duplicate rows because the log commits per batch id.
  */
class FileStreamSpec extends SparkSpec {

  test("file source: new files arrive as new micro-batches under maxFilesPerTrigger") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fstream_src").toString
    val ckpt = Files.createTempDirectory("fstream_src_ck").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(dir)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
    val q = spark.readStream
      .schema("id LONG, tag STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.add((id, b.select("id").collect().map(_.getLong(0)).toSet))
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      Seq((4L, "d"), (5L, "e")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toVector.filter(_._2.nonEmpty)
    assert(got.map(_._2).reduce(_ ++ _) === Set(1L, 2L, 3L, 4L, 5L),
      s"file-source ingest lost rows: $got")
    // the late file landed in a LATER batch than the initial load
    val firstSeen = got.find(_._2.contains(1L)).get._1
    val lateSeen = got.find(_._2.contains(4L)).get._1
    assert(lateSeen > firstSeen,
      s"late-arriving file was not a new incremental batch: $got")
  }

  test("file sink: _spark_metadata log excludes orphan files; restart does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val out = Files.createTempDirectory("fstream_sink").toString
    val ckpt = Files.createTempDirectory("fstream_sink_ck").toString
    def start() = input.toDS().toDF("v")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(1L, 2L, 3L)
      q1.processAllAvailable()
      // batch 1 added but NOT awaited: in flight at the kill
      input.addData(4L, 5L)
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData(6L)
      q2.processAllAvailable()
    } finally q2.stop()

    val committed = spark.read.parquet(out)
    assert(committed.select("v").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "file sink lost or duplicated rows across the kill+restart")
    assert(Files.exists(Paths.get(out, "_spark_metadata")),
      "parquet sink did not write its transactional log")

    // Drop an ORPHAN into the directory — a crashed task's output that
    // never reached the log. A log-aware batch read must not see it.
    val part = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_spark_metadata"))
      .head
    Files.copy(Paths.get(part),
      Paths.get(out, "part-99999-orphan.snappy.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    assert(spark.read.parquet(out).count() === 6L,
      "orphan file leaked into a batch read — the metadata log is " +
        "not being honored as the source of truth")
  }

  /** Trigger.AvailableNow: the scheduled-incremental pattern — drain
    * everything that has landed since the last run in BOUNDED batches
    * (admission limits still apply, unlike the legacy one-shot
    * Trigger.Once), then terminate on its own. At 100 TB this is how
    * incremental ETL runs without a 24/7 cluster: the checkpoint
    * carries the offset between invocations, so each run picks up
    * exactly where the previous one stopped.
    */
  test("Trigger.AvailableNow drains the backlog in bounded batches, then stops") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("fstream_an").toString
    val ckpt = Files.createTempDirectory("fstream_an_ck").toString
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    def drain(): Unit = {
      val q = spark.readStream
        .schema("id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect()
          if (rows.nonEmpty) nBatches.incrementAndGet()
          rows.foreach(r => got.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode(OutputMode.Append()).start()
      assert(q.awaitTermination(120000),
        "AvailableNow query did not terminate on its own")
    }
    // three files land, then ONE scheduled run drains all three in
    // maxFilesPerTrigger-bounded batches and exits
    (1 to 3).foreach(i => Seq(i.toLong).toDF("id")
      .coalesce(1).write.mode("append").parquet(dir))
    drain()
    assert(got.asScala.toSet === Set(1L, 2L, 3L), s"backlog not drained: $got")
    assert(nBatches.get() >= 3,
      s"admission limit ignored under AvailableNow: ${nBatches.get()} batches")
    // a later file + a SECOND scheduled run resumes from the checkpoint
    Seq(4L).toDF("id").coalesce(1).write.mode("append").parquet(dir)
    drain()
    assert(got.asScala.toSet === Set(1L, 2L, 3L, 4L),
      s"second run lost the new file: $got")
  }

  /** Ingest → layout → pruned scan: a partitionBy sink writes the
    * hive layout batch readers prune on. At 100 TB the partition
    * filter is the difference between scanning one day and scanning
    * the lake — the assertion is structural (the scan's partition
    * count), not a timing.
    */
  test("partitioned sink layout prunes batch read-back") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = Files.createTempDirectory("fstream_part").toString
    val ckpt = Files.createTempDirectory("fstream_part_ck").toString
    val q = input.toDS().toDF("day", "v")
      .writeStream.format("parquet")
      .partitionBy("day")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("2026-01-01", 1L), ("2026-01-02", 2L),
        ("2026-01-03", 3L), ("2026-01-02", 4L))
      q.processAllAvailable()
    } finally q.stop()

    assert(Files.exists(Paths.get(out, "day=2026-01-02")),
      "sink did not write the hive partition layout")
    val pruned = spark.read.parquet(out).filter(col("day") === "2026-01-02")
    assert(pruned.select("v").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(2L, 4L))
    // structural pruning proof: the scan's selected partition count
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the plan"))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .length === 1,
      s"partition filter did not prune to one partition: " +
        s"${scan.partitionFilters}")
  }
}
