package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.SyntheticV2

/** The DataSource V2 synthetic-interactions connector (S18 at scan
  * level): schema, determinism, column pruning reaching the scan,
  * filter-pushdown partition pruning, and result parity under pruning.
  */
class SyntheticV2Spec extends SparkSpec {

  private def load(rows: Long = 10000L, partitions: Int = 8): DataFrame =
    spark.read.format("graft-synthetic")
      .option("rows", rows).option("partitions", partitions)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("ServiceLoader short name resolves; schema and counts are exact") {
    val df = load()
    assert(df.schema.fieldNames.toSeq ===
      Seq("user_id", "item_id", "n_click", "n_view", "truth", "event_ts"))
    assert(df.count() === 10000L)
    // rowsPerUser=100 default: users 0..99, 100 rows each
    val u = df.groupBy("user_id").count().agg(
      min("user_id"), max("user_id"), min("count"), max("count"))
      .head()
    assert(u.getLong(0) === 0L && u.getLong(1) === 99L)
    assert(u.getLong(2) === 100L && u.getLong(3) === 100L)
  }

  test("rows are deterministic in (seed, idx) and layout-independent") {
    val a = load(partitions = 8).collect().map(_.toSeq).sortBy(_.toString)
    val b = load(partitions = 3).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
    // spot-check one row against the published formula
    val r17 = load().filter(col("event_ts") === lit(1700000000L + 17L))
      .filter(col("user_id") === 0L).head().toSeq
    assert(r17 === SyntheticV2.row(42L, 17L, 100L, 1000L))
  }

  test("column pruning reaches the scan (ReadSchema = requested fields)") {
    val pruned = scanOf(load().select("user_id", "truth"))
    assert(pruned.scan.readSchema().fieldNames.toSeq === Seq("user_id", "truth"))
    val full = scanOf(load())
    assert(full.scan.readSchema().fieldNames.length === 6)
  }

  test("user_id predicates prune partitions; results unchanged") {
    val base = load(rows = 10000L, partitions = 8) // 1250 rows/partition
    assert(scanOf(base).inputRDD.getNumPartitions === 8)
    // users 40..44 = idx [4000, 4500) — entirely inside partition 3
    val f = base.filter(col("user_id") >= 40L && col("user_id") < 45L)
    assert(scanOf(f).inputRDD.getNumPartitions === 1)
    assert(f.count() === 500L)
    // pruning must be a pure optimization: same rows as a post-filter
    // over the unpruned table (collected without pushdown via a
    // non-prunable predicate alias)
    val unpruned = base.withColumn("u2", col("user_id") + 0L)
      .filter(col("u2") >= 40L && col("u2") < 45L).drop("u2")
    assert(f.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      unpruned.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // point lookup touches one partition; empty interval touches none
    val pt = base.filter(col("user_id") === 7L)
    assert(scanOf(pt).inputRDD.getNumPartitions === 1)
    assert(pt.count() === 100L)
    val none = base.filter(col("user_id") > 1000L)
    assert(none.count() === 0L)
  }

  test("micro-batch stream drains the bounded index space and equals the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("synv2_ckpt").toString
    val stream = spark.readStream.format("graft-synthetic")
      .option("rows", 5000L).option("partitions", 4).load()
    val name = s"synv2_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", dir).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).collect().map(_.toSeq).sortBy(_.toString)
    val batch = load(rows = 5000L, partitions = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.length === 5000)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("non-user_id predicates are not absorbed and still apply") {
    val base = load(rows = 10000L, partitions = 8)
    val f = base.filter(col("truth") === 0)
    assert(scanOf(f).inputRDD.getNumPartitions === 8)
    val n0 = f.count()
    assert(n0 > 0L && n0 < 10000L)
  }

  test("micro-batch stream consumes incrementally (>1 batch), not one giant batch") {
    val dir = java.nio.file.Files.createTempDirectory("synv2_inc").toString
    val stream = spark.readStream.format("graft-synthetic")
      .option("rows", 5000L).option("partitions", 4).load()
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        batchSizes.synchronized { batchSizes += ((id, df.count())) }; ()
      }
      .option("checkpointLocation", dir).start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batchSizes.synchronized(batchSizes.filter(_._2 > 0L))
    // rowsPerBatch = rows/partitions = 1250 ⇒ exactly 4 admission steps
    assert(nonEmpty.length > 1,
      s"table arrived in ${nonEmpty.length} batch(es): $batchSizes")
    assert(nonEmpty.map(_._2).sum === 5000L)
    assert(nonEmpty.map(_._2).max <= 1250L,
      s"admission cap exceeded: $batchSizes")
  }

  test("planner statistics reach the optimizer and reflect pushed pruning") {
    val base = load(rows = 10000L, partitions = 8)
    val full = base.queryExecution.optimizedPlan.stats
    assert(full.rowCount.contains(BigInt(10000)),
      s"full-scan rowCount ${full.rowCount}")
    // pushed user_id bounds shrink the reported stats (500 of 10000
    // rows): the V2ScanRelation re-plans stats after pushdown
    val f = base.filter(col("user_id") >= 40L && col("user_id") < 45L)
    val pruned = f.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.getOrElse(fail("no DataSourceV2ScanRelation in optimized plan"))
    assert(pruned.rowCount.contains(BigInt(500)),
      s"pruned rowCount ${pruned.rowCount}")
    assert(pruned.sizeInBytes < full.sizeInBytes)
    // the payoff: a generator-backed dimension under the broadcast
    // threshold gets BROADCAST (without statistics it reports
    // defaultSizeInBytes and never would)
    val dim = load(rows = 100L, partitions = 2)
    val fact = load(rows = 10000L, partitions = 8)
    val joined = fact.join(dim.select(col("user_id").as("u2")),
      col("user_id") === col("u2"))
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, "small synthetic dim was not broadcast:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))
  }

  test("runtime IN filter from a joined dim prunes fact partitions (DSv2 dynamic pruning)") {
    // fact: 100k rows, users 0..999, 8 partitions of 125 users each
    val fact = load(rows = 100000L, partitions = 8)
    // dim keys derive from a REAL source behind a selective predicate
    // on a NON-join column — with the predicate on the join key itself,
    // InferFiltersFromConstraints copies it onto the fact statically
    // and no runtime filter is needed; this shape forces the dynamic
    // path. Surviving keys are pmod(custkey, 45) ⊆ [0, 44] — the hull
    // lives entirely in the first of 8 fact partitions.
    val dim = Tables.customer(spark, sf001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(pmod(col("c_custkey"), lit(45)).cast("long").as("user_id"))
      .distinct()
    val joined = fact.join(dim, "user_id")
    // the optimizer must have planted a DPP subquery on the fact side
    assert(joined.queryExecution.optimizedPlan.toString
      .contains("dynamicpruning"), "no DPP filter planted:\n" +
      joined.queryExecution.optimizedPlan.toString.take(1500))
    SyntheticV2.lastPlannedPartitions.set(-1)
    val n = joined.count()
    // the LAST partition planning happened after filter(): the 8-way
    // fact scan collapsed to the single partition holding users 0-44
    assert(SyntheticV2.lastPlannedPartitions.get() === 1,
      s"runtime filter did not prune: ${SyntheticV2.lastPlannedPartitions.get()} partitions planned")
    // results equal the statically-filtered formulation (pruning to
    // the hull is lossless; the join re-applies exact keys)
    val expected = load(rows = 100000L, partitions = 8)
      .join(dim.withColumn("u2", col("user_id") + 0L).drop("user_id"),
        col("user_id") === col("u2"))
      .count()
    assert(n === expected && n > 0L)
  }

  test("metadata column _gen_index: hidden from *, resolvable by name, exact provenance") {
    val df = load(rows = 1000L, partitions = 4)
    // hidden until selected — SELECT * must NOT change
    assert(!df.schema.fieldNames.contains("_gen_index"))
    // selected by name: the provenance law user_id = _gen_index / rowsPerUser
    val got = df.select(col("_gen_index"), col("user_id"))
    assert(got.schema.fieldNames.toSeq === Seq("_gen_index", "user_id"))
    val bad = got.filter(col("user_id") =!= expr("_gen_index div 100")).count()
    assert(bad === 0L)
    // complete and layout-independent: indexes are exactly 0..rows-1
    val idx4 = load(rows = 1000L, partitions = 4)
      .select("_gen_index").collect().map(_.getLong(0)).sorted
    val idx3 = load(rows = 1000L, partitions = 3)
      .select("_gen_index").collect().map(_.getLong(0)).sorted
    assert(idx4.toSeq === (0L until 1000L) && idx3.toSeq === idx4.toSeq)
    // pruning composes: a metadata-only projection reads ONLY _gen_index
    val ps = scanOf(df.select("_gen_index"))
    assert(ps.scan.readSchema().fieldNames.toSeq === Seq("_gen_index"))
    // a row re-derived from its _gen_index matches the stored row
    val r = df.select(col("_gen_index"), col("item_id"), col("truth"))
      .filter(col("_gen_index") === 123L).head()
    val expect = SyntheticV2.row(42L, 123L, 100L, 1000L)
    assert(r.getLong(1) === expect(1) && r.getInt(2) === expect(4))
  }

  test("pushed LIMIT truncates generation (scan emits only the capped index space)") {
    val lim = load(rows = 100000L, partitions = 8).limit(7)
    // the scan itself must shrink: with the limit pushed, planned rows
    // = min(100000, 7), split ceil(7/8)=1 row per slice ⇒ 7 one-row
    // partitions instead of 8 × 12500-row ones, visible without
    // executing the query
    val scan = scanOf(lim)
    assert(scan.inputRDD.getNumPartitions === 7,
      s"limit not pushed: ${scan.inputRDD.getNumPartitions} partitions")
    assert(lim.count() === 7L)
    // limited rows are the PREFIX of the deterministic index space
    assert(lim.collect().map(_.toSeq).toSet ===
      (0L until 7L).map(SyntheticV2.row(42L, _, 100L, 1000L)).toSet)
  }
}
