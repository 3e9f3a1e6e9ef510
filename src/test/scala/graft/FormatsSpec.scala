package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.io.Writers

/** Columnar-format parity beyond parquet (ORC: pushdown + pruning must
  * reach the scan) and lenient JSON-lines ingest (the dead-letter
  * contract lenientCsv pins for CSV, on the other ubiquitous corpus
  * format).
  */
class FormatsSpec extends SparkSpec {

  test("ORC round-trip preserves data; filters and pruning reach the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/orders"
    val src = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    Writers.writeOrc(src, dir)

    val back = Writers.readOrc(spark, dir)
    assert(back.count() == src.count())
    assert(back.schema.fieldNames.toSeq == src.schema.fieldNames.toSeq)

    // 2-column projection with a selective predicate: the ORC scan must
    // carry both the pushed filter and the pruned read schema — a scan
    // reading all columns for this projection is the smell the S1
    // parquet path already guards against
    val q = back.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), " +
      "EqualTo(o_orderstatus,F)]"), s"no pushed filter in:\n$plan")
    assert(!plan.contains("o_custkey"), s"column pruning failed:\n$plan")

    val expected = src.filter(col("o_orderstatus") === "F").count()
    assert(q.count() == expected)
  }

  test("hive-partitioned write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/orders"
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning —
    // at 100 TB the difference between listing one partition and
    // scanning the table), NOT in PushedFilters/post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$plan")
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F").count()
    assert(q.count() == expected)
  }

  test("lenient JSON-lines: good rows parse, malformed lines dead-letter") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "alpha"}""")
    w.println("""{"doc_id": 2, "text": "beta"}""")
    w.println("""{"doc_id": 3, "text": """) // truncated — malformed
    w.println("""not json at all""")
    w.close()

    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    // cache: Spark disallows queries whose referenced columns are ONLY
    // the internal corrupt-record column over a raw JSON scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    // dead-letter split must read from the parsed, materialized result
    val df = Writers.lenientJsonl(spark, schema, f.getPath).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2L && bad.count() == 2L)
    assert(good.select(col("doc_id")).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
    // the malformed payloads are preserved verbatim for the dead-letter
    // sink (ST8's log-and-continue rule), not silently dropped
    val corrupt = bad.select(col("_corrupt_record")).collect()
      .map(_.getString(0)).toSet
    assert(corrupt.exists(_.contains("not json at all")), s"got $corrupt")
  }
}
