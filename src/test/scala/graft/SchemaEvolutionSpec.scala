package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.io.Writers

/** S-family close-out: reading a parquet table across a schema change
  * (a column added mid-stream) — merged-footer path and the pinned-
  * schema scale path must agree, and column pruning must still reach
  * the scan under both.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions batch schemas; old rows null-fill new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, 30L, 300L), (4L, 40L, 400L)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)

    val merged = Writers.readEvolved(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq(
      (1L, None), (2L, None), (3L, Some(300L)), (4L, Some(400L))))

    // pinned-schema path: same rows, no footer merge at planning
    val pinned = StructType(Seq(
      StructField("id", LongType), StructField("a", LongType),
      StructField("b", LongType)))
    val viaPinned = Writers.readEvolved(spark, dir, Some(pinned))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(viaPinned.toSeq == rows.toSeq)
  }

  test("pruning reaches the scan through an evolved read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve2").toString
    Seq((1L, 10L)).toDF("id", "a").write.mode("append").parquet(dir)
    Seq((2L, 20L, 200L)).toDF("id", "a", "b").write.mode("append").parquet(dir)
    val df = Writers.readEvolved(spark, dir).select(col("b"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<b:bigint>"),
      s"projection did not prune to b:\n${scan.take(800)}")
    assert(df.collect().flatMap(r => Option(r.get(0))).toSeq == Seq(200L))
  }
}
