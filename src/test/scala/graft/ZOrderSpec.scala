package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order (Morton) clustering: codegen bit interleave + range layout. */
class ZOrderSpec extends SparkSpec {

  test("zValue matches a reference Morton interleave on the full 16x16 grid") {
    import spark.implicits._
    def mortonRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 4), s"($x,$y)")
    }
    // the grid enumerates all 256 4-bit codes exactly once (bijectivity)
    assert(got.values.toSet == (0L until 256L).toSet)
  }

  test("zValueSql replays the Column arithmetic through Spark SQL") {
    import spark.implicits._
    val df = Seq((5L, 3L), (255L, 0L), (0L, 255L), (170L, 85L)).toDF("x", "y")
    val both = df.select(
      ZOrder.zValue(col("x"), col("y"), 8).as("z_col"),
      expr(ZOrder.zValueSql("x", "y", 8)).as("z_sql"))
    assert(both.filter(col("z_col") =!= col("z_sql")).count() == 0)
  }

  test("layoutByZ gives disjoint per-partition z-ranges (file-stat pruning contract)") {
    import spark.implicits._
    val rows = (0 until 4096).map { i => (i.toLong, (i * 2654435761L % 256), (i * 40503L % 256)) }
    val df = rows.toDF("id", "xb", "yb")
    val laid = ZOrder.layoutByZ(df, col("xb"), col("yb"), 8, 8)
    val ranges = laid
      .select(spark_partition_id().as("pid"), col("z_value"))
      .groupBy("pid").agg(min("z_value").as("lo"), max("z_value").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    // consecutive partitions cover disjoint, ordered z-intervals
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // nothing lost in the shuffle
    assert(laid.count() == 4096)
  }
}
