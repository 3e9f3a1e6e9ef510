package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hilbert, ZOrder}

/** The Hilbert curve's defining contracts on a full 16×16 grid
  * (bits=4): bijectivity, the unit-Manhattan-step adjacency that
  * justifies preferring it over Z-order for layout, and disjoint
  * per-partition index ranges from `layoutByH`.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def grid(bits: Int) = {
    val n = 1 << bits
    spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), expr(s"id div $n").as("y"))
  }

  test("bits=4 grid: the index is a bijection onto [0, 256)") {
    val d = Hilbert.withHilbert(grid(4), col("x"), col("y"), 4, "d")
      .select("d").as[Long].collect()
    assert(d.length === 256)
    assert(d.toSet === (0L until 256L).toSet)
  }

  test("consecutive indexes are always grid neighbors (unit step); Z-order is not") {
    val walk = Hilbert.withHilbert(grid(4), col("x"), col("y"), 4, "d")
      .orderBy("d").select("x", "y").as[(Long, Long)].collect()
    walk.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
    // negative control: the Morton walk jumps at power-of-two seams
    val zwalk = grid(4).withColumn("z", ZOrder.zValue(col("x"), col("y"), 4))
      .orderBy("z").select("x", "y").as[(Long, Long)].collect()
    val zsteps = zwalk.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(zsteps.exists(_ > 1L), "Z-order unexpectedly unit-step")
  }

  test("layoutByH yields disjoint per-partition index ranges") {
    val laid = Hilbert.layoutByH(grid(4), col("x"), col("y"), 4, 4)
    val ranges = laid
      .select(spark_partition_id().as("pid"), col("h_value"))
      .groupBy("pid").agg(min("h_value").as("lo"), max("h_value").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"overlapping ranges: $hi1 >= $lo2")
      case _ => ()
    }
  }
}
