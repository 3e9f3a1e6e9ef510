package graft

import org.apache.spark.sql.functions._

import graft.queries.Catalog

/** The distributed prefix-sum kernel behind KS / Mann–Whitney / the
  * skyline: its cumulative counts must equal the sequential fold for
  * ANY input distribution and ANY parallelism — partition boundaries
  * are an implementation detail the result can never see.
  */
class PrefixSumSpec extends SparkSpec {

  private def sequential(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    var c1 = 0L; var c2 = 0L
    rows.sortBy(_._1).map { case (cents, d1, d2) =>
      c1 += d1; c2 += d2
      cents -> (c1, c2)
    }.toMap
  }

  test("cumulative counts equal the sequential fold across seeds and skews") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // skewed value domain: clustered keys + outliers, duplicate-free
      val n = 200 + trial * 137
      val keys = rnd.shuffle(
        (1 to n).map(i => if (i % 7 == 0) i * 1000000L else i.toLong)).toVector
      val rows = keys.map(k =>
        (k, rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
      val df = rows.toDF("cents", "d1", "d2")
      val got = Catalog.rangePrefixSums(spark, df)
        .select(col("cents"), col("c1"), col("c2"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == sequential(rows), s"trial $trial diverged")
    }
  }

  test("result is invariant under input partitioning") {
    import spark.implicits._
    val rows = (1L to 500L).map(k => (k * 3, k % 4, k % 3))
    val base = Catalog.rangePrefixSums(spark, rows.toDF("cents", "d1", "d2"))
      .select(col("cents"), col("c1"), col("c2")).collect().toSet
    val scrambled = Catalog.rangePrefixSums(spark,
      rows.reverse.toDF("cents", "d1", "d2").repartition(13))
      .select(col("cents"), col("c1"), col("c2")).collect().toSet
    assert(base == scrambled)
  }
}
