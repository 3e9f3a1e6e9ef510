package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (q279 family): the one-sided-error guarantee
  * (estimate ≥ truth for EVERY key, not just the audited top-20) and
  * the linear-sketch merge law cm(A ⊎ B) = cm(A) + cm(B) that makes
  * the 256-cell structure a per-partition/per-day mergeable summary
  * at 100 TB.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val P = 2147483647L

  private def cells(keys: DataFrame): DataFrame =
    keys.select(col("k"), explode(expr("array(0L,1L,2L,3L)")).as("i"))
      .select(col("i"),
        (((lit(2L) * col("i") + lit(3L)) * col("k") + col("i") * lit(10007L))
          % P % lit(64L)).as("cell"))
      .groupBy(col("i"), col("cell")).agg(count(lit(1)).as("c"))

  private def estimates(keys: DataFrame): Map[Long, Long] =
    keys.distinct()
      .select(col("k"), explode(expr("array(0L,1L,2L,3L)")).as("i"))
      .select(col("k"), col("i"),
        (((lit(2L) * col("i") + lit(3L)) * col("k") + col("i") * lit(10007L))
          % P % lit(64L)).as("cell"))
      .join(broadcast(cells(keys)), Seq("i", "cell"))
      .groupBy(col("k")).agg(min(col("c")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one-sided error: cm estimate >= exact count for every key") {
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      (1 to 200).flatMap(i => Seq.fill(1 + 2000 / i)(i.toLong)))
    val keys = stream.toDF("k")
    val exact = stream.groupBy(identity).map { case (v, xs) =>
      v -> xs.size.toLong }
    val est = estimates(keys)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"key $k: est ${est(k)} < exact $n")
    }
  }

  test("linear merge: counters of two halves sum to the global counters") {
    val xs = (1L to 5000L).map(i => i % 313)
    val all = cells(xs.toDF("k"))
    val a = cells(xs.take(2000).toDF("k"))
    val b = cells(xs.drop(2000).toDF("k"))
    val merged = a.select(col("i"), col("cell"), col("c"))
      .unionByName(b.select(col("i"), col("cell"), col("c")))
      .groupBy(col("i"), col("cell")).agg(sum(col("c")).as("c"))
    val lhs = merged.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rhs = all.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lhs === rhs)
  }
}
