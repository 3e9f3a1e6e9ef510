package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{GroupTopK, GroupTopKFinalExec, GroupTopKPartialExec}

/** The custom per-group top-k physical operator: parity with the stock
  * window lowering, plan shape (no sort, bounded exchange, exchange
  * elision on pre-clustered input), and the edge cases (k larger than
  * the group, duplicate order values, empty input).
  */
class GroupTopKSpec extends SparkSpec {

  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan
  }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  private def sample = (1 to 5000).map { i =>
    (i % 37L, (i * 2654435761L) % 1000L, i.toLong)
  }.toDF("k", "v", "id").repartition(8)

  test("topKPerKey matches the window row_number lowering on a total order") {
    val viaOp = GroupTopK.topKPerKey(sample,
        Seq(col("k")), Seq(col("v").desc, col("id")), 3)
      .select("k", "v", "id").orderBy("k", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaWindow = sample
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 3).select("k", "v", "id").orderBy("k", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaOp == viaWindow)
  }

  test("k >= group size keeps every row; empty input yields empty output") {
    val tiny = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val all = GroupTopK.topKPerKey(tiny, Seq(col("k")), Seq(col("v")), 99)
    assert(all.count() == 3L)
    val empty = GroupTopK.topKPerKey(tiny.filter(col("k") < 0L),
      Seq(col("k")), Seq(col("v")), 3)
    assert(empty.count() == 0L)
  }

  test("duplicate order values retain exactly k rows per key") {
    val dup = (1 to 100).map(i => (i % 5L, 42L, i.toLong)).toDF("k", "v", "id")
    val got = GroupTopK.topKPerKey(dup, Seq(col("k")), Seq(col("v"), col("id")), 7)
    val perKey = got.groupBy("k").count().collect().map(_.getLong(1))
    assert(perKey.forall(_ == 7L))
  }

  test("plan: partial under the exchange, final above it, no SortExec") {
    val df = GroupTopK.topKPerKey(sample,
      Seq(col("k")), Seq(col("v").desc, col("id")), 3)
    val plan = flatten(executed(df))
    assert(plan.exists(_.isInstanceOf[GroupTopKPartialExec]), plan.mkString("\n"))
    assert(plan.exists(_.isInstanceOf[GroupTopKFinalExec]))
    assert(plan.exists(_.isInstanceOf[ShuffleExchangeExec]))
    assert(!plan.exists(_.isInstanceOf[SortExec]), "bounded heaps must not sort")
    // the partial must sit BELOW the exchange (map-side combine)
    val finalNode = plan.collectFirst { case f: GroupTopKFinalExec => f }.get
    val below = flatten(finalNode).drop(1)
    val exchangeIdx = below.indexWhere(_.isInstanceOf[ShuffleExchangeExec])
    val partialIdx = below.indexWhere(_.isInstanceOf[GroupTopKPartialExec])
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      below.map(_.nodeName).mkString(" / "))
  }

  test("pre-clustered input plans without a fresh exchange above the partial") {
    val clustered = sample.repartition(4, col("k"))
    val df = GroupTopK.topKPerKey(clustered,
      Seq(col("k")), Seq(col("v").desc, col("id")), 3)
    val plan = flatten(executed(df))
    val finalNode = plan.collectFirst { case f: GroupTopKFinalExec => f }.get
    // the only exchange is the repartition itself, below the PARTIAL node —
    // EnsureRequirements must not add a second one between partial and final
    val below = flatten(finalNode).drop(1)
    val partialIdx = below.indexWhere(_.isInstanceOf[GroupTopKPartialExec])
    val exchangeIdx = below.indexWhere(_.isInstanceOf[ShuffleExchangeExec])
    assert(partialIdx >= 0 && exchangeIdx > partialIdx,
      below.map(_.nodeName).mkString(" / "))
  }

  test("partial output is bounded by keys-per-partition times k") {
    // one partition holding all 37 keys: partial emits <= 37*3 rows
    val one = sample.coalesce(1)
    val df = GroupTopK.topKPerKey(one, Seq(col("k")), Seq(col("v"), col("id")), 3)
    df.collect()
    val plan = flatten(df.queryExecution.executedPlan)
    val partial = plan.collectFirst { case p: GroupTopKPartialExec => p }.get
    val emitted = partial.execute().count()
    assert(emitted <= 37L * 3, s"partial emitted $emitted rows")
  }

  test("seeded randomized parity with the window lowering across k and layouts") {
    // partition-layout invariance: the partial/final split must give the
    // same multiset whatever the input placement
    for (seed <- Seq(11L, 42L, 97L); k <- Seq(1, 2, 5)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 2000).map { i =>
        (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val base = rows.toDF("k", "v", "id")
      val layouts = Seq(base.coalesce(1), base.repartition(3),
        base.repartition(17), base.repartitionByRange(4, col("v")),
        base.repartition(4, col("k")))
      val expected = base
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= k).select("k", "v", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      layouts.foreach { df =>
        val got = GroupTopK.topKPerKey(df,
            Seq(col("k")), Seq(col("v").desc, col("id")), k)
          .select("k", "v", "id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        assert(got == expected, s"seed=$seed k=$k layout mismatch")
      }
    }
  }

  test("composite and expression keys group correctly") {
    val got = GroupTopK.topKPerKey(sample,
        Seq(col("k") % 2L, col("k") % 3L), Seq(col("id").desc), 2)
      .select((col("k") % 2L).as("a"), (col("k") % 3L).as("b"), col("id"))
    val counts = got.groupBy("a", "b").count().collect().map(_.getLong(2))
    assert(counts.length == 6 && counts.forall(_ == 2L))
  }
}
