package graft

import org.apache.spark.sql.functions._

/** §4 physical-layout contract: bucketing co-locates join keys so the
  * self-join (q14's shape — the heaviest shuffle in the catalog) runs
  * with ZERO Exchange. At 100 TB this is the difference between
  * re-shuffling the fact table per query and reading it pre-shuffled.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed self-join on the co-occurrence key plans no shuffle") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct()
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    // at fixture size the planner would broadcast (which also skips the
    // shuffle but doesn't exercise the bucket layout); force the
    // sort-merge path a 100 TB fact-fact join takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = spark.table("li_bucketed")
      val joined = b.as("a").join(b.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1000)}")
      // and it computes the same pairs as the unbucketed path
      val viaBucket = joined.groupBy(col("a.l_partkey"), col("b.l_partkey"))
        .count().count()
      val viaPlain = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey"), col("b.l_partkey")).count().count()
      assert(viaBucket == viaPlain)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
