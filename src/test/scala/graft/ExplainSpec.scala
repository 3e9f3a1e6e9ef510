package graft

/** The plan-audit smell heuristics must flag real scale smells and
  * stay quiet on the presentation-layer root sort every oracle query
  * carries (VERDICT r3 #8: the old heuristic treated "a GlobalLimit
  * exists anywhere" as "the root is a sorted-limit", under-counting
  * mid-plan global sorts in queries that also have a limit).
  */
class ExplainSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("root ORDER BY is not a smell") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("x", "y")
      .groupBy("y").agg(sum("x").as("s")).orderBy("y")
    assert(!Explain.midPlanGlobalSort(df.queryExecution.optimizedPlan))
  }

  test("root sorted-limit (TakeOrdered presentation) is not a smell") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("x", "y")
      .orderBy(desc("x")).limit(5)
    assert(!Explain.midPlanGlobalSort(df.queryExecution.optimizedPlan))
  }

  test("mid-plan global sort under a limit IS a smell (the old false negative)") {
    // top-5 via sorted limit, then further filtering: the GlobalLimit in
    // the plan must not mask the fact that the global sort feeds a
    // downstream operator. File-backed source — the optimizer fully
    // evaluates filter+limit chains over a LocalRelation.
    val df = Tables.region(spark, sf0001)
      .orderBy(desc("r_regionkey")).limit(5)
      .filter(col("r_name") =!= "ZZZ")
    val opt = df.queryExecution.optimizedPlan
    // guard: the optimizer kept both the global sort and a non-chain root
    val hasGlobalSort = opt.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
    }.isDefined
    assert(hasGlobalSort, s"fixture no longer produces a global sort:\n$opt")
    assert(Explain.midPlanGlobalSort(opt), s"plan:\n${opt.treeString}")
  }
}
