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

  test("mid-plan sorted-limit (top-k selection) is NOT a smell") {
    // top-5 via sorted limit, then further filtering: Limit(Sort) plans
    // as TakeOrderedAndProject wherever it sits — per-partition top-k +
    // bounded merge, no range exchange — so it must stay quiet (q70-q72
    // cut a top-K vocab mid-plan exactly this way).
    val df = Tables.region(spark, sf0001)
      .orderBy(desc("r_regionkey")).limit(5)
      .filter(col("r_name") =!= "ZZZ")
    val opt = df.queryExecution.optimizedPlan
    val hasGlobalSort = opt.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
    }.isDefined
    assert(hasGlobalSort, s"fixture no longer produces a global sort:\n$opt")
    assert(!Explain.midPlanGlobalSort(opt), s"plan:\n${opt.treeString}")
  }

  test("bare mid-plan global sort IS a smell") {
    // Hand-built Filter(Sort) — no limit backs the sort, so the reorder
    // is pure wasted exchange; built directly because the optimizer
    // would push a real filter below the sort.
    import org.apache.spark.sql.catalyst.expressions.{Ascending, EqualTo, Literal, Not, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Sort}
    val base = Tables.region(spark, sf0001).queryExecution.analyzed
    val sorted = Sort(Seq(SortOrder(base.output.head, Ascending)), global = true, base)
    val plan = Filter(Not(EqualTo(base.output(1), Literal("ZZZ"))), sorted)
    assert(Explain.midPlanGlobalSort(plan), s"plan:\n${plan.treeString}")
  }

  test("root sorted-limit plus a bare mid-plan sort is still a smell") {
    // The root-chain exemption must not soak up the inner bare sort.
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sort}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val base = Tables.region(spark, sf0001).queryExecution.analyzed
    val ord = Seq(SortOrder(base.output.head, Ascending))
    val inner = Sort(ord, global = true, base)            // bare: wasted
    val root = GlobalLimit(Literal(5), LocalLimit(Literal(5), Sort(ord, global = true, inner)))
    assert(Explain.midPlanGlobalSort(root), s"plan:\n${root.treeString}")
  }
}
