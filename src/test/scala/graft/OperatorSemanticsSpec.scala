package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Literal-data tests for operator semantics the fixtures exercise
  * only trivially (SURVEY.md §5 strategy (a)): anti join with
  * non-empty result, upsert idempotence (S4 `ON CONFLICT DO NOTHING`
  * contract), sessionization gaps, lenient parse (F15), logloss.
  */
class OperatorSemanticsSpec extends SparkSpec {

  test("anti join returns unmatched left rows (J5)") {
    import spark.implicits._
    val c = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val o = Seq(1L, 3L).toDF("id")
    val out = c.join(o, Seq("id"), "left_anti").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
  }

  test("upsert (first-writer-wins) is idempotent: re-applying changes nothing (S4)") {
    import spark.implicits._
    val existing = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val incoming = Seq((2L, "CHANGED"), (3L, "z"), (3L, "z2")).toDF("id", "v")
    // the production operator itself, not a local re-implementation
    def upsert(tbl: org.apache.spark.sql.DataFrame,
               in: org.apache.spark.sql.DataFrame) =
      graft.io.Writers.upsertNothing(tbl, in, Seq("id"), Seq("v"))
    val once = upsert(existing, incoming)
    val twice = upsert(once, incoming)
    val rows = twice.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    assert(once.count() == twice.count())
  }

  test("30-minute-gap sessionization counts sessions correctly") {
    import spark.implicits._
    val e = Seq(
      (1L, 0L), (1L, 100L), (1L, 2000L),   // gap 1900s > 1800 → 2 sessions
      (2L, 0L), (2L, 1800L),               // gap exactly 1800 → NOT new
    ).toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val out = e.withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull, 1L)
          .when(col("ts").cast("double") - col("prev").cast("double") > 1800.0, 1L)
          .otherwise(0L))
      .groupBy("user_id").agg(sum("new_s").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("lenient numeric parse: bad strings become null, not errors (F15)") {
    import spark.implicits._
    // Spark 4 defaults to ANSI mode where a plain cast THROWS on
    // malformed input — the lenient-parse contract needs try_cast.
    val df = Seq("1997.0", "1997", "", "abc", "12.9").toDF("raw")
    val out = df.selectExpr("try_cast(try_cast(raw AS DOUBLE) AS INT) AS v")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(1997), Some(1997), None, None, Some(12)))
  }

  test("logloss aggregation matches hand computation (M8)") {
    import spark.implicits._
    val df = Seq((1.0, 0.9), (0.0, 0.2), (1.0, 0.6)).toDF("y", "p")
    val ll = df.agg(
      (-avg(col("y") * log(col("p")) +
        (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))).as("ll"))
      .head().getDouble(0)
    val expected = -(math.log(0.9) + math.log(0.8) + math.log(0.6)) / 3.0
    assert(math.abs(ll - expected) < 1e-12)
  }

  test("top-k plans TakeOrderedAndProject, not a global sort (A10/O1)") {
    val plan = Tables.orders(spark, sf0001)
      .orderBy(col("o_totalprice").desc).limit(5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("dimension join broadcasts the small side (J1 scale contract)") {
    val li = Tables.lineitem(spark, sf0001)
    val p = Tables.part(spark, sf0001)
    val plan = li.join(p, li("l_partkey") === p("p_partkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("version pruning keeps the newest N artifact dirs (O11)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    Seq("20240101_000000", "20240102_000000", "20240103_000000", "20240104_000000")
      .foreach(v => java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(root, v)))
    val deleted = graft.io.Writers.pruneVersions(spark, root, keep = 2)
    // lexicographic = chronological for the reference's version names
    assert(deleted.sorted == Seq("20240101_000000", "20240102_000000"))
    val left = new java.io.File(root).listFiles().map(_.getName).sorted.toSeq
    assert(left == Seq("20240103_000000", "20240104_000000"))
    // idempotent + missing-dir tolerant
    assert(graft.io.Writers.pruneVersions(spark, root, keep = 2).isEmpty)
    assert(graft.io.Writers.pruneVersions(spark, s"$root/nope", 2).isEmpty)
  }

  test("parquet scan pushes filters and prunes columns (§4)") {
    val df = Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "N")
      .select("l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,N)]"),
      scan.take(800))
    assert(scan.contains("ReadSchema: struct<l_quantity"), scan.take(800))
  }
}
