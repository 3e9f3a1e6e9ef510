package graft

import org.apache.spark.sql.functions._

import graft.functions.ThetaSketch

/** Contracts for the theta-sketch aggregate family: exactness below
  * the retention threshold (a theta sketch retains every hashed key
  * until it exceeds its nominal entries — estimates are EXACT there),
  * merge losslessness from persisted bytes, partition-order
  * invariance, intersection correctness, and the SQL registration.
  */
class ThetaSketchSpec extends SparkSpec {

  test("estimate is exact below the retention threshold") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
    val est = df.agg(
      ThetaSketch.estimate(ThetaSketch.sketchAgg(col("k"))).as("e"))
      .head().getDouble(0)
    assert(est == 1000.0, s"got $est")
  }

  test("union of per-group sketches equals the direct sketch (lossless merge)") {
    import spark.implicits._
    // overlapping groups: union must dedup across them
    val df = (1L to 3000L).map(k => (k % 7, k / 2)).toDF("g", "k")
    val merged = df.groupBy(col("g"))
      .agg(ThetaSketch.sketchAgg(col("k")).as("sk"))
      .agg(ThetaSketch.estimate(ThetaSketch.unionAgg(col("sk"))).as("e"))
      .head().getDouble(0)
    val direct = df.agg(
      ThetaSketch.estimate(ThetaSketch.sketchAgg(col("k"))).as("e"))
      .head().getDouble(0)
    assert(merged == direct, s"merged $merged direct $direct")
    assert(direct == 1501.0) // k/2 over 1..3000 hits 0..1500: 1501 values
  }

  test("estimates are partition-order invariant") {
    import spark.implicits._
    val base = (1L to 5000L).map(k => k * 37 % 4096).toDF("k")
    val e1 = base.repartition(1).agg(
      ThetaSketch.estimate(ThetaSketch.sketchAgg(col("k")))).head().getDouble(0)
    val e8 = base.repartition(8, col("k")).agg(
      ThetaSketch.estimate(ThetaSketch.sketchAgg(col("k")))).head().getDouble(0)
    val e3 = base.orderBy(desc("k")).coalesce(3).agg(
      ThetaSketch.estimate(ThetaSketch.sketchAgg(col("k")))).head().getDouble(0)
    assert(e1 == e8 && e8 == e3, s"$e1 / $e8 / $e3")
  }

  test("intersection estimate is exact on known small sets") {
    import spark.implicits._
    val a = (1L to 100L).toDF("k")
      .agg(ThetaSketch.sketchAgg(col("k")).as("sk"))
    val b = (50L to 150L).toDF("k")
      .agg(ThetaSketch.sketchAgg(col("k")).as("sk"))
    val est = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(ThetaSketch.intersectEstimate(col("sk"), col("sk2")).as("e"))
      .head().getDouble(0)
    assert(est == 51.0, s"got $est") // |{50..100}|
  }

  test("string keys aggregate too") {
    import spark.implicits._
    val est = Seq("a", "b", "c", "a", "b").toDF("s")
      .agg(ThetaSketch.estimate(ThetaSketch.sketchAgg(col("s"))))
      .head().getDouble(0)
    assert(est == 3.0, s"got $est")
  }

  test("SQL surface: graft_theta_* registered through GraftExtensions") {
    plans.GraftExtensions.register(spark)
    import spark.implicits._
    (1L to 200L).map(k => (k % 2, k)).toDF("g", "k")
      .createOrReplaceTempView("theta_in")
    val r = spark.sql("""
      WITH sk AS (SELECT g, graft_theta_agg(k) AS sk
                  FROM theta_in GROUP BY g)
      SELECT graft_theta_estimate(graft_theta_union(sk)) AS total,
             graft_theta_intersect(
               (SELECT sk FROM sk WHERE g = 0),
               (SELECT sk FROM sk WHERE g = 1)) AS inter
      FROM sk""").head()
    assert(r.getDouble(0) == 200.0, s"total ${r.getDouble(0)}")
    assert(r.getDouble(1) == 0.0, s"inter ${r.getDouble(1)}") // odd ∩ even = ∅
  }

  test("q175 audience overlap: estimates match exact on the fixtures") {
    val rows = queries.Catalog.all("q175_audience_overlap")
      .fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // fixture user universes are far below the 2^12 retention
      // threshold at sf0.001 ⇒ theta is exact here by the first test's
      // contract; at larger SFs this becomes a ≤2% RSE band
      assert(r.getLong(2) == r.getLong(5), s"n1: $r")
      assert(r.getLong(3) == r.getLong(6), s"n2: $r")
      assert(r.getLong(4) == r.getLong(7), s"inter: $r")
    }
  }
}
