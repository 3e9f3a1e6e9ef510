package graft

import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.functions._

import graft.ml.MlCatalog

/** Semantics pins for the m17 isotonic recalibration (rows-only in the
  * oracle gate, so the invariants live here): hand-computed PAV
  * pooling, knot monotonicity, and the on-fit-data Brier optimality
  * bound vs the raw scores.
  */
class IsotonicSpec extends SparkSpec {

  test("PAV pools adjacent violators to the block mean (hand case)") {
    import spark.implicits._
    // classic pooling case: (x, y) = (1,0.1) (2,0.4) (3,0.2) — the
    // 0.4/0.2 violation pools to 0.3; first point stays.
    val df = Seq((0.1, 1.0), (0.4, 2.0), (0.2, 3.0)).toDF("label", "p")
    val m = new IsotonicRegression()
      .setFeaturesCol("p").setLabelCol("label").fit(df)
    val fit = m.boundaries.toArray.zip(m.predictions.toArray).toList
    assert(math.abs(m.predictions.toArray.head - 0.1) < 1e-12)
    assert(math.abs(m.predictions.toArray.last - 0.3) < 1e-12)
    // every x ≥ 2 predicts the pooled 0.3
    assert(math.abs(m.predict(2.0) - 0.3) < 1e-12)
    assert(math.abs(m.predict(3.0) - 0.3) < 1e-12)
    assert(math.abs(m.predict(2.5) - 0.3) < 1e-12)
    assert(fit.map(_._2) == fit.map(_._2).sorted)
  }

  test("m17 knots are sorted and calibrated values non-decreasing") {
    val out = MlCatalog.m17IsotonicCalibration.fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toList == out.indices.map(_.toLong).toList)
    val bs = out.map(_._2).toList
    val cs = out.map(_._3).toList
    assert(bs == bs.sorted, "boundaries must be sorted in score order")
    assert(cs == cs.sorted, "calibrated values must be non-decreasing")
    assert(cs.forall(c => c >= 0.0 && c <= 1.0))
  }

  test("isotonic fit never loses to raw scores on Brier (fit data)") {
    val scored = MlCatalog.gbtScored(spark, sf001, categorical = true)
      .select(col("label"), col("p")).cache()
    val m = new IsotonicRegression()
      .setFeaturesCol("p").setLabelCol("label").fit(scored)
    val both = m.transform(scored)
      .agg(avg(pow(col("label") - col("p"), 2)).as("brier_raw"),
        avg(pow(col("label") - col("prediction"), 2)).as("brier_iso"))
      .head()
    val (raw, iso) = (both.getDouble(0), both.getDouble(1))
    // identity is monotone, hence feasible: the PAV argmin can only
    // match or beat it in squared error on the data it was fit on
    assert(iso <= raw + 1e-12, s"brier iso=$iso raw=$raw")
    scored.unpersist(false)
  }
}
