package graft

import graft.ml.MlCatalog

/** Split-conformal prediction sets (m19): the exact order-statistic
  * threshold, the finite-sample coverage guarantee on the held-out
  * fold, the set-size partition, and refit determinism.
  */
class ConformalSpec extends SparkSpec {

  private lazy val rows = MlCatalog.conformal(spark, sf0001)

  test("emits one row per alpha with the set-size partition intact") {
    assert(rows.map(_._1) === Seq(10L, 20L))
    rows.foreach { case (_, nCal, qhat, nTest, covered, single, both, empty) =>
      assert(nCal > 0 && nTest > 0)
      assert(qhat >= 0.0 && qhat <= 1.0)
      assert(single + both + empty === nTest, "set sizes must partition the fold")
      assert(covered <= nTest)
    }
  }

  test("empirical coverage meets the 1 - alpha guarantee (small slack)") {
    rows.foreach { case (alphaPct, _, _, nTest, covered, _, _, _) =>
      val target = 1.0 - alphaPct / 100.0
      val cov = covered.toDouble / nTest
      // the guarantee is in expectation over calibration draws; allow
      // finite-sample slack on one fixed fold
      assert(cov >= target - 0.05,
        s"alpha=$alphaPct%: coverage $cov below ${target - 0.05}")
    }
  }

  test("tighter alpha never yields a smaller threshold or lower coverage") {
    val Seq(a10, a20) = rows
    assert(a10._3 >= a20._3, "qhat(alpha=0.1) must be >= qhat(alpha=0.2)")
    assert(a10._5 >= a20._5, "coverage count must be monotone in 1-alpha")
  }

  test("refit is deterministic") {
    assert(MlCatalog.conformal(spark, sf0001) === rows)
  }
}
