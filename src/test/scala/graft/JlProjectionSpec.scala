package graft

import graft.ml.MlCatalog

/** JL random-projection distortion audit (m21): the seeded ±1 sign
  * matrix is deterministic, the 2016-pair probe is complete, and the
  * squared-distance ratio concentrates around 1 the way the lemma
  * promises at d'=16 — loose, and the spec pins the MEASURED floor
  * (guarantee-style, like MisraGriesSpec: the exact histogram is
  * float-order-dependent, the concentration is the contract).
  */
class JlProjectionSpec extends SparkSpec {

  private lazy val hist: Map[Long, Long] =
    MlCatalog.all("m21_jl_projection").fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("all 2016 pairs of the 64-vector probe are audited") {
    assert(hist.values.sum === 2016L)
    // no degenerate pairs on the fixture (d2 = 0 would drop rows)
    assert(hist.keys.forall(_ >= 0L))
  }

  test("ratio concentrates around 1 per the lemma at d'=16") {
    def mass(lo: Long, hi: Long): Long =
      hist.collect { case (d, n) if d >= lo && d <= hi => n }.sum
    val total = hist.values.sum.toDouble
    // measured 89.0% within [0.5, 1.5) and 62.3% within [0.7, 1.3)
    // on the fixture; pin slightly below as the regression floor
    assert(mass(5L, 14L) / total >= 0.85,
      s"center mass ${mass(5L, 14L) / total} below the measured floor")
    assert(mass(7L, 12L) / total >= 0.55)
    // the mode sits in the central band, not in a tail
    val mode = hist.maxBy(_._2)._1
    assert(mode >= 6L && mode <= 11L, s"mode decile $mode off-center")
  }

  test("the seeded projection is run-to-run deterministic") {
    val again = MlCatalog.all("m21_jl_projection").fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === hist)
  }
}
