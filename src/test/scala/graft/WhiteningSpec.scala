package graft

import org.apache.spark.sql.functions._

import graft.ml.MlCatalog

/** ZCA whitening (m20): the defining covariance→identity invariant,
  * zero mean after the transform, audit shape, and refit determinism.
  */
class WhiteningSpec extends SparkSpec {

  private lazy val rows = MlCatalog.whiteningAudit(spark, sf0001)

  test("emits raw and zca rows with the pair bookkeeping intact") {
    assert(rows.map(_._1) === Seq("raw", "zca"))
    rows.foreach { case (_, n, k, matches, pairs) =>
      assert(n > 0 && k === 10L)
      // the production audit rides the LSH candidate cut: a vector may
      // surface fewer than k candidates, never more
      assert(pairs <= n * k, "no vector may contribute more than k pairs")
      assert(pairs >= n * k * 9 / 10,
        s"candidate cut too lossy: $pairs of ${n * k} pairs")
      assert(matches >= 0 && matches <= pairs)
    }
  }

  test("cut audit tracks the exact all-pairs recall oracle") {
    val exact = MlCatalog.whiteningAuditExact(spark, sf0001)
    assert(exact.map(_._1) === Seq("raw", "zca"))
    rows.zip(exact).foreach {
      case ((sp, n, k, m, p), (se, ne, ke, me, pe)) =>
        assert(sp === se && n === ne && k === ke)
        assert(pe === ne * ke,
          "the exact oracle contributes exactly k pairs per vector")
        val cons = m.toDouble / p
        val consE = me.toDouble / pe
        assert(math.abs(cons - consE) <= 0.05,
          s"$sp: cut consistency $cons drifted from exact $consE")
    }
  }

  test("whitened sample covariance is the identity; whitened mean is zero") {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val white = MlCatalog.whitenedEmbeddings(spark, sf0001)
    val rm = new RowMatrix(white.select(col("embedding")).rdd
      .map(r => OldVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)))
    val mean = rm.computeColumnSummaryStatistics().mean.toArray
    assert(mean.forall(m => math.abs(m) < 1e-3),
      s"max |mean| = ${mean.map(math.abs).max}")
    val cov = rm.computeCovariance()
    val d = cov.numRows
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        val c = cov(i, j)
        if (i == j) assert(math.abs(c - 1.0) < 0.05,
          s"diag($i) = $c, expected 1")
        else assert(math.abs(c) < 0.05, s"cov($i,$j) = $c, expected 0")
        j += 1
      }
      i += 1
    }
  }

  test("refit is deterministic") {
    assert(MlCatalog.whiteningAudit(spark, sf0001) === rows)
  }
}
