package graft

import org.apache.spark.sql.functions._

import graft.sources.Synthetic

/** S18 generator / S19 mutator semantics. */
class SyntheticSpec extends SparkSpec {

  test("generator is seed-deterministic and label-correlated (S18)") {
    val a = Synthetic.interactions(spark, 5000L, 100, 50).cache()
    val b = Synthetic.interactions(spark, 5000L, 100, 50)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // engagement correlation: passers (truth=0) click more on average
    val m = a.groupBy("truth").agg(avg("n_click").as("c"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(0) > m(1), s"expected passers to click more: $m")
  }

  test("mutator flips only sampled rows and never yields negative counters (S19)") {
    val base = Synthetic.interactions(spark, 2000L, 50, 20).cache()
    val mut = Synthetic.mutate(base, Seq("n_click", "n_view"),
      sampleFrac = 0.3, noiseAmp = 0.5, flipP = 1.0).cache()
    assert(mut.count() == base.count())
    assert(mut.filter(col("n_click") < 0 || col("n_view") < 0).count() == 0)
    val flipped = base.select("id", "truth").join(
      mut.select(col("id"), col("truth").as("t2")), "id")
      .filter(col("truth") =!= col("t2")).count()
    // flipP=1.0 on ~30% sample → roughly 30% flipped
    assert(flipped > base.count() * 0.15 && flipped < base.count() * 0.45,
      s"flipped=$flipped of ${base.count()}")
  }

  test("ALS model persists and reloads with identical factors (S16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_als").toString
    assert(graft.ml.MlCatalog.saveAndReloadAls(spark, sf0001, s"$dir/als"))
  }
}
