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

  test("synthetic documents are fixture-shaped with engineered dup structure") {
    val docs = Synthetic.documents(spark, 1000L).cache()
    assert(docs.count() == 1000L)
    assert(docs.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    // exact copies: every 250th doc equals its predecessor
    import spark.implicits._
    val byId = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    for (id <- Seq(249L, 499L, 749L, 999L))
      assert(byId(id) == byId(id - 1), s"doc $id is not an exact copy")
    // near-dups: every 50th (non-exact) doc differs from its
    // predecessor in EXACTLY the first token
    for (id <- Seq(49L, 99L, 149L, 349L)) {
      val (a, b) = (byId(id - 1).split(" "), byId(id).split(" "))
      assert(a.length == b.length && a.drop(1).sameElements(b.drop(1)),
        s"doc $id tail should match predecessor")
    }
    // token lengths and categorical domains match the driver fixture
    val lens = docs.selectExpr("size(split(text, ' ')) n").agg(
      min("n"), max("n")).head()
    assert(lens.getInt(0) >= 8 && lens.getInt(1) <= 100)
    assert(docs.select("lang").distinct().count() == 5)
    assert(docs.select("source").distinct().count() == 20)
    // deterministic: same seed → same corpus
    val again = Synthetic.documents(spark, 1000L)
    assert(docs.exceptAll(again).isEmpty && again.exceptAll(docs).isEmpty)
  }

  test("synthetic embeddings are isotropic (fixture geometry), bounded, deterministic") {
    val emb = Synthetic.embeddings(spark, 500L).cache()
    assert(emb.count() == 500L)
    assert(emb.selectExpr("min(size(embedding))", "max(size(embedding))")
      .head().toSeq == Seq(64, 64))
    assert(emb.select("label").distinct().count() == 10)
    // values in the fixture's ~U(-0.5, 0.5) band
    assert(emb.selectExpr(
      "max(aggregate(embedding, 0.0D, (m, x) -> greatest(m, abs(x)))) mx")
      .head().getDouble(0) <= 0.5)
    // label-INDEPENDENT geometry: the driver fixture's same-label mean
    // cosine is ~0.001; clustered vectors would collapse LSH buckets
    // and invalidate the ANN families' scale extrapolation (see
    // Synthetic.embeddings scaladoc)
    import graft.functions.VectorExpressions
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("label").as("la"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("label").as("lb"))
    val dots = a.join(b, col("ia") < col("ib"))
      .select((col("la") === col("lb")).as("same"),
        VectorExpressions.dotF(col("ea"), col("eb")).as("d"))
      .groupBy("same").agg(avg("d").as("ad"))
    val rows = dots.collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(true) - rows(false)) < 0.2,
      s"labels should not cluster: same=${rows(true)} cross=${rows(false)}")
  }

  test("ALS model persists and reloads with identical factors (S16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_als").toString
    assert(graft.ml.MlCatalog.saveAndReloadAls(spark, sf0001, s"$dir/als"))
  }
}
