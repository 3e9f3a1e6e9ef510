package graft

import graft.etl.Pipeline

/** End-to-end pipeline composition (§3.2: the Airflow DAG as one Spark
  * app): knowledge base + ALS export + registry, all artifacts land.
  */
class PipelineSpec extends SparkSpec {

  test("full pipeline produces every artifact from fixtures") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val artifacts = Pipeline.run(spark, sf0001, out)
    assert(Set("kb_pairs", "kb_popular", "kb_profile",
      "als_user_factors", "als_model", "registry_active")
      .subsetOf(artifacts.toSet), artifacts.toString)
    // artifacts are readable parquet with expected shapes
    assert(spark.read.parquet(s"$out/kb_pairs").count() == 50)
    assert(spark.read.parquet(s"$out/kb_popular").count() == 50)
    assert(spark.read.parquet(s"$out/kb_profile").count() == 1)
    assert(spark.read.parquet(s"$out/als_user_factors").count() > 0)
    val reg = spark.read.parquet(s"$out/registry_active").collect()
    assert(reg.length == 1 && reg(0).getAs[String]("model_name") == "als")
  }
}
