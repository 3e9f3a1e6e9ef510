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

  test("freshness gate passes on live data, fails fast on empty/stale (recsys_pipeline.py:175-212)") {
    import spark.implicits._
    import java.sql.Timestamp

    // pass path: the events fixture is non-empty and its newest rows
    // fall inside the (anchored-max) 24 h window by construction
    val (total, recent) = Pipeline.checkDataFreshness(Tables.events(spark, sf0001))
    assert(total > 0 && recent > 0 && recent <= total)

    // fail path 1: empty interactions table aborts the run
    val empty = Seq.empty[(Long, Timestamp)].toDF("user", "ts")
    val e1 = intercept[IllegalStateException] {
      Pipeline.checkDataFreshness(empty)
    }
    assert(e1.getMessage.contains("No data"))

    // fail path 2 (strict mode): data exists but nothing within 24 h of
    // the supplied anchor
    val stale = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user", "ts")
    val e2 = intercept[IllegalStateException] {
      Pipeline.checkDataFreshness(stale,
        now = Some(Timestamp.valueOf("2024-06-01 00:00:00")), requireRecent = true)
    }
    assert(e2.getMessage.contains("newer than 24h"))

    // strict mode does NOT fire when recent rows exist
    val fresh = Seq((1L, Timestamp.valueOf("2024-05-31 23:00:00")))
      .toDF("user", "ts")
    val (t2, r2) = Pipeline.checkDataFreshness(fresh,
      now = Some(Timestamp.valueOf("2024-06-01 00:00:00")), requireRecent = true)
    assert(t2 == 1L && r2 == 1L)
  }
}
