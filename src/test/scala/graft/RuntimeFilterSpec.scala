package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering (SPARK-32268): on a shuffle join where
  * one side carries a selective filter, Catalyst injects a Bloom
  * filter built from the filtered side into the other side's scan —
  * at 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only rows that can possibly join. The engine
  * leans on this instead of hand-building semi-join prefilters, so a
  * regression (config rename, threshold change, plan shape the rule
  * no longer matches) must fail loudly here.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the shuffle-join regime the rule targets (broadcast joins
      // don't need runtime filters) and let the tiny fixture side pass
      // the creation-side size gate
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      // production default gates injection on a ≥10GB application-side
      // scan (the filter is pure overhead on small facts); the fixture
      // fact is KB-sized, so drop the gate to exercise the rule itself
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val fact = Tables.lineitem(spark, sf001)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val dim = Tables.part(spark, sf001)
        .filter(col("p_brand") === "Brand#11")   // selective predicate
        .select(col("p_partkey"), col("p_brand"))
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")

      // and it must not change results: compare against the plain join
      // with the rule disabled
      val n = joined.count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = fact.join(dim, col("l_partkey") === col("p_partkey")).count()
      assert(n == plain, s"bloom-filtered $n != plain $plain")
      assert(n > 0L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
