package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // 90% of rows share one key — the pathological shape
    (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "v")
  }

  test("salted two-stage aggregation equals the direct aggregate") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val salted = Skew.saltedAgg(skewed, Seq("k"), salts = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn"), max("v").as("pmx")),
      combines = Seq(sum("ps").as("s"), sum("pn").as("n"), max("pmx").as("mx")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("salted replication join equals the plain join") {
    import spark.implicits._
    val dim = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("name").count()
      .orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("name").count()
      .orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin spreads byte-identical hot-key rows via distinctCols") {
    import spark.implicits._
    // every hot-key row is byte-identical: the all-columns salt basis
    // collapses them to ONE salt; a distinguishing id restores spread
    val dupFact = (1 to 4000).map(i => (7L, "same_payload")).toDF("k", "v")
      .withColumn("row_id", monotonically_increasing_id())
    val dim = Seq((7L, "hot")).toDF("k", "name")
    val collapsed = Skew.saltedJoin(dupFact.drop("row_id"), dim, "k", salts = 8)
    val spread = Skew.saltedJoin(dupFact, dim, "k", salts = 8,
      distinctCols = Seq("row_id"))
    assert(collapsed.count() == 4000L && spread.count() == 4000L)
    val saltsUsed = dupFact
      .withColumn("__salt", pmod(hash(col("k"), col("row_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(saltsUsed > 1, "distinct ids must hash to multiple salts")
  }

  test("saltedJoin rejects map-typed salt basis eagerly") {
    import spark.implicits._
    val withMap = Seq((7L, Map("a" -> 1))).toDF("k", "m")
    val dim = Seq((7L, "hot")).toDF("k", "name")
    val err = intercept[IllegalArgumentException] {
      Skew.saltedJoin(withMap, dim, "k", salts = 4)
    }
    assert(err.getMessage.contains("map-typed"))
    // excluding the map column via distinctCols works
    val ok = Skew.saltedJoin(withMap, dim, "k", salts = 4,
      distinctCols = Seq("k"))
    assert(ok.count() == 1L)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = (1 to 200000).map(i => (if (i % 20 == 0) i.toLong else 7L, s"payload_$i"))
        .toDF("k", "v")
      // the probe side must NOT be skewed on the same key — AQE cannot
      // split a partition that is oversized on both sides of the SMJ
      val other = (1 to 5000).map(i => (i.toLong, i)).toDF("k", "w")
      // aggregate over the payload so column pruning can't shrink the
      // shuffled bytes below the skew threshold — and on a key OTHER
      // than the join key: a same-key agg pins the join's output
      // partitioning and AQE (rightly) refuses a skew split that would
      // cost an extra shuffle unless forceOptimizeSkewedJoin is set
      val joined = big.join(other, "k").groupBy("w").agg(max("v"), count(lit(1)))
      // execute through the DF's own QueryExecution (write() clones it
      // and would hide the AQE-final plan)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew split in final plan:\n${finalPlan.take(800)}")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
    }
  }
}
