package graft

import graft.operators.Sampling
import graft.sources.KafkaBatch

/** O8 stratified sampling + S10 bounded Kafka tail-read offset math. */
class SamplingSpec extends SparkSpec {

  test("sampleBy honors per-stratum fractions, drops unlisted strata, reproduces under a seed (O8)") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i, if (i % 4 == 0) "rare" else "common"))
      .toDF("id", "label")
    val fr = Map[Any, Double]("common" -> 0.1, "rare" -> 0.8)
    val s1 = Sampling.stratified(df, "label", fr, seed = 7L).cache()
    val s2 = Sampling.stratified(df, "label", fr, seed = 7L)
    // deterministic under the seed
    assert(s1.collect().map(_.getInt(0)).sorted
      .sameElements(s2.collect().map(_.getInt(0)).sorted))
    val counts = s1.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli: expected 300 common (of 3000) and 800 rare (of 1000)
    assert(counts("common") > 200 && counts("common") < 400)
    assert(counts("rare") > 700 && counts("rare") < 900)
    // a stratum absent from fractions samples at 0
    val only = Sampling.stratified(df, "label", Map[Any, Double]("rare" -> 0.5), 7L)
    assert(only.filter("label = 'common'").count() == 0)
  }

  test("stratifiedSplit yields exact per-stratum ratios and true complements (O8)") {
    import spark.implicits._
    // deliberately skewed strata: 1000 "A", 10 "B", 3 "C"
    val df = ((1 to 1000).map(i => (i, "A")) ++ (1001 to 1010).map(i => (i, "B")) ++
      (1011 to 1013).map(i => (i, "C"))).toDF("id", "label")
    val (train, test) = Sampling.stratifiedSplit(df, "label", "id", 5)
    val testBy = test.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact floor(n/5) per stratum — no Bernoulli variance
    assert(testBy.get("A").contains(200L))
    assert(testBy.get("B").contains(2L))
    assert(testBy.get("C").isEmpty) // 3 rows → 0 test rows
    // complements: disjoint and exhaustive
    assert(train.count() + test.count() == 1013L)
    assert(train.join(test, Seq("id"), "inner").count() == 0L)
    // deterministic: rerun agrees row-for-row
    val (_, test2) = Sampling.stratifiedSplit(df, "label", "id", 5)
    assert(test.collect().map(_.getInt(0)).sorted
      .sameElements(test2.collect().map(_.getInt(0)).sorted))
  }

  test("stratifiedSplit membership is reproducible under ties given a tiebreak") {
    import spark.implicits._
    // orderCol ("grp") is heavily tied within each stratum: without a
    // tiebreak, row_number may assign tied rows differently per run;
    // with the id tiebreak the ordering is total and membership pins
    val df = (1 to 600).map(i => (i, i % 3, if (i % 2 == 0) "E" else "O"))
      .toDF("id", "grp", "label")
      .repartition(8) // shuffle so input order isn't accidentally stable
    val runs = (1 to 3).map { _ =>
      val (_, test) = Sampling.stratifiedSplit(df, "label", "grp", 5, "id")
      test.collect().map(_.getInt(0)).sorted.toSeq
    }
    assert(runs.distinct.size == 1, "tiebroken membership must not vary")
    // counts stay exact either way: 300 per stratum -> 60 test rows
    assert(runs.head.size == 120)
  }

  test("tail-read offset JSON rewinds each partition by N, clamped at 0 (S10)") {
    val (start, end) = KafkaBatch.tailOffsetsJson("events",
      Map(0 -> 100L, 1 -> 3L, 2 -> 0L), lastN = 10L)
    assert(start == """{"events":{"0":90,"1":0,"2":0}}""")
    assert(end == """{"events":{"0":100,"1":3,"2":0}}""")
  }

  test("tail-read start clamps at the earliest RETAINED offset, not 0 (S10)") {
    // retention trimmed partition 0 up to offset 500: start must not
    // fall below it or the batch read aborts with a data-loss error
    val (start, _) = KafkaBatch.tailOffsetsJson("events",
      Map(0 -> 1000L, 1 -> 50L), lastN = 10000L,
      earliestOffsets = Map(0 -> 500L))
    assert(start == """{"events":{"0":500,"1":0}}""")
  }

  test("offset span sums per-partition message counts, clamped (A12)") {
    assert(KafkaBatch.offsetSpan(
      Map(0 -> 10L, 1 -> 0L), Map(0 -> 100L, 1 -> 3L, 2 -> 7L)) == 100L)
    // compacted partition where earliest > latest contributes 0
    assert(KafkaBatch.offsetSpan(Map(0 -> 5L), Map(0 -> 2L)) == 0L)
  }
}
