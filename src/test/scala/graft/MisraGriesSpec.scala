package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Misra–Gries frequent-items aggregate: the deterministic guarantee
  * (undercount ≤ n/(k+1), heavy items always present), exactness when
  * the domain fits in k counters, and partition-layout invariance of
  * the GUARANTEE (counter values may differ across layouts — the
  * mergeable-summary contract per Agarwal et al. 2012 bounds them all).
  */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private def summarize(items: Seq[Long], k: Int, parts: Int): Map[Long, Long] =
    items.toDF("item").repartition(parts)
      .agg(MisraGries.agg(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand case: a,a,b,b,c with k=2 decrements to {a:1, b:1}") {
    val got = items(Seq("a" -> 2, "b" -> 2, "c" -> 1))
    val mg = got.toDF("item").coalesce(1)
      .agg(MisraGries.agg(col("item"), 2).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mg === Map(1L -> 1L, 2L -> 1L))
  }

  private def items(spec: Seq[(String, Int)]): Seq[Long] = {
    val ids = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 5L)
    spec.flatMap { case (s, n) => Seq.fill(n)(ids(s)) }
  }

  test("undercount bound exact(x) - n/(k+1) <= mg(x) <= exact(x) holds " +
      "for every item under any partition layout") {
    val rnd = new scala.util.Random(42)
    // Zipf-ish: item i appears ~ 1000/i times over a 50-item domain
    val stream = rnd.shuffle(
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(i.toLong)))
    val exact = stream.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val n = stream.size.toLong
    for (k <- Seq(4, 8, 16); parts <- Seq(1, 3, 8)) {
      val mg = summarize(stream, k, parts)
      mg.foreach { case (item, c) =>
        val ex = exact(item)
        assert(c <= ex, s"k=$k parts=$parts item=$item overcounts: $c > $ex")
        assert(ex - c <= n / (k + 1),
          s"k=$k parts=$parts item=$item undercount ${ex - c} > ${n / (k + 1)}")
      }
      // every PROVABLY heavy item (freq > n/(k+1)) must be present
      exact.filter(_._2 > n / (k + 1)).keys.foreach { hv =>
        assert(mg.contains(hv), s"k=$k parts=$parts heavy item $hv missing")
      }
    }
  }

  test("domain <= k counters: summary equals exact counts under any layout") {
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle((1 to 6).flatMap(i => Seq.fill(i * 13)(i.toLong)))
    val exact = stream.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    for (parts <- Seq(1, 2, 5)) {
      assert(summarize(stream, 8, parts) === exact, s"parts=$parts")
    }
  }

  test("adversarial uniform tail wipes counters but never breaks the bound") {
    // one heavy item + a long uniform tail of singletons (the stream
    // that maximizes decrement pressure)
    val stream = Seq.fill(300)(0L) ++ (1L to 2000L)
    val n = stream.size.toLong
    val k = 8
    for (parts <- Seq(1, 4)) {
      val mg = summarize(stream, k, parts)
      mg.foreach { case (item, c) =>
        val ex = if (item == 0L) 300L else 1L
        assert(c <= ex && ex - c <= n / (k + 1))
      }
      assert(mg.contains(0L), "the 300-count head item must survive: " +
        s"300 > ${n / (k + 1)} = n/(k+1)")
    }
  }
}
