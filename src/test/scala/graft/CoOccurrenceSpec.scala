package graft

import org.apache.spark.sql.functions._

import graft.operators.CoOccurrence

class CoOccurrenceSpec extends SparkSpec {

  test("uncapped pairs match the q14 formulation on fixtures (J4)") {
    val li = Tables.lineitem(spark, sf0001)
    val viaOp = CoOccurrence.topPairs(li, "l_orderkey", "l_partkey", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaCatalog = graft.queries.Catalog.all("q14_part_pairs")
      .fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaOp.toSeq == viaCatalog.toSeq)
  }

  test("item cap bounds per-key fan-out deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L), // 4 items → 6 pairs
      (2L, 10L), (2L, 20L),                        // under cap → exact
    ).toDF("k", "item")
    val exact = CoOccurrence.pairs(df, "k", "item").agg(sum("cnt")).head().getLong(0)
    val capped = CoOccurrence.pairs(df, "k", "item", Some(2))
    assert(exact == 7) // 6 + 1
    // cap=2 keeps the 2 smallest items per key → 1 pair per key
    val rows = capped.orderBy("i1", "i2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((10L, 20L, 2L)))
    // deterministic across reruns
    val again = CoOccurrence.pairs(df, "k", "item", Some(2))
      .orderBy("i1", "i2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }
}
