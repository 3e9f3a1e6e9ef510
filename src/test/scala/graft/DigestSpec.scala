package graft

import org.apache.spark.sql.functions._

import graft.queries.Catalog

/** The q157 table digest's operational contracts: the bucketwise sums
  * mod P must be (a) partition/arrival-order independent and (b) a
  * homomorphism under union — digest(A ∪ B) reconstructs from
  * digest(A) and digest(B) without touching rows — because that is
  * what lets an anti-entropy sweep maintain digests incrementally on
  * append instead of re-scanning the table.
  */
class DigestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val P = 2147483647L

  private def collectDigest(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long)] =
    Catalog.orderDigest(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("digest is invariant under repartition and row order") {
    val orders = Tables.orders(spark, sf)
    val base = collectDigest(orders)
    val scrambled = collectDigest(
      orders.repartition(7, col("o_custkey")).sortWithinPartitions(
        col("o_totalprice").desc))
    assert(base == scrambled)
  }

  test("digest is a union homomorphism (incremental maintenance)") {
    val orders = Tables.orders(spark, sf)
    val a = orders.filter(col("o_orderkey") % 3 === 0)
    val b = orders.filter(col("o_orderkey") % 3 =!= 0)
    val whole = collectDigest(orders)
    val da = collectDigest(a)
    val db = collectDigest(b)
    val merged = (da.keySet ++ db.keySet).map { k =>
      val (na, ha) = da.getOrElse(k, (0L, 0L))
      val (nb, hb) = db.getOrElse(k, (0L, 0L))
      k -> (na + nb, (ha + hb) % P)
    }.toMap
    assert(merged == whole)
    // and a single mutated row is visible in exactly its own bucket
    val mutated = orders.withColumn("o_totalprice",
      when(col("o_orderkey") === 7L, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
    val dm = collectDigest(mutated)
    val changed = whole.keySet.filter(k => whole(k) != dm(k))
    assert(changed == Set(7L % 64))
  }
}
