package graft

import graft.queries.Catalog

/** Every registered query runs end-to-end on sf0.001 and returns a
  * well-formed result (the driver's rows>0 smoke, in-repo). Known
  * cardinalities are pinned where deterministic.
  */
class CatalogSmokeSpec extends SparkSpec {

  private lazy val counts: Map[String, Long] =
    Catalog.all.map { case (name, spec) =>
      name -> spec.fn(spark, sf0001).count()
    }

  test("all registered queries execute on sf0.001") {
    assert(counts.size == Catalog.all.size)
  }

  test("row-returning queries are non-empty (driver smoke contract)") {
    // q15 (customers without orders) is legitimately empty on the
    // fixtures — every customer has orders.
    val allowedEmpty = Set("q15_customers_without_orders")
    val empty = counts.filter { case (n, c) => c == 0 && !allowedEmpty(n) }
    assert(empty.isEmpty, s"unexpectedly empty: ${empty.keys.toSeq.sorted}")
  }

  test("pinned cardinalities") {
    assert(counts("q01_pricing_summary") == 6L)
    assert(counts("q34_exact_dedup") == 500L)   // documents table is sf-invariant
    assert(counts("q37_simhash") == 500L)
    assert(counts("q62_dedup_components") == 45L) // docs in 0.8-jaccard pairs
    assert(counts("m04_string_indexer") == 5L)  // 5 market segments
    assert(counts("m06_confusion_matrix") == 4L)
  }

  test("every catalog entry declares algorithm keywords (duplicate-check protocol)") {
    val missing = Catalog.all.keySet -- queries.Keywords.byQuery.keySet
    val stale = queries.Keywords.byQuery.keySet -- Catalog.all.keySet
    assert(missing.isEmpty,
      s"catalog entries without a Keywords declaration: ${missing.toSeq.sorted}")
    assert(stale.isEmpty,
      s"Keywords entries for unregistered queries: ${stale.toSeq.sorted}")
    val blank = queries.Keywords.byQuery.filter(_._2.isEmpty).keys
    assert(blank.isEmpty, s"empty keyword sets: ${blank.toSeq.sorted}")
  }

  test("keyword sets are globally disjoint (a collision = a duplicate algorithm)") {
    // the automated form of the round-9 lesson: q282/q283/q285 shipped
    // and were dropped as duplicates of q163/q208/q127 because synonym
    // greps missed them; a new entry claiming an existing identity now
    // fails here instead
    val collisions = queries.Keywords.inverted.filter(_._2.size > 1)
    assert(collisions.isEmpty,
      collisions.map { case (k, qs) => s"'$k' claimed by ${qs.mkString(", ")}" }
        .toSeq.sorted.mkString("keyword collisions:\n  ", "\n  ", ""))
  }

  test("oracle SQL exists for every SQL-expressible query") {
    // no-oracle entries must be partitioning- or sketch-dependent ops
    // sketches: engine-specific values (accuracy asserted below)
    val allowed = Set("q48_approx_distinct", "q61_approx_percentiles",
      "q170_hll_sketch_merge", "q171_kll_sketch_merge",
      "q175_audience_overlap")
    val noOracle = Catalog.all.collect {
      case (n, s) if s.oracle.isEmpty => n
    }.toSet
    assert(noOracle.forall(n => n.startsWith("m") || allowed(n)),
      s"non-ML queries missing oracles: $noOracle")
  }

  test("HLL approx distinct honors the 2% rsd contract (A2 scale path)") {
    val r = Catalog.all("q48_approx_distinct").fn(spark, sf0001).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.06,
      s"approx ${r.getLong(1)} too far from exact $exact")
  }

  test("approx percentiles stay within 1% of the exact q56 values (A2 scale path)") {
    val exact = Catalog.all("q56_percentiles").fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Catalog.all("q61_approx_percentiles").fn(spark, sf0001).collect().foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) / p50 < 0.01)
      assert(math.abs(r.getDouble(2) - p90) / p90 < 0.01)
    }
  }

  test("HLL sketch merge: daily-union equals direct, within HLL error of exact") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001).select(col("user_id"),
      ((year(col("ts")) - 1970) * 12 + month(col("ts")) - 1)
        .cast("bigint").as("month_idx"))
    // direct per-month sketch (no daily intermediate)
    val direct = ev.groupBy(col("month_idx"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("month_idx"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Catalog.all("q170_hll_sketch_merge").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(merged == direct,
      "sketch union is not lossless vs direct sketching")
    merged.foreach { case (m, est) =>
      val e = exact(m).toDouble
      assert(math.abs(est - e) / e < 0.06, s"month $m: est $est exact $e")
    }
  }

  test("KLL sketch merge: no mass lost, quantiles inside the rank-error band") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf0001).select(
      ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
        .cast("bigint").as("month_idx"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val exact = o.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val merged = Catalog.all("q171_kll_sketch_merge").fn(spark, sf0001).collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val m = r.getLong(0)
      val vals = exact(m)
      // the merge lost no mass: sketch n == the month's row count
      assert(r.getLong(2) == vals.length.toLong,
        s"month $m: sketch n ${r.getLong(2)} != exact ${vals.length}")
      // each quantile estimate is an OBSERVED value whose exact rank is
      // inside a generous band around the requested quantile (KLL k=200
      // is ~1.65% normalized rank error; band 5% absorbs tiny months
      // where one rank step is a few percent)
      Seq((r.getLong(3), 0.50), (r.getLong(4), 0.90), (r.getLong(5), 0.99))
        .foreach { case (est, q) =>
          assert(vals.contains(est), s"month $m: q=$q estimate $est unobserved")
          val rank = vals.count(_ <= est).toDouble / vals.length
          val step = 1.0 / vals.length
          assert(rank >= q - 0.05 - step && rank <= q + 0.05 + step,
            s"month $m: q=$q estimate $est has exact rank $rank")
        }
    }
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
