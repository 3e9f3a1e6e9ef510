package graft

/** q260 regression: the greedy-coverage loop's joins must ANALYZE
  * regardless of optimizer flags. With AQE disabled, localCheckpoint
  * records the checkpointed plan's physical hash-partitioning against
  * the original attribute ids; DeduplicateRelations then cannot
  * re-instance the LogicalRDD when a later round's anti-join meets
  * those ids on its other side, and analysis dies with INTERNAL_ERROR
  * "conflicting references in Join" (found by the round-12 audit-mode
  * Explain run — AQE off alone reproduces it). q260 now mints fresh
  * ids after every checkpoint barrier; this pins the fix under the
  * exact audit conf (AQE off + stat-broadcast off).
  */
class Q260ReproSpec extends SparkSpec {
  test("q260 plans and executes under AQE-off / no-stat-broadcast") {
    withAuditConf {
      queries.Catalog.clearCaches(spark)
      val df = queries.Catalog.all("q260_coverage_selection").fn(spark, sf0001)
      val n = df.count()
      assert(n == 5L, s"expected 5 rounds, got $n")
    }
  }
}
