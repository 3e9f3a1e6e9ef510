package graft

/** ON-DEMAND diagnostic (ignored by default — 4m17s of suite time for
  * a class the per-round Explain audit already covers at planning
  * level): execute every catalog entry to COMPLETION under audit-mode
  * planning (AQE off, stat-broadcast off) — the execution-level twin
  * of the construction sweep that caught q260's conf-dependent
  * analysis failure. Ran clean over all 338 entries on the round-12
  * tree (zero failures). Flip `ignore` to `test` to re-run after any
  * change that could make a plan conf-sensitive (new eager barriers,
  * new self-join loops).
  */
class AuditExecSweep extends SparkSpec {
  ignore("all catalog entries execute under AQE-off / no-stat-broadcast") {
    withAuditConf {
      queries.Catalog.clearCaches(spark)
      val failures = queries.Catalog.all.toSeq.sortBy(_._1).flatMap {
        case (name, spec) =>
          scala.util.Try(spec.fn(spark, sf0001).count()).failed.toOption
            .map(e => s"$name: ${String.valueOf(e.getMessage)
              .linesIterator.take(2).mkString(" | ").take(160)}")
      }
      assert(failures.isEmpty,
        failures.mkString("audit-conf execution failures:\n  ", "\n  ", ""))
    }
  }
}
