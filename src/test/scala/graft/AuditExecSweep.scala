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
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      queries.Catalog.clearCaches(spark)
      val failures = queries.Catalog.all.toSeq.sortBy(_._1).flatMap {
        case (name, spec) =>
          scala.util.Try(spec.fn(spark, sf0001).count()).failed.toOption
            .map(e => s"$name: ${e.getMessage.linesIterator.take(2).mkString(" | ").take(160)}")
      }
      assert(failures.isEmpty,
        failures.mkString("audit-conf execution failures:\n  ", "\n  ", ""))
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      queries.Catalog.clearCaches(spark)
    }
  }
}
