package graft

/** ON-DEMAND diagnostic (ignored by default, ~9 min): every
  * oracle-backed entry's collected output must be bit-identical with
  * whole-stage codegen ON (default) and fully INTERPRETED
  * (codegen.wholeStage=false + factoryMode=NO_CODEGEN). The class this
  * hunts is a custom Catalyst expression whose eval() and doGenCode()
  * disagree — the most common custom-expression bug, and silent: Spark
  * falls back to interpreted evaluation whenever codegen bails
  * (splitting thresholds, nested depth, future Spark versions), so a
  * divergence ships as data corruption that depends on WHERE the
  * expression landed in a stage. Per-expression parity tests exist for
  * AhoCorasick/Damerau/ExpressionProps; this is the end-to-end form
  * over every custom expression in real query context (polyhash,
  * image/audio headers, sketch mixers, ...). Ran clean over all 315
  * oracle-backed entries on the round-12 tree.
  */
class CodegenSweep extends SparkSpec {
  ignore("all oracle-backed entries agree between codegen and interpreted paths") {
    // SWEEP_SF_DIR widens the data (FP-midpoint divergence is
    // data-dependent); defaults to sf0.001
    val sweepDir = sys.env.getOrElse("SWEEP_SF_DIR", sf0001)
    val conf = spark.conf
    val savedWs = conf.get("spark.sql.codegen.wholeStage")
    val savedFm = conf.get("spark.sql.codegen.factoryMode")
    val entries = queries.Catalog.all.toSeq
      .filter { case (n, spec) => spec.oracle.nonEmpty && n.startsWith("q") }
      .sortBy(_._1)
    def runAll(): Map[String, Either[String, Seq[String]]] =
      entries.map { case (n, spec) =>
        queries.Catalog.clearCaches(spark)
        n -> scala.util.Try(spec.fn(spark, sweepDir)
            .collect().map(_.toString).toSeq)
          .toEither.left.map(e => String.valueOf(e.getMessage).take(120))
      }.toMap
    try {
      val codegen = runAll()
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = runAll()
      val bad = entries.map(_._1).flatMap { n =>
        (codegen(n), interpreted(n)) match {
          case (Left(e), _) => Some(s"$n: failed under codegen: $e")
          case (_, Left(e)) => Some(s"$n: failed interpreted: $e")
          case (Right(a), Right(b)) if a != b =>
            val first = a.zip(b).find { case (x, y) => x != y }
              .orElse(Some((s"${a.size} rows", s"${b.size} rows")))
            Some(s"$n: eval/doGenCode divergence at $first")
          case _ => None
        }
      }
      assert(bad.isEmpty,
        bad.mkString("codegen/interpreted divergences:\n  ", "\n  ", ""))
    } finally {
      conf.set("spark.sql.codegen.wholeStage", savedWs)
      conf.set("spark.sql.codegen.factoryMode", savedFm)
      queries.Catalog.clearCaches(spark)
    }
  }
}
