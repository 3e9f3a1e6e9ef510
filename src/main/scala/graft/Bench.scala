package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (BENCH_ALL=1 for the
  * whole catalog) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the noop sink — `count()` would
  * let Catalyst prune every column the count doesn't need and
  * undermeasure projection-heavy queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (sys.env.get("BENCH_ALL").contains("1")) queries.Catalog.all
      else queries.Catalog.all.filter(_._2.headline)
    // stable order; one warm-up of the smallest table read so JVM/codegen
    // startup lands outside the first measured query
    Tables.region(spark, sfDir).count()
    val results = selected.toSeq.sortBy(_._1).map { case (name, spec) =>
      val t0 = System.nanoTime()
      try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $dt%.2fs")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
