package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-time breakdown for one catalog entry — the round-14
  * optimization loop's microscope. The bench attributes seconds per
  * QUERY; iterative kernels (GBT boosting, BFS rounds, star
  * contraction) run tens of Spark jobs per query, and knowing WHICH
  * jobs carry the time (and at what task count) is what separates
  * "per-round fixed overhead" from "a genuinely expensive stage".
  *
  * Usage: sbt "runMain graft.Profile <query> [sfDir] [cpus]"
  * Prints one line per job ≥ 20 ms (duration, task count, description)
  * after an untimed warm-up pass, plus the job-count/els summary.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("m05_gbt_eval")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var jobs = Vector.empty[(Int, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        t0s.put(j.jobId, System.nanoTime)
        nTasks.put(j.jobId, j.stageInfos.map(_.numTasks).sum)
        descs.put(j.jobId, Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime - t0s.getOrDefault(j.jobId, 0L)) / 1000000L
        jobs = jobs :+ ((j.jobId, dt, Option(nTasks.get(j.jobId)).fold(-1)(_.intValue), descs.getOrDefault(j.jobId, "")))
      }
    })
    val spec = queries.Catalog.all(name)
    def once(): Double = {
      val t = System.nanoTime
      spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime - t) / 1e9
    }
    println(f"[profile] warmup ${once()}%.2f s")
    // PROFILE_KEEP_CACHES=1 reproduces the bench regime of a shared-
    // group MEMBER (kernel caches stay warm from the payer); default
    // reproduces the PAYER regime (caches cleared, build cost included).
    if (!sys.env.get("PROFILE_KEEP_CACHES").contains("1")) {
      queries.Catalog.clearCaches(spark)
      System.gc()
    }
    org.apache.spark.graft.SparkShims.drainListenerBus(spark.sparkContext)
    jobs = Vector.empty
    val dt = once()
    org.apache.spark.graft.SparkShims.drainListenerBus(spark.sparkContext)
    println(f"[profile] $name $dt%.2f s over ${jobs.size} jobs; sum-of-jobs ${jobs.map(_._2).sum} ms")
    jobs.filter(_._2 >= 20).sortBy(_._1).foreach { case (id, ms, nt, d) =>
      println(f"[profile]   job $id%4d $ms%6d ms tasks=$nt%4d ${d.take(90)}")
    }
    spark.stop()
  }
}
