package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (BENCH_ALL=1 for the
  * whole catalog) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the noop sink — `count()` would
  * let Catalyst prune every column the count doesn't need and
  * undermeasure projection-heavy queries.
  *
  * De-noising: one FULL untimed warm-up pass runs the whole selected
  * suite first (HotSpot JIT + codegen compilation land there, not in
  * the first timed rep — round-3 driver runs showed 3-9× rep-1
  * inflation on the dedup family from cold-JVM cost alone), caches are
  * cleared, then the suite runs BENCH_REPS times (default 3) and each
  * query reports its MINIMUM across reps. Session-keyed caches (shared
  * near-dup / LSH pair sets, ALS models) are cleared between reps so
  * every rep pays full compute — the min is a complete computation,
  * not a cache hit. Min, not median: a round-6 controlled experiment
  * (full ScalaTest Spark JVM beside the bench, the driver's own shape)
  * showed the q63/q66/q74/q83 "transient spike" class is pure CPU
  * contention — spiked reps carry ZERO extra GC time and ZERO codegen
  * recompiles, they just run 3-6× slower while the neighbor JVM owns
  * the cores. A median of 3 flips to the disturbed value whenever 2
  * reps are disturbed; the min reports the least-disturbed complete
  * run, which is the engine's cost. The full per-rep distribution
  * ships in `rep_times` (+ `gc_ms`, `codegen_compiles`), so loaded
  * behavior stays visible rather than hidden by the summary statistic.
  *
  * Attribution note: WITHIN a rep, caches are shared — the CANONICAL
  * PAYER of each shared pipeline (q35 for the shingle/verified-pair
  * kernels, q40 for the LSH candidate set, q14 for the co-pair graph)
  * runs FIRST and pays its build cost; every other member then times a
  * cache hit. Payer-first ordering (round 10) replaced plain
  * lexicographic order after q149 — which sorts before q35 — silently
  * absorbed the shingle build and drifted 0.95x -> 1.49x against an
  * envelope that attributed that cost to q35. Per-query numbers are
  * therefore suite-relative, not standalone; the emitted JSON carries
  * the shared groups under "shared_cache_groups" and the actual payer
  * under "cache_build_paid_by" so a BENCH_ONLY subset is read correctly.
  *
  * A query that throws is reported as null in `queries` and listed in
  * `errors` instead of contributing a near-zero time to the total.
  *
  * Spike diagnosis: alongside each reported min the JSON carries the per-rep
  * wall times (`rep_times`), the JVM GC-time delta per rep (`gc_ms`),
  * and the whole-stage-codegen compilation-count delta per rep
  * (`codegen_compiles`) — so a shifted rep is attributable to GC
  * pressure vs codegen-cache thrash vs a genuine plan change without
  * rerunning under a profiler (round-5 verdict: medians alone made the
  * q63/q74/q83 transient-spike class undiagnosable).
  */
object Bench {

  /** Within-rep shared session caches as (group, canonical payer,
    * members): the canonical payer runs FIRST (see run-order note in
    * main) and pays the build cost; later members time a cache hit.
    * Members are every catalog entry that reads the group's persisted
    * kernel, headline or not, so BENCH_ALL runs attribute correctly.
    */
  private[graft] val sharedGroups: Seq[(String, String, Seq[String])] = Seq(
    ("verified_pairs", "q35_ngram_jaccard_neardup",
      Seq("q35_ngram_jaccard_neardup", "q50_corpus_curation",
        "q62_dedup_components", "q130_canonical_selection",
        "q135_dedup_yield",
        // round-11 membership completion (full consumer audit of
        // ngramNearDupPairs): every truth-kernel reader, headline or not
        "q139_leakage_free_split", "q234_dedup_token_ledger",
        "q296_blocking_quality", "q305_fellegi_sunter",
        "q307_sorted_neighborhood")),
    ("lsh_candidates", "q40_embedding_lsh_ann",
      Seq("q40_embedding_lsh_ann", "q57_embedding_neardup_ann")),
    // the adaptive multi-probe LSH bucket/candidate kernel
    // (annBucketCache/annCandCache) — q165 sorts first among consumers,
    // so it is the payer in any BENCH_ALL run
    ("ann_buckets", "q165_semantic_decontamination",
      Seq("q165_semantic_decontamination", "q204_mutual_knn",
        "q238_matryoshka_audit",
        // round 12: caught by BenchGroupsSpec's derived-membership
        // audit on its first run — q240 composes the LSH cut and reads
        // this family's caches (ScaleSweep knew; this list didn't)
        "q240_contamination_report")),
    ("shingle_rows", "q35_ngram_jaccard_neardup",
      Seq("q35_ngram_jaccard_neardup", "q36_minhash_lsh_neardup",
        "q50_corpus_curation", "q62_dedup_components",
        "q65_incremental_dedup", "q67_decontamination",
        "q86_bloom_decontamination", "q112_containment_neardup",
        "q130_canonical_selection", "q132_ingest_merge",
        "q135_dedup_yield",
        // round-10 additions: the minhash/prefix AUDIT entries read the
        // same shingle/signature kernels (q149's round-9 drift was this
        // membership gap — it sorted before q35 and silently paid the
        // build the envelope attributed to q35)
        "q149_minhash_estimate_audit", "q296_blocking_quality",
        "q297_bbit_minwise",
        // round-11 membership completion (full consumer audit of
        // shingleRows/shingleTids/shingleSizes/minhashSigs/simhashPerDoc/
        // prefixRows/verifyJaccard — all read the persisted shingle rows)
        "q37_simhash", "q38_simhash_pairs", "q45_fingerprint",
        "q60_ngram_novelty", "q139_leakage_free_split",
        "q140_source_overlap", "q172_source_minhash_overlap",
        "q231_accession_novelty", "q234_dedup_token_ledger",
        "q260_coverage_selection", "q305_fellegi_sunter",
        "q307_sorted_neighborhood",
        // round 12: BenchGroupsSpec derived-membership audit — q240's
        // lexical probe reads the shingle kernel too
        "q240_contamination_report")),
    ("co_pairs", "q14_part_pairs",
      Seq("q14_part_pairs", "q85_pagerank", "q94_triangle_count",
        "q95_item_similarity", "q111_degree_stats",
        "q137_association_rules",
        // round-10: the iterative graph family reads coEdges/coPairCounts
        "q290_greedy_matching", "q291_butterfly_census",
        "q294_katz_centrality", "q300_two_sweep_diameter",
        // round-11 membership completion (full consumer audit of
        // coPairCounts/coEdges)
        "q127_kcore_decomposition", "q164_label_propagation",
        "q222_bfs_distances", "q243_clustering_buckets",
        "q251_sssp_weighted", "q252_modularity",
        "q258_link_prediction", "q313_louvain_move",
        "q314_wl_refinement", "q317_anf")))

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** Cumulative count of whole-stage-codegen compilations in this JVM. */
  private def codegenCompiles(): Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  /** Cumulative shuffle-write / spill bytes across all completed stages
    * — the per-query deltas are the bench's plan-cost attribution (a
    * query whose time grows with data but whose shuffle bytes don't is
    * compute-bound; one shuffling more than its input re-partitions
    * too much; any nonzero spill at sf0.1 flags an executor-memory
    * cliff long before 100 TB would). Listener events are async, so
    * snapshots drain the bus first ([[org.apache.spark.graft.SparkShims]]).
    */
  private final class StageMetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    }
  }
  /** 1/5/15-min load averages, or empty off-Linux — recorded at suite
    * start and end in the diagnostics line. Round-13 lesson: an
    * orphaned hung test JVM (~1.4 cores for 8 h) inflated two rounds
    * of driver bench readings before anyone looked at machine load;
    * with loadavg in the emitted JSON that diagnosis is one grep, and
    * an envelope ratio read against a loaded box stops masquerading as
    * engine drift.
    */
  private def loadavg(): Seq[Double] =
    scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")))
        .split("\\s+").take(3).toSeq.map(_.toDouble))
      .getOrElse(Seq.empty)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadStart = loadavg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = sys.env.get("BENCH_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        queries.Catalog.all.filter(q => keep(q._1))
      case None =>
        if (sys.env.get("BENCH_ALL").contains("1")) queries.Catalog.all
        else queries.Catalog.all.filter(_._2.headline)
    }
    val names = selected.toSeq.sortBy(_._1)
    // Run order: canonical cache payers FIRST, then the rest sorted.
    // Round-9 lesson (q149 0.95x -> 1.49x envelope drift on an
    // unchanged plan): q149 sorts before q35, so with lexicographic
    // run order q149 paid the cleared-cache shingle+signature build
    // that the envelope and `cache_build_paid_by` attribute to q35.
    // Payer-first ordering pins the build cost on the designated
    // payer every run, so per-query numbers stay comparable across
    // rounds as members are added.
    val payersFirst = sharedGroups.map(_._2).distinct.filter(names.map(_._1).toSet)
    val runOrder = names.filter(n => payersFirst.contains(n._1))
      .sortBy(n => payersFirst.indexOf(n._1)) ++
      names.filterNot(n => payersFirst.contains(n._1))
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val gcDeltas = scala.collection.mutable.Map.empty[String, Vector[Long]]
    val cgDeltas = scala.collection.mutable.Map.empty[String, Vector[Long]]
    val swDeltas = scala.collection.mutable.Map.empty[String, Vector[Long]]
    val spDeltas = scala.collection.mutable.Map.empty[String, Vector[Long]]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val stageMetrics = new StageMetricsListener
    spark.sparkContext.addSparkListener(stageMetrics)
    def drainedShuffleSpill(): (Long, Long) = {
      org.apache.spark.graft.SparkShims.drainListenerBus(spark.sparkContext)
      (stageMetrics.shuffleWrite.get(), stageMetrics.spill.get())
    }
    // full untimed warm-up pass: every selected query runs once so JIT +
    // codegen compilation is paid before any timed rep (a failure here is
    // logged but not recorded — the timed reps classify it)
    runOrder.foreach { case (name, spec) =>
      val t0 = System.nanoTime()
      try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name FAILED: $e") }
      System.err.println(f"[bench] warmup $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (rep <- 1 to reps) {
      queries.Catalog.clearCaches(spark)
      // nudge the ContextCleaner so dereferenced model/checkpoint blocks
      // from the previous pass are actually freed before timing resumes
      System.gc()
      runOrder.foreach { case (name, spec) =>
        val (sw0, sp0) = drainedShuffleSpill()
        val gc0 = gcMillis(); val cg0 = codegenCompiles()
        val t0 = System.nanoTime()
        val ok =
          try { spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        val gcd = gcMillis() - gc0; val cgd = codegenCompiles() - cg0
        val (sw1, sp1) = drainedShuffleSpill()
        if (ok) {
          times(name) = times.getOrElse(name, Vector()) :+ dt
          gcDeltas(name) = gcDeltas.getOrElse(name, Vector()) :+ gcd
          cgDeltas(name) = cgDeltas.getOrElse(name, Vector()) :+ cgd
          swDeltas(name) = swDeltas.getOrElse(name, Vector()) :+ ((sw1 - sw0) >> 20)
          spDeltas(name) = spDeltas.getOrElse(name, Vector()) :+ ((sp1 - sp0) >> 20)
        } else failed += name
        System.err.println(
          f"[bench] rep $rep $name $dt%.2fs gc=${gcd}ms cg=$cgd " +
            f"shufW=${(sw1 - sw0) >> 20}MB spill=${(sp1 - sp0) >> 20}MB" +
            (if (ok) "" else " (failed)"))
      }
    }
    def best(v: Vector[Double]): Double = v.min
    // JSON-bound doubles must be locale-fixed (ADVICE r13): the f
    // interpolator honors the default locale, so a comma-decimal locale
    // would emit `0,27` and corrupt the machine-parsed lines.
    def num(d: Double, prec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(d))
    // a query that failed in ANY rep is null — a partial min next to
    // an errors entry would read as both failed and timed
    def goodTimes(k: String): Option[Vector[Double]] =
      if (failed(k)) None else times.get(k).filter(_.nonEmpty)
    val qs = names.map { case (k, _) =>
      goodTimes(k) match {
        case Some(v) => "\"" + k + "\":" + num(best(v), 3)
        case None => "\"" + k + "\":null"
      }
    }.mkString("{", ",", "}")
    val total = names.flatMap { case (k, _) => goodTimes(k).map(best) }.sum
    // per-rep diagnostics, keyed like `queries` (successful reps only)
    def perRep[A](m: collection.Map[String, Vector[A]], fmt: A => String): String =
      names.flatMap { case (k, _) =>
        if (failed(k)) None
        else m.get(k).filter(_.nonEmpty).map(v =>
          "\"" + k + "\":" + v.map(fmt).mkString("[", ",", "]"))
      }.mkString("{", ",", "}")
    val repTimes = perRep(times, (d: Double) => num(d, 3))
    val gcJson = perRep(gcDeltas, (l: Long) => l.toString)
    val cgJson = perRep(cgDeltas, (l: Long) => l.toString)
    val swJson = perRep(swDeltas, (l: Long) => l.toString)
    val spJson = perRep(spDeltas, (l: Long) => l.toString)
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val shared = sharedGroups.map { case (g, _, ms) =>
      "\"" + g + "\":" + ms.map("\"" + _ + "\"").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // self-describing anchors: for each group, WHICH selected query
    // actually paid the build this run — the canonical payer when it is
    // in the suite (it runs first by construction), else the earliest
    // member in run order (BENCH_ONLY subsets without the payer)
    val inSuite = names.map(_._1).toSet
    val runIdx = runOrder.map(_._1).zipWithIndex.toMap
    val attribution = sharedGroups.flatMap { case (g, payer, ms) =>
      (if (inSuite(payer)) Some(payer)
       else ms.filter(inSuite).sortBy(runIdx).headOption)
        .map(p => "\"" + g + "\":\"" + p + "\"")
    }.mkString("{", ",", "}")
    // Two lines, diagnostics FIRST: the driver captures only a ~2000-char
    // tail of the output, so the LAST line must be a compact scalar summary
    // (r6 lesson — the single fat line with per-rep arrays outgrew the
    // driver's tail window and the round's bench parse came back null).
    // The full per-rep distribution/attribution stays on the earlier
    // "diagnostics" line for humans and tools/check_bench.py.
    def loadJson(v: Seq[Double]): String =
      v.map(d => num(d, 2)).mkString("[", ",", "]")
    println(f"""{"diagnostics":true,"rep_times":$repTimes,"gc_ms":$gcJson,"codegen_compiles":$cgJson,"shuffle_write_mb":$swJson,"spill_mb":$spJson,"shared_cache_groups":$shared,"cache_build_paid_by":$attribution,"warmup":true,"heap_gb":${Runtime.getRuntime.maxMemory / (1 << 30)},"loadavg_start":${loadJson(loadStart)},"loadavg_end":${loadJson(loadavg())}}""")
    val summary = s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,"stat":"min","reps":$reps,"errors":$errs,"sf":"$sfDir"}"""
    // BENCH_ALL's ~150-query map would overflow the tail window too —
    // drop the per-query detail (it survives via rep_times above) before
    // letting the final line grow past the driver's capture.
    val lastLine =
      if (summary.length <= 1900) summary
      else s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","stat":"min","reps":$reps,"n_queries":${names.size},"queries_elided":true,"errors":$errs,"sf":"$sfDir"}"""
    println(lastLine)
    spark.stop()
  }
}
