package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.Writers
import graft.operators.CoOccurrence

/** The reference's Airflow DAG (`recsys_pipeline.py:133-144`:
  * load_users >> load_interactions >> [train_lgbm, spark_als_train] >>
  * artifacts) as ONE Spark application with explicit stage functions —
  * orchestration order stays, per-task Python processes don't
  * (SURVEY.md §3.2). Each stage returns/writes DataFrames; everything
  * is restartable because every sink is an idempotent overwrite of a
  * derived table.
  *
  * Runs on the fixture tables: `orders`×`lineitem` play the
  * interactions fact, `customer` plays users.
  */
object Pipeline {

  /** Stage 0 precondition — the reference DAG's `check_data_freshness`
    * task (`airflow/dags/recsys_pipeline.py:175-212`): count the
    * interactions fact, FAIL the run when it is empty, and report how
    * many rows arrived in the trailing 24 h. The reference only reports
    * the recent count (its hard gate is total==0); `requireRecent=true`
    * upgrades the 24 h check from reported to enforced for feeds where
    * training on stale data must abort. `now` defaults to the fact's
    * own max timestamp — the fixtures are static, and the reference's
    * NOW() is only meaningful against a live feed (same anchored-max
    * determinization as q30).
    *
    * Cost: one global aggregation (count+max, map-side combined to one
    * row) + one filtered count — no shuffle of the fact itself; with a
    * partition-pruned timestamp layout the recent count touches only
    * the trailing day's partitions.
    *
    * @return (totalRows, recentRows)
    */
  def checkDataFreshness(interactions: DataFrame, tsCol: String = "ts",
      now: Option[java.sql.Timestamp] = None,
      requireRecent: Boolean = false): (Long, Long) = {
    val head = interactions
      .agg(count(lit(1)).as("n"), max(col(tsCol)).as("max_ts")).head()
    val total = head.getLong(0)
    if (total == 0)
      throw new IllegalStateException(
        "No data in interactions table. Skipping retraining.")
    // head.get(1) is a java.sql.Timestamp for TimestampType input but a
    // java.time.LocalDateTime when the caller hands us a raw TIMESTAMP_NTZ
    // frame (bypassing Tables.events' normalization); lit() builds the
    // right literal type for either, so the comparison stays well-typed
    // against whatever flavor tsCol actually is.
    val anchor: Any = now.getOrElse(head.get(1))
    val recent = interactions
      .filter(col(tsCol) > lit(anchor) - expr("INTERVAL 24 HOURS")).count()
    if (requireRecent && recent == 0)
      throw new IllegalStateException(
        s"No interactions newer than 24h before $anchor. Skipping retraining.")
    (total, recent)
  }

  /** Stage 1 (S4): ingest with first-writer-wins upsert semantics. */
  def ingest(existing: DataFrame, incoming: DataFrame, pk: Seq[String]): DataFrame =
    Writers.upsertNothing(existing, incoming, pk, incoming.columns.toSeq.diff(pk))

  /** Stage 2 (M10): knowledge base — co-occurrence pairs, popularity
    * top-k, success profile — persisted as parquet tables (no pickles,
    * SURVEY.md §1.1 item 5).
    */
  def knowledgeBase(spark: SparkSession, dir: String, outDir: String): Unit = {
    val li = Tables.lineitem(spark, dir)
    CoOccurrence.topPairs(li, "l_orderkey", "l_partkey", 50, maxItemsPerKey = Some(1000))
      .write.mode("overwrite").parquet(s"$outDir/kb_pairs")
    li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey")).limit(50)
      .write.mode("overwrite").parquet(s"$outDir/kb_popular")
    li.filter(col("l_returnflag") === "N")
      .agg(avg("l_quantity").as("avg_qty"), avg("l_discount").as("avg_disc"))
      .write.mode("overwrite").parquet(s"$outDir/kb_profile")
  }

  /** Stage 3 (M1-M5): ALS train + factor export in the reference's
    * sink shape (JSON-encoded arrays, `batch_als_train.py:217-234`).
    */
  def trainAndExport(spark: SparkSession, dir: String, outDir: String): Unit = {
    graft.ml.MlCatalog.all("m01_als_user_factors").fn(spark, dir)
      .write.mode("overwrite").parquet(s"$outDir/als_user_factors")
    graft.ml.MlCatalog.saveAndReloadAls(spark, dir, s"$outDir/als_model")
  }

  /** Stage 4 (S17): registry append + active view materialization. */
  def registerRun(spark: SparkSession, registry: DataFrame, outDir: String,
      modelName: String, metric: Double, runId: Long): DataFrame = {
    import spark.implicits._
    val appended = registry.unionByName(
      Seq((modelName, runId, metric)).toDF("model_name", "created_at", "metric"))
    Writers.activeModels(appended)
      .write.mode("overwrite").parquet(s"$outDir/registry_active")
    appended
  }

  /** Full run, fixture-driven. Returns the artifact dir listing. */
  def run(spark: SparkSession, dir: String, outDir: String): Seq[String] = {
    import spark.implicits._
    checkDataFreshness(Tables.events(spark, dir))
    knowledgeBase(spark, dir, outDir)
    trainAndExport(spark, dir, outDir)
    val empty = Seq.empty[(String, Long, Double)]
      .toDF("model_name", "created_at", "metric")
    registerRun(spark, empty, outDir, "als", 0.93, 1L)
    new java.io.File(outDir).listFiles().map(_.getName).sorted.toSeq
  }
}
