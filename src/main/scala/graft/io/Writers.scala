package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources/sinks from SURVEY.md §2.1 that are engine code rather than
  * catalog queries.
  */
object Writers {

  /** S4/S17: insert-if-absent upsert — the reference's
    * `INSERT ... ON CONFLICT (pk) DO NOTHING` (first-writer-wins,
    * `etl/load_users_from_minio.py:93-97`) as a pure DataFrame
    * combinator: dedupe the incoming batch to one deterministic
    * representative per key (smallest by `orderCols`), then append
    * only keys absent from the existing table (left_anti).
    *
    * Idempotent: applying the same batch twice is a no-op — the spec
    * asserts it. Scale: one shuffle on the key for the window dedup +
    * one join (broadcast when the incoming side is small); on a
    * lakehouse table this maps 1:1 to MERGE INTO WHEN NOT MATCHED.
    */
  def upsertNothing(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val deduped = incoming
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    existing.unionByName(deduped.join(existing, keys, "left_anti"))
  }

  /** S4 (JDBC half): TRUE insert-if-absent against a live JDBC table —
    * the reference's `INSERT ... ON CONFLICT (pk) DO NOTHING`
    * (`etl/load_users_from_minio.py:93-97`) in the STAGE-THEN-MERGE
    * shape production JDBC upserts use:
    *
    *  1. dedupe the batch to one deterministic representative per key
    *     (smallest by `orderCols` — same contract as [[upsertNothing]];
    *     required, because a MERGE source with duplicate keys is
    *     undefined across engines);
    *  2. executors bulk-load a session staging table via
    *     `foreachPartition` — one connection + one prepared INSERT per
    *     task, `addBatch`/`executeBatch` every `batchSize` rows inside
    *     a transaction (the distributed form of the reference's
    *     5,000-row batches);
    *  3. the driver issues ONE set-based `MERGE INTO ... WHEN NOT
    *     MATCHED THEN INSERT` from staging and drops the stage.
    *
    * Why not per-row MERGE from the tasks: concurrent MERGEs race on
    * the same absent key (deadlock/duplicate hazard, needs key-
    * repartitioning to be safe), Derby only accepts base tables as a
    * MERGE source anyway, and a single set-based statement is the
    * fastest path on every engine. MERGE syntax is standard (Derby,
    * Postgres 15+, Oracle, DB2, SQL Server; on Postgres < 15 swap the
    * one SQL string for INSERT ... ON CONFLICT DO NOTHING).
    *
    * Idempotent by construction: a second run of the same batch
    * matches every key and inserts nothing (JdbcSpec runs it twice
    * against live Derby and asserts first-writer-wins).
    */
  def upsertJdbc(batch: DataFrame, url: String, driver: String, table: String,
      keys: Seq[String], orderCols: Seq[String], batchSize: Int = 5000,
      dialect: UpsertDialect = MergeDialect): Unit = {
    val cols = batch.schema.fieldNames.toSeq
    def q(c: String) = "\"" + c + "\""
    val stage = table + "_STG_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    def withConn[A](f: java.sql.Connection => A): A = {
      Class.forName(driver)
      val conn = java.sql.DriverManager.getConnection(url)
      try f(conn) finally conn.close()
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val oneRowPerKey = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val insertSql = s"INSERT INTO $stage (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    withConn { conn =>
      // empty clone of the target: inherits exact column types
      conn.createStatement().executeUpdate(
        s"CREATE TABLE $stage AS SELECT ${cols.map(q).mkString(", ")} " +
          s"FROM $table WITH NO DATA")
    }
    try {
      oneRowPerKey.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          Class.forName(driver)
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(insertSql)
            var pending = 0
            while (rows.hasNext) {
              val r = rows.next()
              var i = 0
              while (i < cols.length) {
                val v = r.get(i)
                if (v == null) st.setNull(i + 1, java.sql.Types.NULL)
                else st.setObject(i + 1, v)
                i += 1
              }
              st.addBatch()
              pending += 1
              if (pending >= batchSize) { st.executeBatch(); conn.commit(); pending = 0 }
            }
            if (pending > 0) { st.executeBatch(); conn.commit() }
            st.close()
          } finally conn.close()
        }
      }
      withConn { conn =>
        conn.createStatement().executeUpdate(
          upsertStatementSql(dialect, table, stage, cols, keys))
      }
    } finally withConn { conn =>
      conn.createStatement().executeUpdate(s"DROP TABLE $stage")
    }
  }

  /** Dialect for [[upsertJdbc]]'s final set-based statement. */
  sealed trait UpsertDialect
  /** Standard `MERGE INTO ... WHEN NOT MATCHED` — Derby (the live
    * spec's engine), Oracle, DB2, SQL Server, Postgres 15+. */
  case object MergeDialect extends UpsertDialect
  /** Postgres-native `INSERT ... SELECT ... ON CONFLICT (pk) DO
    * NOTHING` — the reference's exact statement
    * (`etl/load_users_from_minio.py:93-97`), required on Postgres
    * < 15 where MERGE doesn't exist. Same first-writer-wins
    * semantics: conflicting keys are skipped, not updated. */
  case object PostgresOnConflictDialect extends UpsertDialect

  /** The insert-if-absent statement per dialect — pure SQL generation,
    * unit-tested without a server (JdbcSpec drives the merge form live
    * on embedded Derby; no Postgres exists in this environment, so the
    * ON CONFLICT form is verified at the SQL level only).
    */
  private[graft] def upsertStatementSql(dialect: UpsertDialect, table: String,
      stage: String, cols: Seq[String], keys: Seq[String]): String = {
    def q(c: String) = "\"" + c + "\""
    dialect match {
      case MergeDialect =>
        val onClause = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        s"""MERGE INTO $table t USING $stage s
           |ON $onClause
           |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
           |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
      case PostgresOnConflictDialect =>
        s"""INSERT INTO $table (${cols.map(q).mkString(", ")})
           |SELECT ${cols.map(q).mkString(", ")} FROM $stage
           |ON CONFLICT (${keys.map(q).mkString(", ")}) DO NOTHING""".stripMargin
    }
  }

  /** S2: lenient CSV scan — explicit schema, PERMISSIVE mode, corrupt
    * rows quarantined in `_corrupt_record` instead of failing the job
    * (the reference's per-row try/except skip,
    * `etl/load_interactions_from_minio.py:95-119`).
    */
  def lenientCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** S2 sibling, JSON-lines: the other ubiquitous ingest format for
    * document corpora (one JSON object per line). Same PERMISSIVE
    * contract as [[lenientCsv]]: schema enforced, malformed lines
    * preserved whole in `_corrupt_record` instead of killing the job —
    * the ST8 log-and-continue rule applied to batch ingest. Explicit
    * schema (never inference) is also the scale rule: inference is a
    * full extra pass over 100 TB before the real read.
    */
  def lenientJsonl(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)

  /** ORC scan/write — the second columnar format Spark ships built-in;
    * engines that standardize on ORC (Hive-lineage warehouses) get the
    * same predicate-pushdown + column-pruning contract parquet has
    * (FormatsSpec asserts pushed filters reach the OrcScan). Parity
    * write options: zstd like the parquet path.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5: partitioned JDBC scan options — the reference reads the whole
    * fact table through ONE partition (`batch_als_train.py:116-117`),
    * a scalability bug; this is the parallel-scan configuration that
    * fixes it (numPartitions range-splits on the watermark column).
    * Returned as the option map so tests can pin it without a live DB.
    */
  def partitionedJdbcOptions(url: String, table: String, partitionCol: String,
      lower: Long, upper: Long, numPartitions: Int): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "partitionColumn" -> partitionCol,
      "lowerBound" -> lower.toString,
      "upperBound" -> upper.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> "10000",
      "pushDownPredicate" -> "true")

  /** S17/W1: append-only model registry + "active model" view — the
    * reference flips `is_active` with a two-statement transaction
    * (`train_module.py:106-157`); the scalable design is append-only
    * writes with the active row derived by a window (latest
    * created_at per model_name wins). No transaction needed.
    */
  def activeModels(registry: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("model_name"))
      .orderBy(col("created_at").desc)
    registry.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Dynamic partition overwrite — replace ONLY the partitions present
    * in `batch`, leaving every other partition of the table untouched
    * (the daily-ingest pattern: rewriting one day must not truncate the
    * table, which is exactly what static overwrite mode does). Session
    * conf `partitionOverwriteMode=dynamic` is set per-write via the
    * writer option so the session default stays untouched. Scale: the
    * write only shuffles the incoming batch; untouched partitions are
    * never read.
    */
  def overwritePartitions(batch: DataFrame, partitionCols: Seq[String],
      path: String): Unit =
    batch.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetBytes)` files (≥1), sized from the FS-reported
    * footprint. The maintenance job every streaming ingest needs —
    * thousands of per-microbatch files destroy scan parallelism math
    * and NameNode/liststatus budgets. Returns the output file count.
    * Scale: one coalesce (no shuffle) when shrinking file count; the
    * read parallelism of the rewrite is still the ORIGINAL file count,
    * so the job itself stays parallel.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    fs.listStatus(out).count(f => f.getPath.getName.endsWith(".parquet"))
  }

  /** Schema-evolution read: a parquet directory whose batches were
    * written with DIFFERENT column sets (the lakehouse "column added
    * mid-stream" case) reads as the union schema with `mergeSchema`;
    * rows from pre-evolution batches surface the new columns as null.
    * `pinned` is the 100 TB path: mergeSchema reads a footer per file
    * at planning time (a liststatus+footer storm on a large table), so
    * once the evolved schema is known, pin it — same result, planning
    * cost independent of file count, and late files with extra unknown
    * columns are projected away instead of widening the scan.
    */
  def readEvolved(spark: SparkSession, path: String,
      pinned: Option[StructType] = None): DataFrame =
    pinned match {
      case Some(schema) => spark.read.schema(schema).parquet(path)
      case None => spark.read.option("mergeSchema", "true").parquet(path)
    }

  /** O11 artifact housekeeping: keep the newest `keep` version
    * directories under `versionsDir` (lexicographic name order — the
    * reference names versions `yyyyMMdd_HHmmss`, so lexicographic =
    * chronological; `train_module.py:185-200`), delete the rest.
    * Hadoop FS API so the same code prunes local dirs and object-store
    * prefixes. Returns the deleted version names, newest-first survivors
    * excluded; missing dir = nothing to do (reference's try/except).
    */
  def pruneVersions(spark: SparkSession, versionsDir: String, keep: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(versionsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val versions = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath).sortBy(_.getName)(Ordering[String].reverse)
      versions.drop(keep).map { old =>
        fs.delete(old, true)
        old.getName
      }.toSeq
    }
  }
}
