package graft

import org.apache.spark.sql.functions._

import graft.io.Writers

/** S3/S5/S6 live JDBC round-trip over embedded Apache Derby (ships in
  * /opt/spark/jars for the Hive metastore — no broker/Postgres in this
  * sandbox, but the JDBC codepath itself is fully exercisable): batched
  * write, plain read, and the partitioned parallel scan built from
  * [[Writers.partitionedJdbcOptions]] (the fix for the reference's
  * single-partition fact read, `batch_als_train.py:116-117`).
  */
class JdbcSpec extends SparkSpec {

  private lazy val dbUrl = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("batched JDBC write + read round-trip (S3/S6)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 3 % 7)).toDF("id", "name", "grp")
    df.write.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      .option("dbtable", "people")
      // S3: the reference inserts in batches of 5000
      // (etl/load_users_from_minio.py:22); Spark's JDBC sink batches
      // through the same knob
      .option("batchsize", "5000")
      .mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      .option("dbtable", "people").load()
    assert(back.count() == 100)
    assert(back.agg(sum("id")).head().getLong(0) == 5050L)
  }

  test("partitioned JDBC scan splits the read across partitions (S5)") {
    val opts = Writers.partitionedJdbcOptions(
      dbUrl, "people", "id", lower = 1L, upper = 100L, numPartitions = 4)
    val scan = spark.read.format("jdbc")
      .options(opts).option("driver", driver).load()
    // the scan plans one task per range split, not one total
    assert(scan.rdd.getNumPartitions == 4)
    assert(scan.count() == 100)
    // predicate pushdown reaches the JDBC source (pushDownPredicate on)
    val filtered = scan.filter(col("grp") === 0)
    assert(filtered.count() > 0 && filtered.count() < 100)
  }

  test("upsertJdbc MERGEs insert-if-absent, idempotent, live on Derby (S4)") {
    import spark.implicits._
    val seed = Seq((1L, "keep", 0L)).toDF("id", "name", "grp")
    seed.write.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      .option("dbtable", "merge_people")
      .mode("overwrite").save()
    // batch carries: a clash on an existing key (must NOT clobber), an
    // in-batch duplicate key (deterministic representative = smallest
    // name), and fresh keys spread across partitions
    val batch = (Seq((1L, "CLOBBER", 9L), (2L, "b-second", 1L), (2L, "a-first", 1L)) ++
      (3L to 40L).map(i => (i, s"n_$i", i % 5))).toDF("id", "name", "grp")
      .repartition(4)
    Writers.upsertJdbc(batch, dbUrl, driver, "merge_people",
      keys = Seq("id"), orderCols = Seq("name"), batchSize = 7)
    def readBack() = spark.read.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      .option("dbtable", "merge_people").load()
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val once = readBack()
    assert(once.length == 40)
    assert(once(0) == (1L, "keep"), "existing row must survive the clash")
    assert(once(1) == (2L, "a-first"), "in-batch dup resolves to smallest orderCol")
    // idempotence: the exact same batch again changes nothing
    Writers.upsertJdbc(batch, dbUrl, driver, "merge_people",
      keys = Seq("id"), orderCols = Seq("name"), batchSize = 7)
    assert(readBack().toSeq == once.toSeq)
  }

  test("JDBC query scan reads a derived query, not a table (S7)") {
    val agg = spark.read.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      // Derby folds unquoted identifiers to uppercase; Spark created
      // the columns quoted-lowercase, so the pushed query must quote
      .option("query", "SELECT \"grp\", COUNT(*) AS n FROM people GROUP BY \"grp\"")
      .load()
    assert(agg.count() == 7)
    assert(agg.agg(sum("n")).head().getLong(0) == 100L)
  }

  test("upsert statement generation covers both dialects (S4, Postgres form)") {
    import graft.io.Writers
    val cols = Seq("user_id", "name", "age")
    val keys = Seq("user_id")
    val merge = Writers.upsertStatementSql(Writers.MergeDialect,
      "users", "users_STG_x", cols, keys)
    assert(merge ==
      """MERGE INTO users t USING users_STG_x s
        |ON t."user_id" = s."user_id"
        |WHEN NOT MATCHED THEN INSERT ("user_id", "name", "age")
        |VALUES (s."user_id", s."name", s."age")""".stripMargin)
    // the reference's exact Postgres statement shape
    // (etl/load_users_from_minio.py:93-97): conflicting keys skipped
    val pg = Writers.upsertStatementSql(Writers.PostgresOnConflictDialect,
      "users", "users_STG_x", cols, keys)
    assert(pg ==
      """INSERT INTO users ("user_id", "name", "age")
        |SELECT "user_id", "name", "age" FROM users_STG_x
        |ON CONFLICT ("user_id") DO NOTHING""".stripMargin)
    // composite key: every key participates in the conflict target /
    // match clause
    val merge2 = Writers.upsertStatementSql(Writers.MergeDialect,
      "t2", "s2", Seq("a", "b", "v"), Seq("a", "b"))
    assert(merge2.contains("""t."a" = s."a" AND t."b" = s."b""""))
    val pg2 = Writers.upsertStatementSql(Writers.PostgresOnConflictDialect,
      "t2", "s2", Seq("a", "b", "v"), Seq("a", "b"))
    assert(pg2.contains("""ON CONFLICT ("a", "b") DO NOTHING"""))
  }

  test("streaming upsert sink converges under full tape replay (exactly-once by key)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ScoringStream
    import graft.streaming.ScoringStream.RawEvent
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // create the target with the exact column types (empty JDBC write)
    Seq.empty[(Long, String, String, java.sql.Timestamp)]
      .toDF("user", "item", "action", "ts")
      .write.format("jdbc").option("url", dbUrl).option("driver", driver)
      // Derby's default StringType mapping is CLOB, which MERGE cannot
      // compare on — pin the key columns to VARCHAR
      .option("createTableColumnTypes", "item VARCHAR(64), action VARCHAR(32)")
      .option("dbtable", "stream_upsert").mode("overwrite").save()
    def readBack() = spark.read.format("jdbc")
      .option("url", dbUrl).option("driver", driver)
      .option("dbtable", "stream_upsert").load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawEvent]
    input.addData(RawEvent(1L, "a", "click", ts(1)),
      RawEvent(2L, "b", "view", ts(2)))
    input.addData(RawEvent(3L, "c", "click", ts(3)),
      RawEvent(1L, "a", "click", ts(1))) // source-level duplicate too
    def ckpt() = java.nio.file.Files.createTempDirectory("ckpt_upsert").toString
    val q1 = ScoringStream.upsertSink(input.toDS(), dbUrl, driver,
      "stream_upsert", ckpt())
    try q1.processAllAvailable() finally q1.stop()
    val once = readBack()
    assert(once.length == 3, s"got $once")
    // a FRESH checkpoint replays the whole tape — the worst-case
    // at-least-once duplication — and must change nothing
    val q2 = ScoringStream.upsertSink(input.toDS(), dbUrl, driver,
      "stream_upsert", ckpt())
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack() == once)
  }
}
