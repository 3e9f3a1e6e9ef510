package graft

import org.apache.spark.sql.types.TimestampType

/** Guard against silent fixture regenerations changing events.parquet's
  * physical timestamp encoding (it has already happened once: r6 moved the
  * fixture from TIMESTAMP(NANOS) to TIMESTAMP_MICROS(isAdjustedToUTC=0),
  * which crashed five queries). Three tiny committed fixtures — one per
  * observed encoding, identical logical values — must all normalize to the
  * same TimestampType micros through the production `Tables.events` path.
  */
class TsEncodingSpec extends SparkSpec {

  private val dirs = Seq("ts_nanos", "ts_ntz", "ts_utc")
    .map(n => n -> s"src/test/resources/tsfixtures/$n")

  test("Tables.events normalizes all three ts encodings to TimestampType") {
    for ((name, dir) <- dirs) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$name: expected TimestampType, got ${df.schema("ts").dataType}")
    }
  }

  test("all three encodings yield bit-identical micros") {
    val micros = dirs.map { case (name, dir) =>
      val rows = Tables.events(spark, dir)
        .selectExpr("event_id", "unix_micros(ts) AS us")
        .orderBy("event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
      name -> rows
    }.toMap
    val expected = Seq(
      (1L, 1546300800000000L),
      (2L, 1546300800500000L),
      (3L, 1700000000123456L))
    for ((name, rows) <- micros)
      assert(rows == expected, s"$name diverged: $rows")
  }

  test("real fixture reads as TimestampType and survives unix_micros") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    // the exact consumer shape that crashed in r6 (q47/q51/q52)
    assert(df.selectExpr("unix_micros(ts)").limit(1).count() == 1L)
  }
}
