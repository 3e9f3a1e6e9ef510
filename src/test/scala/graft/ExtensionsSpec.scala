package graft

import graft.plans.GraftExtensions

/** SQL-surface access to the custom Catalyst expressions. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot and graft_polyhash are callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
                          array(cast(3.0 as float), cast(4.0 as float))) AS d,
                graft_polyhash('abc') AS h""").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 96354L) // = ((0*31+97)*31+98)*31+99 mod 2^31-1
  }

  test("graft_dot type-checks its arguments") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").head()
    }
    assert(e.getMessage.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("graft_image_meta and graft_audio_meta are callable from spark.sql") {
    GraftExtensions.register(spark)
    // 1x1 RGBA PNG header; 8 kHz mono μ-law AU header — via hex literals
    val r = spark.sql(
      """SELECT graft_image_meta(unhex(
               '89504E470D0A1A0A0000000D494844520000000100000001080600000000')) AS i,
              graft_audio_meta(unhex(
               '2E736E6400000018FFFFFFFF0000000100001F4000000001')) AS a""").head()
    val i = r.getStruct(0)
    assert(i.getString(0) == "png" && i.getInt(1) == 1 &&
      i.getInt(2) == 1 && i.getInt(3) == 4)
    val a = r.getStruct(1)
    assert(a.getString(0) == "au" && a.getInt(1) == 8000 &&
      a.getInt(2) == 1 && a.getInt(3) == 8)
  }

  test("registered via spark.sql.extensions config on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // note: getOrCreate may return the existing session; register makes
    // the assertion independent of session reuse
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_polyhash('a') AS h").head().getLong(0) == 97L)
  }
}
