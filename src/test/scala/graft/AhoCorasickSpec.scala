package graft

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick

/** Aho–Corasick multi-pattern counts: hand-computed occurrences
  * (overlapping included), fail-link correctness on nested patterns,
  * codegen == interpreted parity, and null handling.
  */
class AhoCorasickSpec extends SparkSpec {

  import spark.implicits._

  private def run(patterns: Seq[String], texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(AhoCorasick.countsCol(col("t"), patterns).as("c"))
      .collect().toSeq.map(_.getSeq[Long](0).toSeq)

  test("hand-computed counts: every start position, overlapping included") {
    // "aa" in "aaaa" -> starts 0,1,2 = 3 (replace-based counting says 2)
    assert(run(Seq("aa"), Seq("aaaa")) === Seq(Seq(3L)))
    // nested dictionary: "he", "she", "his", "hers" over "ushers"
    // (the canonical Aho-Corasick example: she@1, he@2, hers@2)
    assert(run(Seq("he", "she", "his", "hers"), Seq("ushers")) ===
      Seq(Seq(1L, 1L, 0L, 1L)))
    // a pattern that is a suffix of another still fires through the
    // fail chain: "abcd" contains "bc" and "abcd"
    assert(run(Seq("abcd", "bc"), Seq("xabcdy")) === Seq(Seq(1L, 1L)))
    // no match, and matches at both ends
    assert(run(Seq("xy"), Seq("xyaxy")) === Seq(Seq(2L)))
    assert(run(Seq("zz"), Seq("abc")) === Seq(Seq(0L)))
  }

  test("one automaton pass equals |patterns| independent scans") {
    val patterns = Seq("slow", "batch batch", "the", "ke")
    val texts = Seq(
      "the slow batch batch batch runs over the keyspace",
      "keke the the the", "", "slowslow")
    val got = run(patterns, texts)
    // independent truth: count all start positions per pattern
    def scan(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    val want = texts.map(t => patterns.map(p => scan(t, p)))
    assert(got === want)
  }

  test("SQL surface: graft_ac with a literal dictionary") {
    graft.plans.GraftExtensions.register(spark)
    Seq("ushers").toDF("t").createOrReplaceTempView("ac_t")
    val got = spark.sql(
      "SELECT graft_ac(t, 'he,she,his,hers') AS c FROM ac_t")
      .head().getSeq[Long](0).toSeq
    assert(got === Seq(1L, 1L, 0L, 1L))
    // non-literal dictionary is refused at plan time
    intercept[Exception] {
      spark.sql("SELECT graft_ac(t, t) FROM ac_t").collect()
    }
  }

  test("codegen and interpreted paths agree; null text yields null") {
    val patterns = Seq("ab", "ba")
    val df = Seq(Some("ababab"), None).toDF("t")
      .select(col("t"), AhoCorasick.countsCol(col("t"), patterns).as("c"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](1) === Seq(3L, 2L))
    assert(rows(1).isNullAt(1))
    // force the interpreted path via eval on a literal and compare
    val e = graft.functions.AhoCorasickCounts(
      org.apache.spark.sql.catalyst.expressions.Literal("ababab"), patterns)
    assert(e.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq ===
      Seq(3L, 2L))
  }
}
