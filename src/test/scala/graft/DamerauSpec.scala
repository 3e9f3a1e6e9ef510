package graft

import org.apache.spark.sql.functions._

import graft.functions.Damerau

/** Unrestricted Damerau–Levenshtein (Lowrance–Wagner): canonical
  * examples, the OSA-divergence case, metric laws on random strings,
  * the ≤-Levenshtein dominance, and codegen/interpreted parity. The
  * cross-engine parity against DuckDB's native damerau_levenshtein is
  * the q262 oracle gate itself.
  */
class DamerauSpec extends SparkSpec {

  import spark.implicits._

  test("canonical cases") {
    assert(Damerau.distance("", "") === 0)
    assert(Damerau.distance("abc", "") === 3)
    assert(Damerau.distance("", "abc") === 3)
    assert(Damerau.distance("abc", "abc") === 0)
    assert(Damerau.distance("abcd", "acbd") === 1) // one transposition
    assert(Damerau.distance("kitten", "sitting") === 3)
    // UNRESTRICTED vs OSA divergence: ca -> ac -> abc is 2 edits when
    // the transposed block may be edited again; OSA would say 3
    assert(Damerau.distance("ca", "abc") === 2)
    assert(Damerau.distance("a cat", "an act") === 2)
  }

  private def randomWord(r: scala.util.Random, maxLen: Int): String =
    Array.fill(r.nextInt(maxLen + 1))(('a' + r.nextInt(4)).toChar).mkString

  test("metric laws on random small-alphabet strings") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 3000) {
      val (a, b, c) = (randomWord(r, 8), randomWord(r, 8), randomWord(r, 8))
      val (ab, ba) = (Damerau.distance(a, b), Damerau.distance(b, a))
      assert(ab === ba, s"symmetry broke on ($a, $b)")
      assert(Damerau.distance(a, a) === 0)
      assert((ab == 0) === (a == b), s"identity broke on ($a, $b)")
      // triangle inequality holds for the UNRESTRICTED metric (OSA
      // violates it — e.g. ca/ac/abc — so this pins the variant too)
      assert(ab <= Damerau.distance(a, c) + Damerau.distance(c, b),
        s"triangle broke on ($a, $b, $c)")
    }
  }

  test("dominated by plain Levenshtein, never by more than the " +
      "transposition savings") {
    val r = new scala.util.Random(7)
    val rows = Seq.fill(500)((randomWord(r, 10), randomWord(r, 10))).toDF("a", "b")
    val bad = rows
      .withColumn("dl", Damerau.damerau(col("a"), col("b")))
      .withColumn("lev", levenshtein(col("a"), col("b")))
      .filter(col("dl") > col("lev") ||
        col("dl") * 2 < col("lev")) // each transposition saves at most 1 of 2
      .count()
    assert(bad === 0L)
  }

  test("supplementary-plane characters count as ONE unit (code points, " +
      "not UTF-16 chars — DuckDB's native function compares code points)") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 chars
    val face = new String(Character.toChars(0x1F600)) // 😀
    assert(Damerau.distance(clef, "") === 1)
    assert(Damerau.distance(clef, clef) === 0)
    assert(Damerau.distance(clef + "a", "a" + clef) === 1) // one transposition
    assert(Damerau.distance(clef, face) === 1) // one substitution
    assert(Damerau.distance("x" + clef + "y", "xy") === 1)
  }

  test("codegen path agrees with the direct kernel") {
    val pairs = Seq(("abcd", "acbd"), ("ca", "abc"), ("", "xy"),
      ("transpose", "tranpsose"))
    val got = pairs.toDF("a", "b")
      .select(Damerau.damerau(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (a, b) => Damerau.distance(a, b).toLong })
  }
}
