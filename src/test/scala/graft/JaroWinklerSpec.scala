package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.JaroWinkler.similarity

/** Pins the Jaro–Winkler scorer to the published algorithm's canonical
  * examples and its structural laws, plus the codegen path. The
  * cross-engine bit-parity with DuckDB's native function is enforced
  * by the q255 oracle gate; these tests pin the semantics that gate
  * can't see (symmetry, bounds, boost behavior on arbitrary inputs).
  */
class JaroWinklerSpec extends SparkSpec {

  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-12

  test("canonical worked examples (Winkler 1990 / textbook values)") {
    assert(close(similarity("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(similarity("DWAYNE", "DUANE"), 0.8400000000000001))
    assert(close(similarity("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(similarity("same", "same") == 1.0)
    assert(similarity("fly", "ant") == 0.0)
  }

  test("DuckDB-pinned edge semantics: emptiness beats equality") {
    assert(similarity("", "") == 0.0)
    assert(similarity("", "x") == 0.0)
    assert(similarity("x", "") == 0.0)
    assert(similarity("x", "y") == 0.0)
    assert(similarity("x", "x") == 1.0)
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // jaro = 2/3 here (4 of 8 match): below threshold -> NO boost,
    // even though the common prefix is 4
    assert(close(similarity("abcdefgh", "abcdwxyz"), 2.0 / 3.0))
    // 6 of 8 match -> jaro = 5/6 > 0.7; shared prefix is 6 but the
    // boost uses the CAP: jw = 5/6 + 4*0.1*(1 - 5/6) = 0.9 exactly
    assert(close(similarity("abcdefgh", "abcdefxy"), 0.9))
    // length-2 transposition: match window 0 -> no matches at all
    assert(similarity("ab", "ba") == 0.0)
  }

  test("structural laws on random ASCII strings (seeded sweep)") {
    val rnd = new Random(42)
    def str() = (0 until rnd.nextInt(9)).map(_ =>
      ('a' + rnd.nextInt(6)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (str(), str())
      val j = similarity(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(close(j, similarity(b, a)), s"symmetry on ($a, $b)")
      if (a.nonEmpty && a == b) assert(j == 1.0)
      if (a.nonEmpty && b.nonEmpty && a.intersect(b).isEmpty) assert(j == 0.0)
    }
  }

  test("supplementary-plane characters are ONE code point each (DuckDB " +
      "compares code points; UTF-16 chars would change lengths/windows)") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 chars
    val face = new String(Character.toChars(0x1F600)) // 😀
    assert(similarity(clef, clef) == 1.0)
    assert(similarity(clef, face) == 0.0) // 1-vs-1 code point, no match
    // as a 1-code-point prefix the boost counts it once:
    // both length 4 here; chars would make them length 5 with md=1
    val (a, b) = (clef + "abc", clef + "abd")
    // m=3, jaro=(3/4+3/4+3/3)/3=5/6; pl=3 -> 5/6 + 0.3*(1/6) = 0.8833...
    assert(close(similarity(a, b), 5.0 / 6.0 + 0.3 * (1.0 / 6.0)))
  }

  test("jaroWinkler column decodes distributively inside codegen") {
    import spark.implicits._
    val out = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
        ("x", null.asInstanceOf[String]))
      .toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(close(out(0).get, 0.9611111111111111))
    assert(close(out(1).get, 0.8400000000000001))
    assert(out(2).isEmpty, "null propagates")
  }
}
