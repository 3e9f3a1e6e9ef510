package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a codegen Catalyst expression —
  * the entity-resolution scorer q89's levenshtein rule can't express
  * (JW rewards shared prefixes and tolerates transpositions, the
  * person/product-name error model; Winkler 1990). Spark has no
  * built-in; DuckDB ships `jaro_winkler_similarity`, which is exactly
  * what makes this cross-engine checkable: the q255 oracle calls
  * DuckDB's NATIVE function against this implementation and the
  * doubles ship RAW, because the arithmetic below replicates the
  * canonical operation sequence bit for bit — verified empirically
  * over every fixture name pair (2016 pairs, max |Δ| = 0) and an
  * adversarial edge-case battery (odd transposition counts, boost
  * boundary, empty/equal strings) before the contract was committed.
  *
  * Semantics pinned to DuckDB's:
  *  - either side empty → 0.0 (even when BOTH are empty);
  *  - match window `max(l1,l2)/2 − 1` (floored, never negative);
  *  - transpositions = half the mismatched matched positions,
  *    INTEGER-floored;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in that order;
  *  - Winkler boost only when jaro > 0.7: `j + pl·0.1·(1−j)` with the
  *    common prefix capped at 4.
  *
  * Strings are decoded to UNICODE CODE POINTS before comparison (not
  * UTF-16 chars): DuckDB's native jaro_winkler_similarity compares
  * code points, and a supplementary-plane character iterated as two
  * chars would change lengths, the match window and the prefix count
  * — a cross-engine divergence. Codegen is a static call (the
  * AsciiPolyHash pattern) so blocked entity-resolution joins keep
  * whole-stage codegen.
  */
object JaroWinkler {

  def similarity(s1: String, s2: String): Double = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && b(j) == a(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var pl = 0
      val pmax = math.min(math.min(l1, l2), 4)
      while (pl < pmax && a(pl) == b(pl)) pl += 1
      jaro + pl * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Entry point shared by the interpreted and generated paths. */
  def sim(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(JaroWinklerSim(S.expression(a), S.expression(b)))
  }
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
