package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau–Levenshtein distance (Lowrance & Wagner 1975)
  * as a codegen Catalyst expression — edit distance whose fourth
  * operation is transposition of two ADJACENT characters, the
  * dominant human typing error (Damerau 1964 measured ~80% of
  * misspellings as one of the four ops). Spark ships only plain
  * `levenshtein`; DuckDB ships a native `damerau_levenshtein`, which
  * makes this cross-engine checkable the q255 way: two independent
  * implementations of the published algorithm, integer-exact by
  * construction (no float ever forms).
  *
  * This is the UNRESTRICTED metric, not the simpler
  * optimal-string-alignment (OSA) variant: a transposed block may be
  * edited again later, so d("ca","abc") = 2 (ca→ac→abc) where OSA
  * gives 3 — DuckDB returns 2, which pins which variant its native
  * function implements (verified before the contract was committed).
  * Unrestricted DL is a true metric (triangle inequality holds; OSA
  * violates it), so it is safe inside blocking/clustering rules.
  *
  * The Lowrance–Wagner DP keeps, beside the usual (m+2)×(n+2) table,
  * the last row where each alphabet symbol occurred (`da`) and the
  * last matching column in the current row (`db`); the transposition
  * candidate is d[k−1][l−1] + (i−k−1) + 1 + (j−l−1) for k = da(b_j),
  * l = db. O(m·n) time, O(m·n) space — name-sized strings, evaluated
  * inside whole-stage codegen via a static call (the AsciiPolyHash
  * pattern). The strings are decoded to UNICODE CODE POINTS first
  * (not UTF-16 chars): DuckDB's native damerau_levenshtein compares
  * code points, and a supplementary-plane character iterated as two
  * chars would count as two units here — a cross-engine divergence.
  */
object Damerau {

  def distance(s1: String, s2: String): Int = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    // d is (m+2) x (n+2), offset by +1 so d(0)(0) = inf border
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= n) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k: Int = { val v = da.get(b(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1)
  }

  /** Entry point shared by the interpreted and generated paths. */
  def dist(a: UTF8String, b: UTF8String): Long =
    distance(a.toString, b.toString).toLong

  def damerau(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(DamerauDistance(S.expression(a), S.expression(b)))
  }
}

case class DamerauDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_damerau expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Damerau.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Damerau.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauDistance =
    copy(left = newLeft, right = newRight)
}
