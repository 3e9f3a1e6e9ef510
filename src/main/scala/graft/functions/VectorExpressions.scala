package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the
  * custom-Expression path SURVEY.md §2.10 calls for (vector arithmetic
  * over `array<float>` has no Spark builtin; the higher-order-function
  * composition `aggregate(zip_with(...))` is interpreted per-element
  * lambda evaluation, measured ~20× slower on the kNN cross join).
  *
  * Semantics contract (keeps DuckDB-oracle bit-parity): each float is
  * widened to double, products are accumulated strictly left-to-right —
  * exactly the sequential fold the oracle SQL (`list_reduce`) performs.
  * Nulls: null if either array is null (standard BinaryExpression
  * null-intolerance); lengths are truncated to the shorter side.
  *
  * Participates in whole-stage codegen via doGenCode (a tight primitive
  * loop, no boxing, no lambda dispatch).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Mixed-precision dot product: `array<float>` × `array<double>` —
  * the hyperplane-projection kernel (embeddings stay float at rest,
  * plane coefficients are exact doubles). Same contract as
  * [[FloatDotProduct]]: widen-then-multiply, strict left-to-right
  * accumulation, codegen'd primitive loop.
  */
case class FloatDoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot_fd expects (array<float>, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd polynomial rolling hash over an ASCII string:
  * `acc = (acc*31 + byte) % (2^31-1)` left-to-right — byte-for-byte the
  * fold the DuckDB oracle computes with
  * `list_reduce(string_split_regex(s,''), ascii, ...)`. ASCII-only by
  * contract (for multi-byte codepoints ascii() and the byte loop
  * diverge; fixture text is ASCII). Replaces an interpreted
  * `aggregate(transform(split(s,'')))` HOF chain that dominated the
  * minhash pipeline (per-char lambda dispatch on millions of rows).
  */
case class AsciiPolyHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private final val P = 2147483647L

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % P
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiPolyHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): AsciiPolyHash =
    copy(child = newChild)
}

object AsciiPolyHash {
  /** Shared kernel for both interpreted and generated paths. */
  def hash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 2147483647L
      i += 1
    }
    acc
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graft.{shims => S}

  /** Column API: ASCII polynomial rolling hash of a string column. */
  def polyHash(c: Column): Column =
    S.column(AsciiPolyHash(S.expression(c)))

  /** Dot of a float-array column against a double-array column. */
  def dotFD(a: Column, b: Column): Column =
    S.column(FloatDoubleDotProduct(S.expression(a), S.expression(b)))

  /** Column API: dot product of two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    S.column(FloatDotProduct(S.expression(a), S.expression(b)))

  /** L2 norm via the same kernel (sqrt of self-dot). */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}
