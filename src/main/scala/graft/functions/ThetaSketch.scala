package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Datasketches THETA sketches as native Catalyst aggregates — the
  * set-operation capability Spark's built-in HLL family lacks: HLL
  * unions (q48/q170) but can never INTERSECT, and "distinct users in
  * segment A ∩ B" is the audience-overlap question every cross-segment
  * report asks. Theta sketches (Dasgupta et al., the KMV/theta line)
  * keep a bounded sample of hashed keys below an adaptive threshold θ,
  * so union/intersection/difference all stay closed over sketches and
  * re-aggregate from persisted bytes — the q170 incremental-view shape
  * extended to the full set algebra.
  *
  * Follows Spark's own `HllSketchAgg` pattern exactly: a
  * [[TypedImperativeAggregate]] whose buffer is the live Union object
  * (serialized only at shuffle boundaries, ordinary partial
  * aggregation — map-side combine works), emitting compact sketch
  * bytes. Build from raw keys with [[ThetaSketchAgg]] (long/string
  * input), merge persisted sketch bytes with [[ThetaUnionAgg]], read
  * estimates with the scalar [[ThetaEstimate]] /
  * [[ThetaIntersectEstimate]] (CodegenFallback — they run on
  * rollup-sized rows, never in the hot path).
  *
  * Determinism: theta hashing is seeded (DEFAULT_UPDATE_SEED) and the
  * retained-key set is a pure function of the input SET, so estimates
  * are run-to-run and partition-order stable — but engine-specific
  * (murmur-based), so queries built on these are rows-only at the
  * oracle gate (the q48/q61/q170 sketch rule) with accuracy contracts
  * in ThetaSketchSpec/CatalogSmokeSpec instead.
  */
object ThetaSketch {

  /** Default log2(nominal entries): 4096 retained keys ≈ 1.6% RSE. */
  val DefaultLgK: Int = 12

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[graft] def wrap(bytes: Array[Byte]): Sketch =
    Sketch.wrap(Memory.wrap(bytes))

  import org.apache.spark.sql.graft.{shims => S}

  /** Aggregate a long or string key column into theta sketch bytes. */
  def sketchAgg(c: Column, lgK: Int = DefaultLgK): Column =
    S.column(ThetaSketchAgg(S.expression(c), lgK).toAggregateExpression())

  /** Merge a column of theta sketch bytes into one sketch. */
  def unionAgg(c: Column, lgK: Int = DefaultLgK): Column =
    S.column(ThetaUnionAgg(S.expression(c), lgK).toAggregateExpression())

  /** Distinct estimate of a sketch-bytes column. */
  def estimate(c: Column): Column =
    S.column(ThetaEstimate(S.expression(c)))

  /** Distinct estimate of the INTERSECTION of two sketch-bytes columns. */
  def intersectEstimate(a: Column, b: Column): Column =
    S.column(ThetaIntersectEstimate(S.expression(a), S.expression(b)))
}

/** `theta_sketch_agg`: build a theta sketch over long/string keys. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_theta_agg expects bigint or string input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null =>
      case v: Long => buffer.update(v)
      case s: UTF8String => buffer.update(s.toString)
      case other => throw new IllegalStateException(
        s"unexpected theta input ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK)
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg`: merge persisted theta sketch bytes (the
  * incremental re-aggregation path: day sketches → any window).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_union"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_theta_union expects binary sketch input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null =>
      case b: Array[Byte] => buffer.union(ThetaSketch.wrap(b))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK)
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(bytes)`: distinct estimate of a serialized sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_theta_estimate expects binary, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_estimate(a, b)`: distinct estimate of A ∩ B —
  * the operation the HLL family cannot perform at all.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == BinaryType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_theta_intersect expects (binary, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(ThetaSketch.wrap(a.asInstanceOf[Array[Byte]]))
    inter.intersect(ThetaSketch.wrap(b.asInstanceOf[Array[Byte]]))
    inter.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
