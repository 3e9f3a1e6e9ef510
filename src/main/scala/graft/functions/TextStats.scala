package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document repetition statistics (Gopher §A1.1 family)
  * over a token array: total tokens, most-frequent-unigram count, tokens
  * covered by duplicated unigrams, and the same pair for word-2-grams —
  * all in ONE map-side evaluation.
  *
  * This replaces q66's explode → groupBy(doc, kind, gram) → groupBy(doc)
  * chain: per-doc gram counts need no cross-row state, so shuffling
  * every token of every document (the old plan's first Exchange moved
  * the whole tokenized corpus) was pure overhead — at 100 TB that
  * Exchange IS the corpus. Here the count-distinct-runs work happens
  * inside the scan stage: copy the row's tokens, sort (binary UTF8
  * order — only equality runs matter), one run-length pass; build the
  * bigram array and do the same. O(n log n) per doc, zero shuffle,
  * stays inside whole-stage codegen (static call, no lambda dispatch —
  * the `aggregate`/`transform` HOF formulation is interpreted
  * per-element and CollapseProject-hazardous per the shingleRows
  * scaladoc).
  *
  * Emitted as exact integer sufficient statistics (callers derive the
  * Gopher fractions), matching the DuckDB oracle bit-for-bit: counts
  * are integers, no float path. Null array → null row (mirrors the
  * oracle's unnest dropping null-text docs). Null elements (never
  * produced by split, handled defensively) count as empty strings.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.statsType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val statsType: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top_tok_cnt", LongType, nullable = false),
    StructField("dup_tok_cnt", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("dup_bigram_cnt", LongType, nullable = false)))

  /** (max run length, Σ runs ≥ 2) over a sorted gram array, in place. */
  private def runStats(grams: Array[UTF8String]): (Long, Long) = {
    if (grams.isEmpty) return (0L, 0L)
    java.util.Arrays.sort(grams.asInstanceOf[Array[Object]])
    var mx = 0L; var dup = 0L; var run = 1L
    var i = 1
    while (i < grams.length) {
      if (grams(i).equals(grams(i - 1))) run += 1
      else {
        if (run > mx) mx = run
        if (run >= 2) dup += run
        run = 1
      }
      i += 1
    }
    if (run > mx) mx = run
    if (run >= 2) dup += run
    (mx, dup)
  }

  private val SP = UTF8String.fromString(" ")

  /** Shared kernel for interpreted and generated paths. */
  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val bigrams = new Array[UTF8String](math.max(n - 1, 0))
    i = 0
    while (i < n - 1) {
      bigrams(i) = UTF8String.concatWs(SP, toks(i), toks(i + 1))
      i += 1
    }
    val (topTok, dupTok) = runStats(toks) // sorts toks — build bigrams first
    val (topBi, dupBi) = runStats(bigrams)
    new GenericInternalRow(Array[Any](n.toLong, topTok, dupTok, topBi, dupBi))
  }

  import org.apache.spark.sql.graft.{shims => S}

  /** Column API: repetition stats of an `array<string>` token column. */
  def repetitionStats(c: Column): Column =
    S.column(RepetitionStats(S.expression(c)))
}
