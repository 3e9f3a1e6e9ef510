package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern dictionary matching (Aho & Corasick
  * 1975) as a native Catalyst expression — ONE automaton pass per
  * document counts ALL occurrences of EVERY pattern (every start
  * position, overlapping included), where the per-pattern scan
  * (q174's `length - replace` form) re-reads the text once per
  * pattern and counts only non-overlapping hits. At a 100 TB corpus
  * with a production blocklist (10³–10⁵ phrases) the per-pattern form
  * is |patterns| passes over every byte; the automaton is one pass
  * total, state transitions bounded by text length (amortized O(1)
  * per char including fail-link walks — the classic analysis).
  *
  * The dictionary is FIXED at plan time (the expression carries it;
  * the automaton rebuilds lazily on each executor — goto trie, BFS
  * fail links, output lists merged through fail chains). Matching is
  * over UTF-16 chars of the string, deterministic on every engine.
  */
object AhoCorasick {

  /** Immutable-after-construction automaton. Serializable so the
    * expression can carry it, but marked transient at the use site —
    * rebuilding from the pattern list is cheap and deterministic.
    */
  final class Automaton(val patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "graft_ac: patterns must be non-empty strings")
    private val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val outs = mutable.ArrayBuffer[List[Int]](Nil)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = next(s).getOrElseUpdate(ch, {
          next += mutable.Map.empty[Char, Int]
          outs += Nil
          next.length - 1
        })
      }
      outs(s) = pi :: outs(s)
    }
    private val fail = new Array[Int](next.length)
    locally {
      val q = mutable.Queue.empty[Int]
      next(0).values.foreach { v => fail(v) = 0; q += v }
      while (q.nonEmpty) {
        val u = q.dequeue()
        // BFS order: fail(u) is shallower, so its outs are final
        outs(u) = outs(u) ::: outs(fail(u))
        next(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !next(f).contains(ch)) f = fail(f)
          fail(v) = next(f).getOrElse(ch, 0)
          q += v
        }
      }
    }

    /** Per-pattern occurrence counts over all start positions. */
    def counts(text: String): Array[Long] = {
      val c = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !next(s).contains(ch)) s = fail(s)
        s = next(s).getOrElse(ch, 0)
        var o = outs(s)
        while (o.nonEmpty) { c(o.head) += 1L; o = o.tail }
        i += 1
      }
      c
    }
  }

  /** Column wrapper: per-pattern occurrence counts as array<bigint>. */
  def countsCol(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.graft.shims.column(
      AhoCorasickCounts(
        org.apache.spark.sql.graft.shims.expression(text), patterns))
}

case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ac expects a string column, got ${child.dataType.simpleString}")
    else if (patterns.isEmpty || patterns.exists(_.isEmpty))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_ac expects a non-empty list of non-empty patterns")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val auto = new AhoCorasick.Automaton(patterns)

  /** Public so generated code can call it (the RegExpExtract
    * referenced-object pattern: the hot loop lives in compiled Scala,
    * the expression stays inside whole-stage codegen with no
    * interpreted-eval tree dispatch around it).
    */
  def runCounts(s: UTF8String): ArrayData =
    new GenericArrayData(auto.counts(s.toString))

  override protected def nullSafeEval(input: Any): Any =
    runCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftAc", this,
        classOf[AhoCorasickCounts].getName)
      s"${ev.value} = $ref.runCounts($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickCounts = copy(child = newChild)
}
