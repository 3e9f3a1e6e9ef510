package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AsciiPolyHash, FloatDotProduct, ThetaEstimate, ThetaIntersectEstimate, ThetaSketchAgg, ThetaUnionAgg}
import graft.multimodal.{AudioHeaderMeta, ImageHeaderMeta}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * without the Scala Column API —
  *
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  *   spark.sql("SELECT graft_polyhash(text) ...")
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or by calling [[GraftExtensions.register]] on a live session.
  *
  * One semantics-preserving optimizer rule is injected —
  * [[LevenshteinBandRule]], which rewrites bounded `levenshtein`
  * predicates to the banded-DP thresholded kernel behind a free
  * length-band prefilter — and ONE planner strategy,
  * [[GroupTopKStrategy]], for the single relational shape stock
  * Catalyst cannot lower efficiently (per-group top-k without a full
  * per-group sort; see [[GroupTopK]]). Everything else lowers to stock
  * Catalyst operators on purpose (SURVEY.md §4 — Catalyst already
  * performs every other rewrite this workload can use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFn)
    ext.injectFunction(GraftExtensions.polyhashFn)
    ext.injectFunction(GraftExtensions.imageMetaFn)
    ext.injectFunction(GraftExtensions.audioMetaFn)
    ext.injectFunction(GraftExtensions.thetaAggFn)
    ext.injectFunction(GraftExtensions.thetaUnionFn)
    ext.injectFunction(GraftExtensions.thetaEstimateFn)
    ext.injectFunction(GraftExtensions.thetaIntersectFn)
    ext.injectFunction(GraftExtensions.acFn)
    ext.injectOptimizerRule(_ => LevenshteinBandRule)
    ext.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotFn: FnDesc = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot(array<float>, array<float>)")
      FloatDotProduct(args(0), args(1))
    })

  val polyhashFn: FnDesc = (
    FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[AsciiPolyHash].getName, "graft_polyhash"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_polyhash(string)")
      AsciiPolyHash(args(0))
    })

  val imageMetaFn: FnDesc = (
    FunctionIdentifier("graft_image_meta"),
    new ExpressionInfo(classOf[ImageHeaderMeta].getName, "graft_image_meta"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_image_meta(binary)")
      ImageHeaderMeta(args(0))
    })

  val audioMetaFn: FnDesc = (
    FunctionIdentifier("graft_audio_meta"),
    new ExpressionInfo(classOf[AudioHeaderMeta].getName, "graft_audio_meta"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_audio_meta(binary)")
      AudioHeaderMeta(args(0))
    })

  val thetaAggFn: FnDesc = (
    FunctionIdentifier("graft_theta_agg"),
    new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_theta_agg(bigint|string)")
      ThetaSketchAgg(args(0)).toAggregateExpression()
    })

  val thetaUnionFn: FnDesc = (
    FunctionIdentifier("graft_theta_union"),
    new ExpressionInfo(classOf[ThetaUnionAgg].getName, "graft_theta_union"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_theta_union(binary)")
      ThetaUnionAgg(args(0)).toAggregateExpression()
    })

  val thetaEstimateFn: FnDesc = (
    FunctionIdentifier("graft_theta_estimate"),
    new ExpressionInfo(classOf[ThetaEstimate].getName, "graft_theta_estimate"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_theta_estimate(binary)")
      ThetaEstimate(args(0))
    })

  val thetaIntersectFn: FnDesc = (
    FunctionIdentifier("graft_theta_intersect"),
    new ExpressionInfo(classOf[ThetaIntersectEstimate].getName, "graft_theta_intersect"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_theta_intersect(binary, binary)")
      ThetaIntersectEstimate(args(0), args(1))
    })

  val acFn: FnDesc = (
    FunctionIdentifier("graft_ac"),
    new ExpressionInfo(classOf[graft.functions.AhoCorasickCounts].getName,
      "graft_ac"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_ac(string, 'p1,p2,...')")
      require(args(1).foldable &&
        args(1).dataType == org.apache.spark.sql.types.StringType,
        "graft_ac: the pattern dictionary must be a string literal " +
          "(the automaton is built at plan time)")
      val pats = args(1).eval(null).toString
        .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      graft.functions.AhoCorasickCounts(args(0), pats)
    })

  /** Register on an already-built session (tests, REPL). Functions go
    * through the function registry; the optimizer rule rides
    * `experimental.extraOptimizations` (the live-session injection
    * point — `spark.sql.extensions` only applies at session build).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(dotFn, polyhashFn, imageMetaFn, audioMetaFn,
        thetaAggFn, thetaUnionFn, thetaEstimateFn, thetaIntersectFn,
        acFn).foreach {
      case (id, info, builder) =>
      org.apache.spark.sql.graft.shims.registerFunction(spark, id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBandRule
  }
}
