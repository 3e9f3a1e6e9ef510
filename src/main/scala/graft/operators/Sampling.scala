package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O7/O8 sampling operators.
  *
  * The reference splits train/validation with a label-stratified 80/20
  * (`core-logic/train_module.py:314-315`, sklearn `stratify=y`). Two
  * Spark-native formulations:
  *
  *  - [[stratified]]: `df.stat.sampleBy` — per-stratum Bernoulli with
  *    independent fractions, seeded. The right tool when fractions
  *    differ per stratum (class rebalancing, downsampling a dominant
  *    label). Expected-size, not exact-size.
  *  - [[stratifiedSplit]]: per-stratum row_number modulus — EXACT
  *    per-stratum ratios (±1 row), deterministic under retries, and
  *    both halves are true complements. This is the distributed
  *    equivalent of sklearn's stratified split: sort within stratum is
  *    a window over the stratum key, so the shuffle is one exchange on
  *    the stratum column regardless of data size.
  */
object Sampling {

  /** Per-stratum Bernoulli sample (`sampleBy`): strata absent from
    * `fractions` are dropped (fraction 0).
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[Any, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Exact-ratio stratified split: every k-th row (by `orderCol` rank)
    * within each stratum goes to the second return (the 1/k "test"
    * half). Deterministic — same inputs → same split, task retries
    * agree — PROVIDED the ordering is total within each stratum:
    * either `orderCol` is unique per stratum (a key) or `tiebreakCols`
    * extend it to uniqueness. Under ties with no tiebreak the per-
    * stratum COUNTS are still exact but row MEMBERSHIP of the halves
    * can differ across runs/engines (row_number assigns tied rows
    * arbitrarily).
    */
  def stratifiedSplit(df: DataFrame, strataCol: String, orderCol: String,
      k: Int, tiebreakCols: String*): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy((col(orderCol) +: tiebreakCols.map(col)): _*)
    val marked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__test", (col("__rn") % k) === 0)
    (marked.filter(!col("__test")).drop("__rn", "__test"),
      marked.filter(col("__test")).drop("__rn", "__test"))
  }
}
