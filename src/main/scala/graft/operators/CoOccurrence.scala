package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J4 co-occurrence mining (the reference's course-pair knowledge base,
  * `train_module.py:397-405`) as a reusable operator with the skew
  * control SURVEY.md §7.4 risk 5 calls for.
  *
  * The self-join fan-out of a key with k items is k² pairs — one
  * power user (a crawler, a bot) with 10⁵ items would emit 10¹⁰ rows
  * at 100 TB. `maxItemsPerKey` bounds that: each key contributes at
  * most its k smallest items (deterministic, so reruns agree). Keys
  * under the cap are EXACT; capped keys degrade gracefully (their
  * rarest pairs drop first under the item ordering). Residual shuffle
  * skew within the join is AQE skew-split territory.
  */
object CoOccurrence {

  /** Distinct co-occurring item pairs per key with counts.
    *
    * @param maxItemsPerKey None = exact (q14 semantics); Some(k) =
    *   cap each key's contribution at its k smallest items.
    */
  def pairs(df: DataFrame, keyCol: String, itemCol: String,
      maxItemsPerKey: Option[Int] = None): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(itemCol).as("item")).distinct()
    val capped = maxItemsPerKey match {
      case None => base
      case Some(cap) =>
        val w = Window.partitionBy(col("k")).orderBy(col("item"))
        base.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i1"), col("b.item").as("i2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-N pairs by frequency — the knowledge-base cut the reference
    * keeps (`Counter.most_common(50)`, `run_consumer.py:247`).
    */
  def topPairs(df: DataFrame, keyCol: String, itemCol: String, n: Int,
      maxItemsPerKey: Option[Int] = None): DataFrame =
    pairs(df, keyCol, itemCol, maxItemsPerKey)
      .orderBy(col("cnt").desc, col("i1"), col("i2"))
      .limit(n)
}
