package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S18/S19: synthetic data generation and mutation — the reference's
  * `scripts/add_synthetic_data.py` / `scripts/modify_training_data.py`
  * re-expressed as seeded, fully distributed `spark.range` + `rand`
  * column programs (the reference loops row-by-row in Python and
  * UPDATEs per PK — neither survives 100 TB).
  */
object Synthetic {

  /** S18: n synthetic interactions over `users × items` with an
    * engagement-tier-correlated label (`add_synthetic_data.py:29-150`):
    * tier ~ U(0,1) drives both the action counters and the pass
    * probability, giving the classifier signal to find.
    */
  def interactions(spark: SparkSession, n: Long, nUsers: Int, nItems: Int,
      seed: Long = 42L): DataFrame =
    spark.range(n)
      .withColumn("user_id", (rand(seed) * nUsers).cast("long"))
      .withColumn("item_id", (rand(seed + 1) * nItems).cast("long"))
      .withColumn("tier", rand(seed + 2))
      .withColumn("n_click", floor(col("tier") * 20 + rand(seed + 3) * 5).cast("long"))
      .withColumn("n_view", floor(col("tier") * 40 + rand(seed + 4) * 10).cast("long"))
      .withColumn("truth",
        when(rand(seed + 5) < col("tier") * 0.8, 0).otherwise(1))
      .withColumn("event_ts", (lit(1700000000L) + (col("id") % 86400)).cast("long"))
      .drop("tier")

  /** S19: noise-inject counters (multiplicative U(1-amp, 1+amp), clamped
    * at 0 — `modify_training_data.py:78-81` F13) and flip labels with
    * probability `flipP` (F17, `:64-67`) on a seeded sample of rows.
    */
  def mutate(df: DataFrame, counterCols: Seq[String], sampleFrac: Double,
      noiseAmp: Double, flipP: Double, seed: Long = 42L): DataFrame = {
    val marked = df.withColumn("__m", rand(seed) < sampleFrac)
    val noised = counterCols.zipWithIndex.foldLeft(marked) { case (d, (c, i)) =>
      d.withColumn(c,
        when(col("__m"),
          greatest(lit(0L),
            floor(col(c) * (lit(1.0 - noiseAmp) + rand(seed + 10 + i) * 2 * noiseAmp))
              .cast("long")))
          .otherwise(col(c)))
    }
    noised.withColumn("truth",
      when(col("__m") && rand(seed + 99) < flipP, lit(1) - col("truth"))
        .otherwise(col("truth")))
      .drop("__m")
  }
}
