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

  /** Fixture-shaped synthetic `documents` at arbitrary scale — the
    * round-6 10× empirical scale check's generator (driver fixtures
    * stop at sf0.1). Matches the driver fixture's distributions: the
    * same 31-word vocabulary, 8–100 tokens/doc, 5 langs, 20 sources —
    * plus engineered duplicate structure so the dedup families have
    * real work: every 50th doc is a ONE-TOKEN MUTATION of its
    * predecessor (near-dup, survives Jaccard ≥ 0.8 at fixture token
    * counts) and every 250th an EXACT copy. Fully distributed and
    * seed-deterministic: token t of doc d is
    * `vocab[xxhash64(g, i, seed) mod 31]` where g is the doc's
    * canonical generator id — a column program, no driver-side data.
    *
    * `extraVocab` appends that many synthetic words ("w000"…) to the
    * base 31 — the realistic-scaling knob: a real corpus's vocabulary
    * grows with its size (Heaps' law), which keeps per-shingle document
    * frequency roughly CONSTANT as the corpus grows, so the near-dup
    * families' Σdf² candidate bound scales linearly. Holding the vocab
    * fixed while scaling docs instead densifies df ∝ scale and the
    * bound quadratically — the round-6 sweep measured exactly that
    * (q35: 3.4 s at sf0.1 → 196 s at a fixed-vocab 10×), which is the
    * fixture saturating, not the operator: the Σdf² contract is doing
    * precisely what it says.
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
      extraVocab: Int = 0): DataFrame = {
    val base = Seq("spark", "table", "join", "value", "query", "scan", "sort",
      "hash", "agg", "group", "filter", "column", "row", "batch", "stream",
      "key", "index", "merge", "shuffle", "stage", "task", "plan", "cost",
      "stats", "line", "order", "part", "customer", "fast", "slow", "small")
    require(base.size == 31)
    val vocab = base ++ (0 until extraVocab).map(i => f"w$i%03d")
    val vocabSql = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    val v = vocab.size
    spark.range(n)
      .withColumn("is_exact", col("id") % 250 === 249)
      .withColumn("is_near", !col("is_exact") && col("id") % 50 === 49)
      // canonical generator id: copies/mutants derive from predecessor
      .withColumn("g", when(col("is_exact") || col("is_near"), col("id") - 1)
        .otherwise(col("id")))
      .withColumn("len", (lit(8) + pmod(xxhash64(col("g"), lit(seed)), lit(93)))
        .cast("int"))
      .withColumn("toks", expr(
        s"transform(sequence(0, len - 1), i -> " +
          s"element_at($vocabSql, " +
          s"cast(pmod(xxhash64(g, i, $seed), $v) + 1 as int)))"))
      // near-dup mutation: overwrite position 0 with a token derived
      // from the MUTANT's own id (still vocab, usually different)
      .withColumn("toks", when(col("is_near"), expr(
        s"concat(array(element_at($vocabSql, " +
          s"cast(pmod(xxhash64(id, $seed + 7), $v) + 1 as int))), " +
          "slice(toks, 2, len - 1))")).otherwise(col("toks")))
      .withColumn("text", concat_ws(" ", col("toks")))
      .select(col("id").as("doc_id"), col("text"),
        element_at(array(Seq("en", "de", "fr", "es", "zh").map(lit): _*),
          (pmod(xxhash64(col("id"), lit(seed + 1)), lit(5)) + 1).cast("int"))
          .as("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(seed + 2)), lit(20)))
          .as("source"),
        length(col("text")).cast("bigint").as("n_chars"))
  }

  /** Fixture-shaped synthetic `embeddings`: 64-dim float vectors, 10
    * labels, seed-deterministic via the same xxhash64 column program.
    * ISOTROPIC by design — the driver fixture's vectors are label-
    * independent noise (measured same-label mean cosine ≈ 0.001), and
    * a first-draft cluster-centered variant (same-label cos 0.94)
    * collapsed every same-label vector into one hyperplane-LSH bucket
    * and blew q40's Σbucket² bound up 100× in the round-6 scale sweep:
    * bucketed-ANN cost is a DATA-GEOMETRY property, so the generator
    * must match the fixture's geometry to extrapolate its cost.
    * Values ~U(-0.5, 0.5), matching the fixture's per-dim spread.
    */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64,
      seed: Long = 42L): DataFrame =
    spark.range(n)
      .withColumn("label", pmod(xxhash64(col("id"), lit(seed)), lit(10)).cast("int"))
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), d -> cast(" +
          s"(pmod(xxhash64(id, d, $seed + 2), 1000) - 500) / 1000.0 as float))"))
      .select(col("id").as("vec_id"), col("embedding"), col("label"))

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
