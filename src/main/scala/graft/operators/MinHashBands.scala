package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** MinHash LSH band keys computed PER ROW — no explode, no groupBy —
  * so the same arithmetic runs identically over a batch DataFrame and
  * a streaming one (a streaming pre-aggregation would add a second
  * stateful operator in front of the dedup state; per-row HOFs keep
  * the band computation stateless).
  *
  * Same construction as the batch q36 pipeline (word-3-gram shingles →
  * char polynomial hash → 16 affine permutations mod P → 4 bands × 4
  * rows), expressed as array HOFs over the per-doc shingle array:
  * mh_i = array_min(transform(tids, t -> (a_i·t + b_i) mod P)).
  *
  * CollapseProject invariant (see PipelineCatalog.shingleRows scaladoc):
  * two Exchange barriers protect the HOF chain — one between `split`
  * and the shingle lambda that reads `w` three times per element, one
  * between `tids` and the 16 band-row minima that each consume it.
  * Without them Catalyst collapses the projections and re-inlines the
  * upstream expression per reference (the O(n²) trap on the first, a
  * 16× hash recompute on the second). Repartition nodes work on both
  * batch and streaming plans.
  *
  * Sub-3-token docs have an empty shingle set: every permutation min is
  * null and concat_ws skips nulls, so their band key collapses to the
  * bare band index — they can only pair with other sub-3-token docs,
  * the correct degenerate behavior.
  *
  * The reference (hoigreen/project-bigdata-recsys) has no streaming
  * dedup — this is beyond-reference surface for continuous ingestion.
  */
object MinHashBands {

  val P: Long = 2147483647L

  /** (id, ts, band, band_key) — 4 rows per input row; the key embeds
    * the band index so keys never collide across bands.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String, tsCol: String,
      parallelism: Int): DataFrame = {
    val toks = df
      .select(col(idCol), col(tsCol), split(col(textCol), " ").as("w"))
      .repartition(parallelism, col(idCol))
    val tids = toks.select(col(idCol), col(tsCol),
      transform(
        array_distinct(when(size(col("w")) >= 3,
          transform(sequence(lit(0), size(col("w")) - 3),
            i => concat_ws(" ",
              element_at(col("w"), i + 1),
              element_at(col("w"), i + 2),
              element_at(col("w"), i + 3))))
          .otherwise(array().cast("array<string>"))),
        s => VectorExpressions.polyHash(s)).as("tids"))
    // second barrier: different partitioning expression so the Exchange
    // survives (a same-key repartition pair could collapse)
    val sigs = tids
      .repartition(parallelism, col(idCol), col(tsCol))
      .select(Seq(col(idCol), col(tsCol)) ++
        (0 to 15).map(i => mh(col("tids"), i).as(s"mh$i")): _*)
    sigs.select(col(idCol), col(tsCol),
      posexplode(array((0 to 3).map(b =>
        concat_ws("-", lit(b.toString),
          col(s"mh${4 * b}"), col(s"mh${4 * b + 1}"),
          col(s"mh${4 * b + 2}"), col(s"mh${4 * b + 3}"))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
  }

  /** The i-th affine permutation min over the tid array. */
  private def mh(tids: Column, i: Int): Column =
    array_min(transform(tids, t => (lit(2L * i + 1) * t + lit(12345L * i)) % lit(P)))
}
