package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — the locality-preserving companion to
  * [[ZOrder]]: consecutive Hilbert indexes are ALWAYS grid neighbors
  * (Manhattan distance 1), where the Morton curve jumps across the
  * plane at every power-of-two boundary. That unit-step property (the
  * reason lakehouse clustering is moving Z-order → Hilbert) makes
  * every file's (x, y) envelope tighter for the same file size, so
  * min/max stats prune harder. Public technique: Hilbert 1891; the
  * xy→d bit algorithm is the classic per-level rotate/flip walk.
  *
  * Scale design mirrors ZOrder: the index is pure integer CASE/mask
  * arithmetic computed level by level through CHAINED PROJECTIONS
  * (one per level, each referencing the previous level's attributes —
  * never one exponentially self-referencing expression), so
  * whole-stage codegen emits a straight-line loop body; the oracle
  * replays the identical levels as chained CTEs. The layout half is
  * one `repartitionByRange` + local sort, exactly [[ZOrder.layoutByZ]].
  */
object Hilbert {

  /** Append `out` = Hilbert index of the pre-bucketed integer columns
    * (`xCol`, `yCol` in [0, 2^bits)) via one projection per level.
    * Uses reserved working columns `__hx/__hy/__hrx/__hry/__hnx`.
    */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    var cur = df.withColumn("__hx", xCol.cast("long"))
      .withColumn("__hy", yCol.cast("long"))
      .withColumn(out, lit(0L))
    var s = 1L << (bits - 1)
    while (s >= 1) {
      cur = cur
        .withColumn("__hrx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__hry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col("__hrx")).bitwiseXOR(col("__hry")))
        .withColumn("__hnx",
          when(col("__hry") === 0L,
            when(col("__hrx") === 1L, lit(s - 1L) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__hy",
          when(col("__hry") === 0L,
            when(col("__hrx") === 1L, lit(s - 1L) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__hnx"))
      s >>= 1
    }
    cur.drop("__hx", "__hy", "__hrx", "__hry", "__hnx")
  }

  /** The same per-level walk as chained SQL CTEs: the head CTE `hl_in`
    * must expose columns (…passthrough…, d, x, y) — returns the CTE
    * chain text whose final CTE `hl0` carries (…passthrough…, d). The
    * template hardcodes the functional `xor(a, b)` spelling, which
    * DuckDB accepts and Spark SQL does not (Spark spells it `a ^ b`) —
    * this emitter is DuckDB-oracle-only; the Spark side runs the
    * Column-based walk above.
    */
  def hilbertCtesSql(bits: Int, passthrough: Seq[String]): String = {
    require(bits >= 1 && bits <= 31)
    val pt = passthrough.mkString(", ")
    val levels = (bits - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == bits - 1) "hl_in" else s"hl${i + 1}"
      s"""hl$i AS (
        SELECT $pt,
               d + ${s * s} * xor(3 * rx, ry) AS d,
               CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END
                    ELSE x END AS x,
               CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END
                    ELSE y END AS y
        FROM (SELECT $pt, d, x, y,
                     CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
                     CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
              FROM $prev) t)"""
    }
    levels.mkString(",\n      ")
  }

  /** Cluster `df` along the Hilbert curve: one range shuffle into
    * `numPartitions` index ranges + a local sort — [[ZOrder.layoutByZ]]
    * with the tighter curve.
    */
  def layoutByH(df: DataFrame, xBucket: Column, yBucket: Column,
      bits: Int, numPartitions: Int): DataFrame =
    withHilbert(df, xBucket, yBucket, bits, "h_value")
      .repartitionByRange(numPartitions, col("h_value"))
      .sortWithinPartitions(col("h_value"))
}
