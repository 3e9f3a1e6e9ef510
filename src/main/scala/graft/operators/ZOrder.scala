package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve data layout — the multi-dimensional clustering
  * trick lakehouse writers use so that min/max file statistics prune
  * scans on EITHER clustered dimension (a plain sort prunes only its
  * leading column). Public technique: Morton 1966; used by every
  * data-skipping layer built on parquet row-group stats.
  *
  * Scale design: `zValue` is pure integer bit arithmetic (shifts, masks,
  * adds) — whole-stage-codegen folds it into the projection, no UDF.
  * `layoutByZ` is ONE range-shuffle (`repartitionByRange` samples the
  * z-value distribution, so skewed dimensions still balance) plus a
  * partition-local sort — exactly what a 100 TB rewrite job can afford,
  * and the local sort makes every output file's (x, y) envelope tight
  * so row-group stats actually prune.
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of `x` and `y`
    * (x takes the even output positions, y the odd). Callers bucket
    * raw columns into [0, 2^bits) first. Unrolled arithmetic — the
    * same fixed expression is replayable as ANSI SQL by any engine.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same Morton code as an ANSI SQL expression string (for oracle
    * replay / pushdown into engines that take SQL).
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
  }

  /** Cluster `df` along the Z-curve of two pre-bucketed integer columns:
    * one range shuffle into `numPartitions` z-ranges, then a local sort
    * so every partition (→ output file) covers a contiguous z-interval.
    * Distinct partitions get disjoint z-ranges — that disjointness is
    * what file-stat pruning needs, and ZOrderSpec asserts it.
    */
  def layoutByZ(df: DataFrame, xBucket: Column, yBucket: Column,
      bits: Int, numPartitions: Int): DataFrame = {
    val z = zValue(xBucket, yBucket, bits).as("z_value")
    df.withColumn("z_value", z)
      .repartitionByRange(numPartitions, col("z_value"))
      .sortWithinPartitions(col("z_value"))
  }
}
