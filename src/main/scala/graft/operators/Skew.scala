package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew controls (SURVEY.md §2 scale notes: "salting for
  * skew"). AQE's skew-join splitting handles most runtime skew; these
  * are the semantic-level tools for when the *keys themselves* are
  * pathological (one key = 10% of a 100 TB table).
  */
object Skew {

  /** Two-stage salted aggregation: spread each group over `salts`
    * sub-groups for the partial aggregate, then combine partials.
    * Correct for any commutative re-aggregable pair (sum/sum,
    * count→sum, min/min, max/max). The hot key's rows now hash to
    * `salts` different reducers instead of one.
    *
    * @param partials  stage-1 aggregates over the salted key
    * @param combines  stage-2 re-aggregation of the stage-1 columns
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
      partials: Seq[Column], combines: Seq[Column]): DataFrame =
    // salt from ROW CONTENT, not partition/row position: a task retry
    // re-derives the same salt, so stage-1 partials are stable under
    // speculative execution. Exact duplicate rows share a salt, but
    // map-side partial aggregation collapses them to one row per input
    // partition before the shuffle, so a duplicate-heavy hot key still
    // can't recreate the straggler. (saltedJoin below has no such
    // combine — pass its distinctCols for duplicate-heavy hot keys.)
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(combines.head, combines.tail: _*)

  /** Salted broadcast-side replication join: for a skewed fact joining
    * a small dim, salt the fact key with `salts` variants and explode
    * the dim to all variants — every fact row of the hot key lands on
    * a different partition, each still finding its dim row. (With a
    * broadcast dim Spark needs no salt; this is the pattern for when
    * the dim is too big to broadcast but small enough to replicate
    * `salts`×.)
    *
    * The salt derives from row content (retry-stable), so spreading
    * requires the salt basis to DISTINGUISH a hot key's rows: pass
    * `distinctCols` naming columns that vary across them (an id, a
    * timestamp). The all-columns default spreads only when full rows
    * differ — byte-identical duplicates of a hot key collapse to one
    * salt, and unlike [[saltedAgg]] there is no map-side combine to
    * absorb them, so the straggler returns. Map-typed columns can't
    * be hashed (rejected eagerly here; Spark would fail at analysis).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      distinctCols: Seq[String] = Nil): DataFrame = {
    val basis = if (distinctCols.nonEmpty) key +: distinctCols
                else fact.columns.toSeq
    val mapTyped = basis.filter(c => fact.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.MapType])
    require(mapTyped.isEmpty,
      s"saltedJoin salt basis has unhashable map-typed columns " +
        s"${mapTyped.mkString(", ")}; pass distinctCols excluding them")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(basis.map(col): _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
