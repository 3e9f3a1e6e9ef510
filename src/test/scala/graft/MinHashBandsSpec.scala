package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.MinHashBands

/** The per-row HOF band computation must agree exactly with the
  * explode+groupBy formulation the batch q36 pipeline uses — same
  * shingles, same polyhash, same 16 affine permutations, same 4-band
  * grouping — on real fixture documents.
  */
class MinHashBandsSpec extends SparkSpec {

  test("per-row band keys equal the explode+groupBy minhash formulation") {
    val P = MinHashBands.P
    val docs = Tables.documents(spark, sf0001).limit(50)
      .withColumn("ts", lit(new Timestamp(0L)))

    val got = MinHashBands.bandRows(docs, "doc_id", "text", "ts", 4)
      .select(col("doc_id"), col("band"), col("band_key"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap

    // reference formulation: explode distinct shingles, hash, min per
    // permutation in one groupBy (the q36 shape)
    val tids = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(4, col("doc_id"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(CASE WHEN size(w) >= 3 THEN
             transform(sequence(0, size(w)-3),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
           ELSE array() END)""")).as("shingle"))
      .withColumn("tid", graft.functions.VectorExpressions.polyHash(col("shingle")))
    val sigs = tids.groupBy(col("doc_id"))
      .agg(min(expr(s"(1*tid + 0) % $P")).as("mh0"),
        (1 to 15).map(i =>
          min(expr(s"((2*$i+1)*tid + ${12345 * i}) % $P")).as(s"mh$i")): _*)
      .collect().map(r => r.getLong(0) -> (0 to 15).map(i =>
        if (r.isNullAt(i + 1)) null else r.getLong(i + 1).toString)).toMap

    assert(sigs.nonEmpty)
    sigs.foreach { case (docId, mh) =>
      (0 to 3).foreach { b =>
        val expected = (Seq(b.toString) ++
          (0 to 3).map(j => mh(4 * b + j)).filter(_ != null)).mkString("-")
        assert(got((docId, b)) == expected,
          s"doc $docId band $b: got ${got((docId, b))} expected $expected")
      }
    }
    // docs with >= 3 tokens must have complete 5-part keys
    val complete = got.values.count(_.split("-").length == 5)
    assert(complete > got.size / 2)
  }
}
