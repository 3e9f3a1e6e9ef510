package graft

import org.scalacheck.{Prop, Properties}

import graft.functions.TopKAggregator

/** [[TopKAggregator]] algebra: reduce/merge must agree with "sort desc,
  * take k" on arbitrary inputs and splits — that equivalence is exactly
  * what lets Spark run the partial aggregation on any partitioning.
  */
object TopKAggregatorSpec extends Properties("graft.topk") {

  private val agg = TopKAggregator(5)

  private def viaAgg(xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def expected(xs: Seq[Long]): Seq[Long] =
    xs.sorted(Ordering[Long].reverse).take(5)

  property("reduce folds to sort-desc-take-k, buffer bounded by k") =
    Prop.forAll { (xs: List[Long]) =>
      val b = viaAgg(xs)
      b == expected(xs) && b.length <= 5
    }

  property("merge of any split equals the unsplit fold") =
    Prop.forAll { (xs: List[Long], ys: List[Long]) =>
      agg.merge(viaAgg(xs), viaAgg(ys)) == expected(xs ++ ys)
    }

  property("duplicates kept as multiset members; finish deterministic") =
    Prop.all(
      viaAgg(Seq(7L, 7L, 7L, 1L, 9L, 7L)) == Seq(9L, 7L, 7L, 7L, 7L),
      agg.finish(viaAgg(Seq(3L, 1L, 2L))) == "3,2,1",
      agg.finish(agg.zero) == "")
}
