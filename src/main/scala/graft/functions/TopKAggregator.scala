package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k VALUES per group as a typed [[Aggregator]] — the
  * bounded-state alternative to `collect_list` + sort: partial state is
  * a sorted list of AT MOST k elements, `reduce` is one bounded insert,
  * `merge` a bounded sorted-merge, so the map-side combine ships O(k)
  * bytes per group regardless of group size. `sort_array(collect_list)`
  * materializes the whole group on one task first — the difference
  * between O(k) and O(|group|) state is what makes a per-key top-k
  * survive a billion-row hot key at 100 TB.
  *
  * Output is the values joined `desc` with ',' — a deterministic string
  * even under ties, because only VALUES (not row identities) are kept:
  * the k-largest multiset is unique. Registered for Column use via
  * `functions.udaf(TopKAggregator(k), Encoders.scalaLong)` (q105).
  *
  * (Spark's built-in `max_by` family keeps k=1 only; the window-rank
  * formulation (q19) is the right answer when the ROWS are needed —
  * this aggregator is for the "top values per group as one cell" shape
  * the reference's dashboard tiles use.)
  */
case class TopKAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], String] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Vector.empty

  /** Insert preserving "sorted desc, length <= k". */
  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length == k && a <= b.last) b
    else {
      val (hi, lo) = b.span(_ >= a)
      (hi ++ (a +: lo)).take(k)
    }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && x(i) >= y(j))) {
        out += x(i); i += 1
      } else {
        out += y(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[Long]): String = b.mkString(",")

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
