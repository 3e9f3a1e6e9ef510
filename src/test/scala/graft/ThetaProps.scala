package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{ThetaIntersectEstimate, ThetaSketchAgg}

/** Property tests for the theta aggregate at the buffer level (no
  * Spark session): below the 2^12 retention threshold a theta sketch
  * keeps every hashed key, so estimates are EXACT set cardinalities —
  * which makes the partial-aggregation algebra (split → serialize →
  * deserialize → merge) property-testable against plain Sets.
  */
object ThetaProps extends Properties("graft.theta") {

  private def agg = ThetaSketchAgg(BoundReference(0, LongType, nullable = true))

  private def sketchOf(xs: Seq[Long]): Array[Byte] = {
    val a = agg
    val buf = xs.foldLeft(a.createAggregationBuffer()) { (b, x) =>
      a.update(b, InternalRow(x))
    }
    a.eval(buf).asInstanceOf[Array[Byte]]
  }

  private val longs = Gen.listOf(Gen.choose(-1000L, 1000L))

  property("estimate is the exact distinct count below retention") =
    Prop.forAll(longs) { xs =>
      val a = agg
      val buf = xs.foldLeft(a.createAggregationBuffer()) { (b, x) =>
        a.update(b, InternalRow(x))
      }
      val est = graft.functions.ThetaSketch
        .wrap(a.eval(buf).asInstanceOf[Array[Byte]]).getEstimate
      est == xs.toSet.size.toDouble
    }

  property("split + serialize/deserialize + merge == unsplit fold") =
    Prop.forAll(longs, Gen.choose(0, 64)) { (xs, cut0) =>
      val a = agg
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(a.createAggregationBuffer()) { (b, x) =>
        a.update(b, InternalRow(x))
      }
      val br = r.foldLeft(a.createAggregationBuffer()) { (b, x) =>
        a.update(b, InternalRow(x))
      }
      // shuffle boundary: the right partial travels as bytes
      val merged = a.merge(bl, a.deserialize(a.serialize(br)))
      val est = graft.functions.ThetaSketch
        .wrap(a.eval(merged).asInstanceOf[Array[Byte]]).getEstimate
      est == xs.toSet.size.toDouble
    }

  property("intersection estimate is the exact overlap") =
    Prop.forAll(longs, longs) { (xs, ys) =>
      val est = ThetaIntersectEstimate(
        Literal(sketchOf(xs), BinaryType),
        Literal(sketchOf(ys), BinaryType)).eval(null).asInstanceOf[Double]
      est == xs.toSet.intersect(ys.toSet).size.toDouble
    }

  property("null inputs are ignored, not counted") =
    Prop.forAll(longs) { xs =>
      val a = agg
      val withNulls = xs.flatMap(x => Seq[Any](x, null))
      val buf = withNulls.foldLeft(a.createAggregationBuffer()) { (b, x) =>
        a.update(b, InternalRow(x))
      }
      val est = graft.functions.ThetaSketch
        .wrap(a.eval(buf).asInstanceOf[Array[Byte]]).getEstimate
      est == xs.toSet.size.toDouble
    }
}
