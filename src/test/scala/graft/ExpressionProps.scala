package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{AsciiPolyHash, FloatDotProduct}

/** Property tests (SURVEY.md §5 strategy (c)) for the custom Catalyst
  * expressions, via direct interpreted eval — the codegen path is
  * covered by the catalog queries and the oracle gate.
  */
object ExpressionProps extends Properties("graft.expressions") {

  private val asciiString = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("polyhash matches the reference fold for all ASCII strings") =
    Prop.forAll(asciiString) { s =>
      val expected = s.getBytes("US-ASCII")
        .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 2147483647L)
      val got = AsciiPolyHash(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Long]
      got == expected && got >= 0L && got < 2147483647L
    }

  property("polyhash is prefix-sensitive (rolling)") =
    Prop.forAll(asciiString, Gen.choose(33.toChar, 126.toChar)) { (s, c) =>
      val h1 = AsciiPolyHash(Literal(UTF8String.fromString(s))).eval(null).asInstanceOf[Long]
      val h2 = AsciiPolyHash(Literal(UTF8String.fromString(s + c))).eval(null).asInstanceOf[Long]
      h2 == (h1 * 31 + c.toLong) % 2147483647L
    }

  private val floatArray = Gen.listOfN(8, Gen.choose(-100.0f, 100.0f))

  property("dot product equals the left-to-right double fold") =
    Prop.forAll(floatArray, floatArray) { (a, b) =>
      val lit = (xs: List[Float]) =>
        Literal(new GenericArrayData(xs.toArray), ArrayType(FloatType))
      val got = FloatDotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      got == expected // bit-exact, not approximate: same fold order
    }

  property("mixed-precision dot equals the left-to-right widen-multiply fold") =
    Prop.forAll(floatArray, Gen.listOfN(8, Gen.choose(-1.0, 1.0))) { (a, b) =>
      val la = Literal(new GenericArrayData(a.toArray), ArrayType(FloatType))
      val lb = Literal(new GenericArrayData(b.toArray),
        ArrayType(org.apache.spark.sql.types.DoubleType))
      val got = graft.functions.FloatDoubleDotProduct(la, lb)
        .eval(null).asInstanceOf[Double]
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y
      }
      got == expected
    }

  property("dot product is symmetric") =
    Prop.forAll(floatArray, floatArray) { (a, b) =>
      val lit = (xs: List[Float]) =>
        Literal(new GenericArrayData(xs.toArray), ArrayType(FloatType))
      FloatDotProduct(lit(a), lit(b)).eval(null) ==
        FloatDotProduct(lit(b), lit(a)).eval(null)
    }
}
