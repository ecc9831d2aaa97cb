package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based pins for the native Catalyst expressions (SURVEY.md §5
  * item 2): the interpreted eval must equal an independent Scala
  * reference on arbitrary inputs. The interpreted↔codegen agreement is
  * pinned separately in ArraySimSpec/SimHashSpec, so together the
  * generated code is transitively covered.
  */
object ExprProps extends Properties("graft.functions.expressions") {

  private val floatArr: Gen[Array[Float]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  private def litF(a: Array[Float]) = Literal.create(a, ArrayType(FloatType))
  private def litL(a: Array[Long]) = Literal.create(a, ArrayType(LongType))

  // builtin-equivalent semantics: null for length mismatch / zero-norm
  // cosine; otherwise bit-identical doubles (NaN==NaN for NaN inputs)
  private def eqD(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
    case _ => false
  }

  property("DotProduct.eval == builtin fold: equal lengths accumulate, else null") =
    forAll(floatArr, floatArr) { (a, b) =>
      val ref: Any =
        if (a.length != b.length) null
        else {
          var d = 0.0; var i = 0
          while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
          d
        }
      eqD(DotProduct(litF(a), litF(b)).eval(null), ref)
    }

  property("CosineSim.eval == builtin dot/(‖a‖·‖b‖): ANSI error on zero divisor") =
    forAll(floatArr, floatArr) { (a, b) =>
      def zeroNorm(v: Array[Float]) = v.forall(x => x.toDouble * x == 0.0)
      if (a.length != b.length)
        CosineSim(litF(a), litF(b)).eval(null) == null
      else if (zeroNorm(a) || zeroNorm(b))
        // the session default is ANSI → zero divisor raises, like Divide
        scala.util.Try(CosineSim(litF(a), litF(b)).eval(null)).isFailure
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        eqD(CosineSim(litF(a), litF(b)).eval(null),
          dot / (math.sqrt(na) * math.sqrt(nb)))
      }
    }

  property("SimHash64.eval == per-bit strict-majority reference") =
    forAll(Gen.listOf(Gen.long)) { hs =>
      val n = hs.length
      val ref = (0 until 64).foldLeft(0L) { (acc, b) =>
        val ones = hs.count(h => ((h >>> b) & 1L) == 1L)
        if (ones * 2 > n) acc | (1L << b) else acc
      }
      SimHash64(litL(hs.toArray)).eval(null).asInstanceOf[Long] == ref
    }
}
