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

  // NaN==NaN for the 0-length / zero-norm cosine edge
  private def eqD(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b

  property("DotProduct.eval == double-accumulated reference over min length") =
    forAll(floatArr, floatArr) { (a, b) =>
      val n = math.min(a.length, b.length)
      var ref = 0.0; var i = 0
      while (i < n) { ref += a(i).toDouble * b(i).toDouble; i += 1 }
      eqD(DotProduct(litF(a), litF(b)).eval(null).asInstanceOf[Double], ref)
    }

  property("CosineSim.eval == dot/(‖a‖·‖b‖) reference, same accumulation order") =
    forAll(floatArr, floatArr) { (a, b) =>
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val ref = dot / (math.sqrt(na) * math.sqrt(nb))
      eqD(CosineSim(litF(a), litF(b)).eval(null).asInstanceOf[Double], ref)
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
