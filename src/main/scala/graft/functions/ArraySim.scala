package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The composable form (`zip_with` + `aggregate` over ARRAY<FLOAT>) is
  * semantically identical but allocates a lambda-evaluated intermediate
  * array per row and boxes every element. These expressions generate a
  * tight primitive loop inside whole-stage codegen — the preference order
  * mandated for the engine: built-in functions, then native `Expression`,
  * then (never, here) UDFs. Numerics match the composable form exactly:
  * same element order, same double accumulation.
  *
  * Interpreted `nullSafeEval` is provided for completeness (e.g. inside
  * non-codegen contexts); the generated path is what runs in practice.
  */
abstract class FloatArrayBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
}

/** dot(a, b) = Σ aᵢ·bᵢ over min length, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends FloatArrayBinary {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the fragment is inlined into a scope that may already
      // declare i/n (e.g. two of these expressions in one projection)
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $acc = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
      |}
      |${ev.value} = $acc;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), one fused pass over both arrays. */
case class CosineSim(left: Expression, right: Expression) extends FloatArrayBinary {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0, $na = 0.0, $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $x = (double) $a.getFloat($i);
      |  double $y = (double) $b.getFloat($i);
      |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |}
      |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArraySim {
  /** Column API over the native expressions. */
  def dotNative(a: Column, b: Column): Column =
    GraftColumns.column(DotProduct(GraftColumns.expression(a), GraftColumns.expression(b)))

  def cosineNative(a: Column, b: Column): Column =
    GraftColumns.column(CosineSim(GraftColumns.expression(a), GraftColumns.expression(b)))
}
