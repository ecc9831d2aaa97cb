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
  * then (never, here) UDFs.
  *
  * Semantics are EXACTLY the builtin composable form's, so the optimizer
  * rewrite ([[graft.plans.NativeKernelRule]]) is sound on arbitrary input:
  *  - different array lengths → NULL (zip_with null-pads, the multiply and
  *    fold then yield NULL);
  *  - any NULL element → NULL (same propagation);
  *  - cosine with a zero-norm side follows Spark's Divide on a zero
  *    divisor: DIVIDE_BY_ZERO error under ANSI (the default), NULL with
  *    ANSI off — mode captured at construction like Divide's evalMode;
  *  - otherwise: same element order, same double accumulation —
  *    bit-identical (pinned in ArraySimSpec / ExprProps).
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
  // may return NULL for non-null inputs (length mismatch / null element /
  // zero norm) — without this the codegen'd isNull slot is a literal
  override def nullable: Boolean = true
}

/** dot(a, b) = Σ aᵢ·bᵢ accumulated in double; NULL on length mismatch or
  * any null element (builtin-form semantics).
  */
case class DotProduct(left: Expression, right: Expression) extends FloatArrayBinary {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
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
      |int $n = $a.numElements();
      |if ($n != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $acc = 0.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
      |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
      |  }
      |  if (!${ev.isNull}) { ${ev.value} = $acc; }
      |}
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), one fused pass over both arrays; NULL on
  * length mismatch, null element, or a zero-norm side (builtin-form
  * semantics: Divide by exact 0 is NULL in Spark).
  */
case class CosineSim(left: Expression, right: Expression) extends FloatArrayBinary {
  override def prettyName: String = "graft_cosine"

  // like Divide.evalMode: the ANSI decision is fixed at plan time
  private val failOnZeroDivisor: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    val div = math.sqrt(na) * math.sqrt(nb)
    if (div == 0.0) {
      if (failOnZeroDivisor) throw GraftColumns.divideByZeroError()
      null
    } else dot / div
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
      val div = ctx.freshName("div")
      val onZeroDivisor =
        if (failOnZeroDivisor)
          "throw org.apache.spark.sql.GraftColumns.divideByZeroError();"
        else s"${ev.isNull} = true;"
      s"""
      |int $n = $a.numElements();
      |if ($n != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
      |    double $x = (double) $a.getFloat($i);
      |    double $y = (double) $b.getFloat($i);
      |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |  }
      |  if (!${ev.isNull}) {
      |    double $div = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
      |    if ($div == 0.0D) {
      |      $onZeroDivisor
      |    } else { ${ev.value} = $dot / $div; }
      |  }
      |}
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
