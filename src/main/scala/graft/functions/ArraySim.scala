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

/** Pack an ARRAY<FLOAT> into symmetric int8 codes: one SIGNED BYTE per
  * dimension — the ¼-of-fp32 layout that makes a quantized scan
  * memory-bound-cheap. code[i] = clamp(floor(v[i]/scale + 0.5), ±127),
  * exactly the arithmetic of the composable `transform` form it
  * replaces (v6's quantizer), so scores built on these codes are
  * bit-identical to the ARRAY<DOUBLE> version they supersede. NULL on
  * any null element (the composable form propagates the same way).
  */
case class Int8Pack(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_int8_pack"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, DOUBLE), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val scale = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val q = math.floor(x.getFloat(i).toDouble / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      s"""
      |int $n = $a.numElements();
      |byte[] $out = new byte[$n];
      |for (int $i = 0; $i < $n; $i++) {
      |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
      |  double $q = java.lang.Math.floor((double) $a.getFloat($i) / $b + 0.5D);
      |  $out[$i] = (byte) java.lang.Math.max(-127.0D, java.lang.Math.min(127.0D, $q));
      |}
      |if (!${ev.isNull}) { ${ev.value} = $out; }
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ⟨a, b⟩ over int8 code blocks: a pure INTEGER multiply-add loop over
  * two byte[] — no per-element null slots, no array headers, no double
  * rounding — accumulated in long (max |term| = 127² = 16129, so 2⁴⁹
  * dims before overflow). NULL when the code blocks disagree in length.
  * This is the scan kernel of the quantize-then-rescore serving shape
  * (v8): ¼ the bytes of the fp32 scan and cheaper arithmetic.
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_int8_dot"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L; var i = 0
    while (i < x.length) { acc += (x(i) * y(i)).toLong; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
      |int $n = $a.length;
      |if ($n != $b.length) {
      |  ${ev.isNull} = true;
      |} else {
      |  long $acc = 0L;
      |  for (int $i = 0; $i < $n; $i++) {
      |    $acc += (long) ($a[$i] * $b[$i]);
      |  }
      |  ${ev.value} = $acc;
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

  def int8Pack(v: Column, scale: Column): Column =
    GraftColumns.column(Int8Pack(GraftColumns.expression(v), GraftColumns.expression(scale)))

  def int8Dot(a: Column, b: Column): Column =
    GraftColumns.column(Int8Dot(GraftColumns.expression(a), GraftColumns.expression(b)))
}
