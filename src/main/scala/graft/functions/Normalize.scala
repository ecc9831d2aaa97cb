package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Text dedup keys MUST be normalization-insensitive: "café" composed
  * (U+00E9) and decomposed (U+0065 U+0301) are byte-different but the
  * same text, so an exact-dedup hash (d1/t4) or a shingle (d2) computed
  * on raw bytes silently misses such pairs. Spark has no normalization
  * builtin; the alternatives are a Scala UDF (SerDe boundary, breaks
  * whole-stage codegen) or this: a UnaryExpression whose generated code
  * calls `java.text.Normalizer` inline inside the WSCG loop — no
  * boxing, no closure, NULL propagation inherited from
  * UnaryExpression's null-safe scaffolding. The kernel itself is the
  * JDK's (ICU-equivalent) normalizer — the point of the Expression tier
  * is staying inside codegen, not reimplementing Unicode.
  *
  * The reference has no text layer at all (its records are int-keyed
  * rating vectors, ALS-Hadoop/ALS/ALS.java:85-95); this belongs to the
  * training-data extension surface. Oracled cross-engine: DuckDB's
  * `nfc_normalize` must produce byte-identical output (f13).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. The
    * fast path — already-NFC input, the overwhelming majority of real
    * text — is `Normalizer.isNormalized`, which scans without
    * allocating; only denormalized strings pay the transform.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column =
    GraftColumns.column(NfcNormalize(GraftColumns.expression(c)))
}
