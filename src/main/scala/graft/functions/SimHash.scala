package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token-hash array: bit i of the result is set iff
  * the majority of token hashes have bit i set (strictly more ones than
  * zeros — ties clear the bit, matching `ones*2 > n`).
  *
  * The composable form (64 × `size(filter(...))` passes over the array)
  * is semantically identical but traverses the array 64 times and builds
  * 64 intermediate arrays per row. This expression makes ONE pass with 64
  * on-stack counters — the shape that matters when the operator runs over
  * 100 TB of documents.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> of token hashes, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // fresh names: this fragment is inlined into generated code that may
      // already declare i/b/n in the same scope
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
      |int $n = $a.numElements();
      |int[] $counts = new int[64];
      |for (int $i = 0; $i < $n; $i++) {
      |  long $h = $a.getLong($i);
      |  for (int $b = 0; $b < 64; $b++) {
      |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++;
      |  }
      |}
      |long $out = 0L;
      |for (int $b = 0; $b < 64; $b++) {
      |  if ($counts[$b] * 2 > $n) $out |= (1L << $b);
      |}
      |${ev.value} = $out;
      |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash {
  /** SimHash64 over pre-hashed tokens. */
  def simhash64Native(tokenHashes: Column): Column =
    GraftColumns.column(SimHash64(GraftColumns.expression(tokenHashes)))
}
