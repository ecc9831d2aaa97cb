package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ArraySimSpec extends AnyFunSuite with SparkSpec {

  test("native cosine/dot match the composable zip_with+aggregate forms exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.5f, -0.25f, 0f), Array(-1f, 2f, 3.5f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(2f, 2f, 2f), Array(2f, 2f, 2f))
    ).toDF("a", "b")

    val out = df.select(
      ArraySim.cosineNative(col("a"), col("b")).as("cn"),
      graft.ops.Similarity.cosineBuiltin(col("a"), col("b")).as("cb"),
      ArraySim.dotNative(col("a"), col("b")).as("dn"),
      graft.ops.Similarity.dot(col("a"), col("b")).as("db")
    ).collect()

    out.foreach { r =>
      // bit-identical: same element order, same double accumulation
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("native cosine: self-similarity 1, orthogonal 0, null propagates") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(3f, 4f)), Some(Array(3f, 4f))),
      (Some(Array(1f, 0f)), Some(Array(0f, 1f))),
      (None: Option[Array[Float]], Some(Array(1f, 1f)))
    ).toDF("a", "b")
    val rows = df.select(ArraySim.cosineNative(col("a"), col("b"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)
    assert(rows(2).isNullAt(0))
  }

  test("builtin-equivalent null semantics: length mismatch, null element, zero norm") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(Option(1f), Option(2f)), Seq(Option(3f))),       // length mismatch
      (Seq(Option(1f), None), Seq(Option(3f), Option(4f)))) // null element
      .toDF("a", "b")
    val rows = df.select(
      ArraySim.dotNative(col("a"), col("b")).as("dn"),
      graft.ops.Similarity.dot(col("a"), col("b")).as("db"),
      ArraySim.cosineNative(col("a"), col("b")).as("cn"),
      graft.ops.Similarity.cosineBuiltin(col("a"), col("b")).as("cb")
    ).collect()
    // native and builtin agree ROW-FOR-ROW on the null cases
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) && r.isNullAt(1), s"row $i dot null-parity")
      assert(r.isNullAt(2) && r.isNullAt(3), s"row $i cosine null-parity")
    }
    // zero-norm cosine: BOTH forms raise DIVIDE_BY_ZERO under ANSI (the
    // session default) — the fused kernel must not downgrade the error
    val zero = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val eNative = intercept[Exception] {
      zero.select(ArraySim.cosineNative(col("a"), col("b"))).collect()
    }
    val eBuiltin = intercept[Exception] {
      zero.select(graft.ops.Similarity.cosineBuiltin(col("a"), col("b"))).collect()
    }
    assert(eNative.getMessage.contains("DIVIDE_BY_ZERO"), eNative.getMessage)
    assert(eBuiltin.getMessage.contains("DIVIDE_BY_ZERO"), eBuiltin.getMessage)
    // zero-norm dot is a plain 0.0 on both forms
    val dz = zero.select(ArraySim.dotNative(col("a"), col("b")),
      graft.ops.Similarity.dot(col("a"), col("b"))).head()
    assert(dz.getDouble(0) == 0.0 && dz.getDouble(1) == 0.0)
  }

  test("int8 pack+dot: byte codes score bit-identically to the double formulation") {
    val s = spark
    import s.implicits._
    val df = graft.Tables.embeddings(s, sf0001)
      .limit(50).select(col("vec_id"), col("embedding"))
    val x = transform(col("embedding"), f => f.cast("double"))
    val scale = greatest(
      aggregate(x, lit(0.0), (a, u) => greatest(a, abs(u))) / 127.0, lit(1e-30))
    val both = df
      .withColumn("sc", scale)
      .withColumn("codes", ArraySim.int8Pack(col("embedding"), col("sc")))
      .withColumn("dcodes", transform(x, u => greatest(lit(-127.0),
        least(lit(127.0), floor(u / col("sc") + 0.5)))))
    // the packed bytes ARE the clamped-rounded codes (¼-byte layout real)
    val rows = both.select("codes", "dcodes").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]](0).map(_.toInt).toSeq
      val dbls = r.getSeq[Double](1).map(_.toInt)
      assert(bytes == dbls, "packed bytes differ from the double quantizer codes")
    }
    // self-dot through the integer kernel == the double zip_with fold,
    // exactly (integer-valued sums are exact in both domains)
    val dots = both.select(
      ArraySim.int8Dot(col("codes"), col("codes")).as("bd"),
      aggregate(zip_with(col("dcodes"), col("dcodes"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v).cast("long").as("dd"))
      .filter(col("bd") =!= col("dd")).count()
    assert(dots == 0, "integer kernel diverged from the double fold")
    // null semantics: length mismatch → null dot
    val lm = Seq((Array[Byte](1, 2), Array[Byte](1, 2, 3))).toDF("a", "b")
      .select(ArraySim.int8Dot(col("a"), col("b"))).head()
    assert(lm.isNullAt(0), "length mismatch must yield NULL")
    // interpreted path agrees with codegen
    val packed = Int8Pack(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, -2f, 127f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        1.0, org.apache.spark.sql.types.DoubleType))
      .eval(null).asInstanceOf[Array[Byte]]
    assert(packed.toSeq == Seq[Byte](1, -2, 127))
    val idot = Int8Dot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[Byte](3, -4), org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[Byte](5, 6), org.apache.spark.sql.types.BinaryType))
      .eval(null)
    assert(idot == 15L - 24L)
  }

  test("interpreted eval agrees with codegen path") {
    // force interpreted evaluation via the expression's eval
    val e = CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4f, 5f, 6f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val expect = (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - expect) < 1e-12)
  }
}
