package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimHashSpec extends AnyFunSuite with SparkSpec {

  test("native simhash64 matches the composable 64-filter form exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different text with other words entirely",
      "a",
      "a a a a a"
    ).toDF("text")
    val out = df.select(
      graft.ops.Dedup.simhash64(col("text")).as("native"),
      graft.ops.Dedup.simhash64Builtin(col("text")).as("builtin")
    ).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("interpreted eval agrees with the majority-bit definition") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // hashes: 0b01, 0b01, 0b10 → bit0: 2/3 ones (set), bit1: 1/3 (clear)
    val e = SimHash64(Literal.create(Array(1L, 1L, 2L), ArrayType(LongType)))
    assert(e.eval(null).asInstanceOf[Long] === 1L)
    // tie clears: 0b1, 0b0 → bit0 1/2 ones → clear
    val tie = SimHash64(Literal.create(Array(1L, 0L), ArrayType(LongType)))
    assert(tie.eval(null).asInstanceOf[Long] === 0L)
  }
}
