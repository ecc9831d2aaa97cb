package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generated-data pins for the array-op kernels: one Spark job evaluates
  * hundreds of randomized rows at once, compared element-for-element
  * against independent Scala references (the efficient property-test
  * shape — per-case Spark jobs would take minutes).
  */
class GeneratedDataSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private val words = Vector("alpha", "beta2", "c", "dddd", "eeeeeeeeee",
    "fg", "hij", "klmno", "p", "qrstuvwxyz12")
  private def text(): String =
    Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")

  test("shingles == sliding-window reference on 300 random docs (incl. short/empty)") {
    val docs = (0 until 300).map(i => (i.toLong, text()))
    val got = docs.toDF("id", "text")
      .select($"id", Dedup.shingles($"text", 3).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val want = docs.map { case (i, t) =>
      val toks = t.split(" ").toList
      i -> (if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toList
            else List(t))
    }.toMap
    assert(got == want)
  }

  test("bpeishCount == per-token ceil(len/4) floor-1 reference") {
    val docs = (0 until 300).map(i => (i.toLong, text()))
    val got = docs.toDF("id", "text")
      .select($"id", TextAnalysis.bpeishCount($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.map { case (i, t) =>
      i -> t.split(" ").map(tok => math.max(1L, math.ceil(tok.length / 4.0).toLong)).sum
    }.toMap
    assert(got == want)
  }

  test("SparseVectorSum == naive per-key sum on random triples (duplicate keys SUM, O2)") {
    val triples = Seq.fill(500)(
      (rnd.nextInt(8).toLong, rnd.nextInt(20).toLong, rnd.nextInt(10) * 0.5))
    val got = triples.toDF("u", "i", "q").as[(Long, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(graft.functions.SparseVectorSum.toColumn.name("vec"))
      .collect().toMap
    val want = triples.groupBy(_._1).map { case (u, ts) =>
      u -> ts.groupBy(_._2).map { case (i, vs) => i -> vs.map(_._3).sum }
    }
    assert(got.keySet == want.keySet)
    // values are multiples of 0.5 → double sums are exact in any order
    got.foreach { case (u, m) => assert(m == want(u), s"user $u") }
  }
}
