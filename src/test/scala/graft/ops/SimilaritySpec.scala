package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("cosine kernel: self-similarity 1, orthogonal 0") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))
    ).toDF("a", "b").withColumn("cos", Similarity.cosine(col("a"), col("b")))
    val got = df.select("cos").collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12)
  }

  test("brute-force top-k matches an independently computed ranking") {
    val e = graft.Tables.embeddings(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byId = e.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 5L).map { q =>
      q -> e.filter(_._1 != q).map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    }.toMap
    val got = Similarity.bruteForceTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got == expected)
  }

  def recallVsBrute(dir: String): Double = {
    val brute = Similarity.bruteForceTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ann = Similarity.annIvf(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = brute.map { case (q, truth) =>
      ann.get(q).map(found => (found intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("IVF ANN: >= 0.9 recall@10 on clusterable data") {
    // planted clusters — the data regime IVF is built for
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = recallVsBrute(dir)
    assert(r >= 0.9, s"mean recall@10 $r below 0.9 on clustered data")
  }

  test("IVF ANN: beats the probed-fraction baseline on isotropic data") {
    // sf0.001 embeddings are isotropic random unit vectors (no cluster
    // structure) — IVF recall is bounded by coverage; must still beat
    // random cell selection (nprobe/nlist = 0.25)
    val r = recallVsBrute(sf0001)
    assert(r >= 0.3, s"mean recall@10 $r not better than random probing")
  }

  test("IVF ANN: probe scan prunes bucketed-corpus partitions") {
    val plan = Similarity.annIvf(spark, sf0001).queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(pf.exists(f => f.nonEmpty && f.contains("cell")),
      s"no non-empty cell PartitionFilters on the probe scan:\n$plan")
  }
}
