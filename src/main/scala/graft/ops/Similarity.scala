package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a narrow scan of the corpus; exact, embarrassingly
  * parallel, and the recall oracle for everything else.
  *
  * Scale path: IVF (inverted-file) — KMeans coarse quantizer, corpus
  * bucketed by nearest centroid, queries probe only `nprobe` buckets.
  * At 100 TB the bucketed corpus is written partitioned by centroid id so
  * a probe prunes partitions at the scan (the ANN analogue of partition
  * pruning).
  */
object Similarity {
  import Tables._

  /** Cosine via codegen'd built-ins: zip_with product + left-fold sum in
    * double. No UDF — stays inside whole-stage codegen. Kept as the
    * reference implementation the native expression is checked against.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosineBuiltin(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Hot-path cosine: native Catalyst expression (graft.functions.CosineSim,
    * fused single-loop doGenCode) — same element order and double
    * accumulation as the builtin form, so results are bit-identical; ~10×
    * less per-row overhead (no intermediate array, no boxing).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.ArraySim.cosineNative(a, b)

  /** Brute-force exact top-k neighbors for a set of query vectors.
    * Query side is tiny → broadcast; corpus side is one narrow scan;
    * per-query top-k via window row_number (at scale: aggregate partial
    * top-k per partition before the window — AQE keeps this cheap here).
    */
  def bruteForceTopK(s: SparkSession, d: String, numQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** Threshold variant (oracle-safe: no rank boundary) — all neighbors
    * with cosine ≥ threshold for the first numQueries vectors.
    */
  def cosineThreshold(s: SparkSession, d: String, numQueries: Int = 5, threshold: Double = 0.25): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .filter(col("cos") >= threshold)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "n_id")
  }

  /** IVF approximate NN: seeded KMeans coarse quantizer (nlist cells),
    * corpus bucketed by cell, each query probes its nprobe nearest cells.
    * Returns per-query approximate top-k. Recall vs brute force is pinned
    * in the spec.
    */
  def annIvf(s: SparkSession, d: String,
      numQueries: Int = 5, k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    // cosine metric ⇒ cluster L2-NORMALIZED vectors (angular k-means):
    // on the unit sphere, euclidean cells == cosine cells
    val toVec = udf { (a: Seq[Float]) =>
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) max 1e-12
      Vectors.dense(a.map(_.toDouble / n).toArray)
    }
    val e = embeddings(s, d).withColumn("fv", toVec(col("embedding"))).cache()
    val km = new KMeans().setK(nlist).setSeed(42L).setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("embedding"), col("cell"))

    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat).toSeq)
    }.toSeq
    import s.implicits._
    val centDf = centroids.toDF("cell", "centroid")

    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // nprobe nearest cells per query (tiny: queries × nlist)
    val probeW = Window.partitionBy("q_id").orderBy(desc("ccos"), asc("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("ccos", cosine(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select("q_id", "qv", "cell")

    // probe join: only the selected cells' vectors are scored
    val scored = probes.join(assigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
    out
  }

  /** Elementwise centroid per label (posexplode → grouped avg): the
    * "average embedding" building block for clustering/analysis.
    */
  def centroidByLabel(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 6).as("mean_v"))
      .orderBy("label", "dim")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("v1_cosine_threshold", (s, d) => cosineThreshold(s, d), Some(
      // DOUBLE[] cast: see d5 — float32 vs double accumulation
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  round(list_inner_product(q.emb, c.emb)
        |    / (sqrt(list_inner_product(q.emb, q.emb))
        |       * sqrt(list_inner_product(c.emb, c.emb))), 6) AS cos
        |FROM e q, e c
        |WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
        |  AND list_inner_product(q.emb, c.emb)
        |    / (sqrt(list_inner_product(q.emb, q.emb))
        |       * sqrt(list_inner_product(c.emb, c.emb))) >= 0.25::DOUBLE
        |ORDER BY q_id, n_id""".stripMargin)),
    QueryDef("v2_bruteforce_topk", (s, d) => bruteForceTopK(s, d), None),
    QueryDef("v3_ann_ivf", (s, d) => annIvf(s, d), None),
    QueryDef("v4_centroid_by_label", centroidByLabel, Some(
      """SELECT label, dim, round(avg(v), 6) AS mean_v FROM (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin))
  )
}
