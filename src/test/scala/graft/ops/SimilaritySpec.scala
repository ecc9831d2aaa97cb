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

  test("hard negatives: label-pure, matches an independent other-label ranking") {
    val e = graft.Tables.embeddings(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byId = e.map(t => t._1 -> t).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 8L).map { q =>
      val (_, qv, ql) = byId(q)
      q -> e.filter(_._3 != ql).map { case (id, v, _) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    }.toMap
    val rows = Similarity.hardNegatives(spark, sf0001).collect()
    // every mined negative carries a label different from its anchor's
    rows.foreach { r =>
      assert(byId(r.getLong(2))._3 != byId(r.getLong(0))._3,
        s"same-label pair mined: anchor ${r.getLong(0)} neg ${r.getLong(2)}")
    }
    val got = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
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

  test("ANN recall curve: monotone in nprobe, hits the max-probe floor, rerun-stable") {
    val a = Similarity.annRecallCurve(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.nonEmpty)
    // more probes can only widen the candidate set — recall must be
    // monotone nondecreasing along the sweep
    a.sliding(2).foreach {
      case Array((p1, _, r1), (p2, _, r2)) =>
        assert(r2 >= r1, s"recall dropped from $r1 (nprobe=$p1) to $r2 (nprobe=$p2)")
      case _ => ()
    }
    // at the widest probe the curve must beat random cell coverage on
    // the isotropic sf0.001 vectors (the v3 spec's floor)
    assert(a.last._3 >= 0.3, s"max-probe recall ${a.last._3} below floor")
    // the index is memoized and the fit seeded: the curve is a pure
    // function of the dataset
    val b = Similarity.annRecallCurve(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "recall curve not rerun-stable")
  }

  test("adaptive nlist keeps the max cell population bounded as the corpus grows") {
    import spark.implicits._
    // planted skew: 20 separated gaussian clusters, one holding 40% of
    // all points — the regime where a FIXED nlist lets one cell grow
    // O(n) and its same-cell scoring block grow O(n²)
    val dim = 8
    def corpus(n: Int) = {
      val rnd = new scala.util.Random(11)
      val centers = Array.fill(20, dim)(rnd.nextGaussian() * 3)
      (0 until n).map { id =>
        val c = if (id % 10 < 4) centers(0) else centers(1 + id % 19)
        (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    }
    def maxCell(n: Int): (Int, Long) = {
      val df = corpus(n).cache()
      val nl = Similarity.adaptiveNlist(df.count())
      val cents = Similarity.fitQuantizer(df, "embedding", nl)
      val best = Similarity.assignCell(col("embedding"), cents)
      val m = df.select((lit(0) - best.getField("negcell")).as("cell"))
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
      df.unpersist(blocking = false)
      (nl, m)
    }
    val (nl1, m1) = maxCell(16384)
    val (nl2, m2) = maxCell(65536) // 4× the corpus → 4× the cells
    assert(nl2 == 4 * nl1, s"nlist did not scale with n: $nl1 -> $nl2")
    // k-means puts centroids where the mass is, so the 40% cluster is
    // split across cells and the max cell stays near targetCell at BOTH
    // sizes instead of growing 4×
    val bound = 8 * 1024L
    assert(m1 <= bound, s"max cell $m1 at n=16384 exceeds $bound (nlist=$nl1)")
    assert(m2 <= bound, s"max cell $m2 at n=65536 exceeds $bound (nlist=$nl2)")
  }

  test("IVF ANN: probe scan prunes bucketed-corpus partitions") {
    val plan = Similarity.annIvf(spark, sf0001).queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(pf.exists(f => f.nonEmpty && f.contains("cell")),
      s"no non-empty cell PartitionFilters on the probe scan:\n$plan")
  }

  test("int8 quantization: reconstruction error bounded by scale/2, cosine near 1") {
    val rows = Similarity.int8Quantization(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // per-vector bound: |x - dq| <= scale/2 = max|x|/254 (clamp can't
    // bite: |x|/scale <= 127 by construction)
    val maxAbs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        aggregate(transform(col("embedding"), v => abs(v.cast("double"))),
          lit(0.0), (a, v) => greatest(a, v)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, cosDq, err) =>
      val bound = maxAbs(id) / 254.0 + 1e-6 // 1e-6: output rounding slack
      assert(err <= bound, s"vec $id: err $err > scale/2 bound $bound")
      assert(cosDq > 0.99, s"vec $id: int8 cosine $cosDq too lossy")
    }
  }

  test("quantizer sample is layout-independent: sorted parquet covers all clusters") {
    import spark.implicits._
    // 4 orthogonal clusters, written to parquet SORTED by cluster — the
    // layout that hands a prefix-limit sample only cluster 0's vectors
    // and silently degrades cell-pair pruning toward blocked all-pairs
    val dim = 8
    val rnd = new scala.util.Random(13)
    val rows = for (c <- 0 until 4; i <- 0 until 2000) yield {
      val v = Array.tabulate(dim)(j =>
        (if (j == 2 * c || j == 2 * c + 1) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
      ((c * 2000 + i).toLong, c, v.map(_.toFloat).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted_emb").toString
    rows.toDF("vec_id", "cluster", "embedding")
      .coalesce(1).sortWithinPartitions("vec_id") // file order = cluster order
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // maxFitRows = 1/4 of the corpus: a prefix sample would see ONLY
    // cluster 0; the hash filter must see all four
    val cents = Similarity.fitQuantizer(df, "embedding", nlist = 4,
      maxFitRows = 2000, corpusCount = 8000L)
    assert(cents.length == 4)
    val best = Similarity.assignCell(col("embedding"), cents)
    val cellsPerCluster = df
      .select(col("cluster"), (lit(0) - best.getField("negcell")).as("cell"))
      .groupBy("cluster").agg(countDistinct("cell").as("nc"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every cluster found its own centroid: 4 clusters occupy 4 distinct
    // cells (a cluster-0-only fit collapses the other three onto one or
    // two far-away centroids)
    val distinctCells = df
      .select(col("cluster"), (lit(0) - best.getField("negcell")).as("cell"))
      .groupBy("cluster").agg(min("cell")).collect()
      .map(_.getInt(1)).distinct.length
    assert(distinctCells == 4,
      s"clusters collapsed onto $distinctCells cells — sample is layout-biased ($cellsPerCluster)")
  }

  test("quantized top-k: recall@10 vs exact search >= 0.9, ranks by true cosine") {
    val exact = Similarity.bruteForceTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val quant = Similarity.quantizedTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(quant.keySet == exact.keySet)
    val recall = exact.map { case (q, ids) =>
      (ids intersect quant(q)).size.toDouble / ids.size }.sum / exact.size
    assert(recall >= 0.9, s"quantized recall@10 = $recall")
    // the rescore phase ranks by TRUE cosine: every returned cos must
    // match the exact query's cos for that (q, n) pair
    val exactCos = Similarity.bruteForceTopK(spark, sf0001, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Similarity.quantizedTopK(spark, sf0001).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactCos.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
  }

  test("PQ top-k: recall@10 vs exact >= 0.8, true-cosine ranks, 5-bit codes") {
    val exact = Similarity.bruteForceTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val pq = Similarity.pqTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(pq.keySet == exact.keySet)
    // three stacked approximations (normalize → per-subvector codebooks →
    // ADC lookups) with exact rescoring over a pool-deep candidate set
    val recall = exact.map { case (q, ids) =>
      (ids intersect pq(q)).size.toDouble / ids.size }.sum / exact.size
    assert(recall >= 0.8, s"PQ recall@10 = $recall")
    // the rescore phase ranks by TRUE cosine
    val exactCos = Similarity.bruteForceTopK(spark, sf0001, k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Similarity.pqTopK(spark, sf0001).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactCos.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    // the compression claim: 8 codes from 32-entry codebooks = 5 bits
    // each (5 bytes packed) vs 256 bytes of fp32 — every emitted code
    // must land in [0, 32) for the claim to hold
    val e = graft.Tables.embeddings(spark, sf0001)
    assert(e.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).head().getInt(0) == 64)
    import org.apache.spark.sql.functions.{col, explode}
    val badCodes = Similarity.pqCodes(spark, sf0001)
      .select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 32).count()
    assert(badCodes == 0, s"$badCodes codes outside [0, 32)")
  }

  test("IVF-PQ: clustered recall >= 0.85, index holds no floats, partitions pruned") {
    import spark.implicits._
    // the v3 planted-cluster fixture (dim 32 = 8 subvectors of 4)
    val rnd = new scala.util.Random(7)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_fix").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = Similarity.ivfPqTopK(spark, dir)
    val plan = got.queryExecution.executedPlan.toString
    val ivfpq = got.collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(ivfpq.keySet == brute.keySet)
    val recall = brute.map { case (q, truth) =>
      (truth intersect ivfpq(q)).size.toDouble / truth.size }.sum / brute.size
    assert(recall >= 0.85, s"IVF-PQ recall@10 = $recall on clustered data")
    // the persisted index carries codes + cell only — no float column.
    // The index dir name embeds (nlist, m, codebook, content fingerprint),
    // so locate it by its scratch tag rather than reproducing the knobs.
    val tag = graft.Tables.scratchTag(dir)
    val idxDirs = new java.io.File("/tmp").listFiles()
      .filter(f => f.getName.startsWith("graft_ivfpq_") && f.getName.endsWith(tag))
    assert(idxDirs.nonEmpty, s"no staged IVF-PQ index dir found for tag $tag")
    val indexSchema = spark.read.parquet(idxDirs.head.toString).schema
    assert(indexSchema.fieldNames.sorted.toSeq == Seq("cell", "codes", "vec_id"),
      s"index schema not codes-only: ${indexSchema.treeString}")
    assert(!indexSchema.exists(_.dataType.simpleString.contains("float")),
      s"float column leaked into the index: ${indexSchema.treeString}")
    // probe scan prunes cell partitions (v3's pin, on the PQ index)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(pf.exists(f => f.nonEmpty && f.contains("cell")),
      s"no non-empty cell PartitionFilters on the index scan:\n$plan")
  }

  test("IVF-PQ: beats the probed-fraction baseline on isotropic data") {
    // sf0.001 is isotropic — recall bounded by coverage (nprobe/nlist =
    // 0.5) stacked with PQ distortion; must still beat random probing
    val brute = Similarity.bruteForceTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ivfpq = Similarity.ivfPqTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, truth) =>
      ivfpq.get(q).map(f => (truth intersect f).size.toDouble / truth.size)
        .getOrElse(0.0) }.sum / brute.size
    assert(recall >= 0.3, s"IVF-PQ recall@10 = $recall not better than random probing")
  }

  test("filtered top-k: every hit passes the predicate, k filled from the filtered pool") {
    val allowed = graft.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Similarity.filteredTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // predicate holds on every returned neighbor — the post-filter trap
    // (underfilled k / leaked non-matching hits) must be impossible
    got.foreach { case (q, _, n, _) =>
      assert(allowed.contains(n), s"query $q returned non-en doc $n")
    }
    // k fully filled when the filtered pool is deep enough
    val perQ = got.groupBy(_._1)
    assert(perQ.nonEmpty && perQ.values.forall(_.length == 10))
    // ranks are dense and cosine-descending within each query
    perQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length), s"query $q ranks not dense")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq,
        s"query $q not cosine-descending")
    }
    // the filter actually bites: some unfiltered top-10 hit is non-en
    val unfiltered = Similarity.bruteForceTopK(spark, sf0001).collect()
      .map(r => r.getLong(2))
    assert(unfiltered.exists(!allowed.contains(_)),
      "fixture degenerate: unfiltered top-k already all-en")
  }

  test("filtered ANN: predicate holds, high recall vs exact filtered on clustered data") {
    import spark.implicits._
    // planted clusters + alternating lang labels: the regime where both
    // the IVF pruning and the metadata filter genuinely bite
    val rnd = new scala.util.Random(11)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ivff").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (0 until 500).map(id => (id.toLong, if (id % 2 == 0) "en" else "de", "x"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = Similarity.filteredTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ann = Similarity.filteredAnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // every hit satisfies the predicate (index-level filter, no leak)
    ann.foreach { case (q, n) =>
      assert(n % 2 == 0, s"query $q returned non-en doc $n")
    }
    val recall = exact.map { case (q, truth) =>
      val found = ann.filter(_._1 == q).map(_._2).toSet
      (found intersect truth).size.toDouble / truth.size
    }.sum / exact.size
    assert(recall >= 0.85, s"filtered-ANN recall $recall below 0.85 on clustered data")
  }

  test("filtered ANN: metadata filter shrinks the probe scan, partitions pruned") {
    val core = Similarity.filteredAnnCore(spark, sf0001, "en", 5, 10, 0, 4)
    val (nPruned, nFiltered) = (core.pruned.count(), core.filtered.count())
    // the predicate bites INSIDE the pruned cells: strictly fewer rows
    // reach the dot product than the unfiltered v3 probe scan scores
    assert(nFiltered < nPruned,
      s"filter did not shrink the probe scan ($nFiltered vs $nPruned)")
    assert(nFiltered > 0, "filter emptied the probe scan — fixture degenerate")
    // the same cell PartitionFilters as v3: only probed dirs are read
    val plan = core.result.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(pf.exists(f => f.nonEmpty && f.contains("cell")),
      s"no non-empty cell PartitionFilters on the filtered index scan:\n$plan")
    // isotropic-floor recall vs the exact filtered ground truth (v12)
    val exact = Similarity.filteredTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ann = core.result.collect().map(r => (r.getLong(0), r.getLong(2)))
    val recall = exact.map { case (q, truth) =>
      (ann.filter(_._1 == q).map(_._2).toSet intersect truth).size.toDouble / truth.size
    }.sum / exact.size
    assert(recall >= 0.3, s"filtered-ANN recall $recall not better than random probing")
  }

  test("MMR: lambda=1 degenerates to exact top-k; lambda=0.5 never more redundant") {
    import org.apache.spark.sql.Row
    val k = 5
    // λ=1: redundancy term vanishes — the greedy must reproduce v2's
    // exact (cos desc, id asc) ranking over the same pool
    val pure = Similarity.mmrDiversifiedTopK(spark, sf0001, k = k, lambda = 1.0)
      .select("q_id", "rank", "n_id").collect().map {
        case Row(q: Long, r: Int, n: Long) => (q, r, n) }.toSet
    val topk = Similarity.bruteForceTopK(spark, sf0001, k = k)
      .select("q_id", "rank", "n_id").collect().map {
        case Row(q: Long, r: Int, n: Long) => (q, r, n) }.toSet
    assert(pure == topk, "lambda=1 MMR must equal plain top-k")

    // λ=0.5: per query, the selected set's mean pairwise similarity must
    // not exceed plain top-k's (diversification can only reduce it)
    def meanPairSim(sel: Map[Long, Seq[Long]]): Double = {
      val emb = graft.Tables.embeddings(spark, sf0001)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        dot / (na * nb)
      }
      val sims = for {
        (_, ids) <- sel.toSeq
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield cos(emb(ids(i)), emb(ids(j)))
      sims.sum / sims.length
    }
    val mmrSel = Similarity.mmrDiversifiedTopK(spark, sf0001, k = k, lambda = 0.5)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    val topkSel = topk.groupBy(_._1).map { case (q, rs) =>
      q -> rs.toSeq.sortBy(_._2).map(_._3) }
    assert(meanPairSim(mmrSel) <= meanPairSim(topkSel) + 1e-9,
      "MMR selection is more redundant than plain top-k")
  }

  test("knn graph: >= 0.9 edge recall vs the exact graph on planted clusters, well-formed, rerun-stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_knng").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = 5
    val got = Similarity.knnGraph(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val bySrc = got.groupBy(_._1)
    // every vector got a neighborhood; ranks contiguous, scores desc, no self
    assert(bySrc.size == 500)
    bySrc.foreach { case (src, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"src $src ranks")
      assert(sorted.length <= k)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(_._3 != src))
    }
    // exact graph recall: brute-force kNN per node in-JVM
    val emb = rows.map { case (id, v, _) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d0 = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d0 += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    val recalls = rows.map { case (id, _, _) =>
      val exact = emb.keysIterator.filter(_ != id)
        .map(n => (n, cos(emb(id), emb(n))))
        .toSeq.sortBy { case (n, c) => (-c, n) }.take(k).map(_._1).toSet
      val approx = bySrc(id).map(_._3).toSet
      (exact & approx).size.toDouble / k
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean edge recall $mean below 0.9 on clustered data")
    // memoized index + seeded fit: the graph is a pure function of the dataset
    val again = Similarity.knnGraph(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("nn-descent: per-rank monotone vs v15, recall not worse, well-formed, rerun-stable") {
    import spark.implicits._
    // planted clusters (v15's fixture shape, different seed)
    val rnd = new scala.util.Random(23)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_nnd").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = 5
    val base = Similarity.knnGraph(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val ref = Similarity.nnDescentRefine(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val refBySrc = ref.groupBy(_._1)
    val baseBySrc = base.groupBy(_._1)
    // well-formed: every node, contiguous ranks, desc scores, no self-loop
    assert(refBySrc.size == 500)
    refBySrc.foreach { case (src, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(_._3 != src))
    }
    // descent guarantee: old edges always compete, so each node's rank-r
    // similarity never decreases (1e-6: v15's output rounds at 6dp)
    refBySrc.foreach { case (src, es) =>
      val newCos = es.sortBy(_._2).map(_._4)
      val oldCos = baseBySrc(src).sortBy(_._2).map(_._4)
      oldCos.zip(newCos).zipWithIndex.foreach { case ((o, n), i) =>
        assert(n >= o - 1e-6, s"src $src rank ${i + 1}: $n < $o")
      }
    }
    // exact-graph recall: refined never worse than the IVF graph
    val emb = rows.map { case (id, v, _) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d0 = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d0 += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    def meanRecall(g: Map[Long, Array[(Long, Int, Long, Double)]]): Double = {
      val rs = rows.map { case (id, _, _) =>
        val exact = emb.keysIterator.filter(_ != id)
          .map(n => (n, cos(emb(id), emb(n))))
          .toSeq.sortBy { case (n, c) => (-c, n) }.take(k).map(_._1).toSet
        (exact & g(id).map(_._3).toSet).size.toDouble / k
      }
      rs.sum / rs.length
    }
    val rBase = meanRecall(baseBySrc)
    val rRef = meanRecall(refBySrc)
    assert(rRef >= rBase - 1e-9, s"refined recall $rRef below base $rBase")
    assert(rRef >= 0.9, s"refined recall $rRef below 0.9")
    // pure function of the dataset: rerun identical
    val again = Similarity.nnDescentRefine(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ref.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("binary hamming: pool>=corpus equals exact v2; clustered recall; codes bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_bh").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // rescoring the WHOLE corpus in fp is exact search: must equal v2
    val exact = Similarity.bruteForceTopK(spark, dir, 5, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val degen = Similarity.binaryHammingTopK(spark, dir, 5, 10, pool = 600)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(degen.toSeq == exact.toSeq, "full-pool binary search diverges from v2")
    // production shape: 50-deep Hamming pool still finds the cosine top-k
    val got = Similarity.binaryHammingTopK(spark, dir, 5, 10, pool = 50)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val gotBy = got.groupBy(_._1)
    assert(gotBy.size == 5)
    val recall = gotBy.map { case (qId, es) =>
      (es.map(_._3).toSet & exactSets(qId)).size.toDouble / exactSets(qId).size
    }.sum / 5
    assert(recall >= 0.6, s"binary-code recall $recall below 0.6 on clusters")
    gotBy.foreach { case (qId, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(_._3 != qId))
    }
    val again = Similarity.binaryHammingTopK(spark, dir, 5, 10, pool = 50)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq, "rerun differs")
  }

  test("plaid: exact degeneration to v14 when nothing prunes; high recall on clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_plaid").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // 32-dim fixture → m=2 subvectors of 16
    val exact = Similarity.maxSimTopK(spark, dir, 5, 10, m = 2, sub = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // all cells probed + pool >= corpus ⇒ stage 1 passes every candidate
    // through and stage 2 IS v14 — bit-for-bit
    val degen = Similarity.plaidRerank(spark, dir, 5, 10,
      nprobe = 100000, pool = 600, m = 2, sub = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(degen.toSeq == exact.toSeq, "unpruned PLAID diverges from v14")
    // production shape: pruned probes + bounded pool still find the
    // MaxSim top-k on clustered data
    val plaid = Similarity.plaidRerank(spark, dir, 5, 10,
      nprobe = 4, pool = 50, m = 2, sub = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val plaidBy = plaid.groupBy(_._1)
    assert(plaidBy.size == 5)
    val recall = plaidBy.map { case (q, es) =>
      (es.map(_._3).toSet & exactSets(q)).size.toDouble / exactSets(q).size
    }.sum / 5
    assert(recall >= 0.8, s"PLAID recall $recall below 0.8 on clustered data")
    plaidBy.foreach { case (q, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"q $q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(_._3 != q))
    }
    val again = Similarity.plaidRerank(spark, dir, 5, 10,
      nprobe = 4, pool = 50, m = 2, sub = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(plaid.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq, "rerun differs")
  }

  test("maxsim: m=1 degenerates to exact cosine top-k; m=4 well-formed and bounded") {
    // with one 64-dim "token" the MaxSim sum IS the cosine — the ranking
    // must equal v2's exactly, scores included (both round at 6dp)
    val v2 = Similarity.bruteForceTopK(spark, sf0001, 3, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val m1 = Similarity.maxSimTopK(spark, sf0001, 3, 5, m = 1, sub = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(v2.sortBy(t => (t._1, t._2)).toSeq == m1.sortBy(t => (t._1, t._2)).toSeq)

    val m4 = Similarity.maxSimTopK(spark, sf0001, 3, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = m4.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5).toSeq, s"q=$q ranks")
      // scores descend with rank and every |per-token cos| <= 1 → |sum| <= 4
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(t => math.abs(t._4) <= 4.0 + 1e-9))
      assert(sorted.forall(_._3 != q), "self in neighbor list")
    }
    // a vector scores its exact duplicate at the m=4 maximum: every
    // subvector cosine is 1, so MaxSim = 4
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf0001)
    val subScores = (0 until 4).map { qi =>
      val qs = slice(col("qv"), qi * 16 + 1, 16)
      (0 until 4).map(ci =>
          graft.functions.ArraySim.cosineNative(qs, slice(col("nv"), ci * 16 + 1, 16)))
        .reduce(greatest(_, _))
    }
    val self = e.select(col("embedding").as("qv"), col("embedding").as("nv"))
      .withColumn("score", subScores.reduce(_ + _))
      .agg(min("score"), max("score")).head()
    assert(math.abs(self.getDouble(0) - 4.0) < 1e-9 &&
      math.abs(self.getDouble(1) - 4.0) < 1e-9)
  }

  test("v21 graph search: per-rank never below IVF at the same nprobe; clustered recall; rerun-stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_v21").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // the containment theorem: v21's pool starts from IVF's candidates
    // (same nprobe) and only grows, every candidate exactly scored — so
    // each rank's score can never fall below plain IVF's
    val ivf = Similarity.annIvf(spark, dir, nprobe = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val gs = Similarity.graphSearchTopK(spark, dir, nprobe = 1).collect()
    val gsm = gs.map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    ivf.foreach { case (key, ivfCos) =>
      assert(gsm.getOrElse(key, -2.0) >= ivfCos - 1e-9,
        s"rank $key: graph ${gsm.get(key)} below IVF $ivfCos")
    }
    // graph expansion recovers what nprobe=1 cell pruning loses
    val brute = Similarity.bruteForceTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    def recallOf(res: Array[org.apache.spark.sql.Row]): Double = {
      val got = res.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rc = brute.map { case (qq, truth) =>
        got.get(qq).map(f => (f intersect truth).size.toDouble / truth.size)
          .getOrElse(0.0)
      }
      rc.sum / rc.size
    }
    val rIvf = recallOf(Similarity.annIvf(spark, dir, nprobe = 1).collect())
    val rGs = recallOf(gs)
    assert(rGs >= rIvf - 1e-9, s"graph recall $rGs below IVF $rIvf")
    assert(rGs >= 0.85, s"graph-search recall $rGs below 0.85 on clustered data")
    // deterministic end to end
    val again = Similarity.graphSearchTopK(spark, dir, nprobe = 1).collect()
    assert(gs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("v22 hierarchy: layers nest with geometric decay and degree cap; clustered recall not below v21; rerun-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(53)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_v22").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // layer assignment: deterministic exponential decay, nested by
    // construction (level >= l implies level >= l-1)
    val levels = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.hnswLevel(4).as("lvl"))
      .groupBy("lvl").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val n = levels.values.sum
    def atLeast(l: Int) = levels.collect { case (lv, c) if lv >= l => c }.sum
    assert(n == 500)
    assert(atLeast(1) > 0, "no node promoted to layer 1")
    // E[|layer l|] = n/4^l; allow generous binomial slack
    assert(atLeast(1) < n / 2, s"layer 1 too big: ${atLeast(1)}")
    assert(atLeast(2) <= atLeast(1) && atLeast(3) <= atLeast(2))
    // search: recall on the clustered fixture not below v21's, both ≥ .85
    val brute = Similarity.bruteForceTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    def recallOf(res: Array[org.apache.spark.sql.Row]): Double = {
      val got = res.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rc = brute.map { case (qq, truth) =>
        got.get(qq).map(f => (f intersect truth).size.toDouble / truth.size)
          .getOrElse(0.0)
      }
      rc.sum / rc.size
    }
    val hs = Similarity.hierarchicalGraphSearch(spark, dir).collect()
    val rHs = recallOf(hs)
    val rV21 = recallOf(Similarity.graphSearchTopK(spark, dir, nprobe = 1).collect())
    assert(rHs >= 0.85, s"hierarchical recall $rHs below 0.85 on clustered data")
    assert(rHs >= rV21 - 0.05, s"hierarchical recall $rHs well below v21 $rV21")
    // rerun-identical (no RNG anywhere in the hierarchy or the search)
    val again = Similarity.hierarchicalGraphSearch(spark, dir).collect()
    assert(hs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("v20: appended index matches a full rebuild's recall on planted clusters") {
    import spark.implicits._
    // v3's planted-cluster fixture shape (different seed): the regime
    // where an index rebuild-vs-append difference would actually show
    val rnd = new scala.util.Random(31)
    val dim = 32
    val centers = Array.fill(25, dim)(rnd.nextGaussian())
    val rows = (0 until 500).map { id =>
      val c = centers(id % 25)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq, id % 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_v20").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def recallOf(res: Array[org.apache.spark.sql.Row]): Double = {
      val brute = Similarity.bruteForceTopK(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val got = res.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rc = brute.map { case (q, truth) =>
        got.get(q).map(f => (f intersect truth).size.toDouble / truth.size)
          .getOrElse(0.0)
      }
      rc.sum / rc.size
    }
    val appended = recallOf(Similarity.annIvfIncremental(spark, dir).collect())
    val rebuilt = recallOf(Similarity.annIvf(spark, dir).collect())
    assert(appended >= 0.9, s"appended-index recall $appended below 0.9")
    assert(appended >= rebuilt - 0.05,
      s"append lost recall vs full rebuild: $appended vs $rebuilt")
  }

  test("v20: per-batch cost is batch-sized and the base segment is immutable") {
    def listing(p: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length, f.lastModified)).toSet
    }
    val st = Similarity.incrementalIvfState(spark, sf0001)
    val baseBefore = listing(st.baseDir)
    val report = Similarity.incrementalIvfMaintenance(spark, sf0001).collect().head
    // the delta write is ∝ batch: its data files number at most one per
    // touched cell per writing task — far below the base segment's —
    // and nothing in the base segment was rewritten or touched
    val deltaFiles = listing(st.deltaDir)
    assert(deltaFiles.nonEmpty && deltaFiles.size <= report.getLong(1),
      s"${deltaFiles.size} delta files for batch of ${report.getLong(1)}")
    assert(listing(st.baseDir) == baseBefore, "append mutated the base segment")
    assert(report.getLong(3) <= report.getLong(1)) // cells_touched <= n_batch
  }

  test("v20: drift gate quiet on the natural batch, fires on a shifted batch") {
    import spark.implicits._
    val natural = Similarity.incrementalIvfMaintenance(spark, sf0001).collect().head
    assert(!natural.getBoolean(6),
      s"gate fired on an in-distribution batch: $natural")
    // shifted batch: every arriving vector collapses to one point → the
    // occupancy lands in one cell, PSI far outside the control noise
    val one = graft.Tables.embeddings(spark, sf0001)
      .select("embedding").head().getSeq[Float](0)
    val shifted = graft.Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id"), typedlit(one).as("embedding"))
    val drifted = Similarity
      .incrementalIvfMaintenance(spark, sf0001, Some(shifted)).collect().head
    assert(drifted.getBoolean(6), s"gate missed a fully-shifted batch: $drifted")
    assert(drifted.getDouble(4) > natural.getDouble(4))
  }

  test("v20: override staging is content-keyed; an empty batch degrades cleanly") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf0001)
    val one = emb.select("embedding").head().getSeq[Float](0)
    // first override: the whole natural batch collapsed to one point
    val big = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id"), typedlit(one).as("embedding"))
    val bigRep = Similarity
      .incrementalIvfMaintenance(spark, sf0001, Some(big)).collect().head
    assert(bigRep.getLong(1) > 1)
    // second, DIFFERENT override in the same JVM: one single vector. A
    // fixed staging tag would silently reuse the first delta and report
    // its cells; content keying must stage this batch on its own.
    val small = emb.filter(col("vec_id") === 7)
      .select(col("vec_id"), typedlit(one).as("embedding"))
    val smallRep = Similarity
      .incrementalIvfMaintenance(spark, sf0001, Some(small)).collect().head
    assert(smallRep.getLong(1) == 1L)
    assert(smallRep.getLong(3) == 1L,
      s"stale delta reused for a different override: $smallRep")
    // empty batch: explicit zero report (not a schema-inference crash),
    // and the gate never fires on nothing
    val emptyRep = Similarity
      .incrementalIvfMaintenance(spark, sf0001, Some(big.limit(0))).collect().head
    assert(emptyRep.getLong(1) == 0L && emptyRep.getLong(3) == 0L)
    assert(emptyRep.getDouble(4) == 0.0 && !emptyRep.getBoolean(6))
  }

  test("st24: stream-ingested delta equals the batch v20 index; search parity is exact") {
    import org.apache.spark.sql.functions._
    val ledger = Similarity.streamingVectorIngest(spark, sf0001).collect()
    assert(ledger.nonEmpty, "no micro-batch was ingested")
    // per-batch boundedness: every micro-batch carried a slice of the
    // arriving set, and the ledger covers the whole batch exactly once
    val st = Similarity.incrementalIvfState(spark, sf0001)
    assert(ledger.map(_.getLong(1)).sum == st.nBatch,
      "ledger batch sizes do not cover the arriving set")
    assert(ledger.length > 1, "stream collapsed to a single micro-batch")
    // stream ≡ batch: the streamed delta holds exactly v20's
    // (vec_id, cell) assignment — same vectors, same frozen geometry
    val streamed = spark.read.parquet(Similarity.streamDeltaDir(sf0001))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = spark.read.parquet(st.deltaDir)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch, "streamed assignment diverges from batch v20")
    // search parity: base + streamed delta answers bit-for-bit what
    // base + batch delta answers
    val viaStream = Similarity.annIvfIncremental(spark, sf0001,
      deltaDirOverride = Some(Similarity.streamDeltaDir(sf0001))).collect()
    val viaBatch = Similarity.annIvfIncremental(spark, sf0001).collect()
    assert(viaStream.toSeq == viaBatch.toSeq,
      "search over the streamed index diverges from the batch index")
    // segment isolation: each micro-batch appended its own files — at
    // least one data file per ledger row across the delta dir
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val nFiles = walk(new java.io.File(Similarity.streamDeltaDir(sf0001)))
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles >= ledger.length,
      s"$nFiles delta files for ${ledger.length} micro-batches")
  }
}
