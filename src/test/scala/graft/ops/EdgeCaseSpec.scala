package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input behavior: every operator must return an empty (or
  * singleton) result on empty/singleton tables, never crash — the library
  * contract a pipeline composes against.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  lazy val singletonDir: String = {
    val dir = Files.createTempDirectory("graft_single").toString
    Seq((0L, "the only document in the corpus with some words", "en", "a", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Seq(1f, 2f, 3f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("dedup + text ops return empty on an empty corpus") {
    assert(Dedup.exactDedup(spark, emptyDir).count() == 0)
    assert(Dedup.minhashLshPairs(spark, emptyDir).count() == 0)
    assert(Dedup.simhashPairs(spark, emptyDir).count() == 0)
    assert(Dedup.ngramJaccardPairs(spark, emptyDir).count() == 0)
    assert(Dedup.embeddingNearDupPairs(spark, emptyDir).count() == 0)
    assert(TextAnalysis.corpusPipeline(spark, emptyDir).count() == 0)
    assert(Similarity.annIvf(spark, emptyDir).count() == 0)
    assert(Similarity.bruteForceTopK(spark, emptyDir).count() == 0)
  }

  test("singleton corpus: no self-pairs, pipeline keeps the doc") {
    assert(Dedup.embeddingNearDupPairs(spark, singletonDir).count() == 0)
    assert(Dedup.simhashPairs(spark, singletonDir).count() == 0)
    assert(TextAnalysis.corpusPipeline(spark, singletonDir)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("round-2 ops degrade cleanly on empty and singleton corpora") {
    assert(Dedup.dedupClusters(spark, emptyDir).count() == 0)
    assert(TextAnalysis.contamination(spark, emptyDir).count() == 0)
    assert(TextAnalysis.repetitionSignals(spark, emptyDir).count() == 0)
    assert(TextAnalysis.vocabTopK(spark, emptyDir).count() == 0)
    assert(TextAnalysis.sequencePacking(spark, emptyDir).count() == 0)
    // singleton: one cluster mapping the doc to itself; doc 0 is the
    // benchmark slice (0 % 50 == 0) so contamination output is empty
    assert(Dedup.dedupClusters(spark, singletonDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 0L)))
    assert(TextAnalysis.contamination(spark, singletonDir).count() == 0)
    assert(TextAnalysis.sequencePacking(spark, singletonDir).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq == Seq((0L, 0L)))
  }

  test("round-5 ops degrade cleanly on empty and singleton corpora") {
    // empty: no candidates, no shards, no splits, no heavy hitters
    assert(TextAnalysis.cmsHeavyHitters(spark, emptyDir).count() == 0)
    assert(TextAnalysis.shardAssign(spark, emptyDir).count() == 0)
    assert(TextAnalysis.hashSplit(spark, emptyDir).count() == 0)
    assert(TextAnalysis.trigramCounts(spark, emptyDir).count() == 0)
    assert(Dedup.embeddingKeepList(spark, emptyDir).count() == 0)
    assert(Similarity.mmrDiversifiedTopK(spark, emptyDir).count() == 0)
    // singleton: the one doc is assigned a shard/split/position; the one
    // vector forms its own cluster and is kept
    val sh = TextAnalysis.shardAssign(spark, singletonDir).collect()
    assert(sh.length == 1 && sh.head.getInt(2) == 1)
    assert(TextAnalysis.hashSplit(spark, singletonDir)
      .agg(sum("n_docs")).head.getLong(0) == 1L)
    val keep = Dedup.embeddingKeepList(spark, singletonDir).collect()
    assert(keep.length == 1 && keep.head.getInt(2) == 1) // kept = 1
    // MMR with a pool smaller than k: returns the whole pool, no crash
    // (singleton corpus has zero candidates for its own query)
    assert(Similarity.mmrDiversifiedTopK(spark, singletonDir).count() == 0)
    // trigram short-doc guard: a 2-token doc yields no trigrams at all
    val shortDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft_short").toString
      Seq((0L, "two words", "en", "a", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    assert(TextAnalysis.trigramCounts(spark, shortDir, minCount = 1).count() == 0)
  }

  test("round-6 ops degrade cleanly on empty and singleton inputs") {
    // z-order layout: empty lineitem must degrade to a plain empty
    // write (null min/max guard), not NPE
    val liDir = Files.createTempDirectory("graft_empty_li").toString
    Seq.empty[(Long, Long, Long, Double, String)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$liDir/lineitem.parquet")
    val zout = graft.sources.Sources.zorderLayoutDir(spark, liDir)
    assert(spark.read.parquet(zout).count() == 0)
    // blob chunking: empty corpus → no chunks; a sub-chunk-size doc → 1
    assert(Multimodal.chunkTable(spark, emptyDir).count() == 0)
    assert(Multimodal.blobChunks(spark, singletonDir).count() == 1)
    // two-pass cumulative on an empty frame: empty out, no crash (the
    // prefix-offset map is empty)
    val emptyRt = Cumulative.runningTotal(
      Seq.empty[(Long, Long)].toDF("k", "cents"), "cents",
      Seq(desc("cents")), "cum")
    assert(emptyRt.count() == 0)
    // funnel fold with zero anchors: every step count is zero, not null
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    val noAnchors = noEvents.select(col("event_id").as("anchor_id"),
      col("user_id"), col("ts"))
    val f = Funnel.boundedSequence(noEvents, noAnchors,
      Seq(("click", "1 HOUR"))).head()
    assert(f.getLong(0) == 0 && f.getLong(1) == 0)
  }

  test("multimodal fixtures on empty and non-ASCII text: guarded, byte-indexed") {
    // The m2/m9/m10 byte-generation fixtures index UTF-8 BYTES of the
    // text; the DuckDB oracles index CHARACTERS. The contract: empty
    // text maps to one zero byte (never mod-by-zero), and the two views
    // agree exactly on ASCII corpora (MultimodalSpec pins the generated
    // corpus IS ASCII). Here: both degenerate inputs run
    // clean, and the non-ASCII divergence is exactly byte-indexing.
    val nonAscii = "héllo wörld — naïve café"
    val dir = Files.createTempDirectory("graft_mm_edge").toString
    Seq((0L, "", "en", "a", 0L), (1L, nonAscii, "fr", "a", nonAscii.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // m2: empty doc decodes to an all-zero image (mean 0, std 0);
    // non-ASCII doc's channel means match an independent BYTE recompute
    val feats = Multimodal.blobFeatures(spark, dir).collect()
    assert(feats.length == 2)
    val f0 = feats.find(_.getLong(0) == 0L).get
    assert(f0.getDouble(4) == 0.0 && f0.getDouble(7) == 0.0,
      s"empty text should render an all-zero image: $f0")
    val bytes = nonAscii.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bgr = Array.tabulate(Multimodal.imgW * Multimodal.imgH * 3)(
      i => bytes(i % bytes.length) & 0xFF)
    val n = (Multimodal.imgW * Multimodal.imgH).toDouble
    val meanB = bgr.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v }
      .sum / n
    val f1 = feats.find(_.getLong(0) == 1L).get
    assert(math.abs(f1.getDouble(4) - math.rint(meanB * 1e4) / 1e4) < 1e-9,
      s"non-ASCII image features must be byte-indexed: ${f1.getDouble(4)} vs $meanB")

    // m9: 3 sampled frames per doc either way; empty doc's frames are silent
    val frames = Multimodal.frameSample(spark, dir).collect()
    assert(frames.length == 6)
    assert(frames.filter(_.getLong(0) == 0L).forall(r =>
      r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))

    // m10: empty doc's body bytes are all zero → sample (0−77)·23, every
    // body frame voiced → edge frames (the planted silence) trimmed
    val vad = Multimodal.audioVadTrim(spark, dir).collect()
    assert(vad.length == 2)
    vad.foreach { r =>
      assert(r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 6,
        s"VAD trim should cut exactly the planted edge silence: $r")
    }
    assert(vad.find(_.getLong(0) == 0L).get.getInt(6) == 77 * 23)
  }
}
