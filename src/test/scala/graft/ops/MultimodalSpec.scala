package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("blob pipeline: schema, batch map, deterministic stub features") {
    val blobs = Multimodal.blobTable(spark, sf0001)
    val feats = Multimodal.extractFeatures(blobs).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == 16))
    // histogram is normalized: bins sum to ~1 for non-empty payloads
    assert(feats.filter(_.n_bytes > 0).forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(blobs).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("decode stub: known byte histogram") {
    val f = Multimodal.decodeStub("AAAA".getBytes("UTF-8")) // 'A'=65 → bin 4
    assert(f(4) == 1f && f.sum == 1f)
  }

  test("binaryFile ingest round-trips file bytes (sha256 parity with blob table)") {
    val viaFiles = Multimodal.binaryFileIngest(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val viaTable = Multimodal.blobMeta(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(viaFiles.size == 50)
    assert(viaFiles == viaTable)
  }

  test("blob chunks reassemble byte-for-byte; every chunk digest verifies") {
    import org.apache.spark.sql.functions._
    // 50-doc bounded sample: reassembly is a driver-side identity check,
    // the distributed fan-out itself is oracled (m5)
    val chunks = Multimodal.chunkTable(spark, sf0001)
      .filter(col("doc_id") < 50)
      .select("doc_id", "chunk_idx", "chunk", "chunk_md5", "chunk_len")
      .collect()
      .groupBy(_.getLong(0))
    val originals = Multimodal.blobTable(spark, sf0001)
      .filter(col("doc_id") < 50 && col("n_bytes") > 0).collect()
      .map(b => b.doc_id -> b.payload).toMap
    assert(chunks.keySet == originals.keySet, "chunk fan-out lost or invented docs")
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      // contiguity: every chunk except the last is full-size
      ordered.dropRight(1).foreach(r =>
        assert(r.getLong(4) == Multimodal.chunkSize, s"doc $id has a short interior chunk"))
      val reassembled = ordered.flatMap(_.getAs[Array[Byte]]("chunk"))
      assert(java.util.Arrays.equals(reassembled, originals(id)),
        s"doc $id does not reassemble byte-for-byte")
      // per-chunk digests verify independently
      val mdig = java.security.MessageDigest.getInstance("MD5")
      ordered.foreach { r =>
        val hex = mdig.digest(r.getAs[Array[Byte]]("chunk"))
          .map("%02x".format(_)).mkString
        assert(hex == r.getString(3), s"doc $id chunk ${r.getLong(1)} digest mismatch")
      }
    }
  }

  test("pair alignment: positives are the anchor's own blob, negatives never are") {
    val rows = Multimodal.pairAlignment(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(5)))
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong == 3 * n)
    val (pos, neg) = rows.partition(_._2 == "pos")
    // every positive pairs the anchor with its own blob and is aligned
    assert(pos.length.toLong == n)
    pos.foreach { case (a, _, b, al) => assert(a == b && al == 1) }
    // negatives never self-pair, and each anchor gets 2 distinct ones
    neg.foreach { case (a, _, b, _) => assert(a != b) }
    neg.groupBy(_._1).foreach { case (a, ns) =>
      assert(ns.map(_._3).distinct.length == 2, s"anchor $a negatives collide")
    }
    // the false-negative rate is measurable and below 1 (langs vary)
    assert(neg.exists(_._4 == 0))
  }
}
