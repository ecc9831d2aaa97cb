package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("blob pipeline: real BMP decode over the image fixture, deterministic") {
    val blobs = Multimodal.imageBlobTable(spark, sf0001)
    val feats = Multimodal.extractFeatures(blobs).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.features(0) == 10.0 && f.features(1) == 6.0))
    // every fixture is a valid BMP container of the expected size
    assert(feats.forall(_.n_bytes == 246L))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(blobs).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("BMP codec: byte-exact round-trip incl. row padding, corrupt headers rejected") {
    // 3x2 image: width*3 = 9 bytes/row → stride 12, 3 pad bytes per row.
    // Known pixels, BGR: row0 = (1,2,3),(4,5,6),(7,8,9); row1 = 10..18
    val bgr = (1 to 18).map(_.toByte).toArray
    val bmp = Multimodal.bmpEncode(bgr, 3, 2)
    assert(bmp.length == 54 + 12 * 2)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    // bottom-up: first file row is the SECOND image row
    assert(bmp.slice(54, 63).toSeq == (10 to 18).map(_.toByte).toSeq)
    assert(bmp.slice(63, 66).toSeq == Seq[Byte](0, 0, 0)) // padding
    assert(bmp.slice(66, 75).toSeq == (1 to 9).map(_.toByte).toSeq)
    val f = Multimodal.bmpDecode(bmp)
    assert(f(0) == 3.0 && f(1) == 2.0)
    // channel B = bytes {1,4,7,10,13,16} → mean 8.5
    assert(math.abs(f(2) - 8.5) < 1e-12)
    assert(math.abs(f(3) - 9.5) < 1e-12) // G = {2,5,8,11,14,17}
    assert(math.abs(f(4) - 10.5) < 1e-12) // R = {3,6,9,12,15,18}
    // population std of {1,4,7,10,13,16}: mean 8.5, var 26.25
    assert(math.abs(f(5) - math.sqrt(26.25)) < 1e-12)
    // corrupt magic and lying dimensions both throw instead of misreading
    val bad = bmp.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.bmpDecode(bad))
    val lie = bmp.clone()
    lie(18) = 100.toByte // header claims width 100 with a 78-byte payload
    intercept[IllegalArgumentException](Multimodal.bmpDecode(lie))
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

  test("interleaved sequences: empty doc yields an EMPTY manifest, not [0,-1]") {
    import spark.implicits._
    // Spark's sequence(0, -1) is a descending [0, -1]; the operator must
    // guard nt+nb = 0 so both engines fingerprint the empty sequence
    val dir = java.nio.file.Files.createTempDirectory("graft_m7_empty").toString
    Seq((0L, "", "en", "a"), (1L, "alpha beta gamma delta", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.interleavedSequences(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // empty doc: zero items and the md5 of the EMPTY join — what
    // DuckDB's range(0, 0) path computes
    assert(out(0L) == ((0L, 0L, 0L, md5hex(""))))
    // non-empty doc unaffected: 1 text chunk + 1 byte chunk → T0|B0
    assert(out(1L) == ((1L, 1L, 2L, md5hex("T0|B0"))))
  }
}
