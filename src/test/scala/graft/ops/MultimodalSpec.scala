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

  test("m8: nearest resize picks source pixels at (2x,2y); raw decode + padded re-encode round-trip") {
    // planted 4x4 image, 48 distinct bytes → every picked pixel provable
    val bgr = (0 until 48).map(_.toByte).toArray
    val (w, h, raw) = Multimodal.bmpDecodeRaw(Multimodal.bmpEncode(bgr, 4, 4))
    assert(w == 4 && h == 4 && raw.sameElements(bgr))
    val (ow, oh, small) = Multimodal.resizeNearest(raw, 4, 4, 2, 2)
    assert(ow == 2 && oh == 2)
    // out (x,y) = in (2x,2y): pixels (0,0),(2,0),(0,2),(2,2) = byte
    // triples at 0, 6, 24, 30
    val expect = Array(0, 1, 2, 6, 7, 8, 24, 25, 26, 30, 31, 32).map(_.toByte)
    assert(small.sameElements(expect))
    // odd-width re-encode (2*3=6 → stride 8) round-trips byte-exactly
    val (w2, h2, raw2) = Multimodal.bmpDecodeRaw(Multimodal.bmpEncode(small, 2, 2))
    assert(w2 == 2 && h2 == 2 && raw2.sameElements(small))
  }

  test("m8 query: 5x3 geometry and stats equal an independent source-pixel recompute") {
    val out = Multimodal.resizedBlobFeatures(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == 102L && r.getInt(2) == 5 && r.getInt(3) == 3))
    // independent recompute for the first doc straight from the text
    // formula: resized channel means over source pixels at (2x, 2y)
    val doc = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").orderBy("doc_id").head()
    val t = doc.getString(1).getBytes("UTF-8")
    val sums = new Array[Double](3)
    for (py <- 0 until 3; px <- 0 until 5; ch <- 0 until 3) {
      val i = ((2 * py) * 10 + 2 * px) * 3 + ch
      sums(ch) += (t(i % t.length) & 0xFF).toDouble
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = out.find(_.getLong(0) == doc.getLong(0)).get
    for (ch <- 0 until 3)
      assert(math.abs(row.getDouble(4 + ch) - r4(sums(ch) / 15.0)) < 1e-9)
  }

  test("m9: sampled frames slice at f*180 and stats equal the direct byte formula") {
    val out = Multimodal.frameSample(spark, sf0001).collect()
    assert(out.nonEmpty)
    // exactly frames 0, 3, 6 per doc, offsets = 180·f
    val perDoc = out.groupBy(_.getLong(0))
    assert(perDoc.values.forall(rs =>
      rs.map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq ==
        Seq((0, 0L), (3, 540L), (6, 1080L))))
    // independent recompute for the first doc
    val doc = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").orderBy("doc_id").head()
    val t = doc.getString(1).getBytes("UTF-8")
    for (f <- Seq(0, 3, 6)) {
      var sum = 0.0; var sumSq = 0.0
      for (i <- 0 until 180) {
        val v = (t((f * 180 + i) % t.length) & 0xFF).toDouble
        sum += v; sumSq += v * v
      }
      val mean = sum / 180.0
      val std = math.sqrt(sumSq / 180.0 - mean * mean)
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val row = out.find(r => r.getLong(0) == doc.getLong(0) && r.getInt(1) == f).get
      assert(math.abs(row.getDouble(3) - r4(mean)) < 1e-9)
      assert(math.abs(row.getDouble(4) - r4(std)) < 1e-9)
    }
  }

  test("m10: PCM parse round-trips the formula; edge-only trim keeps interior silence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    // corpus docs: planted head/tail silence trimmed, all 6 body frames
    // voiced (every corpus char gives |v| ≥ 460 per sample)
    val out = Multimodal.audioVadTrim(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) == 2048)
      assert(r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 6,
        s"doc ${r.getLong(0)}: expected exactly the planted silence trimmed")
    }
    // int16 LE codec: parsed samples of one payload equal the formula
    val blob = Multimodal.audioBlobTable(spark, sf0001)
      .filter(_.doc_id == 0L).head()
    val txt = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
      .getBytes("UTF-8")
    for (j <- 0 until 256 * 6) {
      val off = 2 * (256 + j)
      val got = ((blob.payload(off) & 0xFF) | (blob.payload(off + 1) << 8))
        .toShort.toInt
      val want = ((txt(j % txt.length) & 0xFF) - 77) * 23
      assert(got == want, s"sample $j: $got != $want")
    }
    for (j <- 0 until 256; side <- Seq(0, 7 * 256)) {
      val off = 2 * (side + j)
      assert(blob.payload(off) == 0 && blob.payload(off + 1) == 0)
    }
    // planted fixture: all-'M' text ⇒ v = 0 everywhere ⇒ fully silent;
    // interior silent frame (chars 256..511 'M') is KEPT — trim is
    // edge-only, the VAD convention
    val dir = java.nio.file.Files.createTempDirectory("graft_m10").toString
    val silent = "M" * 1536
    val interior = "a" * 256 + "M" * 256 + "a" * 1024
    Seq((0L, silent, "en", "a"), (1L, interior, "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = Multimodal.audioVadTrim(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(6))).toMap
    assert(fx(0L) == ((8, 0, 0, 0)), s"all-silent doc: ${fx(0L)}")
    // head = frame 0 only, tail = frame 7 only, kept = 6 frames
    // INCLUDING the silent interior frame 2; peak = |('a'−77)·23| = 460
    assert(fx(1L) == ((1, 1, 6, 460)), s"interior-silence doc: ${fx(1L)}")
  }

  test("fixture contract: the generated corpus is pure ASCII at sf0.001") {
    // The m2/m9/m10 fixtures index UTF-8 BYTES while their DuckDB
    // oracles index CHARACTERS — identical iff the corpus is ASCII.
    // Pin it on the generated data (the EdgeCaseSpec planted docs cover
    // the divergent non-ASCII behavior).
    val nonAscii = graft.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.expr("length(text) != octet_length(text)"))
      .count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII docs break the byte=char contract")
  }
}
