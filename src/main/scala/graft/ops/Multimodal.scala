package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * Real pipelines carry image/audio/video as `binary` columns with a
  * metadata struct, and run decode/feature-extract as partition-batched
  * functions (in PySpark: Pandas UDFs over mapInPandas; the Scala
  * equivalent is a typed mapPartitions over an iterator, which gives the
  * same batch-amortized shape). The decode step is REAL: a 24-bit
  * uncompressed BMP codec ([[bmpEncode]]/[[bmpDecode]] — header parse,
  * bottom-up row order, 4-byte row padding) needing no external
  * libraries; the fixtures are valid BMP files whose pixels derive
  * deterministically from document text, so the decoded per-channel
  * statistics are fully DuckDB-oracle-able.
  */
object Multimodal {
  import Tables._

  final case class Blob(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  final case class BlobFeatures(doc_id: Long, mime: String, n_bytes: Long, features: Array[Float])

  /** Synthesize a blob table from documents: payload = UTF-8 bytes (the
    * deterministic stand-in for real image/audio bytes) + typed metadata.
    */
  def blobTable(s: SparkSession, d: String): Dataset[Blob] = {
    import s.implicits._
    documents(s, d)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("text/plain;lang="), col("lang")).as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[Blob]
  }

  // ---- real BMP codec (Windows BITMAPINFOHEADER, 24bpp, BI_RGB) ----

  /** Encode raw BGR pixel bytes (row-major, top-down, 3 bytes/pixel) as
    * a valid 24-bit uncompressed BMP: 54-byte header, rows written
    * BOTTOM-UP, each row zero-padded to a 4-byte boundary — the public
    * format spec, not a container-specific fake.
    */
  def bmpEncode(bgr: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(bgr.length == w * h * 3, s"need ${w * h * 3} bytes, got ${bgr.length}")
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val out = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h) // positive height = bottom-up rows
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // file order: last image row first
      out.put(bgr, y * w * 3, w * 3)
      var p = w * 3
      while (p < stride) { out.put(0.toByte); p += 1 }
      y -= 1
    }
    out.array()
  }

  /** Decode a 24-bit uncompressed BMP to per-channel statistics:
    * [width, height, meanB, meanG, meanR, stdB, stdG, stdR]
    * (population std). Validates magic/bpp/compression and walks the
    * padded bottom-up rows — a header lie about dimensions throws
    * rather than reading garbage. Sums are exact integers in double
    * (pixel counts ≪ 2⁵³), so the statistics are bit-identical to any
    * engine computing the same definition — what makes m2 oracle-able.
    */
  def bmpDecode(payload: Array[Byte]): Array[Double] = {
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP container")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0, s"unsupported BMP: $bpp bpp, compression $compression")
    val stride = (w * 3 + 3) / 4 * 4
    require(w > 0 && h > 0 && offset.toLong + stride.toLong * h <= payload.length,
      s"BMP header dimensions ${w}x$h exceed payload")
    val sum = new Array[Double](3)
    val sumSq = new Array[Double](3)
    var y = 0
    while (y < h) {
      val rowOff = offset + (h - 1 - y) * stride // bottom-up file rows
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val v = (payload(rowOff + x * 3 + c) & 0xFF).toDouble
          sum(c) += v; sumSq(c) += v * v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    Array(w.toDouble, h.toDouble,
      sum(0) / n, sum(1) / n, sum(2) / n,
      math.sqrt(sumSq(0) / n - (sum(0) / n) * (sum(0) / n)),
      math.sqrt(sumSq(1) / n - (sum(1) / n) * (sum(1) / n)),
      math.sqrt(sumSq(2) / n - (sum(2) / n) * (sum(2) / n)))
  }

  private[graft] val imgW = 10 // stride 30 → padded to 32: every row
  private[graft] val imgH = 6  // exercises the 4-byte padding path

  /** Deterministic image fixture: each document renders to a valid
    * 10×6 24-bit BMP whose BGR byte i (logical row-major order) is the
    * text's byte at i mod len — a pure function of the text, so an
    * oracle recomputes the decoded statistics without parsing BMP.
    *
    * Fixture contract: the oracle indexes CHARACTERS via
    * `ascii(substr(text, (i % L)+1, 1))`, so text is assumed ASCII
    * (one byte per char — true of the generated corpus at every SF,
    * verified 0 non-ASCII docs). An EMPTY text maps to a single zero
    * byte (`coalesce(nullif(text,''), chr(0))` on the oracle side)
    * instead of dividing by zero.
    */
  def imageBlobTable(s: SparkSession, d: String): Dataset[Blob] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val t = if (raw.isEmpty) Array[Byte](0) else raw
        val bgr = new Array[Byte](imgW * imgH * 3)
        var i = 0
        while (i < bgr.length) { bgr(i) = t(i % t.length); i += 1 }
        val bmp = bmpEncode(bgr, imgW, imgH)
        Blob(id, bmp, "image/bmp", bmp.length.toLong)
      }
  }

  /** Decode a 24-bit uncompressed BMP to raw top-down row-major BGR
    * bytes (the codec's inverse of [[bmpEncode]]): header
    * validate, un-pad, flip the bottom-up file rows back to image
    * order. Returns (width, height, bgr).
    */
  def bmpDecodeRaw(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP container")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(buf.getShort(28) == 24 && buf.getInt(30) == 0, "unsupported BMP")
    val stride = (w * 3 + 3) / 4 * 4
    require(w > 0 && h > 0 && offset.toLong + stride.toLong * h <= payload.length,
      s"BMP header dimensions ${w}x$h exceed payload")
    val bgr = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(payload, offset + (h - 1 - y) * stride, bgr, y * w * 3, w * 3)
      y += 1
    }
    (w, h, bgr)
  }

  /** Nearest-neighbor integer-factor downsample of raw BGR pixels:
    * output pixel (x, y) = input pixel (fx·x, fy·y) — the standard
    * nearest resize with scale 1/f and top-left anchoring, pure integer
    * indexing so the resampled image is a deterministic function of the
    * source (what makes m8 oracle-able).
    */
  def resizeNearest(bgr: Array[Byte], w: Int, h: Int, fx: Int, fy: Int): (Int, Int, Array[Byte]) = {
    require(fx > 0 && fy > 0 && w >= fx && h >= fy, s"bad resize factor ${fx}x$fy for ${w}x$h")
    val ow = w / fx
    val oh = h / fy
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val src = ((y * fy) * w + x * fx) * 3
        val dst = (y * ow + x) * 3
        out(dst) = bgr(src); out(dst + 1) = bgr(src + 1); out(dst + 2) = bgr(src + 2)
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  final case class BlobStats(doc_id: Long, mime: String, n_bytes: Long,
      features: Array[Double])

  /** Partition-batched feature extraction: rows stream through the
    * decoder per partition (the mapInPandas batch shape) — a narrow
    * map, no shuffle, setup cost amortized over the partition.
    */
  def extractFeatures(blobs: Dataset[Blob]): Dataset[BlobStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map(b => BlobStats(b.doc_id, b.mime, b.n_bytes, bmpDecode(b.payload)))
    }
  }

  /** Metadata + content hash over the binary column (oracle-able: byte
    * length and SHA-256 agree with DuckDB over the same payload).
    */
  def blobMeta(s: SparkSession, d: String): DataFrame =
    blobTable(s, d).toDF()
      .select(
        col("doc_id"),
        col("mime"),
        col("n_bytes"),
        sha2(col("payload"), 256).as("sha256"))
      .orderBy("doc_id")

  /** m2 — feature-extract query: every doc's fixture BMP decoded by the
    * REAL codec, per-channel mean/std surfaced as columns. Fully
    * oracled: Spark's numbers come from encode→parse-header→walk padded
    * bottom-up rows; DuckDB's from the pixel-generation formula applied
    * to the text directly — agreement proves the whole encode/decode
    * round-trip, not just the arithmetic.
    */
  def blobFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(imageBlobTable(s, d)).toDF()
      .select(
        col("doc_id"),
        col("n_bytes"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        round(element_at(col("features"), 3), 4).as("mean_b"),
        round(element_at(col("features"), 4), 4).as("mean_g"),
        round(element_at(col("features"), 5), 4).as("mean_r"),
        round(element_at(col("features"), 6), 4).as("std_b"),
        round(element_at(col("features"), 7), 4).as("std_g"),
        round(element_at(col("features"), 8), 4).as("std_r"))
      .orderBy("doc_id")

  /** m8 — IMAGE RESIZE through the full codec chain: every fixture BMP
    * is decoded to raw pixels ([[bmpDecodeRaw]]), downsampled 2× by
    * nearest-neighbor ([[resizeNearest]] — 10×6 → 5×3), re-ENCODED as a
    * valid BMP (stride 15 pads to 16, so the resized file exercises the
    * 4-byte padding path too), then decoded AGAIN for per-channel
    * statistics. The whole decode→resize→encode→decode chain runs as
    * one narrow `mapPartitions` batch (the mapInPandas shape) — no
    * shuffle, setup amortized per partition, scan-speed at 100 TB.
    * Fully oracled: DuckDB recomputes the statistics over the SOURCE
    * pixels at even coordinates straight from the pixel-generation
    * formula — agreement proves decode, the resample geometry, and the
    * re-encode round-trip in one artifact.
    */
  def resizedBlobFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imageBlobTable(s, d)
      .mapPartitions { it =>
        it.map { b =>
          val (w, h, raw) = bmpDecodeRaw(b.payload)
          val (ow, oh, small) = resizeNearest(raw, w, h, 2, 2)
          val resized = bmpEncode(small, ow, oh)
          BlobStats(b.doc_id, b.mime, resized.length.toLong, bmpDecode(resized))
        }
      }
      .toDF()
      .select(
        col("doc_id"),
        col("n_bytes"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        round(element_at(col("features"), 3), 4).as("mean_b"),
        round(element_at(col("features"), 4), 4).as("mean_g"),
        round(element_at(col("features"), 5), 4).as("mean_r"),
        round(element_at(col("features"), 6), 4).as("std_b"),
        round(element_at(col("features"), 7), 4).as("std_g"),
        round(element_at(col("features"), 8), 4).as("std_r"))
      .orderBy("doc_id")
  }

  // ---- m9: frame sampling over a video-shaped payload ----

  private[graft] val frameBytes = 180 // one raw 10×6 BGR frame
  private[graft] val nFrames = 8
  private[graft] val frameStride = 3 // sample frames 0, 3, 6

  /** Deterministic video fixture: each document renders to an 8-frame
    * "video" of raw 180-byte BGR frames concatenated back-to-back
    * (byte j of the stream = text byte j mod len — the m2 formula over
    * a longer stream). No container header: raw concatenated frames,
    * the layout video decode pipelines see after demux.
    *
    * Fixture contract (m2's, shared): the oracle indexes CHARACTERS, so
    * text is assumed ASCII (true of the generated corpus at every SF);
    * empty text maps to a single zero byte — never a mod-by-zero. Both
    * pinned in EdgeCaseSpec on planted empty/non-ASCII docs.
    */
  def videoBlobTable(s: SparkSession, d: String): Dataset[Blob] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val t = if (raw.isEmpty) Array[Byte](0) else raw
        val video = new Array[Byte](frameBytes * nFrames)
        var i = 0
        while (i < video.length) { video(i) = t(i % t.length); i += 1 }
        Blob(id, video, "video/raw-bgr", video.length.toLong)
      }
  }

  final case class FrameStats(doc_id: Long, frame_idx: Int, offset: Long,
      mean: Double, std: Double)

  /** m9 — FRAME SAMPLING: from each video payload take every 3rd frame
    * (0, 3, 6 of 8) and compute per-frame byte statistics — the
    * keyframe-extraction shape of a video training pipeline (decode
    * only the sampled frames, never the whole stream). A pure narrow
    * flatMap: one input row → |sampled frames| rows, frame bytes
    * sliced by offset from the payload, no shuffle anywhere. Sums are
    * exact integers in double, so fully oracled — DuckDB recomputes
    * each sampled frame's statistics from the byte-generation formula.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoBlobTable(s, d)
      .flatMap { b =>
        (0 until nFrames by frameStride).iterator.map { f =>
          val off = f * frameBytes
          var sum = 0.0
          var sumSq = 0.0
          var i = 0
          while (i < frameBytes) {
            val v = (b.payload(off + i) & 0xFF).toDouble
            sum += v; sumSq += v * v
            i += 1
          }
          val n = frameBytes.toDouble
          FrameStats(b.doc_id, f, off.toLong, sum / n,
            math.sqrt(sumSq / n - (sum / n) * (sum / n)))
        }
      }
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("offset"),
        round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"))
      .orderBy("doc_id", "frame_idx")
  }

  // ---- m10: audio frame energy + VAD-style silence trim ----

  private[graft] val audioFrameSamples = 256 // samples per analysis frame
  private[graft] val nAudioFrames = 8        // frames per payload
  private[graft] val vadThreshold = 1000L    // Σ|sample| below ⇒ silence

  /** Deterministic audio fixture: each document renders to a 16-bit
    * little-endian PCM mono payload of 8 × 256-sample frames. Frames 0
    * and 7 are planted digital silence (all-zero samples — the lead-in /
    * lead-out a recording pipeline trims); body frames 1–6 carry samples
    * v_j = (textByte(j mod len) − 77) · 23 over body sample index j —
    * the m2/m9 formula discipline, centered so speech-band frames have
    * large energy. Real int16 LE encode: the operator must parse it back.
    *
    * Fixture contract (m2's, shared): oracle indexes CHARACTERS ⇒ text
    * assumed ASCII (true of the generated corpus at every SF); empty
    * text → single zero byte, never mod-by-zero. EdgeCaseSpec-pinned.
    */
  def audioBlobTable(s: SparkSession, d: String): Dataset[Blob] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val t = if (raw.isEmpty) Array[Byte](0) else raw
        val nBody = audioFrameSamples * (nAudioFrames - 2)
        val pcm = new Array[Byte](2 * audioFrameSamples * nAudioFrames)
        var j = 0
        while (j < nBody) {
          val v = ((t(j % t.length) & 0xFF) - 77) * 23
          val off = 2 * (audioFrameSamples + j) // frame 0 stays zero
          pcm(off) = (v & 0xFF).toByte          // little-endian int16
          pcm(off + 1) = ((v >> 8) & 0xFF).toByte
          j += 1
        }
        Blob(id, pcm, "audio/pcm-s16le", pcm.length.toLong)
      }
  }

  final case class AudioVad(doc_id: Long, n_samples: Int, head_trimmed: Int,
      tail_trimmed: Int, kept_frames: Int, mean_energy: Double, peak: Int)

  /** m10 — AUDIO frame energy + silence trim (VAD-lite): parse the 16-bit
    * PCM payload, frame it into 8 × 256-sample windows, compute per-frame
    * energy Σ|sample| as an exact integer, and trim leading/trailing
    * frames below the energy threshold — the lead-in/lead-out silence cut
    * every speech/audio training pipeline runs before feature extraction
    * (interior quiet frames are KEPT: trimming is edge-only, the VAD
    * convention). Output per doc: trim accounting, mean |amplitude| per
    * kept sample, and the peak |sample|.
    *
    * Shape at scale: one narrow map over the payload column — decode,
    * frame, trim all inside the row, no shuffle anywhere; at 100 TB this
    * is scan-speed like m2/m9. Exact-integer energies make it FULLY
    * oracled: DuckDB recomputes every frame's energy from the
    * byte-generation formula while Spark round-trips encode → int16
    * parse → frame walk — agreement proves the PCM codec and the trim
    * rule end-to-end (the only doubles divide identical integers).
    */
  def audioVadTrim(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioBlobTable(s, d)
      .map { b =>
        val n = b.payload.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) { // int16 LE parse
          samples(i) =
            ((b.payload(2 * i) & 0xFF) | (b.payload(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        val nf = n / audioFrameSamples
        val energy = new Array[Long](nf)
        i = 0
        while (i < n) {
          energy(i / audioFrameSamples) += math.abs(samples(i)).toLong
          i += 1
        }
        val voiced = (0 until nf).filter(energy(_) >= vadThreshold)
        if (voiced.isEmpty) AudioVad(b.doc_id, n, nf, 0, 0, 0.0, 0)
        else {
          val f0 = voiced.head
          val f1 = voiced.last
          val kept = f1 - f0 + 1
          var e = 0L
          var peak = 0
          var f = f0
          while (f <= f1) {
            e += energy(f)
            var k = f * audioFrameSamples
            val end = (f + 1) * audioFrameSamples
            while (k < end) {
              val a = math.abs(samples(k)); if (a > peak) peak = a; k += 1
            }
            f += 1
          }
          AudioVad(b.doc_id, n, f0, nf - 1 - f1, kept,
            e.toDouble / (kept.toLong * audioFrameSamples).toDouble, peak)
        }
      }
      .toDF()
      .withColumn("mean_energy", round(col("mean_energy"), 4))
      .orderBy("doc_id")
  }

  /** Real binary-asset ingest: spark.read.format("binaryFile") over a
    * generated fixture dir (one file per document, bytes = the UTF-8 text
    * — the deterministic stand-in for real image/audio files), doc_id
    * recovered from the filename, content verified by byte length +
    * SHA-256 against the documents table (the oracle recomputes both).
    * At scale this is THE ingest path for raw assets: a distributed
    * directory scan, no driver materialization of content — only the
    * bounded fixture generation here touches the driver.
    */
  def binaryFileIngest(s: SparkSession, d: String, maxDocs: Int = 50): DataFrame = {
    val dir = java.nio.file.Paths.get(
      graft.Tables.scratchDir("graft_blobs", d))
    // bounded fixture generation (maxDocs small files); fresh dir so a
    // previous run with different contents can't pollute the scan
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir) // close: walk holds open dir handles
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(dir)
    documents(s, d).filter(col("doc_id") < maxDocs)
      .select("doc_id", "text").collect()
      .foreach { r =>
        java.nio.file.Files.write(
          dir.resolve(f"doc_${r.getLong(0)}%06d.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    s.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("sha256"))
      .orderBy("doc_id")
  }

  /** m4 — binary content dedup: group blobs by payload digest, keep the
    * min-id copy — d1's exact dedup re-expressed over the BINARY column
    * (a petabyte image store dedups on content hash before any decode;
    * the digest groupBy shuffles 16-byte hashes, never payloads). The
    * shuffle carries md5(payload), so at 100 TB the wide op is
    * hash-sized; payloads stay columnar in the scan. Oracled because the
    * fixture payload is the document's UTF-8 bytes — DuckDB's md5 over
    * the text computes the identical digest.
    */
  def blobDedup(s: SparkSession, d: String): DataFrame =
    blobTable(s, d).toDF()
      .groupBy(md5(col("payload")).as("content_md5"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"),
        max("n_bytes").as("n_bytes"))
      .orderBy("keeper_id")

  /** Fixed-size byte chunks per blob — the shard-and-stream layout for
    * feeding oversized payloads (video segments, long audio) through
    * per-batch decoders without materializing whole blobs in one task's
    * memory. A pure NARROW generator: sequence+explode fans each row into
    * ceil(n/chunkSize) chunk rows, `substring` slices the payload
    * column-side (codegen'd, no UDF), nothing shuffles. Chunk rows carry
    * (idx, offset, len, md5) so a downstream consumer can both address
    * and verify any range independently.
    */
  private[graft] val chunkSize = 4096

  private[graft] def chunkTable(s: SparkSession, d: String): DataFrame =
    blobTable(s, d).toDF()
      .filter(col("n_bytes") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        ceil(col("n_bytes").cast("double") / chunkSize).cast("long") - 1)))
      .withColumn("offset", col("chunk_idx") * chunkSize)
      .withColumn("chunk",
        expr(s"substring(payload, chunk_idx * $chunkSize + 1, $chunkSize)"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .withColumn("chunk_md5", md5(col("chunk")))

  /** m5 — the declared chunk accounting: every chunk's index, byte
    * offset, and length. The oracle recomputes the fan-out from
    * octet_length arithmetic; the BYTE-level identity (chunks reassemble
    * to the exact payload, digests equal) is pinned in MultimodalSpec —
    * DuckDB 1.0 has no BLOB substring/md5, so that half lives in the
    * spec rather than the SQL twin.
    */
  def blobChunks(s: SparkSession, d: String): DataFrame =
    chunkTable(s, d)
      .select(col("doc_id"), col("chunk_idx"), col("offset"), col("chunk_len"))
      .orderBy("doc_id", "chunk_idx")

  /** m6 — contrastive TEXT↔BLOB pair assembly: for every document, its
    * aligned blob (the positive) plus `negs` deterministic in-batch
    * negatives — the training-pair plumbing behind every CLIP-style
    * multimodal run. Negative choice is a PURE FUNCTION of
    * (doc_id, pair index): blob of the doc at a fixed modular offset in
    * the dense id space (o15's dictionary encode is what guarantees
    * density at scale), so resampling is rerun-stable, needs no RNG
    * state, and — unlike hash-ring or shuffled-window sampling — no
    * global sort. Each negative carries an `aligned` flag recomputed
    * from metadata (language match): contrastive batches tolerate the
    * occasional false negative and the flag makes that rate measurable.
    * Shape at scale: one explode (×(negs+1), narrow), one hash join of
    * pairs to the blob side on blob_id, a broadcast 1-row extent
    * aggregate; no shuffle beyond the join.
    */
  def pairAlignment(s: SparkSession, d: String, negs: Int = 2): DataFrame = {
    val blobs = blobTable(s, d).toDF()
      .select(col("doc_id").as("blob_id"), col("mime"),
        col("n_bytes"), sha2(col("payload"), 256).as("sha256"))
    val docs = documents(s, d).select(col("doc_id"), col("lang"))
    val extent = docs.agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"))
    docs.crossJoin(broadcast(extent))
      .withColumn("k", explode(sequence(lit(0), lit(negs))))
      .withColumn("off",
        when(col("k") === 0, 0L)
          .otherwise(
            when(pmod(col("k") * 7919L, col("n_docs")) === 0, 1L)
              .otherwise(pmod(col("k") * 7919L, col("n_docs")))))
      .withColumn("blob_id",
        col("min_id") + pmod(col("doc_id") - col("min_id") + col("off"),
          col("n_docs")))
      .join(blobs, "blob_id")
      .select(
        col("doc_id").as("anchor_id"),
        when(col("k") === 0, "pos")
          .otherwise(concat(lit("neg"), col("k"))).as("pair_type"),
        col("blob_id"), col("sha256"), col("n_bytes"),
        (col("mime") === concat(lit("text/plain;lang="), col("lang")))
          .cast("int").as("aligned"))
      .orderBy("anchor_id", "pair_type")
  }

  /** m7 — INTERLEAVED multimodal sequence assembly (the MMC4/OBELICS
    * document shape): each doc's text segments and its blob's byte
    * patches zipped into one deterministic training-sequence manifest —
    * alternate T/B while both modalities have items, then append the
    * longer tail. The manifest is pure item-label arithmetic (counts
    * from n_chars / octet_length, no payload bytes move), built by a
    * narrow `transform(sequence(...))` generator and fingerprinted with
    * md5 so any consumer can verify the interleave order it was handed —
    * and so the WHOLE sequence, order included, is hash-oracled against
    * DuckDB's identical list_transform. Segment sizes are
    * model-specific knobs (128 chars ≈ a 32-token text turn, 256-byte
    * patches); nothing in the shape depends on them.
    */
  def interleavedSequences(s: SparkSession, d: String, textChunk: Int = 128,
      byteChunk: Int = 256): DataFrame = {
    val base = blobTable(s, d).toDF().select(col("doc_id"), col("n_bytes"))
      .join(documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("nt", ceil(col("n_chars") / lit(textChunk.toDouble)).cast("long"))
      .withColumn("nb", ceil(col("n_bytes") / lit(byteChunk.toDouble)).cast("long"))
      .withColumn("m", least(col("nt"), col("nb")))
    // Guard the empty doc: Spark's sequence(0, -1) yields a DESCENDING
    // [0,-1] while DuckDB's range(0, 0) is empty — for nt+nb = 0 the two
    // engines would fingerprint different manifests. Unreachable in the
    // current fixtures, but the operator contract is "empty doc → empty
    // sequence", so say it in the plan.
    val itemsRaw = transform(sequence(lit(0L), col("nt") + col("nb") - 1), p =>
      when(p < col("m") * 2,
        when(p % 2 === 0, concat(lit("T"), floor(p / 2).cast("string")))
          .otherwise(concat(lit("B"), floor(p / 2).cast("string"))))
        .otherwise(
          when(col("nt") > col("nb"),
            concat(lit("T"), (p - col("nb")).cast("string")))
            .otherwise(concat(lit("B"), (p - col("nt")).cast("string")))))
    val items = when(col("nt") + col("nb") > 0, itemsRaw)
      .otherwise(array().cast("array<string>"))
    base
      .select(col("doc_id"), col("nt").as("n_text"), col("nb").as("n_blob"),
        (col("nt") + col("nb")).as("n_items"),
        md5(concat_ws("|", items)).as("seq_md5"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("m8_resize", resizedBlobFeatures, Some(
      // source pixel of resized (px, py, ch) is ((2·py)·10 + 2·px)·3 + ch
      // of the generation formula — decode + resample geometry + re-encode
      // all proven by agreement with Spark's codec chain
      """WITH t AS (
        |  SELECT doc_id, coalesce(nullif(text, ''), chr(0)) AS tx FROM documents),
        |b AS (
        |  SELECT doc_id, j % 3 AS ch,
        |    ascii(substr(tx,
        |      ((((2 * (j // 15)) * 10 + 2 * ((j // 3) % 5)) * 3 + j % 3)
        |        % length(tx)) + 1, 1)) AS v
        |  FROM t, unnest(range(0, 45)) r(j)),
        |g AS (
        |  SELECT doc_id, ch, CAST(sum(v) AS DOUBLE) AS sv,
        |    CAST(sum(v * v) AS DOUBLE) AS sv2
        |  FROM b GROUP BY doc_id, ch)
        |SELECT doc_id, CAST(102 AS BIGINT) AS n_bytes,
        |  5 AS width, 3 AS height,
        |  round(max(CASE WHEN ch = 0 THEN sv END) / 15.0, 4) AS mean_b,
        |  round(max(CASE WHEN ch = 1 THEN sv END) / 15.0, 4) AS mean_g,
        |  round(max(CASE WHEN ch = 2 THEN sv END) / 15.0, 4) AS mean_r,
        |  round(sqrt(max(CASE WHEN ch = 0 THEN sv2 END) / 15.0
        |    - (max(CASE WHEN ch = 0 THEN sv END) / 15.0)
        |      * (max(CASE WHEN ch = 0 THEN sv END) / 15.0)), 4) AS std_b,
        |  round(sqrt(max(CASE WHEN ch = 1 THEN sv2 END) / 15.0
        |    - (max(CASE WHEN ch = 1 THEN sv END) / 15.0)
        |      * (max(CASE WHEN ch = 1 THEN sv END) / 15.0)), 4) AS std_g,
        |  round(sqrt(max(CASE WHEN ch = 2 THEN sv2 END) / 15.0
        |    - (max(CASE WHEN ch = 2 THEN sv END) / 15.0)
        |      * (max(CASE WHEN ch = 2 THEN sv END) / 15.0)), 4) AS std_r
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    QueryDef("m10_audio_vad", audioVadTrim, Some(
      // DuckDB recomputes every frame's energy from the byte-generation
      // formula (never touching the payload); agreement proves the int16
      // LE encode→parse round-trip, the framing, and the trim rule.
      // Frames 0 and 7 are planted silence; body sample j (frames 1–6)
      // is (ascii(text[j mod L]) − 77)·23, energies exact integers.
      """WITH t AS (
        |  SELECT doc_id, coalesce(nullif(text, ''), chr(0)) AS tx FROM documents),
        |b AS (
        |  SELECT doc_id, 1 + j // 256 AS frame,
        |    (ascii(substr(tx, (j % length(tx)) + 1, 1)) - 77) * 23 AS v
        |  FROM t, unnest(range(0, 1536)) r(j)),
        |fe AS (
        |  SELECT t.doc_id, f.frame, coalesce(e.energy, 0) AS energy
        |  FROM t CROSS JOIN (SELECT unnest(range(0, 8)) AS frame) f
        |  LEFT JOIN (
        |    SELECT doc_id, frame, sum(abs(v)) AS energy FROM b GROUP BY 1, 2) e
        |    ON e.doc_id = t.doc_id AND e.frame = f.frame),
        |span AS (
        |  SELECT doc_id, min(frame) AS f0, max(frame) AS f1
        |  FROM fe WHERE energy >= 1000 GROUP BY doc_id),
        |kept AS (
        |  SELECT fe.doc_id, sum(fe.energy) AS e, s.f1 - s.f0 + 1 AS kf
        |  FROM fe JOIN span s ON fe.doc_id = s.doc_id
        |  WHERE fe.frame BETWEEN s.f0 AND s.f1
        |  GROUP BY fe.doc_id, s.f0, s.f1),
        |pk AS (
        |  SELECT b.doc_id, max(abs(v)) AS peak
        |  FROM b JOIN span s ON b.doc_id = s.doc_id
        |  WHERE b.frame BETWEEN s.f0 AND s.f1 GROUP BY b.doc_id)
        |SELECT t.doc_id, 2048 AS n_samples,
        |  CAST(coalesce(s.f0, 8) AS INT) AS head_trimmed,
        |  CAST(CASE WHEN s.f0 IS NULL THEN 0 ELSE 7 - s.f1 END AS INT)
        |    AS tail_trimmed,
        |  CAST(coalesce(k.kf, 0) AS INT) AS kept_frames,
        |  round(coalesce(CAST(k.e AS DOUBLE) / (k.kf * 256), 0.0), 4)
        |    AS mean_energy,
        |  CAST(coalesce(p.peak, 0) AS INT) AS peak
        |FROM t LEFT JOIN span s USING (doc_id) LEFT JOIN kept k USING (doc_id)
        |  LEFT JOIN pk p USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin)),
    QueryDef("m9_frame_sample", frameSample, Some(
      """WITH t AS (
        |  SELECT doc_id, coalesce(nullif(text, ''), chr(0)) AS tx FROM documents),
        |f AS (
        |  SELECT doc_id, tx, length(tx) AS L, unnest([0, 3, 6]) AS frame_idx
        |  FROM t),
        |b AS (
        |  SELECT doc_id, frame_idx,
        |    ascii(substr(tx, ((frame_idx * 180 + i) % L) + 1, 1)) AS v
        |  FROM f, unnest(range(0, 180)) r(i)),
        |g AS (
        |  SELECT doc_id, frame_idx, CAST(sum(v) AS DOUBLE) AS sv,
        |    CAST(sum(v * v) AS DOUBLE) AS sv2
        |  FROM b GROUP BY doc_id, frame_idx)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(frame_idx * 180 AS BIGINT) AS offset,
        |  round(sv / 180.0, 4) AS mean,
        |  round(sqrt(sv2 / 180.0 - (sv / 180.0) * (sv / 180.0)), 4) AS std
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin)),
    QueryDef("m7_interleaved_seq", (s, d) => interleavedSequences(s, d), Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(ceil(n_chars / 128.0) AS BIGINT) AS nt,
        |    CAST(ceil(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) / 256.0) AS BIGINT) AS nb
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, nt, nb,
        |    list_transform(range(0, nt + nb), p ->
        |      CASE WHEN p < 2 * least(nt, nb)
        |        THEN CASE WHEN p % 2 = 0 THEN 'T' || CAST(p // 2 AS VARCHAR)
        |                  ELSE 'B' || CAST(p // 2 AS VARCHAR) END
        |        ELSE CASE WHEN nt > nb THEN 'T' || CAST(p - nb AS VARCHAR)
        |                  ELSE 'B' || CAST(p - nt AS VARCHAR) END
        |      END) AS items
        |  FROM base)
        |SELECT doc_id, nt AS n_text, nb AS n_blob, nt + nb AS n_items,
        |  md5(array_to_string(items, '|')) AS seq_md5
        |FROM seq ORDER BY doc_id""".stripMargin)),
    QueryDef("m6_pair_alignment", (s, d) => pairAlignment(s, d), Some(
      """WITH docs AS (SELECT doc_id, lang, text FROM documents),
        |ext AS (SELECT count(*) AS n_docs, min(doc_id) AS min_id FROM docs),
        |blobs AS (
        |  SELECT doc_id AS blob_id, 'text/plain;lang=' || lang AS mime,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |    sha256(text) AS sha256
        |  FROM docs),
        |pairs AS (
        |  SELECT d.doc_id, d.lang, k.k,
        |    CASE WHEN k.k = 0 THEN 0
        |         WHEN (k.k * 7919) % n_docs = 0 THEN 1
        |         ELSE (k.k * 7919) % n_docs END AS off,
        |    min_id + ((d.doc_id - min_id
        |      + CASE WHEN k.k = 0 THEN 0
        |             WHEN (k.k * 7919) % n_docs = 0 THEN 1
        |             ELSE (k.k * 7919) % n_docs END) % n_docs) AS blob_id
        |  FROM docs d CROSS JOIN ext
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k)
        |SELECT p.doc_id AS anchor_id,
        |  CASE WHEN p.k = 0 THEN 'pos' ELSE 'neg' || CAST(p.k AS VARCHAR) END
        |    AS pair_type,
        |  b.blob_id, b.sha256, b.n_bytes,
        |  CAST(b.mime = 'text/plain;lang=' || p.lang AS INT) AS aligned
        |FROM pairs p JOIN blobs b USING (blob_id)
        |ORDER BY anchor_id, pair_type""".stripMargin)),
    QueryDef("m5_blob_chunks", blobChunks, Some(
      s"""WITH d AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents),
        |x AS (
        |  SELECT doc_id, n,
        |    unnest(range(CAST(ceil(n / $chunkSize.0) AS BIGINT))) AS chunk_idx
        |  FROM d WHERE n > 0)
        |SELECT doc_id, chunk_idx, chunk_idx * $chunkSize AS offset,
        |  CAST(least($chunkSize, n - chunk_idx * $chunkSize) AS BIGINT) AS chunk_len
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin)),
    QueryDef("m4_blob_dedup", blobDedup, Some(
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies,
        |  CAST(max(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin)),
    QueryDef("m1_blob_meta", blobMeta, Some(
      """SELECT doc_id, 'text/plain;lang=' || lang AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("m2_blob_features", blobFeatures, Some(
      """WITH t AS (SELECT doc_id, text, length(text) AS L FROM documents),
        |b AS (
        |  SELECT doc_id, i % 3 AS ch,
        |    ascii(substr(text, (i % L) + 1, 1)) AS v
        |  FROM t, unnest(range(0, 180)) r(i)),
        |g AS (
        |  SELECT doc_id, ch, CAST(sum(v) AS DOUBLE) AS sv,
        |    CAST(sum(v * v) AS DOUBLE) AS sv2
        |  FROM b GROUP BY doc_id, ch)
        |SELECT doc_id, CAST(246 AS BIGINT) AS n_bytes,
        |  10 AS width, 6 AS height,
        |  round(max(CASE WHEN ch = 0 THEN sv END) / 60.0, 4) AS mean_b,
        |  round(max(CASE WHEN ch = 1 THEN sv END) / 60.0, 4) AS mean_g,
        |  round(max(CASE WHEN ch = 2 THEN sv END) / 60.0, 4) AS mean_r,
        |  round(sqrt(max(CASE WHEN ch = 0 THEN sv2 END) / 60.0
        |    - (max(CASE WHEN ch = 0 THEN sv END) / 60.0)
        |      * (max(CASE WHEN ch = 0 THEN sv END) / 60.0)), 4) AS std_b,
        |  round(sqrt(max(CASE WHEN ch = 1 THEN sv2 END) / 60.0
        |    - (max(CASE WHEN ch = 1 THEN sv END) / 60.0)
        |      * (max(CASE WHEN ch = 1 THEN sv END) / 60.0)), 4) AS std_g,
        |  round(sqrt(max(CASE WHEN ch = 2 THEN sv2 END) / 60.0
        |    - (max(CASE WHEN ch = 2 THEN sv END) / 60.0)
        |      * (max(CASE WHEN ch = 2 THEN sv END) / 60.0)), 4) AS std_r
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    QueryDef("m3_binaryfile_ingest", (s, d) => binaryFileIngest(s, d), Some(
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin))
  )
}
