package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus partition-wise feature extraction.
  *
  * Two decode paths share the plumbing:
  *
  *   - [[decodeLuma]]/[[imagePHash]] — REAL image decode via
  *     `javax.imageio` (JDK-bundled: PNG/BMP/GIF/JPEG) feeding a classic
  *     DCT perceptual hash, the production path for image near-dup.
  *   - [[decodeStub]] — a deterministic 16-bin byte histogram kept as the
  *     codec-free stand-in (audio/video codecs genuinely are not in this
  *     container); it pins the schema (binary + metadata struct), the
  *     `mapPartitions` batch shape, and the partitioning story that any
  *     JNI/FFmpeg decoder would plug into unchanged.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      histogram: Array[Double], top_bin: Int)

  /** Documents → media table: payload = utf-8 bytes (stand-in for image
    * bytes), metadata struct carried alongside.
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(lit("utf8-text").as("format"),
        octet_length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder: 16-bin byte-value histogram, L1-normalized. Determinism
    * makes the surrounding pipeline testable; a real implementation would
    * decode pixels/samples here.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1.0)
    val total = math.max(1.0, payload.length.toDouble)
    bins.map(_ / total)
  }

  /** Partition-wise feature extraction — the Scala analogue of a batched
    * decode UDF: one iterator per partition, rows processed without
    * per-row task overhead, output is a typed Dataset.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val hist = decodeStub(payload)
        val top = hist.indices.maxBy(i => (hist(i), -i))
        MediaFeatures(id, payload.length, hist, top)
      })
  }

  /** pHash-style perceptual signature: a bit per histogram bin of the
    * decoded media, set iff the doc's bin exceeds the CORPUS MEAN for
    * that bin — the data-relative threshold real pHash takes from the
    * DCT median. (An absolute threshold degenerates: most media of one
    * modality share the same above/below pattern — measured on the
    * gate corpus, every doc hashed identically under a fixed 1/bins
    * cut.) Default 63 bins so bit 63 stays clear: the signature then
    * survives engines whose 64-bit shifts range-check (DuckDB raises
    * on `1::BIGINT << 63`), and the sign bit can never leak into
    * band arithmetic.
    *
    * Two passes over the (bounded) histograms: one computes the
    * per-bin corpus means (`bins` doubles to the driver), one sets
    * bits against the broadcast thresholds. The decode itself is the
    * stub byte histogram — swap in DCT coefficients and nothing
    * downstream changes.
    */
  def perceptualHashes(spark: SparkSession, media: DataFrame,
      bins: Int = 63): DataFrame = {
    require(bins <= 63, s"bins=$bins: bit 63 is reserved (see scaladoc)")
    import spark.implicits._
    val hist = media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val h = new Array[Double](bins)
        p.foreach(b => h((b & 0xff) % bins) += 1.0)
        val tot = math.max(1.0, p.length.toDouble)
        (id, h.map(_ / tot).toSeq)
      }).toDF("doc_id", "hist").persist()
    try {
      val mf = hist.select(posexplode(col("hist")).as(Seq("bin", "f")))
        .groupBy("bin").agg(avg("f").as("mf"))
        .orderBy("bin").collect().map(_.getDouble(1))
      hist.as[(Long, Seq[Double])].map { case (id, h) =>
        var ph = 0L
        var i = 0
        while (i < h.length) { if (h(i) > mf(i)) ph |= 1L << i; i += 1 }
        (id, ph)
      }.toDF("doc_id", "phash").localCheckpoint(true)
    } finally { hist.unpersist(); () }
  }

  /** Perceptual near-dup pairs: LSH banding over the signatures (docs
    * agreeing on any band of bits become candidates via an equality
    * join — the scale path: only band-collisions ever pair) verified
    * by exact hamming distance ≤ `maxHamming`, one xor + bit_count per
    * candidate. The media analogue of the text family's
    * MinHash-LSH-then-verify discipline. Caveat the stub makes
    * visible: bands whose bins a modality never populates are
    * constant across docs and prune nothing — real DCT signatures
    * spread entropy across all bands; a production deployment would
    * drop constant bands at build time.
    */
  def perceptualDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 4, bands: Int = 9, bins: Int = 63): DataFrame = {
    val bandBits = bins / bands
    require(bands * bandBits == bins,
      s"bands=$bands must divide bins=$bins")
    val ph = perceptualHashes(spark, media, bins)
    val banded = ph.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("bno"))
      .withColumn("bval",
        expr(s"shiftright(phash, bno * $bandBits) & ${(1 << bandBits) - 1}"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.bno") === col("b.bno") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
    cand.withColumn("hamming",
        expr("bit_count(pa ^ pb)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------------------------------------------------------------
  // REAL image decode — `javax.imageio` ships with the JDK, so PNG/BMP/
  // GIF/JPEG decode needs no external codec. `decodeStub` stays for the
  // byte-level plumbing's determinism tests; the pixel path below is the
  // production shape: decode → luma → area-average resize → 2-D DCT →
  // median-thresholded low-frequency bits (classic pHash).
  // ---------------------------------------------------------------------

  /** Decode an image payload to a luma (grayscale) matrix; None for
    * payloads no installed reader understands — at corpus scale a media
    * column always carries undecodable strays, and they must drop out
    * of the signature path cleanly rather than kill the task.
    */
  def decodeLuma(payload: Array[Byte]): Option[Array[Array[Double]]] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      .filter(img => img.getWidth > 0 && img.getHeight > 0)
      .map { img =>
        Array.tabulate(img.getHeight, img.getWidth) { (y, x) =>
          val rgb = img.getRGB(x, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
        }
      }
    catch { case _: Exception => None }

  /** Area-average downsample to n×n — deterministic, alias-resistant
    * (every source pixel lands in exactly one block).
    */
  private def resizeLuma(src: Array[Array[Double]], n: Int): Array[Array[Double]] = {
    val h = src.length
    val w = src(0).length
    Array.tabulate(n, n) { (y, x) =>
      val y0 = y * h / n; val y1 = math.max((y + 1) * h / n, y0 + 1)
      val x0 = x * w / n; val x1 = math.max((x + 1) * w / n, x0 + 1)
      var s = 0.0
      var yy = y0
      while (yy < y1) {
        var xx = x0
        while (xx < x1) { s += src(math.min(yy, h - 1))(math.min(xx, w - 1)); xx += 1 }
        yy += 1
      }
      s / ((y1 - y0) * (x1 - x0))
    }
  }

  /** 2-D DCT-II low-frequency block: returns the top-left `k`×`k`
    * coefficients of the n×n input (only those are computed — O(n²k²),
    * not a full transform).
    */
  private def dctLowFreq(m: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val n = m.length
    val cos = Array.tabulate(k, n)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
    Array.tabulate(k, k) { (u, v) =>
      var s = 0.0
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) { s += m(y)(x) * cos(u)(y) * cos(v)(x); x += 1 }
        y += 1
      }
      s
    }
  }

  /** Classic perceptual hash of one image payload: luma → 32×32 area
    * average → DCT-II → the 8×8 low-frequency block minus the DC term
    * (63 coefficients), each a bit iff above their median. 63 bits keep
    * bit 63 clear — the same reserved-sign-bit discipline as
    * [[perceptualHashes]], so band arithmetic and external engines
    * never see a negative hash. Invariances are pHash's usual ones:
    * re-encoding (PNG↔BMP), uniform brightness shifts (DC-only), and
    * mild noise move few or no bits; different content diverges.
    */
  def imagePHash(payload: Array[Byte]): Option[Long] =
    decodeLuma(payload).map { luma =>
      val d = dctLowFreq(resizeLuma(luma, 32), 8)
      val coeffs = (for { u <- 0 until 8; v <- 0 until 8
        if u != 0 || v != 0 } yield d(u)(v)).toArray
      val sorted = coeffs.sorted
      val median = sorted(coeffs.length / 2)
      var ph = 0L
      var i = 0
      while (i < coeffs.length) {
        if (coeffs(i) > median) ph |= 1L << i
        i += 1
      }
      ph
    }

  /** Real-decode perceptual hashes over a media table: one partition-wise
    * decode pass (the batched-UDF shape — ImageIO state never crosses
    * rows), undecodable payloads dropped. Returns (doc_id, phash).
    */
  def imagePHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        imagePHash(p).map(ph => (id, ph))
      }).toDF("doc_id", "phash")
  }

  /** Perceptual near-dup pairs over REAL decoded signatures — the
    * [[perceptualDupPairs]] LSH-band-then-verify discipline (9 bands ×
    * 7 bits over the 63-bit hash; only band collisions ever pair, one
    * xor + bit_count per candidate) on [[imagePHashes]]. Detects
    * re-encodes and brightness-shifted copies at hamming 0 and mild
    * edits within a small radius; never all-pairs.
    */
  def imageDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 4, bands: Int = 9): DataFrame = {
    val bits = 63
    val bandBits = bits / bands
    require(bands * bandBits == bits, s"bands=$bands must divide $bits")
    val ph = imagePHashes(spark, media)
    val banded = ph.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("bno"))
      .withColumn("bval",
        expr(s"shiftright(phash, bno * $bandBits) & ${(1 << bandBits) - 1}"))
    banded.as("a").join(banded.as("b"),
        col("a.bno") === col("b.bno") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Deterministic test/gate image synthesis: a 16×16 RGB image whose
    * pixels stream from repeated md5 of `seed`, encoded via ImageIO.
    * `format` is any installed writer ("png", "bmp") — the same seed
    * under two formats yields byte-different payloads with identical
    * pixels, the re-encode case a perceptual hash must collapse.
    */
  def synthImage(seed: String, format: String, shift: Int = 0): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var bytes = md.digest(seed.getBytes("UTF-8"))
    var bi = 0
    for (y <- 0 until 16; x <- 0 until 16) {
      def next(): Int = {
        if (bi == bytes.length) { bytes = md.digest(bytes); bi = 0 }
        bi += 1
        math.min(255, math.max(0, (bytes(bi - 1) & 0xff) + shift))
      }
      img.setRGB(x, y, (next() << 16) | (next() << 8) | next())
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** STUB resize (the "thumbnail" analogue): a fixed-length byte sketch of
    * the payload — `outLen` evenly-spaced bytes (nearest-neighbor
    * downsample in 1-D). Deterministic, so downstream joins/dedup on
    * resized media stay testable; a real implementation would do pixel
    * interpolation here with the same (bytes → fixed-size bytes) shape.
    */
  def resizeStub(payload: Array[Byte], outLen: Int): Array[Byte] = {
    if (payload.isEmpty) new Array[Byte](outLen)
    else Array.tabulate(outLen)(i => payload((i.toLong * payload.length / outLen).toInt))
  }

  // ---- video: frame container, frame-sampled pHash, near-dup ----------

  /** Minimal deterministic video container for the gates/specs: each
    * frame as 4-byte big-endian length + encoded image bytes,
    * concatenated. Real codecs aren't in this sandbox; the container
    * keeps the Spark-side plumbing (binary column in, per-frame rows
    * out) identical to what an ffmpeg-backed decoder would feed.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    out.toByteArray
  }

  def unpackFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(payload))
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (in.available() >= 4) {
      val n = in.readInt()
      if (n < 0 || n > in.available()) return frames.toSeq // truncated
      val f = new Array[Byte](n)
      in.readFully(f)
      frames += f
    }
    frames.toSeq
  }

  /** Deterministic synthetic video: `nFrames` [[synthImage]] frames
    * (seed per frame, `shift` as slow luma drift — "motion"), packed.
    * The same seed under a different image `format` is the re-encoded
    * clone a frame-level perceptual hash must collapse.
    */
  def synthVideo(seed: String, nFrames: Int, format: String,
      replaceFrame: Int = -1): Array[Byte] =
    packFrames((0 until nFrames).map { i =>
      val fseed = if (i == replaceFrame) s"$seed-REPLACED-$i" else s"$seed-f$i"
      synthImage(fseed, format, shift = i)
    })

  /** Frame-sampled perceptual hashes: decode every `sampleEvery`-th
    * frame and pHash it ([[imagePHash]] — real DCT over decoded luma).
    * One row per (doc, sampled frame); runs as a per-row flatMap, so a
    * 100 TB corpus distributes by payload rows and no executor ever
    * holds more than one video. Undecodable frames are skipped (the
    * honest posture for crawl media).
    */
  def videoFramePHashes(spark: SparkSession, media: DataFrame,
      sampleEvery: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        unpackFrames(payload).zipWithIndex
          .filter(_._2 % sampleEvery == 0)
          .flatMap { case (f, i) => imagePHash(f).map(h => (id, i, h)) }
      }
      .toDF("doc_id", "frame_no", "phash")
  }

  /** Frame-level near-duplicate videos: two videos are dups when ≥
    * `minMatchFrac` of their sampled frames agree at hamming ≤
    * `maxHamming` FOR THE SAME frame position (temporal alignment —
    * shuffled copies of the same frames are not the same video).
    * Candidates come from a banded join — each frame hash splits into
    * four 16-bit bands keyed (frame_no, band_no, value), so only
    * videos sharing a near-identical frame ever pair (LSH discipline:
    * no all-pairs, band buckets bounded by collision counts); the
    * match fraction then verifies exactly. Returns (id_a, id_b,
    * frames_matched, match_frac rounded to 6).
    */
  def videoDupPairs(spark: SparkSession, media: DataFrame,
      sampleEvery: Int, maxHamming: Int,
      minMatchFrac: Double): DataFrame =
    frameAlignedDupPairs(videoFramePHashes(spark, media, sampleEvery),
      nBands = 4, bandBits = 16, maxHamming = maxHamming,
      minMatchFrac = minMatchFrac)

  /** Shared frame-aligned near-dup core over any (doc_id, frame_no,
    * phash) relation — video frame pHashes, audio spectral
    * fingerprints, anything temporally framed. Banded LSH candidates
    * keyed (frame_no, band, value) → exact hamming verify per aligned
    * frame → match-fraction threshold over `greatest(n_a, n_b)`.
    */
  private[ext] def frameAlignedDupPairs(hashes: DataFrame, nBands: Int,
      bandBits: Int, maxHamming: Int, minMatchFrac: Double): DataFrame = {
    val ph = hashes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val mask = (1L << bandBits) - 1
      val counts = ph.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      val bands = ph.select(col("doc_id"), col("frame_no"), col("phash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("bno"))
        .select(col("doc_id"), col("frame_no"), col("phash"), col("bno"),
          expr(s"(phash >> (bno * $bandBits)) & $mask").as("bval"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.frame_no") === col("b.frame_no") &&
            col("a.bno") === col("b.bno") &&
            col("a.bval") === col("b.bval") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.frame_no").as("frame_no"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
      val matched = cand
        .filter(expr("bit_count(pa ^ pb)") <= maxHamming)
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("frames_matched"))
      matched
        .join(counts.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n_frames", "n_a"), "id_a")
        .join(counts.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("n_frames", "n_b"), "id_b")
        .withColumn("match_frac", round(col("frames_matched") /
          greatest(col("n_a"), col("n_b")), 6))
        .filter(col("match_frac") >= minMatchFrac)
        .select(col("id_a"), col("id_b"),
          col("frames_matched").cast("long").as("frames_matched"),
          col("match_frac"))
    } finally { ph.unpersist(); () }
  }

  /** Byte-range sampling (the "frame sample" analogue): fixed-size slices
    * at a stride, as pure column expressions over the binary payload.
    */
  def sampleSlices(media: DataFrame, sliceLen: Int, stride: Int,
      maxSlices: Int): DataFrame =
    media.select(col("doc_id"),
      explode(transform(
        sequence(lit(0), least(lit(maxSlices - 1),
          (octet_length(col("payload").cast("string")) / stride).cast("int"))),
        i => struct(i.as("slice_no"),
          col("payload").substr(i * stride + 1, lit(sliceLen)).as("bytes"))))
        .as("s"))
      .select(col("doc_id"), col("s.slice_no").as("slice_no"),
        col("s.bytes").as("bytes"))
}
