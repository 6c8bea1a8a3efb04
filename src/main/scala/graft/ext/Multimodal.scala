package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus partition-wise feature extraction.
  *
  * The decode step is a clearly-marked STUB (image/audio codecs are not in
  * this container): `decodeStub` computes a deterministic 16-bin byte
  * histogram standing in for a real decoder. Everything around it — the
  * schema (binary + metadata struct), the `mapPartitions` batch shape, the
  * partitioning story — is the real Spark plumbing a codec would plug into:
  * swap `decodeStub` for JNI/FFmpeg/ImageIO and nothing else changes.
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
