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
