package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.toMedia(Seq(
      (1L, "hello world", "en", "srcA", 11L),
      (2L, "", "en", "srcB", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("media schema: binary payload + typed metadata struct") {
    val f = media.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(media.select("meta.format").as[String].collect()(0) == "utf8-text")
  }

  test("decode stub: histogram is L1-normalized and deterministic") {
    val h1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val h2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(h1.toSeq == h2.toSeq)
    assert(math.abs(h1.sum - 1.0) < 1e-12)
  }

  test("extractFeatures: mapPartitions path handles empty payloads") {
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 11)
    assert(feats(1).n_bytes == 0)
    assert(feats(0).histogram.length == 16)
  }

  test("perceptual dup pairs: clones collide at hamming 0, noise does not") {
    // docs 1/2 byte-identical, doc 3 a near-variant, doc 4 different
    val m = Multimodal.toMedia(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 0L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 0L),
      (3L, "the quick brown fox jumped over the lazy dog", "en", "s", 0L),
      (4L, "zzzz 0123456789 !!!! ???? @@@@ #### $$$$ %%%%", "en", "s", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = Multimodal.perceptualDupPairs(spark, m, maxHamming = 4)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(p => (p._1, p._2))
    // identical payloads → identical signatures
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    // the outlier never survives verification against the prose docs
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("perceptual hashes are deterministic and fit 63 bits") {
    val ph = Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect().toMap
    val ph2 = Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect().toMap
    assert(ph == ph2)
    assert(ph.values.forall(_ >= 0L)) // bit 63 never set
  }

  test("resizeStub: fixed-length evenly-spaced byte sketch") {
    val in = "abcdefgh".getBytes("UTF-8")
    val out = Multimodal.resizeStub(in, 4)
    assert(new String(out, "UTF-8") == "aceg")
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4).length == 4)
    // deterministic
    assert(Multimodal.resizeStub(in, 4).sameElements(out))
  }

  test("sampleSlices emits strided byte windows") {
    val slices = Multimodal.sampleSlices(media.filter(col("doc_id") === 1),
      sliceLen = 4, stride = 4, maxSlices = 2)
      .select("slice_no", "bytes").collect()
    assert(slices.length == 2)
    assert(new String(slices(0).getAs[Array[Byte]]("bytes"), "UTF-8") == "hell")
    assert(new String(slices(1).getAs[Array[Byte]]("bytes"), "UTF-8") == "o wo")
  }

  test("real pHash: re-encode and brightness shift collapse, content splits") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val png = Multimodal.imagePHash(Multimodal.synthImage("seed-A", "png")).get
    // same pixels, different container bytes — a byte-level hash would
    // split these; the pixel-domain hash must not
    val bmp = Multimodal.imagePHash(Multimodal.synthImage("seed-A", "bmp")).get
    assert(ham(png, bmp) == 0)
    // uniform brightness shift moves (almost) only the DC coefficient;
    // clamping at 255 perturbs a few AC terms at most
    val bright = Multimodal.imagePHash(
      Multimodal.synthImage("seed-A", "png", shift = 4)).get
    assert(ham(png, bright) <= 4, s"brightness moved ${ham(png, bright)} bits")
    // different content diverges far beyond any verify radius
    val other = Multimodal.imagePHash(Multimodal.synthImage("seed-B", "png")).get
    assert(ham(png, other) > 10, s"distinct content only ${ham(png, other)} apart")
    assert(png >= 0L && bmp >= 0L && other >= 0L) // bit 63 reserved
  }

  test("imagePHashes drops undecodable payloads instead of failing") {
    val rows = Seq(
      (1L, Multimodal.synthImage("ok", "png")),
      (2L, "not an image at all".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
    ).toDF("doc_id", "payload")
    val got = Multimodal.imagePHashes(spark, rows)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("imageDupPairs: clone found at hamming 0, outlier rejected") {
    val rows = Seq(
      (1L, Multimodal.synthImage("x", "png")),
      (2L, Multimodal.synthImage("x", "bmp")), // re-encoded clone of 1
      (3L, Multimodal.synthImage("y", "png")), // unrelated
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.imageDupPairs(spark, rows, maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("frame container roundtrips and survives truncation") {
    val frames = Seq(
      Multimodal.synthImage("f0", "png"),
      Multimodal.synthImage("f1", "bmp"),
      Array.emptyByteArray)
    val packed = Multimodal.packFrames(frames)
    val back = Multimodal.unpackFrames(packed)
    assert(back.length == 3)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // truncated mid-frame: earlier complete frames still come back
    val cut = Multimodal.unpackFrames(packed.take(packed.length - 3))
    assert(cut.length == 2)
    assert(Multimodal.unpackFrames(Array.emptyByteArray).isEmpty)
  }

  test("videoFramePHashes samples every kth frame with real decode") {
    val media = Seq((7L, Multimodal.synthVideo("v", 6, "png")))
      .toDF("doc_id", "payload")
    val got = Multimodal.videoFramePHashes(spark, media, sampleEvery = 2)
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0, 2, 4))
    // sampled hashes equal direct pHash of the same synth frames
    got.foreach { case (_, i, h) =>
      assert(h == Multimodal.imagePHash(
        Multimodal.synthImage(s"v-f$i", "png", shift = i)).get)
    }
  }

  test("videoDupPairs: re-encode clone, partial match, and " +
      "temporal misalignment") {
    val v1 = Multimodal.synthVideo("a", 6, "png")
    val clone = Multimodal.synthVideo("a", 6, "bmp")
    val partial = Multimodal.synthVideo("a", 6, "bmp", replaceFrame = 2)
    // same frames, reversed order — content identical, time broken
    val shuffled = Multimodal.packFrames(
      Multimodal.unpackFrames(v1).reverse)
    val other = Multimodal.synthVideo("b", 6, "png")
    val media = Seq((1L, v1), (2L, clone), (3L, partial),
      (4L, shuffled), (5L, other)).toDF("doc_id", "payload")
    val got = Multimodal.videoDupPairs(spark, media, sampleEvery = 2,
        maxHamming = 0, minMatchFrac = 0.5)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, m, f) => (a, b, m, f) }.toSet
    // 1↔2 full (3/3), 1↔3 and 2↔3 partial (2/3); the reversed copy has
    // no frame agreeing at its own position (frames 0/2/4 ↔ 5/3/1) and
    // must not pair with anything; 5 shares nothing
    assert(got == Set(
      (1L, 2L, 3L, 1.0),
      (1L, 3L, 2L, 0.666667),
      (2L, 3L, 2L, 0.666667)))
  }
}
