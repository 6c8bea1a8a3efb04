package graft.ext

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** WAV container laws and fingerprint invariances for [[Audio]]. */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("wav roundtrips, junk chunks are skipped, garbage is rejected") {
    val pcm = Audio.synthPcm("clip", 2048)
    val plain = Audio.parseWav(Audio.wavBytes(pcm, 8000))
    assert(plain.exists { case (r, s) => r == 8000 && s.sameElements(pcm) })
    // identical samples behind a junk LIST chunk
    val junk = Audio.parseWav(Audio.wavBytes(pcm, 8000, junkChunk = true))
    assert(junk.exists(_._2.sameElements(pcm)))
    assert(Audio.parseWav("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(Audio.parseWav(Array.emptyByteArray).isEmpty)
    // truncated data chunk: parse refuses rather than mis-reading
    val whole = Audio.wavBytes(pcm, 8000)
    assert(Audio.parseWav(whole.take(whole.length - 7)).isEmpty)
  }

  test("malformed chunk walks return None instead of throwing") {
    def riff(chunks: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + chunks.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + chunks.length)
      b.put("WAVE".getBytes("US-ASCII")).put(chunks)
      b.array()
    }
    def chunk(tag: String, lenField: Int, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(lenField).put(payload)
      b.array()
    }
    // fmt chunk claiming len=8 (<16): parser must not read 16 bytes and
    // reposition backwards (BufferUnderflow / backwards-seek)
    assert(Audio.parseWav(riff(chunk("fmt ", 8, new Array[Byte](8)))).isEmpty)
    // odd-length FINAL chunk: the pad-byte skip would land past the
    // limit — must end the walk, not throw IllegalArgumentException
    assert(Audio.parseWav(riff(chunk("LIST", 3, new Array[Byte](3)))).isEmpty)
    // fmt len<16 followed by a data chunk: skip the junk fmt, stay sane
    val mixed = riff(chunk("fmt ", 4, new Array[Byte](4)) ++
      chunk("data", 4, new Array[Byte](4)))
    assert(Audio.parseWav(mixed).isEmpty) // no valid fmt seen → no decode
    // fuzz: random byte soup with a RIFF/WAVE header never throws
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val soup = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(soup)
      Audio.parseWav(riff(soup)) // must not throw
    }
  }

  test("fingerprint is volume-invariant and damage stays frame-local") {
    val pcm = Audio.synthPcm("vol", 4096)
    val half = pcm.map(s => (s / 2).toShort)
    (0 until 4).foreach { f =>
      val a = Audio.frameFingerprint(pcm, f * 1024, 1024)
      val b = Audio.frameFingerprint(half, f * 1024, 1024)
      // energies scale ~uniformly; int rounding may flip near-tie bands
      assert(java.lang.Long.bitCount(a ^ b) <= 2,
        s"frame $f moved ${java.lang.Long.bitCount(a ^ b)} bits")
    }
    val spliced = Audio.synthPcm("vol", 4096, replaceFrom = 1024,
      replaceLen = 1024)
    (0 until 4).foreach { f =>
      val a = Audio.frameFingerprint(pcm, f * 1024, 1024)
      val b = Audio.frameFingerprint(spliced, f * 1024, 1024)
      if (f == 1) assert(java.lang.Long.bitCount(a ^ b) > 2,
        s"spliced frame only moved ${java.lang.Long.bitCount(a ^ b)}")
      else assert(a == b, s"undamaged frame $f changed")
    }
  }

  test("audioDupPairs: container clone full, splice partial, " +
      "unrelated and unparseable excluded") {
    val pcm = Audio.synthPcm("a", 4096)
    val media = Seq(
      (1L, Audio.wavBytes(pcm, 8000)),
      (2L, Audio.wavBytes(pcm, 8000, junkChunk = true)),
      (3L, Audio.wavBytes(Audio.synthPcm("a", 4096, replaceFrom = 1024,
        replaceLen = 1024), 8000)),
      (4L, Audio.wavBytes(Audio.synthPcm("b", 4096), 8000)),
      (5L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val got = Audio.audioDupPairs(spark, media, frameLen = 1024,
        maxHamming = 0, minMatchFrac = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 2L, 4L, 1.0),
      (1L, 3L, 3L, 0.75),
      (2L, 3L, 3L, 0.75)))
  }
}
