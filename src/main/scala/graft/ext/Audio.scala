package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio as a first-class corpus column: WAV (RIFF PCM16 mono) parse and
  * synthesis, framed spectral fingerprints, and frame-aligned
  * near-duplicate detection — completing the image/video/audio media
  * triple. The fingerprint is the intra-frame half of the
  * Haitsma–Kalker Philips scheme (ISMIR'02): per frame, 32 band
  * energies (Goertzel at DFT bins), one bit per adjacent-band energy
  * comparison — sign-of-difference bits are invariant to volume
  * scaling (energies scale uniformly) and, being frame-local, damage
  * stays confined to the frames it touches.
  *
  * Scale shape mirrors [[Multimodal.videoDupPairs]]: fingerprinting is
  * a per-row flatMap (a 100 TB corpus distributes by payload rows; no
  * executor holds more than one clip), and matching runs through the
  * shared banded frame-aligned core — candidates keyed (frame_no,
  * band, value), never all-pairs.
  */
object Audio {

  /** Minimal RIFF/WAVE writer: PCM16 mono little-endian, with an
    * optional junk LIST chunk before `data` — the "same samples,
    * different container bytes" re-encode case a content fingerprint
    * must collapse.
    */
  def wavBytes(pcm: Array[Short], sampleRate: Int,
      junkChunk: Boolean = false): Array[Byte] = {
    val junk = if (junkChunk) {
      val payload = "INFOgraft-reencoded-container".getBytes("US-ASCII")
      // RIFF chunks pad to even length — the parser skips the pad byte
      val b = java.nio.ByteBuffer.allocate(
          8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(payload.length)
      b.put(payload)
      b.array()
    } else Array.emptyByteArray
    val dataLen = pcm.length * 2
    val riffLen = 4 + (8 + 16) + junk.length + (8 + dataLen)
    val b = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // byte rate
    b.putShort(2) // block align
    b.putShort(16) // bits/sample
    b.put(junk)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(s => b.putShort(s))
    b.array()
  }

  /** Chunk-walking WAV parse: skips unknown chunks (LIST, fact, …),
    * returns (sampleRate, samples) for PCM16 mono, None for anything
    * it can't decode — the skip-undecodable posture crawl media needs.
    */
  def parseWav(payload: Array[Byte]): Option[(Int, Array[Short])] = try {
    if (payload.length < 12) return None
    val b = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
    }
    // never reposition past the limit (an odd-length final chunk's pad
    // byte, or a lying chunk length, must end the walk, not throw)
    def advance(by: Int): Unit =
      b.position(math.min(b.limit(), b.position() + math.max(0, by)))
    if (tag() != "RIFF") return None
    b.getInt() // riff length
    if (tag() != "WAVE") return None
    var rate = -1
    var ok = false
    var samples: Array[Short] = null
    while (b.remaining() >= 8 && samples == null) {
      val t = tag()
      val len = b.getInt()
      if (len < 0 || len > b.remaining()) return None
      t match {
        case "fmt " if len >= 16 => // PCM fmt is ≥16 bytes; shorter is junk
          val fmt = b.getShort(); val ch = b.getShort()
          rate = b.getInt(); b.getInt(); b.getShort()
          val bits = b.getShort()
          advance(len - 16)
          ok = fmt == 1 && ch == 1 && bits == 16
        case "data" if ok && rate > 0 =>
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = b.getShort(); i += 1 }
          samples = out
        case _ =>
          advance(len + (len & 1)) // chunks pad to even
      }
    }
    Option(samples).map(s => (rate, s))
  } catch {
    // the stated posture is skip-undecodable: a malformed container
    // must yield None, never kill the fingerprinting task
    case _: RuntimeException => None
  }

  /** Deterministic synthetic clip: a mixture of four sine partials with
    * frequency/phase/amplitude drawn from md5(seed) — enough spectral
    * structure that adjacent-band comparisons are decisive.
    * `replaceFrom/len` overwrites a sample range with a different
    * seed's signal (the "spliced content" case).
    */
  def synthPcm(seed: String, n: Int, replaceFrom: Int = -1,
      replaceLen: Int = 0): Array[Short] = {
    def gen(sd: String): Int => Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sd.getBytes("UTF-8"))
      val partials = (0 until 4).map { p =>
        val f = 0.01 + (d(p * 3) & 0xff) / 1024.0 // cycles/sample
        val ph = (d(p * 3 + 1) & 0xff) / 256.0 * 2 * math.Pi
        val a = 0.1 + (d(p * 3 + 2) & 0xff) / 512.0
        (f, ph, a)
      }
      i => partials.map { case (f, ph, a) =>
        a * math.sin(2 * math.Pi * f * i + ph) }.sum
    }
    val base = gen(seed)
    val repl = if (replaceFrom >= 0) gen(s"$seed-SPLICE") else base
    Array.tabulate(n) { i =>
      val v = if (replaceFrom >= 0 && i >= replaceFrom &&
          i < replaceFrom + replaceLen) repl(i) else base(i)
      (math.max(-1.0, math.min(1.0, v)) * 8000).toShort
    }
  }

  /** One frame's 31-bit fingerprint: Goertzel energies at 32 band
    * centers spread over the full spectrum ((k+1)/64 cycles/sample, up
    * to Nyquist), bit m set when E(m) > E(m+1). Spreading matters: a
    * low-bins-only comb measures mostly leakage noise for signals with
    * energy above its top band, and near-constant noise-floor patterns
    * collide across unrelated clips. Volume-invariant (uniform energy
    * scaling preserves comparisons) and frame-local.
    */
  def frameFingerprint(samples: Array[Short], from: Int,
      frameLen: Int): Long = {
    val energies = new Array[Double](32)
    var k = 0
    while (k < 32) {
      val w = 2.0 * math.Pi * (k + 1) / 64.0
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < frameLen) {
        s0 = samples(from + i) + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      energies(k) = s1 * s1 + s2 * s2 - coeff * s1 * s2
      k += 1
    }
    var fp = 0L
    var m = 0
    while (m < 31) {
      if (energies(m) > energies(m + 1)) fp |= (1L << m)
      m += 1
    }
    fp
  }

  /** Framed fingerprints per clip: parse, split into non-overlapping
    * `frameLen` windows, fingerprint each. One row per (doc, frame);
    * unparseable payloads are skipped.
    */
  def audioFingerprints(spark: SparkSession, media: DataFrame,
      frameLen: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parseWav(payload).toSeq.flatMap { case (_, pcm) =>
          (0 until pcm.length / frameLen).map { f =>
            (id, f, frameFingerprint(pcm, f * frameLen, frameLen))
          }
        }
      }
      .toDF("doc_id", "frame_no", "phash")
  }

  /** Frame-aligned audio near-dup via the shared banded core: 31-bit
    * fingerprints band into 4×8-bit keys. Same output contract as
    * [[Multimodal.videoDupPairs]].
    */
  def audioDupPairs(spark: SparkSession, media: DataFrame, frameLen: Int,
      maxHamming: Int, minMatchFrac: Double): DataFrame =
    Multimodal.frameAlignedDupPairs(
      audioFingerprints(spark, media, frameLen),
      nBands = 4, bandBits = 8, maxHamming = maxHamming,
      minMatchFrac = minMatchFrac)
}
