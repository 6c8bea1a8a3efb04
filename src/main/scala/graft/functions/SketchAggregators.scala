package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Seeded 64-bit string hashing for the sketch aggregators: one FNV-1a
  * pass over the UTF-8 bytes, then a splitmix64 finalizer per seed — so a
  * k-permutation MinHash costs one byte-scan plus k cheap mixes instead of
  * k full string hashes.
  */
object Hash64 {
  def base(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) { h ^= b(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def seeded(seed: Long, s: String): Long = mix(base(s) ^ mix(seed))
}

/** k-permutation MinHash as ONE typed aggregate (SURVEY §2.10's
  * `Aggregator[IN,BUF,OUT]` route), over pre-hashed 8-byte shingles
  * ([[graft.ext.Dedup.hashedShingles]]): permutation p is a splitmix64
  * re-mix of the gram hash xor a per-permutation seed — k cheap integer
  * mixes per shingle, no string bytes anywhere. The k-separate-
  * `min(xxhash64)` spelling generates enormous whole-stage code (~20 s of
  * janino compilation for k=64 at first use); this buffer-based aggregate
  * keeps codegen tiny. Buffers merge associatively (element-wise min), so
  * map-side partial aggregation works — the shuffle carries one k-long
  * array per document.
  */
final class MinHashAgg(perms: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val seeds = Array.tabulate(perms)(p => Hash64.mix(p.toLong))

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sh: Long): Array[Long] = {
    var p = 0
    while (p < perms) {
      val h = Hash64.mix(sh ^ seeds(p))
      if (h < buf(p)) buf(p) = h
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < perms) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al., RANDOM'02;
  * Beyer et al., SIGMOD'07) as a typed aggregate: the buffer keeps the k
  * SMALLEST DISTINCT hashes seen, sorted ascending. Unlike HLL the
  * summary supports closed-form UNION (re-aggregate the kept values —
  * the global k smallest are each inside their group's k smallest, so
  * merging summaries is exact) and, because it stores the hashes
  * themselves, the estimator `(k−1)/ρ(h_k)` replays exactly in any
  * engine that can hash the same way — which is why the engine feeds it
  * [[graft.ext.TextAnalysis.md5Hash48]] values. Buffers are k-bounded
  * and merge associatively (sorted dedup-merge), so map-side partial
  * aggregation works and the shuffle carries one ≤k-long array per
  * group, never the key domain.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already kept
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than every kept value in a full sketch
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** 64-bit SimHash as a typed aggregate over a document's tokens: the
  * buffer holds per-bit vote sums (+1 if the token-hash bit is set, −1
  * otherwise); `finish` packs vote signs into one long. Same reasoning as
  * [[MinHashAgg]]: one tight loop instead of a 64-wide HOF expression
  * tree, and associative merge for map-side combine.
  */
final class SimHashAgg extends Aggregator[String, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    val h = Hash64.mix(Hash64.base(tok))
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
