package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass per-group top-k as a typed aggregate: the buffer is an
  * ascending sorted array holding at most k composite rank keys; `finish`
  * returns them largest-first.
  *
  * Why not `row_number().over(window)`: a ranking window shuffles EVERY
  * row to its partition and sort-buffers it just to discard all but k —
  * at 100 TB the shuffle is the whole cost. This aggregate is associative
  * (merge = k-way re-insert), so map-side partial aggregation reduces
  * each partition to ≤ k longs per group before anything shuffles; what
  * crosses the network is groups × k × 8 bytes, independent of row count.
  * Ties and secondary ordering are the caller's concern: pack them into
  * the composite key (e.g. `count * C + (C-1-id)` for count-desc,
  * id-asc), exactly like [[graft.queries.AnalyticsQueries]]'s max_by
  * rank-key trick — the aggregate itself orders plain signed longs.
  *
  * Insertion cost: k is expected tiny (top-3/top-10); the O(k) shift per
  * accepted row beats heap bookkeeping at that size, and rejected rows
  * (the common case after warmup) cost one comparison against the
  * current minimum.
  */
final class TopKAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] = insert(buf, x)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a
    var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.reverse.toSeq

  /** Keep `buf` ascending-sorted with at most k elements. */
  private def insert(buf: Array[Long], x: Long): Array[Long] = {
    if (buf.length < k) {
      val r = new Array[Long](buf.length + 1)
      var i = 0
      while (i < buf.length && buf(i) < x) { r(i) = buf(i); i += 1 }
      r(i) = x
      while (i < buf.length) { r(i + 1) = buf(i); i += 1 }
      r
    } else if (x <= buf(0)) buf
    else {
      // evict the minimum, shift the prefix below x left, place x
      var i = 1
      while (i < buf.length && buf(i) < x) { buf(i - 1) = buf(i); i += 1 }
      buf(i - 1) = x
      buf
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
