package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval joins (`p BETWEEN s AND e`) that
  * Spark would otherwise plan as a nested-loop (broadcast) join with an
  * O(|L|×|R|) predicate. Both sides map onto fixed-width bins — points to
  * their bin, intervals exploded to every bin they overlap — the bin id
  * becomes an equi-join key (hash/sort-merge, AQE-eligible), and the exact
  * range predicate re-filters the per-bin candidates. Cost is linear in
  * rows × bins-per-interval, and the shuffle partitions by bin, so at
  * 100 TB the join parallelizes like any equi-join instead of
  * broadcasting one side. Pick binWidth ≈ the typical interval length:
  * shorter bins explode intervals into more rows, longer bins put more
  * non-matching candidates through the re-filter.
  */
object RangeJoin {

  /** `left` carries a numeric point column `pointCol`; `right` carries
    * numeric `startCol`/`endCol` (inclusive bounds, start ≤ end). Returns
    * the joined rows (all columns of both sides) where
    * `pointCol BETWEEN startCol AND endCol`.
    */
  def pointInterval(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lBinned = left.withColumn("__bin",
      floor(col(pointCol) / binWidth))
    val rBinned = right.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth),
        floor(col(endCol) / binWidth))))
    lBinned.join(rBinned, "__bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval-overlap join: `[ls, le] ∩ [rs, re] ≠ ∅` (inclusive bounds),
    * i.e. `ls <= re AND rs <= le`. Both sides explode onto the bins they
    * cover and equi-join on the bin id; a pair overlapping several shared
    * bins would duplicate, so each match is emitted only from the first
    * bin of the overlap region (`floor(greatest(ls, rs) / binWidth)`) —
    * arithmetic dedup, no `distinct()` shuffle. Same scale shape as
    * [[pointInterval]]: linear in rows × bins-per-interval, partitioned
    * by bin.
    */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
      right: DataFrame, rs: String, re: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lBinned = left.withColumn("__bin",
      explode(sequence(floor(col(ls) / binWidth), floor(col(le) / binWidth))))
    val rBinned = right.withColumn("__bin",
      explode(sequence(floor(col(rs) / binWidth), floor(col(re) / binWidth))))
    lBinned.join(rBinned, "__bin")
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__bin") === floor(greatest(col(ls), col(rs)) / binWidth))
      .drop("__bin")
  }
}
