package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data clustering: interleaving the bits of two
  * sort dimensions makes rows that are close in EITHER dimension land in
  * the same files, so parquet min/max stats prune scans filtered on
  * either/both columns — the classic answer to "sorted by date helps
  * date filters but destroys key locality" (popularized by lakehouse
  * table formats' OPTIMIZE ZORDER BY; the curve itself is Morton 1966).
  *
  * At 100 TB this is a LAYOUT operator: run once per table (or per
  * compaction window), then every 2-dim selective scan skips most files
  * for free. The interleave is a pure codegen'd HOF fold — usable inside
  * `repartitionByRange` + `sortWithinPartitions` exactly like any other
  * sort key.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns into one long: a's bit i → output bit 2i, b's bit i →
    * output bit 2i+1. 21 bits each keeps the result inside a positive
    * long with room to spare; values must be pre-scaled to that range
    * (rank/bucket first for skewed or wide domains).
    */
  def interleave(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftrightunsigned", al, i).bitwiseAND(lit(1L)),
          i * 2))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftrightunsigned", bl, i).bitwiseAND(lit(1L)),
          i * 2 + 1)))
  }

  /** Rewrite `df` into `nFiles` files clustered along the Z-curve of the
    * two dimensions: range-partition by the interleaved key (files own
    * contiguous curve segments), sort within each file (row groups own
    * sub-segments). Both dimensions' min/max spans per file shrink to
    * ~sqrt of the unclustered spread.
    */
  def cluster(df: DataFrame, a: Column, b: Column, nFiles: Int,
      bits: Int = 21): DataFrame = {
    val keyed = df.withColumn("__z", interleave(a, b, bits))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
