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

  /** Spread the low 32 bits of a long so bit i lands at bit 2i — the
    * classic branchless "part1by1" mask cascade. Five shift/mask steps of
    * plain integer arithmetic, all inside whole-stage codegen (the
    * earlier HOF-fold spelling ran INTERPRETED — higher-order-function
    * lambdas have no codegen — and cost ~7 s over a 600k-row write).
    */
  private def spread(x0: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(x0) { case (x, (sh, m)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }
  }

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns into one long: a's bit i → output bit 2i, b's bit i →
    * output bit 2i+1. 21 bits each keeps the result inside a positive
    * long with room to spare; values must be pre-scaled to that range
    * (rank/bucket first for skewed or wide domains).
    */
  def interleave(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = lit((1L << bits) - 1)
    spread(a.cast("long").bitwiseAND(mask))
      .bitwiseOR(shiftleft(spread(b.cast("long").bitwiseAND(mask)), 1))
  }

  /** Map a wide or skewed numeric column onto [0, 2^bits) bucket ranks
    * via approx-quantile boundaries — the prep step [[interleave]] needs
    * when a dimension doesn't already fit its bit budget (a raw 64-bit id
    * or a power-law key would otherwise concentrate the curve). The
    * boundaries come from one `approxQuantile` pass (driver-side list,
    * bounded by 2^bits); the mapping itself is a when-chain of range
    * tests — plain codegen'd comparisons, no UDF, no join.
    */
  def quantileBucket(df: DataFrame, c: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 10, s"bucket bits must be in [1,10], got $bits")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val cuts = df.select(c.cast("double").as("__qb"))
      .stat.approxQuantile("__qb", probs, 1.0 / (4 * n))
    // build the chain from the LARGEST cut inward so the smallest-cut
    // test ends up outermost — evaluation then finds the first boundary
    // the value fits under; duplicate cuts (heavy hitters) are collapsed
    // by distinct, ties landing in one bucket
    val dcuts = cuts.distinct.sorted
    dcuts.zipWithIndex.reverse.foldLeft(lit(dcuts.length): Column) {
      case (acc, (cut, i)) => when(c.cast("double") <= cut, lit(i)).otherwise(acc)
    }
  }

  /** [[quantileBucket]] with the bucket indexes SCALED onto the full
    * `[0, 2^bits)` range: when the column has fewer distinct values than
    * buckets, raw indexes occupy only the low bits and [[interleave]]'s
    * other dimension silently dominates the curve's high bits — scaling
    * keeps the two dimensions' bit budgets balanced regardless of
    * cardinality, which is what makes the curve segments shrink BOTH
    * per-file spans.
    */
  def quantileBucketScaled(df: DataFrame, c: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 10,
      s"bucket bits must be in [1,10], got $bits")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val cuts = df.select(c.cast("double").as("__qb"))
      .stat.approxQuantile("__qb", probs, 1.0 / (4 * n))
    val dcuts = cuts.distinct.sorted
    val scale = (n - 1).toDouble / math.max(dcuts.length, 1)
    dcuts.zipWithIndex.reverse
      .foldLeft(lit((dcuts.length * scale).toLong): Column) {
        case (acc, (cut, i)) =>
          when(c.cast("double") <= cut, lit((i * scale).toLong))
            .otherwise(acc)
      }
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
