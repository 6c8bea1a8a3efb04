package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (record-linkage) join: candidate pairs come from an
  * EQUI-join on a cheap blocking key, and only candidates pay the
  * string-distance verification — never the cross product.
  *
  * Scale shape: the blocking join is an ordinary shuffle (or broadcast)
  * hash join on the block key, so cost is Σ |block|² over same-key rows
  * instead of |A|×|B|; the Levenshtein verify runs map-side on the joined
  * rows (codegen'd built-in). Choosing a block key that SURVIVES the
  * expected corruption (a suffix for head-of-string noise, a phonetic
  * code for misspellings, length buckets for truncation) is the recall
  * lever — the gate uses a suffix block against head-corrupted names and
  * audits recall exactly.
  */
object FuzzyJoin {

  /** Pairs (a, b) whose `blockKey` matches exactly and whose `nameCol`
    * Levenshtein distance is ≤ `maxDistance`. Columns from both sides are
    * kept with `a_`/`b_` prefixes for the caller to project.
    */
  def linkByBlocking(a: DataFrame, b: DataFrame,
      blockKey: Column => Column, nameCol: String,
      maxDistance: Int): DataFrame = {
    val left = a.select(a.columns.map(c => col(c).as(s"a_$c")): _*)
      .withColumn("__bk", blockKey(col(s"a_$nameCol")))
    val right = b.select(b.columns.map(c => col(c).as(s"b_$c")): _*)
      .withColumn("__bk", blockKey(col(s"b_$nameCol")))
    left.join(right, "__bk")
      .withColumn("edit_dist",
        levenshtein(col(s"a_$nameCol"), col(s"b_$nameCol")))
      .filter(col("edit_dist") <= maxDistance)
      .drop("__bk")
  }
}
