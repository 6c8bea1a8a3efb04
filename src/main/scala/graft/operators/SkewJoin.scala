package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`) covers sort-merge joins at runtime;
  * explicit salting remains the tool when a handful of hot keys dominate a
  * shuffled hash join or an aggregation: the large side gets a
  * deterministic salt in [0, salts), the small side is replicated once per
  * salt value, so one hot key spreads across `salts` reducers.
  */
object SkewJoin {

  /** `large ⋈ small` on `key`, hot keys spread over `salts` partitions.
    * The salt is derived from a hash of the large side's whole row id
    * stream (`monotonically_increasing_id`), so it is uniform and cheap;
    * correctness does not depend on the salt distribution.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, key :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the classic hot-key count/sum shape.
    * (Spark's own partial aggregation usually suffices; this is for
    * aggregations where map-side combine is defeated, e.g. after an
    * exchange that clustered the hot key.)
    */
  def saltedCountSum(df: DataFrame, key: Seq[String], valueCol: String,
      salts: Int): DataFrame = {
    val keyCols = key.map(col)
    df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keyCols: _*)
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }
}
