package graft.billing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four rollup tables of the reference
  * (`pipeline/assets/aggregates.py:34-48,99-115,166-181,229-242`), as pure
  * `DataFrame => DataFrame` functions over the raw_billing relation.
  *
  * Design notes for scale (SURVEY §2.4, §4):
  *  - Each rollup is a single hash aggregate; Spark plans partial (map-side)
  *    + final aggregation, so the shuffle carries one row per group per
  *    input partition, not the fact rows.
  *  - `COUNT(DISTINCT …)` is exact for oracle parity with the reference.
  *    Multiple distincts in one aggregate make Catalyst plan an `Expand`
  *    (input ×N before the shuffle). At the 100 TB design point use the
  *    `approx` variants below (HLL sketches, single pass, no Expand).
  *  - The reference recomputes these tables from scratch each run
  *    (DELETE+INSERT, `aggregates.py:31,96,163,226`) — the Spark equivalent
  *    is `df.write.mode("overwrite")`, see [[BillingStore]].
  */
object Aggregates {

  private val successInt = when(col("success"), 1).otherwise(0)

  /** daily_aggs (`aggregates.py:34-48`): per-(year,month,day) rollup. */
  def daily(raw: DataFrame): DataFrame =
    raw.groupBy("year", "month", "day").agg(
      count(lit(1)).as("transaction_count"),
      sum("credit_usage").as("total_credit_usage"),
      avg("credit_usage").as("avg_credit_usage"),
      countDistinct("user_id").as("unique_users"),
      countDistinct("resource_id").as("unique_resources"),
      sum(successInt).as("successful_operations"),
      sum(lit(1) - successInt).as("failed_operations"),
    )

  /** user_aggs (`aggregates.py:99-115`): per-user rollup with activity span. */
  def user(raw: DataFrame): DataFrame =
    raw.groupBy("user_id").agg(
      count(lit(1)).as("transaction_count"),
      sum("credit_usage").as("total_credit_usage"),
      avg("credit_usage").as("avg_credit_usage"),
      countDistinct("resource_id").as("resources_used"),
      countDistinct("resource_type").as("resource_types_used"),
      countDistinct("operation_type").as("operation_types"),
      countDistinct("region").as("regions_used"),
      min("timestamp").as("first_activity"),
      max("timestamp").as("last_activity"),
    )

  /** service_aggs (`aggregates.py:166-181`): per (tier, resource, op) rollup. */
  def service(raw: DataFrame): DataFrame =
    raw.groupBy("service_tier", "resource_type", "operation_type").agg(
      count(lit(1)).as("operation_count"),
      sum("credit_usage").as("total_credit_usage"),
      avg("credit_usage").as("avg_credit_usage"),
      countDistinct("user_id").as("unique_users"),
      sum(successInt).as("successful_operations"),
      sum(lit(1) - successInt).as("failed_operations"),
    )

  /** region_aggs (`aggregates.py:229-242`): per-region rollup. */
  def region(raw: DataFrame): DataFrame =
    raw.groupBy("region").agg(
      count(lit(1)).as("operation_count"),
      sum("credit_usage").as("total_credit_usage"),
      avg("credit_usage").as("avg_credit_usage"),
      countDistinct("user_id").as("unique_users"),
      countDistinct("resource_type").as("resource_types"),
      countDistinct("operation_type").as("operation_types"),
    )

  /** Mergeable partial state for the daily rollup — the incremental
    * alternative to the reference's DELETE+INSERT full recompute
    * (`aggregates.py:31`): at 100 TB, rebuilding every rollup from the
    * whole fact history per ingest is the dominant cost, so each delta
    * (one micro-batch / one ingested partition) reduces to per-day
    * partials that [[mergeDaily]] folds into the stored state without
    * rescanning history. Counts and sums merge exactly; distinct counts
    * are carried as HLL sketches (`hll_sketch_agg`) — the only mergeable
    * representation short of keeping the key sets themselves.
    */
  def dailyPartial(raw: DataFrame): DataFrame =
    raw.groupBy("year", "month", "day").agg(
      count(lit(1)).as("n"),
      sum("credit_usage").as("total"),
      sum(successInt).as("ok_n"),
      hll_sketch_agg(col("user_id")).as("users_hll"),
      hll_sketch_agg(col("resource_id")).as("resources_hll"),
    )

  /** Merge [[dailyPartial]] states into one partial state per day —
    * partial in, partial out, so merged state can be stored and merged
    * again (associative + commutative; the streaming `foreachBatch` fold
    * in [[BillingStore.mergeIntoDailyPartials]] relies on both).
    */
  def mergeDailyPartials(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy("year", "month", "day").agg(
        sum("n").as("n"),
        sum("total").as("total"),
        sum("ok_n").as("ok_n"),
        hll_union_agg(col("users_hll")).as("users_hll"),
        hll_union_agg(col("resources_hll")).as("resources_hll"),
      )

  /** Project a partial state into the daily_aggs shape. */
  def finalizeDaily(partials: DataFrame): DataFrame =
    partials.select(col("year"), col("month"), col("day"),
      col("n").as("transaction_count"),
      col("total").as("total_credit_usage"),
      (col("total") / col("n")).as("avg_credit_usage"),
      col("ok_n").as("successful_operations"),
      (col("n") - col("ok_n")).as("failed_operations"),
      hll_sketch_estimate(col("users_hll")).as("approx_users"),
      hll_sketch_estimate(col("resources_hll")).as("approx_resources"))

  /** Fold [[dailyPartial]] states (stored + any number of deltas) into the
    * daily_aggs shape.
    */
  def mergeDaily(partials: DataFrame*): DataFrame =
    finalizeDaily(mergeDailyPartials(partials: _*))

  /** 100 TB-scale variant of [[user]]: HLL distincts — one pass, no Expand,
    * mergeable sketches (documented divergence from the exact reference
    * semantics; SURVEY §2.4).
    */
  def userApprox(raw: DataFrame, rsd: Double = 0.05): DataFrame =
    raw.groupBy("user_id").agg(
      count(lit(1)).as("transaction_count"),
      sum("credit_usage").as("total_credit_usage"),
      avg("credit_usage").as("avg_credit_usage"),
      approx_count_distinct("resource_id", rsd).as("resources_used"),
      approx_count_distinct("resource_type", rsd).as("resource_types_used"),
      approx_count_distinct("operation_type", rsd).as("operation_types"),
      approx_count_distinct("region", rsd).as("regions_used"),
      min("timestamp").as("first_activity"),
      max("timestamp").as("last_activity"),
    )
}
