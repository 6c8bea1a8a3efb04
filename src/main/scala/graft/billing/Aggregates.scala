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

  // --------------------------------------------------------------------
  // Incremental maintenance: mergeable partial states for ALL FOUR
  // rollups — the alternative to the reference's DELETE+INSERT full
  // recompute (`aggregates.py:31,96,163,226`). At 100 TB, rebuilding
  // every rollup from the whole fact history per ingest is the dominant
  // cost; instead each delta (one micro-batch / one ingested partition)
  // reduces to per-group partials that merge into stored state without
  // rescanning history. Counts, sums, and min/max merge exactly;
  // distinct counts are carried as HLL sketches (`hll_sketch_agg`) —
  // the only mergeable representation short of keeping the key sets.
  // --------------------------------------------------------------------

  /** What a rollup's mergeable state carries: grouping keys, the
    * distinct-counted columns as (source, sketch name, estimate name),
    * whether success/failure splits and the activity span are tracked,
    * and the reference table's name for its count column.
    */
  final case class RollupSpec(keys: Seq[String],
      hlls: Seq[(String, String, String)],
      withSuccess: Boolean, withSpan: Boolean, countName: String)

  val dailySpec: RollupSpec = RollupSpec(Seq("year", "month", "day"),
    Seq(("user_id", "users_hll", "approx_users"),
      ("resource_id", "resources_hll", "approx_resources")),
    withSuccess = true, withSpan = false, countName = "transaction_count")

  val userSpec: RollupSpec = RollupSpec(Seq("user_id"),
    Seq(("resource_id", "res_hll", "resources_used"),
      ("resource_type", "rt_hll", "resource_types_used"),
      ("operation_type", "op_hll", "operation_types"),
      ("region", "reg_hll", "regions_used")),
    withSuccess = false, withSpan = true, countName = "transaction_count")

  val serviceSpec: RollupSpec = RollupSpec(
    Seq("service_tier", "resource_type", "operation_type"),
    Seq(("user_id", "users_hll", "unique_users")),
    withSuccess = true, withSpan = false, countName = "operation_count")

  val regionSpec: RollupSpec = RollupSpec(Seq("region"),
    Seq(("user_id", "users_hll", "unique_users"),
      ("resource_type", "rt_hll", "resource_types"),
      ("operation_type", "op_hll", "operation_types")),
    withSuccess = false, withSpan = false, countName = "operation_count")

  /** Reduce a delta of raw billing rows to one mergeable partial row per
    * group.
    */
  def partial(raw: DataFrame, spec: RollupSpec): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n"), sum("credit_usage").as("total")) ++
        (if (spec.withSuccess) Seq(sum(successInt).as("ok_n")) else Nil) ++
        (if (spec.withSpan)
          Seq(min("timestamp").as("min_ts"), max("timestamp").as("max_ts"))
        else Nil) ++
        spec.hlls.map { case (c, sk, _) => hll_sketch_agg(col(c)).as(sk) }
    raw.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge partial states into one partial per group — partial in,
    * partial out, so merged state can be stored and merged again
    * (associative + commutative; the streaming `foreachBatch` fold in
    * [[BillingStore.mergeIntoDailyPartials]] relies on both).
    */
  def mergePartials(spec: RollupSpec)(partials: DataFrame*): DataFrame = {
    val aggs =
      Seq(sum("n").as("n"), sum("total").as("total")) ++
        (if (spec.withSuccess) Seq(sum("ok_n").as("ok_n")) else Nil) ++
        (if (spec.withSpan)
          Seq(min("min_ts").as("min_ts"), max("max_ts").as("max_ts"))
        else Nil) ++
        spec.hlls.map { case (_, sk, _) => hll_union_agg(col(sk)).as(sk) }
    partials.reduce(_ unionByName _)
      .groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Project a partial state into the rollup's served shape (distincts
    * as HLL estimates; span as first/last activity).
    */
  def finalizePartials(spec: RollupSpec)(partials: DataFrame): DataFrame = {
    val cols = spec.keys.map(col) ++ Seq(
      col("n").as(spec.countName),
      col("total").as("total_credit_usage"),
      (col("total") / col("n")).as("avg_credit_usage")) ++
      (if (spec.withSuccess)
        Seq(col("ok_n").as("successful_operations"),
          (col("n") - col("ok_n")).as("failed_operations"))
      else Nil) ++
      (if (spec.withSpan)
        Seq(col("min_ts").as("first_activity"),
          col("max_ts").as("last_activity"))
      else Nil) ++
      spec.hlls.map { case (_, sk, est) =>
        hll_sketch_estimate(col(sk)).as(est)
      }
    partials.select(cols: _*)
  }

  /** Daily-rollup conveniences (the spec the streaming store folds). */
  def dailyPartial(raw: DataFrame): DataFrame = partial(raw, dailySpec)

  def mergeDailyPartials(partials: DataFrame*): DataFrame =
    mergePartials(dailySpec)(partials: _*)

  def finalizeDaily(partials: DataFrame): DataFrame =
    finalizePartials(dailySpec)(partials)

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
