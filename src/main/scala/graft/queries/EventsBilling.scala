package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic mapping of the driver's `events` table onto the reference's
  * raw_billing shape (FIXTURES.md §B: ts≈timestamp, user_id, event_type≈
  * operation_type, value≈credit_usage; the remaining columns are derived
  * with simple modular arithmetic so the DuckDB oracle can mirror them
  * exactly). This lets every reference rollup (SURVEY §2.4) run unchanged
  * through [[graft.billing.Aggregates]] on driver data.
  */
object EventsBilling {

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    adapt(Tables.events(spark, sfDir))

  def adapt(events: DataFrame): DataFrame = {
    val id = col("event_id")
    events.select(
      col("ts").as("timestamp"),
      concat(lit("r"), (id % 100).cast("string")).as("resource_id"),
      col("user_id").cast("string").as("user_id"),
      col("value").as("credit_usage"),
      col("event_type").as("region"),
      concat(lit("tier"), (col("user_id") % 3).cast("string")).as("service_tier"),
      col("event_type").as("operation_type"),
      (id % 2 === 0).as("success"),
      concat(lit("rt"), (id % 5).cast("string")).as("resource_type"),
      concat(lit("inv"), (id % 200).cast("string")).as("invoice_id"),
      lit("USD").as("currency"),
      year(col("ts")).as("year"),
      month(col("ts")).as("month"),
      dayofmonth(col("ts")).as("day"),
    )
  }

  /** DuckDB mirror of [[adapt]]; prepend to oracle statements as a CTE. */
  val cte: String =
    """WITH billing AS (
      |  SELECT ts AS "timestamp",
      |         concat('r', CAST(event_id % 100 AS VARCHAR)) AS resource_id,
      |         CAST(user_id AS VARCHAR) AS user_id,
      |         value AS credit_usage,
      |         event_type AS region,
      |         concat('tier', CAST(user_id % 3 AS VARCHAR)) AS service_tier,
      |         event_type AS operation_type,
      |         event_id % 2 = 0 AS success,
      |         concat('rt', CAST(event_id % 5 AS VARCHAR)) AS resource_type,
      |         concat('inv', CAST(event_id % 200 AS VARCHAR)) AS invoice_id,
      |         'USD' AS currency,
      |         CAST(year(ts) AS INTEGER) AS year,
      |         CAST(month(ts) AS INTEGER) AS month,
      |         CAST(day(ts) AS INTEGER) AS day
      |  FROM events)""".stripMargin
}
