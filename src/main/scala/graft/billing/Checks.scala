package graft.billing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-side answer to the
  * reference's DDL constraints (`UNIQUE(timestamp, resource_id, user_id,
  * invoice_id)` and the aggregate-table PRIMARY KEYs,
  * pipeline/assets/ingest.py:190, aggregates.py:14-28). Spark has no
  * constraint enforcement; the honest equivalent is a VALIDATION PASS
  * whose violations are observable, gate-able numbers.
  *
  * Scale shape: each check is a violation-counting aggregate expression,
  * so an arbitrary check list compiles into ONE partial+final aggregate
  * over a single scan — adding a check adds a column, never a pass. The
  * natural-key uniqueness audit is the one extra aggregate (an exact
  * count distinct over the composite key is its own hash aggregate).
  */
object Checks {

  /** One named check: `violations` counts offending rows. */
  final case class Check(name: String, violations: Column)

  /** The reference's constraint set over the billing shape. */
  def billingChecks: Seq[Check] = Seq(
    Check("null_timestamp",
      sum(when(col("timestamp").isNull, 1L).otherwise(0L))),
    Check("null_user_id",
      sum(when(col("user_id").isNull, 1L).otherwise(0L))),
    Check("negative_usage",
      sum(when(col("credit_usage") < 0, 1L).otherwise(0L))),
    // NB: not `make_date(...).isNull` — under ANSI make_date is
    // non-nullable (it throws on invalid dates), so that predicate
    // constant-folds to false and the check silently vanishes. Pure
    // arithmetic never throws and both engines evaluate it identically.
    Check("bad_partition_date", {
      val monthOk = col("month").between(1, 12)
      val maxDay = dayofmonth(last_day(make_date(col("year"),
        when(monthOk, col("month")).otherwise(lit(1)), lit(1))))
      sum(when(!(monthOk && col("day").between(1, maxDay)), 1L)
        .otherwise(0L))
    }),
    Check("currency_domain",
      sum(when(!col("currency").isin("USD", "EUR", "GBP"), 1L)
        .otherwise(0L))),
  )

  /** Run the checks plus the natural-key uniqueness audit in two
    * aggregates total, emitting one row per check:
    * (check, violations, ok).
    */
  def validate(df: DataFrame, checks: Seq[Check],
      naturalKey: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // sum() over zero rows is NULL — an empty relation must validate
    // clean, not crash on unboxing
    val metricCols = checks.map(c =>
      coalesce(c.violations, lit(0L)).as(c.name)) :+
      count(lit(1)).as("_rows")
    val row = df.agg(metricCols.head, metricCols.tail: _*).head()
    val distinctKeys = df.select(naturalKey.map(col): _*).distinct().count()
    val total = row.getAs[Long]("_rows")
    val results = checks.map(c => (c.name, row.getAs[Long](c.name))) :+
      ("duplicate_natural_key", total - distinctKeys)
    results.toDF("check", "violations")
      .withColumn("ok", col("violations") === 0L)
      .orderBy("check")
  }

  def validateBilling(billing: DataFrame): DataFrame =
    validate(billing, billingChecks,
      Seq("timestamp", "resource_id", "user_id", "invoice_id"))
}
