package graft.billing

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The insights report (reference `pipeline/assets/reports.py:5-141`):
  * six read queries (A5-A9, O1) plus a driver-side markdown renderer (F6).
  * Query results are tiny (top-5s and scalars), so `collect()` here is the
  * correct boundary — the heavy lifting stays distributed.
  */
object Insights {

  /** A5: global total credit usage (`reports.py:21-23`). */
  def totalCreditUsage(raw: DataFrame): DataFrame =
    raw.agg(sum("credit_usage").as("total_credit_usage"))

  /** O1: top-5 most active users (`reports.py:30-35`). Catalyst plans
    * TakeOrderedAndProject — a true distributed top-k, never a full sort.
    */
  def topUsers(userAggs: DataFrame, k: Int = 5): DataFrame =
    userAggs.select("user_id", "transaction_count")
      .orderBy(desc("transaction_count"), asc("user_id"))
      .limit(k)

  /** O1: top-5 regions by spend (`reports.py:39-44`). */
  def topRegions(regionAggs: DataFrame, k: Int = 5): DataFrame =
    regionAggs.select("region", "total_credit_usage")
      .orderBy(desc("total_credit_usage"), asc("region"))
      .limit(k)

  /** A7: operation frequency (`reports.py:48-53`). */
  def operationFrequency(raw: DataFrame): DataFrame =
    raw.groupBy("operation_type").agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc("operation_type"))

  /** A8: success rate per service tier (`reports.py:57-66`). The reference
    * casts to FLOAT before dividing to avoid integer division — kept as an
    * explicit cast-then-divide.
    */
  def successRates(raw: DataFrame): DataFrame =
    raw.groupBy("service_tier").agg(
      sum(when(col("success"), 1).otherwise(0)).as("success_count"),
      count(lit(1)).as("total_count"),
    ).withColumn("success_rate",
      col("success_count").cast("double") / col("total_count"))
      .orderBy(desc("success_rate"), asc("service_tier"))

  /** A9: ledger summary (`reports.py:123-126`). */
  def ledgerSummary(ledger: DataFrame): DataFrame =
    ledger.agg(
      count(lit(1)).as("files_processed"),
      sum("record_count").as("records_ingested"),
    )

  /** F6/F9: render the markdown report (`reports.py:69-132`). Formatting is
    * presentation, not query — plain Scala string building over collected
    * top-k rows, with the reference's null-display defaults
    * ("Unknown" / 0, `reports.py:80-117`).
    */
  def renderReport(
      total: Option[Double],
      topUsers: Seq[Row],
      topRegions: Seq[Row],
      opFreq: Seq[Row],
      rates: Seq[Row],
      files: Long,
      records: Long): String = {
    def s(v: Any): String = Option(v).map(_.toString).getOrElse("Unknown")
    def d(v: Any): String = Option(v).map {
      case x: Double => f"$x%.2f"
      case x => x.toString
    }.getOrElse("0.00")
    val sb = new StringBuilder
    sb ++= "# Billing Insights Report\n\n"
    sb ++= f"**Total credit usage:** ${total.getOrElse(0.0)}%.2f\n\n"
    sb ++= "## Top Users\n\n| user_id | transactions |\n|---|---|\n"
    topUsers.foreach(r => sb ++= s"| ${s(r.get(0))} | ${s(r.get(1))} |\n")
    sb ++= "\n## Top Regions\n\n| region | total_credit_usage |\n|---|---|\n"
    topRegions.foreach(r => sb ++= s"| ${s(r.get(0))} | ${d(r.get(1))} |\n")
    sb ++= "\n## Operation Frequency\n\n| operation | count |\n|---|---|\n"
    opFreq.foreach(r => sb ++= s"| ${s(r.get(0))} | ${s(r.get(1))} |\n")
    sb ++= "\n## Success Rates\n\n| tier | success | total | rate |\n|---|---|---|---|\n"
    rates.foreach(r =>
      sb ++= s"| ${s(r.get(0))} | ${s(r.get(1))} | ${s(r.get(2))} | ${d(r.get(3))} |\n")
    sb ++= s"\n## Ingestion\n\n$files files, $records records.\n"
    sb.toString
  }
}
