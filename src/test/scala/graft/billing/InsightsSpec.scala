package graft.billing

import java.sql.Timestamp

import graft.SparkSpec

class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private def rec(user: String, usage: Double, success: Boolean,
      tier: String, op: String): Schemas.BillingRecord =
    Schemas.BillingRecord(Timestamp.valueOf("2025-04-23 10:00:00"), "r1",
      user, usage, "us", tier, op, success, "compute",
      s"i-$user-$usage", "USD", 2025, 4, 23)

  private lazy val raw = spark.createDataFrame(Seq(
    rec("u1", 1.0, success = true, "free", "read"),
    rec("u1", 2.0, success = false, "free", "read"),
    rec("u2", 3.0, success = true, "paid", "write"),
  ))

  test("A5: total credit usage") {
    assert(Insights.totalCreditUsage(raw).collect()(0).getDouble(0) == 6.0)
  }

  test("O1: top users ranks by count with deterministic tie-break") {
    val ua = Aggregates.user(raw)
    val got = Insights.topUsers(ua, k = 2).collect()
    assert(got(0).getAs[String]("user_id") == "u1")
    assert(got(1).getAs[String]("user_id") == "u2")
  }

  test("A8: success rates divide as double, ordered by rate") {
    val got = Insights.successRates(raw).collect()
    assert(got(0).getAs[String]("service_tier") == "paid")
    assert(got(0).getAs[Double]("success_rate") == 1.0)
    assert(got(1).getAs[Double]("success_rate") == 0.5)
  }

  test("F6/F9: markdown report renders with null-display defaults") {
    val report = Insights.renderReport(
      total = Some(6.0),
      topUsers = Seq(org.apache.spark.sql.Row("u1", 2L),
        org.apache.spark.sql.Row(null, 1L)),
      topRegions = Seq(org.apache.spark.sql.Row("us", 6.0)),
      opFreq = Seq(org.apache.spark.sql.Row("read", 2L)),
      rates = Seq(org.apache.spark.sql.Row("free", 1L, 2L, 0.5)),
      files = 2, records = 3)
    assert(report.contains("**Total credit usage:** 6.00"))
    assert(report.contains("| Unknown | 1 |"))
    assert(report.contains("| free | 1 | 2 | 0.50 |"))
    assert(report.contains("2 files, 3 records."))
  }
}
