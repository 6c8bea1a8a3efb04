package graft.billing

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (timestamp, resource_id, user_id, credit_usage, currency, y, m, d)
  private def frame = Seq(
    (ts("2024-01-01 00:00:00"), "r1", "u1", 1.5, "USD", 2024, 1, 1),
    (ts("2024-01-01 00:00:00"), "r1", "u1", 2.5, "USD", 2024, 1, 1), // dup key
    (null.asInstanceOf[Timestamp], "r2", "u2", 3.0, "USD", 2024, 1, 2),
    (ts("2024-01-03 00:00:00"), "r3", null, -4.0, "JPY", 2024, 2, 30),
  ).toDF("timestamp", "resource_id", "user_id", "credit_usage",
      "currency", "year", "month", "day")
    .withColumn("invoice_id", lit("inv1"))

  test("violation counters count exactly the planted defects") {
    val out = Checks.validate(frame, Checks.billingChecks,
        Seq("timestamp", "resource_id", "user_id", "invoice_id"))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(out("null_timestamp") == 1)
    assert(out("null_user_id") == 1)
    assert(out("negative_usage") == 1)
    assert(out("bad_partition_date") == 1) // Feb 30
    assert(out("currency_domain") == 1)    // JPY
    assert(out("duplicate_natural_key") == 1)
  }

  test("an empty frame validates clean (no NULL-unboxing crash)") {
    val out = Checks.validate(frame.filter(lit(false)),
      Checks.billingChecks,
      Seq("timestamp", "resource_id", "user_id", "invoice_id"))
    assert(out.count() == 6)
    assert(out.filter(!col("ok")).count() == 0)
  }

  test("a clean frame passes every check") {
    val clean = frame.filter(col("timestamp").isNotNull &&
      col("user_id").isNotNull && col("credit_usage") >= 0 &&
      col("currency") === "USD" && col("month") === 1)
      .dropDuplicates("timestamp", "resource_id", "user_id", "invoice_id")
    val out = Checks.validate(clean, Checks.billingChecks,
      Seq("timestamp", "resource_id", "user_id", "invoice_id"))
    assert(out.filter(!col("ok")).count() == 0)
  }
}
