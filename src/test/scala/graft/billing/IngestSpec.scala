package graft.billing

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def billingRow(
      ts: String, res: String, user: String, inv: String,
      usage: Double = 1.0, success: Boolean = true): Schemas.BillingRecord =
    Schemas.BillingRecord(Timestamp.valueOf(ts), res, user, usage,
      "us-east-1", "free", "read", success, "compute", inv, "USD",
      ts.take(4).toInt, ts.slice(5, 7).toInt, ts.slice(8, 10).toInt)

  private def df(rs: Schemas.BillingRecord*): DataFrame =
    spark.createDataFrame(rs)

  test("J1: dedup append keeps only unmatched natural keys") {
    val existing = df(billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"))
    val staged = df(
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"), // dup
      billingRow("2025-04-23 11:00:00", "r2", "u1", "i2")) // new
    val fresh = Ingest.newRows(staged, existing)
    assert(rows(fresh.select("resource_id")) == Seq(Seq("r2")))
  }

  test("J1: NULL key columns never match — NULL-keyed rows re-insert " +
    "(reference equi-join semantics, ingest.py:248-257)") {
    val r = billingRow("2025-04-23 10:00:00", "r1", "u1", "i1")
    val nullKeyed = r.copy(resource_id = null)
    val existing = df(nullKeyed)
    val staged = df(nullKeyed) // identical row, NULL resource_id
    assert(Ingest.newRows(staged, existing).count() == 1,
      "row with NULL key must be treated as new every time")
  }

  test("in-batch dedup collapses duplicate keys") {
    val staged = df(
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"),
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"),
      billingRow("2025-04-23 11:00:00", "r2", "u1", "i2"))
    assert(Ingest.dedupWithinBatch(staged).count() == 2)
  }

  test("T6: backfill window filters by partition date incl. month rollover") {
    val data = df(
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"),
      billingRow("2025-04-30 10:00:00", "r2", "u1", "i2"),
      billingRow("2025-05-01 10:00:00", "r3", "u1", "i3"),
      billingRow("2025-05-02 10:00:00", "r4", "u1", "i4"))
    val got = Ingest.backfill(data, "2025-04-30", "2025-05-01")
      .select("resource_id").as[String].collect().sorted
    assert(got.toSeq == Seq("r2", "r3"))
  }

  test("S1/S9: csv write → explicit-schema read round-trips values") {
    val out = tmpDir("ingest_csv")
    val data = df(
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1", usage = -2.5),
      billingRow("2025-05-01 11:30:00", "r2", "u2", "i2", success = false))
    data.write.mode("overwrite").option("header", "true").csv(out)
    val back = Ingest.readCsv(spark, s"$out/part-*.csv")
    assert(back.schema == Schemas.billing)
    assert(rows(back.orderBy("resource_id")) == rows(data.orderBy("resource_id")))
  }

  test("S4: hive tree read discovers partition columns and prunes") {
    val root = tmpDir("hive_tree")
    val data = df(
      billingRow("2025-04-23 10:00:00", "r1", "u1", "i1"),
      billingRow("2025-05-01 11:00:00", "r2", "u2", "i2"))
    data.write.mode("overwrite").option("header", "true")
      .partitionBy("year", "month", "day").csv(root)
    // partition dirs are year=2025/month=4/... (no zero-pad from Spark);
    // match with the glob
    val tree = spark.read.option("header", "true")
      .option("basePath", root)
      .schema(Schemas.billingNoPartitionCols)
      .csv(s"$root/year=*/month=*/day=*")
    assert(tree.count() == 2)
    val pruned = tree.filter(col("month") === 5)
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("F7/S6: hive path build/parse round-trip") {
    val got = spark.range(1).select(
      HivePaths.pathFor(lit(2025), lit(4), lit(7)).as("p"))
      .select(col("p"), HivePaths.yearOf(col("p")),
        HivePaths.monthOf(col("p")), HivePaths.dayOf(col("p")))
      .collect()(0)
    assert(got.toSeq == Seq("year=2025/month=04/day=07", 2025, 4, 7))
  }
}
