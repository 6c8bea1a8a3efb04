package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.billing.BillingStore

class StreamingIngestSpec extends SparkSpec {

  private val header = "timestamp,resource_id,user_id,credit_usage,region," +
    "service_tier,operation_type,success,resource_type,invoice_id,currency," +
    "year,month,day"

  private def csvLine(ts: String, res: String, inv: String): String =
    s"$ts,$res,u1,2.5,us-east-1,free,read,true,compute,$inv,USD," +
      s"${ts.take(4)},${ts.slice(5, 7).toInt},${ts.slice(8, 10).toInt}"

  test("T1/T2/T5: AvailableNow drain is incremental and dedup-idempotent") {
    val in = tmpDir("stream_in")
    val storeDir = tmpDir("stream_store")
    val ckpt = tmpDir("stream_ckpt")
    val store = BillingStore(storeDir)

    Files.writeString(Paths.get(in, "b1.csv"), Seq(header,
      csvLine("2025-04-23 10:00:00", "r1", "i1"),
      csvLine("2025-04-23 11:00:00", "r2", "i2")).mkString("\n"))
    val q1 = StreamingIngest.start(spark, in, store, ckpt)
    q1.awaitTermination()
    assert(store.raw(spark).count() == 2)
    assert(store.agg(spark, "daily").count() == 1)

    // second file: one duplicate of r1 + one new row; checkpoint must skip
    // b1.csv entirely, dedup must drop the r1 copy
    Files.writeString(Paths.get(in, "b2.csv"), Seq(header,
      csvLine("2025-04-23 10:00:00", "r1", "i1"),
      csvLine("2025-04-24 09:00:00", "r3", "i3")).mkString("\n"))
    val q2 = StreamingIngest.start(spark, in, store, ckpt)
    q2.awaitTermination()
    assert(store.raw(spark).count() == 3)
    assert(store.agg(spark, "daily").count() == 2)

    // third run with nothing new: a no-op
    val q3 = StreamingIngest.start(spark, in, store, ckpt,
      StreamingIngest.AggMaintenance.Defer)
    q3.awaitTermination()
    assert(store.raw(spark).count() == 3)
  }

  test("RefreshTouchedDaily maintains the daily rollup per batch days") {
    val in = tmpDir("stream_in3")
    val storeDir = tmpDir("stream_store3")
    val ckpt = tmpDir("stream_ckpt3")
    val store = BillingStore(storeDir)
    Files.writeString(Paths.get(in, "b1.csv"), Seq(header,
      csvLine("2025-04-23 10:00:00", "r1", "i1"),
      csvLine("2025-04-23 11:00:00", "r2", "i2")).mkString("\n"))
    StreamingIngest.start(spark, in, store, ckpt,
      StreamingIngest.AggMaintenance.RefreshTouchedDaily).awaitTermination()
    val d1 = store.agg(spark, "daily").collect()
    assert(d1.length == 1 && d1(0).getAs[Long]("transaction_count") == 2L)
    // second delivery: a redelivered day-23 row plus a new day-24 row —
    // the refresh recomputes day 23 (unchanged after dedup) and adds 24
    Files.writeString(Paths.get(in, "b2.csv"), Seq(header,
      csvLine("2025-04-23 10:00:00", "r1", "i1"),
      csvLine("2025-04-24 09:00:00", "r3", "i3")).mkString("\n"))
    StreamingIngest.start(spark, in, store, ckpt,
      StreamingIngest.AggMaintenance.RefreshTouchedDaily).awaitTermination()
    val d2 = store.agg(spark, "daily")
      .orderBy("day").collect()
    assert(d2.map(r => (r.getAs[Int]("day"),
      r.getAs[Long]("transaction_count"))).toSeq == Seq((23, 2L), (24, 1L)))
  }

  test("raw store partition pruning: day filter reads one partition") {
    val storeDir = tmpDir("stream_store2")
    val store = BillingStore(storeDir)
    import spark.implicits._
    val in = tmpDir("stream_in2")
    val ckpt = tmpDir("stream_ckpt2")
    Files.writeString(Paths.get(in, "b.csv"), Seq(header,
      csvLine("2025-04-23 10:00:00", "r1", "i1"),
      csvLine("2025-04-24 11:00:00", "r2", "i2")).mkString("\n"))
    StreamingIngest.start(spark, in, store, ckpt,
      StreamingIngest.AggMaintenance.Defer)
      .awaitTermination()
    val pruned = store.raw(spark).filter($"day" === 24)
    assert(pruned.count() == 1)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(day"))
  }

  test("windowed counts with watermark emit finalized event-time windows") {
    val in = tmpDir("stream_win")
    val ckpt = tmpDir("stream_win_ckpt")
    Files.writeString(Paths.get(in, "b.csv"), Seq(header,
      csvLine("2025-04-23 10:05:00", "r1", "i1"),
      csvLine("2025-04-23 10:40:00", "r2", "i2"),
      csvLine("2025-04-23 13:10:00", "r3", "i3")).mkString("\n"))
    val stream = spark.readStream.option("header", "true")
      .schema(graft.billing.Schemas.billing).csv(in)
    val q = StreamingIngest.windowedCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // watermark = 13:10 - 2h = 11:10 → the 10:00-11:00 window is final
    val out = spark.table("win_out")
      .select(col("window.start").cast("string"), col("n")).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "2025-04-23 10:00:00")
    assert(out(0).getAs[Long]("n") == 2L)
  }
}
