package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Bounded-state streaming dedup semantics
  * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
  * watermark delay of first sight are dropped; once the watermark passes
  * a key's event time + delay its state is evicted, so a far-later
  * duplicate is treated as new. That re-emission is exactly the contract
  * that makes the state bounded — this spec pins both directions with
  * hand-fed micro-batches (one AvailableNow drain per file against a
  * shared checkpoint).
  */
class StreamDedupWmSpec extends SparkSpec {
  import spark.implicits._

  test("within-watermark dups drop; expired keys re-emit") {
    val dir = tmpDir("sdw_in")
    val ckpt = tmpDir("sdw_ckpt")
    val out = tmpDir("sdw_out")
    val jan1 = 1735689600000000L // 2025-01-01T00:00Z epoch micros
    val hour = 3600L * 1000000
    val day = 24 * hour

    // file sink, not memory: the memory sink refuses checkpoint recovery,
    // and separate drains against one checkpoint are what give us
    // deterministic micro-batch boundaries
    def drain(): Unit = {
      val in = spark.readStream.option("header", "true")
        .schema("event_id LONG, us LONG").csv(dir)
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark(Seq("event_id"))
      val q = in.writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def ids: Seq[Long] = spark.read.parquet(out)
      .select("event_id").as[Long].collect().toSeq

    // batch 1: first sight of keys 1 and 2; watermark → Dec 30
    Files.writeString(Paths.get(dir, "b1.csv"),
      s"event_id,us\n1,$jan1\n2,$jan1")
    drain()
    assert(ids.sorted == Seq(1L, 2L))

    // batch 2: key 2 again one hour later — inside the 2-day window,
    // state alive → dropped; key 50 at Jan 10 advances the watermark
    // past Jan 8, evicting keys 1 and 2 (expiry Jan 3)
    Files.writeString(Paths.get(dir, "b2.csv"),
      s"event_id,us\n2,${jan1 + hour}\n50,${jan1 + 9 * day}")
    drain()
    assert(ids.sorted == Seq(1L, 2L, 50L))

    // batch 3: key 1 again at Jan 9 — after its state was evicted and
    // above the current watermark, so it is NEW by contract
    Files.writeString(Paths.get(dir, "b3.csv"),
      s"event_id,us\n1,${jan1 + 8 * day}")
    drain()
    assert(ids.sorted == Seq(1L, 1L, 2L, 50L))
  }
}
