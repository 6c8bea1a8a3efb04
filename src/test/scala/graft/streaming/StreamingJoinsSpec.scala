package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("stream-stream join: window bounds are inclusive on both ends") {
    val dirC = tmpDir("ssj_c")
    val dirE = tmpDir("ssj_e")
    val ckpt = tmpDir("ssj_ckpt")
    val base = 1700000000000000L // epoch micros
    // clicks: user 1 at t=0
    Files.writeString(Paths.get(dirC, "c.csv"),
      s"user_id,event_id,us\n1,100,$base")
    // errors: at t=0 (inclusive), t=300s (inclusive), t=300s+1us (out),
    // t=-1us (before click, out), other user at t=10 (out)
    Files.writeString(Paths.get(dirE, "e.csv"), Seq(
      "user_id,event_id,us",
      s"1,200,$base",
      s"1,201,${base + 300L * 1000000}",
      s"1,202,${base + 300L * 1000000 + 1}",
      s"1,203,${base - 1}",
      s"2,204,${base + 10L * 1000000}").mkString("\n"))
    def side(dir: String) = spark.readStream.option("header", "true")
      .schema("user_id LONG, event_id LONG, us LONG").csv(dir)
      .withColumn("ts", timestamp_micros(col("us")))
    val q = StreamingJoins.clickErrorPairs(side(dirC), side(dirE), 300)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_spec_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj_spec_out")
      .select("error_id", "delta_us").as[(Long, Long)].collect().toMap
    assert(got == Map(200L -> 0L, 201L -> 300000000L))
  }
}
