package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Sessionize.Event(1L, ts("2025-01-01 10:00:00"), 1.0),
    Sessionize.Event(1L, ts("2025-01-01 10:03:00"), 2.0), // same session
    Sessionize.Event(1L, ts("2025-01-01 11:00:00"), 3.0), // gap > 5m → new
    Sessionize.Event(2L, ts("2025-01-01 10:00:00"), 4.0),
  )

  test("batch sessionization: gap splits sessions, aggregates correct") {
    val got = Sessionize.sessionizeBatch(fixture.toDS(), gapSeconds = 300)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(got.length == 3)
    assert(got(0).n_events == 2 && got(0).total_value == 3.0)
    assert(got(0).session_end == ts("2025-01-01 10:03:00"))
    assert(got(1).n_events == 1 && got(1).total_value == 3.0)
    assert(got(2).user_id == 2L)
  }

  test("streaming sessionization with custom state matches batch on " +
    "closed sessions") {
    val in = tmpDir("sess_in")
    val ckpt = tmpDir("sess_ckpt")
    // one file; the open sessions (one per user) stay in state, closed
    // ones are emitted
    fixture.toDS().toDF().coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(in)
    val schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(in)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(spark, stream, gapSeconds = 300)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val closed = spark.table("sess_out").as[Sessionize.Session].collect()
    // user 1's first session closed by the 11:00 event within the batch
    assert(closed.exists(s => s.user_id == 1L && s.n_events == 2 &&
      s.total_value == 3.0))
  }
}
