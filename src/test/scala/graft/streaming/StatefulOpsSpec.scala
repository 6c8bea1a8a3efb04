package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Keyed-state continuity for [[StatefulOps.runningTotals]]: the fold
  * must resume each user's (total, n) across micro-batch boundaries via
  * the state store, and sort in-batch disorder by event time.
  */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("running totals survive the micro-batch boundary per key") {
    val dir = tmpDir("sfo_in")
    val ckpt = tmpDir("sfo_ckpt")
    val out = tmpDir("sfo_out")
    def drain(): Unit = {
      val stream = spark.readStream.option("header", "true")
        .schema("user_id LONG, us LONG, cents LONG").csv(dir)
        .as[StatefulOps.Event]
      val q = StatefulOps.runningTotals(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def result: Map[(Long, Long), (Long, Long)] =
      spark.read.parquet(out)
        .as[StatefulOps.RunningOut].collect()
        .map(r => (r.user_id, r.us) -> (r.running_cents, r.running_n)).toMap

    // batch 1: user 1 out of order in-file (300 before 100), user 2 once
    Files.writeString(Paths.get(dir, "b1.csv"),
      "user_id,us,cents\n1,300,30\n1,100,10\n2,100,5")
    drain()
    assert(result == Map(
      (1L, 100L) -> (10L, 1L), (1L, 300L) -> (40L, 2L),
      (2L, 100L) -> (5L, 1L)))

    // batch 2: both users continue — totals must RESUME, not restart
    Files.writeString(Paths.get(dir, "b2.csv"),
      "user_id,us,cents\n1,500,1\n2,400,7\n3,100,2")
    drain()
    assert(result == Map(
      (1L, 100L) -> (10L, 1L), (1L, 300L) -> (40L, 2L),
      (1L, 500L) -> (41L, 3L),
      (2L, 100L) -> (5L, 1L), (2L, 400L) -> (12L, 2L),
      (3L, 100L) -> (2L, 1L)))
  }
}
