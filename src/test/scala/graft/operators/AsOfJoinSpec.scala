package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at or before left time") {
    val quotes = Seq(
      ("A", ts("2025-01-01 10:00:00"), 100.0),
      ("A", ts("2025-01-01 10:05:00"), 101.0),
      ("A", ts("2025-01-01 10:10:00"), 102.0),
      ("B", ts("2025-01-01 10:02:00"), 50.0),
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2025-01-01 10:05:00"), 10L), // equal time → matches 101
      ("A", ts("2025-01-01 10:07:00"), 11L), // between → 101
      ("A", ts("2025-01-01 09:00:00"), 12L), // before any quote → null
      ("B", ts("2025-01-01 11:00:00"), 13L), // → 50
    ).toDF("sym", "tts", "qty")

    val got = AsOfJoin.backward(trades, quotes, Seq("sym"),
      "tts", "qts", Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(10L -> Some(101.0), 11L -> Some(101.0),
      12L -> None, 13L -> Some(50.0)))
  }

  test("matched time column reports which right row matched") {
    val r = Seq(("k", ts("2025-01-01 00:00:00"), 1.0))
      .toDF("k", "rt", "v")
    val l = Seq(("k", ts("2025-01-02 00:00:00"), "x"))
      .toDF("k", "lt", "tag")
    val row = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("v"))
      .collect()(0)
    assert(row.getAs[Timestamp]("rt_matched") == ts("2025-01-01 00:00:00"))
    assert(row.getAs[String]("tag") == "x")
  }
}
