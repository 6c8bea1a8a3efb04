package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(
    (1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0), (4L, "w", 40.0)
  ).toDF("k", "s", "v")
  // 1 unchanged, 2 value-changed, 3 removed, 5 added
  private val b = Seq(
    (1L, "x", 10.0), (2L, "y", 21.0), (4L, "w", 40.0), (5L, "n", 50.0)
  ).toDF("k", "s", "v")

  test("diff classifies added/removed/changed/unchanged by key") {
    val got = TableDiff.diff(a, b, "k", Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
  }

  test("summary counts per status") {
    val got = TableDiff.diffSummary(a, b, "k", Seq("s", "v"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("projection scoping: a change outside `cols` is invisible") {
    val b2 = Seq((1L, "CHANGED", 10.0)).toDF("k", "s", "v")
    val got = TableDiff.diff(a.filter(col("k") === 1), b2, "k", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged"))
  }

  test("separator keeps adjacent fields unambiguous") {
    val x = Seq((1L, "ab", "c")).toDF("k", "p", "q")
    val y = Seq((1L, "a", "bc")).toDF("k", "p", "q")
    val got = TableDiff.diff(x, y, "k", Seq("p", "q"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed"))
  }
}
