package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      ivals: org.apache.spark.sql.DataFrame) =
    points.join(ivals, $"p".between($"s", $"e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("binned range join equals the naive non-equi join") {
    // pseudo-random but deterministic points and intervals, lengths 0-19
    val points = spark.range(500)
      .select($"id".as("pid"), (($"id" * 37) % 1000).as("p"))
    val ivals = spark.range(80)
      .select($"id".as("iid"), (($"id" * 131) % 990).as("s"))
      .withColumn("e", $"s" + ($"iid" * 7) % 20)
    val binned = RangeJoin.pointInterval(points, "p", ivals, "s", "e", 16)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(binned == naive(points, ivals))
  }

  test("bin-boundary points match: interval ends on a bin edge") {
    val points = Seq((1L, 16L), (2L, 15L), (3L, 17L), (4L, 31L), (5L, 32L))
      .toDF("pid", "p")
    val ivals = Seq((10L, 16L, 31L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInterval(points, "p", ivals, "s", "e", 16)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("interval spanning many bins still joins each point once") {
    val points = Seq((1L, 500L)).toDF("pid", "p")
    val ivals = Seq((7L, 0L, 1000L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInterval(points, "p", ivals, "s", "e", 16)
    assert(got.count() == 1)
  }

  test("interval overlap equals the naive cross filter, each pair once") {
    val a = spark.range(60)
      .select($"id".as("aid"), (($"id" * 83) % 400).as("as_"))
      .withColumn("ae", $"as_" + ($"aid" * 11) % 30)
    val b = spark.range(40)
      .select($"id".as("bid"), (($"id" * 157) % 390).as("bs"))
      .withColumn("be", $"bs" + ($"bid" * 13) % 25)
    val naivePairs = a.join(b, $"as_" <= $"be" && $"bs" <= $"ae")
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val binned = RangeJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be", 16)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: the arithmetic dedup must emit each pair EXACTLY
    // once, so compare sorted sequences, not sets
    assert(binned.sorted.toSeq == naivePairs.sorted.toSeq)
  }

  test("overlap pair sharing many bins dedups by first-overlap-bin") {
    val aa = Seq((1L, 0L, 100L)).toDF("aid", "as_", "ae")
    val bb = Seq((2L, 50L, 90L)).toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(aa, "as_", "ae", bb, "bs", "be", 8)
    assert(got.count() == 1)
  }
}
