package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top-k equals sort-take-k, at every partitioning") {
    val xs = new scala.util.Random(11).shuffle((1L to 500L).toList)
    val expected = xs.sorted.reverse.take(7)
    for (parts <- Seq(1, 3, 16)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(F.udaf(new TopKAgg(7), Encoders.scalaLong)(F.col("x")).as("ks"))
        .as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("fewer rows than k returns all, descending") {
    val got = Seq(3L, 9L, 1L).toDF("x")
      .agg(F.udaf(new TopKAgg(10), Encoders.scalaLong)(F.col("x")).as("ks"))
      .as[Seq[Long]].head()
    assert(got == Seq(9L, 3L, 1L))
  }

  test("duplicate values are kept, not deduplicated") {
    val got = Seq(5L, 5L, 5L, 2L).toDF("x")
      .agg(F.udaf(new TopKAgg(3), Encoders.scalaLong)(F.col("x")).as("ks"))
      .as[Seq[Long]].head()
    assert(got == Seq(5L, 5L, 5L))
  }

  test("per-group aggregation ranks within each group") {
    val got = Seq(("a", 1L), ("a", 7L), ("a", 3L), ("b", 9L), ("b", 2L))
      .toDF("g", "x").groupBy("g")
      .agg(F.udaf(new TopKAgg(2), Encoders.scalaLong)(F.col("x")).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got == Map("a" -> Seq(7L, 3L), "b" -> Seq(9L, 2L)))
  }
}
