package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val large = spark.range(1000)
      .select(when($"id" < 900, 1L).otherwise($"id").as("k"),
        ($"id" * 2).as("v"))
    val small = Seq((1L, "hot"), (901L, "cold"), (999L, "cold2"))
      .toDF("k", "label")
    val plain = large.join(small, Seq("k")).groupBy("label")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("label").collect().toSeq
    val salted = SkewJoin.saltedJoin(large, small, Seq("k"), salts = 7)
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("label").collect().toSeq
    assert(salted == plain)
  }

  test("salted left join preserves unmatched large-side rows") {
    val large = spark.range(10).select(($"id" % 3).as("k"), $"id".as("v"))
    val small = Seq((0L, "z")).toDF("k", "label")
    val plain = large.join(small, Seq("k"), "left").count()
    val salted = SkewJoin.saltedJoin(large, small, Seq("k"), 4, "left").count()
    assert(salted == plain)
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val df = spark.range(5000)
      .select(when($"id" < 4500, "hot").otherwise("cold").as("k"),
        lit(1.5).as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect().toSeq
    val salted = SkewJoin.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }
}
