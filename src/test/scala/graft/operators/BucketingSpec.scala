package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed tables co-locate join keys at write time: a join of two
  * tables bucketed by the same key into the same bucket count plans with
  * NO shuffle exchange on either side — the 100 TB recipe for repeated
  * fact-fact joins.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans without a shuffle") {
    val wh = tmpDir("bucket_wh")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce a shuffle; only the final
    // aggregation exchanges (on the small grouped output)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join should be shuffle-free via bucketing:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
