package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AutoRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withBinWidth[A](w: Long)(body: => A): A = {
    spark.conf.set("spark.graft.autoRangeJoin.binWidth", w.toString)
    try body
    finally spark.conf.unset("spark.graft.autoRangeJoin.binWidth")
  }

  private val points = spark.range(300)
    .select($"id".as("pid"), (($"id" * 37) % 500 - 50).as("p"))
  private val ivals = spark.range(50)
    .select($"id".as("iid"), (($"id" * 131) % 480 - 40).as("s"))
    .withColumn("e", $"s" + ($"iid" * 7) % 20)

  private def naiveJoin = points
    .join(ivals, $"p" >= $"s" && $"p" <= $"e")
    .select("pid", "iid")

  test("rewrites the naive BETWEEN join: no nested loop, same result") {
    val expected = naiveJoin.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val (got, plan) = withBinWidth(16) {
      val df = naiveJoin
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Generate explode"), plan)
    // exactly once per matching pair — multiset equality
    assert(got == expected)
  }

  test("negative bounds and bin-straddling intervals stay exact") {
    // handled by the pseudo-random fixture above (values span -50..450
    // with bin width 16 → negative bins and straddles are exercised);
    // this test pins a hand-checked edge: interval ending on a bin edge
    val p2 = Seq((1L, 16L), (2L, 15L), (3L, 32L)).toDF("pid", "p")
    val i2 = Seq((9L, 16L, 32L)).toDF("iid", "s", "e")
    val got = withBinWidth(16) {
      p2.join(i2, $"p" >= $"s" && $"p" <= $"e").select("pid")
        .as[Long].collect().toSet
    }
    assert(got == Set(1L, 3L))
  }

  test("inverted intervals (s > e) are dropped, not crashed on") {
    // Sequence(start, stop, step=1) throws on start > stop; the rewrite
    // must pre-filter s <= e so an inverted row behaves like the naive
    // join: it simply matches nothing. NULL bounds likewise.
    val p2 = Seq((1L, 10L), (2L, 20L)).toDF("pid", "p")
    val i2 = Seq((9L, Some(5L), Some(15L)), (8L, Some(40L), Some(12L)),
      (7L, None, Some(15L))).toDF("iid", "s", "e")
    val got = withBinWidth(16) {
      p2.join(i2, $"p" >= $"s" && $"p" <= $"e")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
    }
    assert(got == Set((1L, 9L)))
  }

  test("joins with extra conjuncts or equality are left untouched") {
    withBinWidth(16) {
      val extra = points.join(ivals,
        $"p" >= $"s" && $"p" <= $"e" && $"pid" =!= $"iid")
      assert(!extra.queryExecution.executedPlan.toString
        .contains("Generate explode"))
      val equi = points.join(ivals, $"p" === $"s")
      assert(!equi.queryExecution.executedPlan.toString
        .contains("Generate explode"))
    }
  }

  test("disabled by default: plan unchanged without the conf") {
    assert(!naiveJoin.queryExecution.executedPlan.toString
      .contains("Generate explode"))
  }
}
