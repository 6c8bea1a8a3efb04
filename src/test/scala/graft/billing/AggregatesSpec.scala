package graft.billing

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class AggregatesSpec extends SparkSpec {

  private def rec(ts: String, user: String, usage: Double, success: Boolean,
      region: String = "us", tier: String = "free", op: String = "read",
      res: String = "r1", rtype: String = "compute"): Schemas.BillingRecord =
    Schemas.BillingRecord(Timestamp.valueOf(ts), res, user, usage, region,
      tier, op, success, rtype, s"i-$ts-$user-$res", "USD",
      ts.take(4).toInt, ts.slice(5, 7).toInt, ts.slice(8, 10).toInt)

  private val fixture: DataFrame = spark.createDataFrame(Seq(
    rec("2025-04-23 10:00:00", "u1", 2.0, success = true, res = "r1"),
    rec("2025-04-23 11:00:00", "u1", 4.0, success = false, res = "r2"),
    rec("2025-04-23 12:00:00", "u2", -1.0, success = true, res = "r1"),
    rec("2025-04-24 09:00:00", "u2", 10.0, success = false, res = "r3"),
  ))

  test("A1: daily rollup — hand-computed micro-fixture") {
    val got = Aggregates.daily(fixture).orderBy("day").collect()
    assert(got.length == 2)
    val d23 = got(0)
    assert(d23.getAs[Int]("day") == 23)
    assert(d23.getAs[Long]("transaction_count") == 3L)
    assert(d23.getAs[Double]("total_credit_usage") == 5.0)
    assert(d23.getAs[Long]("unique_users") == 2L)
    assert(d23.getAs[Long]("unique_resources") == 2L)
    assert(d23.getAs[Long]("successful_operations") == 2L)
    assert(d23.getAs[Long]("failed_operations") == 1L)
    val d24 = got(1)
    assert(d24.getAs[Long]("transaction_count") == 1L)
    assert(d24.getAs[Long]("successful_operations") == 0L)
  }

  test("incremental: merged partials equal the one-shot daily rollup") {
    val h1 = fixture.filter("user_id = 'u1'")
    val h2 = fixture.filter("user_id = 'u2'")
    val merged = Aggregates.mergeDaily(
      Aggregates.dailyPartial(h1), Aggregates.dailyPartial(h2))
      .orderBy("day").collect()
    val exact = Aggregates.daily(fixture).orderBy("day").collect()
    assert(merged.length == exact.length)
    merged.zip(exact).foreach { case (m, e) =>
      assert(m.getAs[Long]("transaction_count") ==
        e.getAs[Long]("transaction_count"))
      assert(math.abs(m.getAs[Double]("total_credit_usage") -
        e.getAs[Double]("total_credit_usage")) < 1e-9)
      assert(m.getAs[Long]("successful_operations") ==
        e.getAs[Long]("successful_operations"))
      assert(m.getAs[Long]("failed_operations") ==
        e.getAs[Long]("failed_operations"))
      // HLL is exact at these cardinalities
      assert(m.getAs[Long]("approx_users") == e.getAs[Long]("unique_users"))
    }
  }

  test("incremental: user-spec merge preserves activity span and counts") {
    val spec = Aggregates.userSpec
    val parts = Seq(
      fixture.filter("day = 23"), fixture.filter("day = 24"))
      .map(Aggregates.partial(_, spec))
    val merged = Aggregates.finalizePartials(spec)(
      Aggregates.mergePartials(spec)(parts: _*))
      .orderBy("user_id").collect()
    val exact = Aggregates.user(fixture).orderBy("user_id").collect()
    merged.zip(exact).foreach { case (m, e) =>
      assert(m.getAs[Long]("transaction_count") ==
        e.getAs[Long]("transaction_count"))
      assert(m.getAs[java.sql.Timestamp]("first_activity") ==
        e.getAs[java.sql.Timestamp]("first_activity"))
      assert(m.getAs[java.sql.Timestamp]("last_activity") ==
        e.getAs[java.sql.Timestamp]("last_activity"))
      // HLL exact at these cardinalities
      assert(m.getAs[Long]("resources_used") ==
        e.getAs[Long]("resources_used"))
      assert(m.getAs[Long]("regions_used") == e.getAs[Long]("regions_used"))
    }
  }

  test("incremental: merge is associative across delivery orders") {
    val parts = Seq("u1", "u2").map(u =>
      Aggregates.dailyPartial(fixture.filter(s"user_id = '$u'")))
    val ab = Aggregates.mergeDaily(parts: _*).orderBy("day").collect()
    val ba = Aggregates.mergeDaily(parts.reverse: _*).orderBy("day").collect()
    assert(ab.map(_.toSeq).toSeq == ba.map(_.toSeq).toSeq)
  }

  test("A2: user rollup — activity span and distinct counts") {
    val got = Aggregates.user(fixture).orderBy("user_id").collect()
    val u1 = got(0)
    assert(u1.getAs[String]("user_id") == "u1")
    assert(u1.getAs[Long]("resources_used") == 2L)
    assert(u1.getAs[Timestamp]("first_activity") ==
      Timestamp.valueOf("2025-04-23 10:00:00"))
    assert(u1.getAs[Timestamp]("last_activity") ==
      Timestamp.valueOf("2025-04-23 11:00:00"))
    val u2 = got(1)
    assert(u2.getAs[Long]("transaction_count") == 2L)
    assert(u2.getAs[Double]("avg_credit_usage") == 4.5)
  }

  test("A3/A4: service and region rollups group correctly") {
    assert(Aggregates.service(fixture).count() == 1) // one (tier,rtype,op)
    val region = Aggregates.region(fixture).collect()(0)
    assert(region.getAs[Long]("operation_count") == 4L)
    assert(region.getAs[Long]("unique_users") == 2L)
  }

  test("approx variant tracks exact counts at small scale") {
    val exact = Aggregates.user(fixture).orderBy("user_id").collect()
    val approx = Aggregates.userApprox(fixture).orderBy("user_id").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getAs[Long]("transaction_count") ==
        a.getAs[Long]("transaction_count"))
      // HLL at rsd=0.05 is exact for tiny cardinalities
      assert(e.getAs[Long]("resources_used") == a.getAs[Long]("resources_used"))
    }
  }
}
