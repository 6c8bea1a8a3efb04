package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    (1L, "alpha-0001"), (2L, "gamma-0002"), (3L, "delta-0001")
  ).toDF("id", "name")
  // head-corrupted copies: suffix block key survives
  private val dirty = Seq(
    (11L, "alpa-0001"),  // alpha-0001 minus one char → dist 1
    (12L, "gXmma-0002"), // gamma-0002 one substitution → dist 1
    (13L, "zzzzz-0009")  // matches nobody's block
  ).toDF("id", "name")

  test("blocked linkage finds within-block pairs under the distance cap") {
    val got = FuzzyJoin.linkByBlocking(clean, dirty,
      bk => substring(bk, -4, 4), "name", maxDistance = 2)
      .select("a_id", "b_id", "edit_dist")
      .as[(Long, Long, Int)].collect().toSet
    // alpha-0001 ↔ alpa-0001 (1); delta-0001 vs alpa-0001 is dist 3 —
    // same block, rejected by the verify; gamma ↔ gXmma (1)
    assert(got == Set((1L, 11L, 1), (2L, 12L, 1)))
  }

  test("pairs outside the block are never compared, even if similar") {
    // dist("alpha-0001","alpha-0009") = 1 but blocks differ → no pair
    val near = Seq((21L, "alpha-0009")).toDF("id", "name")
    val got = FuzzyJoin.linkByBlocking(clean, near,
      bk => substring(bk, -4, 4), "name", maxDistance = 2)
    assert(got.isEmpty)
  }
}
