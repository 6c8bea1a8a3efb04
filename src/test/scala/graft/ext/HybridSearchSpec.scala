package graft.ext

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fuses rank-only: agreement wins, scales don't matter") {
    // doc 10 is rank 2 in both lists; doc 11 is rank 1 in one list only
    val sparse = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3))
      .toDF("query_id", "id", "rank")
    val dense = Seq((1L, 13L, 1), (1L, 10L, 2), (1L, 14L, 3))
      .toDF("query_id", "id", "rank")
    val fused = HybridSearch.rrf(Seq(sparse, dense), k = 5)
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._2)
    // 2/(60+2) = 0.032258 beats 1/(60+1) = 0.016393
    assert(fused.head._3 === 10L)
    assert(fused.head._4 === 2L)
    assert(math.abs(fused.head._5 - 2.0 / 62) < 1e-5)
    // singles tie at 1/61, broken by id ascending
    assert(fused.map(_._3).toSeq == Seq(10L, 11L, 13L, 12L, 14L))
  }

  test("rrf is per-query and respects k") {
    val a = Seq((1L, 10L, 1), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "id", "rank")
    val out = HybridSearch.rrf(Seq(a), k = 1)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._3)).toSet == Set((1L, 10L), (2L, 20L)))
  }
}
