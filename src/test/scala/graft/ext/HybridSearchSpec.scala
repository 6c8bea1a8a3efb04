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

  test("weighted fusion preserves score gaps that rank fusion erases") {
    // sparse: doc 10 is a runaway winner (10 vs 1); dense: doc 11 edges
    // out doc 10 in a photo finish (0.51 vs 0.50). Rank-wise the lists
    // disagree symmetrically (10 then 11 / 11 then 10) — RRF ties, id
    // breaks it. Weighted normalized scores see the gap: doc 10 holds
    // norm 1.0 vs ~0 in sparse while barely losing dense, so it wins on
    // any sparse-leaning weights.
    val sparse = Seq((1L, 10L, 10.0), (1L, 11L, 1.0), (1L, 12L, 0.5))
      .toDF("query_id", "id", "score")
    val dense = Seq((1L, 11L, 0.51), (1L, 10L, 0.50), (1L, 12L, 0.01))
      .toDF("query_id", "id", "score")
    val out = HybridSearch.weighted(Seq(sparse, dense), Seq(0.7, 0.3), k = 3)
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(10L, 11L, 12L))
    // doc 10: 0.7 * 1.0 + 0.3 * (0.49/0.50) = 0.994
    assert(math.abs(out.head._5 - 0.994) < 1e-6)
    assert(out.head._4 == 2L)
  }

  test("weighted: single-candidate list normalizes to 1.0, missing to 0") {
    val a = Seq((1L, 10L, 3.0)).toDF("query_id", "id", "score")
    val b = Seq((1L, 11L, 0.2), (1L, 12L, 0.1))
      .toDF("query_id", "id", "score")
    val out = HybridSearch.weighted(Seq(a, b), Seq(0.5, 0.5), k = 3)
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._2)
    // degenerate list: doc 10 → 0.5 · 1.0; doc 11 → 0.5 · 1.0; id breaks
    assert(out.map(r => (r._3, r._5)).toSeq ==
      Seq((10L, 0.5), (11L, 0.5), (12L, 0.0)))
  }
}
