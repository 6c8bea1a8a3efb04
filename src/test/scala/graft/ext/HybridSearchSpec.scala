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

  test("mmr equals the naive greedy selection") {
    // 2D-ish vectors padded to 4 dims: docs 10/11 near-duplicates along
    // one axis, 12 orthogonal, 13 in between. Relevance favors the
    // duplicate pair; MMR must interleave the orthogonal doc.
    val vecs = Map(
      10L -> Array(1.0, 0.0, 0.1, 0.0),
      11L -> Array(0.98, 0.05, 0.1, 0.0),
      12L -> Array(0.0, 1.0, 0.0, 0.1),
      13L -> Array(0.5, 0.5, 0.0, 0.0))
    val rel = Map(10L -> 0.95, 11L -> 0.94, 12L -> 0.6, 13L -> 0.7)
    val embs = vecs.toSeq.map { case (id, v) => (id, v) }
      .toDF("vec_id", "embedding")
    val cand = rel.toSeq.map { case (id, r) => (1L, id, r) }
      .toDF("query_id", "id", "rel")
    val lambda = 0.7
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // naive greedy on the driver
    var picked = Vector.empty[Long]
    var expect = Vector.empty[(Long, Double)]
    (1 to 4).foreach { _ =>
      val scored = rel.keys.filterNot(picked.contains).map { id =>
        val msim =
          if (picked.isEmpty) 0.0
          else picked.map(p => cos(vecs(id), vecs(p))).max
        val score =
          if (picked.isEmpty) lambda * rel(id)
          else lambda * rel(id) - (1.0 - lambda) * msim
        (id, score)
      }.toSeq.sortBy { case (id, sc) => (-sc, id) }
      picked :+= scored.head._1
      expect :+= scored.head
    }
    val got = HybridSearch.mmr(cand, embs, k = 4, lambda = lambda)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == expect.map(_._1))
    got.zip(expect).foreach { case (g, (_, sc)) =>
      assert(math.abs(g._4 - sc) < 1e-6)
    }
    // the near-duplicate of the top pick must NOT be pick 2
    assert(got(0)._3 == 10L && got(1)._3 != 11L)
  }

  test("mmr handles queries with fewer candidates than k") {
    val embs = Seq((10L, Array(1.0, 0.0)), (11L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 10L, 0.5))
      .toDF("query_id", "id", "rel")
    val out = HybridSearch.mmr(cand, embs, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.count(_._1 == 1L) == 2)
    assert(out.count(_._1 == 2L) == 1)
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

  private def cappedFixture = {
    // two groups: {10, 11} near-duplicates on one axis (group "x"),
    // {12, 13} on the other (group "y"); relevance favors group x
    val embs = Seq(
      (10L, Array(1.0, 0.0, 0.1, 0.0)),
      (11L, Array(0.98, 0.05, 0.1, 0.0)),
      (12L, Array(0.0, 1.0, 0.0, 0.1)),
      (13L, Array(0.05, 0.98, 0.0, 0.1)))
      .toDF("vec_id", "embedding")
    val cand = Seq((1L, 10L, 0.95), (1L, 11L, 0.94), (1L, 12L, 0.6),
      (1L, 13L, 0.59)).toDF("query_id", "id", "rel")
    val groups = Seq((10L, "x"), (11L, "x"), (12L, "y"), (13L, "y"))
      .toDF("id", "grp")
    (embs, cand, groups)
  }

  test("mmrCapped: cap=1 admits at most one pick per group and stops " +
      "early when every group is exhausted") {
    val (embs, cand, groups) = cappedFixture
    val got = HybridSearch.mmrCapped(cand, embs, groups, k = 4, cap = 1)
      .as[(Long, Int, Long, String, Double)].collect().sortBy(_._2)
    // only 2 groups → only 2 picks despite k=4 (no padding)
    assert(got.length == 2)
    assert(got.map(_._4).toSet == Set("x", "y"))
    assert(got.head._3 == 10L) // step 1 is still the max-rel pick
  }

  test("mmrCapped with a non-binding cap equals mmr") {
    val (embs, cand, groups) = cappedFixture
    val capped = HybridSearch
      .mmrCapped(cand, embs, groups, k = 4, cap = 4)
      .select("query_id", "step", "id", "mmr")
      .as[(Long, Int, Long, Double)].collect().toSet
    val plain = HybridSearch.mmr(cand, embs, k = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(capped == plain)
  }

  test("mmrCapped fails loudly on a candidate with no group row") {
    val (embs, cand, groups) = cappedFixture
    val e = intercept[IllegalArgumentException] {
      HybridSearch.mmrCapped(cand, embs,
        groups.filter($"id" =!= 12L), k = 2)
    }
    assert(e.getMessage.contains("missing"))
  }
}
