package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.7f, 0.7f, 0.0f)),
  ).toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val v = col("embedding").cast("array<double>")
    val got = embs.select(
      EmbeddingSearch.cosine(v, v).as("self")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("brute-force top-k ranks by true cosine") {
    val top = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") === 0, k = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 4L, 2L, 3L))
  }

  test("LSH top-k returns only same-bucket neighbors, ranked correctly") {
    val res = EmbeddingSearch.lshTopK(embs, col("vec_id") === 0, k = 4,
      nPlanes = 2, dim = 3)
    val brute = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") === 0, 4)
    val bruteCos = brute.select("neighbor_id", "cos")
      .as[(Long, Double)].collect().toMap
    // every LSH result must carry the same cosine the exact path computes
    res.select("neighbor_id", "cos").as[(Long, Double)].collect()
      .foreach { case (id, c) => assert(math.abs(bruteCos(id) - c) < 1e-9) }
  }

  test("cosine dup pairs finds the near-identical vectors") {
    val pairs = EmbeddingSearch.cosineDupPairs(embs, threshold = 0.99,
      nPlanes = 1, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("hard negatives exclude labeled positives and keep candidate order") {
    val queries = embs.filter(col("vec_id") === 0)
    // vec 0's exact ranking over the full corpus: 0 (self), 1, 4, 2, 3
    val positives = Seq((0L, 0L), (0L, 1L)).toDF("query_id", "neighbor_id")
    val got = EmbeddingSearch.hardNegatives(embs, queries, positives,
        k = 3, candidateK = 5)
      .orderBy("rn").select("rn", "neighbor_id")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 4L), (2, 2L), (3, 3L)))
    // no positives -> plain lookup semantics, self ranks first
    val plain = EmbeddingSearch.hardNegatives(embs, queries,
        Seq.empty[(Long, Long)].toDF("query_id", "neighbor_id"),
        k = 2, candidateK = 5)
      .orderBy("rn").select("rn", "neighbor_id")
      .as[(Int, Long)].collect().toSeq
    assert(plain == Seq((1, 0L), (2, 1L)))
  }

  test("knnGraph: every row gets k neighbors, equal to per-query topk") {
    val embs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val g = EmbeddingSearch.knnGraph(embs, k = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    // 5 nodes × 2 neighbors
    assert(g.size === 10)
    // node 0's nearest is 1 (cos≈0.994), then 4 (cos≈0.707)
    assert(g.filter(_._1 == 0L).map(t => (t._2, t._3)) ===
      Seq((1, 1L), (2, 4L)))
    // graph rows match the single-query brute force for each node
    val solo = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") === 2L,
        k = 2).select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(g.filter(_._1 == 2L) === solo)
  }
}
