package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine per-query rankings from independent
  * retrievers (sparse BM25, dense ANN, ...) without score calibration.
  * Reciprocal-rank fusion (Cormack et al., SIGIR 2009) sums `1/(c+rank)`
  * per document across lists — rank-only, so wildly different score
  * scales (BM25 vs cosine) fuse without normalization, and `c` (60 in
  * the paper, kept as the default) damps the head so one list's top hit
  * can't dominate.
  *
  * Scale shape: inputs are already per-query top-N frames (bounded by
  * N × queries, never corpus-sized), so the fusion is a union + one
  * small groupBy + a per-query window — the retrievers did the heavy
  * lifting under their own scale contracts.
  */
object HybridSearch {

  /** Fuse per-query rankings. Every input frame carries
    * (query_id, id, rank); returns (query_id, rn, id, n_lists, rrf)
    * with rn ≤ k, ranked by the 6-decimal-ROUNDED rrf score with doc id
    * tie-break (same cross-engine ranking discipline as the BM25
    * ranker).
    */
  def rrf(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranking")
    val contribs = lists.map(_.select(col("query_id"), col("id"),
        (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
      .reduce(_ unionByName _)
    val fused = contribs.groupBy("query_id", "id")
      .agg(round(sum("contrib"), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("rrf"), col("id"))
    fused.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "rn", "id", "n_lists", "rrf")
  }

  /** Score-calibrated convex fusion (weighted CombSUM, Fox & Shaw,
    * TREC-2): per (query, list) the scores min-max normalize to [0, 1]
    * — BM25 and cosine become comparable without a learned calibration
    * — then fuse as `Σ wᵢ · normᵢ`, a document missing from a list
    * contributing 0 there. The complement of [[rrf]]: rank fusion
    * ignores score GAPS (a runaway top hit counts like a photo-finish
    * one); weighted normalized scores preserve them, at the cost of a
    * weight choice. A degenerate list whose scores are all equal
    * normalizes to 1.0 (every candidate equally best — keeps the
    * convention deterministic and oracle-mirrorable).
    *
    * Inputs carry (query_id, id, score), already per-query top-N
    * (bounded, like [[rrf]]'s); the per-list normalization is a window
    * over those bounded frames, never corpus-sized. Returns
    * (query_id, rn, id, n_lists, fused), rn ≤ k, ranked by the
    * 6-decimal-ROUNDED fused score with doc-id tie-break.
    */
  def weighted(lists: Seq[DataFrame], weights: Seq[Double],
      k: Int): DataFrame = {
    require(lists.nonEmpty && lists.size == weights.size,
      s"${lists.size} lists vs ${weights.size} weights")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
    val contribs = lists.zip(weights).map { case (df, wgt) =>
      df.select(col("query_id"), col("id"), col("score"))
        .withColumn("mn", min("score").over(w))
        .withColumn("mx", max("score").over(w))
        .select(col("query_id"), col("id"),
          (lit(wgt) * when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("score") - col("mn")) /
              (col("mx") - col("mn")))).as("contrib"))
    }.reduce(_ unionByName _)
    val fused = contribs.groupBy("query_id", "id")
      .agg(round(sum("contrib"), 6).as("fused"),
        count(lit(1)).as("n_lists"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("fused"), col("id"))
    fused.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select("query_id", "rn", "id", "n_lists", "fused")
  }
}
