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
}
