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

  /** Maximal Marginal Relevance diversification (Carbonell & Goldstein,
    * SIGIR 1998): greedily re-rank a retriever's per-query candidates so
    * each pick maximizes `λ·rel − (1−λ)·max-sim-to-already-picked` —
    * the standard redundancy cut for retrieval-augmented training-data
    * assembly (near-duplicate passages crowding a context window add
    * tokens, not information). `candidates` carries
    * (query_id, id, rel) — rel the retriever's relevance score, already
    * per-query top-N bounded; `embs` (vec_id, embedding) supplies the
    * vectors for candidate-vs-candidate cosine.
    *
    * Fully deterministic: the first pick is the max-rel candidate, each
    * later pick the max-MMR-score one, ties → smaller id; output scores
    * round to 6 decimals so an external engine replays the selection
    * (q_mmr_rerank unrolls all k steps in DuckDB).
    *
    * Scale shape: the greedy loop runs k (small, fixed) rounds; every
    * round is one left-anti + one equi-join on query_id over frames
    * bounded by N × queries — per-query work is N × step, never
    * corpus-sized, and rounds parallelize across queries. The driver
    * loop only builds the plan; no per-query driver work.
    *
    * Returns (query_id, step, id, mmr), step 1..k in pick order.
    */
  def mmr(candidates: DataFrame, embs: DataFrame, k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"mmr needs k >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmr needs lambda in [0, 1], got $lambda")
    val dot = graft.ext.EmbeddingSearch.dot _
    val vecs = embs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    // fail loudly on a candidate id with no embedding row (stale
    // retriever output, id-space mismatch): an inner join would
    // silently drop it — possibly the highest-rel candidate — and
    // return a quietly-wrong selection. Candidates are bounded
    // (top-N × queries), so this check is one small job.
    val orphans = candidates.select("id").distinct()
      .join(vecs.select("id"), Seq("id"), "left_anti")
    val sample = orphans.limit(3).collect().map(_.get(0)).mkString(", ")
    require(sample.isEmpty,
      s"mmr: candidate ids missing from embs (first: $sample)")
    val cand = candidates.select(col("query_id"), col("id"),
        col("rel").cast("double").as("rel"))
      .join(vecs, "id")
      .withColumn("nrm", dot(col("v"), col("v")))
      .localCheckpoint(true)
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("id"))
    var selected = cand
      .withColumn("score", lit(lambda) * col("rel"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("id"), col("score"),
        lit(1).as("step"))
      .localCheckpoint(true)
    var picked = selected.count()
    var s = 2
    while (s <= k) {
      val selVecs = selected.select("query_id", "id")
        .join(cand.select(col("query_id"), col("id"),
          col("v").as("sv"), col("nrm").as("snrm")),
          Seq("query_id", "id"))
        .select(col("query_id"), col("sv"), col("snrm"))
      val pick = cand
        .join(selected.select("query_id", "id"),
          Seq("query_id", "id"), "left_anti")
        .join(selVecs, Seq("query_id"))
        .withColumn("sim",
          dot(col("v"), col("sv")) / sqrt(col("nrm") * col("snrm")))
        .groupBy("query_id", "id")
        .agg(max("rel").as("rel"), max("sim").as("max_sim"))
        .withColumn("score", lit(lambda) * col("rel")
          - lit(1.0 - lambda) * col("max_sim"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("id"), col("score"),
          lit(s).as("step"))
      selected = selected.unionByName(pick).localCheckpoint(true)
      // an empty pick round is ABSORBING (same standing set → same
      // election → empty again), so once no query elected anything the
      // remaining rounds would each burn the joins + checkpoint for
      // nothing — large k over few candidates otherwise runs k−1 no-op
      // Spark jobs. The count is one cheap job on the checkpointed frame.
      val n = selected.count()
      s = if (n == picked) k + 1 else s + 1
      picked = n
    }
    selected.select(col("query_id"), col("step"), col("id"),
      round(col("score"), 6).as("mmr"))
  }

  /** [[mmr]] with PER-GROUP CAPS — the RAG-assembly variant: at most
    * `cap` picks per (query, group), where `groups` maps each
    * candidate id to its group (source domain, dedup cluster, shard —
    * the `selectUnderBudgetBy` discipline applied to the greedy loop).
    * A candidate whose group already holds `cap` picks is excluded
    * from that query's later elections; a query whose every remaining
    * candidate is capped out simply stops early (fewer than k steps —
    * coverage is visible in the output, never padded). Everything else
    * is [[mmr]] verbatim: max-rel first pick, `λ·rel − (1−λ)·max-sim`
    * elections, id tie-breaks, 6-decimal output rounding, and the same
    * orphan guard extended to ids missing a GROUP row (a silently
    * uncapped candidate would defeat the cap's purpose).
    *
    * Scale shape unchanged from [[mmr]] (frames bounded by
    * N × queries; the cap check is one extra bounded groupBy + join
    * per round). Returns (query_id, step, id, grp, mmr).
    */
  def mmrCapped(candidates: DataFrame, embs: DataFrame,
      groups: DataFrame, k: Int, lambda: Double = 0.7,
      cap: Int = 1): DataFrame = {
    require(k >= 1, s"mmrCapped needs k >= 1, got $k")
    require(cap >= 1, s"mmrCapped needs cap >= 1, got $cap")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrCapped needs lambda in [0, 1], got $lambda")
    val dot = graft.ext.EmbeddingSearch.dot _
    val vecs = embs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val g = groups.select(col("id"), col("grp"))
    val orphans = candidates.select("id").distinct()
      .join(vecs.select("id"), Seq("id"), "left_anti")
      .withColumn("what", lit("embedding"))
      .unionByName(candidates.select("id").distinct()
        .join(g.select("id"), Seq("id"), "left_anti")
        .withColumn("what", lit("group")))
    val sample = orphans.limit(3).collect()
      .map(r => s"${r.get(0)} (no ${r.getString(1)})").mkString(", ")
    require(sample.isEmpty,
      s"mmrCapped: candidate ids missing rows (first: $sample)")
    val cand = candidates.select(col("query_id"), col("id"),
        col("rel").cast("double").as("rel"))
      .join(vecs, "id").join(g, "id")
      .withColumn("nrm", dot(col("v"), col("v")))
      .localCheckpoint(true)
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("id"))
    var selected = cand
      .withColumn("score", lit(lambda) * col("rel"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("id"), col("grp"), col("score"),
        lit(1).as("step"))
      .localCheckpoint(true)
    var picked = selected.count()
    var s = 2
    while (s <= k) {
      val selVecs = selected.select("query_id", "id")
        .join(cand.select(col("query_id"), col("id"),
          col("v").as("sv"), col("nrm").as("snrm")),
          Seq("query_id", "id"))
        .select(col("query_id"), col("sv"), col("snrm"))
      // groups already at the cap for this query drop out of the
      // election — one bounded aggregate over the picked set
      val full = selected.groupBy("query_id", "grp")
        .agg(count(lit(1)).as("n_picked"))
        .filter(col("n_picked") >= cap)
        .select("query_id", "grp")
      val pick = cand
        .join(selected.select("query_id", "id"),
          Seq("query_id", "id"), "left_anti")
        .join(full, Seq("query_id", "grp"), "left_anti")
        .join(selVecs, Seq("query_id"))
        .withColumn("sim",
          dot(col("v"), col("sv")) / sqrt(col("nrm") * col("snrm")))
        .groupBy("query_id", "id", "grp")
        .agg(max("rel").as("rel"), max("sim").as("max_sim"))
        .withColumn("score", lit(lambda) * col("rel")
          - lit(1.0 - lambda) * col("max_sim"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("id"), col("grp"), col("score"),
          lit(s).as("step"))
      selected = selected.unionByName(pick).localCheckpoint(true)
      // same absorbing-empty-round break as [[mmr]] — with caps it
      // matters MORE: every query's remaining candidates can cap out
      // long before step k (cap=1 with g groups stops at step g)
      val n = selected.count()
      s = if (n == picked) k + 1 else s + 1
      picked = n
    }
    selected.select(col("query_id"), col("step"), col("id"), col("grp"),
      round(col("score"), 6).as("mmr"))
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
