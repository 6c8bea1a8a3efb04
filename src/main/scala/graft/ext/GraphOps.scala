package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair lists — the operators downstream
  * of near-dup detection that need more than connectivity
  * ([[Dedup.dupClusters]] answers "which docs are the same"; these answer
  * "which doc is central"). Deterministic by construction: a FIXED
  * iteration count and damping, so results reproduce bit-for-bit
  * modulo float summation order (rounded on report, like every scoring
  * gate).
  */
object GraphOps {

  /** Damped PageRank over an UNDIRECTED pair list (id_a, id_b), run for
    * at most `iters` iterations from a uniform start — within a
    * duplicate cluster the highest-rank doc is the natural canonical
    * representative (most-connected, not just lowest-id).
    *
    * Scale shape: each iteration is one (src)-keyed join of the edge
    * list against the current ranks plus one (dst)-keyed aggregate —
    * the standard two-shuffle PageRank round, edge-linear, no
    * per-vertex driver state. Every node in a pair list has degree ≥ 1,
    * so there are no dangling-mass corrections to apply. Every
    * `checkpointEvery` rounds the ranks are eagerly materialized
    * (localCheckpoint) so high iteration counts never stack an
    * unbounded join lineage — analysis cost stays flat at iters=20+ —
    * and the returned frame is materialized the same way so the
    * iteration lineage never re-executes downstream.
    *
    * `tol > 0` adds convergence-based early stop (same discipline as
    * [[Dedup.dupClusters]]): iteration ends once the max per-node rank
    * change drops to `tol` or below. The check rides the checkpoint
    * materialization — one extra tiny aggregate per round — and since a
    * converged chain's later rounds are no-ops within tolerance, the
    * fixed-iters spelling (`tol = 0`, the deterministic gate
    * configuration) remains bit-identical to before.
    *
    * Returns (id, rank); ranks sum to the node count under damping's
    * steady-state redistribution.
    */
  def pageRank(pairs: DataFrame, iters: Int = 3,
      damping: Double = 0.85, tol: Double = 0.0,
      checkpointEvery: Int = 5): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs
        .select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    var ranks = deg.select(col("src").as("id"), lit(1.0).as("rank"))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = edges
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_sum"))
      val next = deg.select(col("src").as("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
      val cut = tol > 0 || (i + 1) % math.max(checkpointEvery, 1) == 0
      val nextMat = if (cut) next.localCheckpoint(true) else next
      if (tol > 0) {
        val delta = nextMat.as("n")
          .join(ranks.as("p"), col("n.id") === col("p.id"))
          .agg(max(abs(col("n.rank") - col("p.rank"))).as("d"))
          .head().getDouble(0)
        converged = delta <= tol
      }
      ranks = nextMat
      i += 1
    }
    val out = ranks.localCheckpoint(true)
    Seq(edges, deg).foreach(_.unpersist())
    out
  }
}
