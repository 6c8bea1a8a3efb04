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
    * a fixed `iters` iterations from a uniform start — within a
    * duplicate cluster the highest-rank doc is the natural canonical
    * representative (most-connected, not just lowest-id).
    *
    * Scale shape: each iteration is one (src)-keyed join of the edge
    * list against the current ranks plus one (dst)-keyed aggregate —
    * the standard two-shuffle PageRank round, edge-linear, no
    * per-vertex driver state. Every node in a pair list has degree ≥ 1,
    * so there are no dangling-mass corrections to apply. The returned
    * frame is eagerly materialized (localCheckpoint) so the iteration
    * lineage — `iters` stacked joins — never re-executes downstream.
    *
    * Returns (id, rank); ranks sum to the node count under damping's
    * steady-state redistribution.
    */
  def pageRank(pairs: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs
        .select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    var ranks = deg.select(col("src").as("id"), lit(1.0).as("rank"))
    for (_ <- 0 until iters) {
      val contribs = edges
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_sum"))
      ranks = deg.select(col("src").as("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
    }
    val out = ranks.localCheckpoint(true)
    Seq(edges, deg).foreach(_.unpersist())
    out
  }
}
