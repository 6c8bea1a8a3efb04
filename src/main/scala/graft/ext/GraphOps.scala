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

  /** Synchronous label propagation over a DIRECTED edge list
    * (src, dst) from clamped seed labels — the classic semi-supervised
    * step downstream of a kNN graph ([[EmbeddingSearch.knnGraph]]) or a
    * dup graph: a handful of labeled rows spread over the similarity
    * structure so the unlabeled bulk inherits labels without a model.
    * Pass both edge directions for undirected graphs.
    *
    * Deterministic by construction (the gate requirement): updates are
    * synchronous (iteration i+1 sees only iteration i's labels), a
    * node's new label is the argmax of its in-neighbors' label votes
    * with ties broken by SMALLEST label, seeds are clamped (never
    * re-voted — the Zhu/Ghahramani clamped variant), and a node with no
    * labeled in-neighbor stays unlabeled this round. A fixed `iters`
    * makes the result a pure function of (edges, seeds).
    *
    * Scale shape: each round is one src-keyed join (labels onto edges)
    * and one (dst, label)-keyed partial+final count — edge-linear, both
    * map-side combinable, no per-vertex driver state; the vote argmax
    * is a groupBy max(struct(cnt, negLabelKey)) — no window over a
    * skewable partition. Label frames localCheckpoint every round (they
    * are node-sized), so lineage stays flat at high iteration counts —
    * the [[pageRank]] discipline.
    *
    * `seeds`: (id, label). Returns (id, label) for every node that
    * holds a label after `iters` rounds (seeds included; unreached
    * nodes absent — left-join downstream if "null = unlabeled" rows are
    * wanted).
    */
  def labelPropagate(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val seed = seeds.select(col("id"), col("label")).persist()
    var labels = seed
    var i = 0
    while (i < iters) {
      val votes = e
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax(count), tie → min(label): two tiny aggs over the vote
      // relation (max count per id, then min label among the maxima) —
      // label stays an opaque orderable type, no struct-ordering trick
      // that would pin it to a numeric encoding
      val best = votes.groupBy("id").agg(max(col("c")).as("c"))
      val winners = votes.join(best, Seq("id", "c"))
        .groupBy("id").agg(min(col("label")).as("label"))
      val next = seed.unionByName(
        winners.join(seed.select("id"), Seq("id"), "left_anti"))
        .localCheckpoint(true)
      labels = next
      i += 1
    }
    val out = labels.localCheckpoint(true)
    Seq(e, seed).foreach(_.unpersist())
    out
  }

  /** FIXPOINT MIN-label propagation: every node takes the SMALLEST
    * seed label present anywhere in its connected component (null when
    * the component has no seed). This is the monotone member of the
    * label-propagation family — min is associative, commutative, and
    * idempotent, so unlike the majority vote ([[labelPropagate]],
    * whose winner can flip when votes arrive in a different order) the
    * fixpoint is order-free and therefore INCREMENTALLY FOLDABLE
    * ([[minLabelFold]]): a delivery merges into standing labels
    * without re-propagating the corpus, the
    * [[Dedup.incrementalComponents]] discipline applied to labels.
    *
    * `nodes` is (id, seed) with seed null for unlabeled nodes; `edges`
    * is an undirected pair list (id_a, id_b). Returns the standing
    * STATE (id, cluster, seed, label) the fold consumes — `cluster` is
    * the component's min member id ([[Dedup.dupClustersStar]]), kept
    * so the fold can scope relabeling to affected components; readers
    * wanting just the labeling project (id, label).
    */
  def minLabelPropagate(nodes: DataFrame, edges: DataFrame,
      parallelism: Option[Int] = None): DataFrame = {
    val comps = Dedup.dupClustersStar(nodes.select("id"),
      edges.select("id_a", "id_b"), parallelism = parallelism)
    val withSeed = comps.join(nodes.select("id", "seed"), Seq("id"))
    val cmin = withSeed.groupBy("cluster").agg(min("seed").as("label"))
    withSeed.join(cmin, Seq("cluster"))
      .select("id", "cluster", "seed", "label")
  }

  /** Fold a delivery (new nodes with optional seeds, new edges — every
    * edge touching at least one new node or bridging standing
    * components) into standing [[minLabelPropagate]] state at
    * DELTA-proportional cost: components fold via
    * [[Dedup.incrementalComponents]] (untouched clusters carry over
    * verbatim), and labels re-elect ONLY inside affected components.
    * The re-election is exact because a component's membership can
    * only change if one of its members touches a delta edge — so every
    * member of every merged component is in the affected set, and the
    * per-new-cluster `min(seed)` over affected members equals the
    * from-scratch component min. Result ≡ [[minLabelPropagate]] over
    * the union graph, row for row (GraphOpsSpec pins the law; the
    * q_label_prop_inc gate pins it against the recursive-CTE oracle).
    */
  def minLabelFold(prev: DataFrame, newNodes: DataFrame,
      newEdges: DataFrame, parallelism: Option[Int] = None): DataFrame = {
    val edges = newEdges.select("id_a", "id_b").localCheckpoint(true)
    val touched = edges.select(col("id_a").as("id"))
      .unionAll(edges.select(col("id_b").as("id"))).distinct()
    val oldAffected = prev.join(touched, Seq("id"))
      .select("cluster").distinct().localCheckpoint(true)
    val comps = Dedup.incrementalComponents(prev.select("id", "cluster"),
      newNodes.select("id"), edges, parallelism = parallelism)
    // every member of every changed component is here: old members of
    // affected clusters plus the delivery — delta × cluster-size rows
    val changedSeeds = prev.join(broadcast(oldAffected), Seq("cluster"))
      .select("id", "seed")
      .unionAll(newNodes.select("id", "seed"))
    val newAssign = comps.join(changedSeeds, Seq("id"))
    val cmin = newAssign.groupBy("cluster").agg(min("seed").as("label"))
    prev.join(broadcast(oldAffected), Seq("cluster"), "left_anti")
      .select("id", "cluster", "seed", "label")
      .unionByName(newAssign.join(cmin, Seq("cluster"))
        .select("id", "cluster", "seed", "label"))
  }

  /** k-nearest-neighbor classification over a prebuilt kNN graph:
    * each node's predicted label is the majority vote of its top-`k`
    * neighbors' labels (ties → smallest label value — deterministic,
    * engine-portable). The non-parametric label model riding the graph
    * the embedding family already maintains: no training, predictions
    * improve as the graph does.
    *
    * `graph` carries (query_id, neighbor_id, rank) — [[knnGraph]] /
    * NN-Descent / maintained-index output; `labels` carries
    * (id, label). Scale shape: one rank filter, one id-keyed equi-join
    * against the label table, one (node, label) count aggregate, one
    * per-node window over ≤ distinct-label rows — edge-linear, no
    * per-node driver work. Returns (id, predicted) with one row per
    * graph QUERY node: a node whose top-k neighbors all lack label
    * rows predicts NULL instead of silently dropping out — downstream
    * [[Eval.classifierMetrics]] support/accuracy would otherwise be
    * computed over an invisibly shrunken population; callers count
    * coverage from the NULL rows.
    */
  def knnClassify(graph: DataFrame, labels: DataFrame,
      k: Int): DataFrame = {
    val votes = graph.filter(col("rank") <= k)
      .join(labels.select(col("id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .groupBy(col("query_id").as("id"), col("label"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("c"), col("label"))
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("label").as("predicted"))
    graph.select(col("query_id").as("id")).distinct()
      .join(pred, Seq("id"), "left")
      .select(col("id"), col("predicted"))
  }
}
