package graft.ext

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank on a path graph matches hand-computed iterations") {
    // a — b — c: deg(a)=deg(c)=1, deg(b)=2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r = GraphOps.pageRank(pairs, iters = 3)
      .as[(Long, Double)].collect().toMap
    // iter1: a=c=0.15+0.85*(1/2)=0.575, b=0.15+0.85*(1+1)=1.85
    // iter2: a=c=0.15+0.85*(1.85/2)=0.93625, b=0.15+0.85*(0.575*2)=1.1275
    // iter3: a=c=0.15+0.85*(1.1275/2)=0.6291875, b=0.15+0.85*1.8725=1.741625
    assert(math.abs(r(1L) - 0.6291875) < 1e-9)
    assert(math.abs(r(3L) - 0.6291875) < 1e-9)
    assert(math.abs(r(2L) - 1.741625) < 1e-9)
    // total rank mass is conserved at the node count
    assert(math.abs(r.values.sum - 3.0) < 1e-9)
  }

  test("pagerank ranks the hub above the spokes") {
    // star: 0 connected to 1..4
    val pairs = (1L to 4L).map(i => (0L, i)).toDF("id_a", "id_b")
    val r = GraphOps.pageRank(pairs).as[(Long, Double)].collect().toMap
    assert((1L to 4L).forall(i => r(0L) > r(i)))
    // spokes are symmetric
    assert((2L to 4L).forall(i => math.abs(r(i) - r(1L)) < 1e-12))
  }

  test("high iteration counts stay flat: periodic checkpoint cuts lineage") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    // 20 fixed rounds: without the every-5-rounds lineage cut this plan
    // is 40+ stacked joins deep and analysis time explodes; with it the
    // run completes promptly and mass is still conserved
    val t0 = System.nanoTime()
    val r = GraphOps.pageRank(pairs, iters = 20)
      .as[(Long, Double)].collect().toMap
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
    assert(math.abs(r.values.sum - 4.0) < 1e-9)
  }

  test("tol early stop lands within tolerance of the deep fixed run") {
    val pairs = Seq((1L, 2L), (2L, 3L), (0L, 1L), (0L, 3L))
      .toDF("id_a", "id_b")
    val deep = GraphOps.pageRank(pairs, iters = 50)
      .as[(Long, Double)].collect().toMap
    val eager = GraphOps.pageRank(pairs, iters = 50, tol = 1e-7)
      .as[(Long, Double)].collect().toMap
    deep.foreach { case (id, rank) =>
      assert(math.abs(eager(id) - rank) < 1e-5)
    }
  }

  // ---- label propagation ----

  private def lp(edges: Seq[(Long, Long)], seeds: Seq[(Long, Int)],
      iters: Int): Map[Long, Int] = {
    val sym = edges ++ edges.map(_.swap)
    GraphOps.labelPropagate(sym.toDF("src", "dst"),
        seeds.toDF("id", "label"), iters)
      .as[(Long, Int)].collect().toMap
  }

  test("labelPropagate spreads a seed down a path one hop per round") {
    // 1 — 2 — 3 — 4, seed at 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val seeds = Seq((1L, 7))
    assert(lp(edges, seeds, 1) === Map(1L -> 7, 2L -> 7))
    assert(lp(edges, seeds, 2) === Map(1L -> 7, 2L -> 7, 3L -> 7))
    assert(lp(edges, seeds, 3) ===
      Map(1L -> 7, 2L -> 7, 3L -> 7, 4L -> 7))
  }

  test("labelPropagate: majority vote wins, ties break to smaller label") {
    // node 0 hears label 5 from two neighbors, label 9 from one
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L))
    val seeds = Seq((1L, 5), (2L, 5), (3L, 9))
    assert(lp(edges.flatMap(e => Seq(e)), seeds, 1)(0L) === 5)
    // exact tie (one vote each) → smaller label
    val tied = lp(Seq((1L, 0L), (3L, 0L)), Seq((1L, 5), (3L, 9)), 1)
    assert(tied(0L) === 5)
  }

  test("labelPropagate clamps seeds against neighborhood pressure") {
    // seed 1 (label 9) surrounded by three label-2 seeds: stays 9
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L))
    val seeds = Seq((1L, 9), (2L, 2), (3L, 2), (4L, 2))
    val r = lp(edges, seeds, 3)
    assert(r(1L) === 9)
    assert(Seq(2L, 3L, 4L).forall(r(_) === 2))
  }

  test("labelPropagate leaves unreachable nodes unlabeled") {
    val edges = Seq((1L, 2L), (3L, 4L)) // two components, seed in one
    val r = lp(edges, Seq((1L, 1)), 5)
    assert(!r.contains(3L) && !r.contains(4L))
  }

  test("minLabelFold ≡ from-scratch fixpoint: component merge, new " +
      "seeds, untouched components carried verbatim") {
    import org.apache.spark.sql.functions.col
    // base: {0,1,2} (seed b), {3,4} (seedless), {8,9} (seed q, never
    // touched by the delta); delivery: node 5 (seed a) BRIDGES the
    // first two components, plus a brand-new pair {6,7} (seed z)
    val nodes = Seq(
      (0L, None: Option[String]), (1L, Some("b")), (2L, None),
      (3L, None), (4L, None), (8L, None), (9L, Some("q")),
      (5L, Some("a")), (6L, None), (7L, Some("z")))
      .toDF("id", "seed")
    val baseEdges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (8L, 9L))
      .toDF("id_a", "id_b")
    val deltaEdges = Seq((2L, 5L), (5L, 3L), (6L, 7L))
      .toDF("id_a", "id_b")
    val prev = GraphOps.minLabelPropagate(
      nodes.filter(col("id") <= 4 || col("id") === 8 || col("id") === 9),
      baseEdges).localCheckpoint(true)
    val folded = GraphOps.minLabelFold(prev,
      nodes.filter(col("id").isin(5L, 6L, 7L)), deltaEdges)
    val scratch = GraphOps.minLabelPropagate(nodes,
      baseEdges.unionAll(deltaEdges))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cluster", "seed", "label")
        .as[(Long, Long, Option[String], Option[String])].collect().toSet
    assert(rows(folded) === rows(scratch))
    // the merge elected the smaller of the two seeds across the bridge
    assert(rows(folded).filter(_._1 <= 5).forall(_._4 === Some("a")))
    assert(rows(folded).filter(r => r._1 == 8 || r._1 == 9)
      .forall(_._4 === Some("q")))
  }
}
