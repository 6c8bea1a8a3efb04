package graft.ext

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rankMetrics matches hand-computed recall/mrr/ndcg") {
    // query 1: qrels {10:3, 11:2, 12:1}; results [13, 11, 12]
    //   hits: 11@2 (rel 2), 12@3 (rel 1) → recall 2/3
    //   mrr = 1/2
    //   dcg = 3/log2(3) + 1/log2(4) = 3/1.58496 + 0.5
    //   idcg = 7/log2(2) + 3/log2(3) + 1/log2(4)
    val results = Seq((1L, 13L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "id", "rank")
    val qrels = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1))
      .toDF("query_id", "id", "rel")
    val m = Eval.rankMetrics(results, qrels)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(m._2 == 3L && m._3 == 2L)
    assert(math.abs(m._4 - 2.0 / 3) < 1e-6)
    assert(m._5 == 0.5)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 3.0 / lg2(3) + 1.0 / lg2(4)
    val idcg = 7.0 / lg2(2) + 3.0 / lg2(3) + 1.0 / lg2(4)
    assert(math.abs(m._6 - dcg / idcg) < 1e-6)
  }

  test("rankMetrics: zero hits give zero metrics, spine is qrels") {
    val results = Seq((1L, 99L, 1), (3L, 98L, 1))
      .toDF("query_id", "id", "rank")
    val qrels = Seq((1L, 10L, 1), (2L, 20L, 1))
      .toDF("query_id", "id", "rel")
    val m = Eval.rankMetrics(results, qrels)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    // query 3 is unjudged → absent; queries 1 and 2 all-zero
    assert(m.map(_._1).toSeq == Seq(1L, 2L))
    m.foreach { r =>
      assert(r._3 == 0L && r._4 == 0.0 && r._5 == 0.0 && r._6 == 0.0)
    }
  }

  test("classifierMetrics matches hand-computed per-class P/R/F1") {
    // class a: 2 support, predicted 3 times, 2 tp → p=2/3, r=1
    // class b: 2 support, predicted 2 times, 1 tp → p=1/2, r=1/2
    // class c: 1 support, never predicted → p=0, r=0, f1=0
    val scored = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"),
      ("c", "b")).toDF("label", "predicted")
    val m = Eval.classifierMetrics(scored)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(m.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq(("a", 2L, 3L, 2L), ("b", 2L, 2L, 1L), ("c", 1L, 0L, 0L)))
    val a = m(0); val b = m(1); val c = m(2)
    assert(math.abs(a._5 - 2.0 / 3) < 1e-6 && a._6 == 1.0)
    assert(math.abs(a._7 - 2 * (2.0 / 3) / (2.0 / 3 + 1)) < 1e-6)
    assert(b._5 == 0.5 && b._6 == 0.5)
    assert(math.abs(b._7 - 0.5) < 1e-6)
    assert(c._5 == 0.0 && c._6 == 0.0 && c._7 == 0.0)
  }

  test("classifierMetrics: predicted-only class appears with 0 support") {
    val scored = Seq(("a", "z")).toDF("label", "predicted")
    val m = Eval.classifierMetrics(scored)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(m.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", 1L, 0L), ("z", 0L, 1L)))
    assert(m.forall(r => r._5 == 0.0 && r._6 == 0.0 && r._7 == 0.0))
  }

  test("clusteringMetrics matches hand-computed pair counts and purity") {
    // clusters: {1,2,3} labels a,a,b ; {4,5} labels b,b ; {6} label a
    // cells: (c1,a)=2 (c1,b)=1 (c2,b)=2 (c3,a)=1
    // tp = C(2,2)+C(2,2) = 2; same-cluster = C(3,2)+C(2,2) = 4
    // same-label: a=3 → 3 pairs, b=3 → 3 pairs → 6
    // fp = 2, fn = 4; p = 1/2, r = 1/3, f1 = 2·(1/6)/(5/6) = 0.4
    // purity = (2 + 2 + 1)/6
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 30L)).toDF("id", "cluster")
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
      (5L, "b"), (6L, "a")).toDF("id", "label")
    val m = Eval.clusteringMetrics(assign, truth)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(m == ((6L, 2L, 2L, 4L, 0.5, round6(1.0 / 3), 0.4,
      round6(5.0 / 6))))
  }

  test("clusteringMetrics: all-singleton clustering gives zero precision") {
    val assign = Seq((1L, 1L), (2L, 2L)).toDF("id", "cluster")
    val truth = Seq((1L, "a"), (2L, "a")).toDF("id", "label")
    val m = Eval.clusteringMetrics(assign, truth)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(m._2 == 0L && m._5 == 0.0 && m._6 == 0.0 && m._7 == 0.0)
    assert(m._8 == 1.0) // singletons are trivially pure
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("knnClassify majority vote with smallest-label tie-break") {
    val graph = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // labels 7,7,8 → 7
      (2L, 10L, 1), (2L, 12L, 2),               // labels 7,8 tie → 7
      (3L, 12L, 1), (3L, 13L, 2), (3L, 14L, 3), // labels 8,8,7 → 8
      (3L, 10L, 4)                              // rank 4: cut by k=3
    ).toDF("query_id", "neighbor_id", "rank")
    val labels = Seq((10L, 7), (11L, 7), (12L, 8), (13L, 8), (14L, 7))
      .toDF("id", "label")
    val got = GraphOps.knnClassify(graph, labels, k = 3)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 7), (2L, 7), (3L, 8)))
  }

  test("knnClassify: a node whose neighbors all lack labels predicts " +
      "NULL instead of vanishing") {
    val graph = Seq(
      (1L, 10L, 1), (1L, 11L, 2),
      (2L, 98L, 1), (2L, 99L, 2) // 98/99 have no label rows
    ).toDF("query_id", "neighbor_id", "rank")
    val labels = Seq((10L, 7), (11L, 7)).toDF("id", "label")
    val got = GraphOps.knnClassify(graph, labels, k = 3)
      .as[(Long, Option[Int])].collect().sortBy(_._1).toSeq
    // coverage is visible: node 2 is present with no prediction
    assert(got == Seq((1L, Some(7)), (2L, None)))
  }

  test("rank hit partials from disjoint batches merge into the " +
      "one-shot metrics (sum/min/sum law)") {
    val results = Seq((1L, 13L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 11L, 2))
      .toDF("query_id", "id", "rank")
    val qrels = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1),
      (2L, 10L, 2), (2L, 12L, 1))
      .toDF("query_id", "id", "rel")
    val b1 = results.filter($"rank" <= 1)
    val b2 = results.filter($"rank" > 1)
    val merged = Eval.rankMetricsFrom(
      Eval.rankHitsMerge(Seq(Eval.rankHits(b1, qrels),
        Eval.rankHits(b2, qrels))), qrels)
    val oneShot = Eval.rankMetrics(results, qrels)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, Long, Long, Double, Double, Double)].collect().toSet
    assert(key(merged) == key(oneShot))
  }

  test("rankMetrics: duplicate result rows collapse to their best " +
      "rank — recall cannot exceed 1") {
    val dup = Seq((1L, 10L, 1), (1L, 10L, 3), (1L, 11L, 2))
      .toDF("query_id", "id", "rank")
    val clean = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("query_id", "id", "rank")
    val qrels = Seq((1L, 10L, 2), (1L, 11L, 1))
      .toDF("query_id", "id", "rel")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, Long, Long, Double, Double, Double)].collect().toSet
    val got = key(Eval.rankMetrics(dup, qrels))
    assert(got == key(Eval.rankMetrics(clean, qrels)))
    assert(got.forall(_._4 <= 1.0))
  }

  test("classifier count partials from disjoint batches merge into " +
      "the one-shot metrics") {
    val scored = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"),
      ("c", "b"), ("a", "c")).toDF("label", "predicted")
      .withColumn("part",
        org.apache.spark.sql.functions.monotonically_increasing_id() % 2)
    val parts = Seq(0, 1).map(p =>
      Eval.classifierCounts(scored.filter($"part" === p)))
    val merged = Eval.classifierMetricsFrom(
      Eval.classifierCountsMerge(parts))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(String, Long, Long, Long, Double, Double, Double)]
        .collect().toSet
    assert(key(merged) == key(Eval.classifierMetrics(scored)))
  }

  test("clusteringMetrics fails loudly on disjoint id spaces") {
    val assign = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val truth = Seq((8L, "a"), (9L, "a")).toDF("id", "label")
    val e = intercept[IllegalArgumentException] {
      Eval.clusteringMetrics(assign, truth).collect()
    }
    assert(e.getMessage.contains("id spaces"))
  }
}
