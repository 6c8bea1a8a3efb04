package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval and classifier evaluation as relational operators — the
  * measurement half every curation pipeline needs next to its search
  * and labeling operators (recall\@k for an ANN family's quality bar,
  * per-class F1 for a filter model, both computed where the data lives
  * instead of collecting result sets to a driver).
  *
  * Everything here is a bounded aggregate: rank metrics group by query
  * over per-query top-k frames (k × queries rows, never corpus-sized),
  * classifier metrics group by class label. Deterministic given
  * deterministic inputs; scores round to 6 decimals on report so an
  * external engine replays them (q_rank_eval / q_class_eval unroll the
  * whole computation in DuckDB).
  */
object Eval {

  /** Per-query ranking metrics against graded relevance judgments.
    *
    * `results` carries (query_id, id, rank) — a retriever's per-query
    * top-k, rank 1-based; `qrels` carries (query_id, id, rel) — graded
    * relevance (higher = better, > 0). Returns one row per qrels query:
    * (query_id, n_rel, n_hit, recall, mrr, ndcg) where recall =
    * n_hit/n_rel, mrr = 1/rank-of-first-relevant (0 if none), and ndcg
    * uses the standard exponential gain `(2^rel − 1)/log2(rank + 1)`
    * with the ideal DCG computed from the query's own qrels in
    * rel-desc/id-asc order. nDCG\@k semantics: cap `qrels` to the top-k
    * judgments per query before calling (here n_rel ≤ k throughout).
    * Queries present in `results` but never judged are out of scope —
    * the qrels set is the evaluation spine.
    */
  def rankMetrics(results: DataFrame, qrels: DataFrame): DataFrame =
    rankMetricsFrom(rankHits(results, qrels), qrels)

  private def gain(rel: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column) =
    (pow(lit(2.0), rel) - lit(1.0)) /
      (log(pos.cast("double") + lit(1.0)) / log(lit(2.0)))

  /** The per-query HIT PARTIALS of [[rankMetrics]] — (query_id, n_hit,
    * first_hit, dcg) over one results batch. The incremental-evaluation
    * half: partials from disjoint result batches MERGE by
    * sum/min/sum ([[rankHitsMerge]]) into exactly the one-shot frame,
    * so a streaming curation loop keeps running metrics without
    * re-scoring history (the nbCount/nbMerge summable-partials law
    * applied to evaluation). Batches must partition the result set —
    * a (query_id, id) pair split across batches would double-count;
    * WITHIN a batch duplicate (query_id, id) rows collapse to their
    * best (min-rank) occurrence first, so a duplicated result row
    * can't push recall past 1 or inflate dcg silently.
    */
  def rankHits(results: DataFrame, qrels: DataFrame): DataFrame = {
    val deduped = results.groupBy("query_id", "id")
      .agg(min("rank").as("rank"))
    deduped.join(qrels, Seq("query_id", "id"))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_hit"),
        min("rank").as("first_hit"),
        sum(gain(col("rel"), col("rank"))).as("dcg"))
  }

  /** Merge hit partials from disjoint batches: counts and gains sum,
    * the first hit is the min. Associative and commutative — fold in
    * any order.
    */
  def rankHitsMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "rankHitsMerge needs ≥ 1 partial")
    parts.reduce(_ unionByName _).groupBy("query_id").agg(
      sum("n_hit").as("n_hit"),
      min("first_hit").as("first_hit"),
      sum("dcg").as("dcg"))
  }

  /** Final metrics from (merged) hit partials — [[rankMetrics]] ≡
    * `rankMetricsFrom(rankHits(results, qrels), qrels)`.
    */
  def rankMetricsFrom(hits: DataFrame, qrels: DataFrame): DataFrame = {
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(desc("rel"), col("id"))
    val ideal = qrels.withColumn("j", row_number().over(wIdeal))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_rel"),
        sum(gain(col("rel"), col("j"))).as("idcg"))
    ideal.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_rel"), 6)
          .as("recall"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6)
          .as("mrr"),
        round(coalesce(col("dcg") / col("idcg"), lit(0.0)), 6)
          .as("ndcg"))
  }

  /** Pair-counting clustering quality — precision/recall/F1 over
    * same-cluster pairs plus purity — computed WITHOUT enumerating
    * pairs: every pair total folds out of the (cluster, label)
    * contingency cells via C(n, 2) = n·(n−1)/2, so the whole
    * evaluation is one count aggregate over the assignment⋈truth join
    * and three sums over cells — frames bounded by clusters × labels,
    * never n² (at 100 TB the naive pairwise join is ~10¹⁷ rows; this
    * is the only shape that survives). Integer pair counts use
    * integral arithmetic — exact where a double would silently lose
    * precision past 2^53 pairs; past LONG range (one group above
    * ~4.3×10⁹ members) ANSI arithmetic fails loudly rather than
    * wrapping.
    *
    * `assign` carries (id, cluster), `truth` (id, label); ids must
    * match 1:1 on the evaluated population (inner join — unassigned or
    * unlabeled ids drop out). Returns ONE row: (n, pair_tp, pair_fp,
    * pair_fn, pair_precision, pair_recall, pair_f1, purity) with the
    * zero-denominator conventions (all-singleton clustering →
    * precision 0, single-class truth with no same-label pairs →
    * recall 0).
    */
  def clusteringMetrics(assign: DataFrame, truth: DataFrame): DataFrame = {
    def pairs2(c: org.apache.spark.sql.Column) =
      shiftright(c * (c - lit(1L)), 1)
    val cells = assign.select(col("id"), col("cluster"))
      .join(truth.select(col("id"), col("label")), "id")
      .groupBy("cluster", "label").agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    // an id-space mismatch (assign and truth share no ids) must fail
    // loudly, not return one NULL-count row that reads as "metrics
    // computed" — the family's loud-failure posture; the checkpoint
    // above already materialized the cells, so this is a cheap probe
    require(!cells.isEmpty,
      "clusteringMetrics: assign ⋈ truth is empty — the id spaces " +
        "share no rows (wrong join key or stale population?)")
    val byCluster = cells.groupBy("cluster")
      .agg(sum("nij").as("ai"), max("nij").as("mx"))
    val tots = cells.agg(sum(pairs2(col("nij"))).as("tp"),
        sum(col("nij")).as("n"))
      .crossJoin(byCluster.agg(sum(pairs2(col("ai"))).as("sc"),
        sum(col("mx")).as("pure")))
      .crossJoin(cells.groupBy("label").agg(sum("nij").as("bj"))
        .agg(sum(pairs2(col("bj"))).as("sl")))
    // try_divide: an all-singleton clustering (sc = 0) or single-class
    // truth with one member per class (sl = 0) is a legal input, not an
    // arithmetic error (ANSI mode would throw on the plain division)
    val p = coalesce(try_divide(col("tp"), col("sc")), lit(0.0))
    val r = coalesce(try_divide(col("tp"), col("sl")), lit(0.0))
    tots.select(col("n"), col("tp").as("pair_tp"),
      (col("sc") - col("tp")).as("pair_fp"),
      (col("sl") - col("tp")).as("pair_fn"),
      round(p, 6).as("pair_precision"),
      round(r, 6).as("pair_recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r))
        .otherwise(lit(0.0)), 6).as("pair_f1"),
      round(col("pure") / col("n"), 6).as("purity"))
  }

  /** Per-class classifier metrics over a scored frame carrying one row
    * per example with its TRUE label (`labelCol`) and PREDICTED label
    * (`predCol`). Returns one row per class seen in either column:
    * (clazz, support, predicted_n, tp, precision, recall, f1) with the
    * zero-denominator conventions (precision 0 when the class is never
    * predicted, recall 0 when it has no support, f1 0 when p + r = 0).
    * One pass of three group-bounded aggregates — class cardinality,
    * not corpus size, bounds every frame after the scan.
    */
  def classifierMetrics(scored: DataFrame, labelCol: String = "label",
      predCol: String = "predicted"): DataFrame = {
    val tp = scored.filter(col(labelCol) === col(predCol))
      .groupBy(col(labelCol).as("clazz"))
      .agg(count(lit(1)).as("tp"))
    val support = scored.groupBy(col(labelCol).as("clazz"))
      .agg(count(lit(1)).as("support"))
    val predicted = scored.groupBy(col(predCol).as("clazz"))
      .agg(count(lit(1)).as("predicted_n"))
    val p = coalesce(col("tp") / col("predicted_n"), lit(0.0))
    val r = coalesce(col("tp") / col("support"), lit(0.0))
    support.join(predicted, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted_n"), lit(0L)).as("predicted_n"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        round(p, 6).as("precision"),
        round(r, 6).as("recall"),
        round(when(p + r > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), 6).as("f1"))
  }

  /** The per-class COUNT PARTIALS of [[classifierMetrics]] — one row
    * per class seen in either column of this batch: (clazz, support,
    * predicted_n, tp), zeros coalesced. Partials from disjoint example
    * batches merge by plain sums ([[classifierCountsMerge]]), and
    * [[classifierMetricsFrom]] finishes them into exactly the one-shot
    * metrics — the incremental-evaluation path (q_class_eval_inc is
    * gated against q_class_eval's own oracle). Batches must partition
    * the example set; an example counted twice inflates every count it
    * touches.
    */
  def classifierCounts(scored: DataFrame, labelCol: String = "label",
      predCol: String = "predicted"): DataFrame = {
    val tp = scored.filter(col(labelCol) === col(predCol))
      .groupBy(col(labelCol).as("clazz"))
      .agg(count(lit(1)).as("tp"))
    val support = scored.groupBy(col(labelCol).as("clazz"))
      .agg(count(lit(1)).as("support"))
    val predicted = scored.groupBy(col(predCol).as("clazz"))
      .agg(count(lit(1)).as("predicted_n"))
    support.join(predicted, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted_n"), lit(0L)).as("predicted_n"),
        coalesce(col("tp"), lit(0L)).as("tp"))
  }

  /** Merge count partials from disjoint batches — associative,
    * commutative sums per class.
    */
  def classifierCountsMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "classifierCountsMerge needs ≥ 1 partial")
    parts.reduce(_ unionByName _).groupBy("clazz").agg(
      sum("support").as("support"),
      sum("predicted_n").as("predicted_n"),
      sum("tp").as("tp"))
  }

  /** Final per-class metrics from (merged) count partials — the same
    * arithmetic and zero-denominator conventions as
    * [[classifierMetrics]] (`try_divide`: a class never predicted or
    * with no support divides 0-count, a legal input, not an error).
    */
  def classifierMetricsFrom(counts: DataFrame): DataFrame = {
    val p = coalesce(try_divide(col("tp"), col("predicted_n")), lit(0.0))
    val r = coalesce(try_divide(col("tp"), col("support")), lit(0.0))
    counts.select(col("clazz"), col("support"), col("predicted_n"),
      col("tp"),
      round(p, 6).as("precision"),
      round(r, 6).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r))
        .otherwise(lit(0.0)), 6).as("f1"))
  }
}
