package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regressions: the physical plans the 100 TB design depends on
  * (SCALE.md) — top-k never global-sorts, dimension joins broadcast,
  * parquet scans push filters and prune columns. Asserted on the smallest
  * fixture; plan shape is scale-invariant for these patterns.
  */
class PlanShapeSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q_top_users").contains("TakeOrderedAndProject"))
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q_join_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("parquet scans prune columns and push filters") {
    val df: DataFrame = SparkEntry.queries("q_semi_join")(spark, d)
    val scan = df.queryExecution.executedPlan.toString
    // the lineitem scan must not read all 16 columns for a key-only probe
    assert(scan.contains("PushedFilters: [IsNotNull"))
    assert(!scan.contains("l_comment"))
  }

  test("anti-join dedup plans a left-anti hash join") {
    assert(plan("q_dedup_anti").contains("LeftAnti"))
  }

  test("z-score stats join broadcasts; no window over the fact rows") {
    val p = plan("q_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Window"))
  }

  test("profiler plans no Expand (distincts are hash dedups)") {
    assert(!plan("q_profile").contains("Expand"))
  }

  test("runtime bloom filter injects might_contain on the fact side") {
    Gate.withConfs(spark, queries.ScaleQueries.runtimeFilterConfs: _*) {
      val p = queries.ScaleQueries.runtimeFilterJoinFrame(spark, d)
        .queryExecution.optimizedPlan.toString.toLowerCase
      assert(p.contains("bloom"), s"no bloom filter injected:\n$p")
    }
  }

  test("rolling window range frame runs over the pre-aggregated rows") {
    val p = plan("q_rolling_window")
    // one hash aggregate pair below the window, no sort of raw events
    assert(p.contains("Window"))
    assert(p.contains("HashAggregate"))
  }

  test("heap top-k partial-aggregates map-side and plans no Window") {
    val p = plan("q_topk_agg")
    // partial_topkagg below the exchange = groups × k longs shuffle
    assert(p.contains("partial_topkagg"), s"no partial topkagg:\n$p")
    assert(!p.contains("Window"))
  }

  test("fuzzy join hash-joins on the block key — never a cartesian") {
    val p = plan("q_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"fuzzy join degenerated to a cross product:\n$p")
    assert(p.contains("Join"))
  }

  test("semdedup assignment is map-side; pair search joins on cluster, no cartesian") {
    val p = plan("q_semdedup")
    // the seed matrix rides inside the projection — assignment must not
    // introduce a join; the only join keys are cluster (pairing) and
    // vec_id (dup-flag attach)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("sq8 search broadcasts the query side and ranks per query") {
    val p = plan("q_sq_topk")
    // the tiny query side is the broadcast build; ranking is a window
    // PARTITIONED by query (top-k per query), never a global sort-limit
    assert(p.contains("Broadcast"))
    assert(p.contains("Window"))
    assert(!p.contains("TakeOrderedAndProject"))
  }

  test("table diff is one full-outer join over digests, not payloads") {
    val df = SparkEntry.queries("q_table_diff")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"))
    // the join carries 16-byte md5 digests; the raw text/props columns
    // never reach the exchange
    assert(!p.contains("props"))
  }

  test("negative sampling: pool is a TakeOrdered, queries meet only the pool") {
    val p = plan("q_negative_sample")
    // the hash-ranked pool never global-sorts the corpus
    assert(p.contains("TakeOrderedAndProject"))
    // the query × pool pairing is a broadcast nested loop over the tiny
    // pool — never a shuffled join of the corpus
    assert(!p.contains("SortMergeJoin"))
  }

  test("phrase search: positional join broadcasts the phrase terms") {
    val p = plan("q_phrase_search")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("jl projection is map-side: one corpus scan, broadcast queries") {
    val p = plan("q_jl_project")
    assert(p.contains("Broadcast"))
    // ranking is a per-query window top-k, never a global sort-limit
    assert(p.contains("Window"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("token-budget prefix sum: partition-local window, no single partition") {
    val p = plan("q_token_budget")
    // the running sum must be the two-pass prefix sum: a window
    // PARTITIONED by the range-partition id plus a broadcast offset
    // join — never Spark's all-rows-to-one-task global window
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("shard-writer prefix sum: partition-local window, no single " +
    "partition") {
    val p = plan("q_shard_writer")
    // the global seeded rank + token offsets must be the two-pass
    // distributed prefix sum (range partition → per-partition sums →
    // broadcast offsets → partition-local window), never the
    // all-rows-to-one-task global window
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("phrase search over the saved index prunes to the phrase buckets") {
    val p = plan("q_phrase_persist")
    // partition pruning on the term-hash bucket shows up as a pushed
    // partition filter on the postings scan — the whole point of the
    // saved path: scan cost is the matched posting lists, not the index
    assert(p.contains("PartitionFilters: [bucket"), p)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("ivf-pq search broadcasts probes + tables; corpus never shuffles") {
    // plan the SEARCH itself (the gate's output is the recall wrapper,
    // whose compare join is allowed to shuffle its tiny inputs)
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, d).limit(200)
    val model = graft.ext.IvfPqIndex.build(embs, kCells = 4, m = 4, k = 16)
    val p = graft.ext.IvfPqIndex.search(model, col("vec_id") < 5, k = 3,
      nProbe = 2, shortlist = 8).queryExecution.executedPlan.toString
    // the (query, cell, distance-table) frame is the broadcast build
    // side; the encoded corpus streams through the join once
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // the codegen'd ADC lookup, not an interpreted HOF, scores the scan
    assert(p.contains("graft_pq_adc"))
  }

  test("filtered ann applies the predicate before scoring") {
    val p = plan("q_ann_filtered")
    // pre-filtering: the metadata predicate runs as a plain Filter
    // under the scoring join, never as a post-ranking trim
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("% 3"), p)
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("per-group budget selection never serializes a group") {
    val p = plan("q_token_budget_by")
    // grouped two-pass prefix sum: windows run on (__pid, grp), never
    // a whole-group (or whole-data) single partition
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("proximity search broadcasts phrase terms; no cartesian") {
    val p = plan("q_proximity")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("weighted fusion windows only the bounded top-N frames") {
    val p = plan("q_hybrid_weighted")
    // per-list normalization + final ranking are windows over per-query
    // candidate frames; no global sort anywhere
    assert(p.contains("Window"))
    assert(!p.contains("TakeOrderedAndProject"))
  }

  test("dsir: log-ratio table broadcasts; resample is a TakeOrdered") {
    val p = plan("q_dsir_select")
    // the per-bucket model join must broadcast (≤ buckets rows), and the
    // Gumbel top-k must plan the distributed TakeOrdered — never a
    // global sort of the weighted corpus
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("quantile buckets rank partition-locally, no single-partition window") {
    val p = plan("q_ppl_buckets")
    // the within-group rank is the grouped two-pass prefix sum: windows
    // keyed on (__pid, grp), offsets/totals broadcast — never a
    // one-task-per-group (or all-rows) window
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("hard negatives: positives anti-join broadcasts, no re-scoring sort") {
    val p = plan("q_hard_negatives")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("literal search: needle grams broadcast, no cartesian scan") {
    val p = plan("q_literal_search")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("cdc dup pairs join on the chunk hash — never a cartesian") {
    val p = plan("q_cdc_dup")
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("nb scoring broadcasts the label set; likelihood joins by key") {
    val p = plan("q_nb_classify")
    // the tiny label frame rides a broadcast nested-loop cross join;
    // the (label, term) likelihood table must NOT — it equi-joins
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") && p.contains("log_like"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("kmv sketches partial-aggregate map-side (≤k arrays shuffle)") {
    val p = plan("q_kmv_distinct")
    // typed KmvAgg runs as ObjectHashAggregate with a partial pass
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_kmvagg") || p.contains("partial_KmvAgg")
      || p.toLowerCase.contains("partial_kmvagg"), p)
  }

  test("sorted neighbors: no single-partition window, no theta join") {
    val df = SparkEntry.queries("q_sorted_neighbors")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("frame-aligned media dup joins band keys — never a cartesian") {
    val p = plan("q_video_dup")
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("html extraction and url canonicalization stay in one projection") {
    Seq("q_html_extract", "q_url_canon").foreach { q =>
      val p = plan(q)
      // per-row column work: no join, no aggregate, no window
      assert(!p.contains("Join") && !p.contains("Window"), s"$q:\n$p")
    }
  }

  test("paragraph dedup elects keepers by aggregate, never a " +
      "paragraph-partitioned window") {
    val p = plan("q_paragraph_dedup")
    // the keeper election must be a partial+final min(struct) aggregate
    // (map-side combinable — a 10⁹-copy boilerplate paragraph sends one
    // candidate per map partition), not a window whose hot-hash
    // partition lands on one reducer
    assert(p.contains("partial_min") || p.contains("partial min"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("quality rules evaluate as pure projection — no shuffle at all") {
    val p = plan("q_quality_rules")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"), p)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("knn graph broadcasts the query side and windows per query — " +
      "never a global sort or cartesian") {
    // the gate itself reads the memoized shared graph; pin the
    // OPERATOR's plan directly
    val p = graft.ext.EmbeddingSearch.knnGraph(
        graft.Tables.embeddings(spark, d), k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    // ranking is a per-query-partition window, not a global TopK sort
    assert(p.contains("Window"), p)
  }

  test("federated read resolves precedence with an aggregate + join, " +
      "never a window") {
    val p = plan("q_store_federate")
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("binary quantization: broadcast query side, per-query windows, " +
      "no cartesian over the corpus") {
    val p = graft.ext.EmbeddingSearch.binaryTopK(
        graft.Tables.embeddings(spark, d), org.apache.spark.sql.functions
          .col("vec_id") < 3, k = 2, candidates = 5)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    // stage 1 (Hamming candidates) + stage 2 (exact re-rank): both
    // windows partition per query — never a global sort
    assert("Window".r.findAllIn(p).size >= 2, p)
    // the query side broadcasts in both stages; the non-equi stage-1
    // join is a broadcast nested loop over the BOUNDED query set
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("knn classification: vote window partitions per node — never a " +
      "single-partition sort") {
    val p = plan("q_knn_classify")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("rank metrics: per-query windows and aggregates only, no " +
      "single partition") {
    val p = plan("q_rank_eval")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("mmr: every greedy step joins on query_id — no cartesian, no " +
      "single-partition window") {
    val p = plan("q_mmr_rerank")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("group split: one left equi-join plus the hash projection — " +
      "no window, no cartesian") {
    val p = plan("q_split_groups")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("persisted hub entry election reads ONLY the hubs relation — " +
      "no edge scan, no degree aggregate in the serving window") {
    import spark.implicits._
    val embs = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 10f else 0.1f * i)))
      .toDF("vec_id", "embedding")
    val path = Gate.tmpDir("spec_hubplan_")
    ext.KnnGraphIndex.buildFrom(embs,
      ext.EmbeddingSearch.knnGraph(embs, 2), path, k = 2)
    val snap = ext.IndexStore.snapshot(spark, path)
    val p = ext.KnnGraphIndex.hubEntryFrame(snap, 4)
      .queryExecution.executedPlan.toString
    // every scan reads the hubs schema (vec_id, deg, gen) — the edge
    // relation (neighbor_id, cos, rank) is never touched (file paths
    // are truncated in plan dumps, so pin the ReadSchema instead)
    assert(p.contains("deg:bigint"), p)
    assert(!p.contains("neighbor_id"), p)
    // the degree is READ from the elected relation, never recomputed:
    // no count aggregate anywhere in the serving-entry plan (the only
    // aggregate is the max-gen election read over the tiny hub rows)
    assert(!p.contains("count("), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("trigram explode runs over the projected token array, not an " +
      "inlined re-split per element") {
    // the r14 fix projects tokens(text) to __ts BEFORE the positional
    // transform lambda; if a future Catalyst CollapseProject heuristic
    // folded the projection back in, every element_at would re-run the
    // whole regex split — O(tokens²) per row, the measured 13 s → 1.8 s
    // regression in reverse. Pin the optimized shape: no element_at
    // over an inline split anywhere in the plan.
    val p = SparkEntry.queries("q_trigram_logprob")(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("element_at(split("), p.take(4000))
    assert(p.contains("element_at(__ts"), p.take(4000))
  }

}
