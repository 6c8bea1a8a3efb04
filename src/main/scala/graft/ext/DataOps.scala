package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: deterministic
  * splits, weighted source mixing, and benchmark decontamination.
  *
  * Determinism rule: every assignment derives from a content/id hash
  * (md5), never from `rand()` — re-runs, retries, and cluster re-plans
  * all produce byte-identical datasets, and an external system (or the
  * DuckDB oracle) can reproduce the assignment independently.
  */
object DataOps {

  /** Deterministic split assignment from the md5 of an id column: the
    * first two hex chars give a uniform value in [0, 256); cut points at
    * `trainPct`/`valPct` of 256, compared as hex strings (lowercase hex
    * sorts numerically, so any SQL engine can mirror the assignment with
    * a plain string comparison). Stable under any re-partitioning.
    */
  def splitOf(id: Column, trainPct: Double = 0.8,
      valPct: Double = 0.1): Column = {
    val bucket = substring(md5(id.cast("string")), 1, 2)
    val trainCut = f"${(trainPct * 256).toInt}%02x"
    val valCut = f"${((trainPct + valPct) * 256).toInt}%02x"
    when(bucket < trainCut, "train")
      .when(bucket < valCut, "val")
      .otherwise("test")
  }

  def stratifiedSplit(df: DataFrame, id: Column, trainPct: Double = 0.8,
      valPct: Double = 0.1): DataFrame =
    df.withColumn("split", splitOf(id, trainPct, valPct))

  /** LEAKAGE-SAFE split: rows split by their GROUP's hash, not their
    * own, so the members of one group — a near-dup cluster, a domain,
    * a conversation — can never straddle the train/test boundary (the
    * classic eval-contamination bug: doc-level splitting puts one copy
    * of a duplicated passage in train and its twin in test, and the
    * benchmark measures memorization). `groups` carries (id, cluster);
    * rows with no group fall back to their own id (singleton group),
    * so a partial clustering degrades to [[stratifiedSplit]], never to
    * an error. One left equi-join + the same hash projection —
    * corpus-linear, assignment stable under re-partitioning. An id
    * carrying SEVERAL group rows resolves to its min cluster (one
    * aggregate) — a left join against a multi-mapping would otherwise
    * silently DUPLICATE corpus rows, a far worse failure than any
    * split-assignment choice.
    */
  def groupSplit(df: DataFrame, id: Column, groups: DataFrame,
      trainPct: Double = 0.8, valPct: Double = 0.1): DataFrame = {
    val g = groups.select(col("id").as("__gid"),
      col("cluster").as("__grp"))
      .groupBy("__gid").agg(min("__grp").as("__grp"))
    // both coalesce arms cast to string INDEPENDENTLY: a common-type
    // coercion (e.g. a DOUBLE cluster column vs a LONG id) would
    // rewrite the ungrouped rows' hash input ("200" → "200.0") and
    // silently break the degrades-to-stratifiedSplit law
    df.join(g, id === col("__gid"), "left")
      .withColumn("split",
        splitOf(coalesce(col("__grp").cast("string"),
          id.cast("string")), trainPct, valPct))
      .drop("__gid", "__grp")
  }

  /** Weighted mixing: keep each row with probability `weight(source)`,
    * decided by a second, independent hash byte — deterministic
    * downsampling per source (weights > 1 are capped at keep-all; true
    * upsampling is an explode-by-ceil extension).
    */
  def weightedMix(df: DataFrame, id: Column, source: Column,
      weights: Map[String, Double]): DataFrame = {
    // independent hash byte (chars 3-4), hex-string compared like splitOf
    val bucket = substring(md5(id.cast("string")), 3, 2)
    val keepExpr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit("zz")) { case (acc, (src, w)) =>
        // w >= 1 must keep-all: "zz" sorts above every hex bucket, whereas
        // f"${256}%02x" would yield the 3-char "100" and drop buckets >= "10"
        val cut = if (w >= 1.0) "zz" else f"${(w * 256).toInt}%02x"
        when(source === src, lit(cut)).otherwise(acc)
      }
    df.filter(bucket < keepExpr)
  }

  /** Generalizes [[weightedMix]] to weights above 1 (true upsampling):
    * each row is emitted `floor(w)` times plus one more when its hash
    * byte falls under the fractional remainder — so expected multiplicity
    * is exactly w, deterministically per id. Emits a `copy_idx` column
    * (1..copies) so downstream shuffles can distinguish the copies.
    * Sources absent from the map default to weight 1 (one copy).
    */
  def weightedResample(df: DataFrame, id: Column, source: Column,
      weights: Map[String, Double]): DataFrame = {
    val bucket = substring(md5(id.cast("string")), 3, 2)
    val sorted = weights.toSeq.sortBy(_._1)
    val base = sorted.foldLeft(lit(1)) { case (acc, (src, w)) =>
      when(source === src, lit(w.toInt)).otherwise(acc)
    }
    val fracCut = sorted.foldLeft(lit("00")) { case (acc, (src, w)) =>
      when(source === src, lit(f"${((w - w.toInt) * 256).toInt}%02x"))
        .otherwise(acc)
    }
    df.withColumn("__copies",
        base + when(bucket < fracCut, 1).otherwise(0))
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
  }

  /** Temperature-scaled source mixing — the multilingual/multi-domain
    * pretraining recipe (exponential smoothing, as in XLM-R): the
    * target mixture is `p_s ∝ n_s^alpha` (alpha = 1 keeps natural
    * proportions, alpha → 0 approaches uniform), flattening source
    * imbalance so small domains aren't drowned; each source's
    * deterministic resampling rate `p_s · N · totalFraction / n_s`
    * upsamples small sources above 1 and downsamples large ones below,
    * then [[weightedResample]] applies it per id. Rates round to 6
    * decimals (HALF_UP, the SQL engines' rounding) so an external
    * engine derives identical rates — and therefore the identical
    * dataset.
    *
    * The per-source count collect is bounded by the number of sources
    * (languages/domains — dozens, not data-sized); everything row-wise
    * stays in [[weightedResample]]'s hash expressions.
    */
  def temperatureMix(df: DataFrame, id: Column, source: Column,
      alpha: Double, totalFraction: Double = 1.0): DataFrame = {
    val counts = df.groupBy(source.cast("string").as("__src"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val denom = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val total = counts.map(_._2).sum.toDouble
    val rates = counts.map { case (s, n) =>
      val p = math.pow(n.toDouble, alpha) / denom
      s -> BigDecimal(p * total * totalFraction / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    weightedResample(df, id, source, rates)
  }

  /** Sequence packing for training: documents are laid out in a
    * deterministic md5-shuffled order inside `buckets` shards, and each
    * doc is assigned to the pack its starting token offset falls in —
    * GPT-style "concatenate everything, split at `budget` tokens"
    * preprocessing, where a doc crossing a boundary belongs to the pack
    * it starts in. Packs never cross buckets; at scale the bucket count
    * scales with the cluster (each bucket is one sort partition), and
    * the whole layout re-derives bit-identically from (seed, id).
    */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
      budget: Int, buckets: Int = 16, seed: String = "s1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("pack_bucket").orderBy("pack_key")
    df.withColumn("pack_bucket", pmod(id, lit(buckets)))
      .withColumn("pack_key", md5(concat(lit(seed), id.cast("string"))))
      .withColumn("pack_id",
        floor((sum(nTokens).over(w) - nTokens) / budget))
  }

  /** DETERMINISTIC OUTPUT SHARDING — the WebDataset/TFRecord landing
    * shape, i.e. the last step a training-data pipeline actually runs:
    * lay the corpus out in a seeded md5 order (the [[splitOf]]/
    * [[gumbelTopK]] hash-derandomization discipline applied to OUTPUT
    * layout), cut it into fixed-token shards, and return each row's
    * (shard, ord) so `write.partitionBy("shard")` +
    * `sortWithinPartitions("ord")` lands a byte-identical corpus from
    * nothing but (corpus version, seed) — a training run's shard
    * contents replay exactly, and two engines derive the same layout.
    * A document crossing a shard boundary belongs to the shard its
    * starting token offset falls in (the [[packSequences]] rule).
    *
    * The global token offsets are the [[selectUnderBudget]] two-pass
    * distributed prefix sum over the seeded order — range-partition on
    * the shuffle key, per-partition sums to the driver (one tiny row
    * per partition), exclusive offsets broadcast back into a
    * PARTITION-LOCAL window — never a single-partition global window
    * (PlanShapeSpec pins the plan). Returns the input plus
    * (shard BIGINT, ord BIGINT): `ord` is the 1-based global seeded
    * rank, so intra-shard order is `ord` ascending.
    *
    * REQUIRES unique `id` values (asserted, riding the prefix-sum
    * aggregate): duplicate ids share a seed key, making their relative
    * layout arbitrary — the nondeterminism this operator exists to
    * remove.
    */
  def shardPacked(df: DataFrame, id: Column, nTokens: Column,
      shardTokens: Long, seed: String = "s1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardTokens > 0, s"shardPacked needs shardTokens > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("__key",
        md5(concat(lit(seed), lit(":"), id.cast("string"))))
      .repartitionByRange(col("__key"), id)
      .sortWithinPartitions(col("__key"), id)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // the per-partition sums ALSO carry a distinct-id count: duplicate
    // ids share an md5 key (and range-partition together), so rows >
    // distinct ids in any partition means the seeded order is not a
    // total order and the rows-between window would assign ord/shard
    // ARBITRARILY among the duplicates — exactly the run-to-run
    // nondeterminism the seeded layout exists to eliminate. Fail loudly
    // instead of silently shipping an unreplayable layout; the check
    // rides the prefix-sum aggregate this pass already pays.
    val parts = keyed.groupBy("__pid")
      .agg(count(lit(1)).as("c"), sum("__n").as("t"),
        countDistinct(col("__key")).as("u"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    require(parts.forall { case (_, c, _, u) => c == u },
      "shardPacked requires UNIQUE ids: the input carries duplicate id " +
        "values, whose relative ord/shard assignment would be arbitrary " +
        "run to run — dedup the corpus (or re-key it) before sharding")
    val offsets0 = parts.map { case (p, c, t, _) => (p, c, t) }
    var rows = 0L
    var toks = 0L
    val offsets = offsets0.map { case (p, c, t) =>
      val o = (p, rows, toks); rows += c; toks += t; o
    }
    val offDf = offsets.toSeq.toDF("__pid", "__rowOff", "__tokOff")
    val w = Window.partitionBy("__pid").orderBy(col("__key"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offDf), "__pid")
      .withColumn("ord", count(lit(1)).over(w) + col("__rowOff"))
      .withColumn("shard",
        floor((sum(col("__n")).over(w) + col("__tokOff") - col("__n"))
          / shardTokens))
      .drop("__pid", "__rowOff", "__tokOff", "__n", "__key")
  }

  /** Benchmark decontamination: flag documents sharing any word n-gram
    * with the benchmark corpus. The benchmark shingle set is tiny
    * relative to the corpus → broadcast semi/left join; corpus text never
    * shuffles. Returns the input plus (contaminated, n_hits).
    */
  def decontaminate(docs: DataFrame, docId: Column, docText: Column,
      bench: DataFrame, benchText: Column, n: Int = 7): DataFrame = {
    // hashed shingles both sides: membership is identical (2^-64
    // collisions) and the broadcast set carries 8-byte keys, not 7-gram
    // strings
    val docSh = Dedup.hashedShingles(docs, docId, docText, n)
    val benchSh = Dedup.hashedShingles(bench.select(lit(0L).as("__bid"),
        benchText.as("__btext")), col("__bid"), col("__btext"), n)
      .select("sh").distinct()
    val hits = docSh.join(broadcast(benchSh), "sh")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    docs.join(hits.withColumnRenamed("id", "__hit_id"),
        docId === col("__hit_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") > 0)
      .drop("__hit_id")
  }

  /** Deterministic random negatives for contrastive training: for each
    * query, `k` corpus documents drawn from a hash-ranked candidate pool,
    * excluding the query itself and any supplied positive pairs. The
    * classic in-batch-random negative mine, made reproducible: every
    * assignment derives from md5 hashes (the module's determinism rule),
    * so re-runs and an external engine reproduce the exact pair set.
    *
    * Scale shape: the POOL is the `poolSize` smallest corpus-wide hash
    * keys — one corpus pass reduced by TakeOrdered, then broadcast; each
    * query meets only the pool (|queries| × poolSize bounded), never the
    * corpus. The per-query ranking hash differs from the pool hash, so
    * pool membership and per-query order are independent draws.
    *
    * Returns (query_id, rn, id), rn ≤ k in per-query hash order.
    */
  def negativeSample(docs: DataFrame, docId: Column, queries: DataFrame,
      queryId: Column, k: Int, poolSize: Int = 256,
      positives: Option[DataFrame] = None): DataFrame = {
    val pool = docs
      .select(docId.as("id"),
        md5(concat(lit("pool:"), docId.cast("string"))).as("pool_key"))
      .orderBy("pool_key", "id").limit(poolSize)
      .select("id")
    val cand = queries.select(queryId.as("query_id"))
      .crossJoin(broadcast(pool))
      .filter(col("query_id") =!= col("id"))
    val filtered = positives.fold(cand)(p =>
      cand.join(p.select(col("query_id"), col("id")),
        Seq("query_id", "id"), "left_anti"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("pair_key"), col("id"))
    filtered
      .withColumn("pair_key", md5(concat(col("query_id").cast("string"),
        lit(":"), col("id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "rn", "id")
  }

  /** Data selection under a token budget: rank documents by a quality
    * score (ties broken by id — fully deterministic), keep the prefix
    * whose cumulative token count fits `budget`. A doc is kept iff the
    * running sum INCLUDING it is within budget — the greedy best-first
    * selection every curated-pretraining pipeline runs.
    *
    * The running sum is a two-pass distributed prefix sum, never a
    * single-partition window: (1) the (id, score, n_tokens) triples —
    * the text never rides along — are range-partitioned and sorted on
    * (score desc, id), giving a global order split across partitions;
    * an eager localCheckpoint freezes that layout so both passes see
    * identical partition ids. (2) per-partition token sums (one tiny
    * row per partition) collect to the driver, their exclusive prefix
    * becomes each partition's offset, and the offsets broadcast back
    * into a PARTITION-LOCAL running-sum window. Exact by construction —
    * the offsets are the actual partition sums, wherever the range
    * boundaries landed — and every stage is parallel in the partition
    * count, so the operator survives a 100× scale-up that the old
    * global-window spelling (one task holding every row) did not.
    */
  def selectUnderBudget(df: DataFrame, id: Column, score: Column,
      nTokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(id.as("id"), score.as("score"), nTokens.as("n_tokens"))
      .repartitionByRange(col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = sorted.groupBy("__pid")
      .agg(sum("n_tokens").as("psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = partSums.map { case (p, s) =>
      val off = (p, acc); acc += s; off
    }
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid")
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offDf), "__pid")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("__off"))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__off")
  }

  /** PER-GROUP budget selection — the mixture-construction shape: each
    * source/domain gets its own token budget ("30 B tokens of web, 5 B
    * of code, 1 B of math") and, within each group, documents are
    * admitted best-score-first until that group's budget fills.
    * `budgets` carries one (grp, budget) row per admitted group; groups
    * without a budget row are dropped (budgeting IS the selection).
    *
    * Same two-pass distributed prefix sum as [[selectUnderBudget]],
    * with the group key leading the range partitioning: the naive
    * `Window.partitionBy(group)` spelling puts EACH WHOLE GROUP through
    * one task — at 100 TB a 30 TB web crawl serializes — while here a
    * group spans as many range partitions as its size warrants, the
    * driver sees only (partition × group-overlap) partial-sum rows, and
    * each partition's window runs locally on (__pid, grp).
    */
  def selectUnderBudgetBy(df: DataFrame, group: Column, id: Column,
      score: Column, nTokens: Column, budgets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val sorted = df
      .select(group.as("grp"), id.as("id"), score.as("score"),
        nTokens.as("n_tokens"))
      .repartitionByRange(col("grp"), col("score").desc, col("id"))
      .sortWithinPartitions(col("grp"), col("score").desc, col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = sorted.groupBy("__pid", "grp")
      .agg(sum("n_tokens").as("psum")).collect()
    val offRows = partSums.groupBy(_.get(1)).iterator.flatMap {
      case (_, rs) =>
        var acc = 0L
        rs.sortBy(_.getInt(0)).map { r =>
          val o = Row(r.getInt(0), r.get(1), acc)
          acc += r.getLong(2)
          o
        }
    }.toSeq
    val grpField = sorted.schema("grp")
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        grpField, StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy("__pid", "grp")
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offDf), Seq("__pid", "grp"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("__off"))
      .join(broadcast(budgets.select(col("grp"), col("budget"))), Seq("grp"))
      .filter(col("cum_tokens") <= col("budget"))
      .drop("__pid", "__off", "budget")
  }

  /** Per-document hashed n-gram feature counts — the DSIR feature map
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): unigrams and word bigrams hash into
    * `buckets` buckets via the 48-bit md5 gram hash
    * ([[TextAnalysis.md5Hash48]] — the hash an external engine can
    * reproduce), and each document becomes a sparse count vector
    * (id, b, cnt). Bigrams derive per-row from the token array (no
    * positional self-join); the groupBy is a two-phase hash
    * aggregation on (id, b) — corpus-token-linear, the only row
    * multiplier is the gram explode.
    */
  def hashedNgramCounts(docs: DataFrame, id: Column, text: Column,
      buckets: Int): DataFrame =
    gramFrame(docs, id, text)
      .select(col("id"),
        pmod(TextAnalysis.md5Hash48(col("g")), lit(buckets.toLong)).as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("cnt"))

  /** (id, g) rows: every unigram and every adjacent word bigram. */
  private def gramFrame(docs: DataFrame, id: Column,
      text: Column): DataFrame = {
    val t = TextAnalysis.tokens(text)
    val bi = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (p, c) => concat(p, lit(" "), c))
    docs.select(id.as("id"), explode(concat(t, bi)).as("g"))
  }

  /** DSIR importance weights: score every raw document by how much more
    * likely its hashed n-gram features are under the TARGET corpus's
    * bag-of-ngrams model than under the raw corpus's own —
    * `log w(x) = Σ_b c_b(x)·(ln p̂_tgt(b) − ln p̂_raw(b))` with add-k
    * smoothing over the `buckets`-bucket hashed vocabulary. The
    * data-selection primitive for "more data like this sample": rank or
    * resample raw documents by `log_w` ([[gumbelTopK]] is the paper's
    * sampler). Returns (id, n_feat, log_w) per raw document.
    *
    * Scale shape: both models are one hash aggregation over their gram
    * streams; the per-bucket log-ratio table is ≤ `buckets` rows →
    * broadcast into the per-document feature join; nothing
    * corpus-sized ever shuffles wider than the (id, b) feature
    * reduction. The target is typically a curated sample, but nothing
    * here requires it small — its model is the same one-pass reduction.
    */
  def importanceWeights(raw: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column, buckets: Int = 1024,
      kSmooth: Double = 0.5): DataFrame = {
    val feats = hashedNgramCounts(raw, id, text, buckets)
    val rawTot = feats.groupBy("b").agg(sum("cnt").as("rcnt"))
    val tgtTot = gramFrame(
        target.select(lit(0L).as("__id"), targetText.as("__text")),
        col("__id"), col("__text"))
      .select(pmod(TextAnalysis.md5Hash48(col("g")),
        lit(buckets.toLong)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("tcnt"))
    val rt = rawTot.agg(sum("rcnt").as("rtot"))
    val tt = tgtTot.agg(sum("tcnt").as("ttot"))
    // raw-side buckets cover every feature bucket by construction;
    // target-absent buckets smooth to the floor probability
    val lr = rawTot.join(tgtTot, Seq("b"), "left")
      .crossJoin(broadcast(rt)).crossJoin(broadcast(tt))
      .select(col("b"),
        (log((coalesce(col("tcnt"), lit(0L)) + lit(kSmooth)) /
            (col("ttot") + lit(kSmooth * buckets))) -
          log((col("rcnt") + lit(kSmooth)) /
            (col("rtot") + lit(kSmooth * buckets)))).as("lr"))
    feats.join(broadcast(lr), "b")
      .groupBy("id")
      .agg(sum("cnt").cast("long").as("n_feat"),
        sum(col("cnt") * col("lr")).as("log_w"))
  }

  /** Gumbel-top-k sampling without replacement, derandomized: drawing k
    * items with probability ∝ exp(logW) is exactly "add independent
    * Gumbel(0,1) noise to each logW and take the top k" — and the
    * module's determinism rule turns the noise into a hash:
    * `u = md5₄₈(seed:id)/2⁴⁸`, `g = −ln(−ln u)`. Re-runs, retries, and
    * the DuckDB oracle all draw the identical sample; changing `seed`
    * draws a fresh one. This is DSIR's resampling step with
    * [[importanceWeights]] as logW, but the sampler is generic.
    *
    * The top-k is an `orderBy(...).limit(k)` — Spark's distributed
    * TakeOrdered, never a global sort — and only the k survivors pass
    * through the rank window (single partition of k rows, bounded by
    * construction). Returns the input columns plus (key, rn), rn ≤ k
    * in descending perturbed-key order.
    */
  def gumbelTopK(df: DataFrame, id: Column, logW: Column, k: Int,
      seed: String = "g1"): DataFrame = {
    val u = TextAnalysis.md5Hash48(concat(lit(seed + ":"),
      id.cast("string"))).cast("double") / lit(281474976710656.0)
    val keyed = df.withColumn("key", round(logW - log(-log(u)), 6))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key").desc, id)
    keyed.orderBy(col("key").desc, id).limit(k)
      .withColumn("rn", row_number().over(w))
  }

  /** Per-group quantile bucketing — the CCNet shape: rank documents
    * within each group (language, source) by a score and cut the
    * ranking into `k` equal-depth buckets, `0` holding the best-scored
    * slice ("head"), `k−1` the worst ("tail"). Downstream mixes then
    * keep/weight buckets per group. Callers pre-round the score so the
    * rank order is engine-reproducible.
    *
    * The within-group rank is the same two-pass distributed prefix sum
    * as [[selectUnderBudget]] (counting 1s): a group spans as many
    * range partitions as its size warrants — never the
    * one-task-per-group `Window.partitionBy(group)` spelling — the
    * driver sees only (partition × group-overlap) count rows, and the
    * rank window runs partition-locally. Bucket = ⌊(rank−1)·k/n⌋ over
    * the group's total n, exact in integer-range doubles.
    *
    * Returns (grp, id, score, rank, bucket).
    */
  def quantileBuckets(scored: DataFrame, group: Column, id: Column,
      score: Column, k: Int = 3): DataFrame =
    groupRanks(
      scored.select(group.as("grp"), id.as("id"), score.as("score")),
      descending = true)
      .withColumn("bucket",
        floor((col("rank") - 1) * lit(k.toDouble) / col("__n"))
          .cast("int"))
      .drop("__n")

  /** Deterministic fixed-size per-group sampling — eval-set / holdout
    * construction ("500 documents per language"): each group's `k`
    * smallest `md5(seed:id)` draws, reproducible across re-runs,
    * layouts, and engines (the module's determinism rule), changing
    * with `seed`. Ranking rides the same grouped prefix sum as
    * [[quantileBuckets]] — no group ever serializes through one task.
    * Returns (grp, id, rank), rank ≤ k in hash order.
    */
  def stratifiedSample(df: DataFrame, group: Column, id: Column, k: Int,
      seed: String = "s1"): DataFrame =
    groupRanks(
      df.select(group.as("grp"), id.as("id"),
        md5(concat(lit(seed + ":"), id.cast("string"))).as("score")),
      descending = false)
      .filter(col("rank") <= k)
      .select(col("grp"), col("id"), col("rank"))

  /** Within-group rank over a (grp, id, score) frame via the grouped
    * two-pass distributed prefix sum (count of 1s): range-partition on
    * (grp, score[, id]), per-(partition, grp) counts collect as one tiny
    * row each, their exclusive prefixes broadcast back as offsets, and
    * the rank window runs partition-locally. Adds (rank, __n = group
    * size). A group spans as many partitions as its size warrants —
    * never `Window.partitionBy(grp)`'s one-task-per-group.
    */
  /** Global rank over an (id, score) frame by (score asc, id) — the
    * single-group spelling of [[groupRanks]]: same two-pass distributed
    * prefix sum, no SinglePartition window anywhere. Adds (rank, __n);
    * extra columns ride along.
    */
  private[graft] def globalRanks(scored: DataFrame): DataFrame =
    groupRanks(scored.withColumn("grp", lit(0)), descending = false)
      .drop("grp")

  private def groupRanks(scored: DataFrame,
      descending: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    val spark = scored.sparkSession
    val scoreOrd = if (descending) col("score").desc else col("score").asc
    val sorted = scored
      .repartitionByRange(col("grp"), scoreOrd, col("id"))
      .sortWithinPartitions(col("grp"), scoreOrd, col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partCounts = sorted.groupBy("__pid", "grp")
      .agg(count(lit(1)).as("c")).collect()
    val offRows = partCounts.groupBy(_.get(1)).iterator.flatMap {
      case (_, rs) =>
        var acc = 0L
        rs.sortBy(_.getInt(0)).map { r =>
          val o = Row(r.getInt(0), r.get(1), acc)
          acc += r.getLong(2)
          o
        }
    }.toSeq
    val totals = partCounts.groupBy(_.get(1)).iterator.map {
      case (g, rs) => Row(g, rs.map(_.getLong(2)).sum)
    }.toSeq
    val grpField = sorted.schema("grp")
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        grpField, StructField("__off", LongType, nullable = false))))
    val totDf = spark.createDataFrame(
      spark.sparkContext.parallelize(totals, 1),
      StructType(Seq(grpField,
        StructField("__n", LongType, nullable = false))))
    val w = Window.partitionBy("__pid", "grp")
      .orderBy(scoreOrd, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offDf), Seq("__pid", "grp"))
      .join(broadcast(totDf), Seq("grp"))
      .withColumn("rank", count(lit(1)).over(w) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Column profiler: per profiled column, null count, exact distinct
    * count, and min/max (stringified so heterogeneous column types share
    * one long-form output row shape). Counts/nulls/min/max ride ONE
    * keyless pass (no grouping keys → no sort, one partial row per
    * partition); each exact distinct is its own two-phase hash dedup on
    * the value (values as KEYS hash-aggregate fine; tiny shuffle after
    * map-side dedup). The tempting `countDistinct`-in-the-same-agg
    * spelling expands the input ×(k+1) and — because string min/max
    * buffers are not hash-aggregable — SORTS the expanded rows
    * (measured 4× slower at sf0.1). At 100 TB swap
    * `approx_count_distinct` into the keyless pass instead.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val base = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val wide = columns.foldLeft(base) { (acc, c) =>
      // count(c), not count(*): a NULL appears as a distinct() row but
      // is excluded from COUNT(DISTINCT c) semantics
      acc.crossJoin(broadcast(df.select(col(c)).distinct()
        .agg(count(col(c)).as(s"${c}__distinct"))))
    }
    val stacked = columns.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr("n_rows", s"stack(${columns.size}, $stacked)" +
      " AS (column, n_nulls, n_distinct, vmin, vmax)")
  }

  /** Heavy hitters — every key occurring in at least `minFrac` of the
    * rows, with its EXACT count. The 100 TB shape for stop-list /
    * frequent-n-gram mining, where `groupBy(key).count()` would
    * shuffle one row per distinct key (corpus-scale for n-grams):
    *
    *   1. per-partition Misra–Gries summaries of m = ⌈1/minFrac⌉
    *      counters (`mapPartitions`, bounded memory, no shuffle) — the
    *      classic guarantee transfers to the union: a key with global
    *      frequency ≥ minFrac·N must clear the local N_p/(m+1) bar in
    *      at least one partition (averaging argument), so the merged
    *      candidate set is a SOUND SUPERSET;
    *   2. one exact count pass restricted to the candidates (≤ m per
    *      partition, broadcast semi-join) — false candidates fall to
    *      the threshold filter, so the output is exactly what the
    *      naive global count would return, with a shuffle bounded by
    *      candidates instead of distinct keys.
    *
    * Deterministic end-to-end: the sketch only shapes the candidate
    * superset; the exact verify decides membership and values.
    * NULL is a key like any other (the exact pass joins null-safely),
    * so a frequent null surfaces as a (null, cnt) row — the same
    * answer a SQL GROUP BY gives — instead of silently vanishing.
    * Returns (k, cnt), `key` cast to string.
    */
  def heavyHitters(df: DataFrame, key: Column, minFrac: Double): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, s"minFrac=$minFrac")
    val spark = df.sparkSession
    import spark.implicits._
    val m = math.max(1, math.ceil(1.0 / minFrac).toInt)
    val keyed = df.select(key.cast("string").as("k"))
    // (key, weight, partitionRows, isSentinel): one sentinel row per
    // partition carries N_p so the global N needs no second full pass
    val summaries = keyed.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { k =>
        n += 1
        counters.get(k) match {
          case Some(c) => counters(k) = c + 1
          case None if counters.size < m => counters(k) = 1L
          case None =>
            // decrement-all step: every live counter pays one
            val dead = counters.iterator
              .collect { case (kk, 1L) => kk }.toList
            counters.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(counters.remove)
        }
      }
      counters.iterator.map { case (k, w) => (k, w, 0L, false) } ++
        Iterator(("", 0L, n, true))
    }.toDF("k", "w", "np", "sentinel").persist()
    try {
      val n = summaries.filter(col("sentinel"))
        .agg(sum("np")).head().getLong(0)
      val minCount = math.max(1L, math.ceil(minFrac * n).toLong)
      // materialize the (bounded: ≤ m per partition) candidate set
      // eagerly so the sketch pass can unpersist without the returned
      // lazy plan re-running it
      val cands = summaries.filter(!col("sentinel"))
        .select(col("k").as("ck")).distinct().localCheckpoint(true)
      // null-safe equality: a frequent NULL key is a legitimate
      // candidate and must survive the exact pass (plain `join on k`
      // drops null matches — the one key the sketch found but the
      // verify would silently lose)
      keyed.join(broadcast(cands), col("k") <=> col("ck"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
    } finally { summaries.unpersist(); () }
  }

  /** KMV distinct-count sketches per group ([[graft.functions.KmvAgg]]):
    * one map-side-combined aggregation whose shuffle carries a ≤k-long
    * sorted hash array per group — the mergeable alternative to
    * `approx_count_distinct` when summaries must compose across jobs
    * (union via [[kmvUnion]]) or replay in another engine. The value is
    * hashed with [[TextAnalysis.md5Hash48]], so an external oracle
    * derives the identical sketch. Returns (group, sketch).
    */
  def kmvSketches(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame =
    df.select(group.as("g"),
        TextAnalysis.md5Hash48(value.cast("string")).as("h"))
      .groupBy("g")
      .agg(udaf(new graft.functions.KmvAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("h")).as("sketch"))

  /** Union of KMV sketches: explode the kept hashes and re-aggregate.
    * Exact by the k-min property — the k smallest hashes of the union
    * are each inside some input's k smallest — so this is the lossless
    * roll-up path (per-partition → per-day → global) at 100 TB: only
    * ≤k-long summaries move, never key domains. Returns one row
    * (group = `label`, sketch).
    */
  def kmvUnion(sketches: DataFrame, label: String, k: Int): DataFrame =
    sketches.select(explode(col("sketch")).as("h"))
      .groupBy(lit(label).as("g"))
      .agg(udaf(new graft.functions.KmvAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("h")).as("sketch"))

  /** Merge two per-group sketch frames (g, sketch) group-wise — the
    * incremental path: yesterday's persisted sketches plus today's
    * batch, re-aggregated through the same k-min buffer. Exact by the
    * k-min property: `merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)`, so
    * the sketch table is maintainable forever without revisiting data.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b)
      .select(col("g"), explode(col("sketch")).as("h"))
      .groupBy("g")
      .agg(udaf(new graft.functions.KmvAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("h")).as("sketch"))

  /** The KMV estimator over a sketch column: exact size while the
    * sketch is under-full (fewer than k distinct seen), else
    * `(k−1)/ρ(h_k)` with ρ the kth smallest hash normalized to the
    * md5Hash48 domain (2⁴⁸). Plain column arithmetic — replayable
    * anywhere.
    */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val kept = size(sketch)
    val kth = element_at(sketch, -1)
    when(kept < k, kept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
        kth.cast("double"))
  }

  /** k-anonymity / l-diversity audit (Sweeney '02; Machanavajjhala
    * '07) — the privacy gate a dataset release runs BEFORE a takedown
    * flow is ever needed: group rows into equivalence classes by
    * their quasi-identifier columns and report, per class, its size
    * (re-identification risk: a class smaller than `k` pins an
    * individual to ≤ k candidates) and the number of DISTINCT
    * sensitive values (a class where everyone shares one sensitive
    * value leaks it even at large k — l-diversity). Returns one row
    * per class: (quasi..., class_size, l_distinct, k_anonymous,
    * l_diverse).
    *
    * Shape: one partial+final hash aggregate over the quasi columns —
    * the exact COUNT(DISTINCT sensitive) plans Spark's Expand (×2 row
    * duplication pre-shuffle), correct for an audit that must not
    * approximate; swap the sensitive count for a KMV/HLL sketch when
    * screening at 100 TB and re-run exactly on the failures.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      k: Int, l: Int): DataFrame = {
    val names = quasi.indices.map(i => s"q$i")
    val keyed = df.select(
      quasi.zip(names).map { case (c, n) => c.as(n) } :+
        sensitive.as("__sens"): _*)
    keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("__sens")).as("l_distinct"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /** Differentially-private count release (Dwork '06): per-group counts
    * with Laplace(1/ε) noise — sensitivity 1 for counting queries — so
    * the released table is ε-DP while staying useful in aggregate. The
    * noise is SEEDED: the uniform draw comes from the md5 of
    * (seed, group key), so a release is reproducible byte-for-byte
    * given its recorded seed (the audit/replay posture every release
    * artifact here follows; rotate the seed per release). Inverse-CDF
    * Laplace: u ∈ (−½, ½) from 48 bits of the hash,
    * noise = −(1/ε)·sign(u)·ln(1 − 2|u|) — plain codegen'd column
    * arithmetic over the aggregate, replayable by any engine with md5
    * and ln. Returns (group, true count, noisy count rounded to 6).
    *
    * Shape: one partial+final count aggregate plus a map-side
    * projection — the noise never shuffles, and at 100 TB the released
    * table is group-bounded, not row-bounded.
    */
  def dpCounts(df: DataFrame, group: Column, epsilon: Double,
      seed: String): DataFrame = {
    val grouped = df.groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"))
    val u01 = conv(substring(md5(concat(lit(seed), col("g"))), 1, 12),
      16, 10).cast("double") / lit(math.pow(16.0, 12))
    val u = u01 - lit(0.5)
    val noise = (-lit(1.0 / epsilon)) * signum(u) *
      log(lit(1.0) - lit(2.0) * abs(u))
    grouped.select(col("g"), col("n"),
      round(col("n") + noise, 6).as("n_noisy"))
  }
}
