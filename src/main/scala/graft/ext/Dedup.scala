package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashAgg, SimHashAgg}

/** Deduplication family for training-data pipelines (SURVEY §2.10):
  * exact (hash-groupBy), n-gram Jaccard (shingle join), MinHash+LSH
  * (banded signatures), and SimHash (hamming-banded bit signatures).
  *
  * Scale design: signatures (MinHash/SimHash) are pure per-row column
  * expressions — no shuffle until the candidate-pair join, which only
  * shuffles (docId, bucket) pairs, never document text. The verify step
  * joins shingles for *candidate pairs only*. This is the standard
  * LSH-at-scale shape: 100 TB of text never crosses the network.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count. `min` keeps the
    * choice deterministic, unlike `dropDuplicates`.
    */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("h"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-n-gram shingles per document: (id, shingle). */
  def shingleTable(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    // tokenize into a projected column FIRST: wordShingles slices its
    // token array once per shingle position inside a transform lambda,
    // and an inline tokens(text) argument re-ran the regex split at
    // every position (O(tokens) splits per row — the q_trigram_logprob
    // finding, here on the dedup family's shared substrate). As an
    // attribute the split runs once per row; shingle values unchanged.
    docs.select(id.as("id"), TextAnalysis.tokens(text).as("__toks"))
      .select(col("id"),
        explode(array_distinct(
          TextAnalysis.wordShingles(col("__toks"), n))).as("sh"))

  /** (id, toks) tokenization projection — the shared upstream of shingle
    * and signature derivations (persist it when a pipeline needs both, so
    * the split/lower pass over the raw text runs once).
    */
  def tokenTable(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"), TextAnalysis.tokens(text).as("toks"))

  /** Distinct *hashed* word-n-gram shingles per document: (id, sh: long).
    * Grams are hashed by the codegen'd [[graft.functions.ShingleHashes]]
    * expression (one XXH64 byte-scan per token, rolling window combine) —
    * the shingle string is never even concatenated, let alone stored or
    * shuffled, so the exploded table and everything downstream
    * (doc-frequency counts, signatures, pair joins, verification) carries
    * 8-byte keys. All set arithmetic (distinct, intersection, df) is
    * identical to the string table's up to 2^-64 collisions.
    */
  def hashedShingles(docs: DataFrame, id: Column, text: Column,
      n: Int): DataFrame =
    hashedShinglesFromTokens(tokenTable(docs, id, text), n)

  /** Hashed shingles off an existing (id, toks) token table — the
    * codegen'd [[graft.functions.ShingleHashes]] expression (one XXH64
    * byte-scan per token, rolling gram combine, dedup inside the
    * expression; the HOF spelling runs interpreted per gram and re-hashes
    * every token n times).
    */
  def hashedShinglesFromTokens(toksDf: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val grams = Bridge.toColumn(graft.functions.ShingleHashes(
      Bridge.toExpr(col("toks")), n))
    toksDf.select(col("id"), explode(grams).as("sh"))
  }

  /** Exact n-gram Jaccard similarity join: pairs (a < b) with
    * |A∩B| / |A∪B| ≥ threshold. `maxDF` drops shingles appearing in more
    * than that many documents before pairing — the standard stop-shingle
    * guard that keeps the self-join from going quadratic on boilerplate.
    */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, threshold: Double, maxDF: Long): DataFrame = {
    // The hashed shingle table feeds three consumers (sizes, doc-frequency,
    // the pair self-join) — persist it so the tokenize/shingle subtree runs
    // once instead of being recomputed per branch.
    val sh = hashedShingles(docs, id, text, n).persist()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val rare = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDF).select("sh"),
      "sh")
    val common = rare.as("a")
      .join(rare.as("b"), col("a.sh") === col("b.sh") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
  }

  /** Exact τ-Jaccard similarity self-join via PREFIX FILTERING — the
    * all-pairs-similarity-search discipline of Chaudhuri et al. (ICDE'06)
    * and Bayardo et al. "Scaling Up All Pairs Similarity Search" (WWW'07),
    * re-expressed relationally. Unlike [[jaccardPairs]] (whose `maxDF`
    * stop-shingle cap changes the score semantics) this join is EXACT:
    * every pair with true n-gram Jaccard ≥ threshold is emitted with its
    * true score, and no df cap is needed to stay sub-quadratic.
    *
    * Why it scales: order every doc's shingle set by ascending global
    * document frequency (rarest first; ties broken by the hash value so
    * the order is total and consistent across docs). Two sets with
    * J(A,B) ≥ τ MUST share a shingle inside their first
    * `|X| - ⌈τ·|X|⌉ + 1` shingles under any single total order — so only
    * those short, rare-heavy prefixes are exploded and self-joined. The
    * ubiquitous grams ("the ", boilerplate) sit at the END of every
    * sorted set and never enter the candidate join at all; candidate
    * volume is bounded by the df of the RARE grams. A length filter
    * (τ·|A| ≤ |B| ≤ |A|/τ) prunes size-incompatible pairs inside the
    * join condition, and the final exact `array_intersect` verify keeps
    * the emitted scores true. 100 TB shape: df table and sorted sets are
    * hash-partitioned; the only self-join runs over prefix grams (a
    * (1−τ) fraction of the corpus shingle volume, rarest-first), and the
    * verify joins full sets for surviving candidates only.
    */
  def prefixJaccardPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, threshold: Double): DataFrame = {
    val sh = hashedShingles(docs, id, text, n)
    // Global rarity order: (df asc, sh asc) is a total order shared by
    // every document, which is all the prefix theorem requires.
    val dfTab = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val sets = sh.join(dfTab, "sh")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ranked"))
      .select(col("id"),
        transform(col("ranked"), e => e("sh")).as("set"),
        size(col("ranked")).as("m"))
      .persist()
    val pre = sets.select(col("id"), col("m"),
      posexplode(slice(col("set"), lit(1),
        (col("m") - ceil(col("m") * lit(threshold)) + lit(1)).cast("int"))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "sh")
    // PPJoin positional filter (Xiao et al., WWW'08): for the EARLIEST
    // shared gram at 0-based ranked positions (p_a, p_b), every common
    // gram sits at or after it in both rankings, so |A∩B| ≤
    // min(m_a−p_a, m_b−p_b); a τ-pair needs overlap ≥ ⌈τ/(1+τ)·(m_a+
    // m_b)⌉. Later shared-gram rows may fail the (tighter) bound, but
    // the earliest row survives for every true pair — still a sound
    // superset, now without candidates that share only late-prefix
    // grams.
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("a.m") + col("b.m")))
    val cands = pre.as("a")
      .join(pre.as("b"), col("a.sh") === col("b.sh") &&
        col("a.id") < col("b.id") &&
        col("a.m") * lit(threshold) <= col("b.m") &&
        col("b.m") * lit(threshold) <= col("a.m") &&
        least(col("a.m") - col("a.p"), col("b.m") - col("b.p")) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a"),
        col("m").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b"),
        col("m").as("n_b")), "id_b")
      .withColumn("common",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95): sort
    * the corpus by a cheap blocking key, pair every record with its
    * `window − 1` successors in key order, verify candidates with exact
    * shingle Jaccard. The classic entity-resolution complement to LSH:
    * candidate volume is DETERMINISTIC — exactly `n·(window−1)` pairs
    * regardless of key skew — where banded MinHash's bucket sizes
    * follow the data; and near-identical keys pair even when their
    * shingle bands happen to miss.
    *
    * Scale shape: the global key rank is the two-pass distributed
    * prefix sum ([[DataOps.globalRanks]] — range partition + per-
    * partition offsets, never a SinglePartition window); neighbor
    * candidates come from a bucket equi-join (each record probes its
    * own `⌈rank/window⌉` bucket and the previous one — bounded 2×
    * fanout), so no rank-range theta-join ever materializes. Verify is
    * hash-invariant set arithmetic — the output is identical under any
    * shingle hashing, which is what lets an external engine replay it
    * on raw shingle strings.
    */
  def sortedNeighborPairs(docs: DataFrame, id: Column, key: Column,
      text: Column, window: Int, n: Int,
      minJaccard: Double): DataFrame = {
    val ranked = DataOps.globalRanks(
        docs.select(id.as("id"), key.cast("string").as("score")))
      .select(col("id"), col("rank"))
    val bucketed = ranked
      .withColumn("bkt", floor((col("rank") - 1) / window))
    // a pair (rank_a < rank_b < rank_a + window) always spans at most
    // one bucket boundary: b probes its own bucket and the previous one
    val probe = bucketed.select(col("id"), col("rank"),
      explode(array(col("bkt"), col("bkt") - 1)).as("jbkt"))
    val cands = bucketed.as("a")
      .join(probe.as("b"), col("a.bkt") === col("b.jbkt") &&
        col("b.rank") > col("a.rank") &&
        col("b.rank") < col("a.rank") + window)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val sets = hashedShingles(docs, id, text, n)
      .groupBy("id").agg(collect_set(col("sh")).as("set"))
      .select(col("id"), col("set"), size(col("set")).as("m"))
    cands
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a"),
        col("m").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b"),
        col("m").as("n_b")), "id_b")
      .withColumn("common",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
  }

  /** Asymmetric containment pairs: |A∩B| / |A| ≥ threshold — "document A
    * is (mostly) contained in document B", which symmetric Jaccard
    * misses whenever the containing document is much larger (a quoted
    * article inside a long page scores near-zero Jaccard but
    * containment ≈ 1). Same capped shingle self-join skeleton as
    * [[jaccardPairs]]; emits BOTH directions (a_in_b distinguishes
    * which side is contained), so a pair of near-equal docs appears
    * twice. The `minShingles` floor drops trivially-short documents
    * whose handful of shingles make containment meaningless.
    */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, threshold: Double, maxDF: Long,
      minShingles: Int = 5): DataFrame = {
    val sh = hashedShingles(docs, id, text, n).persist()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
      .filter(col("n_sh") >= minShingles)
    val rare = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDF).select("sh"),
      "sh")
    val common = rare.as("a")
      .join(rare.as("b"), col("a.sh") === col("b.sh") &&
        col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("containment",
        col("common").cast("double") / col("n_a"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("n_a"),
        col("containment"))
  }

  /** MinHash signatures: permutation p's hash is a splitmix64 re-mix of
    * the 8-byte gram hash, min'd per permutation in one hash-aggregate
    * over the exploded hashed-shingle table (k mins in a single pass).
    * Shaped this way deliberately: a per-row HOF expression gets inlined
    * by CollapseProject into every band struct (16× recomputation); the
    * aggregate materializes the signature once, and map-side partial mins
    * mean the shuffle carries one 64-long row per document.
    * Returns (id, sig: array<long>).
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
      n: Int, perms: Int): DataFrame =
    signaturesFromShingles(hashedShingles(docs, id, text, n), perms)

  /** Signature aggregation over an existing (id, sh: long) hashed shingle
    * table — one [[MinHashAgg]] typed aggregate (k mins in a single
    * buffer; the k-separate-min spelling costs ~20 s of codegen
    * compilation).
    */
  def signaturesFromShingles(sh: DataFrame, perms: Int): DataFrame =
    sh.groupBy("id")
      .agg(udaf(new MinHashAgg(perms), Encoders.scalaLong)(col("sh")).as("sig"))

  /** Banded signatures for LSH: (id, band, bucket) rows; docs sharing any
    * bucket are candidate near-duplicates. bands × rowsPerBand = perms.
    */
  def minhashBuckets(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    bucketsFromSignatures(
      minhashSignatures(docs, id, text, n, bands * rowsPerBand),
      bands, rowsPerBand)

  /** Banding over an existing (id, sig) signature frame. */
  def bucketsFromSignatures(sig: DataFrame,
      bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
              .as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** LSH candidate pairs (a < b), deduplicated across bands. */
  def minhashCandidates(buckets: DataFrame): DataFrame =
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  /** Exact-Jaccard verification of candidate pairs (id_a, id_b) against a
    * *hashed* shingle table (id, sh: long): keeps pairs whose true Jaccard
    * ≥ threshold. The intersection count ignores shingles with document
    * frequency > maxDF (set sizes still count them) — the same
    * stop-shingle-suppressed jaccard [[jaccardPairs]] computes, so sketch
    * candidates verified here land on identical values.
    *
    * Shape: per-doc shingle sets are collected into arrays and broadcast;
    * each candidate pair is scored map-side with one `array_intersect` —
    * no shuffle is proportional to |candidates| × |shingles per doc|,
    * which is what made the join-per-shingle spelling quadratic-feeling
    * (a sketch like token-SimHash can emit 100k+ candidates on templated
    * corpora). The broadcast build side is docs × rare-shingle arrays; if
    * that outgrows executor memory at extreme scale, `shards` > 1 splits
    * the candidates into that many hash shards and each shard verifies
    * against a broadcast map restricted (left-semi) to the docs its pairs
    * actually reference — per-shard memory shrinks ~linearly in `shards`
    * while the per-shard plan is unchanged. Results are the exact union
    * of the per-shard results (the hash split partitions the pair set),
    * so sharding never changes the output.
    *
    * The default `shards = AutoShards` derives the count from the
    * estimated broadcast payload (docs × overhead + total rare shingles ×
    * bytes-per-entry, one cheap aggregate over the shingle table) against
    * `autoBudgetBytes` — callers no longer have to predict the map size
    * at an unknown scale factor; small corpora resolve to 1 and inherit
    * the unsharded plan unchanged.
    */
  def verifyJaccard(cands: DataFrame, sh: DataFrame,
      threshold: Double, maxDF: Long = Long.MaxValue,
      shards: Int = AutoShards,
      autoBudgetBytes: Long = 256L << 20): DataFrame = {
    require(shards >= 0, s"shards must be >= 0 (0 = auto), got $shards")
    val rare =
      if (maxDF == Long.MaxValue) sh
      else sh.join(
        sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDF).select("sh"),
        "sh")
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val sets = rare.groupBy("id").agg(collect_list("sh").as("shs"))
      .join(sizes, "id")
    val resolved =
      if (shards > 0) shards
      else {
        // one shuffle-free global aggregate over the 8-byte shingle rows
        // (partial-agg'd map-side): exact shingle count + approximate
        // distinct docs — the numbers feed a ceil'd ESTIMATE, so a
        // groupBy-exact doc count would buy nothing but a shuffle.
        // Sized over `sh`, NOT `rare`: callers persist the shingle table
        // (this aggregate reads cache), while `rare` would re-run the
        // doc-frequency groupBy+join once extra just to size a buffer —
        // and counting stop-shingles in only OVERestimates, which for a
        // memory budget errs the safe way
        val st = sh.agg(
          coalesce(approx_count_distinct("id"), lit(0L)).as("docs"),
          coalesce(count(lit(1)), lit(0L)).as("tot")).head()
        chooseShards(st.getLong(0), st.getLong(1), autoBudgetBytes)
      }
    if (resolved == 1) scoreCandidates(cands, sets, threshold)
    else {
      // persist the shared subtrees so the S shard plans don't recompute
      // the groupBys / candidate generation S times
      val setsP = sets.persist()
      val candsP = cands.persist()
      (0 until resolved).map { k =>
        val shardCands = candsP.filter(
          pmod(xxhash64(col("id_a"), col("id_b")), lit(resolved)) === k)
        val ids = shardCands.select(col("id_a").as("id"))
          .unionAll(shardCands.select(col("id_b").as("id"))).distinct()
        scoreCandidates(shardCands,
          setsP.join(ids, Seq("id"), "left_semi"), threshold)
      }.reduce(_ unionAll _)
    }
  }

  /** Sentinel for `shards`: derive the count from the estimated
    * broadcast-map size (see [[chooseShards]]).
    */
  val AutoShards: Int = 0

  /** Shard count for [[verifyJaccard]]'s broadcast verify: estimated
    * payload = docs × ~80 B of per-entry overhead (row object, array
    * header, size column) + total rare shingles × 16 B (8 B long plus
    * array slack), divided by the budget and capped at 64 (beyond that
    * the S-fold plan duplication costs more than the memory it saves —
    * repartition the verify as a shuffle join instead at that scale).
    */
  private[ext] def chooseShards(docs: Long, totalShingles: Long,
      budgetBytes: Long): Int = {
    require(budgetBytes > 0, s"budget must be positive, got $budgetBytes")
    val est = docs * 80L + totalShingles * 16L
    math.min(64L, math.max(1L, (est + budgetBytes - 1) / budgetBytes)).toInt
  }

  /** Map-side exact-Jaccard scoring of candidate pairs against a
    * broadcast (id, shs, n_sh) doc-set frame — the per-shard inner plan
    * of [[verifyJaccard]].
    */
  private[ext] def scoreCandidates(cands: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    scoreAllCandidates(cands, sets).filter(col("jaccard") >= threshold)

  /** [[scoreCandidates]] with the broadcast build side auto-sharded to
    * `budgetBytes` — the same shard loop [[verifyJaccard]] runs, exposed
    * for callers (the incremental index) that assemble their own `sets`
    * frame. Both inputs MUST be persisted by the caller: the shard loop
    * re-reads each S times. Resolves to the unsharded single-broadcast
    * plan when the estimate fits the budget.
    */
  private[ext] def scoreCandidatesAuto(cands: DataFrame, sets: DataFrame,
      threshold: Double, budgetBytes: Long = 256L << 20): DataFrame = {
    val st = sets.agg(
      coalesce(count(lit(1)), lit(0L)).as("docs"),
      coalesce(sum(size(col("shs"))), lit(0L)).as("tot")).head()
    val shards = chooseShards(st.getLong(0), st.getLong(1), budgetBytes)
    if (shards == 1) scoreCandidates(cands, sets, threshold)
    else (0 until shards).map { k =>
      val sc = cands.filter(
        pmod(xxhash64(col("id_a"), col("id_b")), lit(shards)) === k)
      val ids = sc.select(col("id_a").as("id"))
        .unionAll(sc.select(col("id_b").as("id"))).distinct()
      scoreCandidates(sc, sets.join(ids, Seq("id"), "left_semi"), threshold)
    }.reduce(_ unionAll _)
  }

  /** [[scoreCandidates]] without the threshold filter — every candidate
    * pair scored, zero-overlap pairs included (jaccard 0). Drift
    * re-verification needs the unfiltered values on BOTH sides of a df
    * change to report which classification flipped.
    */
  private[ext] def scoreAllCandidates(cands: DataFrame,
      sets: DataFrame): DataFrame = {
    val a = broadcast(sets
      .select(col("id").as("id_a"), col("shs").as("shs_a"), col("n_sh").as("n_a")))
    val b = broadcast(sets
      .select(col("id").as("id_b"), col("shs").as("shs_b"), col("n_sh").as("n_b")))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("common",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dedup: bucket → candidates → exact-Jaccard
    * verification restricted to the candidate pairs.
    */
  def minhashDedup(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.6,
      bands: Int = 16, rowsPerBand: Int = 4,
      maxDF: Long = Long.MaxValue, verifyShards: Int = AutoShards): DataFrame = {
    // One persisted hashed-shingle table feeds the signature aggregation
    // AND the candidate verification — the tokenize/shingle subtree runs
    // once, and only 8-byte keys are ever stored or shuffled.
    val sh = hashedShingles(docs, id, text, n).persist()
    val cands = minhashCandidates(bucketsFromSignatures(
      signaturesFromShingles(sh, bands * rowsPerBand), bands, rowsPerBand))
    verifyJaccard(cands, sh, threshold, maxDF, verifyShards)
  }

  /** Per-document 64-bit SimHash signatures over the token multiset
    * (order-invariant), via the [[SimHashAgg]] typed aggregate.
    */
  def simhashSignatures(docs: DataFrame, id: Column, text: Column): DataFrame =
    simhashSignaturesFromTokens(tokenTable(docs, id, text))

  /** SimHash signatures off an existing (id, toks) token table. */
  def simhashSignaturesFromTokens(toksDf: DataFrame): DataFrame =
    toksDf.select(col("id"), explode(col("toks")).as("tok"))
      .groupBy("id")
      .agg(udaf(new SimHashAgg, Encoders.STRING)(col("tok")).as("sig"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, banded on
    * four 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ some chunk is equal),
    * verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs, id, text)
    val chunks = sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk"),
          call_function("shiftrightunsigned", col("sig"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("ck")))).as("cc"))
      .select(col("id"), col("sig"),
        col("cc.chunk").as("chunk"), col("cc.ck").as("ck"))
      // both sides of the self-join would otherwise recompute the
      // aggregate-HOF simhash expression for every row
      .persist()
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Full SimHash near-dedup: chunk-banded candidate generation (pairs
    * sharing any 8-bit signature chunk, pre-filtered to hamming ≤
    * maxHamming) → exact-Jaccard verification, mirroring [[minhashDedup]].
    * Eight 8-bit chunks pigeonhole-guarantee a candidate for every pair
    * within hamming 7; true jaccard-0.5 pairs USUALLY sit inside that
    * radius but are not guaranteed to (measured: full recall at sf0.01
    * and sf0.1, 92/94 at sf0.001 — token-multiset SimHash is a weak
    * discriminator, the documented contrast with MinHash), which is why
    * the gate audits recall against the exact pair set instead of
    * claiming equality. The hamming pre-filter keeps the expensive
    * shingle-join verify off random chunk collisions (a random pair sits
    * at hamming ≈ 32 ± 4; P(≤ 8) is negligible).
    *
    * '''Prefer [[minhashDedup]] for Jaccard-threshold dedup.''' SimHash's
    * banding is tuned to hamming space, not Jaccard space, and on
    * templated corpora it is a weak discriminator: at sf0.1 it emits
    * ~200k candidate pairs where MinHash emits ~800 for the same final
    * recall (measured, SCALE.md), making this the slowest dedup gate at
    * every scale factor — cost intrinsic to the sketch, not the plan.
    * Reach for SimHash only when the similarity you want IS hamming
    * distance on bit signatures (e.g. matching an external
    * SimHash-fingerprint corpus).
    */
  def simhashDedup(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5, maxHamming: Int = 8,
      maxDF: Long = Long.MaxValue, verifyShards: Int = AutoShards): DataFrame = {
    // one tokenize pass feeds both the signature and verification branches
    val toksDf = tokenTable(docs, id, text).persist()
    val sh = hashedShinglesFromTokens(toksDf, n).persist()
    verifyJaccard(simhashCandidatesFromTokens(toksDf, maxHamming),
      sh, threshold, maxDF, verifyShards)
  }

  /** Banded SimHash candidate pairs (pre-verification): pairs sharing any
    * 8-bit signature chunk, hamming-filtered. Exposed separately so a
    * recall audit can compare the candidate set against the exact pair
    * set without paying for verification twice.
    */
  def simhashCandidates(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int = 8): DataFrame =
    simhashCandidatesFromTokens(tokenTable(docs, id, text), maxHamming)

  private[ext] def simhashCandidatesFromTokens(toksDf: DataFrame,
      maxHamming: Int): DataFrame = {
    val sigs = simhashSignaturesFromTokens(toksDf)
    val chunks = sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(7)),
        c => struct(c.as("chunk"),
          call_function("shiftrightunsigned", col("sig"), c * 8)
            .bitwiseAND(lit(0xFFL)).as("ck")))).as("cc"))
      .select(col("id"), col("sig"),
        col("cc.chunk").as("chunk"), col("cc.ck").as("ck"))
      .persist()
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Connected components over near-dup pairs — the step that turns pair
    * lists into dedup decisions (keep one doc per component, not per pair).
    *
    * Min-label propagation ("hash-to-min"): every node starts labeled with
    * its own id; each round a node takes the min of its label and its
    * neighbors' labels; fixpoint when the label sum stops decreasing
    * (labels only ever decrease, so the sum is a monotone convergence
    * witness — no join against the previous iteration needed). Each round
    * shuffles only (id, label) pairs: at 100 TB the per-round traffic is
    * 16 bytes × |V|+|E|, independent of document size. Rounds ≈ component
    * diameter; near-dup components are near-cliques, so 2-3 rounds in
    * practice (the alternating large-star/small-star variant gets
    * O(log n) worst case and drops in here if ever needed).
    *
    * `nodes` must expose `id`; `pairs` must expose `id_a`,`id_b`.
    * Returns (id, cluster) with cluster = min id of the component.
    */
  def dupClusters(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 25, parallelism: Option[Int] = None): DataFrame = {
    // each round joins edges(t) ⋈ labels(id): pre-partitioning the cached
    // edge list by the join key makes every round reuse that layout, and
    // an explicit (small) partition count stops a hand-full-of-MB graph
    // from paying 32-task scheduling overhead per round at test scale —
    // at real scale leave it None and size via spark.sql.shuffle.partitions
    val edges0 = pairs.select(col("id_a").as("s"), col("id_b").as("t"))
      .unionAll(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
    val edges = parallelism.fold(edges0)(n => edges0.repartition(n, col("t")))
      .persist()
    // seed with min(own, min neighbor) — the first propagation round
    // fused into initialization, one fewer distributed iteration
    var labels = nodes
      .join(edges.groupBy("s").agg(min("t").as("nmin")),
        nodes("id") === col("s"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nmin"), col("id"))).as("cluster"))
      .persist()
    var prevSum = labels.agg(coalesce(sum("cluster"), lit(0L))).head().getLong(0)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = edges.join(labels, edges("t") === labels("id"))
        .select(col("s").as("id"), col("cluster"))
      // persist() doubles as the lineage cut — without it the plan
      // deepens by two joins per round and re-executes from round 0
      val next = labels.unionAll(prop)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .persist()
      val s = next.agg(coalesce(sum("cluster"), lit(0L))).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    edges.unpersist()
    labels
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the O(log n)-round worst-case fallback to
    * [[dupClusters]]'s plain min-label propagation, for graphs whose
    * component diameter is large (propagation needs diameter rounds; the
    * star operations contract paths exponentially).
    *
    * Edge set is kept canonically oriented (u > v, no self-loops,
    * distinct). Each round:
    *   - large-star: every node's strictly-larger neighbors re-attach to
    *     the minimum of its closed neighborhood;
    *   - small-star: every node's smaller-or-equal neighbors (and the
    *     node itself) re-attach to that minimum.
    * Both emit only larger→smaller edges, so the orientation invariant is
    * maintained for free. Fixpoint = the edge set is a star per component
    * centered on the component min; detected by an order-independent
    * fingerprint (count, sum of per-edge xxhash64) going stable. Per-round
    * shuffle is (u, v) long pairs only — 16 bytes × |E|, same traffic
    * class as a propagation round, just O(log n) of them worst-case.
    *
    * `nodes` must expose `id`; `pairs` must expose `id_a`,`id_b`.
    * Returns (id, cluster) with cluster = min id of the component.
    */
  def dupClustersStar(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 50, parallelism: Option[Int] = None): DataFrame =
    dupClustersStarWithRounds(nodes, pairs, maxIter, parallelism)._1

  /** [[dupClustersStar]] plus the number of large-star/small-star rounds
    * it took to converge — exposed for the O(log n) convergence property
    * test.
    */
  private[graft] def dupClustersStarWithRounds(nodes: DataFrame,
      pairs: DataFrame, maxIter: Int = 50,
      parallelism: Option[Int] = None): (DataFrame, Int) = {
    val canon0 = pairs.select(
        greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // eager localCheckpoint, NOT persist: each star round's plan references
    // the previous round's several times (und doubles it, ls/ss join it
    // again), so without a hard lineage cut the analyzed plan grows
    // exponentially with rounds and planning itself OOMs the driver.
    // localCheckpoint materializes to executor-local storage and replaces
    // the plan with the checkpointed RDD; dropped references are GC'd by
    // the context cleaner.
    var edges = parallelism.fold(canon0)(n => canon0.repartition(n, col("u")))
      .localCheckpoint(true)

    // order-independent set fingerprint: (|E|, XOR of xxhash64(u,v)) —
    // XOR instead of sum because ANSI mode makes a full-range long sum
    // overflow-throw; the edge set is distinct, so XOR is a faithful set
    // hash and a silent change needs a 2^-64 collision
    def fp(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = fp(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      // large-star: neighbors x > u re-attach to m(u) = min closed nbhd
      val und = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = und.groupBy("u")
        .agg(least(col("u"), min(col("v"))).as("m"))
        .withColumnRenamed("u", "c")
      // no distinct here: duplicate (u,m) rows are absorbed by ss's
      // groupBy/distinct below, and skipping the extra shuffle per round
      // matters more than the temporarily larger row set (≤ 2|E|)
      val ls = und.join(lsMin, und("u") === col("c"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: all smaller neighbors (and u itself) attach to min(v)
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
      val next = ss.localCheckpoint(true)
      val cur = fp(next)
      edges = next
      converged = cur == prev
      prev = cur
      rounds += 1
    }
    // at fixpoint each non-min node carries exactly (u, componentMin);
    // min(v) also tolerates a maxIter cutoff mid-contraction
    val stars = edges.groupBy("u").agg(min(col("v")).as("cl"))
    val labels = nodes
      .join(stars, nodes("id") === col("u"), "left")
      .select(col("id"), coalesce(col("cl"), col("id")).as("cluster"))
    (labels, rounds)
  }

  /** INCREMENTAL connected components: fold a delivery of new nodes and
    * new edges into an existing min-label clustering without re-running
    * the batch — the clustering-maintenance op behind a streaming dedup
    * pipeline (the incremental index emits the delta's near-dup PAIRS;
    * this turns them back into cluster labels).
    *
    * Only the work the delta causes is done: the new edges' endpoints
    * name the AFFECTED old clusters (a delta-bounded set — broadcast);
    * those clusters' members re-enter contraction as depth-1 star edges
    * (member → old label, which is a member id, so min-label semantics
    * survive), together with the delta's nodes and edges; every
    * untouched label row carries over verbatim. Cost ∝ delta + affected
    * components' membership, never the corpus — at 100 TB a daily
    * delivery touches a sliver of the graph, and relabeling everything
    * to merge that sliver is the scale-killer this avoids. With labels
    * stored cluster-bucketed the member fetch is additionally a pruned
    * read.
    *
    * Exactness (pinned in DedupSpec): equals [[dupClustersStar]] over
    * the full accumulated graph, because the old labeling is a lossless
    * one-round contraction of the old edges, and contraction composes.
    * `prevLabels`: (id, cluster) from a prior batch/incremental run;
    * edge endpoints must be drawn from `prevLabels.id ∪ newNodes.id`.
    */
  def incrementalComponents(prevLabels: DataFrame, newNodes: DataFrame,
      newEdges: DataFrame, maxIter: Int = 50,
      parallelism: Option[Int] = None): DataFrame = {
    // the delta edges feed three subplans (touched set twice, contraction
    // once) and typically come from a just-run pair generation — eager
    // localCheckpoint materializes that delta-sized work once instead of
    // re-deriving it per subplan. `affected` is delta-bounded and feeds
    // two joins; same treatment. prevLabels stays lazy: at scale it is a
    // stored table whose re-read is cheaper than a forced copy.
    val edges = newEdges.select("id_a", "id_b").localCheckpoint(true)
    val touched = edges.select(col("id_a").as("id"))
      .unionAll(edges.select(col("id_b").as("id"))).distinct()
    val affected = prevLabels.join(touched, "id")
      .select("cluster").distinct().localCheckpoint(true)
    val members = prevLabels.join(broadcast(affected), "cluster")
    val starEdges = members
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("id_a"), col("cluster").as("id_b"))
    val subNodes = members.select("id")
      .unionAll(newNodes.select("id")).distinct()
    val relabeled = dupClustersStar(subNodes,
      starEdges.unionAll(edges), maxIter, parallelism)
    prevLabels.join(broadcast(affected), Seq("cluster"), "left_anti")
      .select("id", "cluster")
      .unionAll(relabeled.select("id", "cluster"))
  }
}
