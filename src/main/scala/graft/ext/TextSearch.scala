package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus: build / persist an
  * inverted index, then score short queries with Okapi BM25 and return
  * per-query top-k. In a training-data pipeline this is the retrieval
  * primitive behind benchmark decontamination ("which corpus documents
  * match this eval question"), targeted data selection, and
  * quality-by-retrievability audits — the sparse complement of the dense
  * ANN family ([[EmbeddingSearch]], [[IvfIndex]], [[PqIndex]]).
  *
  * Scale shape: the index is three relations off ONE token explode —
  * postings (term, id, tf, dl), lexicon (term, df), and a one-row stats
  * frame — all corpus-token-linear, built with two hash aggregations and
  * no joins against the corpus afterwards (document length is
  * DENORMALIZED into the postings, the standard impact-index trick, so
  * scoring never re-joins a corpus-sized side). A search streams the
  * postings through one broadcast-hash join against the (tiny) exploded
  * query terms; df and global stats ride along as broadcasts; the only
  * shuffle is the final (query, doc) partial-aggregated groupBy, whose
  * size is bounded by matched postings, not the corpus. Saved indexes
  * are hash-bucketed by term so a search prunes to the query terms'
  * buckets at the file index — touching 100 TB of postings is never
  * required to answer an 8-term query.
  */
object TextSearch {

  /** postings: (term, id, tf, dl); lexicon: (term, df);
    * stats: one row (n_docs, avgdl).
    */
  final case class Index(postings: DataFrame, lexicon: DataFrame,
      stats: DataFrame)

  /** Build the in-memory index relations from a corpus. One explode
    * feeds everything; `dl` is folded back into the postings via the
    * same (id)-keyed aggregate that computes it. `materialize = true`
    * persists the shared (id, term, tf) aggregate so the four derived
    * relations reuse one tokenize pass instead of re-exploding the
    * corpus each — use it when building and consuming in one job
    * (searching in place, or [[save]]); the session cache owns the
    * entry, so drop it via `spark.catalog.clearCache()` or by saving
    * and [[load]]ing instead for long-lived sessions.
    */
  def buildIndex(docs: DataFrame, id: Column, text: Column,
      materialize: Boolean = false): Index = {
    val tf0 = docs.select(id.as("id"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val tf = if (materialize) tf0.persist() else tf0
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val postings = tf.join(dl, "id")
    val lexicon = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("dl_sum"))
      .withColumn("avgdl", col("dl_sum").cast("double") / col("n_docs"))
    Index(postings, lexicon, stats)
  }

  /** Term → storage bucket (stable across save/search). */
  private def bucketOf(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** Persist the index hash-bucketed by term: postings and lexicon are
    * written `partitionBy(bucket)`, so a search that knows its query
    * terms reads only their buckets (partition pruning at the file
    * index — the on-disk analogue of a posting-list seek).
    *
    * The lexicon and corpus stats are stored as SUMMABLE PARTIALS
    * (per-delivery df counts; per-delivery (n_docs, dl_sum) rows) and
    * aggregated on [[load]] — the same append-only-partials design as
    * the dedup index's df table, which is what lets [[appendDocs]]
    * admit a delivery without rewriting history. A long-lived index
    * accumulating many deliveries re-sums more partials per load; the
    * remedy is the usual compaction rewrite, on the cadence appends
    * warrant.
    */
  def save(ix: Index, path: String, buckets: Int = 64): Unit = {
    writeDelta(ix, path, buckets, "overwrite")
  }

  /** Admit one delivery to a saved index: encode the delta alone and
    * append its postings, df partials, and stats partial — the existing
    * corpus is never read. Queries issued after the append see exact
    * corpus-wide df and avgdl (partials sum on load), identical to a
    * from-scratch rebuild over the union.
    */
  def appendDocs(spark: SparkSession, path: String, newDocs: DataFrame,
      id: Column, text: Column, buckets: Int = 64): Unit = {
    writeDelta(buildIndex(newDocs, id, text, materialize = true), path,
      buckets, "append")
  }

  private def writeDelta(ix: Index, path: String, buckets: Int,
      mode: String): Unit = {
    ix.postings.withColumn("bucket", bucketOf(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket")
      .parquet(s"$path/postings")
    ix.lexicon.withColumn("bucket", bucketOf(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket")
      .parquet(s"$path/lexicon")
    ix.stats.select("n_docs", "dl_sum").coalesce(1)
      .write.mode(mode).parquet(s"$path/stats")
  }

  /** Compact an appended index: df partials are SUMMED to one row per
    * term, stats partials to one row, and postings rewritten clustered —
    * every delivery's small files collapse into one tight set per
    * bucket. Pure layout rewrite (answers unchanged by construction,
    * pinned in TextSearchSpec); same atomic rewrite-then-swap as
    * [[DedupIndex.compact]]. Run on the cadence appends warrant.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val tmp = s"$path.compact"
    spark.read.parquet(s"$path/postings").repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$tmp/postings")
    spark.read.parquet(s"$path/lexicon")
      .groupBy("bucket", "term").agg(sum("df").as("df"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$tmp/lexicon")
    spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs").as("n_docs"), sum("dl_sum").as("dl_sum"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(s"$path.old")
    fs.delete(bak, true)
    if (!fs.rename(old, bak) ||
        !fs.rename(new org.apache.hadoop.fs.Path(tmp), old))
      throw new java.io.IOException(s"compact swap failed for $path")
    fs.delete(bak, true)
    spark.catalog.refreshByPath(path)
    ()
  }

  /** Sum the lexicon/stats partials back into search-ready relations. */
  private def fromPartials(postings: DataFrame, lexParts: DataFrame,
      statsParts: DataFrame): Index = Index(
    postings,
    lexParts.groupBy("term").agg(sum("df").as("df")),
    statsParts.agg(sum("n_docs").as("n_docs"), sum("dl_sum").as("dl_sum"))
      .withColumn("avgdl", col("dl_sum").cast("double") / col("n_docs")))

  def load(spark: SparkSession, path: String): Index = fromPartials(
    spark.read.parquet(s"$path/postings").drop("bucket"),
    spark.read.parquet(s"$path/lexicon").drop("bucket"),
    spark.read.parquet(s"$path/stats"))

  /** Exact phrase occurrences via positional postings: a phrase of
    * terms t0..t(L-1) occurs at `start` iff token `start+i` equals t_i
    * for every i. One aligned-start join finds ALL occurrences of ALL
    * phrases at once — each corpus (pos, term) row that matches some
    * phrase term votes for the start `pos − i` it would imply, and a
    * start winning all L distinct votes is an occurrence. No iterative
    * per-term self-joins, so phrase length only widens the broadcast,
    * never deepens the plan.
    *
    * Scale shape: the positional explode streams the corpus once;
    * the phrase-term frame is tiny → broadcast; the vote groupBy is
    * keyed (phrase, doc, start), bounded by matched positions, not the
    * corpus. Returns (phrase_id, id, n_occ), one row per document
    * containing the phrase at least once.
    */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
      phrases: DataFrame, phraseId: Column, phraseTerms: Column)
      : DataFrame = {
    val pos = docs.select(id.as("id"),
      posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "term")))
    val pt = phrases.select(phraseId.as("phrase_id"),
      posexplode(phraseTerms).as(Seq("i", "term")))
    val phLen = phrases.select(phraseId.as("phrase_id"),
      size(phraseTerms).as("len"))
    pos.join(broadcast(pt), "term")
      .withColumn("start", col("pos") - col("i"))
      .groupBy("phrase_id", "id", "start")
      .agg(countDistinct("i").as("n_votes"))
      .join(broadcast(phLen), "phrase_id")
      .filter(col("n_votes") === col("len"))
      .groupBy("phrase_id", "id")
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Top-k BM25 per query. `queries` carries an ARRAY of query terms
    * per row (tokenize upstream — [[TextAnalysis.tokens]] matches the
    * index's tokenization); duplicates within a query are ignored, as
    * is any term absent from the corpus. Scores use the Robertson/
    * Lucene idf `ln(1 + (N − df + ½)/(df + ½))` (always ≥ 0) and the
    * usual saturated tf with length normalization. Ranking orders by
    * the 6-decimal-ROUNDED score with doc id as tie-break so an
    * oracle engine ranks identical values identically.
    *
    * Returns (query_id, rn, id, matched, score), rn ≤ k.
    *
    * `maxDF` suppresses query terms whose document frequency exceeds it
    * — the stop-term discipline that matters at 100 TB, where a single
    * ubiquitous term ("the") otherwise makes the matched-postings join
    * corpus-sized for near-zero idf contribution. Same knob as the
    * dedup family's stop-shingle cap; `matched` counts only surviving
    * terms, mirroring how the dedup jaccard ignores suppressed
    * shingles.
    */
  def search(ix: Index, queries: DataFrame, qid: Column, qterms: Column,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDF: Long = Long.MaxValue): DataFrame = {
    val qt = queries.select(qid.as("query_id"),
      explode(array_distinct(qterms)).as("term"))
    // lexicon streams past the broadcast query terms; the annotated
    // (term, query_id, df) result is itself tiny → broadcast into the
    // postings scan. Postings are never shuffled.
    val lex =
      if (maxDF == Long.MaxValue) ix.lexicon
      else ix.lexicon.filter(col("df") <= maxDF)
    val qdf = broadcast(lex.join(broadcast(qt), "term"))
    val contrib =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1 * (1.0 - b)) +
          lit(k1 * b) * col("dl") / col("avgdl"))
    val scored = ix.postings.join(qdf, "term")
      .crossJoin(broadcast(ix.stats))
      .groupBy("query_id", "id")
      .agg(sum(contrib).as("score_raw"), count(lit(1)).as("matched"))
      .withColumn("score", round(col("score_raw"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("id"), col("matched"),
        col("score"))
  }

  /** Search a SAVED index with bucket pruning: the distinct query terms
    * are collected (bounded by the query batch — queries are short by
    * construction), their buckets become literal partition filters, and
    * the postings/lexicon scans read only those buckets. This is the
    * 100 TB path: the scan cost is the matched posting lists, not the
    * index.
    */
  def searchSaved(spark: SparkSession, path: String, queries: DataFrame,
      qid: Column, qterms: Column, k: Int, k1: Double = 1.2,
      b: Double = 0.75, buckets: Int = 64): DataFrame = {
    // bucket ids come from Spark's own xxhash64 over the term batch (one
    // tiny job) — never a reimplementation that could drift from the
    // writer's hash
    val wanted = queries
      .select(explode(array_distinct(qterms)).as("term")).distinct()
      .select(bucketOf(col("term"), buckets).as("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // bucket is a pure function of term, so pruning the partials BEFORE
    // the df re-sum is exact — a term's every partial lives in one bucket
    val ix = fromPartials(
      spark.read.parquet(s"$path/postings")
        .filter(col("bucket").isin(wanted: _*)).drop("bucket"),
      spark.read.parquet(s"$path/lexicon")
        .filter(col("bucket").isin(wanted: _*)).drop("bucket"),
      spark.read.parquet(s"$path/stats"))
    search(ix, queries, qid, qterms, k, k1, b)
  }
}
