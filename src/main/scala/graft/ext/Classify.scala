package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counting classifiers for corpus curation. The CCNet / fastText-style
  * curation stack gates documents with cheap supervised classifiers —
  * language ID, "is this Wikipedia-like" quality, domain routing — and
  * the workhorse there is multinomial Naive Bayes (McCallum & Nigam,
  * AAAI-98 workshop on text categorization): training is NOTHING BUT
  * counting, so on Spark the whole learner is two map-side-combined
  * aggregations over the labeled corpus, and scoring is a
  * broadcast-bounded join. That makes NB the one classifier family that
  * trains comfortably INSIDE the engine at 100 TB — no parameter server,
  * no iterative optimizer, one shuffle keyed by (label, term).
  *
  * Scale shape: the likelihood table is (vocab × labels) — big but
  * corpus-logarithmic; it joins the scoring tf relation keyed by term
  * (hash shuffle, never corpus²). The label set itself is tiny and
  * broadcast. Scores are plain log-space sums, so every stage stays in
  * whole-stage codegen.
  *
  * Reference behavior: quality/language gating of
  * `/root/reference/pipeline/assets/ingest.py`-style corpora before
  * aggregation; the reference has no learner, so this follows the public
  * CCNet recipe (Wenzek et al., LREC'20) re-expressed relationally.
  */
object Classify {

  /** A trained multinomial NB model, kept as DataFrames so it can be
    * persisted, broadcast, or joined without leaving the engine.
    *
    * @param priors      (label, log_prior) — ln(docs_label / docs_total)
    * @param likelihood  (label, term, log_like) — add-one smoothed
    *                    ln((cnt+1)/(tot_label+V))
    * @param oov         (label, log_oov) — the smoothing floor
    *                    ln(1/(tot_label+V)) for terms unseen in training
    */
  final case class NbModel(priors: DataFrame, likelihood: DataFrame,
      oov: DataFrame)

  /** The model's SUFFICIENT STATISTICS — plain summable counts, the
    * same partial-aggregate discipline as the BM25 lexicon: two
    * `NbCounts` merge by adding, so the learner is incrementally
    * updatable (new labeled batches fold in without touching old data),
    * persistable as parquet, and distributable as partials that never
    * re-read the corpus.
    *
    * @param termCounts (label, term, cnt) token counts
    * @param docCounts  (label, n_docs) document counts
    */
  final case class NbCounts(termCounts: DataFrame, docCounts: DataFrame)

  /** One pass of counting over a labeled batch — the entire "training"
    * cost. Two map-side-combined aggregations, nothing else.
    */
  def nbCount(train: DataFrame, label: Column, text: Column): NbCounts = {
    val tf = train
      .select(label.as("label"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .filter(col("term") =!= "")
      .groupBy("label", "term").agg(count(lit(1)).as("cnt"))
    val docs = train.select(label.as("label"))
      .groupBy("label").agg(count(lit(1)).as("n_docs"))
    NbCounts(tf, docs)
  }

  /** Merge count partials by summation — associative and commutative,
    * so batches fold in any order: `model(merge(a, b)) ≡
    * model(count(batchA ∪ batchB))` exactly.
    */
  def nbMerge(a: NbCounts, b: NbCounts): NbCounts = NbCounts(
    a.termCounts.unionByName(b.termCounts)
      .groupBy("label", "term").agg(sum("cnt").as("cnt")),
    a.docCounts.unionByName(b.docCounts)
      .groupBy("label").agg(sum("n_docs").as("n_docs")))

  /** Derive the scoring model (smoothed log-likelihoods, OOV floor,
    * priors) from counts. Vocabulary size and per-label token totals
    * come from the count tables — the corpus is never re-read.
    */
  def nbFromCounts(counts: NbCounts): NbModel = {
    val tf = counts.termCounts
    val totals = tf.groupBy("label").agg(sum("cnt").as("tot"))
    // 1-row vocab-size frame: kept in-plan (broadcast) so training has
    // no driver action and the model stays a pure lineage
    val vocab = tf.select(col("term")).distinct()
      .agg(count(lit(1)).as("v"))
    val docCounts = counts.docCounts
    val priors = docCounts
      .crossJoin(broadcast(docCounts.agg(sum("n_docs").as("n_total"))))
      .select(col("label"),
        log(col("n_docs").cast("double") / col("n_total")).as("log_prior"))
    val withTot = tf.join(totals, "label").crossJoin(broadcast(vocab))
    val likelihood = withTot.select(col("label"), col("term"),
      log((col("cnt") + lit(1)).cast("double") /
        (col("tot") + col("v"))).as("log_like"))
    val oov = totals.crossJoin(broadcast(vocab))
      .select(col("label"),
        log(lit(1.0) / (col("tot") + col("v"))).as("log_oov"))
    NbModel(priors, likelihood, oov)
  }

  /** Train multinomial NB with add-one (Laplace) smoothing: count one
    * batch, derive the model. See [[nbCount]]/[[nbMerge]] for the
    * incremental path.
    */
  def nbTrain(train: DataFrame, label: Column, text: Column): NbModel =
    nbFromCounts(nbCount(train, label, text))

  /** Persist count partials as parquet (the model's durable form) and
    * load them back — counts are plain relations, so the lakehouse
    * machinery (manifests, partitioned appends) applies unchanged if
    * needed; this is the minimal two-table spelling.
    */
  def saveCounts(counts: NbCounts, dir: String): Unit = {
    counts.termCounts.write.mode("overwrite").parquet(s"$dir/term_counts")
    counts.docCounts.write.mode("overwrite").parquet(s"$dir/doc_counts")
  }

  def loadCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): NbCounts = NbCounts(
    spark.read.parquet(s"$dir/term_counts"),
    spark.read.parquet(s"$dir/doc_counts"))

  /** Score every (document, label) pair: Σ_t tf·log P(t|label) +
    * log P(label), with unseen terms taking the label's smoothing floor.
    * The document tf relation is crossed with the (tiny, broadcast)
    * label set, then left-joined against the likelihood table keyed by
    * (term, label) — candidate volume is doc-tokens × labels, never
    * corpus × vocab. Returns (id, label, score).
    */
  def nbScores(model: NbModel, docs: DataFrame, id: Column,
      text: Column): DataFrame = {
    val tf = docs
      .select(id.as("id"), explode(TextAnalysis.tokens(text)).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val labels = model.priors.join(model.oov, "label")
    tf.crossJoin(broadcast(labels))
      .join(model.likelihood, Seq("label", "term"), "left")
      .groupBy("id", "label")
      .agg((sum(col("tf") *
          coalesce(col("log_like"), col("log_oov"))) +
        first(col("log_prior"))).as("score"))
  }

  /** Argmax prediction with a runner-up margin: (id, pred, score,
    * margin). Ordering uses the 6-decimal-rounded score (the engine's
    * cross-engine float idiom) with label as the deterministic
    * tie-break; margin is the rounded raw-score gap to the runner-up
    * (0.0 when there is only one label).
    */
  def nbPredict(model: NbModel, docs: DataFrame, id: Column,
      text: Column): DataFrame = {
    val sc = nbScores(model, docs, id, text)
    val w = Window.partitionBy("id")
      .orderBy(round(col("score"), 6).desc, col("label"))
    val ranked = sc.select(col("id"), col("label"), col("score"),
      row_number().over(w).as("rn"))
    val top = ranked.filter(col("rn") === 1)
      .select(col("id"), col("label").as("pred"), col("score"))
    val second = ranked.filter(col("rn") === 2)
      .select(col("id"), col("score").as("score2"))
    top.join(second, Seq("id"), "left")
      .select(col("id"), col("pred"),
        round(col("score"), 6).as("score"),
        round(coalesce(col("score") - col("score2"), lit(0.0)), 6)
          .as("margin"))
  }
}
