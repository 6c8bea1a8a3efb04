package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for approximate nearest neighbor — the
  * per-dimension affine codec used as the standard compression baseline in
  * billion-scale ANN systems (Johnson, Douze, Jégou, "Billion-scale
  * similarity search with GPUs", 2017 — Faiss's `SQ8` index family):
  * each dimension of the unit-normalized vector is mapped to an 8-bit
  * level between the corpus-wide per-dimension min and max,
  * `code_i = floor(255·(x_i − lo_i)/(hi_i − lo_i) + 0.5)`, shrinking a
  * 64-dim float64 vector from 512 B to 64 B with no codebook training at
  * all — the "model" is just 2·d doubles.
  *
  * A query scores the corpus in the compressed domain asymmetrically
  * (exact query against dequantized corpus, the ADC idea of Jégou et al.
  * 2011), shortlists, then re-ranks the shortlist with exact cosine.
  *
  * Scale shape: `train` is ONE distributed aggregate (a d-dim min/max
  * buffer per partition, associative merge — same plan as any partial
  * aggregate); `encode` is a map-side expression against the broadcast
  * 2·d-double range literals; `search` streams the codes once per query
  * batch with the (tiny) query side broadcast, and the exact re-rank
  * touches only the per-query shortlist. Complements [[IvfIndex]] (prunes
  * WHICH rows are scored) and [[PqIndex]] (trained subspace codes,
  * higher ratio): SQ8 is the no-training member of the family — rebuild
  * after drift is a single pass, and at 100 TB the codes table is ~1/8 of
  * the raw corpus, streamed instead of it.
  *
  * Everything here is deterministic double arithmetic in a fixed fold
  * order (`floor(x+0.5)` rather than `round`, sequential-fold dot
  * products), which is what lets the q_sq_topk gate hash-match a DuckDB
  * oracle that mirrors the whole codec end to end — quantization error
  * included — rather than settling for a recall-only check.
  */
object SqIndex {

  /** `lo`/`hi`: per-dimension corpus min/max in the unit-normalized
    * space. `encoded`: (vec_id, v, nrm, code: array<int> of 0..255).
    */
  final case class Model(lo: Seq[Double], hi: Seq[Double], encoded: DataFrame)

  /** Unit-normalized copy of `v` (the codec lives in the normalized
    * space: squared-L2 / inner-product ranking of unit vectors is cosine
    * ranking, so quantization error never competes with magnitude).
    */
  private def unit(v: Column, nrm: Column): Column =
    transform(v, x => x / sqrt(nrm))

  /** Per-dimension (min, max) over the unit-normalized corpus — one
    * associative vector aggregate via `Summarizer`, no explode.
    */
  def train(embs: DataFrame): (Seq[Double], Seq[Double]) = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    val p = EmbeddingSearch.prepared(embs)
    require(!p.isEmpty, "cannot train SQ ranges on an empty corpus")
    val row = p
      .select(array_to_vector(unit(col("v"), col("nrm"))).as("u"))
      .select(Summarizer.min(col("u")).as("lo"),
        Summarizer.max(col("u")).as("hi"))
      .head()
    (row.getAs[org.apache.spark.ml.linalg.Vector]("lo").toArray.toSeq,
      row.getAs[org.apache.spark.ml.linalg.Vector]("hi").toArray.toSeq)
  }

  def build(embs: DataFrame): Model = {
    val (lo, hi) = train(embs)
    Model(lo, hi, encode(lo, hi, embs))
  }

  /** Map-side encode against the broadcast ranges (the delta path for
    * appends — no retraining; a constant dimension, hi = lo, encodes to
    * 0 and decodes back to exactly `lo`). The corpus-sized arithmetic is
    * the codegen'd [[graft.functions.SqEncode]] expression; the HOF
    * spelling lives in [[hofCode]] as the equivalence-test reference
    * (interpreted lambdas have no place on a once-per-corpus-row path).
    */
  def encode(lo: Seq[Double], hi: Seq[Double], embs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    EmbeddingSearch.prepared(embs).withColumn("code",
      Bridge.toColumn(graft.functions.SqEncode(
        Bridge.toExpr(col("v")), lo.toArray, hi.toArray)))
  }

  /** Interpreted HOF spelling of the encoder — kept as the reference
    * implementation for SqIndexSpec's codegen-equivalence test.
    */
  private[graft] def hofCode(lo: Seq[Double], hi: Seq[Double]): Column = {
    val (loL, hiL) = (typedLit(lo), typedLit(hi))
    transform(unit(col("v"), col("nrm")), (x, i) => {
      val l = element_at(loL, i + 1)
      val h = element_at(hiL, i + 1)
      floor(lit(255.0) * (x - l) / greatest(h - l, lit(1e-12)) + lit(0.5))
        .cast("int")
    })
  }

  def append(model: Model, newEmbs: DataFrame): Model =
    model.copy(encoded =
      model.encoded.unionByName(encode(model.lo, model.hi, newEmbs)))

  /** Persist: the 2·d range doubles as one tiny parquet, the codes as a
    * (vec_id, code) table. As with [[PqIndex.save]], vectors are not
    * duplicated into the index — the corpus parquet stays the source of
    * truth and [[load]] re-attaches it for the exact re-rank.
    */
  def save(model: Model, path: String, retainVersions: Int = 2): Unit = {
    val spark = model.encoded.sparkSession
    IndexStore.withLock(spark, path) {
      val seg = IndexStore.newSegmentName()
      IndexStore.writeAll(
        () => writeRanges(model, path, seg),
        () => model.encoded.select("vec_id", "code")
          .write.parquet(s"$path/$seg/codes"))
      // tagged "train": this commit carries freshly-fit ranges — what
      // [[stats]]'s codec_age counts from ([[PqIndex.save]]'s contract)
      IndexStore.publishReplace(spark, path, seg,
        Seq("ranges", "codes"), retainVersions, op = "train")
      ()
    }
  }

  private def writeRanges(model: Model, path: String, seg: String): Unit = {
    val spark = model.encoded.sparkSession
    import spark.implicits._
    model.lo.zip(model.hi).zipWithIndex
      .map { case ((l, h), i) => (i, l, h) }
      .toDF("dim", "lo", "hi")
      .coalesce(1).write.parquet(s"$path/$seg/ranges")
  }

  /** Append-only incremental encode of new vectors into a saved index
    * (one appended segment; an empty delivery publishes nothing).
    */
  def saveAppend(model: Model, newEmbs: DataFrame, path: String): Unit = {
    val spark = model.encoded.sparkSession
    val delta = encode(model.lo, model.hi, newEmbs).select("vec_id", "code")
    if (!delta.isEmpty) IndexStore.withLock(spark, path) {
      val seg = IndexStore.newSegmentName()
      delta.write.parquet(s"$path/$seg/codes")
      IndexStore.publishAppend(spark, path, seg, Seq("codes"))
      ()
    }
  }

  /** Retract vectors: tombstone segment appended, layout untouched —
    * same contract as [[IvfIndex.deleteVecs]] ([[load]] masks,
    * [[compact]] applies physically, deletes never double-apply).
    */
  def deleteVecs(spark: SparkSession, path: String, ids: DataFrame,
      idCol: Column): Unit =
    IndexStore.tombstoneIds(spark, path, ids, idCol, "codes")

  /** Compact: tombstones apply physically and per-delivery code files
    * collapse into one set; publishes as a manifest pointer swap.
    */
  def compact(spark: SparkSession, path: String,
      retainVersions: Int = 2): Unit =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val seg = IndexStore.newSegmentName()
      IndexStore.writeAll(
        () => IndexStore.liveRows(snap, "codes")
          .write.parquet(s"$path/$seg/codes"),
        () => snap.read("ranges").get.coalesce(1)
          .write.parquet(s"$path/$seg/ranges"))
      IndexStore.publishReplace(spark, path, seg,
        Seq("ranges", "codes"), retainVersions, op = "compact")
      ()
    }

  /** Size-tiered compaction ([[IvfIndex.maybeCompact]]'s contract). */
  def maybeCompact(spark: SparkSession, path: String,
      maxSegments: Int): Boolean = {
    val due = IndexStore.segmentCount(spark, path) > maxSegments
    if (due) compact(spark, path)
    due
  }

  /** CODEC REFRESH ([[PqIndex.retrain]]'s contract for the affine
    * codec): re-fit the per-dimension ranges over the LIVE corpus,
    * re-encode the live rows into a fresh segment, publish as an
    * atomic swap tagged "train" with the previous version retained
    * ([[loadAt]] = rollback). Frozen ranges clip drifting data —
    * a dimension that moved outside [lo, hi] saturates at 0/255 and
    * its quantization error stops being bounded by (hi−lo)/255; the
    * refresh restores the trained-on-what-arrives posture at the cost
    * of one aggregate + one distributed encode. Post-retrain answers
    * ≡ a from-scratch [[build]] over the live corpus.
    */
  def retrain(spark: SparkSession, path: String, embs: DataFrame,
      retainVersions: Int = 2): Unit =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val live = embs
        .join(IndexStore.liveRows(snap, "codes").select("vec_id"),
          "vec_id")
        .select("vec_id", "embedding")
      save(build(live), path, retainVersions)
    }

  /** FAMILY HEALTH as a (metric, value) relation ([[PqIndex.stats]]'s
    * mold): `version`; `codec_age` — versions since the last
    * commit tagged "train" ([[save]]/[[retrain]]), the
    * when-is-a-refresh-due gauge (pre-op-tag retained histories read
    * against the oldest retained version — a documented lower bound);
    * `live_codes`; `segments`/`tombstone_segments`. Metadata- and
    * code-relation-bounded.
    */
  def stats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val snap = IndexStore.snapshot(spark, path)
    val vs = IndexStore.versions(spark, path)
    val lastTrain = vs.filter(v =>
      IndexStore.opAt(spark, path, v) == "train")
      .sorted.lastOption.getOrElse(vs.min)
    Seq(
      "codec_age" -> (snap.version - lastTrain),
      "live_codes" -> IndexStore.liveRows(snap, "codes").count(),
      "segments" ->
        snap.lines.map(_.split("/").head).distinct.size.toLong,
      "tombstone_segments" -> snap.segments("tombstones").size.toLong,
      "version" -> snap.version,
    ).toDF("metric", "value")
  }

  def load(spark: SparkSession, path: String, embs: DataFrame): Model =
    loadSnapshot(IndexStore.snapshot(spark, path), embs)

  /** [[load]] against a pinned manifest version (time travel within the
    * GC retention window — [[IvfIndex.loadAt]]'s contract).
    */
  def loadAt(spark: SparkSession, path: String, version: Long,
      embs: DataFrame): Model =
    loadSnapshot(IndexStore.snapshotAt(spark, path, version), embs)

  private def loadSnapshot(snap: IndexStore.Snapshot,
      embs: DataFrame): Model = {
    val rows = snap.read("ranges").get.orderBy("dim").collect()
    require(rows.nonEmpty, s"no ranges at ${snap.root}")
    val lo = rows.map(_.getAs[Double]("lo")).toSeq
    val hi = rows.map(_.getAs[Double]("hi")).toSeq
    Model(lo, hi, EmbeddingSearch.prepared(embs)
      .join(IndexStore.liveRows(snap, "codes"), "vec_id"))
  }

  /** Interpreted HOF spelling of the dequantize-and-dot scan — kept as
    * the reference implementation for SqIndexSpec's codegen-equivalence
    * test. `lo_i + code_i·(hi_i − lo_i)/255`, then [[EmbeddingSearch.dot]].
    */
  private[graft] def hofAdc(model: Model, code: Column, qu: Column): Column = {
    val (loL, hiL) = (typedLit(model.lo), typedLit(model.hi))
    EmbeddingSearch.dot(qu, transform(code, (c, i) => {
      val l = element_at(loL, i + 1)
      val h = element_at(hiL, i + 1)
      l + c.cast("double") * (h - l) / lit(255.0)
    }))
  }

  /** Top-k per query over queries drawn from the corpus (self excluded):
    * compressed-domain scan → shortlist of `shortlist × k` → exact
    * cosine re-rank.
    */
  def search(model: Model, queryPred: Column, k: Int,
      shortlist: Int = 4): DataFrame =
    searchImpl(model,
      model.encoded.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm")),
      k, shortlist, excludeSelf = true)

  /** Top-k for EXTERNAL query vectors (lookup semantics, nothing
    * self-excluded; queries need no codes — the scan is asymmetric).
    */
  def searchVectors(model: Model, queries: DataFrame, k: Int,
      shortlist: Int = 4): DataFrame =
    searchImpl(model,
      EmbeddingSearch.prepared(queries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm")),
      k, shortlist, excludeSelf = false)

  private def searchImpl(model: Model, q0: DataFrame, k: Int,
      shortlist: Int, excludeSelf: Boolean): DataFrame = {
    val q = q0.withColumn("qu", unit(col("qv"), col("qnrm")))
    val joinCond =
      if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true)
    // codegen'd dequantize-and-dot (SqAdc) — the (corpus × queries)
    // inner loop must not run as interpreted HOF lambdas; hofAdc is the
    // equivalence-test reference
    val adc = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.toColumn(graft.functions.SqAdc(
        Bridge.toExpr(col("code")), Bridge.toExpr(col("qu")),
        model.lo.toArray, model.hi.toArray))
    }
    val scored = model.encoded.join(broadcast(q), joinCond)
      .withColumn("score", adc)
    val wScore = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    val cand = scored.withColumn("score_rank", row_number().over(wScore))
      .filter(col("score_rank") <= k * shortlist)
    val wCos = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .withColumn("cos",
        EmbeddingSearch.dot(col("qv"), col("v")) /
          sqrt(col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
