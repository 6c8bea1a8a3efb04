package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-substring search — the saved-index path of
  * [[TextSearch.literalSearch]], for repeated decontamination sweeps
  * over a standing corpus (benchmark strings, code fragments, exact
  * boilerplate): the corpus's distinct character n-grams are stored
  * ONCE, hash-bucketed by gram, and each needle batch reads only its
  * own grams' buckets — at 100 TB a sweep touches the needles' posting
  * buckets plus the candidate docs' text, never the corpus.
  *
  * Storage is [[IndexStore]]'s segment+manifest layout (atomic publish,
  * pinned readers, GC), with the ANN family's shared tombstone
  * machinery: [[deleteDocs]] masks retracted documents immediately,
  * [[compact]] applies them physically, and the corpus table stays the
  * single source of text truth — like the vector indexes, the index
  * stores only its derived grams and re-attaches text at verify time.
  */
object LiteralIndex {

  /** Raw-text char n-grams — shared with [[TextSearch.literalSearch]]
    * via the same spelling: no tokenization, no casefolding (literal
    * means literal).
    */
  private def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - n + 1),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  private def bucketOf(g: Column, buckets: Int): Column =
    pmod(xxhash64(g), lit(buckets.toLong)).cast("int")

  /** (id, g, bucket) distinct grams of a corpus slice. */
  private def gramsOf(docs: DataFrame, id: Column, text: Column, n: Int,
      buckets: Int): DataFrame =
    docs.select(id.as("id"),
        explode(array_distinct(charGrams(text, n))).as("g"))
      .withColumn("bucket", bucketOf(col("g"), buckets))

  private def writeGrams(g: DataFrame, path: String, seg: String): Unit =
    g.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$path/$seg/grams")

  private def writeMeta(spark: SparkSession, path: String, seg: String,
      n: Int, buckets: Int): Unit = {
    import spark.implicits._
    Seq((n, buckets)).toDF("n", "buckets").coalesce(1)
      .write.parquet(s"$path/$seg/meta")
  }

  private def metaOf(snap: IndexStore.Snapshot): (Int, Int) = {
    val r = snap.read("meta")
      .getOrElse(sys.error(s"no meta at ${snap.root}")).head()
    (r.getAs[Int]("n"), r.getAs[Int]("buckets"))
  }

  /** Build the gram postings from `docs` and publish as the whole
    * index (replace semantics).
    */
  def buildAndSave(docs: DataFrame, id: Column, text: Column,
      path: String, n: Int = 4, buckets: Int = 64,
      retainVersions: Int = 2): Unit = {
    val spark = docs.sparkSession
    IndexStore.withLock(spark, path) {
      val seg = IndexStore.newSegmentName()
      writeGrams(gramsOf(docs, id, text, n, buckets), path, seg)
      writeMeta(spark, path, seg, n, buckets)
      IndexStore.publishReplace(spark, path, seg, Seq("grams", "meta"),
        retainVersions)
      ()
    }
  }

  /** Admit a delivery: only the delta's grams are computed and appended
    * (gram width and bucket count come from the index's own meta; an
    * empty delivery publishes nothing).
    */
  def appendDocs(spark: SparkSession, path: String, newDocs: DataFrame,
      id: Column, text: Column): Unit = {
    val (n, buckets) = metaOf(IndexStore.snapshot(spark, path))
    val g = gramsOf(newDocs, id, text, n, buckets)
    if (!g.isEmpty) IndexStore.withLock(spark, path) {
      val seg = IndexStore.newSegmentName()
      writeGrams(g, path, seg)
      IndexStore.publishAppend(spark, path, seg, Seq("grams"))
      ()
    }
  }

  /** Retract documents (idempotent tombstone append — the shared
    * vector-index delete contract, keyed on `id`).
    */
  def deleteDocs(spark: SparkSession, path: String, ids: DataFrame,
      idCol: Column): Unit =
    IndexStore.tombstoneIds(spark, path, ids, idCol, "grams", key = "id")

  /** Apply tombstones physically and re-cluster every delivery's files
    * into one set per bucket (manifest pointer swap).
    */
  def compact(spark: SparkSession, path: String,
      retainVersions: Int = 2): Unit =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val (n, buckets) = metaOf(snap)
      val seg = IndexStore.newSegmentName()
      writeGrams(IndexStore.liveRows(snap, "grams", key = "id"), path, seg)
      writeMeta(spark, path, seg, n, buckets)
      IndexStore.publishReplace(spark, path, seg, Seq("grams", "meta"),
        retainVersions)
      ()
    }

  /** Size-tiered compaction ([[IvfIndex.maybeCompact]]'s contract). */
  def maybeCompact(spark: SparkSession, path: String,
      maxSegments: Int): Boolean = {
    val due = IndexStore.segmentCount(spark, path) > maxSegments
    if (due) compact(spark, path)
    due
  }

  /** Sweep a needle batch against the saved index: needle grams are
    * collected (needle batches are small by nature), their buckets
    * become partition filters on the gram scan, an all-grams-present
    * candidate join narrows to (needle, doc) pairs, and a `contains`
    * verify against `docs` (the corpus table — text is never stored in
    * the index) removes gram-coincidence false positives. Tombstoned
    * documents are excluded. Same answers as
    * [[TextSearch.literalSearch]] over the surviving corpus, with the
    * scan pruned to the needles' buckets.
    */
  def searchSaved(spark: SparkSession, path: String, docs: DataFrame,
      id: Column, text: Column, needles: DataFrame, needleId: Column,
      needle: Column): DataFrame =
    searchSnapshot(IndexStore.snapshot(spark, path), docs, id, text,
      needles, needleId, needle)

  /** [[searchSaved]] against a PINNED manifest version — the literal
    * family's side of the index time-travel contract
    * ([[TextSearch.searchSavedAt]] / [[IvfIndex.loadAt]]): a sweep
    * recorded with its version re-runs verbatim under audit, regardless
    * of appends/deletes landed since (within the GC retention window).
    */
  def searchSavedAt(spark: SparkSession, path: String, version: Long,
      docs: DataFrame, id: Column, text: Column, needles: DataFrame,
      needleId: Column, needle: Column): DataFrame =
    searchSnapshot(IndexStore.snapshotAt(spark, path, version), docs, id,
      text, needles, needleId, needle)

  private def searchSnapshot(snap: IndexStore.Snapshot, docs: DataFrame,
      id: Column, text: Column, needles: DataFrame, needleId: Column,
      needle: Column): DataFrame = {
    val (n, buckets) = metaOf(snap)
    val nd = needles.select(needleId.as("needle_id"), needle.as("needle"))
    val nGrams = nd.select(col("needle_id"),
      explode(charGrams(col("needle"), n)).as("g")).distinct()
    val wanted = nGrams
      .select(bucketOf(col("g"), buckets).as("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val grams = IndexStore.liveRows(snap, "grams", key = "id")
      .filter(col("bucket").isin(wanted: _*))
    val nCounts = nGrams.groupBy("needle_id").agg(count(lit(1)).as("ng"))
    val cand = grams.join(broadcast(nGrams), "g")
      .groupBy("needle_id", "id").agg(count(lit(1)).as("hit"))
      .join(broadcast(nCounts), "needle_id")
      .filter(col("hit") === col("ng"))
      .select("needle_id", "id")
    docs.select(id.as("id"), text.as("__t"))
      .join(cand, "id")
      .join(broadcast(nd), "needle_id")
      .filter(col("__t").contains(col("needle")))
      .select("needle_id", "id")
  }
}
