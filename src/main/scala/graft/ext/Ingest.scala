package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-surface ingest orchestration — the APPEND mirror of
  * [[Takedown]]. A delivery at 100 TB must land on the corpus's EVERY
  * surface — the store of record, BM25, dedup, literal, and the ANN
  * indexes — or a document is searchable on one surface and missing
  * from another until someone notices. Each family already has an
  * incremental append; what was missing is the composition: one
  * `admit(delivery)` that drives them all off ONE durable intent and
  * is safe to re-run after a mid-flow crash.
  *
  * Mechanism — intent log, then apply (the [[Takedown.retract]]
  * discipline):
  *
  *   1. [[admit]] first writes the delivery DURABLY to
  *      `root/_deliveries/<did>/rows` (staged and renamed, so a crash
  *      mid-write leaves a never-landed staging dir). Only then are
  *      the registered surfaces applied — store of record FIRST (the
  *      source of truth must never trail its own derivatives), then
  *      the derived indexes in registry order — each leaving a
  *      `done-<surface>` marker.
  *   2. A crash between surfaces leaves a pending delivery: [[resume]]
  *      re-applies every unfinished one, skipping surfaces whose
  *      marker exists. Markers are an optimization, not the safety:
  *      before a surface's append, the delivery's ids are anti-joined
  *      against that surface's LIVE ids, so a replayed apply admits
  *      only what is not already there — and every family append
  *      publishes nothing for an empty delta. Replay converges with no
  *      double-insert even when the crash fell between a surface's
  *      manifest commit and its marker write.
  *
  * Idempotency contract: admit is per-id upsert-shaped — an id already
  * LIVE on a surface is skipped there (re-admitting a delivery is a
  * no-op; admitting a previously deleted id re-adds it, the scoped-
  * tombstone readd semantics every family shares). The liveness probe
  * costs one column-pruned scan of the surface's cheapest id-bearing
  * relation (store rows / dedup sizes / IVF cells / PQ codes are one
  * row per key; BM25 postings and literal grams are token-linear) with
  * the delivery broadcast — the same cost class as the family delete
  * paths, which judge presence against live rows the same way.
  *
  * Delivery schema: a required `id` column, plus `text` (consumed by
  * the store and the document indexes) and/or `emb` (an
  * `array<float/double>` consumed by the store and the vector
  * indexes). [[admit]] refuses — BEFORE the intent lands — a delivery
  * missing a column some registered surface needs, so an intent can
  * never wedge on a schema it cannot satisfy. The store of record
  * receives the delivery verbatim; delivery schemas may EVOLVE by
  * addition (the store unions segments by name, null-filling columns
  * older deliveries lack — [[CorpusStore]]'s schema contract).
  */
object Ingest {

  import Takedown.{Surface, surfaceId, surfaces}

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def deliveriesDir(root: String) = new Path(root, "_deliveries")

  /** Store of record first, then document indexes, then vector indexes
    * (derived order is convention, not correctness — every apply is
    * independently idempotent).
    */
  private def applyOrder(ss: Seq[Surface]): Seq[Surface] = {
    val prio = Map("store" -> 0).withDefaultValue(1)
    ss.sortBy(s => (prio(s.kind), s.kind, s.path))
  }

  private def needsText(kind: String): Boolean =
    Set("bm25", "dedup", "literal").contains(kind)

  private def needsEmb(kind: String): Boolean =
    Set("ivf", "pq", "sq", "ivfpq", "graph", "binary").contains(kind)

  /** Admit `delivery` to every registered surface. The intent commits
    * durably BEFORE any surface is touched, so a crash at any point
    * leaves either a no-op (intent never landed) or a pending delivery
    * [[resume]] completes. Returns the delivery id. Re-running with
    * the same rows is harmless: every surface apply is
    * live-presence-idempotent.
    */
  def admit(spark: SparkSession, root: String, delivery: DataFrame,
      idCol: Column): String = {
    val ss = surfaces(spark, root)
    require(ss.nonEmpty, s"no surfaces registered under $root")
    val cols = delivery.columns.toSet
    ss.foreach { s =>
      require(!needsText(s.kind) || cols.contains("text"),
        s"surface ${s.kind}@${s.path} needs a 'text' column the delivery lacks")
      require(!needsEmb(s.kind) || cols.contains("emb"),
        s"surface ${s.kind}@${s.path} needs an 'emb' column the delivery lacks")
    }
    val did = "d-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val fs = fsOf(spark, root)
    val staging = new Path(deliveriesDir(root), s"$did/rows-staging")
    val landed = new Path(deliveriesDir(root), s"$did/rows")
    val rest = delivery.columns.filterNot(_ == "id").map(delivery(_))
    delivery.select(idCol.as("id") +: rest.toIndexedSeq: _*)
      .dropDuplicates("id")
      .write.parquet(staging.toString)
    require(fs.rename(staging, landed),
      s"could not publish delivery intent $did (rename failed)")
    applyIntent(spark, root, did)
    did
  }

  /** The delivery ids already LIVE on `s`, judged against its cheapest
    * id-bearing relation — the presence judge every apply anti-joins
    * the delivery against. Bloom-sidecar segment pruning
    * ([[IndexStore.liveRowsAmong]]) keeps the probe O(segment blooms +
    * matching segments), not O(live ids) — a fresh-id delivery prunes
    * every segment and reads nothing but blooms, even on the
    * token-linear relations (postings, grams).
    */
  private def liveIds(spark: SparkSession, s: Surface,
      candidates: DataFrame): DataFrame = {
    val snap = IndexStore.snapshot(spark, s.path)
    val (rel, k) = s.kind match {
      case "store"               => ("rows", "id")
      case "bm25"                => ("postings", "id")
      case "dedup"               => ("sizes", "id")
      case "literal"             => ("grams", "id")
      case "ivf"                 => ("cells", "vec_id")
      case "pq" | "sq" | "ivfpq" | "binary" => ("codes", "vec_id")
      case "graph"               => ("vectors", "vec_id")
      case other => sys.error(s"unknown surface kind '$other'")
    }
    IndexStore.liveRowsAmong(snap, rel, k,
        candidates.select(col("id").as(k)))
      .select(col(k).as("id")).distinct()
  }

  /** Apply one logged delivery's surfaces up to `upTo` (the test hook
    * that simulates a mid-flow crash; production callers never pass
    * it). Completed surfaces leave a marker and are skipped on replay;
    * the final `_done` marker lands only after the last surface.
    */
  private[ext] def applyIntent(spark: SparkSession, root: String,
      did: String, upTo: Int = Int.MaxValue): Unit = {
    val fs = fsOf(spark, root)
    val rows = spark.read.parquet(s"$root/_deliveries/$did/rows")
    val ss = applyOrder(surfaces(spark, root))
    // store-of-record surfaces complete FIRST and sequentially (the
    // source of truth must never trail its own derivatives — the
    // documented ordering contract); the DERIVED surfaces after them
    // are independent commits on their own roots and run concurrently
    // on the bounded commit pool (guide §2.6 — the Takedown.applyIntent
    // overlap). Markers and replay semantics are unchanged: every
    // apply is live-presence-idempotent, and the first failure
    // rethrows after the batch settles, so completed surfaces keep
    // their markers.
    val (stores, derived) = ss.take(upTo).partition(_.kind == "store")
    def applyOne(s: Surface): Unit = {
      val mark = new Path(deliveriesDir(root), s"$did/done-${surfaceId(s)}")
      if (!fs.exists(mark)) {
        applySurface(spark, s, rows)
        fs.create(mark, true).close()
      }
    }
    stores.foreach(applyOne)
    IndexStore.runAll(derived.map(s => () => applyOne(s))).foreach(_.get)
    if (upTo >= ss.size)
      fs.create(new Path(deliveriesDir(root), s"$did/_done"), true).close()
  }

  private def applySurface(spark: SparkSession, s: Surface,
      rows: DataFrame): Unit = {
    // ids already live on THIS surface are skipped: dups ⊆ delivery, so
    // broadcasting the probe and the resulting exclusion set is safe
    val dups = liveIds(spark, s, rows.select("id"))
      .join(broadcast(rows.select("id")), Seq("id"), "left_semi")
    val fresh = rows.join(broadcast(dups), Seq("id"), "left_anti")
    // a vec surface registered AFTER a text-only intent landed fails
    // loudly here (admit() refuses such a delivery up front)
    def vecs: DataFrame = {
      require(rows.columns.contains("emb"),
        s"surface ${s.kind}@${s.path} needs an 'emb' column the " +
          s"logged delivery lacks")
      // a mixed delivery legitimately carries text-only rows (the store
      // keeps them; embeddings may arrive later) — but a null embedding
      // must never reach a vector index, where prepared() would flow
      // null v/nrm into every cosine
      fresh.filter(col("emb").isNotNull)
        .select(col("id").as("vec_id"), col("emb").as("embedding"))
    }
    s.kind match {
      case "store" =>
        CorpusStore.append(spark, s.path, fresh, col("id")); ()
      case "bm25" =>
        TextSearch.appendDocs(spark, s.path, fresh, col("id"), col("text"))
      case "dedup" =>
        DedupIndex.append(spark, s.path, fresh, col("id"), col("text"))
      case "literal" =>
        LiteralIndex.appendDocs(spark, s.path, fresh, col("id"), col("text"))
      // vector loads bind the model's corpus frame to the delivery —
      // saveAppend only reads the frozen quantizer (centroids /
      // codebooks / clip range), which comes from the snapshot
      case "ivf" =>
        IvfIndex.saveAppend(IvfIndex.load(spark, s.path, vecs), vecs, s.path)
      case "pq" =>
        PqIndex.saveAppend(PqIndex.load(spark, s.path, vecs), vecs, s.path)
      case "sq" =>
        SqIndex.saveAppend(SqIndex.load(spark, s.path, vecs), vecs, s.path)
      case "ivfpq" =>
        IvfPqIndex.saveAppend(
          IvfPqIndex.load(spark, s.path, vecs), vecs, s.path)
      case "binary" =>
        BinaryIndex.saveAppend(
          BinaryIndex.load(spark, s.path, vecs), vecs, s.path)
      // insert-by-search: the delivery beam-searches the live graph for
      // its neighborhood — delta-bounded compute, never a corpus-wide
      // descent (insert is itself live-presence idempotent, so the
      // fresh-rows pre-filter above is belt and braces here)
      case "graph" =>
        KnnGraphIndex.insert(spark, s.path, vecs); ()
      case other => sys.error(s"unknown surface kind '$other'")
    }
  }

  /** Delivery ids whose `_done` marker has not landed — what a crash
    * left behind. Intents whose `rows` dir never landed (a crash during
    * the staging write, before the publish rename) are NOT pending: no
    * surface can have been touched for them, so they read as "delivery
    * never happened" rather than wedging [[resume]].
    */
  def pending(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(deliveriesDir(root))) return Seq.empty
    fs.listStatus(deliveriesDir(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .filterNot(st => fs.exists(new Path(st.getPath, "_done")))
      .filter(st => fs.exists(new Path(st.getPath, "rows")))
      .map(_.getPath.getName).sorted
  }

  /** Complete every pending delivery (crash recovery — call on process
    * start, or from a maintenance cron). Returns the ids it finished.
    */
  def resume(spark: SparkSession, root: String): Seq[String] = {
    val ps = pending(spark, root)
    ps.foreach(did => applyIntent(spark, root, did))
    ps
  }
}
