package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus STORE OF RECORD as a first-class takedown surface: a
  * manifest-versioned keyed parquet table built on the same
  * [[IndexStore]] lifecycle every derived index family uses —
  * immutable segments, atomic manifest publish, scoped tombstones
  * (delete-then-readd works), compaction as a pointer swap, GC with
  * reader leases, and addressable time travel.
  *
  * Why it exists: [[Takedown]] orchestrated the seven DERIVED index
  * surfaces, but the corpus rows those indexes were built from lived
  * outside the registry — a GDPR/takedown flow had to delete them
  * through a separate code path, and a crash between "indexes done"
  * and "store done" left a corpus row with no surviving index entry
  * (or worse, the reverse). Registering the store as a `store` surface
  * puts the corpus row and every derived surface under ONE durable
  * intent: `retract()` either completes everywhere or leaves a pending
  * intent `resume()` finishes.
  *
  * Schema contract: rows are stored verbatim plus a normalized `id`
  * key column (the delete key every takedown surface shares). At
  * 100 TB the store is the biggest surface by bytes, which is exactly
  * why deletes are metadata-bounded tombstones (no corpus rewrite on
  * the retract path) and the rewrite happens once, batched, in
  * [[compact]].
  */
object CorpusStore {

  /** `rows` with the store key normalized to a column named `id`
    * (replacing any existing `id` column — the key IS the id).
    */
  private def keyed(rows: DataFrame, idCol: Column): DataFrame = {
    val rest = rows.columns.filterNot(_ == "id").map(rows(_))
    rows.select(idCol.as("id") +: rest.toIndexedSeq: _*)
  }

  /** Write `rows` as the store's entire content (replace semantics —
    * initial build or full refresh). Returns the committed version.
    */
  def build(rows: DataFrame, idCol: Column, root: String,
      retainVersions: Int = 2): Long = {
    val spark = rows.sparkSession
    IndexStore.withLock(spark, root) {
      val seg = IndexStore.newSegmentName()
      keyed(rows, idCol).write.parquet(s"$root/$seg/rows")
      IndexStore.publishReplace(spark, root, seg, Seq("rows"),
        retainVersions)
    }
  }

  /** Admit a delivery on top of the current content (append semantics;
    * an empty delivery publishes nothing and returns the current
    * version). Re-delivering a previously deleted id makes it live
    * again — the tombstones that masked it are scoped to the segments
    * present at delete time, so the new segment is unmasked.
    */
  def append(spark: SparkSession, root: String, rows: DataFrame,
      idCol: Column): Long =
    IndexStore.withLock(spark, root) {
      val delivery = keyed(rows, idCol)
      if (delivery.isEmpty) IndexStore.snapshot(spark, root).version
      else {
        val seg = IndexStore.newSegmentName()
        delivery.write.parquet(s"$root/$seg/rows")
        IndexStore.publishAppend(spark, root, seg, Seq("rows"))
      }
    }

  /** The live corpus — rows minus scoped tombstones, the one
    * definition of "live" shared with every index family.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    IndexStore.liveRows(IndexStore.snapshot(spark, root), "rows",
      key = "id")

  /** The live corpus as of a RETAINED version — the lineage path: a
    * selection run records the store version it read, an audit replays
    * it verbatim (hold [[IndexStore.withLease]] to pin against GC).
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame =
    IndexStore.liveRows(IndexStore.snapshotAt(spark, root, version), "rows",
      key = "id")

  /** Retract rows by id (idempotent, live-presence-judged, scoped
    * tombstone append — the shared takedown delete contract). No
    * corpus bytes are rewritten; the retract path is metadata-bounded.
    */
  def deleteRows(spark: SparkSession, root: String, ids: DataFrame,
      idCol: Column): Unit =
    IndexStore.tombstoneIds(spark, root, ids, idCol, "rows", key = "id")

  /** Apply tombstones physically and re-cluster every delivery into
    * one segment (manifest pointer swap; pinned readers keep their
    * segments until GC retention lapses).
    */
  def compact(spark: SparkSession, root: String,
      retainVersions: Int = 2): Unit =
    IndexStore.withLock(spark, root) {
      val live = read(spark, root).persist()
      try {
        val seg = IndexStore.newSegmentName()
        live.write.parquet(s"$root/$seg/rows")
        IndexStore.publishReplace(spark, root, seg, Seq("rows"),
          retainVersions)
        ()
      } finally { live.unpersist(); () }
    }
}
