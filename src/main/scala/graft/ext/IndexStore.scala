package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Segment + manifest storage shared by the persisted index family
  * ([[TextSearch]], [[DedupIndex]]): every mutation writes NEW files
  * into a fresh immutable `seg-*` directory and atomically publishes a
  * manifest version listing the index's current relation directories
  * ([[graft.store.VersionedManifest]] carries the protocol doc). What
  * this buys over the rename-swap these indexes used to run:
  *
  *   - readers pin one manifest version per logical operation
  *     ([[snapshot]]) and can never observe a half-swapped index — a
  *     search racing [[TextSearch.compact]] sees exactly the old or the
  *     new layout;
  *   - compaction is a manifest pointer swap plus deferred GC, not a
  *     directory rename (non-atomic on object stores, and the old
  *     rename left a no-index window between the two renames);
  *   - compacted-away segments survive until [[gc]] finds them
  *     unreferenced by the newest `retainVersions` manifests, so a
  *     pinned reader's files outlive the commit that dropped them.
  *
  * Manifest lines are `segName/relation` paths relative to the index
  * root; a snapshot resolves a relation to the union of its segment
  * directories. Mutators serialize on the index root's writer lock
  * ([[graft.billing.TableLock]] — same discipline as the billing
  * store), so manifest versions never race and append×compact cannot
  * lose a delivery.
  */
object IndexStore {

  private val manifest = new graft.store.VersionedManifest("_manifest")

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** One pinned manifest version: every relation this operation reads
    * resolves against the SAME line set, so a concurrent commit cannot
    * tear the view between two reads.
    */
  final case class Snapshot(spark: SparkSession, root: String,
      version: Long, lines: Seq[String]) {
    def dirs(relation: String): Seq[String] =
      lines.filter(_.endsWith(s"/$relation")).map(l => s"$root/$l")

    /** The relation as one DataFrame over its segment dirs; None when no
      * segment carries it (e.g. `tombstones` before any delete). Each
      * segment dir is read as its own root (partition columns like
      * `bucket=` discover per-dir — one multi-root read would fight
      * partition inference) and the branches union; a partition filter
      * still pushes into every branch's file index, so bucket pruning
      * survives the union.
      */
    def read(relation: String): Option[DataFrame] =
      dirs(relation) match {
        case Seq() => None
        case ds => Some(ds.map(d => spark.read.parquet(d))
          .reduce(_ unionByName _))
      }
  }

  def snapshot(spark: SparkSession, root: String): Snapshot =
    manifest.latest(fsOf(spark, root), root) match {
      case Some((v, lines)) => Snapshot(spark, root, v, lines)
      case None => throw new java.io.FileNotFoundException(
        s"no index manifest under $root — not an index root, or never built")
    }

  /** All manifest versions still retained under the root, oldest first
    * — the addressable time-travel window.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    manifest.versions(fsOf(spark, root), root)

  /** Pin a SPECIFIC retained version — time travel within the GC
    * retention window (same version-depth contract Delta/Iceberg make):
    * a reader holding version v sees exactly the index as committed at
    * v, because GC keeps every segment the newest `retainVersions`
    * manifests reference. The lineage use case: a data-selection run
    * records the index version it queried, and an audit re-runs the
    * same selection against that version verbatim even after later
    * appends/deletes landed.
    */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot =
    manifest.filesAt(fsOf(spark, root), root, version) match {
      case Some(lines) => Snapshot(spark, root, version, lines)
      case None => throw new java.io.FileNotFoundException(
        s"index version $version at $root is not retained " +
          s"(have: ${versions(spark, root).mkString(",")})")
    }

  def newSegmentName(): String =
    "seg-" + java.util.UUID.randomUUID().toString.replace("-", "").take(16)

  /** Distinct segments the CURRENT manifest references — the number of
    * per-relation unions a reader pays, i.e. the compaction-debt gauge.
    */
  def segmentCount(spark: SparkSession, root: String): Int =
    snapshot(spark, root).lines.map(_.split("/").head).distinct.size

  /** Run `body` holding the index root's writer mutex — every mutator
    * (build/append/delete/compact) goes through here.
    */
  def withLock[A](spark: SparkSession, root: String)(body: => A): A =
    graft.billing.TableLock.withLock(spark, root)(body)

  /** Publish `seg`'s relations ON TOP of the current manifest (append
    * semantics: deliveries, tombstones). Caller must hold the lock and
    * have finished writing the segment's files.
    */
  def publishAppend(spark: SparkSession, root: String, seg: String,
      relations: Seq[String]): Long = {
    val fs = fsOf(spark, root)
    val prev = manifest.latest(fs, root).map(_._2).getOrElse(Seq.empty)
    manifest.commit(fs, root, prev ++ relations.map(r => s"$seg/$r"))
  }

  /** Publish `seg`'s relations as the index's ENTIRE content (replace
    * semantics: initial build, compaction), then GC segments no retained
    * manifest references. Caller must hold the lock.
    */
  def publishReplace(spark: SparkSession, root: String, seg: String,
      relations: Seq[String], retainVersions: Int = 2): Long = {
    val fs = fsOf(spark, root)
    val v = manifest.commit(fs, root, relations.map(r => s"$seg/$r"))
    gc(spark, root, retainVersions)
    v
  }

  /** Shared tombstone-append for the vector-index family (IVF/PQ/SQ/
    * IVF-PQ): the requested ids that are PRESENT in `relation` and not
    * already tombstoned append as one tombstone segment. Readers
    * anti-join via [[liveRows]]; compaction applies them physically.
    * Filtering reads only `relation`'s key column (columnar scan);
    * takedown batches are small by nature → broadcast joins.
    */
  private[ext] def tombstoneIds(spark: SparkSession, root: String,
      ids: DataFrame, idCol: org.apache.spark.sql.Column,
      relation: String, key: String = "vec_id"): Unit =
    withLock(spark, root) {
      val snap = snapshot(spark, root)
      val requested = ids.select(idCol.as(key)).distinct()
      val present = requested.join(
        snap.read(relation).get.select(key), Seq(key), "left_semi")
      val eff = snap.read("tombstones").fold(present)(t =>
        present.join(t, Seq(key), "left_anti"))
      if (!eff.isEmpty) {
        val seg = newSegmentName()
        eff.coalesce(1).write.parquet(s"$root/$seg/tombstones")
        publishAppend(spark, root, seg, Seq("tombstones"))
        ()
      }
    }

  /** `relation` under `snap` with tombstoned keys excluded — the one
    * definition of "live" every reader and compactor of a vector index
    * shares.
    */
  private[ext] def liveRows(snap: Snapshot, relation: String,
      key: String = "vec_id"): DataFrame = {
    val base = snap.read(relation).get
    snap.read("tombstones").fold(base)(t =>
      base.join(org.apache.spark.sql.functions.broadcast(t),
        Seq(key), "left_anti"))
  }

  /** Delete `seg-*` directories unreferenced by the newest
    * `retainVersions` manifests and prune manifest history. Only
    * segment dirs are touched — never the manifest dir or any
    * caller-owned sibling (e.g. a dedup index's root-level `meta`).
    */
  def gc(spark: SparkSession, root: String, retainVersions: Int): Unit = {
    val fs = fsOf(spark, root)
    val keep = manifest.referenced(fs, root, retainVersions)
      .map(_.split("/").head)
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg-"))
        .filterNot(st => keep.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    }
    manifest.pruneHistory(fs, root, keep = math.max(retainVersions, 8))
  }
}
