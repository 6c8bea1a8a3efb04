package graft.billing

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned file-list manifests for a parquet table root — minimal
  * reader snapshot isolation without a table-format dependency. Used by
  * every table [[BillingStore]] serves: the fact table, the
  * daily-partials fold, the four rollups, and the ledger.
  *
  * Problem: [[TableLock]] serializes WRITERS, but a reader that lists a
  * table directory while a compaction/merge/refresh swaps files can see
  * a mixed set (old + new files of the same partition → doubled rows;
  * neither → missing rows). The reference gets isolation for free from
  * its single embedded DuckDB resource
  * (reference: pipeline/pipeline.py:179); a parquet-directory store has
  * to build it: every mutator commit publishes `_raw_manifest/v{N}` —
  * an atomically-renamed file listing the table's data files — and
  * readers pin the newest manifest instead of listing directories.
  * Mutators write NEW files next to the old ones (never
  * delete-in-place); files dropped from the manifest stay on disk until
  * GC ([[BillingStore.gcRaw]] and friends) finds them unreferenced by
  * the latest `retainVersions` manifests, so a pinned reader's files
  * outlive at least that many later commits — the same
  * time-travel-window contract Delta/Iceberg make, with version-depth
  * instead of wall-clock retention. At real object-store scale the
  * atomic-rename commit is replaced by a table format's commit
  * protocol; the store API shape is unchanged.
  *
  * Layout: `$table/_raw_manifest/v%012d` — one data-file path per
  * line, relative to the table root. Committed under the writer lock
  * (single manifest writer), so version numbers never race.
  */
private[billing] object RawManifest {

  private def dir(root: String) = new Path(root, "_raw_manifest")

  private val Version = "v(\\d{12})".r

  private def versionsOn(fs: FileSystem, root: String): Seq[(Long, Path)] =
    (if (fs.exists(dir(root))) fs.listStatus(dir(root)).toSeq else Seq.empty)
      .flatMap { st =>
        st.getPath.getName match {
          case Version(n) => Some(n.toLong -> st.getPath)
          case _          => None
        }
      }
      .sortBy(_._1)

  /** Newest committed (version, relative files). None = no manifest yet
    * (pre-manifest store or empty store) — callers fall back to
    * directory listing.
    */
  def latest(fs: FileSystem, root: String): Option[(Long, Seq[String])] =
    versionsOn(fs, root).lastOption.map { case (v, p) =>
      v -> read(fs, p)
    }

  /** All committed versions still on disk, oldest first. */
  def versions(fs: FileSystem, root: String): Seq[Long] =
    versionsOn(fs, root).map(_._1)

  /** The file list of one retained version (None once history pruning
    * or GC dropped it).
    */
  def filesAt(fs: FileSystem, root: String, version: Long): Option[Seq[String]] =
    versionsOn(fs, root).find(_._1 == version)
      .map { case (_, p) => read(fs, p) }

  private def read(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Publish the next version: write to a hidden temp, atomically rename
    * into place. Caller holds the writer lock, so the next version
    * number cannot race.
    */
  def commit(fs: FileSystem, root: String, files: Seq[String]): Long = {
    val next = versionsOn(fs, root).lastOption.map(_._1 + 1).getOrElse(1L)
    val d = dir(root)
    fs.mkdirs(d)
    val tmp = new Path(d, f".tmp-v$next%012d")
    val out = fs.create(tmp, true)
    try out.write(files.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(d, f"v$next%012d")
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"manifest commit lost a race: $target")
    }
    next
  }

  /** Union of the files referenced by the newest `retain` manifests —
    * everything a reader pinned up to `retain` commits ago may still be
    * scanning, i.e. everything GC must keep.
    */
  def referenced(fs: FileSystem, root: String, retain: Int): Set[String] =
    versionsOn(fs, root).takeRight(math.max(retain, 1))
      .flatMap { case (_, p) => read(fs, p) }.toSet

  /** Drop manifest history beyond the newest `keep` versions (the list
    * files themselves are tiny; this only bounds the directory).
    */
  def pruneHistory(fs: FileSystem, root: String, keep: Int): Unit =
    versionsOn(fs, root).dropRight(math.max(keep, 1))
      .foreach { case (_, p) =>
        fs.delete(p, false)
        FileStats.drop(fs, p)
      }
}
