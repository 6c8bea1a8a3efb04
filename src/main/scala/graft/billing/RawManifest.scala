package graft.billing

import org.apache.hadoop.fs.{FileSystem, Path}

/** The billing store's instance of the shared versioned-manifest
  * snapshot machinery ([[graft.store.VersionedManifest]] carries the
  * full protocol doc). Lines are data-file paths relative to the table
  * root; used by every table [[BillingStore]] serves — the fact table,
  * the daily-partials fold, the four rollups, and the ledger. The
  * reference gets isolation for free from its single embedded DuckDB
  * resource (reference: pipeline/pipeline.py:179); a parquet-directory
  * store has to build it.
  */
private[billing] object RawManifest
    extends graft.store.VersionedManifest("_raw_manifest") {

  /** History pruning also drops the pruned version's stats sidecar, so
    * manifest history and file-stats metadata stay in step.
    */
  override protected def onPrune(fs: FileSystem, manifest: Path): Unit =
    FileStats.drop(fs, manifest)
}
