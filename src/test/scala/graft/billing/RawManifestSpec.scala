package graft.billing

import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Commit-log mechanics in isolation: version numbering, snapshot
  * reads, retention-depth reference sets, and history pruning — the
  * invariants every manifested table in [[BillingStore]] leans on.
  */
class RawManifestSpec extends SparkSpec {

  private def fsFor(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  test("commits number sequentially and latest wins") {
    val root = tmpDir("manifest_seq")
    val fs = fsFor(root)
    assert(RawManifest.latest(fs, root).isEmpty)
    assert(RawManifest.commit(fs, root, Seq("a.parquet")) == 1L)
    assert(RawManifest.commit(fs, root, Seq("a.parquet", "b.parquet")) == 2L)
    assert(RawManifest.versions(fs, root) == Seq(1L, 2L))
    assert(RawManifest.latest(fs, root).map(_._2.toSet)
      .contains(Set("a.parquet", "b.parquet")))
    assert(RawManifest.filesAt(fs, root, 1L).map(_.toSet)
      .contains(Set("a.parquet")))
    assert(RawManifest.filesAt(fs, root, 3L).isEmpty)
  }

  test("referenced unions exactly the newest retain versions") {
    val root = tmpDir("manifest_refs")
    val fs = fsFor(root)
    RawManifest.commit(fs, root, Seq("v1.parquet"))
    RawManifest.commit(fs, root, Seq("v2.parquet"))
    RawManifest.commit(fs, root, Seq("v3.parquet"))
    assert(RawManifest.referenced(fs, root, 1) == Set("v3.parquet"))
    assert(RawManifest.referenced(fs, root, 2) ==
      Set("v2.parquet", "v3.parquet"))
    // retain is clamped to at least 1
    assert(RawManifest.referenced(fs, root, 0) == Set("v3.parquet"))
    // deeper than history: everything still on record
    assert(RawManifest.referenced(fs, root, 99) ==
      Set("v1.parquet", "v2.parquet", "v3.parquet"))
  }

  test("pruneHistory keeps the newest versions and an empty list is a " +
      "valid commit") {
    val root = tmpDir("manifest_prune")
    val fs = fsFor(root)
    (1 to 5).foreach(i => RawManifest.commit(fs, root, Seq(s"f$i.parquet")))
    RawManifest.pruneHistory(fs, root, keep = 2)
    assert(RawManifest.versions(fs, root) == Seq(4L, 5L))
    // numbering continues past pruned history
    assert(RawManifest.commit(fs, root, Seq.empty) == 6L)
    assert(RawManifest.latest(fs, root).map(_._2).contains(Seq.empty))
  }
}
