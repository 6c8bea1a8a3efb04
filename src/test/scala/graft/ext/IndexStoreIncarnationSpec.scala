package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The root-incarnation law for [[IndexStore]]'s manifest cache: a
  * root deleted and rebuilt OUT-OF-BAND (not through this JVM's
  * publish path) restarts version numbering, so the old existence
  * probes ("v exists, v+1 doesn't") could hold for a cached entry
  * whose lines name the previous incarnation's deleted segments. The
  * incarnation marker stamped at first commit makes the rebuild
  * visible: the cache detects the new identity and refreshes instead
  * of serving stale manifest lines.
  */
class IndexStoreIncarnationSpec extends SparkSpec {
  import spark.implicits._

  private def wipe(root: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root)).deleteRecursively()
    ()
  }

  test("out-of-band root recreation invalidates the manifest cache") {
    val root = tmpDir("inc_root")
    CorpusStore.build(Seq((1L, "old-world")).toDF("doc_id", "text"),
      col("doc_id"), root)
    // warm the cache through the reader path
    assert(CorpusStore.read(spark, root)
      .select("text").as[String].collect().toSeq == Seq("old-world"))
    // out-of-band recreation: delete the whole root on the filesystem
    // (not via any IndexStore API — this JVM's cache is never told),
    // then rebuild to the SAME version number with different content
    wipe(root)
    CorpusStore.build(Seq((1L, "new-world")).toDF("doc_id", "text"),
      col("doc_id"), root)
    // the versions match, so the old "v exists, v+1 doesn't" probes
    // pass — only the incarnation probe can tell the roots apart
    val got = CorpusStore.read(spark, root)
      .select("text").as[String].collect().toSeq
    assert(got == Seq("new-world"),
      s"stale cache served the previous incarnation: $got")
  }

  test("geometry meta follows the incarnation, not just the version") {
    val root = tmpDir("inc_meta")
    val docs = Seq((1L, "alpha bravo charlie delta echo foxtrot"))
      .toDF("doc_id", "text")
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), root,
      n = 4, buckets = 4)
    val needles = Seq((1L, "bravo charl")).toDF("nid", "needle")
    assert(LiteralIndex.searchSaved(spark, root, docs, col("doc_id"),
        col("text"), needles, col("nid"), col("needle"))
      .count() == 1)
    // rebuild out-of-band with DIFFERENT geometry at the same version:
    // a (root, version)-keyed meta cache would reuse n=4/buckets=4 and
    // mis-plan every probe against the new layout
    wipe(root)
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), root,
      n = 3, buckets = 2)
    assert(LiteralIndex.searchSaved(spark, root, docs, col("doc_id"),
        col("text"), needles, col("nid"), col("needle"))
      .count() == 1)
  }
}
