package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LiteralIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "def foo(x): return x+1"),
    (2L, "def foo (x): return x + 1"),
    (3L, "call foo(x) then def foo(x): again"),
    (4L, "unrelated words entirely"),
    (5L, "another def foo(x): appears here"),
  ).toDF("doc_id", "text")

  private def needles = Seq((10L, "foo(x)"), (11L, "def foo(x):"),
    (12L, "xyzw")).toDF("nid", "needle")

  private def sweep(dir: String) =
    LiteralIndex.searchSaved(spark, dir, docs, col("doc_id"), col("text"),
        needles, col("nid"), col("needle"))
      .as[(Long, Long)].collect().toSet

  test("saved sweep equals the in-memory literal search; append visible") {
    val dir = tmpDir("lit_idx")
    LiteralIndex.buildAndSave(docs.filter(col("doc_id") <= 3),
      col("doc_id"), col("text"), dir, n = 4, buckets = 8)
    LiteralIndex.appendDocs(spark, dir, docs.filter(col("doc_id") > 3),
      col("doc_id"), col("text"))
    val want = TextSearch.literalSearch(docs, col("doc_id"), col("text"),
      needles, col("nid"), col("needle")).as[(Long, Long)].collect().toSet
    assert(sweep(dir) == want)
    assert(want.contains((10L, 5L))) // an appended doc actually matches
  }

  test("deleteDocs masks immediately; compact removes grams physically") {
    val dir = tmpDir("lit_del")
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), dir,
      n = 4, buckets = 8)
    LiteralIndex.deleteDocs(spark, dir, Seq(3L, 5L).toDF("doc_id"),
      col("doc_id"))
    val want = TextSearch.literalSearch(
      docs.filter(!col("doc_id").isin(3L, 5L)), col("doc_id"), col("text"),
      needles, col("nid"), col("needle")).as[(Long, Long)].collect().toSet
    assert(sweep(dir) == want)
    LiteralIndex.compact(spark, dir, retainVersions = 8)
    val snap = IndexStore.snapshot(spark, dir)
    assert(snap.read("tombstones").isEmpty)
    assert(snap.read("grams").get.select("id").as[Long]
      .collect().forall(i => i != 3L && i != 5L))
    assert(sweep(dir) == want)
  }

  test("time travel: a pinned version answers as of its commit") {
    val dir = tmpDir("lit_tt")
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), dir,
      n = 4, buckets = 8)
    val v0 = IndexStore.snapshot(spark, dir).version
    LiteralIndex.deleteDocs(spark, dir, Seq(3L).toDF("doc_id"),
      col("doc_id"))
    // live sweep excludes doc 3; the pinned pre-delete version keeps it
    assert(!sweep(dir).contains((10L, 3L)))
    val pinned = LiteralIndex.searchSavedAt(spark, dir, v0, docs,
        col("doc_id"), col("text"), needles, col("nid"), col("needle"))
      .as[(Long, Long)].collect().toSet
    assert(pinned.contains((10L, 3L)))
  }

  test("sweep prunes the gram scan to the needles' buckets") {
    val dir = tmpDir("lit_plan")
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), dir,
      n = 4, buckets = 8)
    val plan = LiteralIndex.searchSaved(spark, dir, docs, col("doc_id"),
        col("text"), needles, col("nid"), col("needle"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"), plan)
    assert(plan.contains("BroadcastHashJoin"))
  }
}
