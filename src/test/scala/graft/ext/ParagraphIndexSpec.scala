package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The paragraph-registry laws: incremental scrubbing equals the
  * from-scratch global pass (the min-law composition), registered
  * keepers never update, appends are presence-idempotent, and
  * compaction preserves the registry.
  */
class ParagraphIndexSpec extends SparkSpec {
  import spark.implicits._

  private def paras(rows: (Long, Int, String)*) =
    rows.toDF("id", "idx", "para")

  private def scrub(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.paragraphDedup(df, col("id"), col("idx"), col("para"))

  test("incremental batch scrub equals the from-scratch global pass") {
    val base = paras((1L, 0, "unique one"), (1L, 1, "footer"),
      (2L, 0, "unique two"), (2L, 1, "footer"))
    val batch = paras((3L, 0, "footer"), (3L, 1, "fresh a"),
      (4L, 0, "fresh a"), (4L, 1, "fresh b"))
    val root = tmpDir("para_idx") + "/ix"
    ParagraphIndex.build(base, col("id"), col("idx"), col("para"), root)
    val inc = ParagraphIndex.dedupBatch(spark, root, batch,
        col("id"), col("idx"), col("para"))
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    val global = scrub(base.unionByName(batch)).filter(col("id") >= 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(inc === global)
    // the planted cross-batch dup ("footer") is gone, the batch-internal
    // dup ("fresh a") keeps only its batch-first occurrence
    assert(inc === Seq((3L, 2L, 1L, "fresh a"), (4L, 2L, 1L, "fresh b")))
  }

  test("append registers only NEW hashes; keepers never update") {
    val base = paras((5L, 0, "alpha"), (5L, 1, "beta"))
    val root = tmpDir("para_keep") + "/ix"
    ParagraphIndex.build(base, col("id"), col("idx"), col("para"), root)
    // a later batch re-sends "alpha" from a smaller (id, idx): the
    // registry must NOT adopt it — arrival order is the law
    val batch = paras((1L, 0, "alpha"), (1L, 1, "gamma"))
    ParagraphIndex.append(spark, root, batch,
      col("id"), col("idx"), col("para"))
    val reg = IndexStore.snapshot(spark, root).read("keepers").get
      .orderBy("h").as[(String, Long, Int)].collect().toSeq
    assert(reg.map(_._2).toSet === Set(5L, 1L))
    val alphaKeeper = reg.find(_._2 == 5L)
    assert(alphaKeeper.isDefined) // alpha still keyed to doc 5
    assert(reg.size === 3)        // alpha, beta, gamma — no dup rows
  }

  test("append of an all-seen batch publishes nothing") {
    val base = paras((1L, 0, "x"), (1L, 1, "y"))
    val root = tmpDir("para_noop") + "/ix"
    ParagraphIndex.build(base, col("id"), col("idx"), col("para"), root)
    val v1 = IndexStore.snapshot(spark, root).version
    val v2 = ParagraphIndex.append(spark, root,
      paras((9L, 0, "x"), (9L, 1, "y")),
      col("id"), col("idx"), col("para"))
    assert(v2 === v1)
  }

  test("compact folds segments; scrub results unchanged") {
    val root = tmpDir("para_cmp") + "/ix"
    ParagraphIndex.build(paras((1L, 0, "a")),
      col("id"), col("idx"), col("para"), root)
    (2L to 5L).foreach { i =>
      ParagraphIndex.append(spark, root, paras((i, 0, s"p$i")),
        col("id"), col("idx"), col("para"))
    }
    val probe = paras((10L, 0, "p3"), (10L, 1, "new one"))
    val before = ParagraphIndex.dedupBatch(spark, root, probe,
      col("id"), col("idx"), col("para")).collect().toSeq
    assert(ParagraphIndex.maybeCompact(spark, root, maxSegments = 2))
    assert(IndexStore.segmentCount(spark, root) === 1)
    val after = ParagraphIndex.dedupBatch(spark, root, probe,
      col("id"), col("idx"), col("para")).collect().toSeq
    assert(before === after)
  }
}
