package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The durable lineage laws for [[SelectionLog]]: a recorded selection
  * replays byte-identically after later appends, the record survives
  * process boundaries (it is a file, not JVM state), and replay fails
  * loudly — naming the surface — when a root was rebuilt out-of-band
  * (incarnation mismatch) or a pinned version fell out of retention.
  */
class SelectionLogSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha bravo charlie delta"),
    (2L, "alpha bravo echo foxtrot"),
    (3L, "golf hotel india juliet"),
  ).toDF("doc_id", "text")

  private def setup(): (String, String, String) = {
    val root = tmpDir("sel_root")
    val store = tmpDir("sel_store")
    val bm25 = tmpDir("sel_bm25")
    CorpusStore.build(docs, col("doc_id"), store)
    TextSearch.buildAndSave(docs, col("doc_id"), col("text"), bm25,
      buckets = 4)
    Takedown.register(spark, root, Takedown.Surface("store", store))
    Takedown.register(spark, root, Takedown.Surface("bm25", bm25))
    (root, store, bm25)
  }

  private def selection(at: Map[String, Long], store: String,
      bm25: String): (Set[Long], Set[Long]) = {
    val storeIds = CorpusStore.readAt(spark, store, at("store"))
      .select("id").as[Long].collect().toSet
    val hits = TextSearch.searchSavedAt(spark, bm25, at("bm25"),
        Seq((1L, Seq("alpha", "golf"))).toDF("qid", "qterms"),
        col("qid"), col("qterms"), k = 10)
      .select("id").as[Long].collect().toSet
    (storeIds, hits)
  }

  test("record-then-replay reproduces the selection after later appends") {
    val (root, store, bm25) = setup()
    val (sid, original) = SelectionLog.run(spark, root) { vector =>
      val at = vector.map { case (s, v) => s.kind -> v }.toMap
      selection(at, store, bm25)
    }
    assert(original == (Set(1L, 2L, 3L), Set(1L, 2L, 3L)))
    assert(SelectionLog.list(spark, root) == Seq(sid))
    // the world moves on: a delivery lands on both surfaces
    val nw = Seq((9L, "alpha zulu yankee xray")).toDF("doc_id", "text")
    CorpusStore.append(spark, store, nw, col("doc_id"))
    TextSearch.appendDocs(spark, bm25, nw, col("doc_id"), col("text"))
    // current reads see the delivery; the replayed selection must not
    assert(CorpusStore.read(spark, store).count() == 4)
    val replayed = SelectionLog.replay(spark, root, sid) { vector =>
      val at = vector.map { case (s, v) => s.kind -> v }.toMap
      selection(at, store, bm25)
    }
    assert(replayed == original, "audit replay must be byte-identical")
  }

  test("replay refuses a surface rebuilt out-of-band since the record") {
    val (root, store, bm25) = setup()
    val (sid, _) = SelectionLog.run(spark, root)(identity)
    // out-of-band wipe + rebuild to the same version: version numbers
    // alone cannot distinguish this root from the recorded one
    import scala.reflect.io.Directory
    new Directory(new java.io.File(bm25)).deleteRecursively()
    TextSearch.buildAndSave(
      Seq((7L, "totally different corpus")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), bm25, buckets = 4)
    val e = intercept[IllegalArgumentException] {
      SelectionLog.replay(spark, root, sid)(_ => ())
    }
    assert(e.getMessage.contains("incarnation") &&
      e.getMessage.contains(bm25),
      s"error must name the rebuilt surface: ${e.getMessage}")
  }

  test("replay fails loudly when a pinned version fell out of retention") {
    val (root, store, bm25) = setup()
    val (sid, _) = SelectionLog.run(spark, root)(identity)
    // two compactions at retainVersions=1 push the recorded store
    // version out of the window (no lease held between record and
    // replay — the documented audit-past-retention failure mode)
    CorpusStore.compact(spark, store, retainVersions = 1)
    CorpusStore.compact(spark, store, retainVersions = 1)
    val recorded = SelectionLog.pins(spark, root, sid)
      .find(_.surface.kind == "store").get.version
    val e = intercept[Exception] {
      SelectionLog.replay(spark, root, sid)(_ => ())
    }
    assert(e.getMessage.contains(recorded.toString),
      s"error must name the unretained version: ${e.getMessage}")
  }

  test("federated record-then-replay spans registries: later deliveries " +
      "on BOTH roots are invisible to the replay") {
    // overlay registry (corrections) over a production registry — the
    // readFederated shape, each with its own store of record
    val overlayRoot = tmpDir("self_oroot")
    val prodRoot = tmpDir("self_proot")
    val overlay = tmpDir("self_ostore")
    val prod = tmpDir("self_pstore")
    CorpusStore.build(
      docs.filter(col("doc_id") === 1L)
        .withColumn("text", concat(col("text"), lit(" corrected"))),
      col("doc_id"), overlay)
    CorpusStore.build(docs, col("doc_id"), prod)
    Takedown.register(spark, overlayRoot,
      Takedown.Surface("store", overlay))
    Takedown.register(spark, prodRoot, Takedown.Surface("store", prod))
    def fedRead(): Map[Long, String] =
      CorpusStore.readFederated(spark, Seq(overlay, prod))
        .select("id", "text").as[(Long, String)].collect().toMap
    val (sid, original) = SelectionLog.runFederated(spark,
        Seq(overlayRoot, prodRoot)) { vectors =>
      assert(vectors.map(_._1) == Seq(overlayRoot, prodRoot))
      fedRead()
    }
    assert(original(1L).endsWith("corrected"))
    assert(original.keySet === Set(1L, 2L, 3L))
    // later deliveries on BOTH sides of the federation
    CorpusStore.append(spark,
      overlay, docs.filter(col("doc_id") === 2L)
        .withColumn("text", concat(col("text"), lit(" corrected"))),
      col("doc_id"))
    CorpusStore.append(spark, prod,
      Seq((9L, "zulu yankee")).toDF("doc_id", "text"), col("doc_id"))
    assert(fedRead().keySet === Set(1L, 2L, 3L, 9L)) // live view moved
    // …but the replayed federation reads the recorded commit points
    val replayed = SelectionLog.replayFederated(spark, overlayRoot, sid) {
      vectors =>
        val byRoot = vectors.toMap
        val oAt = byRoot(overlayRoot).head._2
        val pAt = byRoot(prodRoot).head._2
        val o = CorpusStore.readAt(spark, overlay, oAt)
          .select("id", "text")
        val p = CorpusStore.readAt(spark, prod, pAt)
          .select("id", "text")
          .join(o.select("id"), Seq("id"), "left_anti")
        o.unionByName(p).as[(Long, String)].collect().toMap
    }
    assert(replayed === original)
    // a root rebuilt out-of-band fails the replay NAMING root + surface
    def wipe(dir: String): Unit = {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      ()
    }
    wipe(prod)
    CorpusStore.build(docs, col("doc_id"), prod)
    val e = intercept[IllegalArgumentException] {
      SelectionLog.replayFederated(spark, overlayRoot, sid)(_ => ())
    }
    assert(e.getMessage.contains(prodRoot) && e.getMessage.contains(prod))
  }

  test("half-staged records are invisible; unknown sids fail cleanly") {
    val (root, _, _) = setup()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(root,
      "_selections/s-halfwrit-staging"))
    assert(SelectionLog.list(spark, root).isEmpty)
    assertThrows[IllegalArgumentException] {
      SelectionLog.pins(spark, root, "s-nosuch")
    }
  }
}
