package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The ingest orchestration laws — the append mirror of [[TakedownSpec]]:
  * one durable delivery intent drives every registered surface, a
  * killed-and-replayed admit converges to exactly the state a clean
  * one-shot admit produces (live-presence idempotence, no
  * double-insert), and re-admitting a delivery is a no-op.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha bravo charlie delta"),
    (2L, "alpha bravo echo foxtrot"),
    (3L, "golf hotel india juliet"),
    (4L, "kilo lima mike november"),
  ).toDF("doc_id", "text")

  private def embs = Seq(
    (1L, Array(1.0, 0.0, 0.0)),
    (2L, Array(0.9, 0.1, 0.0)),
    (3L, Array(0.0, 1.0, 0.0)),
    (4L, Array(0.0, 0.0, 1.0)),
  ).toDF("vec_id", "embedding")

  /** store + bm25 + literal + ivf under one registry root. */
  private def setup(): (String, String, String, String, String) = {
    val root = tmpDir("ing_root")
    val store = tmpDir("ing_store")
    val bm25 = tmpDir("ing_bm25")
    val lit = tmpDir("ing_lit")
    val ivf = tmpDir("ing_ivf")
    CorpusStore.build(
      docs.select(col("doc_id").as("id"), col("text"))
        .join(embs.select(col("vec_id").as("id"), col("embedding").as("emb")),
          Seq("id")),
      col("id"), store)
    TextSearch.buildAndSave(docs, col("doc_id"), col("text"), bm25,
      buckets = 4)
    LiteralIndex.buildAndSave(docs, col("doc_id"), col("text"), lit,
      n = 4, buckets = 4)
    IvfIndex.save(IvfIndex.build(embs, k = 2), ivf)
    Takedown.register(spark, root, Takedown.Surface("store", store))
    Takedown.register(spark, root, Takedown.Surface("bm25", bm25))
    Takedown.register(spark, root, Takedown.Surface("literal", lit))
    Takedown.register(spark, root, Takedown.Surface("ivf", ivf))
    (root, store, bm25, lit, ivf)
  }

  private def delivery = Seq(
    (9L, "alpha zulu yankee xray", Array(0.95, 0.05, 0.0)),
    (10L, "papa quebec romeo sierra", Array(0.0, 0.1, 0.9)),
  ).toDF("id", "text", "emb")

  private def storeIds(path: String): Set[Long] =
    CorpusStore.read(spark, path).select("id").as[Long].collect().toSet

  private def bm25Ids(path: String): Set[Long] =
    TextSearch.searchSaved(spark, path,
        Seq((1L, Seq("zulu", "papa", "golf"))).toDF("qid", "qterms"),
        col("qid"), col("qterms"), k = 10)
      .select("id").as[Long].collect().toSet

  private def literalIds(path: String): Set[Long] =
    LiteralIndex.searchSaved(spark, path,
        docs.unionByName(delivery.select(col("id").as("doc_id"), col("text"))),
        col("doc_id"), col("text"),
        Seq((7L, "zulu yankee"), (6L, "quebec romeo")).toDF("nid", "needle"),
        col("nid"), col("needle"))
      .select("id").as[Long].collect().toSet

  private def ivfIds(path: String): Set[Long] = {
    val all = embs.unionByName(
      delivery.select(col("id").as("vec_id"), col("emb").as("embedding")))
    IvfIndex.search(IvfIndex.load(spark, path, all),
        col("vec_id") === 1L, k = 10, nProbe = Int.MaxValue)
      .select("neighbor_id").as[Long].collect().toSet
  }

  test("one admit() lands the delivery on every registered surface") {
    val (root, store, bm25, lit, ivf) = setup()
    val did = Ingest.admit(spark, root, delivery, col("id"))
    assert(Ingest.pending(spark, root).isEmpty, "delivery must finish")
    assert(storeIds(store) == Set(1L, 2L, 3L, 4L, 9L, 10L))
    assert(bm25Ids(bm25) == Set(3L, 9L, 10L))
    assert(literalIds(lit) == Set(9L, 10L))
    assert(ivfIds(ivf).contains(9L), "ivf must index the new vector")
    // replay of the completed delivery is a no-op: no surface version
    // moves (live-presence anti-join leaves an empty delta everywhere)
    val before = Takedown.surfaces(spark, root)
      .map(s => IndexStore.snapshot(spark, s.path).version)
    Ingest.applyIntent(spark, root, did)
    Ingest.admit(spark, root, delivery, col("id"))
    val after = Takedown.surfaces(spark, root)
      .map(s => IndexStore.snapshot(spark, s.path).version)
    assert(after == before, "re-admitting must not double-insert")
  }

  test("killed mid-flow: delivery pending, resume converges to one-shot") {
    val (root, store, bm25, lit, ivf) = setup()
    // land the intent durably, then apply only the FIRST surface (the
    // store — apply order puts the source of truth first)
    delivery.write.parquet(s"$root/_deliveries/d-crash/rows")
    Ingest.applyIntent(spark, root, "d-crash", upTo = 1)
    assert(storeIds(store).contains(9L), "store applies first")
    assert(bm25Ids(bm25) == Set(3L), "bm25 must not have applied yet")
    assert(Ingest.pending(spark, root) == Seq("d-crash"))
    assert(Ingest.resume(spark, root) == Seq("d-crash"))
    assert(Ingest.pending(spark, root).isEmpty)
    assert(bm25Ids(bm25) == Set(3L, 9L, 10L))
    assert(literalIds(lit) == Set(9L, 10L))
    assert(ivfIds(ivf).contains(9L))
    assert(Ingest.resume(spark, root).isEmpty)
  }

  test("crash between a surface's commit and its marker: no double-insert") {
    val (root, _, bm25, _, _) = setup()
    // the worst crash window: bm25's append COMMITTED but its done-
    // marker never landed. Simulate by applying store+bm25, then
    // deleting bm25's marker before resume.
    delivery.write.parquet(s"$root/_deliveries/d-window/rows")
    Ingest.applyIntent(spark, root, "d-window", upTo = 2)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marks = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_deliveries/d-window"))
      .map(_.getPath).filter(_.getName.startsWith("done-"))
    assert(marks.length == 2)
    marks.foreach(m => fs.delete(m, false))
    val v = IndexStore.snapshot(spark, bm25).version
    Ingest.resume(spark, root)
    // replay re-ran bm25's apply, but the live-presence anti-join left
    // an empty delta — no new segment, version unchanged
    assert(IndexStore.snapshot(spark, bm25).version == v)
    assert(bm25Ids(bm25) == Set(3L, 9L, 10L))
  }

  test("crash during the rows write leaves a never-landed delivery") {
    val (root, store, _, _, _) = setup()
    delivery.write.parquet(s"$root/_deliveries/d-halfwrit/rows-staging")
    assert(Ingest.pending(spark, root).isEmpty)
    assert(Ingest.resume(spark, root).isEmpty)
    assert(storeIds(store) == Set(1L, 2L, 3L, 4L))
    // and the wreck does not block later deliveries
    Ingest.admit(spark, root, delivery, col("id"))
    assert(storeIds(store).contains(9L))
  }

  test("retract-then-admit re-adds the ids on every surface") {
    val (root, store, bm25, _, _) = setup()
    Ingest.admit(spark, root, delivery, col("id"))
    Takedown.retract(spark, root, Seq(9L).toDF("id"), col("id"))
    assert(!storeIds(store).contains(9L) && !bm25Ids(bm25).contains(9L))
    Ingest.admit(spark, root, delivery, col("id"))
    assert(storeIds(store).contains(9L), "scoped tombstones must unmask")
    assert(bm25Ids(bm25).contains(9L))
  }

  test("admit refuses a delivery missing a needed column before logging it") {
    val (root, _, _, _, _) = setup()
    assertThrows[IllegalArgumentException] {
      Ingest.admit(spark, root, delivery.drop("emb"), col("id"))
    }
    assertThrows[IllegalArgumentException] {
      Ingest.admit(spark, root,
        delivery.select(col("id"), col("emb")), col("id"))
    }
    assert(Ingest.pending(spark, root).isEmpty, "no intent may have landed")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_deliveries")))
  }
}
