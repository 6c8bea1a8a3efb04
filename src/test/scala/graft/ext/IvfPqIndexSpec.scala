package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def embs = Tables.embeddings(spark, sf0001).limit(200)

  test("exhaustive probes + corpus-wide shortlist equals brute force") {
    // with every cell probed and the shortlist covering the corpus, the
    // exact-cosine re-rank sees everything — any lost/duplicated row or
    // a residual-encode geometry bug breaks the equality
    val model = IvfPqIndex.build(embs, kCells = 4, m = 4, k = 16)
    val got = IvfPqIndex.search(model, col("vec_id") < 5, k = 3,
        nProbe = Int.MaxValue, shortlist = 1000)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") < 5, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
  }

  test("bounded probes + ADC shortlist holds a recall floor") {
    val model = IvfPqIndex.build(embs, kCells = 8, m = 8, k = 32)
    val ann = IvfPqIndex.search(model, col("vec_id") < 5, k = 5,
      nProbe = 4, shortlist = 8)
    val brute = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") < 5, 5)
    val hits = ann.select("query_id", "neighbor_id")
      .intersect(brute.select("query_id", "neighbor_id"))
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(hits.getOrElse(q, 0L) >= 2,
        s"query $q recalled ${hits.getOrElse(q, 0L)}/5")
    }
  }

  test("encode under frozen quantizers matches the build's own encoding") {
    val model = IvfPqIndex.build(embs, kCells = 4, m = 4, k = 16)
    val rederived = IvfPqIndex.encode(model, embs)
      .select("vec_id", "cell", "code")
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (id, c, code) => id -> ((c, code)) }.toMap
    val built = model.encoded.select("vec_id", "cell", "code")
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (id, c, code) => id -> ((c, code)) }.toMap
    assert(rederived == built)
  }

  test("save/saveAppend/load answers like the in-memory index") {
    val base = embs.filter(col("vec_id") % 5 =!= 0)
    val delta = embs.filter(col("vec_id") % 5 === 0)
    val model = IvfPqIndex.build(base, kCells = 4, m = 4, k = 16)
    val dir = graft.Gate.tmpDir("ivfpq_save_")
    IvfPqIndex.save(model, dir)
    IvfPqIndex.saveAppend(model, delta, dir)
    val loaded = IvfPqIndex.load(spark, dir, embs)
    assert(loaded.encoded.count() == embs.count())
    val mem = IvfPqIndex.append(model, delta)
    val a = IvfPqIndex.search(loaded, col("vec_id") < 5, k = 3,
      nProbe = 2, shortlist = 8).orderBy("query_id", "rank")
    val b = IvfPqIndex.search(mem, col("vec_id") < 5, k = 3,
      nProbe = 2, shortlist = 8).orderBy("query_id", "rank")
    assert(rows(a) == rows(b))
  }

  test("deleteVecs masks, compact removes physically, loadAt pins") {
    val model = IvfPqIndex.build(embs, kCells = 4, m = 4, k = 16)
    val dir = graft.Gate.tmpDir("ivfpq_del_")
    IvfPqIndex.save(model, dir)
    val v0 = IndexStore.snapshot(spark, dir).version
    IvfPqIndex.deleteVecs(spark, dir,
      embs.filter(col("vec_id") % 5 === 1).select("vec_id"), col("vec_id"))
    def res(m: IvfPqIndex.Model) =
      IvfPqIndex.search(m, col("vec_id") < 5, k = 3,
          nProbe = Int.MaxValue, shortlist = 1000)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val brute = EmbeddingSearch.bruteForceTopK(
        embs.filter(col("vec_id") % 5 =!= 1), col("vec_id") < 5, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(res(IvfPqIndex.load(spark, dir, embs)) == brute)
    IvfPqIndex.compact(spark, dir, retainVersions = 8)
    val snap = IndexStore.snapshot(spark, dir)
    assert(snap.read("tombstones").isEmpty)
    assert(snap.read("codes").get.select("vec_id").as[Long]
      .collect().forall(_ % 5 != 1))
    assert(res(IvfPqIndex.load(spark, dir, embs)) == brute)
    // pre-delete version still answers over the full corpus
    val bruteAll = EmbeddingSearch.bruteForceTopK(embs, col("vec_id") < 5, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(res(IvfPqIndex.loadAt(spark, dir, v0, embs)) == bruteAll)
  }

  test("external query vectors rank an identical corpus row first") {
    val model = IvfPqIndex.build(embs, kCells = 4, m = 4, k = 16)
    val queries = embs.filter(col("vec_id") < 3)
    val hits = IvfPqIndex.searchVectors(model, queries, k = 1,
        nProbe = Int.MaxValue, shortlist = 1000)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(hits(q) == q))
  }
}
