package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Seeds 0..2 define three orthogonal directions; members 3.. are noisy
  // scaled copies, so cluster membership and near-dup structure are known.
  private def corpus = {
    val dirs = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    val rnd = new scala.util.Random(3)
    val seeds = dirs.zipWithIndex.map { case (d, i) =>
      (i.toLong, d.map(_.toFloat)) }
    val members = (3 until 30).map { i =>
      val d = dirs(i % 3)
      val noise = d.map(x => x * (2.0 + 0.01 * rnd.nextGaussian()) +
        0.001 * rnd.nextGaussian())
      (i.toLong, noise.map(_.toFloat))
    }
    (seeds ++ members).toDF("vec_id", "embedding")
  }

  test("assignment puts every member in its direction's seed cluster") {
    val seeds = SemDedup.seedsFromCorpus(corpus, col("vec_id") < 3)
    assert(seeds.map(_._1) == Seq(0L, 1L, 2L))
    val asg = SemDedup.assign(corpus, seeds)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(asg.length == 30)
    assert(asg.forall { case (id, c) => c == id % 3 })
  }

  test("near-identical members are marked dup, keeper is lowest id") {
    val out = SemDedup.dedup(corpus, col("vec_id") < 3, tau = 0.999)
      .select("vec_id", "cluster", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // each cluster's lowest id (its seed, 0/1/2) survives; every other
    // member is within tau of it (same direction, tiny noise) → dup
    val (keepers, dups) = out.partition(!_._3)
    assert(keepers.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(dups.length == 27)
  }

  test("k-means centroids work as seeds (the production quantizer path)") {
    // IvfIndex's coarse quantizer supplies the seeds instead of corpus
    // rows — the swap the scaladoc promises. Centroid ids become cluster
    // ids; members still land with their direction's centroid.
    val model = IvfIndex.build(corpus, k = 3, sampleFraction = 1.0)
    val seeds = model.centroids.collect()
      .map(r => (r.getAs[Int]("cell").toLong,
        r.getSeq[Double](r.fieldIndex("cv"))))
      .sortBy(_._1).toSeq
    val marked = SemDedup.mark(SemDedup.assign(corpus, seeds), tau = 0.999)
    // same-direction members share a cluster: exactly 3 clusters, each
    // with one keeper (the lowest id assigned to it)
    val byCluster = marked.select("vec_id", "cluster", "is_dup")
      .as[(Long, Long, Boolean)].collect().groupBy(_._2)
    assert(byCluster.size == 3)
    byCluster.values.foreach { members =>
      assert(members.count(!_._3) == 1)
      assert(members.filter(!_._3).head._1 == members.map(_._1).min)
    }
  }

  test("tau above all pairwise cosines marks nothing") {
    val out = SemDedup.dedup(corpus, col("vec_id") < 3, tau = 1.1)
    assert(out.filter(col("is_dup")).count() == 0)
    assert(out.count() == 30)
  }

  test("maxClusterSize bounds a pathological single cluster and stays " +
      "exact under the cap") {
    // one seed → ONE cluster holding all 200 vectors: the quadratic
    // worst case the cap exists for. ids 0..9 share seed direction
    // (in-prefix dups); ids 150/151 are near-identical to each other
    // but near-orthogonal to everything low-id.
    val n = 200
    val rows = (0 until n).map { i =>
      val v =
        if (i <= 9) Array(1.0f, (0.001f * i), 0f)
        else if (i == 150 || i == 151) Array(0.9f, 1.0f, 0.0001f * i)
        else Array(1.0f, 0.5f + 0.002f * i, 0f)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val seeds = SemDedup.seedsFromCorpus(df, col("vec_id") === 0)
    val asg = SemDedup.assign(df, seeds)
    // capped: completes with |cluster| × cap pair work; dups against the
    // 10-member prefix are found, while the 150/151 pair (both outside
    // the prefix) is the documented miss
    val capped = SemDedup.mark(asg, tau = 0.9999, maxClusterSize = 10)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert((1L to 9L).forall(capped(_)), "in-prefix dups must be found")
    assert(!capped(151L), "out-of-prefix pair is the documented miss")
    // uncapped (cap >= cluster size): exact — 151 is marked against 150
    val exact = SemDedup.mark(asg, tau = 0.9999, maxClusterSize = n)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(exact(151L))
    // and for the normal multi-cluster corpus a generous cap changes
    // nothing vs the uncapped operator
    val s3 = SemDedup.seedsFromCorpus(corpus, col("vec_id") < 3)
    val a3 = SemDedup.assign(corpus, s3)
    val base = SemDedup.mark(a3, tau = 0.999)
      .select("vec_id", "cluster", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val withCap = SemDedup.mark(a3, tau = 0.999, maxClusterSize = 100)
      .select("vec_id", "cluster", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(withCap == base)
  }
}
