package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 8 base docs; d0b/d1b are near-dups of d0/d1; d7 is an exact dup of d6.
  private lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "spark shuffles data between stages when keys move across partitions"),
    (2L, "completely different content about cooking pasta with fresh basil"),
    (3L, "another unrelated doc that talks about mountain hiking in spring"),
    (4L, "yet more filler text describing database query optimization rules"),
    (5L, "totally unique sentence with distinctive vocabulary choices here"),
    (6L, "same exact text appears twice in this tiny corpus for testing"),
    (7L, "same exact text appears twice in this tiny corpus for testing"),
    (10L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (11L, "spark shuffles data between stages when keys move across machines"),
  ).toDF("id", "t")

  test("exact dedup groups duplicate texts deterministically") {
    val groups = Dedup.exactGroups(docs, col("t"), col("id"))
    assert(groups.count() == 9) // 10 docs, one exact dup pair
    val dup = groups.filter(col("n_copies") === 2).collect()(0)
    assert(dup.getAs[Long]("keeper_id") == 6L)
  }

  test("n-gram jaccard finds planted near-dups and nothing else") {
    val pairs = Dedup.jaccardPairs(docs, col("id"), col("t"),
      n = 3, threshold = 0.5, maxDF = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 10L), (1L, 11L), (6L, 7L)))
  }

  test("minhash-LSH dedup agrees with exact jaccard on planted dups") {
    val pairs = Dedup.minhashDedup(docs, col("id"), col("t"),
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 10L), (1L, 11L), (6L, 7L)))
  }

  test("sharded candidate verification yields identical pairs") {
    val sh = Dedup.hashedShingles(docs, col("id"), col("t"), n = 3)
    val cands = Dedup.minhashCandidates(
      Dedup.minhashBuckets(docs, col("id"), col("t")))
    val unsharded = Dedup.verifyJaccard(cands, sh, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // 3 shards over a handful of candidates forces every shard plan to
    // execute (incl. at least one multi-candidate shard) and the union to
    // reassemble the exact same pair set with identical scores
    val sharded = Dedup.verifyJaccard(cands, sh, threshold = 0.5, shards = 3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(unsharded.nonEmpty)
    assert(sharded == unsharded)
    val e2e = Dedup.minhashDedup(docs, col("id"), col("t"),
      n = 3, threshold = 0.5, verifyShards = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(e2e == Set((0L, 10L), (1L, 11L), (6L, 7L)))
  }

  test("auto-sharding: over-budget map shards, output unchanged") {
    // the estimator math itself
    assert(Dedup.chooseShards(docs = 10, totalShingles = 100,
      budgetBytes = 256L << 20) == 1)
    assert(Dedup.chooseShards(docs = 1000000, totalShingles = 100000000,
      budgetBytes = 256L << 20) == 7) // ~1.68 GB over a 256 MB budget
    assert(Dedup.chooseShards(docs = Int.MaxValue, totalShingles = 1L << 40,
      budgetBytes = 256L << 20) == 64) // capped
    // behavior: a budget smaller than this corpus's map forces the
    // sharded plan, whose union must equal the unsharded result exactly
    val sh = Dedup.hashedShingles(docs, col("id"), col("t"), n = 3)
    val cands = Dedup.minhashCandidates(
      Dedup.minhashBuckets(docs, col("id"), col("t")))
    val unsharded = Dedup.verifyJaccard(cands, sh, threshold = 0.5, shards = 1)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val auto = Dedup.verifyJaccard(cands, sh, threshold = 0.5,
      shards = Dedup.AutoShards, autoBudgetBytes = 4096)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(unsharded.nonEmpty)
    assert(auto == unsharded)
  }

  test("containment is asymmetric: quote inside a page, not the reverse") {
    val page = "the quick brown fox jumps over the lazy dog near the river " +
      "bank and then a completely different second half about cooking " +
      "pasta with fresh basil and olive oil on a warm summer evening"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, page),
      (3L, "entirely unrelated content about mountain hiking in spring")
    ).toDF("id", "t")
    val got = Dedup.containmentPairs(corpus, col("id"), col("t"),
      n = 3, threshold = 0.8, maxDF = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // doc 1 is contained in page 2; the page is NOT contained in doc 1
    assert(got == Set((1L, 2L)))
  }

  test("minhash candidates are a superset of true near-dup pairs") {
    val cands = Dedup.minhashCandidates(
      Dedup.minhashBuckets(docs, col("id"), col("t")))
      .as[(Long, Long)].collect().toSet
    assert(Set((0L, 10L), (1L, 11L), (6L, 7L)).subsetOf(cands))
  }

  test("simhash: exact dups and bag-of-words reorderings at distance 0") {
    // SimHash over the token multiset is order-invariant: a shuffled copy
    // must collide exactly; a single-word swap on a short doc legitimately
    // flips many bits (few votes per bit), so near-dup detection via
    // simhash is only meaningful for long docs / tiny relative edits.
    val reordered = docs.unionAll(Seq(
      (20L, "dog lazy the near jumps fox brown quick the over bank river the"),
    ).toDF("id", "t"))
    val pairs = Dedup.simhashPairs(reordered, col("id"), col("t"),
      maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((6L, 7L)) == 0)
    assert(byPair((0L, 20L)) == 0, s"reordering must collide: $byPair")
  }

  test("dedup idempotence: appending the dedup output to itself is empty") {
    val deduped = docs.dropDuplicates("t")
    val again = graft.billing.Ingest.newRows(deduped, deduped, Seq("t"))
    assert(again.count() == 0)
  }

  test("dup clusters: min-label propagation over a multi-hop chain") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // chain 1-2-3-7 (diameter 3, forces >1 round), isolated 4, pair 5-6
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("dup clusters: large-star/small-star matches propagation") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // same graph as the propagation test: multi-hop chain, isolate, pair,
    // plus duplicate/self edges the canonicalization must absorb
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (5L, 6L),
      (1L, 2L), (4L, 4L)).toDF("id_a", "id_b")
    val star = Dedup.dupClustersStar(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("incremental components equal the batch run, untouched rows verbatim") {
    // old graph: chain 1-2-3, pair 5-6, isolates 4 and 9
    val oldNodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("id")
    val oldPairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val prev = Dedup.dupClustersStar(oldNodes, oldPairs)
    // delta: new node 0 bridges clusters {1,2,3} and {5,6} (new min 0),
    // new nodes 7-8 form their own pair, old isolate 4 joins {5,6};
    // old isolate 9 and nothing else must be recomputed
    val newNodes = Seq(0L, 7L, 8L).toDF("id")
    val newEdges = Seq((0L, 3L), (0L, 5L), (7L, 8L), (4L, 6L))
      .toDF("id_a", "id_b")
    val inc = Dedup.incrementalComponents(prev, newNodes, newEdges)
      .as[(Long, Long)].collect()
    assert(inc.length == 10) // every node exactly once
    val batch = Dedup.dupClustersStar(
      oldNodes.unionAll(newNodes),
      oldPairs.unionAll(newEdges)).as[(Long, Long)].collect().toMap
    assert(inc.toMap == batch)
    assert(inc.toMap.apply(9L) == 9L)
  }

  test("incremental components: delta touching nothing old is label-only work") {
    val prev = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster")
    val inc = Dedup.incrementalComponents(prev,
        Seq(10L, 11L, 12L).toDF("id"),
        Seq((10L, 11L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 12L))
  }
}
