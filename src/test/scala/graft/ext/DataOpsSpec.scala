package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = (0L until 400L)
    .map(i => (i, s"src${i % 4}", s"document number $i body text"))
    .toDF("id", "source", "t")

  test("split assignment is deterministic and roughly 80/10/10") {
    val counts = DataOps.stratifiedSplit(docs, col("id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 400)
    assert(counts("train") > 280 && counts("train") < 360)
    assert(counts("val") > 10 && counts("test") > 10)
    // re-running (fresh plan, different partitioning) gives identical rows
    val again = DataOps.stratifiedSplit(docs.repartition(7), col("id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("split is assigned per-id, independent of other rows") {
    val full = DataOps.stratifiedSplit(docs, col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    val subset = DataOps.stratifiedSplit(docs.filter(col("id") < 50), col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("groupSplit keeps every group member in one split; " +
      "ungrouped rows fall back to their own id") {
    // groups of 4 consecutive ids; ids >= 200 ungrouped
    val groups = (0L until 200L).map(i => (i, (i / 4) * 4))
      .toDF("id", "cluster")
    val got = DataOps.groupSplit(docs, col("id"), groups)
      .select("id", "split").as[(Long, String)].collect().toMap
    (0L until 200L by 4).foreach { g =>
      val splits = (g until g + 4).map(got).toSet
      assert(splits.size == 1, s"group $g straddles: $splits")
    }
    // ungrouped rows match the per-id assignment exactly
    val solo = DataOps.stratifiedSplit(docs, col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    (200L until 400L).foreach(i => assert(got(i) == solo(i)))
    // grouped rows take the REPRESENTATIVE's per-id assignment
    (0L until 200L).foreach(i => assert(got(i) == solo((i / 4) * 4)))
    // an id mapped to several groups resolves to min-cluster and NEVER
    // duplicates corpus rows
    val multi = Seq((5L, 100L), (5L, 4L)).toDF("id", "cluster")
    val dup = DataOps.groupSplit(docs, col("id"), multi)
    assert(dup.count() == 400)
    assert(dup.filter(col("id") === 5L).select("split")
      .as[String].head() == solo(4L))
  }

  test("weighted mix keeps all rows at weight 1.0 and none at 0.0") {
    val w = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5, "src3" -> 0.5)
    val kept = DataOps.weightedMix(docs, col("id"), col("source"), w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("src0") == 100) // w=1.0 must keep ALL (the "100"-hex bug)
    assert(!kept.contains("src1"))
    val mid = kept("src2") + kept("src3")
    assert(mid > 60 && mid < 140) // ~50% of 200, hash-uniform
  }

  test("weighted mix keeps sources absent from the weight map") {
    val kept = DataOps.weightedMix(docs, col("id"), col("source"),
        Map("src0" -> 0.5))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("src1") == 100 && kept("src2") == 100 && kept("src3") == 100)
  }

  test("weighted resample: integer weights give exact copy counts") {
    val w = Map("src0" -> 2.0, "src1" -> 0.0, "src2" -> 1.5)
    val out = DataOps.weightedResample(docs, col("id"), col("source"), w)
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts("src0") == 200) // exactly 2 copies each of 100 rows
    assert(!counts.contains("src1")) // weight 0 drops all
    assert(counts("src2") > 110 && counts("src2") < 190) // ~150
    assert(counts("src3") == 100) // absent from map -> 1 copy
    // copy_idx distinguishes copies: (id, copy_idx) is unique
    assert(out.select("id", "copy_idx").distinct().count() == out.count())
  }

  test("sequence packing: offsets are contiguous and repartition-stable") {
    val withTok = docs.withColumn("n_tok", lit(10) + (col("id") % 7))
    val packed = DataOps.packSequences(withTok, col("id"), col("n_tok"),
      budget = 100, buckets = 4, seed = "t")
    // within a bucket, pack ids are dense from 0 and each pack's docs
    // START inside the pack's token window
    val stats = packed.groupBy("pack_bucket", "pack_id")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("tok"))
      .collect()
    val byBucket = stats.groupBy(_.getAs[Long]("pack_bucket"))
    byBucket.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq)
    }
    // byte-identical under different input partitioning
    val again = DataOps.packSequences(withTok.repartition(13), col("id"),
      col("n_tok"), budget = 100, buckets = 4, seed = "t")
      .select("id", "pack_bucket", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    val first = packed.select("id", "pack_bucket", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(first == again)
  }

  test("decontamination flags exactly the docs sharing a 7-gram with bench") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta something else here"),
      (2L, "totally clean document with no overlap whatsoever in words"),
    ).toDF("id", "t")
    val bench = Seq("alpha beta gamma delta epsilon zeta eta").toDF("bt")
    val out = DataOps.decontaminate(corpus, col("id"), col("t"),
        bench, col("bt"), n = 7)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> true, 1L -> true, 2L -> false))
  }

  test("negative sampling is deterministic, pool-bounded, and positive-free") {
    val queries = docs.filter(col("id") < 3)
    val neg = DataOps.negativeSample(docs, col("id"), queries, col("id"),
      k = 4, poolSize = 16)
    val got = neg.as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // k per query, never the query itself
    assert(got.length == 12)
    assert(got.forall { case (q, _, id) => q != id })
    // re-run under different partitioning: identical pairs
    val again = DataOps.negativeSample(docs.repartition(7), col("id"),
        queries, col("id"), k = 4, poolSize = 16)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq == got.toSeq)
    // every negative comes from the hash-ranked pool
    val pool = docs
      .select(col("id"), md5(concat(lit("pool:"), col("id").cast("string")))
        .as("pk"))
      .orderBy("pk", "id").limit(16).select("id")
      .as[Long].collect().toSet
    assert(got.forall { case (_, _, id) => pool.contains(id) })
    // supplied positive pairs are excluded and replaced by the next draw
    val positives = got.filter(_._2 == 1)
      .map { case (q, _, id) => (q, id) }.toSeq
      .toDF("query_id", "id")
    val excl = DataOps.negativeSample(docs, col("id"), queries, col("id"),
        k = 4, poolSize = 16, positives = Some(positives))
      .as[(Long, Int, Long)].collect()
    val exclPairs = excl.map { case (q, _, id) => (q, id) }.toSet
    assert(positives.as[(Long, Long)].collect().forall(p => !exclPairs(p)))
    assert(excl.length == 12)
  }

  test("selectUnderBudget keeps the best-first prefix that fits") {
    val d = Seq((1L, 5.0, 40L), (2L, 9.0, 50L), (3L, 7.0, 30L),
      (4L, 9.0, 25L)).toDF("i", "q", "toks")
    // order: (2: q=9, i=2), (4: q=9, i=4), (3: q=7), (1: q=5)
    // cums:   50,            75,            105 > 100 → stop
    val got = DataOps.selectUnderBudget(d, col("i"), col("q"),
      col("toks"), budget = 100L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 50L, 4L -> 75L))
  }

  test("selectUnderBudgetBy fills each group's own budget independently") {
    val d = Seq(
      ("web", 1L, 5.0, 40L), ("web", 2L, 9.0, 50L), ("web", 3L, 7.0, 30L),
      ("code", 10L, 2.0, 60L), ("code", 11L, 8.0, 45L),
      ("math", 20L, 1.0, 10L)).toDF("src", "i", "q", "toks")
    // web budget 80: keep 2 (cum 50), 3 (cum 80), not 1;
    // code budget 45: keep 11 only; math has NO budget row → dropped
    val budgets = Seq(("web", 80L), ("code", 45L)).toDF("grp", "budget")
    val got = DataOps.selectUnderBudgetBy(d, col("src"), col("i"),
        col("q"), col("toks"), budgets)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 50L, 3L -> 80L, 11L -> 45L))
  }

  test("profile: null counts, exact distincts, stringified min/max") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "a"),
      (2L, null)).toDF("num", "s")
    val got = DataOps.profile(df, Seq("num", "s")).orderBy("column")
      .collect().map(_.toSeq)
    assert(got.toSeq == Seq(
      Seq(4L, "num", 1L, 2L, "1", "2"),
      Seq(4L, "s", 1L, 2L, "a", "b")))
  }

  test("PII scrubbing redacts email, IPv4, and phone, leaving prose intact") {
    val out = Seq(
      "mail me at jane.doe+x@corp.example.org thanks",
      "server at 10.0.42.7 timed out",
      "call +1 415-555-0042 today",
      "no pii here at all, just words and 42 numbers",
    ).toDF("t").select(TextAnalysis.scrubPii(col("t")).as("s"))
      .as[String].collect()
    assert(out(0) == "mail me at <EMAIL> thanks")
    assert(out(1) == "server at <IP> timed out")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "no pii here at all, just words and 42 numbers")
  }

  test("repetition signals: dup-2gram ratio, mean word length, symbol ratio") {
    val row = Seq("ab ab ab ab").toDF("t").select(
      TextAnalysis.dupNgramRatio(TextAnalysis.tokens(col("t")), 2).as("d"),
      TextAnalysis.meanWordLen(TextAnalysis.tokens(col("t"))).as("m"),
      TextAnalysis.symbolRatio(lit("a,b!c")).as("s"),
    ).as[(Double, Double, Double)].collect()(0)
    // 3 bigrams, all identical -> 1 - 1/3
    assert(math.abs(row._1 - (1.0 - 1.0 / 3)) < 1e-9)
    assert(row._2 == 2.0)
    assert(math.abs(row._3 - 0.4) < 1e-9)
  }

  test("temperature mix flattens a skewed mixture toward uniform") {
    // 300/80/20: natural mixture 75/20/5%; alpha=0.5 targets
    // p ∝ sqrt(n) = 61.3/31.7/15.8% of the SAME total
    val skewed = (0L until 400L).map { i =>
      val s = if (i < 300) "big" else if (i < 380) "mid" else "tiny"
      (i, s)
    }.toDF("id", "src")
    val out = DataOps.temperatureMix(skewed, col("id"), col("src"),
        alpha = 0.5)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val total = out.values.sum
    assert(math.abs(total - 400L) < 40) // expected N preserved (hash noise)
    // tiny upsampled ~3.2x, big downsampled ~0.82x
    assert(out("tiny") > 40 && out("tiny") < 90)
    assert(out("big") < 300 && out("big") > 200)
    // alpha=1 is the identity mixture: every rate 1.0, nothing resampled
    val nat = DataOps.temperatureMix(skewed, col("id"), col("src"),
        alpha = 1.0)
      .groupBy("src").agg(countDistinct("id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(nat == Map("big" -> 300L, "mid" -> 80L, "tiny" -> 20L))
  }

  test("hashed n-gram counts: unigrams + bigrams, feature total per doc") {
    val d = Seq((1L, "a b c"), (2L, "x")).toDF("id", "t")
    val f = DataOps.hashedNgramCounts(d, col("id"), col("t"), 64)
    val totals = f.groupBy("id").agg(sum("cnt").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(totals(1L) == 5) // 3 unigrams + 2 bigrams
    assert(totals(2L) == 1) // 1 unigram, no bigram
  }

  test("importance weights favor target-like documents") {
    val corpus = (0L until 40L).map { i =>
      val t = if (i % 2 == 0) "alpha beta common tone"
              else "gamma delta common tone"
      (i, t)
    }.toDF("id", "t")
    val target = corpus.filter(col("id") % 2 === 0)
    val w = DataOps.importanceWeights(corpus, col("id"), col("t"),
        target, col("t"), buckets = 1024)
      .as[(Long, Long, Double)].collect()
    val byId = w.map(r => r._1 -> r._3).toMap
    val evens = byId.filter(_._1 % 2 == 0).values
    val odds = byId.filter(_._1 % 2 == 1).values
    // every alpha doc outweighs every gamma doc under the alpha target
    assert(evens.min > odds.max)
    // n_feat = tokens + bigrams = 4 + 3
    assert(w.forall(_._2 == 7))
    // invariant under physical layout
    val again = DataOps.importanceWeights(corpus.repartition(7), col("id"),
        col("t"), target, col("t"), buckets = 1024)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(byId.forall { case (k, v) => math.abs(again(k) - v) < 1e-9 })
  }

  test("gumbel top-k: deterministic per seed, dominated by large weights") {
    val w = (0L until 200L).map(i => (i, 0.0)).toDF("id", "lw")
      .withColumn("lw", when(col("id") === 77L, 100.0).otherwise(0.0))
    val pick = DataOps.gumbelTopK(w, col("id"), col("lw"), k = 10)
      .select("rn", "id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    // +100 exceeds the hash-Gumbel range (~[-4, 34]) -> always rank 1
    assert(pick.head == (1, 77L))
    val again = DataOps.gumbelTopK(w.repartition(5), col("id"), col("lw"),
      k = 10).select("rn", "id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(again == pick)
    val other = DataOps.gumbelTopK(w, col("id"), col("lw"), k = 10,
      seed = "g2").select("rn", "id").as[(Int, Long)].collect().toSeq
      .sortBy(_._1)
    assert(other.head._2 == 77L) // the dominant weight still wins
    assert(other != pick)        // but the tail sample is a fresh draw
  }

  test("quantile buckets match the single-window spelling per group") {
    val d = (0L until 100L)
      .map(i => (s"g${i % 3}", i, (i * 37 % 100).toDouble))
      .toDF("g", "id", "s")
    val got = DataOps.quantileBuckets(d, col("g"), col("id"), col("s"), 4)
      .select("grp", "id", "rank", "bucket")
      .as[(String, Long, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("s").desc, col("id"))
    val want = d
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .withColumn("bucket",
        floor((col("rank") - 1) * lit(4.0) / col("n")).cast("int"))
      .select("g", "id", "rank", "bucket")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("stratified sample: k per group, layout-stable, seed-sensitive") {
    val d = (0L until 90L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val got = DataOps.stratifiedSample(d, col("g"), col("id"), k = 4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got.size == 12)
    assert(got.groupBy(_._1).forall(_._2.size == 4))
    // matches the plain per-group window spelling
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(md5(concat(lit("s1:"), col("id").cast("string"))), col("id"))
    val want = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got == want)
    // repartition-stable; a different seed draws a different set
    val again = DataOps.stratifiedSample(d.repartition(7), col("g"),
      col("id"), k = 4).select("grp", "id")
      .as[(String, Long)].collect().toSet
    assert(again == got)
    val other = DataOps.stratifiedSample(d, col("g"), col("id"), k = 4,
      seed = "s2").select("grp", "id").as[(String, Long)].collect().toSet
    assert(other != got)
    // a group smaller than k returns whole
    val tiny = DataOps.stratifiedSample(d.filter(col("id") < 2), col("g"),
      col("id"), k = 4).count()
    assert(tiny == 2)
  }

  test("quantile buckets: equal-depth thirds with remainder spread") {
    val d = (1L to 10L).map(i => ("g", i, 100.0 - i)).toDF("g", "id", "s")
    val b = DataOps.quantileBuckets(d, col("g"), col("id"), col("s"), 3)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    // floor((rk-1)*3/10): ranks 1-4 -> 0, 5-7 -> 1, 8-10 -> 2
    assert(b == Map(0 -> 4L, 1 -> 3L, 2 -> 3L))
  }

  test("shardPacked: seeded layout replays exactly, boundary rule holds, " +
    "written shards land the same corpus") {
    val docs = (0L until 200L).map(i => (i, 10L + i % 7))
      .toDF("doc_id", "n_tok")
    def layout() = DataOps.shardPacked(docs, col("doc_id"),
        col("n_tok"), shardTokens = 100L, seed = "w1")
      .select("doc_id", "shard", "ord")
      .as[(Long, Long, Long)].collect().toSet
    val l1 = layout()
    // byte-identical replay from (corpus, seed)
    assert(l1 === layout())
    // a different seed is a different layout
    val l2 = DataOps.shardPacked(docs, col("doc_id"), col("n_tok"),
        100L, seed = "w2")
      .select("doc_id", "shard", "ord")
      .as[(Long, Long, Long)].collect().toSet
    assert(l1 !== l2)
    // ord is the 1..n global rank; the boundary rule matches the
    // single-window reference spelling (doc belongs to the shard its
    // STARTING offset falls in, in seeded md5 order)
    assert(l1.map(_._3) === (1L to 200L).toSet)
    val byOrd = l1.toSeq.sortBy(_._3)
    val nTok = docs.as[(Long, Long)].collect().toMap
    var cum = 0L
    byOrd.foreach { case (id, shard, _) =>
      assert(shard === cum / 100L, s"doc $id")
      cum += nTok(id)
    }
    // and the written landing round-trips: partitionBy(shard) +
    // sortWithinPartitions(ord) reads back as exactly the same layout
    val out = tmpDir("shardw") + "/corpus"
    DataOps.shardPacked(docs, col("doc_id"), col("n_tok"), 100L, "w1")
      .repartition(col("shard"))
      .sortWithinPartitions("ord")
      .write.partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
      .select("doc_id", "shard", "ord")
      .as[(Long, Long, Long)].collect().toSet
    assert(back === l1)
  }

  test("shardPacked fails loudly on duplicate ids (their relative " +
      "layout would be arbitrary run to run)") {
    val docs = (0L until 50L).map(i => (i, 10L))
      .toDF("doc_id", "n_tok")
    val dup = docs.unionByName(
      Seq((7L, 11L)).toDF("doc_id", "n_tok"))
    val e = intercept[IllegalArgumentException] {
      DataOps.shardPacked(dup, col("doc_id"), col("n_tok"), 100L, "w1")
        .count()
    }
    assert(e.getMessage.contains("UNIQUE ids"))
  }

  test("k-anonymity: class sizes, sensitive diversity, both verdicts") {
    val rows = Seq(
      // class (us, a): 3 rows, 2 sensitive values -> k(3) ok, l(2) ok
      ("us", "a", "x"), ("us", "a", "y"), ("us", "a", "x"),
      // class (us, b): 1 row -> too small, 1 value -> not diverse
      ("us", "b", "x"),
      // class (de, a): 3 rows but one sensitive value -> not diverse
      ("de", "a", "z"), ("de", "a", "z"), ("de", "a", "z"),
    ).toDF("country", "seg", "diag")
    val r = DataOps.kAnonymity(rows,
        Seq(col("country"), col("seg")), col("diag"), k = 3, l = 2)
      .orderBy("q0", "q1")
      .as[(String, String, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    assert(r === Seq(
      ("de", "a", 3L, 1L, true, false),
      ("us", "a", 3L, 2L, true, true),
      ("us", "b", 1L, 1L, false, false)))
  }
}
