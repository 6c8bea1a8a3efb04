package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.billing.{HivePaths, Ingest}
import graft.ext.TextAnalysis
import graft.functions.Hash64

/** Property-based invariants (SURVEY §5.2): roundtrips and idempotence
  * laws the engine must satisfy for arbitrary inputs. Spark-level
  * properties sample a bounded number of cases (each case is a tiny job);
  * pure functions get the full default 100.
  */
object GraftProperties extends Properties("graft") {
  // most properties here spin a small Spark job per case; 40 cases each
  // keeps the whole suite ~20 s while still sampling negatives, odd bin
  // widths, and empty intervals
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val dates = for {
    y <- Gen.choose(1970, 2100)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield (y, m, d)

  property("hivePathRoundtrip") = Prop.forAllNoShrink(Gen.listOfN(8, dates)) {
    ds =>
      val got = ds.toDF("y", "m", "d")
        .select(HivePaths.pathFor(col("y"), col("m"), col("d")).as("p"))
        .select(HivePaths.yearOf(col("p")), HivePaths.monthOf(col("p")),
          HivePaths.dayOf(col("p")))
        .as[(Int, Int, Int)].collect().toList
      got == ds
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOfN(12, word).map(_.mkString(" "))

  property("topKAggEqualsSortTakeK") = Prop.forAllNoShrink(
    Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
    Gen.choose(1, 8), Gen.choose(1, 5)) { (xs, k, parts) =>
    val got = xs.toDF("x").repartition(parts)
      .agg(org.apache.spark.sql.functions.udaf(
        new graft.functions.TopKAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("x")))
      .as[Seq[Long]].head().toList
    got == xs.sorted.reverse.take(k)
  }

  property("fingerprintWhitespaceCaseInvariance") =
    Prop.forAllNoShrink(Gen.listOfN(6, text)) { ts =>
      val mangled = ts.map(t => "  " + t.toUpperCase.replace(" ", "\t  "))
      val fp = (xs: List[String]) => xs.toDF("t")
        .select(TextAnalysis.fingerprint(col("t"))).as[String].collect().toList
      fp(ts) == fp(mangled)
    }

  property("dedupAppendIdempotence") =
    Prop.forAllNoShrink(Gen.listOfN(10, Gen.choose(0, 5))) { keys =>
      val staged = keys.zipWithIndex.map { case (k, i) => (s"k$k", i) }
        .toDF("k", "payload")
      val first = staged.dropDuplicates("k")
      // re-appending the same batch on the same key yields nothing new
      Ingest.newRows(staged, first, Seq("k")).count() == 0
    }

  property("hash64SeedIndependence") = Prop.forAll(word, word) { (a, b) =>
    // different seeds decorrelate; equal input+seed is deterministic
    (Hash64.seeded(1, a) == Hash64.seeded(1, a)) &&
      (a == b || Hash64.seeded(1, a) != Hash64.seeded(1, b) ||
        Hash64.seeded(2, a) != Hash64.seeded(2, b))
  }

  property("minhashContainment") = Prop.forAllNoShrink(
    Gen.listOfN(20, word), Gen.listOfN(3, word)) { (base, extra) =>
    // signature of (A ∪ B) is element-wise ≤ signature of A
    // (the aggregate consumes pre-hashed shingles — mirror that here)
    val agg = new graft.functions.MinHashAgg(16)
    def h(ws: List[String]) = ws.distinct.map(graft.functions.Hash64.base)
    val sigA = h(base).foldLeft(agg.zero)(agg.reduce)
    val sigAB = h(base ++ extra).foldLeft(agg.zero)(agg.reduce)
    sigA.zip(sigAB).forall { case (a, ab) => ab <= a }
  }

  property("minhashMergeIsPartitionInvariant") = Prop.forAllNoShrink(
    Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
    Gen.choose(1, 6)) { (shingles, cut) =>
    // any split of the shingle stream, reduced independently and merged,
    // must equal the single-pass signature — the exact contract Spark's
    // map-side partial aggregation relies on at scale
    val agg = new graft.functions.MinHashAgg(16)
    val whole = shingles.foldLeft(agg.zero)(agg.reduce).toSeq
    val split = shingles.grouped(cut)
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge).toSeq
    whole == split
  }

  property("simhashMergeIsPartitionInvariant") = Prop.forAllNoShrink(
    Gen.nonEmptyListOf(word), Gen.choose(1, 6)) { (toks, cut) =>
    val agg = new graft.functions.SimHashAgg
    val whole = agg.finish(toks.foldLeft(agg.zero)(agg.reduce))
    val split = agg.finish(toks.grouped(cut)
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge))
    whole == split
  }

  // binned joins vs the O(n·m) definition, arbitrary values incl.
  // negatives and bin widths that do not divide anything evenly
  private val ival = for {
    s <- Gen.choose(-40L, 40L)
    len <- Gen.choose(0L, 25L)
  } yield (s, s + len)

  property("pointIntervalEqualsNaive") = Prop.forAllNoShrink(
    Gen.listOfN(30, Gen.choose(-50L, 60L)), Gen.listOfN(8, ival),
    Gen.choose(1L, 20L)) { (ps, ivs, w) =>
    val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "p")
    val ivals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")
    val got = graft.operators.RangeJoin
      .pointInterval(points, "p", ivals, "s", "e", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val expected = (for {
      (p, i) <- ps.zipWithIndex
      ((s, e), j) <- ivs.zipWithIndex
      if p >= s && p <= e
    } yield (i.toLong, j.toLong)).sorted
    got == expected
  }

  property("intervalOverlapEqualsNaive") = Prop.forAllNoShrink(
    Gen.listOfN(10, ival), Gen.listOfN(10, ival),
    Gen.choose(1L, 20L)) { (as, bs, w) =>
    val a = as.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("aid", "as_", "ae")
    val b = bs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("bid", "bs", "be")
    val got = graft.operators.RangeJoin
      .intervalOverlap(a, "as_", "ae", b, "bs", "be", w)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val expected = (for {
      ((s1, e1), i) <- as.zipWithIndex
      ((s2, e2), j) <- bs.zipWithIndex
      if s1 <= e2 && s2 <= e1
    } yield (i.toLong, j.toLong)).sorted
    got == expected
  }
}

/** O(log n) convergence law for the large-star/small-star connected
  * components ([[graft.ext.Dedup.dupClustersStar]]): a randomly-relabeled
  * path graph has diameter n-1 — plain min-label propagation needs ~n
  * rounds — yet the star alternation must label every node with the
  * component min within log₂(n)+c rounds. Separate Properties object so
  * these few heavy iterative-job cases don't inherit the 40-case default.
  */
object StarClusterProperties extends Properties("graftStarClusters") {
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  property("chainComponentsInLogRounds") = Prop.forAllNoShrink(
    Gen.choose(24, 64), Gen.choose(0L, 1000000L)) { (n, seed) =>
    val rnd = new scala.util.Random(seed)
    // shuffled, stride-mangled ids: the path visits labels in random
    // order, so min-propagation distance genuinely spans the chain
    val ids = rnd.shuffle((0 until n).map(i => i.toLong * 7 + 3).toVector)
    val nodes = ids.toDF("id")
    val pairs = ids.sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("id_a", "id_b")
    val (labels, rounds) = graft.ext.Dedup.dupClustersStarWithRounds(
      nodes, pairs, parallelism = Some(4))
    val got = labels.as[(Long, Long)].collect()
    val mn = ids.min
    val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 5
    Prop(got.length == n) :| "all nodes labeled" &&
      Prop(got.forall(_._2 == mn)) :| s"single component rooted at $mn" &&
      Prop(rounds <= bound) :| s"rounds $rounds within log bound $bound"
  }

  /** Incremental-fold exactness ([[graft.ext.Dedup.incrementalComponents]]):
    * for a random old graph and a random delta (new nodes, plus edges
    * drawn over old ∪ new — cross-cluster bridges included), folding the
    * delta into the old labeling must equal one batch run over the
    * accumulated graph. This is the composability law the streaming
    * maintenance loop rests on.
    */
  property("incrementalEqualsBatch") = Prop.forAllNoShrink(
    Gen.choose(10, 24), Gen.choose(0, 10), Gen.choose(0L, 1000000L)) {
    (nOld, nNew, seed) =>
      val rnd = new scala.util.Random(seed)
      val oldIds = (0 until nOld).map(_.toLong * 3 + 1)
      val newIds = (0 until nNew).map(i => 1000L + i)
      def somePairs(ids: Seq[Long], m: Int) =
        if (ids.size < 2) Seq.empty
        else Seq.fill(m)((ids(rnd.nextInt(ids.size)),
          ids(rnd.nextInt(ids.size)))).filter(p => p._1 != p._2)
      val oldPairs = somePairs(oldIds, nOld / 2)
      val allIds = oldIds ++ newIds
      val newPairs = somePairs(allIds, (nNew + 2) * 2)
        // a "new" edge must touch the world, but may be old-old (drift
        // re-links), old-new, or new-new — all three shapes sampled
      val prev = graft.ext.Dedup.dupClustersStar(oldIds.toDF("id"),
        oldPairs.toDF("id_a", "id_b"), parallelism = Some(4))
      val inc = graft.ext.Dedup.incrementalComponents(prev,
          newIds.toDF("id"), newPairs.toDF("id_a", "id_b"),
          parallelism = Some(4))
        .as[(Long, Long)].collect().toMap
      val batch = graft.ext.Dedup.dupClustersStar(allIds.toDF("id"),
          (oldPairs ++ newPairs).toDF("id_a", "id_b"),
          parallelism = Some(4))
        .as[(Long, Long)].collect().toMap
      Prop(inc == batch) :| s"inc=$inc batch=$batch"
  }

}

/** Laws for the dataset-assembly operators — each case spins several
  * small Spark jobs, so the case count stays low like the star-cluster
  * suite.
  */
object DataOpsProperties extends Properties("graftDataOps") {
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** DSIR null law: when the target IS the raw corpus, both bucket
    * models are identical, every per-bucket log-ratio is exactly 0, and
    * every document's importance weight is exactly 0.0 — no epsilon.
    */
  property("importanceWeightsNullWhenTargetIsRaw") = Prop.forAllNoShrink(
    Gen.choose(3, 12), Gen.choose(0L, 1000000L)) { (n, seed) =>
    val rnd = new scala.util.Random(seed)
    val docs = (0 until n).map(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(5))(
        s"w${rnd.nextInt(20)}").mkString(" ")))
      .toDF("id", "t")
    val w = graft.ext.DataOps.importanceWeights(docs, col("id"), col("t"),
        docs, col("t"), buckets = 64)
      .select("log_w").as[Double].collect()
    Prop(w.length == n && w.forall(_ == 0.0)) :| s"weights=${w.toList}"
  }

  /** Equal-depth law: quantileBuckets' per-group bucket sizes differ by
    * at most one, cover the group exactly, and bucket 0 holds the
    * top-scored rows — for arbitrary group sizes, score ties included.
    */
  property("quantileBucketsEqualDepth") = Prop.forAllNoShrink(
    Gen.choose(1, 40), Gen.choose(1, 6), Gen.choose(0L, 1000000L)) {
    (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map(i =>
        ("g", i.toLong, rnd.nextInt(5).toDouble))
      val out = graft.ext.DataOps.quantileBuckets(rows.toDF("g", "id", "s"),
          col("g"), col("id"), col("s"), k)
        .select("bucket").as[Int].collect()
      val sizes = out.groupBy(identity).view.mapValues(_.length).toMap
      // mirror of bucket = floor((rank-1)·k/n) over every rank
      val want = (0 until n).map(r => r * k / n)
        .groupBy(identity).view.mapValues(_.length).toMap
      Prop(out.length == n && sizes == want) :| s"sizes=$sizes n=$n k=$k"
  }

  /** The gram-pruned literal search must equal naive contains() for
    * arbitrary strings — a two-letter alphabet makes gram collisions
    * and overlapping matches common, exercising the all-grams-present
    * prune and the verify pass where they can actually go wrong.
    */
  property("literalSearchEqualsNaiveContains") = Prop.forAllNoShrink(
    Gen.listOfN(8, Gen.choose(5, 14)), Gen.listOfN(3, Gen.choose(4, 6)),
    Gen.choose(0L, 1000000L)) { (docLens, needleLens, seed) =>
    val rnd = new scala.util.Random(seed)
    def s(len: Int) = Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b')
      .mkString
    val docs = docLens.zipWithIndex.map { case (l, i) => (i.toLong, s(l)) }
    val needles = needleLens.zipWithIndex.map { case (l, i) =>
      (100L + i, s(l))
    }
    val got = graft.ext.TextSearch.literalSearch(
        docs.toDF("id", "t"), col("id"), col("t"),
        needles.toDF("nid", "needle"), col("nid"), col("needle"))
      .as[(Long, Long)].collect().toSet
    val want = (for {
      (nid, needle) <- needles
      (id, t) <- docs
      if t.contains(needle)
    } yield (nid, id)).toSet
    Prop(got == want) :| s"got=$got want=$want"
  }

  /** Prefix filtering is an exact algorithm, not a sketch: for random
    * corpora drawn from a TINY vocabulary (so documents share most of
    * their grams — the worst case for candidate pruning and precisely
    * where a df-capped join would lie), [[graft.ext.Dedup.prefixJaccardPairs]]
    * must emit exactly the naive all-pairs answer: same pair set, same
    * set sizes, same intersection, same score.
    */
  property("prefixJaccardEqualsNaive") = Prop.forAllNoShrink(
    Gen.listOfN(9, Gen.choose(3, 12)),
    Gen.oneOf(0.3, 0.5, 0.7), Gen.choose(0L, 1000000L)) {
    (docLens, tau, seed) =>
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = docLens.zipWithIndex.map { case (l, i) =>
      (i.toLong, Seq.fill(l)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = graft.ext.Dedup.prefixJaccardPairs(
        docs.toDF("id", "t"), col("id"), col("t"), n = 3, threshold = tau)
      .select("id_a", "id_b", "common", "n_a", "n_b")
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    def shingles(t: String): Set[String] = {
      val toks = t.split("\\s+").toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val sets = docs.map { case (i, t) => i -> shingles(t) }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      common = (sa & sb).size
      j = common.toDouble / (sa.size + sb.size - common)
      if j >= tau
    } yield (ia, ib, common, sa.size, sb.size)).toSet
    Prop(got == want) :| s"tau=$tau got=$got want=$want"
  }

  /** BPE merge learning equals a naive single-node reference: same word
    * counting, ARRAY-fold greedy merge application (the classic
    * left-to-right scan), same (count desc, lexicographic) argmax. The
    * generator leans on words with same-char runs ("aaa", "aaaa") — the
    * one case where the engine's delimited-string triple-replace could
    * diverge from the fold if the sentinel-space arithmetic were wrong.
    */
  property("bpeTrainEqualsNaive") = Prop.forAllNoShrink(
    Gen.listOfN(12, Gen.oneOf("aaa", "aaaa", "aab", "abab", "baaa",
      "data", "query", "aa", "ab", "b")),
    Gen.choose(1, 5)) { (ws, k) =>
    val docs = ws.grouped(3).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
    val got = graft.ext.TextAnalysis.bpeTrain(
        docs.toDF("id", "t"), col("t"), numMerges = k)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // naive reference on symbol ARRAYS
    var vocab: Map[Vector[String], Long] = ws
      .groupBy(identity).map { case (w, g) =>
        w.split("").filter(_.nonEmpty).toVector -> g.size.toLong
      }
    def fold(syms: Vector[String], l: String, r: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    val want = (1 to k).flatMap { rank =>
      val counts = vocab.toSeq.flatMap { case (syms, cnt) =>
        syms.zip(syms.tail).map(p => p -> cnt)
      }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
      if (counts.isEmpty) None
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        vocab = vocab.toSeq
          .map { case (syms, cnt) => fold(syms, l, r) -> cnt }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        Some((rank, l, r, l + r, c))
      }
    }
    // the inference half must land on the training chain's final state:
    // apply(train(corpus)) segments every word exactly as the last
    // training iteration left it in the naive vocab
    val applied = graft.ext.TextAnalysis.bpeApply(
        docs.toDF("id", "t"), col("t"),
        want.map { case (_, l, r, _, _) => (l, r) })
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, c, p) => w -> ((c, p.toVector)) }.toMap
    val wantApplied = vocab.map { case (syms, cnt) =>
      syms.mkString -> ((cnt, syms))
    }
    Prop(got == want) :| s"k=$k got=$got want=$want" &&
      (Prop(applied == wantApplied) :|
        s"apply got=$applied want=$wantApplied")
  }

  /** The broadcast-rank greedy segmenter ([[graft.ext.TextAnalysis
    * .bpeSegment]]) equals BOTH the naive rank-order array fold and
    * the folded-projection [[graft.ext.TextAnalysis.bpeApply]] for
    * WELL-FORMED merge tables (prefix chains — every left side is
    * produced by an earlier rank), at arbitrary truncation points.
    * This is the q_bpe_large equivalence: the min-rank greedy loop may
    * visit ranks in a different ORDER than the fold, but on well-formed
    * tables a later merge can never create an earlier merge's pair, so
    * the final segmentation is identical. Words cap same-char runs at
    * 3 ("aaa"): on runs ≥ 5 the delimited-string triple-replace and
    * the classic fold legitimately arrange pieces differently, and the
    * engine pins the fold semantics for the segmenter.
    */
  property("bpeSegmentEqualsRankOrderFold") = Prop.forAllNoShrink(
    Gen.listOfN(12, Gen.oneOf("aaa", "aab", "abab", "baaa", "data",
      "query", "aa", "ab", "b", "batch", "databa")),
    Gen.choose(1, 25)) { (ws, cap) =>
    val docs = ws.grouped(3).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
    // prefix-chain table in first-seen order, deduped, truncated at cap
    val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
    ws.distinct.foreach { w =>
      (1 until w.length).foreach { i =>
        seen += ((w.substring(0, i), w.substring(i, i + 1)))
      }
    }
    val merges = seen.iterator.take(cap).toSeq
    def foldPass(syms: Vector[String], l: String, r: String) =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val want = ws.groupBy(identity).map { case (w, g) =>
      val syms0 = w.split("").filter(_.nonEmpty).toVector
      val pieces = merges.foldLeft(syms0) { case (s, (l, r)) =>
        foldPass(s, l, r)
      }
      w -> ((g.size.toLong, pieces))
    }
    val seg = graft.ext.TextAnalysis.bpeSegment(
        docs.toDF("id", "t"), col("t"), merges)
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, c, p) => w -> ((c, p.toVector)) }.toMap
    val app = graft.ext.TextAnalysis.bpeApply(
        docs.toDF("id", "t"), col("t"), merges)
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, c, p) => w -> ((c, p.toVector)) }.toMap
    (Prop(seg == want) :| s"segment got=$seg want=$want merges=$merges") &&
      (Prop(app == want) :| s"apply got=$app want=$want merges=$merges")
  }

  /** KMV sketch ≡ the k smallest distinct md5Hash48 values, for
    * arbitrary multisets, k, and partitionings — pins the bounded
    * buffer's insert/dedup/merge against a naive reference (duplicates
    * and partition boundaries are the ways a capped sorted-merge can go
    * wrong).
    */
  property("kmvSketchEqualsKSmallestDistinct") = Prop.forAllNoShrink(
    Gen.listOfN(40, Gen.choose(0L, 25L)), Gen.choose(1, 10),
    Gen.choose(1, 6)) { (vs, k, parts) =>
    val df = vs.zipWithIndex.map { case (v, i) => (v, i) }
      .toDF("v", "i").repartition(parts)
    val got = graft.ext.DataOps.kmvSketches(df, lit("g"), col("v"), k)
      .select(col("sketch")).as[Seq[Long]].head()
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val want = vs.map(v => h48(v.toString)).distinct.sorted.take(k)
    Prop(got == want) :| s"k=$k parts=$parts got=$got want=$want"
  }

  /** Sorted-neighborhood blocking ≡ naive: in-memory (key, id) rank,
    * window pairing, exact 2-gram Jaccard — for arbitrary tiny-vocab
    * corpora (maximal key ties) and window sizes. minJaccard = 0 keeps
    * every candidate, so the CANDIDATE set (the blocking semantics) is
    * pinned too, not just the survivors.
    */
  property("sortedNeighborsEqualsNaive") = Prop.forAllNoShrink(
    Gen.listOfN(14, Gen.listOfN(5, Gen.oneOf("a", "b", "c", "d"))),
    Gen.choose(2, 5)) { (ws, w) =>
    val docs = ws.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" ")) }
    val keyCol = substring(
      regexp_replace(lower(trim(col("t"))), "\\s+", ""), 1, 12)
    val got = graft.ext.Dedup.sortedNeighborPairs(
        docs.toDF("id", "t"), col("id"), keyCol, col("t"),
        window = w, n = 2, minJaccard = 0.0)
      .as[(Long, Long, Int, Int, Int, Double)].collect().toSet
    def shingles(ts: Seq[String]): Set[String] =
      if (ts.length >= 2) ts.sliding(2).map(_.mkString(" ")).toSet
      else Set(ts.mkString(" "))
    val ranked = docs
      .map { case (i, t) => (t.replaceAll("\\s+", "").take(12), i) }
      .sorted.map(_._2)
    val want = (for {
      a <- ranked.indices; b <- (a + 1) until math.min(a + w, ranked.length)
    } yield {
      // normalize by id like the engine: sizes follow the id-ordered pair
      val (ia, ib) = (math.min(ranked(a), ranked(b)),
        math.max(ranked(a), ranked(b)))
      val (sa, sb) = (shingles(ws(ia.toInt)), shingles(ws(ib.toInt)))
      val c = (sa intersect sb).size
      (ia, ib, c, sa.size, sb.size,
        c.toDouble / (sa.size + sb.size - c))
    }).toSet
    Prop(got == want) :| s"w=$w got=${got.size} want=${want.size} " +
      s"diff=${(got diff want) ++ (want diff got)}"
  }

  /** CDC laws on arbitrary strings — INCLUDING supplementary-plane
    * characters (each draw may emit an emoji, two UTF-16 units but one
    * code point): the chunks partition the text exactly (contiguous
    * starts, code-point lengths sum to the doc's code-point length),
    * and the compiled [[graft.functions.CdcCuts]] path equals the
    * interpreted HOF reference (Spark `substr`/`length` — code-point
    * semantics) row for row. Pins the UTF-16-vs-code-point contract.
    */
  property("cdcChunksPartitionAndCompiledEqualsHof") = Prop.forAllNoShrink(
    Gen.listOfN(5, Gen.choose(1, 120)), Gen.choose(0L, 1000000L)) {
    (lens, seed) =>
      val rnd = new scala.util.Random(seed)
      // 1-in-6 draws a non-BMP char (🎉 U+1F389, 𝕏 U+1D54F, 🚀 U+1F680)
      val nonBmp = Array("🎉", "𝕏", "🚀")
      def ch(): String =
        if (rnd.nextInt(6) == 0) nonBmp(rnd.nextInt(nonBmp.length))
        else ('a' + rnd.nextInt(4)).toChar.toString
      val docs = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, Seq.fill(l)(ch()).mkString)
      }
      val df = docs.toDF("id", "t")
      val fast = graft.ext.TextAnalysis.cdcChunks(df, col("id"), col("t"))
        .select("id", "chunk_idx", "start", "chunk_len", "chunk_hash")
        .as[(Long, Int, Int, Int, Long)].collect()
      val hof = graft.ext.TextAnalysis.cdcChunksHof(df, col("id"), col("t"))
        .select("id", "chunk_idx", "start", "chunk_len", "chunk_hash")
        .as[(Long, Int, Int, Int, Long)].collect()
      val partitionOk = docs.forall { case (id, t) =>
        val mine = fast.filter(_._1 == id).sortBy(_._2)
        mine.headOption.forall(_._3 == 1) &&
          mine.map(_._4).sum == t.codePointCount(0, t.length) &&
          mine.sliding(2).forall {
            case Array(a, b) => b._3 == a._3 + a._4
            case _ => true
          }
      }
      Prop(fast.toSet == hof.toSet && partitionOk) :|
        s"fast=${fast.toList} hof=${hof.toList}"
  }

  /** Heavy hitters equal the naive global count-and-filter for
    * arbitrary key streams, thresholds, and physical partitionings —
    * the Misra–Gries candidate superset is sound (no frequent key ever
    * lost to the sketch) and the exact verify discards every false
    * candidate, so the sketch is invisible in the output.
    */
  property("heavyHittersEqualsNaive") = Prop.forAllNoShrink(
    Gen.choose(20, 200), Gen.choose(1, 5), Gen.oneOf(0.05, 0.1, 0.25),
    Gen.choose(0L, 1000000L)) { (n, parts, frac, seed) =>
    val rnd = new scala.util.Random(seed)
    // skewed draw: min of two uniforms biases toward low key ids, so
    // some keys genuinely clear the threshold and most don't; key 0
    // maps to NULL — a frequent null must surface like any other key
    // (the exact pass joins null-safely)
    val keys: Seq[String] = (0 until n).map { _ =>
      val k = math.min(rnd.nextInt(12), rnd.nextInt(12))
      if (k == 0) null else s"k$k"
    }
    val got = graft.ext.DataOps.heavyHitters(
        keys.toDF("k").repartition(parts), col("k"), frac)
      .as[(Option[String], Long)].collect().toSet
    val minCount = math.max(1L, math.ceil(frac * n).toLong)
    val want = keys.groupBy(Option(_))
      .map { case (k, ks) => (k, ks.size.toLong) }
      .filter(_._2 >= minCount).toSet
    Prop(got == want) :| s"got=$got want=$want minCount=$minCount"
  }

  /** Stratified sample is a true per-group sample: size min(k, |g|),
    * drawn from the group, stable under physical layout.
    */
  property("stratifiedSamplePerGroupSize") = Prop.forAllNoShrink(
    Gen.choose(1, 30), Gen.choose(1, 4), Gen.choose(1, 6),
    Gen.choose(1, 5)) { (n, groups, k, parts) =>
    val rows = (0 until n).map(i => (s"g${i % groups}", i.toLong))
    val df = rows.toDF("g", "id")
    val got = graft.ext.DataOps.stratifiedSample(df, col("g"), col("id"), k)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val byGroup = rows.groupBy(_._1)
    val sizesOk = got.groupBy(_._1).forall { case (g, s) =>
      s.size == math.min(k, byGroup(g).size)
    }
    val membersOk = got.forall { case (g, id) => byGroup(g).contains((g, id)) }
    val again = graft.ext.DataOps.stratifiedSample(df.repartition(parts),
        col("g"), col("id"), k)
      .select("grp", "id").as[(String, Long)].collect().toSet
    Prop(sizesOk && membersOk && got == again) :| s"got=$got"
  }
}
