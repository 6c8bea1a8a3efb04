package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, lower-cased, trimmed") {
    val got = Seq("  The QUICK  fox ").toDF("t")
      .select(TextAnalysis.tokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got == Seq("the", "quick", "fox"))
  }

  test("chunk: overlapping windows, full coverage, short-doc single chunk") {
    // w=4, overlap=1 (stride 3): a 10-token doc → [t1-t4][t4-t7][t7-t10];
    // docs at/below the window → exactly one chunk
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 4).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 5).map(i => s"t$i").mkString(" ")),
      (4L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, col("text"), maxTokens = 4, overlap = 1)
      .select("doc_id", "chunk_id", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 0, 4, "t1 t2 t3 t4"), (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (2L, 0, 4, "t1 t2 t3 t4"),
      (3L, 0, 4, "t1 t2 t3 t4"), (3L, 1, 2, "t4 t5"),
      (4L, 0, 1, "solo")))
  }

  test("tfidf: corpus-wide df, natural-log idf, per-doc tf") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(docs, "doc_id", "text")
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // apple: only doc 1, tf=2, df=1 → 2·ln(3)
    val apple = got((1L, "apple"))
    assert(apple._3 == 2L && apple._4 == 1L)
    assert(math.abs(apple._5 - 2 * math.log(3.0)) < 1e-12)
    // banana in doc 2: tf=1, df=2 → ln(1.5)
    val banana = got((2L, "banana"))
    assert(banana._4 == 2L)
    assert(math.abs(banana._5 - math.log(1.5)) < 1e-12)
    // cherry in doc 3: tf=2, df=2
    assert(got((3L, "cherry"))._3 == 2L)
  }

  test("unigram log-probs: hand-computed corpus model") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total=5
    val got = TextAnalysis.unigramLogProbs(docs, "doc_id", "text")
      .select("id", "n_tokens", "mean_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L)
    // doc1: (2·ln(2/5) + 1·ln(2/5)) / 3 = ln(0.4)
    assert(math.abs(got(1L)._3 - math.log(0.4)) < 1e-12)
    // doc2: (ln(2/5) + ln(1/5)) / 2
    assert(math.abs(got(2L)._3 -
      (math.log(0.4) + math.log(0.2)) / 2) < 1e-12)
  }

  test("bigram log-probs: hand-computed, and transitions beat bags of words") {
    val docs = Seq((1L, "a b a b"), (2L, "b a b a"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    // corpus bigram counts: ab=4 ba=3 aa=1 bb=1; context counts:
    // c(a)=ab+aa=5, c(b)=ba+bb=4; vocab V=2; add-½:
    // P(b|a)=4.5/6=0.75, P(a|b)=3.5/5=0.7, P(a|a)=1.5/6=0.25,
    // P(b|b)=1.5/5=0.3
    val got = TextAnalysis.bigramLogProbs(docs, "doc_id", "text")
      .select("id", "n_bigrams", "mean_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L)
    // doc1 bigrams ab, ba, ab → (2·ln 0.75 + ln 0.7)/3
    val want1 = (2 * math.log(0.75) + math.log(0.7)) / 3
    assert(math.abs(got(1L)._3 - want1) < 1e-12)
    // doc3 (same unigram bag as doc1!) bigrams aa, ab, bb →
    // (ln 0.25 + ln 0.75 + ln 0.3)/3 — the scrambled doc scores lower
    val want3 = (math.log(0.25) + math.log(0.75) + math.log(0.3)) / 3
    assert(math.abs(got(3L)._3 - want3) < 1e-12)
    assert(got(3L)._3 < got(1L)._3)
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val got = Seq(
      ("a", "The  quick\tfox"),
      ("b", "the quick fox"),
      ("c", "the quick foxes"),
    ).toDF("id", "t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .as[String].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("language ID picks the profile with most stopword hits; " +
    "ties resolve to earlier profile") {
    val got = Seq(
      "the cat and the dog of a house",       // en
      "le chat et la maison de un jardin",    // fr
      "el gato y los perros que un una",      // es
      "der hund und die katze von ein haus",  // de
      "xyzzy plugh",                          // no hits → first profile
    ).toDF("t").select(TextAnalysis.languageId(
      TextAnalysis.tokens(col("t")))).as[String].collect()
    assert(got.toSeq == Seq("en", "fr", "es", "de", "en"))
  }

  test("quality score: repetitive text scores below diverse text") {
    val scores = Seq(
      ("diverse", "the cat and a dog of it is in the yard with more words"),
      ("spam", "buy buy buy buy buy buy buy buy buy buy buy buy buy"),
    ).toDF("id", "t")
      .select(col("id"), TextAnalysis.qualityScore(
        TextAnalysis.tokens(col("t"))).as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("diverse") > scores("spam"))
  }

  test("word shingles: n-grams for long docs, whole doc when shorter than n") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextAnalysis.wordShingles(
        TextAnalysis.tokens(col("t")), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("token count on the driver documents table is positive") {
    val n = graft.Tables.documents(spark, sf0001)
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(min("n")).as[Int].collect()(0)
    assert(n > 0)
  }
  test("repeatedSpans: corpus-wide L-gram hits merge into per-doc " +
      "intervals") {
    val docs = Seq(
      (1L, "one two three four five alpha beta gamma " +
        "one two three four five"),
      (2L, "x one two three four five y z"),
      (3L, "nothing here at all matches anything else whatsoever"),
      (4L, "tiny doc"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repeatedSpans(docs, col("doc_id"), col("text"),
        L = 5, minOcc = 2)
      .select("id", "n_tokens", "n_spans", "covered_tokens", "coverage")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 1: "one two three four five" occurs at pos 0 and 8 (3 times
    // corpus-wide) -> two disjoint spans, 10 of 13 tokens covered;
    // doc 2: one hit at pos 1 -> 5 of 8; docs 3-4: clean / below L
    assert(got == Seq(
      (1L, 13L, 2L, 10L, 0.7692),
      (2L, 8L, 1L, 5L, 0.625),
      (3L, 8L, 0L, 0L, 0.0),
      (4L, 2L, 0L, 0L, 0.0)))
  }

  test("repeatedSpans: overlapping hits coalesce into one interval") {
    // the 6-token repeat yields two overlapping hot 5-grams (pos 0,1 in
    // doc 1) that must merge into a single [0,6) span, not two
    val docs = Seq(
      (1L, "a b c d e f tail one"),
      (2L, "head a b c d e f"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repeatedSpans(docs, col("doc_id"), col("text"),
        L = 5, minOcc = 2)
      .select("id", "n_spans", "covered_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 6L), (2L, 1L, 6L)))
  }
  test("scrubRepeatedSpans drops covered tokens and rejoins survivors") {
    val docs = Seq(
      (1L, "one two three four five alpha beta gamma " +
        "one two three four five"),
      (2L, "x one two three four five y z"),
      (3L, "nothing here at all matches anything else whatsoever"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scrubRepeatedSpans(docs, col("doc_id"),
        col("text"), L = 5, minOcc = 2)
      .select("id", "n_tokens", "kept_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 13L, 3L, "alpha beta gamma"),
      (2L, 8L, 3L, "x y z"),
      (3L, 8L, 8L, "nothing here at all matches anything else whatsoever")))
  }

  test("cdc chunks partition the text; edits re-chunk only locally") {
    val base = (1 to 40).map(i => s"word$i token$i").mkString(" ")
    val edited = "INSERTED PREFIX CONTENT " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(docs, col("doc_id"), col("text"))
      .select("id", "chunk_idx", "start", "chunk_len", "chunk_hash")
      .as[(Long, Int, Int, Int, Long)].collect()
    // exact partition: starts contiguous from 1, lengths sum to doc len
    Seq(1L -> base, 2L -> edited).foreach { case (id, t) =>
      val mine = ch.filter(_._1 == id).sortBy(_._2)
      assert(mine.head._3 == 1)
      mine.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
      assert(mine.map(_._4).sum == t.length)
    }
    // content-defined locality: the edited doc re-chunks near the
    // insertion but shares the vast majority of chunk hashes downstream
    val h1 = ch.filter(_._1 == 1L).map(_._5).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._5).toSet
    assert(h1.size > 10)
    assert((h1 intersect h2).size >= h1.size - 3,
      s"shared=${(h1 intersect h2).size} of ${h1.size}")
    // short text: one whole-doc chunk
    val one = TextAnalysis.cdcChunks(Seq((9L, "tiny")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("start", "chunk_len").as[(Int, Int)].collect().toSeq
    assert(one == Seq((1, 4)))
    // compiled CdcCuts ≡ the interpreted HOF reference, row for row
    val fast = TextAnalysis.cdcChunks(docs, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    val hof = TextAnalysis.cdcChunksHof(docs, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(fast == hof)
  }

  test("char entropy: 0 for runs, log2(k) for uniform, spam < prose < junk") {
    val docs = Seq(
      (1L, "aaaaaaaa"),                  // one symbol -> 0 bits
      (2L, "abababab"),                  // two symbols uniform -> 1 bit
      (3L, "abcdabcd"),                  // four symbols uniform -> 2 bits
      (4L, "the quick brown fox jumps"), // prose band
      (5L, "K8s2/xQ9+zW1mN4pR7vY0jL3"),  // base64-ish junk, near-max
    ).toDF("doc_id", "text")
    val h = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select("id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(h(1L)) < 1e-9)
    assert(math.abs(h(2L) - 1.0) < 1e-9)
    assert(math.abs(h(3L) - 2.0) < 1e-9)
    assert(h(1L) < h(4L) && h(4L) < h(5L))
  }

  test("htmlExtract strips blocks, keeps structure, decodes entities") {
    def x(html: String): String =
      Seq(html).toDF("h")
        .select(TextAnalysis.htmlExtract(col("h"))).as[String].head()
    // script bodies may contain < without opening a tag; comments span
    // lines; block closers become newlines; inline tags become spaces
    val got = x("<html><head><script>if (a < b) { f(); }</script>" +
      "<style>p{}</style></head><body><!-- c\nc --><h1>Title</h1>" +
      "<p>one <b>bold</b> word</p><div>two</div></body></html>")
    assert(got == "Title\none bold word\ntwo")
    // &amp;lt; must decode exactly once (to "&lt;"), not twice
    assert(x("<p>a &amp;lt; b &amp; c &lt;d&gt; &quot;q&quot; &#39;s " +
      "&nbsp;end</p>") == "a &lt; b & c <d> \"q\" 's end")
    assert(x("  <p>  spaced\t\tout  </p>  ") == "spaced out")
    assert(x("") == "")
  }

  test("canonicalUrl collapses case/port/www/slash/tracking/order/fragment") {
    def c(url: String): String =
      Seq(url).toDF("u")
        .select(TextAnalysis.canonicalUrl(col("u"))).as[String].head()
    val want = "https://site.com/a?a=1&b=2"
    assert(c("https://site.com/a?a=1&b=2") == want)
    assert(c("HTTPS://WWW.Site.COM:443/a/?utm_source=x&b=2&a=1#top") == want)
    assert(c("https://site.com:443/a?b=2&gclid=z&a=1") == want)
    assert(c("https://www.site.com/a/?a=1&b=2&fbclid=q") == want)
    // no query, trailing slash, default http port
    assert(c("http://www.Site.com:80/p/q/") == "http://site.com/p/q")
    // bare authority: empty path stays empty, query intact + sorted
    assert(c("https://site.com?z=1&a=2") == "https://site.com?a=2&z=1")
    // all params are tracking -> no '?'
    assert(c("https://site.com/x?utm_a=1&utm_b=2") == "https://site.com/x")
  }

  // ---- paragraph-level exact dedup ----

  private def paraDedup(rows: Seq[(Long, Int, String)]) =
    TextAnalysis.paragraphDedup(rows.toDF("id", "idx", "para"),
        col("id"), col("idx"), col("para"))
      .orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("paragraphDedup keeps only the first occurrence corpus-wide") {
    val r = paraDedup(Seq(
      (1L, 0, "unique one"), (1L, 1, "footer"),
      (2L, 0, "unique two"), (2L, 1, "footer"),
      (3L, 0, "footer"), (3L, 1, "unique three")))
    assert(r === Seq(
      (1L, 2L, 2L, "unique one\nfooter"),
      (2L, 2L, 1L, "unique two"),
      (3L, 2L, 1L, "unique three")))
  }

  test("paragraphDedup: first occurrence is (doc, idx)-ordered, " +
      "reconstruction preserves in-doc order") {
    val r = paraDedup(Seq(
      // doc 1 repeats the same para at idx 0 and 2: idx 0 wins
      (1L, 0, "dup"), (1L, 1, "mid"), (1L, 2, "dup"),
      (2L, 0, "dup")))
    assert(r === Seq(
      (1L, 3L, 2L, "dup\nmid"),
      (2L, 1L, 0L, "")))
  }

  test("paragraphDedup on all-unique input is the identity") {
    val r = paraDedup(Seq(
      (1L, 0, "a"), (1L, 1, "b"), (2L, 0, "c")))
    assert(r === Seq((1L, 2L, 2L, "a\nb"), (2L, 1L, 1L, "c")))
  }

  // ---- WordPiece greedy longest-match segmentation ----

  private def wp(text: String, vocab: Seq[String]): Map[String, Seq[String]] =
    TextAnalysis.wordpieceSegment(Seq(text).toDF("t"), col("t"), vocab)
      .select("w", "pieces").as[(String, Seq[String])].collect().toMap

  test("wordpiece: longest match wins at every position") {
    val vocab = Seq("un", "uncle", "##c", "##l", "##e", "##an",
      "u", "n", "c", "l", "e", "a")
    // "unclean": longest pos-0 match is "uncle", then "##an"
    assert(wp("unclean", vocab)("unclean") === Seq("uncle", "##an"))
    // "uncle" matches whole
    assert(wp("uncle", vocab)("uncle") === Seq("uncle"))
  }

  test("wordpiece: continuation pieces only after the first position") {
    // "an" exists only as ##an: at pos 0 it must NOT match, so the word
    // segments through single chars (a exists plain, n only as char)
    val vocab = Seq("##an", "a", "##n")
    assert(wp("an", vocab)("an") === Seq("a", "##n"))
  }

  test("wordpiece: a position with no match yields [UNK]") {
    val vocab = Seq("a", "##b") // 'z' is uncovered
    assert(wp("az", vocab)("az") === Seq("[UNK]"))
    assert(wp("za", vocab)("za") === Seq("[UNK]"))
  }

  test("wordpiece: char-complete vocab never UNKs; pieces respell " +
      "the word") {
    val vocab = ("abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "abcdefghijklmnopqrstuvwxyz".map(c => s"##$c") ++
      Seq("tab", "##le")).toSeq
    val r = wp("table tables", vocab)
    assert(r("table") === Seq("tab", "##le"))
    assert(r("tables") === Seq("tab", "##le", "##s"))
    r.values.foreach { pieces =>
      assert(!pieces.contains("[UNK]"))
    }
  }

  // ---- unigram-LM-shape minimum-cost segmentation ----

  private def seg(text: String, costs: Map[String, Int]) =
    TextAnalysis.minCostSegment(Seq(text).toDF("t"), col("t"), costs)
      .select("w", "cost", "pieces")
      .as[(String, Int, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("minCostSegment finds the optimum where greedy longest-match " +
      "fails") {
    // greedy takes "abc" (cost 5) then is stuck with chars c,d (4+4);
    // the optimum takes "ab" + "cd" = 2
    val costs = Map("abc" -> 5, "ab" -> 1, "cd" -> 1,
      "a" -> 4, "b" -> 4, "c" -> 4, "d" -> 4)
    assert(seg("abcd", costs)("abcd") === ((2, Seq("ab", "cd"))))
  }

  test("minCostSegment: equal-cost ties break to the smaller pieces " +
      "string") {
    // "aa" via ["aa"] cost 2 or ["a","a"] cost 2: "a a" < "aa"
    val costs = Map("aa" -> 2, "a" -> 1)
    assert(seg("aa", costs)("aa") === ((2, Seq("a", "a"))))
  }

  test("minCostSegment: unreachable words report [UNK] at cost -1") {
    val r = seg("axb", Map("a" -> 1, "b" -> 1))
    assert(r("axb") === ((-1, Seq("[UNK]"))))
  }

  test("unigramPrune drops unused multi-char pieces, keeps the " +
      "alphabet, and re-segments under the survivors") {
    // corpus: "ab ab ab cd" — "ab" is used 3×, "cd" once; candidates
    // include both plus chars. minUses=2 prunes "cd" but never chars.
    val docs = Seq("ab ab ab cd").toDF("t")
    val costs = Map("ab" -> 1, "cd" -> 1,
      "a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2)
    val (kept, second) = TextAnalysis.unigramPrune(docs, col("t"),
      costs, minUses = 2L)
    assert(kept.keySet === Set("ab", "a", "b", "c", "d"))
    val r = second.select("w", "pieces")
      .as[(String, Seq[String])].collect().toMap
    assert(r("ab") === Seq("ab"))
    assert(r("cd") === Seq("c", "d")) // its piece was pruned
  }

  test("unigramTrain iterates prune to a fixpoint and stops early") {
    val docs = Seq("ab ab ab cd").toDF("t")
    val costs = Map("ab" -> 1, "cd" -> 1,
      "a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2)
    // round 1 prunes "cd", round 2 prunes nothing → converged at 2
    val (kept, seg2, rounds) = TextAnalysis.unigramTrain(docs, col("t"),
      costs, minUses = 2L, maxRounds = 5)
    assert(kept.keySet === Set("ab", "a", "b", "c", "d"))
    assert(rounds === 2)
    // extra rounds are idempotent: same vocab, same segmentation
    val (kept4, seg4, _) = TextAnalysis.unigramTrain(docs, col("t"),
      costs, minUses = 2L, maxRounds = 2)
    assert(kept4 === kept)
    assert(seg2.select("w", "pieces").as[(String, Seq[String])]
      .collect().toMap ===
      seg4.select("w", "pieces").as[(String, Seq[String])]
        .collect().toMap)
  }

  test("unigramTrainEm re-derives integer-log2 costs from usage") {
    // corpus: "ab ab ab cd" → pieces after round 1 under the full
    // candidate set: ab used 3×, c and d once each (cd pruned at
    // minUses=2), a/b unused. totalUses = 3+1+1 = 5 →
    // cost(ab) = 1+bitlen(5/3=1) = 2; cost(c)=cost(d)=1+bitlen(5)=4;
    // unused a/b = 1+bitlen(5)=4.
    val docs = Seq("ab ab ab cd").toDF("t")
    val costs = Map("ab" -> 1, "cd" -> 1,
      "a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2)
    val (cs, seg1, _) = TextAnalysis.unigramTrainEm(docs, col("t"),
      costs, minUses = 2L, rounds = 1)
    assert(cs === Map("ab" -> 2, "a" -> 4, "b" -> 4, "c" -> 4, "d" -> 4))
    assert(seg1.select("w", "cost").as[(String, Int)].collect().toMap
      === Map("ab" -> 2, "cd" -> 8))
    // a second round is deterministic and keeps the alphabet
    val (cs2, _, rounds) = TextAnalysis.unigramTrainEm(docs, col("t"),
      costs, minUses = 2L, rounds = 2)
    assert(rounds === 2)
    assert(Set("a", "b", "c", "d").subsetOf(cs2.keySet))
  }

  // ---- Gopher-style quality rule bank ----

  test("qualityRules reports exactly the failed rules, sorted") {
    val docs = Seq(
      // long enough, varied, alphabetic, stopworded → passes
      (1L, ("the quick brown fox jumps over a lazy dog near the " +
        "riverbank and of course to everyone watching it keeps " +
        "going with fresh words every time no repeats here at all " +
        "plus extra filler tokens that stay varied and readable " +
        "through the whole passage onwards while clouds drift past " +
        "distant hills where small birds gather before evening " +
        "falls gently across quiet fields full of ripened grain")),
      // short + no stopwords + numeric tokens
      (2L, "123 456 789"),
      // heavy repetition of one word (dup_fraction + too_short)
      (3L, Seq.fill(40)("spam").mkString(" "))
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityRules(docs, col("doc_id"), col("text"),
        TextAnalysis.gopherRules(col("text")))
      .orderBy("id")
      .select("id", "failed", "pass")
      .as[(Long, Seq[String], Boolean)].collect().toSeq
    assert(r(0) === ((1L, Seq.empty[String], true)))
    assert(r(1)._2.contains("too_short"))
    assert(r(1)._2.contains("alpha_ratio"))
    assert(r(1)._2.contains("stopwords"))
    assert(!r(1)._3)
    assert(r(2)._2.contains("dup_fraction"))
    assert(r(2)._2 === r(2)._2.sorted)
  }
}
