package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, stopword-profile language ID, and normalization
  * fingerprints. Everything here is a column expression built from
  * codegen'd built-ins (no UDFs) — per-row, no shuffle, so the operators
  * scan-scale linearly at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization of lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Corpus-unigram language-model scoring: each document's mean token
    * log-probability under the corpus unigram distribution —
    * Σ tf·ln(cnt/total) / Σ tf. The perplexity-style quality filter
    * (gibberish and boilerplate score low / high in distinctive ways)
    * computed with the same relations as [[tfidf]]: one explode, a term
    * count reduction, a term-aligned join back, and the corpus total as
    * a broadcast scalar. Corpus-token-linear.
    */
  def unigramLogProbs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = termCounts.agg(sum("cnt").as("total"))
    tf.join(termCounts, "term")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum("tf").cast("long").as("n_tokens"),
        (sum(col("tf") * log(col("cnt").cast("double") / col("total"))) /
          sum("tf")).as("mean_logprob"))
  }

  /** Corpus-bigram language-model scoring with add-k smoothing: each
    * document's mean bigram log-probability, where
    * `P(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + k) / (c(t_{i-1}) + k·V)`
    * over corpus transition counts and vocabulary size V. The stronger
    * cousin of [[unigramLogProbs]] as a quality filter: a bag of real
    * words in scrambled order scores high under unigrams but low here —
    * it is the TRANSITIONS that separate fluent text from shuffled
    * boilerplate (the KenLM-style filter in public pipelines like
    * CCNet, spelled relationally). Smoothing keeps unseen transitions
    * at a finite penalty instead of −∞, so the score stays usable on
    * out-of-corpus text.
    *
    * Scale shape: bigrams derive per-row from the token array (no
    * self-join on position); counts are two hash reductions; the
    * count join runs on the (prev, cur) key both sides just grouped
    * on; vocabulary and nothing else broadcasts. Corpus-token-linear.
    * Documents with fewer than two tokens have no bigrams and drop out.
    */
  def bigramLogProbs(docs: DataFrame, idCol: String, textCol: String,
      kSmooth: Double = 0.5): DataFrame = {
    val t = tokens(col(textCol))
    val pairs = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (p, c) => struct(p.as("prev"), c.as("cur")))
    val bg = docs.select(col(idCol).as("id"), explode(pairs).as("b"))
      .select(col("id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val bf = bg.groupBy("id", "prev", "cur").agg(count(lit(1)).as("n"))
    val bc = bf.groupBy("prev", "cur").agg(sum("n").as("bcnt"))
    val cc = bc.groupBy("prev").agg(sum("bcnt").as("ccnt"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("term"))
      .agg(countDistinct("term").as("vocab"))
    bf.join(bc, Seq("prev", "cur")).join(cc, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy("id")
      .agg(sum("n").cast("long").as("n_bigrams"),
        (sum(col("n") * log((col("bcnt") + lit(kSmooth)) /
            (col("ccnt") + lit(kSmooth) * col("vocab")))) /
          sum("n")).as("mean_logprob"))
  }

  /** Interpolated trigram LM scoring (Jelinek–Mercer): each token's
    * probability is λ₃·p̂(w|u,v) + λ₂·p̂(w|v) + λ₁·p̂(w) with ML
    * component estimates from corpus counts — the KenLM-lite quality
    * filter: the trigram term rewards fluent local word order, the
    * bigram/unigram terms keep unseen contexts scoreable (scoring the
    * training corpus itself, every component is defined; the unigram
    * floor guards division anyway). All relations come off token
    * explodes and join on their natural keys (trigram, two bigram
    * roles, two unigram roles) — corpus-token-linear, model tables
    * vocabulary-sized, no per-doc state. Returns (id, n_trigrams,
    * mean_logprob).
    */
  def trigramLogProbs(docs: DataFrame, idCol: String, textCol: String,
      l3: Double = 0.6, l2: Double = 0.3, l1: Double = 0.1): DataFrame = {
    // materialize the token array ONCE per row before the positional
    // lambda: with `t` spelled inline, every element_at(t, i) inside
    // the transform re-evaluated the whole regex split — O(tokens)
    // splits per row, the measured 10.5 s of q_trigram_logprob's 12.6 s
    // window at sf0.1 (the scan-killer the native ShingleHashes
    // expression documents, here in HOF form). As a projected column
    // the split runs once and element_at is an O(1) array access;
    // values are bit-identical.
    val t = col("__ts")
    val tris0 = transform(sequence(lit(1), size(t) - 2), i =>
      struct(element_at(t, i).as("u"), element_at(t, i + 1).as("v"),
        element_at(t, i + 2).as("w")))
    // guard: sequence(1, n) DESCENDS for n < 1, which would fabricate
    // indices for docs under three tokens
    val tris = when(size(t) >= 3, tris0)
      .otherwise(array().cast("array<struct<u:string,v:string,w:string>>"))
    val tg = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__ts"))
      .select(col("id"), explode(tris).as("g"))
      .select(col("id"), col("g.u").as("u"), col("g.v").as("v"),
        col("g.w").as("w"))
    val nf = tg.groupBy("id", "u", "v", "w").agg(count(lit(1)).as("n"))
    val tc = nf.groupBy("u", "v", "w").agg(sum("n").as("t3"))
    // the bigram/unigram branches evaluate the token array O(1) times
    // per row (zip_with over two slices / one explode), so the inline
    // spelling is fine there — only the positional trigram lambda
    // needed the projected column
    val ti = tokens(col(textCol))
    val pairs = zip_with(
      slice(ti, lit(1), size(ti) - 1), slice(ti, lit(2), size(ti) - 1),
      (p, c) => struct(p.as("prev"), c.as("cur")))
    val bc = docs.select(explode(pairs).as("b"))
      .groupBy(col("b.prev").as("prev"), col("b.cur").as("cur"))
      .agg(count(lit(1)).as("b2"))
    val uc = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val tot = uc.agg(sum("c1").as("total"))
    nf.join(tc, Seq("u", "v", "w"))
      .join(bc.select(col("prev").as("u"), col("cur").as("v"),
        col("b2").as("ctx3")), Seq("u", "v"))
      .join(bc.select(col("prev").as("v"), col("cur").as("w"),
        col("b2").as("bvw")), Seq("v", "w"))
      .join(uc.select(col("term").as("v"), col("c1").as("cv")), "v")
      .join(uc.select(col("term").as("w"), col("c1").as("cw")), "w")
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(sum("n").cast("long").as("n_trigrams"),
        (sum(col("n") * log(
          lit(l3) * col("t3") / col("ctx3") +
            lit(l2) * col("bvw") / col("cv") +
            lit(l1) * col("cw") / col("total"))) / sum("n"))
          .as("mean_logprob"))
  }

  /** TF-IDF per (doc, term): tf = in-doc term count, idf = ln(N/df) over
    * the corpus. Three relations off one token explode: tf groups by
    * (doc, term); df reduces tf by term; the scalar doc count crossjoins
    * as a broadcast literal. The tf⋈df join runs on the term key both
    * sides were just shuffled on, and the explode is the only row
    * multiplier — corpus-token-linear, no per-doc state, so the shape
    * holds at 100 TB (df is vocabulary-sized; if the vocabulary itself
    * outgrows a shuffle partition, raise partitions — no algorithm
    * change).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
  }

  /** Tiny per-language stopword profiles for the heuristic language ID.
    * Order matters: ties resolve to the earlier language.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "que", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "von", "ein", "eine", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"),
  )

  /** Count of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Argmax over the language profiles, ties broken by profile order —
    * expressed as a when-chain so a SQL oracle can mirror it verbatim.
    */
  def languageId(toks: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> hitCount(toks, ws) }
    val chain = scores.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((lang, sc), i)) =>
        val rest = scores.drop(i + 1).map(_._2)
        val isMax = rest.foldLeft(lit(true))((c, o) => c && sc >= o)
        Some(acc.fold(when(isMax, lang))(_.when(isMax, lang)))
    }
    chain.get.otherwise(langProfiles.last._1)
  }

  /** Stopword ratio (English profile), ∈ [0,1]. */
  def stopwordRatio(toks: Column): Column =
    hitCount(toks, langProfiles.head._2).cast("double") / size(toks)

  /** Unique-token ratio — low values flag repetitive/spammy documents. */
  def uniqueRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Heuristic quality score ∈ [0,1]: stopword density + length credit +
    * lexical diversity. Weights mirror common pretraining-filter recipes.
    */
  def qualityScore(toks: Column): Column =
    stopwordRatio(toks) * 0.4 +
      least(lit(1.0), size(toks).cast("double") / 50.0) * 0.3 +
      uniqueRatio(toks) * 0.3

  /** Crawl-text normalization (the pre-tokenization cleanup every corpus
    * pass assumes has happened): Unicode NFC composition (the codegen'd
    * [[graft.functions.NfcNormalize]] — "é" and "e"+combining-accent
    * become one key), then strip format characters (Cf: zero-width
    * space/joiners, BOM, directional marks), then strip the
    * non-whitespace C0/DEL controls, then collapse runs of whitespace to
    * a single space and trim. Pure per-row column arithmetic — compiled,
    * no shuffle, safe at any scale — and every step after NFC is a plain
    * `regexp_replace`, so the whole chain is oracle-expressible.
    */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val nfc = Bridge.toColumn(
      graft.functions.NfcNormalize(Bridge.toExpr(text)))
    trim(regexp_replace(regexp_replace(regexp_replace(nfc,
      "\\p{Cf}", ""),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))
  }

  /** Boilerplate-stripping TEXT EXTRACTION from raw HTML — the very
    * first stage of a crawl pipeline (the simplified, fully-relational
    * cousin of trafilatura/jusText): drop script/style/comment blocks,
    * turn block-closing tags into newlines (paragraph structure
    * survives for downstream chunkers), strip remaining tags, decode
    * the common entities (`&amp;` LAST so `&amp;lt;` single-decodes),
    * collapse horizontal whitespace, squeeze blank lines, trim. Every
    * step is a codegen'd `regexp_replace`/`replace` — per-row column
    * work, no shuffle, no parser state; at 100 TB this runs inside the
    * scan's projection.
    */
  def htmlExtract(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val structural = regexp_replace(noBlocks,
      "(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr|/table)\\b[^>]*>", "\n")
    val noTags = regexp_replace(structural, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to))
      }
    regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \\t\\x0B\\f\\r]+", " "),
      " ?\\n[ \\n]*", "\n"),
      "^[\\s]+|[\\s]+$", "")
  }

  /** URL canonicalization — crawl dedup's first key (the same page
    * arrives as `HTTPS://WWW.Site.com:443/a/?utm_source=x&b=2&a=1#top`
    * and `https://site.com/a?a=1&b=2`): lowercase scheme and host, drop
    * default ports and a leading `www.`, strip the fragment, strip
    * trailing path slashes (root stays `/`… well, empty path becomes
    * the bare authority), drop tracking parameters (`utm_*`, `gclid`,
    * `fbclid`, `ref`), and SORT the surviving query parameters so
    * argument order stops mattering. Pure column work — regexp
    * extracts, an array filter/sort, one concat — replayable in any
    * engine; at 100 TB this is the dedup key computed inside the scan.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, ":(80|443)$", ""), "^www\\.", "")
    val rawPath = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=") && p =!= "")
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** Per-domain reputation aggregate (the CCNet / RefinedWeb "judge the
    * site, not just the page" discipline): document count and mean
    * token-level [[qualityScore]] per domain. One map-side-combined hash
    * aggregation over the corpus; the result is domain-cardinality —
    * thousands of rows for a 100 TB crawl — so downstream consumers
    * broadcast it rather than shuffling documents.
    */
  def domainStats(docs: DataFrame, domain: Column, text: Column): DataFrame =
    docs.select(domain.as("domain"), qualityScore(tokens(text)).as("q"))
      .groupBy("domain")
      .agg(count(lit(1)).as("domain_docs"), avg("q").as("domain_quality"))

  /** Domain-reputation filter: keep only documents whose domain is (a)
    * not on the explicit blocklist and (b) has mean quality ≥
    * `minQuality` across the corpus. The per-domain table from
    * [[domainStats]] is broadcast back onto the documents — the corpus
    * never shuffles; the only wide op is the map-side-combined stats
    * aggregation. Output = the input columns plus `domain_docs` /
    * `domain_quality` for every surviving document.
    */
  def domainFilter(docs: DataFrame, domain: Column, text: Column,
      blocklist: Seq[String], minQuality: Double): DataFrame = {
    val keep = domainStats(docs, domain, text)
      .filter(!col("domain").isin(blocklist: _*) &&
        col("domain_quality") >= minQuality)
      .withColumnRenamed("domain", "__reputation_domain")
    docs.join(broadcast(keep), domain === col("__reputation_domain"))
      .drop("__reputation_domain")
  }

  /** Character-level Shannon entropy per document (bits/char) — the
    * quality filter that catches what token signals miss: repeated-
    * character runs and template spam score LOW, base64/binary junk
    * pasted into text scores HIGH, prose sits in a stable mid band.
    * Spelled as `H = log₂(len) − Σ n_c·log₂(n_c) / len` over per-(doc,
    * char) counts: one explode and two hash aggregations,
    * corpus-character-linear, no per-doc state — the same scale shape
    * as [[tfidf]]. Returns (id, n_chars, entropy).
    */
  def charEntropy(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cnt = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "")).as("c"))
      .groupBy("id", "c").agg(count(lit(1)).as("n"))
    cnt.groupBy("id")
      .agg(sum("n").cast("long").as("n_chars"),
        (log2(sum("n")) -
          sum(col("n") * log2(col("n"))) / sum("n")).as("entropy"))
  }

  /** Normalization fingerprint: md5 of lower-cased, whitespace-collapsed
    * text — the exact-dedup key that survives cosmetic edits.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** BPE-style pre-tokenization: the GPT-2 pre-tokenizer shape — leading-
    * space word pieces, number runs, punctuation runs — as a pure regex
    * extraction (no lookarounds, so RE2-based engines match Java exactly
    * and the DuckDB oracle can mirror it).
    */
  val bpePattern: String =
    "'[a-z]+| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Distributed BPE MERGE LEARNING (Sennrich et al., ACL'16): learn the
    * top-`numMerges` byte-pair merges from the corpus. The corpus is
    * touched exactly once — a word-count aggregation — and every
    * subsequent iteration runs on the VOCABULARY table (distinct words ×
    * frequency), which is orders of magnitude smaller than the corpus;
    * that hoist is what makes BPE learnable on 100 TB of text at all.
    *
    * Each word's symbol sequence is carried as a single-space-delimited
    * string with outer sentinels (`" c h a r s "`), so applying a merge
    * (l, r) is a left-to-right non-overlapping `regexp_replace` of
    * `" l r "` with `" lr "` — applied three times so chained
    * same-symbol runs ("l l l l") merge exactly like the classic greedy
    * array fold. Pair counting explodes adjacent symbol pairs weighted
    * by word frequency (one map-side-combined aggregation per
    * iteration); the argmax (count desc, then lexicographic — a total,
    * deterministic order) is a one-row `limit(1)` collect. Driver state
    * is one row per merge; per-iteration cost is vocab-bounded, so the
    * loop suits learning bounded merge tables (hundreds); full 32k-merge
    * production tokenizers want a specialized learner.
    *
    * Returns (rank, lhs, rhs, merged, pair_count), rank 1-based in
    * learned order.
    */
  def bpeTrain(docs: DataFrame, text: Column, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var vocab = words.select(
      concat(lit(" "),
        array_join(array_remove(split(col("w"), ""), ""), " "),
        lit(" ")).as("state"),
      col("cnt")).persist()
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    try {
      for (i <- 1 to numMerges) {
        val toks = split(trim(col("state")), " ")
        val pairs = vocab
          .select(explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"), col("cnt"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("cnt").as("c"))
        val best = pairs.orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).as[(String, String, Long)].collect()
        best.headOption.foreach { case (l, r, c) =>
          merges += ((i, l, r, l + r, c))
          val pat = java.util.regex.Pattern.quote(s" $l $r ")
          val rep = java.util.regex.Matcher.quoteReplacement(s" $l$r ")
          val folded = vocab.select(
            regexp_replace(regexp_replace(regexp_replace(
              col("state"), pat, rep), pat, rep), pat, rep).as("state"),
            col("cnt"))
          // persist bounds EXECUTION per iteration, but the logical plan
          // still grows one projection per merge — localCheckpoint every
          // 16 merges truncates the lineage so analysis/codegen cost
          // stays flat when learning large merge tables (the same
          // discipline as the star-contraction loop)
          val next =
            if (i % 16 == 0) folded.localCheckpoint(true)
            else { val p = folded.persist(); p.count(); p }
          vocab.unpersist()
          vocab = next
        }
      }
    } finally vocab.unpersist()
    merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a LEARNED merge table ([[bpeTrain]]'s output, or any ordered
    * (lhs, rhs) list) to the corpus — the inference half of BPE. Unlike
    * training, application needs NO iteration jobs: the whole merge
    * chain folds into ONE static projection (3 codegen'd
    * `regexp_replace`s per merge on the sentinel-delimited state, the
    * same non-overlapping triple-replace ≡ greedy-fold identity the
    * trainer uses), and it runs on the distinct-word VOCABULARY, not the
    * corpus — the corpus is touched once for the word-count aggregation.
    * At 100 TB: train once, broadcast the merge list as plan constants,
    * segment everything in a single vocab-bounded pass; per-document
    * piece sequences are then a map-side join of tokens against this
    * table.
    *
    * Returns (w, cnt, pieces): each distinct word, its corpus frequency,
    * and its final piece sequence under the merge table.
    */
  def bpeApply(docs: DataFrame, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val state0 = concat(lit(" "),
      array_join(array_remove(split(col("w"), ""), ""), " "), lit(" "))
    val merged = merges.foldLeft(state0) { case (st, (l, r)) =>
      val pat = java.util.regex.Pattern.quote(s" $l $r ")
      val rep = java.util.regex.Matcher.quoteReplacement(s" $l$r ")
      regexp_replace(regexp_replace(regexp_replace(st, pat, rep), pat, rep),
        pat, rep)
    }
    words.select(col("w"), col("cnt"),
      split(trim(merged), " ").as("pieces"))
  }

  /** [[bpeApply]] at PRODUCTION vocabulary scale: the folded-projection
    * spelling is elegant at tens of merges but builds a 3-regex-deep
    * expression PER MERGE — at a real tokenizer's 30k–50k merges that
    * is a ~100k-node expression tree that breaks Catalyst analysis and
    * codegen long before data size matters. This spelling is how real
    * tokenizers apply BPE: the merge table broadcasts as a rank map,
    * and each distinct word segments in a `mapPartitions` greedy loop —
    * repeatedly merge the lowest-rank adjacent pair (all occurrences,
    * left to right) until none remains. Apply time is flat in merge
    * count (hash lookups), the corpus is touched once (the word-count
    * aggregation), and the plan holds two nodes regardless of
    * vocabulary size.
    *
    * Semantics: identical to [[bpeApply]]'s rank-order fold for every
    * WELL-FORMED merge table — one where each merge side is a single
    * character or the product of an earlier merge (true of any table
    * [[bpeTrain]] learns, and of chained tables generally), because a
    * later merge can then never create an earlier merge's pair. The
    * property suite pins `bpeSegment ≡ bpeApply` on trained tables.
    *
    * Returns (w, cnt, pieces) — same contract as [[bpeApply]].
    */
  def bpeSegment(docs: DataFrame, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val rankArr = merges.toArray
    val rankMap: Map[(String, String), Int] =
      rankArr.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bc = spark.sparkContext.broadcast((rankArr, rankMap))
    words.as[(String, Long)].mapPartitions { it =>
      val (arr, ranks) = bc.value
      it.map { case (w, cnt) => (w, cnt, segmentWord(w, arr, ranks)) }
    }.toDF("w", "cnt", "pieces")
  }

  /** One word's greedy BPE segmentation under a broadcast rank table:
    * the classic min-rank merge loop (merge every occurrence of the
    * best-ranked adjacent pair, left to right, until no pair ranks).
    */
  private def segmentWord(w: String, arr: Array[(String, String)],
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = w.split("").filter(_.nonEmpty)
    while (syms.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) return syms.toSeq
      val (l, r) = arr(best)
      val out = Array.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
          out += l + r
          j += 2
        } else {
          out += syms(j)
          j += 1
        }
      }
      syms = out.result()
    }
    syms.toSeq
  }

  /** WordPiece segmentation — the OTHER production tokenizer inference
    * scheme beside BPE ([[bpeSegment]]): greedy longest-match-first
    * against a fixed vocabulary (the BERT tokenizer's algorithm). At
    * each position the LONGEST vocab piece matching the remaining word
    * wins; pieces after the first carry the `##` continuation prefix;
    * a position with no match makes the whole word `[UNK]` (vocabs
    * containing every single character never hit it).
    *
    * Same shape as [[bpeSegment]]: the corpus is touched once (the
    * word-count aggregation), the vocabulary broadcasts as a hash set
    * (30k pieces ≈ a few hundred KB), and each DISTINCT word segments
    * in a `mapPartitions` loop — vocab-bounded work, two-node plan
    * regardless of vocabulary size, apply time flat in vocab count
    * (hash lookups bounded by max piece length). Returns
    * (w, cnt, pieces).
    */
  def wordpieceSegment(docs: DataFrame, text: Column,
      vocab: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val maxLen = vocab.map(p => p.stripPrefix("##").length)
      .foldLeft(1)(math.max)
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    words.as[(String, Long)].mapPartitions { it =>
      val v = bc.value
      it.map { case (w, cnt) => (w, cnt, wordpieceWord(w, v, maxLen)) }
    }.toDF("w", "cnt", "pieces")
  }

  /** Minimum-cost segmentation — the unigram-LM (SentencePiece) shape
    * completing the tokenizer triple beside [[bpeSegment]] (merge
    * rules) and [[wordpieceSegment]] (greedy longest match): each word
    * segments into the piece sequence of MINIMUM TOTAL COST under a
    * piece→cost table, found by the classic left-to-right Viterbi DP.
    * Costs are INTEGERS rather than float log-probs — the
    * engine-portable determinism choice (production tokenizers
    * quantize LM scores for exactly this reproducibility; a float DP's
    * argmin can flip on last-ulp ln differences across engines), with
    * ties broken to the lexicographically smallest piece string — a
    * total order the DP preserves under suffix extension (the piece
    * separator ' ' sorts below every word character).
    *
    * Same scale shape as the other two: corpus touched once (the
    * word-count aggregation), cost table broadcast, each DISTINCT word
    * runs an O(len × maxPieceLen) DP in `mapPartitions`; plan size
    * constant in vocabulary size. A position with no reachable
    * segmentation yields `[UNK]` (cost −1). Returns
    * (w, cnt, cost, pieces).
    */
  def minCostSegment(docs: DataFrame, text: Column,
      costs: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val maxLen = costs.keys.map(_.length).foldLeft(1)(math.max)
    val bc = spark.sparkContext.broadcast(costs)
    words.as[(String, Long)].mapPartitions { it =>
      val c = bc.value
      it.map { case (w, cnt) =>
        viterbiWord(w, c, maxLen) match {
          case Some((cost, pieces)) => (w, cnt, cost, pieces)
          case None => (w, cnt, -1, Seq("[UNK]"))
        }
      }
    }.toDF("w", "cnt", "cost", "pieces")
  }

  /** One word's min-cost DP: best(p) = min by (cost, pieces-string)
    * over pieces ending at p. Returns None when position len(w) is
    * unreachable.
    */
  private def viterbiWord(w: String, costs: Map[String, Int],
      maxLen: Int): Option[(Int, Seq[String])] = {
    val best = Array.fill[(Int, String)](w.length + 1)(null)
    best(0) = (0, "")
    var p = 1
    while (p <= w.length) {
      var l = 1
      while (l <= math.min(maxLen, p)) {
        if (best(p - l) != null) {
          val piece = w.substring(p - l, p)
          costs.get(piece).foreach { pc =>
            val cost = best(p - l)._1 + pc
            val pieces = if (best(p - l)._2.isEmpty) piece
              else best(p - l)._2 + " " + piece
            if (best(p) == null || cost < best(p)._1 ||
              (cost == best(p)._1 && pieces < best(p)._2))
              best(p) = (cost, pieces)
          }
        }
        l += 1
      }
      p += 1
    }
    Option(best(w.length)).map { case (c, s) => (c, s.split(" ").toSeq) }
  }

  /** One vocabulary-PRUNING round — the SentencePiece training step
    * [[minCostSegment]] is the inference half of: segment the corpus
    * under the candidate cost table, count how often each piece is
    * actually USED (weighted by word frequency), drop every
    * multi-character piece used fewer than `minUses` times (single
    * characters always survive — the base alphabet keeps every word
    * segmentable, SentencePiece's required-character rule), and
    * re-segment under the pruned table. Iterating this to a fixpoint
    * is unigram-LM training; one round is the gate-checkable unit.
    *
    * Scale shape: both segmentation passes are the [[minCostSegment]]
    * vocab-bounded `mapPartitions`; the usage count is one explode +
    * partial+final sum over the (distinct-word × pieces) relation —
    * vocabulary-sized, never corpus-sized — and the pruned table is a
    * driver-side filter of the (bounded) candidate map, the same
    * collect class as [[bpeTrain]]'s merge table. Returns the pruned
    * cost table and the re-segmented words.
    */
  def unigramPrune(docs: DataFrame, text: Column,
      costs: Map[String, Int],
      minUses: Long): (Map[String, Int], DataFrame) = {
    val first = minCostSegment(docs, text, costs)
    val usage = first
      .select(explode(col("pieces")).as("p"), col("cnt"))
      .groupBy("p").agg(sum("cnt").as("uses"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = costs.filter { case (p, _) =>
      p.length == 1 || usage.getOrElse(p, 0L) >= minUses }
    (kept, minCostSegment(docs, text, kept))
  }

  /** Unigram-LM vocabulary TRAINING — [[unigramPrune]] iterated to a
    * FIXPOINT, the SentencePiece training schedule the one-round gate
    * was the checkable unit of: segment the corpus under the current
    * candidate table, drop under-used multi-character pieces, and
    * repeat until the vocabulary stops shrinking or `maxRounds` is
    * reached. Each round is one [[minCostSegment]] pass (corpus
    * word-counts aggregated once and reused implicitly through the
    * distinct-word relation) plus one vocab-bounded usage count; the
    * only driver-side state is the candidate cost table itself — the
    * same bounded collect class as [[bpeTrain]]'s merge table, never
    * a corpus- or distinct-word-sized relation.
    *
    * Early-stop soundness: re-segmenting under an unchanged vocabulary
    * is idempotent, so stopping at the fixpoint returns exactly what
    * running the remaining rounds would — an oracle may replay a FIXED
    * round count and match regardless of where convergence landed.
    *
    * Returns (final cost table, final segmentation à la
    * [[minCostSegment]], rounds actually run).
    */
  def unigramTrain(docs: DataFrame, text: Column,
      costs: Map[String, Int], minUses: Long,
      maxRounds: Int): (Map[String, Int], DataFrame, Int) = {
    var cur = costs
    var seg = minCostSegment(docs, text, cur)
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val usage = seg
        .select(explode(col("pieces")).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("uses"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = cur.filter { case (p, _) =>
        p.length == 1 || usage.getOrElse(p, 0L) >= minUses }
      converged = kept.size == cur.size
      cur = kept
      if (!converged) seg = minCostSegment(docs, text, cur)
      rounds += 1
    }
    (cur, seg, rounds)
  }

  /** Unigram-LM EM training — the cost-RE-ESTIMATION half [[unigramTrain]]
    * (pure pruning) leaves out, completing the SentencePiece schedule:
    * each round segments under the current table, prunes under-used
    * multi-character pieces, and RE-DERIVES every survivor's cost from
    * its observed usage share — the M-step. Costs stay INTEGER for
    * engine-portable determinism (the [[minCostSegment]] contract): a
    * piece's cost is `1 + bitlength(totalUses / max(uses, 1))`, the
    * integer log₂ of its inverse frequency — monotone in -log p like a
    * real LM cost, computed in exact integer arithmetic both engines
    * replay bit-identically (`1 + length(bin(t // greatest(uses, 1)))`
    * in SQL; no float log whose last ulp could flip an argmin). A
    * never-used surviving piece (a base-alphabet char the corpus
    * spells around) gets the max cost `1 + bitlength(totalUses)`.
    *
    * Fixed `rounds` (costs keep moving, so there is no vocab-size
    * fixpoint to stop at) keeps the oracle a finite relational replay.
    * Scale shape identical to [[unigramTrain]]: corpus touched once
    * per round through the distinct-word relation, usage counts
    * vocab-bounded, the only driver-side state the candidate table.
    * Returns (final cost table, final segmentation, rounds).
    */
  def unigramTrainEm(docs: DataFrame, text: Column,
      costs: Map[String, Int], minUses: Long,
      rounds: Int): (Map[String, Int], DataFrame, Int) = {
    var cur = costs
    var seg = minCostSegment(docs, text, cur)
    var r = 0
    while (r < rounds) {
      val usage = seg
        .select(explode(col("pieces")).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("uses"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      val totUses = usage.values.sum
      val kept = cur.keySet.filter(p =>
        p.length == 1 || usage.getOrElse(p, 0L) >= minUses)
      cur = kept.map { p =>
        val denom = math.max(usage.getOrElse(p, 0L), 1L)
        p -> (1 + java.lang.Long.toBinaryString(totUses / denom).length)
      }.toMap
      seg = minCostSegment(docs, text, cur)
      r += 1
    }
    (cur, seg, r)
  }

  /** One word's greedy longest-match WordPiece segmentation. */
  private def wordpieceWord(w: String, vocab: Set[String],
      maxLen: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val raw = w.substring(pos, pos + l)
        val cand = if (pos == 0) raw else "##" + raw
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) return Seq("[UNK]")
      out += hit
      pos += hit.stripPrefix("##").length
    }
    out.result()
  }

  /** Winnowing document fingerprints (the rolling-hash scheme of MOSS):
    * hash every character k-gram, then keep the minimum hash of each
    * sliding window of `w` consecutive k-gram hashes. Guarantees any
    * shared substring of length ≥ w+k−1 contributes a shared fingerprint
    * — the classic local-similarity sketch.
    *
    * Shape note: the window minima are computed by `zip_with`-reducing w
    * shifted slices of the gram-hash array — linear in document length
    * (w re-evaluations of the gram array), NOT the naive
    * per-window-slice transform, which re-evaluates the gram hashes per
    * window and goes quadratic.
    */
  /** 48-bit gram hash both engines can compute — the leading 12 hex chars
    * of md5 as a signed BIGINT (DuckDB: `('0x'||substr(md5(g),1,12))::BIGINT`).
    * xxhash64 (the default winnowing hash) has no DuckDB twin; swapping
    * this in makes the whole winnowing pipeline oracle-checkable.
    */
  def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Compiled winnowing fingerprints ([[graft.functions.WinnowHashes]],
    * 48-bit md5-prefix grams — the oracle-checkable hash): the per-gram
    * loops run in compiled code, one call per row. The HOF spelling
    * below evaluates interpreted per gram (~100 µs/gram measured at
    * sf0.1 — two minutes of scan the moment a consumer actually needs
    * the fingerprints); it remains the spec-pinned equivalence
    * reference.
    */
  def winnowingFingerprintsFast(text: Column, k: Int = 5,
      w: Int = 4): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.toColumn(graft.functions.WinnowHashes(
      Bridge.toExpr(text), k, w))
  }

  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4,
      hash: Column => Column = xxhash64(_)): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    val grams = when(length(norm) >= k,
      transform(sequence(lit(0), length(norm) - k),
        i => hash(norm.substr(i + 1, lit(k)))))
      .otherwise(array(hash(norm)))
    val nWin = greatest(size(grams) - (w - 1), lit(1))
    val shifted = (0 until w).map(l => slice(grams, lit(l + 1), nWin))
    val mins = shifted.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    array_distinct(mins)
  }
  /** Winnowing overlap join — the MOSS document-similarity shape
    * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD 2003): pairs of documents sharing
    * fingerprints, scored by `|common| / min(|fps_a|, |fps_b|)` (the
    * containment-style ratio MOSS reports). Unlike token-set Jaccard,
    * winnowing fingerprints are POSITIONAL (k-gram window minima), so
    * the overlap detects shared passages, not just shared vocabulary.
    *
    * Scale shape: identical to [[Dedup.jaccardPairs]] — fingerprints
    * with document frequency > `maxDF` are dropped before the self-join
    * (the stop-fingerprint cap that bounds the quadratic term on
    * boilerplate), sizes still count the RARE set so the ratio is
    * df-consistent, and only 8-byte hashes are ever joined. `k` defaults
    * LONG (20 chars, MOSS-style): short grams are vocabulary, not
    * passages — measured on the templated corpus, k=5 put most
    * fingerprints in many documents and the pair join went quadratic
    * (139 s at sf0.1), while k=20 fingerprints are selective (2.4 s,
    * same planted-pair recall).
    */
  def winnowOverlapPairs(docs: DataFrame, id: Column, text: Column,
      k: Int = 20, maxDF: Long = 20, minRatio: Double = 0.8): DataFrame = {
    val fps = docs.select(id.as("id"),
      explode(winnowingFingerprintsFast(text, k = k)).as("fp"))
      .persist()
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDF).select("fp")
    val rare = fps.join(keep, "fp").persist()
    val sizes = rare.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val cmn = rare.as("a")
      .join(rare.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    cmn
      .join(sizes.select(col("id").as("id_a"), col("n_fp").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_fp").as("n_b")), "id_b")
      .withColumn("overlap",
        col("n_common").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= minRatio)
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("overlap"), 6).as("overlap"))
  }

  /** PII scrubbing: regex redaction of emails, IPv4 addresses, and
    * NANP-style phone numbers. Patterns avoid lookarounds so RE2-based
    * engines (and the DuckDB oracle) agree with Java's regex exactly.
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val phoneRe = "\\+?[0-9]{1,2}[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Gopher-style repetition/shape signals used by pretraining filters:
    * duplicate word-n-gram fraction, mean word length, and
    * non-alphanumeric symbol ratio.
    */
  def dupNgramRatio(toks: Column, n: Int): Column = {
    val sh = wordShingles(toks, n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  def meanWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks)

  def symbolRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
      .cast("double") / greatest(length(text), lit(1))

  /** Repeated-span coverage — the distributed shape of exact substring
    * dedup (Lee, Ippolito, Nystrom, Zhang, Eck, Callison-Burch, Carlini,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022, arXiv:2107.06499): their suffix-array pass reports every
    * ≥k-token substring occurring twice in the corpus; here every
    * L-token window is hashed POSITIONALLY, windows whose hash occurs
    * ≥ `minOcc` times corpus-wide are hits, and each doc's hit
    * positions merge into maximal intervals — any repeat of ≥ L tokens
    * is covered by its constituent L-windows, found with two shuffles
    * (hash df + per-doc interval merge) instead of a global suffix
    * sort.
    *
    * One row per doc: (id, n_tokens, n_spans, covered_tokens,
    * coverage). Scale shape: grams shuffle as 8-byte hashes (48-bit
    * md5 prefix, the oracle-mirrorable spelling); the interval merge
    * windows over each doc's HIT positions only, never the corpus.
    */
  private def tokenized(docs: DataFrame, id: Column, text: Column) =
    docs.select(id.as("id"), tokens(text).as("toks"))
      .select(col("id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))

  /** The merged repeat intervals per doc: (id, s, e) half-open token
    * ranges covered by some corpus-repeated L-window. The shared core
    * of [[repeatedSpans]] (reporting) and [[scrubRepeatedSpans]]
    * (removal).
    */
  def repeatedSpanIntervals(docs: DataFrame, id: Column, text: Column,
      L: Int, minOcc: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = tokenized(docs, id, text)
    // positional L-gram hashes; docs shorter than L contribute none
    val grams = tk.filter(col("n_tokens") >= L)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), (col("n_tokens") - L).cast("int")),
        i => conv(substring(md5(
          concat_ws(" ", slice(col("toks"), i + 1, lit(L)))), 1, 12),
          16, 10).cast("long"))))
      .toDF("id", "pos", "h")
      .persist()
    val hot = grams.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc).select("h")
    val hits = grams.join(hot, "h").select("id", "pos")
    val w = Window.partitionBy("id").orderBy("pos")
    // gaps-and-islands: a hit starts a new span iff it begins past the
    // furthest end any earlier hit reached
    val prevMaxEnd = max(col("pos") + L)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = hits
      .withColumn("new_span",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1).otherwise(0))
      .withColumn("island", sum(col("new_span"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy("id", "island")
      .agg(min("pos").as("s"), (max(col("pos")) + L).as("e"))
      .select("id", "s", "e")
  }

  def repeatedSpans(docs: DataFrame, id: Column, text: Column,
      L: Int, minOcc: Long): DataFrame = {
    val spans = repeatedSpanIntervals(docs, id, text, L, minOcc)
    val cov = spans.groupBy("id").agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s")).cast("long").as("covered_tokens"))
    tokenized(docs, id, text).select("id", "n_tokens")
      .join(cov, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("coverage"))
  }

  /** The removal transform the coverage report motivates (Lee et al.'s
    * end state): drop every token inside a repeated interval and
    * re-join the survivors. Aggressive-scrub semantics — ALL
    * occurrences go, the deterministic choice that needs no global
    * keeper election; pair with [[repeatedSpans]]' coverage column to
    * skip docs the scrub would hollow out. Output: (id, n_tokens,
    * kept_tokens, clean_text).
    */
  def scrubRepeatedSpans(docs: DataFrame, id: Column, text: Column,
      L: Int, minOcc: Long): DataFrame = {
    val spansArr = repeatedSpanIntervals(docs, id, text, L, minOcc)
      .groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    tokenized(docs, id, text)
      .join(spansArr, Seq("id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s:int,e:int>>")))
      .withColumn("kept", filter(
        zip_with(col("toks"),
          sequence(lit(0), (size(col("toks")) - 1).cast("int")),
          (t, i) => when(
            exists(col("spans"),
              sp => i >= sp("s") && i < sp("e")), lit(null)).otherwise(t)),
        x => x.isNotNull))
      .select(col("id"), col("n_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Content-defined chunking (the Rabin-fingerprint shape): a chunk
    * boundary falls after character position `i+w−1` wherever the
    * w-char gram starting at i hashes to 0 (mod m) — so boundaries are
    * decided by LOCAL content, and inserting or deleting bytes only
    * re-chunks the neighborhood instead of shifting every downstream
    * boundary the way fixed-stride chunking does. That locality is the
    * point: chunk-hash dedup survives the insertions/edits that defeat
    * whole-doc fingerprints, which is how backup systems and
    * near-identical-crawl dedup slice big payloads. Expected chunk
    * length is m characters (tune m, not w).
    *
    * Per-row HOF expressions only (gram hashing, cut filtering, and
    * the cut→interval fold are all O(len) per document) plus one
    * explode — corpus-character-linear, no shuffle, no per-doc state.
    * The gram hash is the oracle-checkable 48-bit md5 prefix
    * ([[md5Hash48]]), so an external engine derives identical chunks.
    * Returns (id, chunk_idx, start, chunk_len, chunk_hash); the chunks
    * partition the text exactly (starts contiguous from 1, lengths sum
    * to the doc length — pinned in TextAnalysisSpec).
    */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
      w: Int = 8, m: Int = 16): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    cdcFold(docs, id, text,
      Bridge.toColumn(graft.functions.CdcCuts(
        Bridge.toExpr(col("__t")), w, m)))
  }

  /** Interpreted HOF spelling of the cut rule — kept as the
    * spec-pinned equivalence reference for the compiled
    * [[graft.functions.CdcCuts]] (same precedent as
    * [[winnowingFingerprints]] vs the compiled fast path: per-position
    * md5 through interpreted lambda dispatch is the scan-killer the
    * native expression exists to avoid).
    */
  private[graft] def cdcChunksHof(docs: DataFrame, id: Column,
      text: Column, w: Int = 8, m: Int = 16): DataFrame = {
    val t = col("__t")
    val len = length(t)
    val cutsExpr = filter(
      when(len >= w,
        transform(sequence(lit(1), len - w + 1),
          i => when(
            pmod(md5Hash48(t.substr(i, lit(w))), lit(m.toLong)) === 0,
            i + w - 1).otherwise(lit(null))))
        .otherwise(array().cast("array<int>")),
      x => x.isNotNull && x < len)
    cdcFold(docs, id, text, cutsExpr)
  }

  /** Shared cut→interval fold: cuts (1-based end positions, ascending,
    * all < len) become contiguous (start, end) chunks plus the tail.
    */
  private def cdcFold(docs: DataFrame, id: Column, text: Column,
      cuts: Column): DataFrame =
    docs.select(id.as("id"), text.as("__t"))
      .withColumn("__cuts", cuts)
      .withColumn("__ends", concat(col("__cuts"), array(length(col("__t")))))
      .select(col("id"), col("__t"), col("__cuts"),
        posexplode(transform(col("__ends"), (e, i) =>
          struct(coalesce(get(col("__cuts"), i - 1) + 1, lit(1)).as("s"),
            e.as("e")))))
      .select(col("id"), col("pos").as("chunk_idx"),
        col("col.s").as("start"),
        (col("col.e") - col("col.s") + 1).as("chunk_len"),
        md5Hash48(col("__t").substr(col("col.s"),
          col("col.e") - col("col.s") + 1)).as("chunk_hash"))
      .filter(col("chunk_len") > 0)

  /** Chunk-level near-dup pairs over [[cdcChunks]] — the payload-dedup
    * twin of n-gram containment: documents sharing at least `minShared`
    * content-defined chunk hashes pair up, scored by
    * `shared / min(|A|, |B|)` over their distinct chunk sets. Because
    * boundaries are content-local, a prefix edit or mid-doc insertion
    * leaves the rest of the chunk stream identical — this catches the
    * shifted near-copies that fixed-stride slicing misses. `maxDF`
    * drops chunks appearing in more than that many documents (shared
    * boilerplate blocks — the stop-shingle discipline, without which
    * one ubiquitous chunk makes the pair join quadratic at scale).
    *
    * Scale shape: one chunking pass, per-chunk df reduction, and a
    * self-join keyed on chunk_hash bounded by genuinely duplicated
    * chunks — never all-pairs. Returns (id_a, id_b, shared, overlap).
    */
  def cdcDupPairs(docs: DataFrame, id: Column, text: Column,
      w: Int = 8, m: Int = 16, minShared: Long = 3,
      maxDF: Long = 64): DataFrame = {
    val u = cdcChunks(docs, id, text, w, m)
      .select("id", "chunk_hash").distinct()
    val dfc = u.groupBy("chunk_hash").agg(count(lit(1)).as("df"))
    val uk = u.join(dfc.filter(col("df") <= maxDF), "chunk_hash")
      .select("id", "chunk_hash")
    val n = uk.groupBy("id").agg(count(lit(1)).as("nch"))
    val pairs = uk.as("a").join(uk.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(n.select(col("id").as("id_a"), col("nch").as("na")), "id_a")
      .join(n.select(col("id").as("id_b"), col("nch").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("shared").cast("double") /
          least(col("na"), col("nb")), 6).as("overlap"))
  }

  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Token-bounded document chunking with overlap — the context-window
    * prep step for training/retrieval: each document becomes
    * ⌈(n − overlap·[n > size]) / stride⌉ chunks of up to `maxTokens`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens
    * (stride = maxTokens − overlap). Pure per-row array arithmetic
    * (sequence → explode → slice → join): chunking 100 TB of text is one
    * embarrassingly-parallel map with no shuffle at all.
    *
    * Returns (…df columns…, chunk_id, chunk_tokens, chunk_text); chunk
    * ids are 0-based and dense per document. A document shorter than
    * `maxTokens` yields exactly one chunk (its full text, normalized).
    */
  def chunk(df: org.apache.spark.sql.DataFrame, text: Column,
      maxTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val nChunks = greatest(
      ceil((size(col("__toks")) - overlap).cast("double") / stride)
        .cast("int"), lit(1))
    df.withColumn("__toks", tokens(text))
      .withColumn("chunk_id",
        explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)))
      .withColumn("chunk_tokens", size(col("__chunk")))
      .withColumn("chunk_text", concat_ws(" ", col("__chunk")))
      .drop("__toks", "__chunk")
  }

  /** Paragraph-level EXACT dedup with document reconstruction — the
    * C4/Gopher boilerplate scrub: across the whole corpus, every
    * paragraph that occurs more than once keeps only its FIRST
    * occurrence (smallest (doc id, paragraph index) — a total order, so
    * the keeper election is deterministic) and every other copy is
    * dropped; each document is then re-assembled from its surviving
    * paragraphs in original order. This is the granularity whole-doc
    * fingerprints miss: nav bars, cookie banners, and license footers
    * repeat across millions of pages whose bodies are unique.
    *
    * `paras` carries one row per paragraph: (id, idx, para). Returns
    * one row per document: (id, n_paras, kept_paras, clean_text) with
    * clean_text = kept paragraphs joined by '\n' ('' when everything
    * was scrubbed — the row survives so the caller sees the hollowing).
    *
    * Scale shape: the keeper election groups by a 128-bit paragraph
    * hash carrying only (doc id, idx) — partial+final `min(struct)`
    * aggregation, map-side combinable, so a boilerplate paragraph
    * repeated 10⁹ times contributes one candidate per map partition
    * instead of 10⁹ rows to one reducer. Paragraph TEXT shuffles
    * exactly twice (the hash-keyed keep-flag join — where the hot hash
    * is many paragraph rows against ONE keeper row, a plain hash join,
    * no aggregation skew — and the doc-keyed reconstruction), never
    * through a corpus-wide window partition.
    */
  def paragraphDedup(paras: DataFrame, id: Column, idx: Column,
      para: Column): DataFrame = {
    val p = paras.select(id.as("id"), idx.as("idx"), para.as("para"))
      .withColumn("h", md5(col("para")))
    val keepers = p.groupBy("h")
      .agg(min(struct(col("id"), col("idx"))).as("k"))
    val kept = p.join(keepers, "h")
      .withColumn("keep",
        col("id") === col("k.id") && col("idx") === col("k.idx"))
    kept.groupBy("id").agg(
      count(lit(1)).as("n_paras"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept_paras"),
      // collect_list drops the null (scrubbed) slots; array_sort on
      // struct(idx, para) restores document order
      collect_list(when(col("keep"), struct(col("idx"), col("para"))))
        .as("__kept"))
      .select(col("id"), col("n_paras"), col("kept_paras"),
        array_join(transform(array_sort(col("__kept")), s => s("para")),
          "\n").as("clean_text"))
  }

  /** One named document-quality rule: `name` reports in the failure
    * array, `fails` is any boolean Column over the document row
    * (true = document FAILS the rule).
    */
  final case class QualityRule(name: String, fails: Column)

  /** The Gopher-style heuristic rule bank (Rae et al. 2021 §A1.1's
    * shape): hard document-quality predicates evaluated as ONE
    * codegen'd projection inside the scan — no shuffle, no UDF — each
    * document reporting exactly which rules it failed (the audit trail
    * a filtering pipeline needs; a bare boolean can't explain a 40%
    * corpus cut). Compose with [[qualityScore]] (soft scoring) and
    * [[repetitionSignals]]: rules gate, scores rank.
    *
    * Returns the input row's `id` plus n_words, failed (the SORTED
    * array of failed rule names — deterministic), and pass.
    */
  def qualityRules(docs: DataFrame, id: Column, text: Column,
      rules: Seq[QualityRule]): DataFrame = {
    val failed = array_sort(filter(
      array(rules.map(r =>
        when(r.fails, lit(r.name)).otherwise(lit(null))): _*),
      x => x.isNotNull))
    docs.select(id.as("id"),
      size(tokens(text)).as("n_words"),
      failed.as("failed"),
      (size(failed) === 0).as("pass"))
  }

  /** The default rule bank: Gopher's published thresholds where the
    * signal is computable from whitespace tokens (word count bounds,
    * mean word length bounds, alphabetic-word ratio, stopword
    * presence) plus a duplicate-fraction bound (the type-token form of
    * the repetition family). Every predicate is also expressible in
    * plain SQL — the oracle checks values, not just shapes.
    */
  def gopherRules(text: Column): Seq[QualityRule] = {
    val toks = tokens(text)
    val nWords = size(toks)
    val meanLen = aggregate(toks, lit(0), (a, t) => a + length(t))
      .cast("double") / nWords
    val alphaRatio = size(filter(toks, t => t.rlike("[a-z]")))
      .cast("double") / nWords
    val nStop = size(filter(toks,
      t => t.isin(Seq("the", "a", "of", "to", "and"): _*)))
    val dupFrac = lit(1.0) -
      size(array_distinct(toks)).cast("double") / nWords
    Seq(
      QualityRule("too_short", nWords < 50),
      QualityRule("too_long", nWords > 100000),
      QualityRule("word_length", meanLen < 3 || meanLen > 10),
      QualityRule("alpha_ratio", alphaRatio < 0.8),
      QualityRule("stopwords", nStop < 2),
      QualityRule("dup_fraction", dupFrac > 0.8))
  }
}
