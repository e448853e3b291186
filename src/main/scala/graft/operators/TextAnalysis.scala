package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis over `documents` (SURVEY.md §2.8, rows 42-45): language
  * id, quality scoring, token counting, fingerprinting. All pure column
  * expressions (higher-order array functions) — zero shuffle until the
  * final sort, so these scale as a single scan pass at 100 TB.
  */
object TextAnalysis {

  /** Stopword lists for the n-gram/stopword language heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"))

  private def docsW(t: Tables): DataFrame = Dedup.withWords(t.documents)

  private def hitExpr(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(w, x -> x IN ($list)))"
  }

  /** #42 text_langid — per-language stopword hit counts; argmax with a
    * deterministic preference order; no hits at all ⇒ unknown.
    */
  /** The unsorted scorer — chain consumers (`langIdAgreement`) join this
    * by doc_id; the presentation sort stays on the registered face only
    * (the dsirScores discipline).
    */
  /** Stage the word-model hit counts + prediction as ADDED columns on any
    * frame carrying `w` — ONE scorer definition for the standalone face
    * and the agreement matrix (which computes both models in one scan).
    */
  private def withWordPred(df: DataFrame): DataFrame =
    df.select(df.columns.map(col) ++
        stopwords.map { case (lang, ws) => expr(hitExpr(ws)).as(s"${lang}_n") }: _*)
      .withColumn("pred_lang",
        when(col("en_n") + col("es_n") + col("de_n") === 0, "unknown")
          .when(col("en_n") >= col("es_n") && col("en_n") >= col("de_n"), "en")
          .when(col("es_n") >= col("de_n"), "es")
          .otherwise("de"))

  private[operators] def langIdUnsorted(t: Tables): DataFrame =
    withWordPred(docsW(t)).select(col("doc_id"),
      col("en_n"), col("es_n"), col("de_n"), col("pred_lang"))

  def langId(t: Tables): DataFrame = langIdUnsorted(t).orderBy(col("doc_id"))

  /** Character-bigram profiles per language (the n-gram half of the
    * language-ID heuristic; stopwords are the word half).
    */
  val bigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on"),
    "es" -> Seq("de", "la", "el", "en", "os", "as", "ue"),
    "de" -> Seq("ch", "ei", "ie", "un", "au", "be", "st"))

  /** text_langid_ngram — #42's n-gram variant: score = count of the doc's
    * character bigrams that hit each language's profile. The bigram array
    * is a `transform(sequence(...))` expression — still zero-shuffle
    * codegen'd column work.
    */
  /** Stage the bigram-model hit counts + prediction as ADDED columns on
    * any frame carrying `text` — see [[withWordPred]].
    */
  private def withNgramPred(df: DataFrame): DataFrame = {
    def hits(profile: Seq[String]): String = {
      val list = profile.map(p => s"'$p'").mkString(", ")
      s"size(filter(__bg, x -> x IN ($list)))"
    }
    // stage the bigram array ONCE: materializing a |text|-element substring
    // array is the dominant per-row cost of this scorer, and inlining the
    // transform into each profile's hit count built it three times per row
    // (codegen does not CSE the higher-order fold across projections —
    // measured 3× the per-row work on the agreement face, where the
    // aggregate actually forces the scorer columns)
    df.withColumn("__bg",
        expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"))
      .transform(d => d.select(d.columns.map(col) ++
        bigramProfiles.map { case (lang, ps) => expr(hits(ps)).as(s"${lang}_bg") }: _*))
      .withColumn("pred_lang_ngram",
        when(col("en_bg") + col("es_bg") + col("de_bg") === 0, "unknown")
          .when(col("en_bg") >= col("es_bg") && col("en_bg") >= col("de_bg"), "en")
          .when(col("es_bg") >= col("de_bg"), "es")
          .otherwise("de"))
      .drop("__bg")
  }

  private[operators] def langIdNgramUnsorted(t: Tables): DataFrame =
    withNgramPred(t.documents).select(col("doc_id"),
      col("en_bg"), col("es_bg"), col("de_bg"), col("pred_lang_ngram"))

  def langIdNgram(t: Tables): DataFrame =
    langIdNgramUnsorted(t).orderBy(col("doc_id"))

  /** The quality formula over a `w` words column — the ONE definition both
    * `qualityScore` and the curation gate (`TrainData.curation`) compile
    * in, so the gate can never drift from the standalone operator.
    */
  def qualityCol: org.apache.spark.sql.Column = {
    val n = size(col("w"))
    val hits = expr(hitExpr(stopwords.head._2))
    floor((least(n, lit(50)).cast("double") / 50 * 0.5 +
      hits.cast("double") / n * 0.5) * 10000) / 10000
  }

  /** #43 text_quality_score — length / stopword-ratio features + a single
    * score. floor-rounded ratios so the oracle can't hit decimal-tie
    * divergence between engines.
    */
  def qualityScore(t: Tables): DataFrame =
    docsW(t).select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        expr(hitExpr(stopwords.head._2)).as("stop_hits"),
        qualityCol.as("quality"))
      .select(
        col("doc_id"), col("n_words"),
        (floor(col("stop_hits").cast("double") / col("n_words") * 10000) / 10000).as("stop_ratio"),
        col("quality"))
      .orderBy(col("doc_id"))

  /** BPE-ish token pattern: letter runs, digit runs, single other glyphs. */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** #44 text_token_count — whitespace tokens vs regex "BPE-ish" tokens and
    * the chars-per-token ratio (the pretraining-cost estimator).
    */
  def tokenCount(t: Tables): DataFrame =
    docsW(t).select(
        col("doc_id"),
        size(col("w")).as("ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$bpePattern', 0)")).as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
        (floor(col("n_chars").cast("double") / col("bpe_tokens") * 10000) / 10000)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))

  /** PII patterns for training-data scrubbing (emails, international-ish
    * phone numbers, 16-digit card-like numbers). Java/RE2-compatible.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9 -]{7,14}[0-9]", "<PHONE>"),
    ("card",  "[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}", "<CARD>"))

  /** text_pii_scrub — redact PII spans with typed placeholders and report
    * per-doc hit counts. Chained regexp_replace — pure codegen'd column
    * work, the standard pre-tokenization scrub pass of a training-data
    * pipeline. (Card before phone: a card number must not be half-eaten by
    * the phone pattern.)
    */
  def piiScrub(t: Tables): DataFrame = {
    val ordered = piiPatterns.sortBy { case (name, _, _) => if (name == "card") 0 else 1 }
    val scrubbed = ordered.foldLeft(col("text")) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    // Scala function API, not expr(): the patterns contain backslashes that
    // a Spark SQL string literal would unescape differently than the oracle
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as(s"n_$name")
    }
    t.documents
      .select(col("doc_id") +: scrubbed.as("clean_text") +: counts: _*)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
        col("n_email"), col("n_phone"), col("n_card"))
      .orderBy(col("doc_id"))
  }

  /** text_unigram_lm — language-model quality scoring, the KenLM-filter
    * shape every pretraining pipeline runs, at its unigram floor: score
    * each document by its mean negative log-likelihood under the CORPUS
    * unigram distribution. Low = templated/boilerplate, high = rare-token
    * gibberish; both tails get filtered.
    *
    * Scale shape: vocabulary = ONE map-side-combined groupBy on token
    * (bounded by |vocab|, not corpus size); scoring joins tokens to their
    * probabilities on the same token axis, then aggregates per doc — two
    * shuffles total, both on natural keys. At 100 TB the vocab frame is
    * megabytes → Spark broadcasts the probability join.
    */
  /** The unsorted LM frame — chain consumers (`perplexityBucket`) join
    * this by doc_id; the presentation sort stays on the registered face.
    */
  private[operators] def unigramLmUnsorted(t: Tables): DataFrame = {
    val toks = docsW(t).select(col("doc_id"), explode(col("w")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val totalTok = vocab.agg(sum(col("tf")).as("n_total"))
    val scored = toks
      .join(vocab, "tok")
      .crossJoin(broadcast(totalTok))
      .select(col("doc_id"),
        (-log(2.0, col("tf").cast("double") / col("n_total"))).as("nll"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("nll")).as("sum_nll"))
      // 2dp, not the usual 4: the per-doc sum crosses a shuffle (token-axis
      // join), so accumulation ORDER is engine/plan-dependent and the FP
      // drift (~1e-8 scaled) would flip a 4dp floor on boundary values
      .select(col("doc_id"), col("n_tok"),
        (floor(col("sum_nll") / col("n_tok") * 100) / 100).as("mean_nll"))
  }

  def unigramLm(t: Tables): DataFrame =
    unigramLmUnsorted(t).orderBy(col("doc_id"))

  /** text_repetition — within-document repetition signals (the Gopher/C4
    * style quality rules that catch degenerate generated/scraped text):
    * duplicate-word fraction, duplicate-bigram fraction, and the share of
    * the document owned by its single most-frequent word bigram. All three
    * are per-row array expressions — `array_distinct` for the duplicate
    * fractions and a sort+run-length `aggregate` fold for the top-bigram
    * share — zero shuffle, fully codegen, one scan pass at any scale.
    */
  def repetition(t: Tables): DataFrame = {
    val grams = expr(
      "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))")
    // max run length in the sorted bigram array = count of the most
    // frequent bigram; a fold keeps it inside the row (no per-gram explode)
    val topRun = expr(
      """aggregate(array_sort(g),
           named_struct('prev', '', 'run', 0, 'best', 0),
           (a, x) -> named_struct(
             'prev', x,
             'run',  IF(x = a.prev, a.run + 1, 1),
             'best', greatest(a.best, IF(x = a.prev, a.run + 1, 1))),
           a -> a.best)""")
    docsW(t)
      .filter(size(col("w")) >= 2)
      .withColumn("g", grams)
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        size(col("g")).as("n_grams"),
        size(array_distinct(col("w"))).as("d_words"),
        size(array_distinct(col("g"))).as("d_grams"),
        topRun.as("top_run"))
      .select(
        col("doc_id"), col("n_words"), col("n_grams"),
        (floor((lit(1.0) - col("d_words") / col("n_words").cast("double")) * 10000) / 10000)
          .as("dup_word_frac"),
        (floor((lit(1.0) - col("d_grams") / col("n_grams").cast("double")) * 10000) / 10000)
          .as("dup_gram_frac"),
        (floor(col("top_run") / col("n_grams").cast("double") * 10000) / 10000)
          .as("top_gram_frac"))
      .orderBy(col("doc_id"))
  }

  /** text_char_entropy — character-level Shannon entropy per document,
    * the classic garbage/binary-blob gate (too-low entropy = repeated
    * filler, too-high = random/encoded bytes; corpus filters drop both
    * before any word-level rule fires — e.g. CCNet/C4 pre-filters).
    * Computed IN-ROW: chars sorted, a run-length fold accumulates
    * Σ c·log2(c) (the `repetition` topRun shape), entropy =
    * log2(n) − Σ/n. Zero shuffle, one scan at any corpus scale.
    *
    * 2dp floor like unigram_lm: the fold runs in sorted-char order but
    * the oracle's per-char groupBy accumulates in hash order, so the
    * double sum gets the coarser floor.
    */
  def charEntropy(t: Tables): DataFrame = {
    val chars = expr(
      "array_sort(transform(sequence(1, length(text)), i -> substring(text, i, 1)))")
    val fold = expr(
      """aggregate(cs,
           named_struct('prev', '', 'run', cast(0.0 as double), 'acc', cast(0.0 as double)),
           (a, x) -> named_struct(
             'prev', x,
             'run', IF(x = a.prev, a.run + 1, cast(1.0 as double)),
             'acc', a.acc + IF(x = a.prev OR a.run = 0, cast(0.0 as double),
                               a.run * log2(a.run))),
           a -> a.acc + IF(a.run = 0, cast(0.0 as double), a.run * log2(a.run)))""")
    t.documents
      .filter(length(col("text")) > 0)
      .withColumn("cs", chars)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(array_distinct(col("cs"))).cast("long").as("n_distinct_chars"),
        fold.as("sumclogc"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        (floor((log2(col("n_chars")) - col("sumclogc") / col("n_chars")) * 100) / 100)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** C4/Gopher-style document-gate thresholds. The classic rule set also
    * checks punctuation/caps/digit signals — degenerate on this all-lowercase
    * word corpus — so the gate here keeps the rules that discriminate:
    * document length, mean word length, and short-word density (the Gopher
    * "symbol-to-word"-family rules in their word-shape form).
    */
  val c4MinWords = 30
  val c4MeanLenLo = 3.0
  val c4MeanLenHi = 5.0
  val c4ShortFracMax = 0.05

  /** The C4-gate feature columns over a `w` words column — the ONE
    * definition `c4Filters` and the streaming curation gate both compile
    * in (floored BEFORE thresholding, so batch, stream and oracle agree on
    * boundary values).
    */
  def c4MeanLenCol: org.apache.spark.sql.Column =
    floor(expr("aggregate(w, 0L, (a, x) -> a + length(x))").cast("double")
      / size(col("w")) * 10000) / 10000

  def c4ShortFracCol: org.apache.spark.sql.Column =
    floor(size(expr("filter(w, x -> length(x) <= 2)")).cast("double")
      / size(col("w")) * 10000) / 10000

  def c4KeepCol: org.apache.spark.sql.Column =
    size(col("w")) >= c4MinWords &&
      c4MeanLenCol >= c4MeanLenLo && c4MeanLenCol <= c4MeanLenHi &&
      c4ShortFracCol <= c4ShortFracMax

  /** text_c4_filters — the C4/Gopher heuristic document gate: per-doc word
    * count, mean word length, short-word (≤2 chars) fraction, longest word,
    * and the keep verdict under the thresholds above. All per-row array
    * folds — zero shuffle, one codegen'd scan pass at any scale; the gate
    * becomes a pushed filter when composed into a curation chain.
    */
  def c4Filters(t: Tables): DataFrame =
    docsW(t)
      .select(col("doc_id"), size(col("w")).as("n_words"),
        c4MeanLenCol.as("mean_word_len"),
        c4ShortFracCol.as("short_frac"),
        expr("aggregate(w, 0, (a, x) -> greatest(a, length(x)))").as("max_word_len"),
        c4KeepCol.as("keep"))
      .orderBy(col("doc_id"))

  /** Number of BPE merge rounds to learn. Real tokenizers run this to a
    * vocab budget (tens of thousands); the round count is the only knob
    * that changes, not the shape.
    */
  val bpeMergeRounds = 6

  /** The BPE word-frequency dictionary: distinct corpus words with counts
    * and the char-level start sequence. BPE trains on this dict, NOT the
    * corpus — after the one groupBy every round's pair count is bounded by
    * |vocab|, which is what makes tokenizer training feasible at 100 TB
    * (the dict is megabytes; production persists it across rounds).
    *
    * Sequence encoding: tokens joined by TWO spaces with a single leading/
    * trailing space — ' t  h  e '. A merge (a, b) is then the literal
    * (non-regex) replacement ' a  b ' → ' ab ', which is non-overlapping
    * left-to-right in both engines, i.e. exactly BPE's greedy merge order,
    * and the oracle replays it with the same replace().
    */
  def bpeVocab(t: Tables): DataFrame =
    docsW(t).select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .withColumn("seq", concat(lit(" "),
        expr("substring(regexp_replace(word, '(.)', '$1  '), 1, length(word)*3 - 1)")))

  /** One BPE training run: K rounds of (count adjacent token pairs over
    * the dict, weighted by word count) → (argmax pair, ties broken by
    * (lhs, rhs)) → (merge applied to every sequence). The per-round argmax
    * is a 1-row collect — the same bounded driver action as dedup_groups'
    * convergence check; everything wide stays a vocab-bounded groupBy.
    */
  def bpeTrain(t: Tables,
               rounds: Int = bpeMergeRounds): (Seq[(Int, String, String, Long)], DataFrame) = {
    // Persist the dict for the duration of training: every round's argmax
    // job then reads the |vocab|-sized cache instead of re-scanning the
    // corpus. Unpersisted before returning (leak discipline) — the returned
    // sequences recompute the dict ONCE in whatever plan consumes them.
    val dict = bpeVocab(t).persist()
    try bpeTrainRounds(dict, rounds)
    finally dict.unpersist(blocking = false)
  }

  private def bpeTrainRounds(dict: DataFrame,
                             rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var seqs = dict
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = seqs
        .select(col("wcount"), split(trim(col("seq")), "  ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("wcount"), explode(expr(
          "transform(sequence(0, size(tk)-2), i -> struct(tk[i] AS lhs, tk[i+1] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("wcount")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val (bl, br) = (best(0).getAs[String]("lhs"), best(0).getAs[String]("rhs"))
        merges += ((r, bl, br, best(0).getAs[Long]("cnt")))
        seqs = seqs.withColumn("seq",
          replace(col("seq"), lit(s" $bl  $br "), lit(s" $bl$br ")))
        r += 1
      }
    }
    (merges.toSeq, seqs)
  }

  /** text_bpe_merges — BPE tokenizer training (Sennrich et al. 2016) on the
    * corpus: the learned merge table (round, pair, merged token, weighted
    * pair count) — the artifact a tokenizer build step publishes.
    */
  def bpeMerges(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val (merges, _) = bpeTrain(t)
    merges.toDF("round", "lhs", "rhs", "pair_count")
      .withColumn("merged", concat(col("lhs"), col("rhs")))
      .orderBy(col("round"))
  }

  /** text_bpe_encode — the apply side: tokenize every document with the
    * learned merges and report the per-doc compression (chars/token, the
    * pretraining cost estimator under the REAL learned vocab rather than
    * #44's regex stand-in). One broadcast-sized word→token-count join.
    */
  def bpeEncode(t: Tables): DataFrame = {
    val (_, seqs) = bpeTrain(t)
    val wordToks = seqs.select(col("word"),
      size(split(trim(col("seq")), "  ")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_char"))
    docsW(t).select(col("doc_id"), explode(col("w")).as("word"))
      .join(broadcast(wordToks), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("bpe_tokens"),
        sum(col("n_char")).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("bpe_tokens"),
        (floor(col("n_chars") * lit(10000.0) / col("bpe_tokens")) / 10000)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** Hashed-feature dimensionality of the linear quality classifier. */
  val qcBuckets = 32
  /** Keep threshold on the squashed [0,1] score. */
  val qcKeepTau = 0.5

  /** text_quality_classifier — the fastText/CCNet-shaped linear quality
    * classifier every production pretraining pipeline runs after the
    * heuristic gates: features = unigrams + word bigrams hashed into
    * `qcBuckets` buckets, score = mean bucket weight squashed to [0, 1].
    * Weights here are a deterministic RATIONAL function of the bucket id
    * (a Knuth mix into [-0.5, 0.5)) standing in for trained parameters —
    * the plumbing (hashing trick, per-row fold, squash, threshold) is the
    * real thing; swapping in trained weights is a broadcast literal away.
    *
    * Every arithmetic step is order-pinned and uses only IEEE
    * correctly-rounded ops (+, /, abs — no exp/sin), so the DuckDB oracle
    * replays it bit-for-bit: hash-checked, not rows-only. Scale shape:
    * pure per-row folds, zero shuffle, one codegen'd scan pass.
    */
  /** The classifier's word-bigram feature array (requires `w`) — shared
    * by the standalone operator and the gate-agreement report.
    */
  private[operators] def qcGrams: org.apache.spark.sql.Column = expr(
    "IF(size(w) >= 2, transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1])), " +
      "array())")

  /** The floored classifier score over `w` + `g` columns — THE one score
    * definition, so the gate-agreement report can never drift from the
    * standalone classifier. Same op order as ever (raw fold ÷ n_feats,
    * rational squash, 4dp floor).
    */
  private[operators] def qcScoreCol: org.apache.spark.sql.Column = {
    def weight(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(pmod(Dedup.portableHash(tok), lit(qcBuckets)) * 2654435761L, lit(1000L))
        .cast("double") / 1000.0 - 0.5
    val fold = (arr: org.apache.spark.sql.Column) =>
      aggregate(arr, lit(0.0), (acc, x) => acc + weight(x))
    val m = (fold(col("w")) + fold(col("g"))) /
      (size(col("w")) + size(col("g")))
    // rational logistic stand-in: 0.5 + 0.5 * m / (1 + |m|) — monotone,
    // bounded, and exactly replayable (no transcendental)
    floor((lit(0.5) + lit(0.5) * m / (lit(1.0) + abs(m))) * 10000) / 10000
  }

  def qualityClassifier(t: Tables): DataFrame = {
    docsW(t)
      .withColumn("g", qcGrams)
      .select(
        col("doc_id"),
        (size(col("w")) + size(col("g"))).as("n_feats"),
        qcScoreCol.as("qc_score"))
      .withColumn("keep", col("qc_score") >= qcKeepTau)
      .orderBy(col("doc_id"))
  }

  /** quality_gate_agreement — the gate-swap report: the confusion table
    * between the heuristic Gopher battery and the learned classifier
    * gate (doc and token counts per verdict pair). THE table a curation
    * review reads before replacing one gate with the other — the
    * disagreement cells are exactly the documents whose fate would
    * change. Both verdicts compute in ONE scan from the SHARED column
    * expressions (`gopherKeepCol`, `qcScoreCol`) — no join, no second
    * pass, and no way for the report to drift from either gate.
    */
  def qualityGateAgreement(t: Tables): DataFrame =
    docsW(t)
      .withColumn("g", qcGrams)
      .select(col("doc_id"),
        (qcScoreCol >= qcKeepTau).as("qc_keep"),
        gopherKeepCol.as("gopher_keep"),
        size(col("w")).cast("long").as("tok"))
      .groupBy("qc_keep", "gopher_keep")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("agree", col("qc_keep") === col("gopher_keep"))
      .orderBy(col("qc_keep"), col("gopher_keep"))

  /** Corpus-level n-gram report size. */
  val topNgramK = 20

  /** text_top_ngrams — the corpus's top-K word bigrams with occurrence and
    * document frequency: the vocabulary/boilerplate report a data-quality
    * pass prints before choosing dedup and filter thresholds.
    *
    * Scale shape: bigrams are built inside the row, then ONE
    * map-side-combined groupBy on the gram; the result is |distinct grams|
    * long, and the top-K heads out through a single ordered limit
    * (TakeOrdered — no global sort materialization).
    */
  def topNgrams(t: Tables): DataFrame =
    docsW(t)
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))")).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("gram").asc)
      .limit(topNgramK)

  /** #45 text_fingerprint — polynomial rolling hash folded over the word
    * sequence (order-sensitive), plus the min shingle hash (winnowing-style
    * content anchor, order-robust). Sequential `aggregate` fold — no UDF —
    * over the portable md5-derived hash, so the fold replays exactly in
    * the oracle (list_reduce over the same per-token values): hash-checked,
    * not rows-only.
    */
  def fingerprint(t: Tables): DataFrame = {
    val M = 1000000007L
    val fp = aggregate(col("w"), lit(0L),
      (acc, x) => pmod(acc * 131 + pmod(Dedup.portableHash(x), lit(M)), lit(M)))
    val minShingle = t.documents.select(col("doc_id")).join(
      Dedup.shingles(t).groupBy("doc_id")
        .agg(min(pmod(Dedup.portableHash("s"), lit(M))).as("fp_min")),
      Seq("doc_id"), "left")
    docsW(t).select(col("doc_id"), fp.as("fp"))
      .join(minShingle, "doc_id")
      .select(col("doc_id"), col("fp"), coalesce(col("fp_min"), lit(-1L)).as("fp_min"))
      .orderBy(col("doc_id"))
  }

  /** text_perplexity_bucket — the CCNet split (Wenzek et al. 2020): rank
    * each language's documents by LM score and cut into head / middle /
    * tail tertiles — the quality tiers the CCNet recipe keeps, samples
    * and drops respectively. The score is the unigram-LM mean NLL (#56's
    * operator — shared plan); the split is an `ntile(3)` per language,
    * totally ordered by (mean_nll, doc_id) so both engines cut
    * identically. Scale shape: ONE per-language window; a single
    * overwhelming language uses sampled thresholds in production (two
    * broadcast literals — the plan, not the semantics, changes).
    */
  def perplexityBucket(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("mean_nll"), col("doc_id"))
    unigramLmUnsorted(t)
      .join(t.documents.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("mean_nll"), col("bucket"),
        when(col("bucket") === 1, "head").when(col("bucket") === 2, "middle")
          .otherwise("tail").as("band"))
      .orderBy(col("doc_id"))
  }

  /** text_langid_agreement — the classifier-agreement matrix between the
    * stopword and character-bigram language identifiers (#42 and its
    * ngram variant): per (word-model, ngram-model) label pair, document
    * counts, the labeled-lang majority, and whether the two models
    * agree. The model-diff report a curation review reads before
    * trusting either signal — pure integers, ONE map-side-combined
    * groupBy over the two per-row scorers.
    */
  def langIdAgreement(t: Tables): DataFrame = {
    // both models are per-row column scorers (the staged builders above),
    // so the matrix computes them SIDE BY SIDE on one documents scan —
    // before r13-opt this face joined two separately-scanned scorer frames
    // plus the lang column back on doc_id: three corpus scans and two
    // doc_id-axis shuffles for what one zero-shuffle pass produces
    withNgramPred(withWordPred(docsW(t)))
      .select(col("lang"), col("pred_lang"), col("pred_lang_ngram"))
      .groupBy(col("pred_lang"), col("pred_lang_ngram"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
          .as("n_word_correct"),
        sum(when(col("pred_lang_ngram") === col("lang"), 1L).otherwise(0L))
          .as("n_ngram_correct"))
      .withColumn("agree", col("pred_lang") === col("pred_lang_ngram"))
      .orderBy(col("pred_lang"), col("pred_lang_ngram"))
  }

  /** Histogram bucket width (whitespace tokens) for the length report. */
  val tokenHistBucket = 16L

  /** text_token_histogram — the sequence-length distribution every
    * training-data report opens with (it drives context-window and
    * packing-budget choices): fixed-width token-count buckets with doc
    * and token totals. ONE map-side-combined groupBy over a per-row
    * fold — the cheapest corpus profile there is; integral `div` keeps
    * bucket edges exact on both engines.
    */
  def tokenHistogram(t: Tables): DataFrame =
    docsW(t)
      .select(size(col("w")).cast("long").as("n"))
      .withColumn("bucket", expr(s"n div $tokenHistBucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .select(col("bucket"), (col("bucket") * tokenHistBucket).as("bucket_lo"),
        ((col("bucket") + 1) * tokenHistBucket - 1).as("bucket_hi"),
        col("n_docs"), col("n_tokens"))
      .orderBy(col("bucket"))

  /** Gopher rule thresholds (Rae et al. 2021, Appendix A — the published
    * values, not tuned to this corpus): document word count in
    * [50, 100000], mean word length in [3, 10], symbol-to-word ratio
    * ("#" or "...") at most 0.1, at least 80% of words carrying an
    * alphabetic character, and at least 2 hits from the required-word
    * list. `text_c4_filters` is the corpus-tuned gate; this one is the
    * faithful published battery, verdicts emitted per rule so a config
    * review can see WHICH rule fired.
    */
  val gopherMinWords = 50
  val gopherMaxWords = 100000
  val gopherMeanLenLo = 3.0
  val gopherMeanLenHi = 10.0
  val gopherSymbolRatioMax = 0.1
  val gopherAlphaFracMin = 0.8
  val gopherMinStopHits = 2
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** text_gopher_quality — the complete published Gopher document-quality
    * rule battery: each signal is a per-row array fold over the words
    * column (zero shuffle, fully codegen'd — one scan pass at any scale),
    * each rule's verdict is its own column, and `keep` is their
    * conjunction. Ratios are floored BEFORE thresholding so batch and
    * oracle agree on boundary values.
    */
  /** The five floored Gopher signal columns over `w` — ONE definition for
    * the standalone operator and the curation chain, so the gate cannot
    * drift. Order: n_words, mean_word_len, symbol_ratio, alpha_frac,
    * stop_hits.
    */
  def gopherSignalCols: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) = {
    val reqList = gopherRequiredWords.map(w => s"'$w'").mkString(", ")
    val n = size(col("w"))
    val meanLen = floor(expr("aggregate(w, 0L, (a, x) -> a + length(x))").cast("double")
      / n * 10000) / 10000
    val symbolRatio = floor(
      size(expr("filter(w, x -> x = '#' OR x LIKE '%...%')")).cast("double")
        / n * 10000) / 10000
    val alphaFrac = floor(
      size(expr("filter(w, x -> x rlike '[a-z]')")).cast("double") / n * 10000) / 10000
    val stopHits = expr(s"size(filter(w, x -> x IN ($reqList)))")
    (n, meanLen, symbolRatio, alphaFrac, stopHits)
  }

  /** The whole published rule battery as one keep verdict. */
  def gopherKeepCol: org.apache.spark.sql.Column = {
    val (n, meanLen, symbolRatio, alphaFrac, stopHits) = gopherSignalCols
    n >= gopherMinWords && n <= gopherMaxWords &&
      meanLen >= gopherMeanLenLo && meanLen <= gopherMeanLenHi &&
      symbolRatio <= gopherSymbolRatioMax &&
      alphaFrac >= gopherAlphaFracMin &&
      stopHits >= gopherMinStopHits
  }

  def gopherQuality(t: Tables): DataFrame = {
    val (n, meanLen, symbolRatio, alphaFrac, stopHits) = gopherSignalCols
    docsW(t)
      .select(col("doc_id"), n.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
        stopHits.as("stop_hits"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_frac"), col("stop_hits"),
        (col("n_words") >= gopherMinWords && col("n_words") <= gopherMaxWords)
          .as("ok_words"),
        (col("mean_word_len") >= gopherMeanLenLo &&
          col("mean_word_len") <= gopherMeanLenHi).as("ok_mean_len"),
        (col("symbol_ratio") <= gopherSymbolRatioMax).as("ok_symbols"),
        (col("alpha_frac") >= gopherAlphaFracMin).as("ok_alpha"),
        (col("stop_hits") >= gopherMinStopHits).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_words") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
      .orderBy(col("doc_id"))
  }
}
