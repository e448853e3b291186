package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication over the `documents` table (SURVEY.md §2.8, rows 36-39) —
  * the training-data-pipeline extension: exact, n-gram Jaccard, MinHash+LSH
  * and SimHash near-dup detection, all expressed as declarative plans.
  *
  * Scale posture (100 TB): exact dedup is one map-side-combined groupBy on a
  * 16-byte hash; shingle explosion is bounded by words-per-doc; LSH band
  * buckets cap the candidate-pair join so nothing ever goes quadratic in the
  * corpus — only within-bucket.
  */
object Dedup {

  /** Shared tokenization: lowercase, trim, split on whitespace runs — the
    * ONE words definition (column form for streaming callers that attach
    * it themselves).
    */
  def wordsCol: org.apache.spark.sql.Column =
    split(lower(trim(col("text"))), "\\s+")

  def withWords(docs: DataFrame): DataFrame =
    docs.withColumn("w", wordsCol)

  /** The ONE normalized-content hash (exact-dup identity): md5 of the
    * whitespace-collapsed, trimmed, lowercased text. Shared by `exact`,
    * the batch curation chain and the streaming curation leg, so what
    * counts as "the same document" can never drift between them.
    */
  def normalizedMd5: org.apache.spark.sql.Column =
    md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))

  /** Distinct word-3-gram shingles per doc. Per-doc dedup happens INSIDE the
    * row (array_distinct before explode) — set semantics with zero shuffle,
    * instead of a corpus-wide DISTINCT over the exploded postings.
    */
  def shingles(t: Tables): DataFrame =
    withWords(t.documents)
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))).as("s"))

  /** #36 dedup_exact — md5 of normalized text, keep the lowest doc_id per
    * group. One hash-keyed groupBy with full map-side partial aggregation.
    */
  def exact(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), normalizedMd5.as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("h"))

  /** Deterministic messy-URL synthesis for the URL-dedup operator: the
    * corpus tables carry no source URL, so one is derived from doc_id with
    * every mess a crawl frontier actually sees — mixed-case scheme/host,
    * scheme-default ports, tracking params, trailing slashes, fragments.
    * Integer mods + concat only, replayed verbatim by the oracle SQL
    * (same discipline as Envelope's synthesized wire columns).
    */
  def syntheticUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val scheme = when(id % 3 === 0, lit("HTTPS")).otherwise(lit("http"))
    val host = when(id % 2 === 0,
        concat(lit("WWW.Example"), (id % 40).cast("string"), lit(".COM")))
      .otherwise(concat(lit("www.example"), (id % 40).cast("string"), lit(".com")))
    val port = when(id % 5 === 0,
        when(id % 3 === 0, lit(":443")).otherwise(lit(":80")))
      .when(id % 5 === 1, lit(":8080"))
      .otherwise(lit(""))
    val path = concat(lit("/articles/item"), (id % 25).cast("string"),
      when(id % 4 === 0, lit("/")).otherwise(lit("")))
    // concat_ws skips absent (null) params in both engines
    val params = concat_ws("&",
      when(id % 2 === 0, concat(lit("utm_source=feed"), (id % 3).cast("string"))),
      concat(lit("id="), (id % 25).cast("string")),
      when(id % 7 < 3, lit("ref=rss")))
    val frag = when(id % 6 < 2, concat(lit("#sec"), (id % 3).cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, lit("?"), params, frag)
  }

  /** dedup_url — URL-level dedup, the cheapest and first dedup pass of any
    * web-crawl pipeline (the same page refetched under trackingparams /
    * case / port / slash variants must collapse BEFORE content dedup pays
    * for it). Canonicalization: drop fragment, lowercase scheme+authority,
    * strip scheme-default ports (:80 http / :443 https), strip trailing
    * path slashes, drop tracking params (utm_*, fbclid, gclid), sort the
    * survivors. Keep = min doc_id per canonical URL.
    *
    * Scale shape: canonicalization is pure codegen'd string work on the
    * scan; the only shuffle is the canonical-key window — same posture as
    * dedup_exact's hash groupBy.
    */
  /** The canonicalization itself, as one reusable column expression
    * (idempotent: canon(canon(u)) == canon(u), property-spec'd).
    */
  def canonicalUrl(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val headPat = "^[A-Za-z]+://[^/?#]*"
    val nf = regexp_replace(u, "#.*$", "")
    val head = regexp_replace(
      regexp_replace(lower(regexp_extract(nf, headPat, 0)),
        "^(https://[^/:]*):443$", "$1"),
      "^(http://[^/:]*):80$", "$1")
    val rest = nf.substr(length(regexp_extract(nf, headPat, 0)) + 1, lit(100000))
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_join(array_sort(filter(split(q, "&"),
      x => x =!= "" && !x.rlike("^(utm_|fbclid|gclid)"))), "&")
    concat(head, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  def urlDedup(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("canon_url")
    t.documents
      .select(col("doc_id"), canonicalUrl(syntheticUrl).as("canon_url"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .withColumn("n_aliases", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  /** Jaccard similarity threshold for #37 — 0.5 is the conventional
    * near-duplicate floor (true template pairs sit at J ≥ 0.8; below ~0.5
    * documents are topically related, not duplicates).
    */
  val jaccardTau = 0.5

  /** #37 dedup_ngram_jaccard — EXACT Jaccard pairs via the prefix-filtering
    * principle of the published set-similarity-join algorithms (AllPairs,
    * Bayardo et al. WWW'07; PPJoin, Xiao et al. WWW'08):
    *
    * Order every doc's shingles by ascending corpus document frequency
    * (rarest first; (df, s) for a deterministic total order). If
    * J(A,B) ≥ τ then |A∩B| ≥ τ·max(|A|,|B|) ≥ τ·|A|, and any overlap of
    * that size must touch the first |A| − ⌈τ·|A|⌉ + 1 elements of A's
    * ordering — so candidates are generated ONLY from each doc's rarest
    * `plen` shingles, with no assumptions about the corpus: a pair whose
    * every SHARED shingle is corpus-hot (mass-replicated boilerplate) is
    * still found, because a near-dup's prefix is then made of those hot
    * shingles. This is what a df-cap heuristic silently misses, and why
    * prefix filtering replaced it here.
    *
    * Scale posture: a universally-hot shingle enters the candidate join
    * only through docs that are ≥(1−τ) boilerplate, so its posting list in
    * the join is the boilerplate cluster, not the corpus — candidate cost
    * per shingle is C(|prefix-posting|, 2), quadratic blowup on ordinary
    * hot shingles is structurally impossible. Verification is a per-pair
    * `array_intersect` of the two (bounded, per-doc) shingle arrays — all
    * codegen, no posting-list re-join.
    *
    *  1. ONE shuffle on s: posting lists ⇒ df per shingle, exploded back.
    *  2. ONE shuffle on doc_id: per-doc (df,s)-sorted shingle array, size c.
    *     Two prefix lengths per doc (both floor, not ceil: a double rounding
    *     up an exact integer product would shorten a prefix — floor only
    *     ever lengthens it, which stays exact):
    *       index  c − ⌊τ·c⌋ + 1            (valid vs ANY partner),
    *       probe  c − ⌊2τ/(1+τ)·c⌋ + 1    (valid when this doc is the
    *     smaller of the pair — |A|≤|B| ⇒ overlap ≥ 2τ/(1+τ)·|A|).
    *  3. Candidates: probe-prefix(smaller doc) ⋈ index-prefix(larger doc)
    *     on the shingle, then per-pair POSITIONAL filtering (PPJoin): all
    *     shared shingles rank at or after the first shared one in each
    *     doc's order, so shared ≤ 1 + min(cA − iA_min, cB − jB_min); drop
    *     pairs that cannot reach the pair-exact overlap floor
    *     α = τ/(1+τ)·(cA+cB). Length filter (τ·max ≤ min) is implied by α
    *     but kept explicit for the optimizer.
    *  4. Verify survivors — shared = |A∩B| straight off the two shingle
    *     arrays (codegen array_intersect); floor-rounding so the oracle can
    *     never disagree on a decimal tie.
    */
  def ngramJaccard(t: Tables): DataFrame =
    ngramJaccardUnsorted(t).orderBy(col("da"), col("db"))

  /** The verified pair list without the presentation orderBy — `dupGroups`
    * checkpoints and re-joins this frame by hash, so sorting it first
    * would materialize a range exchange nothing reads.
    */
  private def ngramJaccardUnsorted(t: Tables): DataFrame = {
    // planCheckpoint, not persist (r14, the uz/retrieval_audit lesson —
    // guide §5): ppjoinPairs reads the per-doc frame through SEVERAL
    // concurrent branches (probe prefixes, index prefixes, two
    // verification attaches), and 32 readers of an InMemoryRelation
    // serialize on the cache locks; checkpointed blocks don't. The pair
    // list is still materialized so the doc frame's blocks release via
    // ContextCleaner when this plan goes out of scope.
    val docs = graft.engine.Reliability.planCheckpoint(
      ppjoinDocs(t, withDelta = false))
    graft.engine.Reliability.planCheckpoint(ppjoinPairs(docs))
  }

  /** The per-doc PPJoin frame — steps 1-2 of the chain documented on
    * `ngramJaccard`: (doc_id, c, sarr, iplen, pplen), where `sarr` is the
    * (df, s)-sorted distinct shingle array and the two prefix lengths are
    * the index / probe bounds. `withDelta` additionally stamps each doc
    * with the shared recency split (`incIsDelta`) for the delta-bounded
    * candidate generation `dupGroupsInc` runs. Callers persist: the frame
    * feeds candidate generation AND verification.
    */
  private[graft] def ppjoinDocs(t: Tables, withDelta: Boolean): DataFrame = {
    val sh = shingles(t)
    // step 1: df via a COUNT groupBy (map-side combined) joined back on the
    // shingle — never a window over s (single-task funnel for the hottest
    // shingle) and never collect_list (the hottest shingle's whole posting
    // list in ONE aggregation buffer — the same funnel as array memory).
    // Costs a second exchange on s; carries only an 8-byte count per key.
    // CORPUS-AXIS JOIN, pinned to sort-merge: everything below the
    // documents scan is downstream of an explode, and Catalyst's size
    // estimate for that chain stays near the (small) parquet file size —
    // at 100x corpus scale the optimizer happily "broadcasts" a frame
    // that materializes to tens of millions of rows and kills the driver
    // (caught by the sf10 scale probe, not by any smaller run). The same
    // pin guards every corpus-sized join in this operator.
    val dfBy = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val withDf = sh.join(dfBy.hint("merge"), "s")
    val probeBeta = 2 * jaccardTau / (1 + jaccardTau)
    // step 2: the per-doc frame feeds candidate generation AND verification
    val docs = withDf.groupBy("doc_id")
      .agg(count(lit(1)).as("c"),
        array_sort(collect_list(struct(col("df"), col("s")))).as("arr"))
      .select(col("doc_id"), col("c"),
        expr("transform(arr, x -> x.s)").as("sarr"),
        (col("c") - floor(col("c") * jaccardTau) + 1).cast("int").as("iplen"),
        (col("c") - floor(col("c") * probeBeta) + 1).cast("int").as("pplen"))
    if (!withDelta) docs
    else {
      val mx = t.documents.agg(max(col("doc_id")).as("max_id"))
      docs.crossJoin(broadcast(mx))
        .withColumn("is_delta", incIsDelta(col("doc_id"), col("max_id")))
        .drop("max_id")
    }
  }

  /** Steps 3-4 of the PPJoin chain documented on `ngramJaccard`:
    * candidate generation over the prefix postings + per-pair positional
    * filtering + exact verification, over a (persisted) `ppjoinDocs`
    * frame. Returns the verified pair list (da, db, jaccard).
    *
    * `touchingDelta = true` restricts candidate generation to pairs with
    * AT LEAST ONE delta endpoint (requires the `is_delta` column): the
    * probe side runs delta-only against the full index, and the full
    * probe side runs against a delta-only index — every (delta, base),
    * (base, delta) and (delta, delta) qualifying pair is still generated
    * under the same common prefix order (both restrictions are filters
    * over the SAME full-corpus-df frame, so the prefix-filtering
    * completeness argument is unchanged), while no (base, base) pair can
    * enter the candidate join at all. Delta-delta candidates arise in
    * both branches; the min-aggregation absorbs the duplicates. This is
    * what bounds a daily fold's quadratic work by the delta, not the
    * corpus.
    */
  private[graft] def ppjoinPairs(docs: DataFrame,
      touchingDelta: Boolean = false): DataFrame = {
    // step 3: 1-based position of each index-prefix shingle in df order
    val preCols =
      Seq(col("doc_id"), col("c"), col("pplen")) ++
        (if (touchingDelta) Seq(col("is_delta")) else Nil)
    val posCols =
      Seq(col("doc_id"), col("c"), col("s"), (col("p0") + 1).as("pos"),
        col("pplen")) ++
        (if (touchingDelta) Seq(col("is_delta")) else Nil)
    val pre = docs.select(
        preCols :+ posexplode(expr("slice(sarr, 1, iplen)")).as(Seq("p0", "s")): _*)
      .select(posCols: _*)
    val probeCols =
      Seq(col("doc_id").as("qd"), col("c").as("qc"), col("s"),
        col("pos").as("qpos")) ++
        (if (touchingDelta) Seq(col("is_delta").as("q_delta")) else Nil)
    val probe = pre.filter(col("pos") <= col("pplen")).select(probeCols: _*)
    val smallerFirst = col("qc") < col("c") ||
      (col("qc") === col("c") && col("qd") < col("doc_id"))
    val alpha = lit(jaccardTau / (1 + jaccardTau)) * (col("qc") + col("c"))
    val matched =
      if (!touchingDelta) probe.join(pre.hint("merge"), Seq("s"))
      else
        probe.filter(col("q_delta")).join(pre.hint("merge"), Seq("s"))
          .unionByName(
            probe.join(pre.filter(col("is_delta")).hint("merge"), Seq("s")))
    val cand = matched.filter(smallerFirst)
      .groupBy(col("qd"), col("doc_id").as("id"))
      .agg(first(col("qc")).as("qc"), first(col("c")).as("c"),
        min(col("qpos")).as("qi"), min(col("pos")).as("ij"))
      .filter((lit(1) + least(col("qc") - col("qi"), col("c") - col("ij")))
        .cast("double") >= alpha - 1e-9)
      .filter(least(col("qc"), col("c")).cast("double")
        >= greatest(col("qc"), col("c")) * jaccardTau - 1e-9)
      .select(least(col("qd"), col("id")).as("da"),
        greatest(col("qd"), col("id")).as("db"))
    // step 4: verify — shared = |A∩B| straight off the two shingle arrays
    cand
      .join(docs.select(col("doc_id").as("da"), col("c").as("ca"), col("sarr").as("sa"))
        .hint("merge"), "da")
      .join(docs.select(col("doc_id").as("db"), col("c").as("cb"), col("sarr").as("sb"))
        .hint("merge"), "db")
      .withColumn("shared", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("ca") + col("cb") - col("shared")))
      .filter(col("jaccard") >= jaccardTau)
      .select(col("da"), col("db"),
        (floor(col("jaccard") * 10000) / 10000).as("jaccard"))
  }

  /** dedup_exact_inc — incremental EXACT-dedup admission, the
    * content-hash twin of dedup_minhash_inc and the single most common
    * production gate (a day's crawl drop vs the stored hash index): the
    * index keeps ONLY each admitted document's normalized md5 (the text
    * is never re-read), the delta alone pays hashing, and the probe is
    * one join on the 16-byte hash axis. Per delta doc: its hash, whether
    * the index already holds it, how many EARLIER delta docs share it
    * (in-batch self-dedup, first-writer-wins like #36), and the
    * admission verdict. Same recency split as the minhash twin.
    */
  def exactIncremental(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = t.documents.select(col("doc_id"), normalizedMd5.as("h"))
    val mx = hashed.agg(max(col("doc_id")).as("max_id"))
    val withMx = hashed.crossJoin(broadcast(mx))
    val index = withMx.filter(!incIsDelta(col("doc_id"), col("max_id")))
      .select(col("h")).distinct()
    val w = Window.partitionBy("h").orderBy("doc_id")
    withMx.filter(incIsDelta(col("doc_id"), col("max_id")))
      .select(col("doc_id"), col("h"))
      .join(index.select(col("h"), lit(true).as("in_index")), Seq("h"), "left")
      .withColumn("n_prior", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("h"),
        coalesce(col("in_index"), lit(false)).as("in_index"),
        col("n_prior"),
        (coalesce(!col("in_index"), lit(true)) && col("n_prior") === 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** url_host_stats — the per-host crawl report a frontier/crawl-ops
    * dashboard reads before setting recrawl and politeness policy: per
    * canonical host, the url count, distinct canonical urls, alias-dup
    * count and dup fraction. Shares `canonicalUrl`/`syntheticUrl` with
    * dedup_url (and the streaming frontier), so the host axis can never
    * drift from the dedup axis. One map-side-combined two-level groupBy
    * (host × canon partials, then host); integers except the exact-
    * arithmetic dup fraction ⇒ hash-checked.
    */
  def urlHostStats(t: Tables): DataFrame = {
    t.documents
      .select(col("doc_id"), canonicalUrl(syntheticUrl).as("canon_url"))
      .withColumn("host",
        regexp_extract(col("canon_url"), "^[a-z]+://([^/:?#]+)", 1))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canon_url")).as("n_canonical"))
      .select(col("host"), col("n_urls"), col("n_canonical"),
        (col("n_urls") - col("n_canonical")).as("n_dup"),
        (floor((col("n_urls") - col("n_canonical")) * 10000.0 / col("n_urls"))
          / 10000).as("dup_frac"))
      .orderBy(col("host"))
  }

  // ---- #38 minhash ----

  val minhashK = 16    // hashes per signature
  val bandSize = 4     // -> 4 bands of 4
  val MersennePrime = 2147483647L

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5, as a
    * bigint. Identical in Spark (`conv(_, 16, 10)`) and the oracle dialect
    * (`CAST('0x'||… AS BIGINT)`) — which is what makes the minhash/simhash/
    * fingerprint family hash-CHECKABLE instead of rows-only. One md5 per
    * token; everything derived from it is plain bigint arithmetic.
    */
  def portableHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def portableHash(c: String): org.apache.spark.sql.Column = portableHash(col(c))

  /** Wide MinHash signatures: ONE groupBy over the shingle set with k
    * conditional min-aggregates (columns mh0..mh{k-1}) — no k× row
    * explosion, no per-(doc,slot) shuffle, everything map-side-combined.
    * Portable affine permutations of one md5-derived base hash.
    */
  def minhashSignaturesWide(t: Tables): DataFrame = {
    val h0 = pmod(portableHash("s"), lit(MersennePrime))
    val mins = (0 until minhashK).map { j =>
      min(pmod(h0 * (2 * j + 3) + j * 2654435761L + 1, lit(MersennePrime))).as(s"mh$j")
    }
    shingles(t).groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  private[graft] def bandKeys = (0 until minhashK / bandSize).map { b =>
    md5(concat_ws(":",
      (b * bandSize until (b + 1) * bandSize).map(j => col(s"mh$j")): _*))
  }

  /** Per-shingle base hashes as an IN-ROW array (requires a `w` words
    * column; callers filter `size(w) >= 3` like `shingles`): the same
    * distinct word-3-grams and the same md5-derived 60-bit hash as the
    * grouped path, but md5 runs ONCE per shingle and everything stays in
    * the row — the shape an ingest-path admission gate needs (zero
    * shuffle, zero state for the signature itself).
    */
  def minhashShingleHashes: org.apache.spark.sql.Column = expr(
    s"""transform(array_distinct(transform(sequence(0, size(w)-3),
          i -> concat_ws(' ', w[i], w[i+1], w[i+2]))),
        x -> pmod(CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT),
          ${MersennePrime}L))""")

  /** The k-slot MinHash signature from an `h0s` base-hash column, as one
    * array<long> — the per-row face of `minhashSignaturesWide`: identical
    * affine permutations, `array_min` instead of the grouped `min`, so a
    * streaming delta computes the EXACT signature the stored index holds
    * (spec-pinned equal row-for-row).
    */
  def minhashSigArray: org.apache.spark.sql.Column = expr(
    s"""transform(sequence(0, ${minhashK - 1}), j ->
          array_min(transform(h0s, h ->
            pmod(h * (2*j + 3) + j * ${2654435761L}L + 1, ${MersennePrime}L))))""")

  /** LSH band keys of a `sig` array column (array<string>, one md5 per
    * band) — numerically identical to `bandKeys` over the wide columns:
    * same `concat_ws(":")` of the band's longs, same md5.
    */
  def bandKeysOfSig: org.apache.spark.sql.Column = expr(
    s"""transform(sequence(0, ${minhashK / bandSize - 1}), b ->
          md5(concat_ws(':', transform(slice(sig, b*$bandSize + 1, $bandSize),
            v -> CAST(v AS STRING)))))""")

  /** Candidate pairs: docs agreeing on at least one full band. */
  private def candidates(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
  }

  /** #38 dedup_minhash_lsh — band the signature (bandSize consecutive
    * minhashes hashed together), bucket-join within bands. Per-doc output
    * (signature id + candidate count) — fully hash-checked against the
    * oracle since every hash is the portable md5-derived one.
    */
  def minhashLsh(t: Tables): DataFrame = {
    // planCheckpoint, not persist (r14, guide §5): the signature frame is
    // read by the band self-join (two sides) AND the output projection —
    // concurrent InMemoryRelation readers serialize on cache locks,
    // checkpointed blocks don't. Output is still materialized so the
    // signature blocks release via ContextCleaner with this plan.
    val sig = graft.engine.Reliability.planCheckpoint(
      minhashSignaturesWide(t))
    val cand = candidates(sig)
    val nCand = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    val out = sig.select(col("doc_id"),
        md5(concat_ws(":", (0 until minhashK).map(j => col(s"mh$j")): _*)).as("sig_id"))
      .join(nCand, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sig_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
      .orderBy(col("doc_id"))
    graft.engine.Reliability.planCheckpoint(out)
  }

  /** Estimated Jaccard between all LSH candidate pairs (used by the spec and
    * available as the dedup decision input): fraction of the k minhashes
    * that agree — a single wide-row expression, no re-join per slot.
    */
  def minhashCandidatePairs(t: Tables): DataFrame = {
    // planCheckpoint, not persist (r14, guide §5): four concurrent plan
    // branches read the signatures (band self-join both sides + the two
    // pair attaches) — checkpointed blocks skip the cache-lock
    // serialization. The pair list is still materialized so the signature
    // blocks release via ContextCleaner with this plan.
    val sig = graft.engine.Reliability.planCheckpoint(
      minhashSignaturesWide(t))
    val agree = (0 until minhashK)
      .map(j => when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    graft.engine.Reliability.planCheckpoint(
      candidates(sig).as("c")
        .join(sig.as("a"), col("c.da") === col("a.doc_id"))
        .join(sig.as("b"), col("c.db") === col("b.doc_id"))
        .select(col("c.da").as("da"), col("c.db").as("db"),
          (agree.cast("double") / minhashK).as("est_jaccard")))
  }

  // ---- #64 incremental minhash dedup (delta vs stored index) ----

  /** Recency split for #64: the newest fifth of doc_ids plays the incoming
    * delta (a day's crawl drop); everything older is the already-indexed
    * corpus. Strict `5·id > 4·max` keeps the split exact in integer
    * arithmetic on both engines.
    */
  def incIsDelta(id: org.apache.spark.sql.Column, maxId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = id * 5 > maxId * 4

  /** Synthetic retirement set for the index-maintenance operators: every
    * 13th doc/vector is tombstoned (deletion requests, domain bans,
    * recrawl retirements) — a deterministic modulus so the oracle replays
    * it exactly like the envelope's violation classes.
    */
  def isRetired(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    id % 13 === 0

  /** dedup_index_compact — the WEEKLY maintenance pass every stored dedup
    * index needs (without it the admission indexes only ever grow): drop
    * tombstoned documents' entries, fold the delta's admitted documents
    * in, and emit the COMPACTED content-hash index (hash → keeper doc +
    * provenance). Semantics pinned to production reality:
    *
    *  - the delta was ingested BEFORE the weekly compact ran, so the fold
    *    carries exactly the docs `dedup_exact_inc` admitted against the
    *    PRE-compaction index (including entries that are now tombstoned —
    *    an admission decision is not retroactively re-litigated);
    *  - a hash held only by tombstoned docs disappears from the index
    *    (its delta carrier, if any, was rejected and never stored — the
    *    content re-enters the corpus at its next sighting, the honest
    *    consequence of deleting the stored copies);
    *  - a tombstoned keeper with live same-hash siblings hands the entry
    *    to the next-smallest live doc.
    *
    * Scale shape: two map-side-combined groupBys on the 16-byte hash axis
    * and one hash-axis join — identical posture to dedup_exact_inc; the
    * delta fold and the tombstone filter are row predicates fused into
    * the scans. Post-compaction probe equivalence (same delta re-probed:
    * pre-verdicts reproduced on tombstone-independent rows, re-delivery
    * fully rejected) is spec-pinned.
    */
  def indexCompact(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = t.documents.select(col("doc_id"), normalizedMd5.as("h"))
    val mx = hashed.agg(max(col("doc_id")).as("max_id"))
    val withMx = hashed.crossJoin(broadcast(mx))
    val isDelta = incIsDelta(col("doc_id"), col("max_id"))
    // live index entries: tombstoned docs' rows drop BEFORE the keeper
    // group, so a retired keeper hands over to the next live sibling
    val indexLive = withMx.filter(!isDelta && !isRetired(col("doc_id")))
      .groupBy(col("h")).agg(min(col("doc_id")).as("keeper_id"))
    // the delta's admissions, replayed against the PRE-compaction index
    // (dedup_exact_inc's keep rule verbatim); a doc both admitted and
    // since tombstoned does not enter the compacted index
    val preIndex = withMx.filter(!isDelta).select(col("h")).distinct()
    val w = Window.partitionBy("h").orderBy("doc_id")
    val deltaKeep = withMx.filter(isDelta)
      .select(col("doc_id"), col("h"))
      .join(preIndex.select(col("h"), lit(true).as("in_index")), Seq("h"), "left")
      .withColumn("n_prior", row_number().over(w) - 1)
      .filter(coalesce(!col("in_index"), lit(true)) && col("n_prior") === 0)
      .filter(!isRetired(col("doc_id")))
    // disjoint on h by construction (delta keeps require h outside the
    // pre index, whose hash set contains every live entry's hash)
    indexLive.select(col("h"), col("keeper_id"), lit(false).as("from_delta"))
      .unionByName(deltaKeep.select(col("h"),
        col("doc_id").as("keeper_id"), lit(true).as("from_delta")))
      .orderBy(col("h"))
  }

  /** #64 dedup_minhash_inc — INCREMENTAL near-dup admission, the way a
    * 100 TB corpus actually deduplicates a new drop: the stored index keeps
    * only each document's k-minhash signature (k longs — the text is never
    * re-read), the delta alone pays shingle + minhash work, and banding
    * makes the candidate probe `delta-bands ⋈ index-bands` — pair work is
    * bounded by delta × bucket occupancy, never index × index.
    *
    * Per delta doc: its signature id, how many INDEXED docs share a band
    * (`n_index_candidates`), how many EARLIER delta docs do
    * (`n_prior_candidates` — in-batch self-dedup, first-writer-wins on
    * doc_id like #36), and the admission verdict `is_dup`.
    *
    * This query computes the index signatures in-plan so the oracle can
    * check it end-to-end from the raw table; the production path is
    * `minhashIncrementalFrom(storedSignatures, delta)`, spec-proven to
    * produce identical output with ZERO corpus text scans.
    */
  def minhashIncremental(t: Tables): DataFrame = {
    // planCheckpoint, not persist (r14, guide §5): the max-id probe plus
    // the index/delta splits read the signatures through three branches;
    // checkpointed blocks skip the cache-lock serialization and release
    // via ContextCleaner once minhashIncrementalFrom has materialized.
    val sig = graft.engine.Reliability.planCheckpoint(
      minhashSignaturesWide(t))
    val mx = sig.agg(max(col("doc_id")).as("max_id"))
    val s2 = sig.crossJoin(broadcast(mx))
    val sigCols = sig.columns.map(col)
    minhashIncrementalFrom(
      s2.filter(!incIsDelta(col("doc_id"), col("max_id"))).select(sigCols: _*),
      s2.filter(incIsDelta(col("doc_id"), col("max_id"))).select(sigCols: _*))
  }

  /** The production shape of #64: `index` is the STORED signature table
    * (doc_id, mh0..mh{k-1}) read back from the sink; `delta` is the new
    * drop's freshly computed signatures. Only band keys — 16-byte hashes of
    * bandSize minhashes — flow into the probe join, and the delta side is
    * the small one (broadcastable under AQE when a day's drop fits; the
    * index side then never shuffles at all).
    */
  /** Admission verdict threshold: a band collision is only a CANDIDATE
    * signal; the verdict verifies the full signature (fraction of the k
    * minhashes agreeing ≈ Jaccard) so a rare band hash collision cannot
    * delete a non-duplicate. Same τ as the exact operator (#37).
    */
  val minhashVerifyTau: Double = jaccardTau

  def minhashIncrementalFrom(index: DataFrame, delta: DataFrame): DataFrame = {
    def bandsOf(df: DataFrame) = df.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
    // planCheckpoint, not persist (r14, guide §5): three concurrent
    // branches read the delta bands (the index probe + both sides of the
    // prior self-join) — checkpointed blocks skip the cache-lock
    // serialization; release via ContextCleaner with the materialized
    // result below
    val db = graft.engine.Reliability.planCheckpoint(bandsOf(delta))
    val ib = bandsOf(index)
    // a pair can collide in several bands — count DISTINCT partners
    val candIdx = db.join(
        ib.select(col("band"), col("band_key"), col("doc_id").as("pid")),
        Seq("band", "band_key"))
      .select(col("doc_id"), col("pid")).distinct()
      .withColumn("from_index", lit(true))
    val candPrior = db.as("a").join(db.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("pid")).distinct()
      .withColumn("from_index", lit(false))
    // verification join: each candidate pair re-reads BOTH signatures and
    // estimates Jaccard on the k minhashes — bounded by the candidate
    // count, so the verify cost scales with real collisions, not the corpus
    // rename via an explicit canonical projection: toDF is positional, and
    // a stored index read back with a different column ORDER than the delta
    // would otherwise bind p_id to a minhash column and silently admit
    // every real duplicate
    val sigCols = "doc_id" +: (0 until minhashK).map(j => s"mh$j")
    val aSig = delta.select(sigCols.map(col): _*).toDF(
      sigCols.map(c => if (c == "doc_id") "a_id" else s"a_$c"): _*)
    val pSig = index.select(sigCols.map(col): _*)
      .unionByName(delta.select(sigCols.map(col): _*)).toDF(
        sigCols.map(c => if (c == "doc_id") "p_id" else s"p_$c"): _*)
    val agree = (0 until minhashK)
      .map(j => when(col(s"a_mh$j") === col(s"p_mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val verified = candIdx.unionByName(candPrior)
      .join(aSig, col("doc_id") === col("a_id"))
      .join(pSig, col("pid") === col("p_id"))
      .withColumn("est", agree.cast("double") / minhashK)
      .groupBy("doc_id")
      .agg(
        sum(when(col("from_index"), 1L).otherwise(0L)).as("n_index_candidates"),
        sum(when(!col("from_index"), 1L).otherwise(0L)).as("n_prior_candidates"),
        max(col("est")).as("max_est_raw"))
    val out = delta.select(col("doc_id"),
        md5(concat_ws(":", (0 until minhashK).map(j => col(s"mh$j")): _*)).as("sig_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sig_id"),
        coalesce(col("n_index_candidates"), lit(0L)).as("n_index_candidates"),
        coalesce(col("n_prior_candidates"), lit(0L)).as("n_prior_candidates"),
        (floor(coalesce(col("max_est_raw"), lit(0.0)) * 10000) / 10000).as("max_est"),
        coalesce(col("max_est_raw") >= minhashVerifyTau, lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
    // materialize now so the band blocks can be reclaimed (ContextCleaner)
    graft.engine.Reliability.planCheckpoint(out)
  }

  /** dedup_groups — transitive duplicate GROUPS: connected components over
    * the near-dup pair graph (a pair list alone under-deletes: A~B, B~C ⇒
    * {A,B,C} is one dup group even if A!~C). Iterative min-label
    * propagation, converging in O(component diameter) joins — the
    * driver-side loop only orchestrates; all data work is distributed
    * joins/aggregations (at production scale the same loop runs
    * large-star/small-star with checkpoints every few rounds).
    * Output: every paired doc with its group id (min doc_id reachable) and
    * group size. Serves from the STORED group artifact (`storedGroups` —
    * the same hash-checked rows the in-plan closure produces, proven by
    * `sink_dedup_groups` sharing this oracle).
    */
  def dupGroups(t: Tables): DataFrame =
    storedGroups(t).orderBy(col("doc_id"))

  /** Session conf key selecting the connected-components algorithm for
    * `dupGroups`: unset/"propagation" = min-label propagation with pointer
    * jumping (simple, fine at suite scale); "star" = the published
    * large-star/small-star MapReduce alternation (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
    * and Beyond", SoCC 2014) — THE at-scale path: plain propagation pays a
    * full-edge shuffle per round and concentrates every hot component's
    * traffic on its min label, while the star alternation provably shrinks
    * the edge set toward depth-1 stars in O(log n) rounds with per-node
    * work bounded by current degree. Both faces return identical labels
    * (spec-pinned on the sf corpus and on a planted deep chain); the
    * registered oracle proves whichever runs.
    *
    * Default DECIDED ON MEASUREMENT (round 9, sf10 = 100× corpus,
    * back-to-back same host, co-run + solo): solo dedup_groups 172 s
    * propagation vs 160 s star, keep_best 142 vs 178, soft_weight 157
    * vs 182 — parity within the CC family's run-to-run variance, because
    * at this scale the PPJoin candidate generation dominates the chain
    * and the label iteration is a minority share. Propagation therefore
    * STAYS the default (fewer rounds on bench-scale graphs, simpler
    * plan); star remains the conf-selected path for genuinely deep/hot
    * components, where per-round full-edge shuffles and min-label
    * hot-spotting are the known propagation failure modes the star
    * alternation provably avoids.
    */
  val CcAlgoKey = "spark.graft.ccAlgo"

  /** Component labels over a pair list via the conf-selected CC engine. */
  private def ccLabels(spark: org.apache.spark.sql.SparkSession,
      pairs: DataFrame): DataFrame =
    if (spark.conf.getOption(CcAlgoKey).map(_.trim.toLowerCase)
          .contains("star")) ccStar(pairs)
    else ccPropagation(pairs)

  /** The group table (doc_id, group_id, group_size) from an (already
    * materialized) pair list — the shared tail of the full build and the
    * incremental fold.
    */
  private[graft] def groupsFromPairs(spark: org.apache.spark.sql.SparkSession,
      pairs: DataFrame): DataFrame = {
    val labels = ccLabels(spark, pairs)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("group_size"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("group_id"), col("group_size"))
  }

  /** The in-plan group table (the BUILD body — consumers read the stored
    * artifact via `storedGroups` instead of re-deriving this chain).
    */
  private[graft] def dupGroupsUnsorted(t: Tables): DataFrame =
    // ngramJaccardUnsorted materializes the pair list (planCheckpoint), so
    // the CC iteration and the size join never re-execute the PPJoin chain
    groupsFromPairs(t.spark, ngramJaccardUnsorted(t).select(col("da"), col("db")))

  /** The physical dup-group artifact write — the nightly GROUP-axis build
    * job (`sink_dedup_groups`): the verified near-dup pair list and the
    * transitive group table, each hash-repartitioned on its join axis so
    * a hot group's rows spread across writers. The pair list is persisted
    * BESIDE the labels because the daily fold (`dupGroupsInc`) needs it:
    * new pairs can merge two existing groups, so labels alone are not
    * foldable — the union pair set is what the fold re-labels.
    */
  private[graft] def writeDupGroups(t: Tables, out: String): Unit = {
    val n = t.spark.sessionState.conf.numShufflePartitions
    val pairs = ngramJaccardUnsorted(t) // materialized (planCheckpoint)
    pairs.repartition(n, col("da"))
      .write.mode("overwrite").option("maxRecordsPerFile", 1000000)
      .parquet(s"$out/pairs")
    groupsFromPairs(t.spark, pairs.select(col("da"), col("db")))
      .repartition(n, col("doc_id"))
      .write.mode("overwrite").option("maxRecordsPerFile", 1000000)
      .parquet(s"$out/groups")
  }

  /** The document-corpus fingerprint every dup-group artifact keys on —
    * ONE definition so the build, serve, and maintenance faces can never
    * key the same corpus differently.
    */
  private[graft] def dupGroupsFp(t: Tables): String =
    graft.engine.ArtifactCache.fingerprint(
      t.documents, xxhash64(col("doc_id"), col("text")))

  /** The PRE-DELTA view of `t` — documents and embeddings each restricted
    * to their non-delta rows under the shared recency split (`incIsDelta`
    * on the table's own max id). This is "yesterday's corpus": the state
    * the nightly index/group builds ran on, which every daily-maintenance
    * face (`dupGroupsInc`, the upserted text/vector indexes) folds a delta
    * into. ONE definition, shared with Bench's artifact pre-build — a
    * copy-paste drift between the operator's split and the pre-build's
    * split would silently move the base build back inside the timed
    * region (the fingerprint would no longer match).
    */
  def baseTables(t: Tables): Tables = {
    val mxD = t.documents.agg(max(col("doc_id")).as("max_id"))
    val baseDocs = t.documents.crossJoin(broadcast(mxD))
      .filter(!incIsDelta(col("doc_id"), col("max_id"))).drop("max_id")
    val mxV = t.embeddings.agg(max(col("vec_id")).as("max_id"))
    val baseEmb = t.embeddings.crossJoin(broadcast(mxV))
      .filter(!incIsDelta(col("vec_id"), col("max_id"))).drop("max_id")
    new Tables(t.spark, t.dir) {
      override def documents: DataFrame = baseDocs
      override def embeddings: DataFrame = baseEmb
    }
  }

  /** The session's dup-group artifact directory for `t`'s corpus —
    * built by the first caller, reused by every later one (the
    * ArtifactCache contract: content-fingerprint keyed, so spec corpora
    * sharing a path can never read each other's groups).
    */
  private[graft] def dupGroupsDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("dupgroups", dupGroupsFp(t))(
      writeDupGroups(t, _))

  /** The PRE-DELTA corpus' group artifact, keyed by the FULL table's
    * fingerprint + "_base" — NOT by fingerprinting `baseTables(t)`
    * directly: the recency split is a pure function of the corpus (its
    * own max id), so the full fingerprint determines the base content,
    * and fingerprinting the derived base frame would force the CONTENT
    * hash path (a corpus-linear scan inside every timed fold that just
    * needs the base's cache key — the metadata fast path only applies to
    * plain file-backed scans).
    */
  private[graft] def baseDupGroupsDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("dupgroups", dupGroupsFp(t) + "_base")(
      writeDupGroups(baseTables(t), _))

  /** The STORED group table (doc_id, group_id, group_size) — what every
    * group consumer (`dupGroups`, `keepBest`, `softWeight`,
    * `splitLeakageSafe`) joins against: the group axis gets the same
    * build-once / serve-many lifecycle as the vector and lexical indexes,
    * instead of each consumer re-deriving the full PPJoin+CC closure
    * (round 9's measured largest recurring cost: 123-182 s solo each at
    * sf10).
    */
  private[operators] def storedGroups(t: Tables): DataFrame =
    t.spark.read.parquet(s"${dupGroupsDir(t)}/groups")

  /** sink_dedup_groups — the registered BUILD face of the dup-group
    * artifact: always (re)builds the stored pair list + group table, then
    * returns the group table re-read from the STORED files — the same
    * oracle as `dedup_groups`, so the hash match proves stored ==
    * computed (the sink_vector_index discipline on the group axis). The
    * rebuild is forced (not ensure-cached) so a bench reading of this key
    * always prices the build; consumers in the same session then serve
    * from the artifact it marked built.
    */
  def dupGroupsSink(t: Tables): DataFrame = {
    val dir = graft.engine.ArtifactCache.rebuild("dupgroups", dupGroupsFp(t))(
      writeDupGroups(t, _))
    // materialize before returning (the pqAdcTopKStored discipline): the
    // directory is deterministic and overwritten per rebuild
    graft.engine.Reliability.planCheckpoint(
      t.spark.read.parquet(s"$dir/groups").orderBy(col("doc_id")))
  }

  /** sink_dedup_groups_compact — the WEEKLY maintenance pass of the
    * dup-group artifact (completing the group axis's lifecycle symmetry
    * with the vector and lexical indexes: build / upsert / COMPACT):
    * read the stored pair list back, drop every pair touching a
    * tombstoned document (the shared `isRetired` modulus — deletion
    * requests, domain bans), and RE-LABEL the survivors before rewriting
    * both tables. The re-label is the point — and the asymmetry with a
    * naive row delete: a retired document can be the BRIDGE of its
    * component (A~X~B with A!~B), so deleting its rows without
    * re-running connected components would leave A and B labeled as one
    * group that no longer exists; label validity is a property of the
    * whole pair graph, exactly like stored df was a property of the
    * whole corpus (`textIndexCompact`). Returns the compacted group
    * table re-read from the STORED files; the oracle is the SAME
    * recursive closure restricted to live documents, so the hash match
    * proves compacted == from-scratch-on-live-docs. The spec additionally
    * pins a planted bridge SPLIT and that no retired doc survives.
    *
    * Scale shape: one scan of the stored pair list (never the corpus
    * text — pair existence between two live docs does not depend on
    * retired ones), the CC re-label over the (shrinking) live pair set,
    * two bounded writes. The artifact being maintained is the SESSION'S
    * ENSURED one (`dupGroupsDir` — in production it already exists on
    * disk), read strictly read-only; the compacted output goes to its own
    * fingerprint-keyed directory (never a fixed path — the content-key
    * isolation that keeps spec corpora sharing a path from reading each
    * other's artifacts applies to maintenance outputs too). The timed
    * body of this face is therefore the true weekly maintenance, not a
    * full rebuild a production store already paid.
    */
  def dupGroupsCompact(t: Tables): DataFrame = {
    val srcDir = dupGroupsDir(t) // ensured base artifact, read-only
    val dir = graft.engine.ArtifactCache.rebuild(
        "dupgroups_compact", dupGroupsFp(t)) { out =>
      val live = graft.engine.Reliability.planCheckpoint(
        t.spark.read.parquet(s"$srcDir/pairs")
          .filter(!isRetired(col("da")) && !isRetired(col("db")))
          .select(col("da"), col("db")))
      val n = t.spark.sessionState.conf.numShufflePartitions
      live.repartition(n, col("da"))
        .write.mode("overwrite").option("maxRecordsPerFile", 1000000)
        .parquet(s"$out/pairs")
      groupsFromPairs(t.spark, live)
        .repartition(n, col("doc_id"))
        .write.mode("overwrite").option("maxRecordsPerFile", 1000000)
        .parquet(s"$out/groups")
    }
    // materialize before returning (the pqAdcTopKStored discipline): the
    // directory is deterministic and rewritten per run
    graft.engine.Reliability.planCheckpoint(
      t.spark.read.parquet(s"$dir/groups").orderBy(col("doc_id")))
  }

  /** dedup_groups_inc — the DAILY maintenance leg of the dup-group
    * artifact (the sink_vector_index_upsert move on the GROUP axis): the
    * nightly build labeled the pre-delta corpus; the day's delta docs
    * generate their new near-dup pairs DELTA-BOUNDED (`ppjoinPairs`
    * touchingDelta: probe-delta × index-all ∪ probe-all × index-delta —
    * no base×base pair can enter the candidate join), the stored base
    * pair list is read back UNRECOMPUTED, and the connected-components
    * labeling re-runs over stored ∪ new. Labels must be re-derived from
    * the union pair set — not folded label-to-label — because one new
    * pair can MERGE two existing groups (A~B arrives while {A,...} and
    * {B,...} were distinct components); the CC pass over the (tiny,
    * structurally bounded) pair list is the cheap tail of the chain, the
    * PPJoin candidate generation it skips for base×base is the dominant
    * cost. SAME oracle as `dedup_groups` (the full-corpus rescan), so the
    * hash match PROVES fold == rescan (the corpus_stats_inc rule).
    *
    * Scale shape: the linear passes (shingle df + per-doc arrays) still
    * scan the corpus — prefix completeness needs one COMMON df order
    * across both sides, and those are the same two map-side-combined
    * shuffles every shingle consumer pays; the quadratic work (candidate
    * join + verification) is bounded by the delta's posting lists. In
    * production the base artifact already exists; the registered form
    * builds it in-query (on the pre-delta corpus) to stand alone.
    */
  def dupGroupsInc(t: Tables): DataFrame = {
    val basePairs = t.spark.read.parquet(s"${baseDupGroupsDir(t)}/pairs")
      .select(col("da"), col("db"))
    // planCheckpoint, not persist (r14, guide §5 — the ngramJaccard move)
    val docs = graft.engine.Reliability.planCheckpoint(
      ppjoinDocs(t, withDelta = true))
    val newPairs = graft.engine.Reliability.planCheckpoint(
      ppjoinPairs(docs, touchingDelta = true).select(col("da"), col("db")))
    groupsFromPairs(t.spark, basePairs.unionByName(newPairs))
      .orderBy(col("doc_id"))
  }

  /** Min-label propagation + pointer jumping over an undirected pair list
    * (da, db) — returns (doc_id, label) with label = min doc_id reachable.
    *
    * Checkpoint each round's labels: iterative self-joins otherwise nest
    * the plan 2^rounds times, and self-join re-aliasing defeats cache
    * substitution — the expensive upstream recomputes per copy.
    * Reliability.planCheckpoint truncates the logical plan to the
    * materialized partitions (the same reason GraphX checkpoints Pregel
    * iterations) — executor-local by default, a RELIABLE checkpoint when
    * spark.graft.checkpointDir is set (production: a lost executor must
    * not kill the iteration).
    */
  private[graft] def ccPropagation(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("db").as("da"), col("da").as("db")))
    var labels = graft.engine.Reliability.planCheckpoint(
      edges.select(col("da").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")))
    // One hop + one label(label) pointer jump per round reaches components
    // of diameter ~2^rounds. Loop UNTIL A ROUND CHANGES NO LABELS (counted
    // on the already-checkpointed tiny frames) so deep chains can't be
    // silently split; the 20-round bound is a runaway backstop only (2^20
    // diameter is beyond any real near-dup graph).
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 20) {
      round += 1
      val prop = edges
        .join(labels.select(col("doc_id").as("da"), col("label").as("la")), "da")
        .groupBy(col("db").as("doc_id"))
        .agg(min(col("la")).as("nlabel"))
      val hop = labels
        .join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      val jumped = graft.engine.Reliability.planCheckpoint(hop
        .join(hop.select(col("doc_id").as("label"), col("label").as("ll")), Seq("label"), "left")
        .select(col("doc_id"), least(col("label"), coalesce(col("ll"), col("label"))).as("label")))
      changed = jumped
        .join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).count()
      hop.unpersist()
      labels = jumped
    }
    labels
  }

  /** Large-star/small-star connected components (Kiveris et al., SoCC
    * 2014, Algorithm "Two-Phase") over an undirected pair list (da, db) —
    * returns (doc_id, label), label = component min, bit-identical to
    * `ccPropagation` (spec-pinned).
    *
    * Per round, on the current edge multiset E:
    *   large-star: symmetrize; for every center u with neighborhood N(u),
    *     link each STRICTLY LARGER neighbor v > u to m = min(N(u) ∪ {u})
    *     — emit (v, m).
    *   small-star: orient each edge (big, small); for every center u,
    *     m = min of its (all smaller) neighbors; re-link each non-min
    *     neighbor AND u itself to m.
    * The alternation provably converges to depth-1 stars rooted at each
    * component's minimum in O(log n) rounds, and — unlike min-label
    * propagation, where every round re-shuffles the FULL edge list and a
    * hot component funnels all its edges through one min-label reducer —
    * each star round's shuffle carries the current (shrinking, deduped)
    * edge set and per-node work is bounded by current degree.
    *
    * Physical choices for 100 TB: per-center minima via groupBy (map-side
    * partial agg absorbs hot centers) + a shuffle join back on the center
    * key (AQE skew-join can split a hot center; a window over
    * partitionBy(u) could do it in one exchange but a hot center's
    * partition cannot be split). Every round's edge set is deduped
    * (distinct — the paper's termination argument counts distinct edges)
    * and checkpointed (plan truncation per round, reliable under the
    * spark.graft.checkpointDir knob). Convergence = the canonical edge
    * set reaches a fixpoint, checked EXACTLY (count + anti-join on the
    * two materialized frames); the 50-round bound is a runaway backstop
    * only (the paper's O(log n) bound crosses any real corpus long
    * before).
    */
  private[graft] def ccStar(pairs: DataFrame): DataFrame = {
    // canonical orientation (big, small); drop self loops, dedup
    var edges = graft.engine.Reliability.planCheckpoint(
      pairs.filter(col("da") =!= col("db"))
        .select(greatest(col("da"), col("db")).as("u"),
          least(col("da"), col("db")).as("v"))
        .distinct())
    var nEdges = edges.count()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 50) {
      round += 1
      val next = graft.engine.Reliability.planCheckpoint(ccStarRound(edges))
      // exact fixpoint test on the two materialized canonical sets: the
      // anti-join only runs once the cardinality has stabilized
      val nNext = next.count()
      changed =
        if (nNext != nEdges) 1L
        else next.join(edges, Seq("u", "v"), "left_anti").count()
      nEdges = nNext
      edges = next
    }
    // the 50-round bound is a runaway BACKSTOP, not a quiet exit: a
    // non-converged edge set is not depth-1 stars and the labels below
    // would be silently wrong — fail loudly instead
    if (changed > 0)
      throw new IllegalStateException(
        s"ccStar did not converge in $round rounds ($changed edges still changing); " +
          "the connected-components labeling would be invalid")
    // fixpoint = depth-1 stars: every non-root appears exactly once as u,
    // roots only as v
    edges.select(col("u").as("doc_id"), col("v").as("label"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("label")).distinct())
  }

  /** One large-star + small-star round over a canonical (u > v) edge set —
    * the lazily-planned body `ccStar` checkpoints per round (also the
    * PlanAuditSpec anchor: per-center minima are map-side-combined
    * groupBys, the joins ride the center key, nothing is cartesian).
    */
  private[graft] def ccStarRound(edges: DataFrame): DataFrame = {
    // LARGE-STAR: for each center u, m = min(N(u) ∪ {u}); emit (v, m)
    // for neighbors v > u. Output edges all point DOWN (v > m).
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val lsMin = sym.groupBy("u").agg(min(col("v")).as("m0"))
      .select(col("u"), least(col("m0"), col("u")).as("m"))
    // duplicates tolerated here (several centers can emit the same (v, m));
    // the small-star groupBy absorbs them and the round's final distinct
    // collapses the rest — a mid-round distinct would buy nothing but an
    // extra full-edge shuffle
    val ls = sym.join(lsMin, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    // SMALL-STAR on the downward edges: per center u (all neighbors
    // smaller), m = min neighbor; re-link non-min neighbors and u to m.
    val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
    val withM = ls.join(ssMin, "u")
    withM.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** dedup_keep_best — representative selection over the transitive dup
    * groups: production pipelines do not keep the MIN-ID member of a
    * duplicate cluster, they keep its BEST member (highest quality score;
    * doc_id breaks ties). Joins `dupGroups` with the shared quality
    * formula (`TextAnalysis.qualityCol` — the same floored expression the
    * standalone operator and the curation gate compile, so the selection
    * can never drift from the gate) and marks exactly one keeper per
    * group.
    *
    * Scale shape: the group table is |dup docs| (tiny vs the corpus), the
    * quality join rides the doc_id axis, and the per-group argmax is one
    * window over group_id — group sizes bound the window, nothing new is
    * quadratic beyond the component search itself.
    *
    * Serves from the STORED group artifact (`storedGroups` — built once
    * per session per corpus, the production shape where the nightly job
    * owns the closure); run solo it still stands alone by building the
    * artifact on first touch.
    */
  def keepBest(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = withWords(t.documents)
      .select(col("doc_id"), TextAnalysis.qualityCol.as("quality"))
    val w = Window.partitionBy("group_id")
      .orderBy(col("quality").desc, col("doc_id"))
    storedGroups(t)
      .join(q, "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("group_id"), col("group_size"), col("quality"),
        (col("rk") === 1).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** dedup_soft_weight — SOFT deduplication: keep every document, weight
    * each by 1/|its near-dup cluster| (singletons weigh 1.0). The
    * alternative to hard dropping that recent pretraining work prefers
    * when duplicates carry signal (a doc crawled from n mirrors
    * contributes the same total mass as one copy — sampling weights, not
    * deletions). Downstream samplers consume `weight`; the group columns
    * make the provenance auditable.
    *
    * Scale shape: identical to `keepBest` — the group table is |dup docs|
    * (tiny vs the corpus), the final left join rides the doc_id axis, and
    * the weight is a row expression; nothing new beyond the component
    * search.
    */
  def softWeight(t: Tables): DataFrame = {
    val g = storedGroups(t)
    t.documents.select(col("doc_id"))
      .join(g.select(col("doc_id"), col("group_id"), col("group_size")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"),
        coalesce(col("group_size"), lit(1L)).as("group_size"))
      .withColumn("weight",
        floor((lit(1.0) / col("group_size")) * 10000) / 10000)
      .orderBy(col("doc_id"))
  }

  /** Split fractions in permille: [0, 900) train, [900, 950) val,
    * [950, 1000) test.
    */
  val splitTrainPermille = 900L
  val splitValPermille = 950L

  /** split_leakage_safe — train/val/test assignment that cannot leak
    * near-duplicates across splits: the split is a deterministic hash of
    * the near-dup GROUP id, not the document id, so every member of a
    * cluster lands in the same split (per-doc hash splitting silently
    * puts a train doc's near-copy into test — the eval-contamination
    * failure mode this operator exists to prevent; singletons hash their
    * own id). Portable 60-bit md5 hash into permille buckets so the
    * oracle replays the assignment exactly (the textIndexBuckets move).
    *
    * Scale shape: identical to `softWeight` — the group table is tiny,
    * one doc_id-axis left join, the hash and split are row expressions.
    */
  def splitLeakageSafe(t: Tables): DataFrame = {
    val g = storedGroups(t)
    t.documents.select(col("doc_id"))
      .join(g.select(col("doc_id"), col("group_id"), col("group_size")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"),
        coalesce(col("group_size"), lit(1L)).as("group_size"))
      .withColumn("bucket",
        pmod(portableHash(col("group_id").cast("string")), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < splitTrainPermille, "train")
          .when(col("bucket") < splitValPermille, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("group_id"), col("group_size"),
        col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** dedup_audit — the approximate-vs-exact dedup audit every production
    * pipeline should run on a sample before trusting its ANN dedup: the
    * MinHash-LSH candidate pairs and the est-Jaccard-verified subset are
    * scored against the EXACT PPJoin pairs (`ngramJaccard`) as
    * precision/recall. One summary row, all counts integers — hash-exact.
    *
    * Scale shape: both pair sets are already structurally bounded (prefix
    * filtering / band occupancy); the audit adds one full-outer join on
    * the pair key and one global fold. At 100 TB this runs on a sampled
    * shard — the plan is identical, only the input filter changes.
    */
  def dedupAudit(t: Tables): DataFrame = {
    // the unsorted pair list: this frame folds to one row immediately, so
    // the presentation orderBy would materialize a range exchange nothing
    // reads (the dupGroups discipline)
    val exact = ngramJaccardUnsorted(t)
      .select(col("da"), col("db"), lit(1).as("is_exact"))
    val est = minhashCandidatePairs(t)
      .select(col("da"), col("db"), lit(1).as("is_cand"),
        (col("est_jaccard") >= jaccardTau).cast("int").as("is_pred"))
    exact.join(est, Seq("da", "db"), "full_outer")
      .agg(
        // coalesce OUTSIDE the sums too: over zero joined rows (a corpus
        // with no pairs at all) sum() is NULL, but the oracle's count(*)
        // CTEs read 0 — the counts must be 0, only the ratios go NULL
        coalesce(sum(coalesce(col("is_exact"), lit(0))), lit(0L)).as("n_exact"),
        coalesce(sum(coalesce(col("is_cand"), lit(0))), lit(0L)).as("n_candidates"),
        coalesce(sum(coalesce(col("is_pred"), lit(0))), lit(0L)).as("n_predicted"),
        coalesce(sum(when(col("is_exact") === 1 && col("is_cand") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_cand_hits"),
        coalesce(sum(when(col("is_exact") === 1 && col("is_pred") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_pred_hits"))
      .select(col("n_exact"), col("n_candidates"), col("n_predicted"),
        col("n_cand_hits"), col("n_pred_hits"),
        // a dup-free corpus has nothing to score — NULL, not a crash
        when(col("n_predicted") > 0,
          floor(col("n_pred_hits") * 10000.0 / col("n_predicted")) / 10000)
          .as("precision_pred"),
        when(col("n_exact") > 0,
          floor(col("n_pred_hits") * 10000.0 / col("n_exact")) / 10000)
          .as("recall_pred"))
  }

  /** Paragraph granularity for span-level dedup: fixed 8-word chunks (the
    * corpus has no sentence punctuation; real pipelines split on newlines /
    * sentence boundaries — same plan, different splitter).
    */
  val paraWords = 8

  /** A chunk is boilerplate when it appears in at least this many docs. */
  val paraMinDf = 3

  /** dedup_paragraph — SPAN-level dedup: whole-document dedup misses the
    * mass-replicated boilerplate spans (headers, footers, templates) that
    * dominate scraped corpora, so pretraining pipelines also dedup at
    * paragraph granularity. Per doc: chunk count, boilerplate-chunk count
    * (chunks whose distinct-doc frequency ≥ paraMinDf) and the boilerplate
    * fraction — the "strip or drop" decision input.
    *
    * Scale shape: chunking is a per-row array expression (zero shuffle);
    * chunk df is ONE map-side-combined groupBy on the chunk hash; the
    * join back to chunks rides the same hash axis. Nothing is quadratic
    * anywhere — there is no pairwise step at all.
    */
  /** The persisted per-doc chunk frame (doc_id, pos, chunk, ch) — THE one
    * chunking definition, shared by the boilerplate report and the strip
    * action (both read it twice: once for chunk df, once for the doc
    * pass, so the persist stops the scan+split+md5 running twice).
    */
  private def paraChunks(t: Tables): DataFrame =
    withWords(t.documents)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, int(floor((size(w)-1)/$paraWords))),
            i -> concat_ws(' ', slice(w, i*$paraWords+1, $paraWords)))"""))
        .as(Seq("pos", "chunk")))
      .withColumn("ch", md5(col("chunk")))
      .persist()

  def paragraphBoiler(t: Tables): DataFrame = {
    val chunks = paraChunks(t)
    val df = chunks.groupBy("ch")
      .agg(countDistinct(col("doc_id")).as("cdf"))
    val out = chunks
      .join(df, "ch")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("cdf") >= paraMinDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
        (floor(col("n_boiler") * lit(10000.0) / col("n_chunks")) / 10000).as("boiler_frac"))
      .orderBy(col("doc_id"))
    // materialize now so the chunk cache can be released instead of leaking
    // a cached frame per invocation (the estJaccard discipline)
    val res = graft.engine.Reliability.planCheckpoint(out)
    chunks.unpersist()
    res
  }

  /** dedup_paragraph_strip — the production ACTION of paragraph dedup
    * (paragraphBoiler reports; this one cleans): rebuild each document
    * with its boilerplate chunks REMOVED, preserving chunk order —
    * chunks whose distinct-doc frequency ≥ `paraMinDf` drop, the rest
    * re-join with single spaces. The cleaned TEXT itself is
    * hash-checked, not just the counts.
    *
    * Scale shape: same as the report — chunking in-row, ONE
    * map-side-combined groupBy for chunk df, one doc-axis groupBy whose
    * order-preserving rebuild is an in-group array_sort over (pos,
    * chunk) structs (group size = chunks per doc, bounded by doc
    * length).
    */
  def paragraphStrip(t: Tables): DataFrame = {
    val chunks = paraChunks(t)
    val df = chunks.groupBy("ch")
      .agg(countDistinct(col("doc_id")).as("cdf"))
    val out = chunks
      .join(df, "ch")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("cdf") < paraMinDf, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", expr(
          s"""transform(array_sort(collect_list(
                CASE WHEN cdf < $paraMinDf THEN struct(pos, chunk) END)),
              s -> s.chunk)""")).as("cleaned_text"))
      .orderBy(col("doc_id"))
    // materialize now so the chunk cache can be released instead of leaking
    // a cached frame per invocation (the estJaccard discipline)
    val res = graft.engine.Reliability.planCheckpoint(out)
    chunks.unpersist()
    res
  }

  /** Exact-substring window length in tokens. The published rule (Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better")
    * removes spans of ≥50 BPE tokens shared verbatim between documents; 16
    * words is that rule scaled to this corpus's short documents.
    */
  val substrK = 16

  /** A document whose duplicated-span coverage reaches this fraction is
    * dropped outright (the span-removal alternative would leave a stub).
    */
  val substrDropTau = 0.5

  /** dedup_substring — EXACT substring dedup, the suffix-array
    * deduplication of Lee et al. 2021 re-expressed for Spark: a span
    * shared verbatim across documents is exactly a run of shared
    * fixed-length token windows, so cross-doc duplicated spans = windows
    * of `substrK` tokens whose (portable 60-bit) hash occurs in more than
    * one document. Per doc: duplicated-window count, tokens covered by the
    * union of duplicated windows (merged-interval length via one lead()
    * diff — overlapping windows are not double-counted), coverage
    * fraction, and the keep verdict under `substrDropTau`.
    *
    * Scale shape: windows explode bounded by words-per-doc (same bound as
    * every shingle pass here); window df is ONE map-side-combined groupBy
    * on an 8-byte hash — never the window string — and the join back rides
    * the same hash axis; coverage is a lead() window + groupBy sharing one
    * doc_id exchange. No pairwise step exists at all, which is what makes
    * the suffix-array formulation tractable at corpus scale where
    * all-pairs comparison is not. (A 60-bit hash collision could merge two
    * distinct windows — ~2⁻⁶¹ per pair, accepted like every portable-hash
    * consumer in this file.)
    */
  def substringDup(t: Tables): DataFrame = {
    val wins = withWords(t.documents)
      .filter(size(col("w")) >= substrK)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, size(w)-$substrK), i -> concat_ws(' ', slice(w, i+1, $substrK)))"))
          .as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), portableHash(col("win")).as("h"))
      .persist()
    val df = wins.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
    val dup = wins.join(df.filter(col("nd") > 1), "h")
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val nextPos = lead(col("pos"), 1).over(wd)
    val perDoc = dup
      .withColumn("contrib",
        when(nextPos.isNull, lit(substrK))
          .otherwise(least(lit(substrK), nextPos - col("pos"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_wins"), sum(col("contrib")).as("covered_toks"))
    val frac = floor(coalesce(col("covered_toks"), lit(0L)).cast("double")
      / col("n_words") * 10000) / 10000
    withWords(t.documents)
      .select(col("doc_id"), size(col("w")).as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_dup_wins"), lit(0L)).as("n_dup_wins"),
        coalesce(col("covered_toks"), lit(0L)).as("covered_toks"),
        frac.as("dup_frac"),
        (frac < substrDropTau).as("keep"))
      .orderBy(col("doc_id"))
  }

  // ---- #39 simhash ----

  /** Simhash bit width: 60 (the portable md5-derived hash is 15 hex chars).
    */
  val simhashBits = 60

  /** 60-bit SimHash per doc: per-token portable hash, bit-position vote
    * counts (60 parallel aggregates in one groupBy — stays in codegen),
    * bit i set iff more than half the tokens have it set.
    */
  def simhashDocs(t: Tables): DataFrame = {
    val toks = withWords(t.documents)
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .withColumn("h", portableHash("tok"))
    val bitCols = (0 until simhashBits).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1)).as(s"b$i"))
    val agged = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), bitCols: _*)
    val simhash = (0 until simhashBits).map { i =>
      when(col(s"b$i") * 2 > col("n_tok"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select(col("doc_id"), simhash.as("simhash"))
  }

  /** Hamming threshold for "near" pairs. */
  val simhashMaxHamming = 10

  /** Occupancy ceiling on a single (band, band_val) bucket in the
    * fingerprint-banding faces (`simhash`, `Multimodal.phashDedup`). The
    * band COUNT is pinned by the pigeonhole contract (4 bands ⇔ any pair
    * within hamming 3 shares at least one band), so unlike the LSH plane
    * count it cannot be corpus-derived away — but a fixed key space
    * (2^15 resp. 2^14 values per band) means in-bucket population grows
    * n/32k and in-bucket pair work goes quadratic with onset around
    * 10⁷–10⁸ docs: the same structural family as the two fixed-constant
    * quadratics this engine already killed (LSH planes r12, centroid
    * count r11). The ceiling bounds what one bucket may contribute
    * directly (≤ cap² pairs); hotter buckets fall to the REFINED pass in
    * `bandedNearCandidates`, which preserves the hamming-≤3 pigeonhole
    * guarantee exactly while cutting hot-bucket pair work by
    * ~2^subBits/4 (the 4 sub-band rows buy a 2^subBits bucket split) —
    * ≈1000× at simhash's 12 sub-band bits.
    */
  val bandBucketCap = 512

  /** Banded near-duplicate candidate pairs with the occupancy ceiling —
    * the ONE banding discipline `simhash` and `Multimodal.phashDedup`
    * share (the df-cap move PPJoin applies on the shingle axis, applied
    * to fingerprint band buckets). `hashed` = (doc_id, <hashName>) with
    * the fingerprint in the low `totalBits` bits of a non-negative
    * int64. Returns DISTINCT (da, db, sa, sb), da < db.
    *
    * Rule (the oracle replays it in SQL):
    *  - 4 primary bands of totalBits/4 bits; bucket = (band, band_val);
    *  - a bucket at or below `cap` contributes ALL its pairs (the r12
    *    semantics);
    *  - a bucket ABOVE `cap` is refined: its members' COMPLEMENTARY bits
    *    (the fingerprint with the band's own bits excised, compacted)
    *    are split into 4 sub-bands of ⌈(totalBits − bandBits)/4⌉ bits,
    *    and only pairs agreeing on (band, band_val, sub, sub_val) for
    *    at least one sub-band survive.
    *
    * Recall contract, preserved EXACTLY: a pair within hamming 3 agrees
    * fully on some primary band (pigeonhole over 4 bands); if that
    * bucket is hot, its ≤3 differing bits all live in the complementary
    * mask, so pigeonhole over the 4 sub-bands finds a clean sub-band —
    * the pair is still emitted. What the ceiling trades away is only
    * hot-bucket pairs at hamming ≥ 4 whose differences touch all four
    * sub-bands — the documented approximation, mirrored in the oracle.
    *
    * Scale shape: uniform growth turns every bucket hot around
    * n ≈ 32k·cap ≈ 1.7·10⁷ docs; refined pair work is 4·n·pop/2^subBits
    * per band, so the onset of the NEXT quadratic wall moves out
    * ~2^(subBits/2 − 1) ≈ 22–32×, past 10⁹ docs. Beyond that the
    * documented knobs are recursive
    * refinement (each level spends more complementary bits, preserving
    * the pigeonhole chain while bits remain) or the longer-fingerprint
    * tier (128-bit simhash ⇒ 31-bit bands). Bucket populations come
    * from ONE window count sharing the band shuffle — no extra join.
    */
  private[graft] def bandedNearCandidates(hashed: DataFrame, hashName: String,
      totalBits: Int, cap: Int): DataFrame = {
    val bandBits = totalBits / 4
    val bandMask = (1L << bandBits) - 1
    val subBits = (totalBits - bandBits + 3) / 4
    val subMask = (1L << subBits) - 1
    val bands = hashed.select(col("doc_id"), col(hashName).as("h"),
      posexplode(array((0 until 4).map(k =>
        shiftrightunsigned(col(hashName), k * bandBits).bitwiseAND(bandMask)): _*))
        .as(Seq("band", "band_val")))
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_val")
    val withPop = bands.withColumn("bn", count(lit(1)).over(wb))
    val cold = withPop.filter(col("bn") <= cap)
    val coldPairs = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.h").as("sa"), col("b.h").as("sb"))
    val hot = withPop.filter(col("bn") > cap)
      .withColumn("comp",
        col("h").bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), band * $bandBits) - 1"))
          .bitwiseOR(expr(
            s"shiftleft(shiftrightunsigned(h, (band + 1) * $bandBits), band * $bandBits)")))
      .select(col("doc_id"), col("h"), col("band"), col("band_val"),
        posexplode(array((0 until 4).map(j =>
          shiftrightunsigned(col("comp"), j * subBits).bitwiseAND(subMask)): _*))
          .as(Seq("sub", "sub_val")))
    val hotPairs = hot.as("a").join(hot.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.sub") === col("b.sub") && col("a.sub_val") === col("b.sub_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.h").as("sa"), col("b.h").as("sb"))
    coldPairs.unionByName(hotPairs).distinct()
  }

  /** #39 dedup_simhash — band the 60-bit fingerprint into 4×15-bit chunks,
    * bucket-join, exact hamming (bit_count of xor) within buckets. Per-doc
    * output (fingerprint + near-pair count), hash-checked: the fingerprint
    * is plain bigint arithmetic over the portable hash on both sides.
    * Candidate generation rides `bandedNearCandidates` — buckets above
    * `bandBucketCap` take the sub-band-refined pass, which keeps the
    * hamming-≤3 recall guarantee while bounding hot-bucket pair work
    * (see the helper's contract; the oracle replays the full rule).
    */
  def simhash(t: Tables, cap: Int = bandBucketCap): DataFrame = {
    val docs = simhashDocs(t)
    val near = bandedNearCandidates(docs, "simhash", simhashBits, cap)
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= simhashMaxHamming)
    val nNear = near.select(col("da").as("doc_id"))
      .union(near.select(col("db").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    docs.join(nNear, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy(col("doc_id"))
  }
}
