package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data assembly operators (SURVEY.md §2.8 extensions): the
  * corpus-mixing steps a large-scale pretraining pipeline runs after
  * dedup/quality filtering.
  */
object TrainData {

  /** Per-stratum keep rates for the training mix (stratum = event_type here;
    * in a document pipeline: source/language/quality bucket). Also the
    * source of the oracle's VALUES list — one copy.
    */
  val sampleRates: Seq[(String, Double)] = Seq(
    "view" -> 0.05, "click" -> 0.25, "error" -> 0.01,
    "signup" -> 0.5, "purchase" -> 1.0)

  /** Knuth multiplicative mix of the row key into [0, 1e6) — deterministic,
    * partition-independent, identical in Spark and DuckDB (the inner modulus
    * keeps the product far from 64-bit overflow, where ANSI engines error).
    * Production string keys take the same path via xxhash64; the integral
    * mix is what makes the oracle replayable.
    */
  private def mix(c: org.apache.spark.sql.Column) =
    (c % 100003L) * 2654435761L % 1000000L

  /** The deterministic key mix, exposed for streaming legs that must
    * shard exactly like the batch operators.
    */
  def keyMix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = mix(c)

  /** sample_stratified — deterministic stratified sampling: each stratum
    * keeps `rate` of its rows, chosen by the key mix, NOT by RNG — so the
    * sample is reproducible across runs, clusters and repartitioning
    * (df.sampleBy's seed is partition-dependent and useless for auditable
    * training mixes). Scale shape: broadcast the rate dim, zero shuffle —
    * the filter fuses into the scan, and downstream stages see a stream
    * that is already the mix.
    */
  def sampleStratified(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val rates = broadcast(sampleRates.toDF("event_type", "rate"))
    t.events
      .join(rates, Seq("event_type"))
      .filter(mix(col("event_id")) < col("rate") * 1000000L)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy(col("event_id"))
  }

  /** Explicit per-source mixture weights (keep rates); sources not listed
    * fall back to `domainDefaultWeight` — the shape of a real training-mix
    * config, where a handful of curated domains get pinned rates and the
    * long tail shares a default. One copy: the oracle VALUES list is built
    * from this.
    */
  val domainWeights: Seq[(String, Double)] = Seq(
    "src0" -> 0.05, "src1" -> 0.2, "src2" -> 0.5, "src3" -> 1.0)

  val domainDefaultWeight = 0.1

  /** mix_domains — domain-weighted corpus mixing: each source keeps
    * `weight` of its documents, chosen by the deterministic key mix (same
    * discipline as `sampleStratified`: reproducible across runs, clusters
    * and repartitioning — an auditable mix, not an RNG draw). Scale shape:
    * the weight dim broadcasts, the filter fuses into the scan — zero
    * shuffle; downstream consumers read a stream that already IS the mix.
    */
  def mixDomains(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val wts = broadcast(domainWeights.toDF("source", "weight"))
    t.documents
      .join(wts, Seq("source"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(domainDefaultWeight)))
      .filter(mix(col("doc_id")) < col("weight") * 1000000L)
      .select(col("doc_id"), col("source"), col("lang"), col("weight"))
      .orderBy(col("doc_id"))
  }

  /** mix_domains_stats — realized mixture audit per source: totals, kept
    * counts and the realized keep rate vs the configured weight.
    */
  def mixDomainsStats(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val wts = broadcast(domainWeights.toDF("source", "weight"))
    t.documents
      .join(wts, Seq("source"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(domainDefaultWeight)))
      .groupBy(col("source"), col("weight"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(mix(col("doc_id")) < col("weight") * 1000000L, 1L).otherwise(0L))
          .as("n_kept"))
      .select(col("source"), col("weight"), col("n_total"), col("n_kept"),
        (floor(col("n_kept") * lit(10000.0) / col("n_total")) / 10000).as("realized"))
      .orderBy(col("source"))
  }

  /** Eval membership: every 97th doc_id — a deterministic stand-in for the
    * held-out benchmark set a decontamination pass protects. Portable
    * (plain modulus) so the oracle replays it.
    */
  val contamEvalMod = 97L

  /** Contamination n-gram width. 8 words is the conventional
    * decontamination window (long enough that a hit means shared text, not
    * shared phrasing).
    */
  val contamGram = 8

  /** text_contamination — train/eval overlap detection: flag training
    * documents sharing any word 8-gram with the eval set, with per-doc hit
    * counts. The standard pretraining decontamination pass.
    *
    * Scale shape: per-doc distinct grams are built INSIDE the row
    * (array_distinct before explode); eval grams collapse through one
    * map-side-combined distinct. The probe is an equi-join on the gram
    * hash — at production scale the eval side is benchmark-sized (≪ train),
    * so Spark broadcasts it and the pass costs one scan of train. Docs too
    * short to carry a full window surface with n_grams = 0 rather than
    * dropping out (left join from the doc spine).
    */
  /** Per-doc DISTINCT contamination-gram hashes of a words frame — the ONE
    * gram definition shared by `contamination` and the curation gate.
    */
  private def gramHashes(docsW: DataFrame): DataFrame =
    docsW
      .filter(size(col("w")) >= contamGram)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"""transform(sequence(0, size(w)-$contamGram),
            i -> concat_ws(' ', slice(w, i+1, $contamGram)))"""))).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))

  def contamination(t: Tables): DataFrame = {
    val grams = gramHashes(Dedup.withWords(t.documents))
    val isEval = col("doc_id") % contamEvalMod === 0
    val evalGrams = grams.filter(isEval).select(col("gh")).distinct()
    val hits = grams.filter(!isEval)
      .join(evalGrams, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
    t.documents.filter(!isEval)
      .select(col("doc_id"),
        greatest(size(split(lower(trim(col("text"))), "\\s+")) - (contamGram - 1), lit(0))
          .as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** text_contamination_bloom — the 100 TB decontamination shape: when the
    * eval-gram set outgrows a broadcast hash relation (100M+ grams), the
    * membership probe becomes a Bloom sketch — `bloom_filter_agg` builds
    * it distributed (mergeable partials, one binary blob out), the
    * one-row blob broadcasts everywhere, and `graft_might_contain`
    * (Spark's own codegen'd BloomFilterMightContain, registered via
    * SketchExpressions) gates the train grams without any join. Bloom
    * guarantees NO false negatives — every exactly-contaminated doc is
    * flagged — at a configured false-positive rate; the spec pins both
    * properties against the exact operator. Rows-only by design
    * (probabilistic output has no SQL oracle).
    */
  def contaminationBloom(t: Tables): DataFrame = {
    graft.functions.SketchExpressions.register(t.spark)
    val grams = gramHashes(Dedup.withWords(t.documents))
    val isEval = col("doc_id") % contamEvalMod === 0
    // ~1% FPP at the eval-set scale; numBits sized for the sf0.1 corpus,
    // a knob (items * 10 bits ≈ 0.8% FPP) at production scale. The built
    // sketch collects to the driver ONCE (one binary blob, KBs-MBs — the
    // same move Spark's own runtime row filters and df.stat.bloomFilter
    // make) and ships as a foldable literal, which is what the probe
    // expression requires.
    val blob = grams.filter(isEval).select(col("gh")).distinct()
      .agg(expr("graft_bloom_agg(xxhash64(gh), 100000L, 1000000L)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val hits = grams.filter(!isEval)
      .filter(call_function("graft_might_contain", lit(blob), xxhash64(col("gh"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_maybe_hits"))
    t.documents.filter(!isEval)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_maybe_hits"), lit(0L)).as("n_maybe_hits"),
        (coalesce(col("n_maybe_hits"), lit(0L)) > 0).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Packing shards: parallelism of the packing pass. Each shard is one
    * ordered fill — at 100 TB you size this O(cluster cores) so every core
    * fills its own stream; 8 keeps the oracle window small here.
    */
  val packShards = 8L

  /** Token budget per packed sequence (a context window's worth). */
  val packBudget = 512L

  /** pack_sequences — sequence packing: concatenate documents into fixed
    * token-budget bins (context-window fill for pretraining). Deterministic
    * contiguous fill: shard by the key mix, order by doc_id within the
    * shard, running token sum, and a doc lands in bin ⌊(cumsum − tok)/B⌋ —
    * the bin its first token falls into, so every bin overflows by less
    * than one document (exactly what a packer that splits long docs across
    * boundaries produces, minus the split bookkeeping).
    *
    * Scale shape: ONE shuffle (the per-shard window); each shard is an
    * ordered linear scan. Packing is inherently sequential per output
    * stream — sharding is what makes it parallel, and the shard count is
    * the knob that matches it to the cluster.
    */
  /** The unsorted packing frame — the stats twin aggregates this; the
    * presentation sort stays on the registered face only.
    */
  private[operators] def packSequencesUnsorted(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Dedup.withWords(t.documents)
      .select(col("doc_id"), (mix(col("doc_id")) % packShards).as("shard"),
        size(col("w")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("doc_id"), col("shard"), col("tok"),
        floor((col("cum") - col("tok")).cast("double") / packBudget).cast("long").as("bin"))
  }

  def packSequences(t: Tables): DataFrame =
    packSequencesUnsorted(t).orderBy(col("doc_id"))

  /** pack_sequences_split — the EXACT packer semantics (what #51 models
    * minus the split bookkeeping, now with it): a document whose span
    * crosses a bin boundary contributes its tokens to EVERY bin it
    * touches, so every bin except each shard's last holds exactly
    * `packBudget` tokens — zero padding waste, the fill invariant a real
    * context-window packer guarantees. Doc spans come from the same
    * per-shard running sum; the bin range explodes inside the row
    * (`sequence` over ⌊start/B⌋..⌊(end−1)/B⌋), so the only shuffle is
    * still the per-shard window.
    */
  def packSequencesSplit(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = packBudget
    Dedup.withWords(t.documents)
      .select(col("doc_id"), (mix(col("doc_id")) % packShards).as("shard"),
        size(col("w")).cast("long").as("tok"))
      .filter(col("tok") > 0)
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("start", col("cum") - col("tok"))
      // integral `div`, never a double cast: DuckDB casts double→int by
      // ROUNDING, Spark by truncation — only integer division agrees
      .withColumn("bin", explode(expr(
        s"sequence(start div $b, (cum - 1) div $b)")))
      .select(col("doc_id"), col("shard"), col("bin"),
        (least(col("cum"), (col("bin") + 1) * b)
          - greatest(col("start"), col("bin") * b)).as("tok_in_bin"),
        (col("bin") === expr(s"start div $b")).as("is_head"))
      .orderBy(col("doc_id"), col("bin"))
  }

  /** pack_sequences_stats — packing efficiency audit: docs, tokens and fill
    * ratio per (shard, bin). The fill ratio distribution is the packing
    * quality metric (waste = 1 − mean fill of non-final bins).
    */
  def packSequencesStats(t: Tables): DataFrame =
    packSequencesUnsorted(t)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"),
        (floor(col("n_tokens") * lit(10000.0) / packBudget) / 10000).as("fill"))
      .orderBy(col("shard"), col("bin"))

  /** Quality floor for the curation chain (same score as
    * TextAnalysis.qualityScore; the corpus sits mostly in [0.5, 1.0]).
    */
  val curationMinQuality = 0.55

  /** pipeline_curation — the training-data AllJob: the full corpus-curation
    * chain as ONE declarative plan, the way a pretraining data pipeline
    * actually runs it:
    *
    *   exact dedup (keep the min doc_id of each normalized-text group)
    *   → decontaminate (drop docs sharing an 8-gram with the eval set,
    *     and the eval docs themselves)
    *   → quality gate (stopword/length score ≥ curationMinQuality)
    *   → pack survivors into token-budget bins (sharded contiguous fill).
    *
    * Output: one row per surviving doc with its pack assignment and the
    * scores that let it through — the manifest a trainer consumes.
    *
    * Cost shape at 100 TB: one documents scan feeds every stage; the wide
    * operations are the dedup groupBy (16-byte hash axis), the
    * contamination gram join (eval side benchmark-sized → broadcast), and
    * the packing window (per-shard). Quality is free (per-row exprs on the
    * same scan). No stage is quadratic; every stage's filter shrinks the
    * data before the next shuffle.
    */
  def curation(t: Tables): DataFrame = {
    // quality and gram definitions come from the standalone operators
    // (TextAnalysis.qualityCol, gramHashes) — the gate cannot drift
    val docs = Dedup.withWords(t.documents)
      .select(col("doc_id"), col("w"),
        Dedup.normalizedMd5.as("h"),
        size(col("w")).cast("long").as("tok"),
        TextAnalysis.qualityCol.as("quality"))
    // keep rule as a WINDOW on the one frame (the former groupBy+self-join
    // ran the scan+tokenize+score chain twice and shuffled both copies on
    // h), then checkpoint: three branches (eval grams, the contamination
    // probe, the clean gate) read the deduped frame and would otherwise
    // each re-run the whole chain. Same exchange axis (h), same keep rule.
    val deduped = graft.engine.Reliability.planCheckpoint {
      import org.apache.spark.sql.expressions.Window
      docs.withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy("h")))
        .filter(col("doc_id") === col("keep_id"))
    }
    val isEval = col("doc_id") % contamEvalMod === 0
    val grams = gramHashes(deduped)
    val evalGrams = grams.filter(isEval).select(col("gh")).distinct()
    val contaminated = grams.filter(!isEval).join(evalGrams, "gh")
      .select(col("doc_id")).distinct()
    val clean = deduped
      .filter(!isEval)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= curationMinQuality)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .select(col("doc_id"), (mix(col("doc_id")) % packShards).as("shard"),
        col("tok"), col("quality"))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("doc_id"), col("shard"), col("tok"), col("quality"),
        floor((col("cum") - col("tok")).cast("double") / packBudget).cast("long").as("bin"))
      .orderBy(col("doc_id"))
  }

  /** pipeline_curation_llm — the MODERN curation chain as ONE declarative
    * plan, composing this round's published-method gates the way a
    * current pretraining pipeline actually stacks them:
    *
    *   exact dedup (min doc_id per normalized-text hash)
    *   → decontaminate (any shared eval 8-gram drops the doc)
    *   → the full Gopher rule battery (`gopherKeepCol` — shared with #72)
    *   → DSIR importance selection (log-weight ≥ 0 against the corpus
    *     histograms — shared operator, shared oracle arithmetic)
    *   → pack survivors into token-budget bins (sharded contiguous fill).
    *
    * Output: the trainer manifest — one row per surviving doc with its
    * pack assignment and the importance weight that admitted it.
    * `pipeline_curation` remains the heuristic-gate cousin; this is the
    * classifier-gated one.
    *
    * Cost shape at 100 TB: one documents scan feeds dedup, grams, gates
    * and the DSIR features; the wide steps are the 16-byte-hash dedup
    * groupBy, the broadcast eval-gram probe, the 64-row histogram
    * broadcast and the per-shard packing window. Nothing quadratic;
    * every stage's filter shrinks the next shuffle.
    */
  def curationLlm(t: Tables): DataFrame = {
    val docs = Dedup.withWords(t.documents)
      .select(col("doc_id"), col("w"), Dedup.normalizedMd5.as("h"),
        size(col("w")).cast("long").as("tok"),
        TextAnalysis.gopherKeepCol.as("gkeep"))
    // window keep rule + checkpoint — see `curation` (same three-branch
    // reuse of the deduped frame)
    val deduped = graft.engine.Reliability.planCheckpoint {
      import org.apache.spark.sql.expressions.Window
      docs.withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy("h")))
        .filter(col("doc_id") === col("keep_id"))
    }
    val isEval = col("doc_id") % contamEvalMod === 0
    val grams = gramHashes(deduped)
    val evalGrams = grams.filter(isEval).select(col("gh")).distinct()
    val contaminated = grams.filter(!isEval).join(evalGrams, "gh")
      .select(col("doc_id")).distinct()
    val selected = dsirScores(t).filter(col("selected"))
      .select(col("doc_id"), col("log_weight"))
    val clean = deduped
      .filter(!isEval)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .filter(col("gkeep"))
      .join(selected, "doc_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .select(col("doc_id"), (mix(col("doc_id")) % packShards).as("shard"),
        col("tok"), col("log_weight"))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("doc_id"), col("shard"), col("tok"), col("log_weight"),
        floor((col("cum") - col("tok")).cast("double") / packBudget).cast("long").as("bin"))
      .orderBy(col("doc_id"))
  }

  /** Chunk window size / stride in whitespace tokens. Stride < size ⇒
    * overlapping windows (the RAG-indexing default; packing uses
    * stride = size).
    */
  val chunkSize = 64L
  val chunkStride = 48L

  /** text_chunk_windows — fixed-size overlapping token windows per document
    * (the splitting pass of RAG indexing / long-document training): window
    * w covers tokens [w·stride, w·stride + size), windows start while their
    * offset is inside the doc, the last window is clipped at the doc end.
    * Pure per-row `sequence` + explode — zero shuffle, the chunk axis is
    * born distributed; the downstream embedder/indexer reads a stream that
    * already is the chunk table.
    */
  def chunkWindows(t: Tables): DataFrame =
    Dedup.withWords(t.documents)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"))
      .withColumn("win", explode(expr(
        s"sequence(0L, greatest(0L, ceil((n_words - 1) / $chunkStride)))")))
      .filter(col("win") * chunkStride < col("n_words"))
      .select(col("doc_id"), col("win"),
        (col("win") * chunkStride).as("tok_start"),
        least(col("win") * chunkStride + chunkSize, col("n_words")).as("tok_end"))
      .withColumn("n_tokens", col("tok_end") - col("tok_start"))
      .orderBy(col("doc_id"), col("win"))

  /** Per-source epoch factors for repeat-factor mixing: a source with
    * factor 2.5 contributes every doc twice plus a deterministic 50%
    * third copy — the way curated high-quality sources are upsampled in
    * real pretraining mixes. Sources not listed get factor 1.0.
    */
  val epochFactors: Seq[(String, Double)] = Seq(
    "src0" -> 2.5, "src1" -> 0.5, "src2" -> 1.0, "src3" -> 3.0)

  val epochDefaultFactor = 1.0

  /** mix_epochs — repeat-factor corpus mixing: doc with factor f appears
    * ⌊f⌋ times always, plus one more copy when the key mix lands under the
    * fractional part — deterministic, partition-independent, audit-exact
    * (unlike RNG upsampling). Zero shuffle: the repeat axis is a per-row
    * `sequence` + explode fused into the scan; each copy carries its epoch
    * index so downstream shuffles (shard_assign) can spread the copies.
    */
  private[operators] def mixEpochsUnsorted(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val factors = broadcast(epochFactors.toDF("source", "factor"))
    val docs = t.documents
      .withColumn("source", concat(lit("src"), (col("doc_id") % 6).cast("string")))
      .join(factors, Seq("source"), "left")
      .withColumn("factor", coalesce(col("factor"), lit(epochDefaultFactor)))
    docs
      .withColumn("n_copies",
        floor(col("factor")).cast("long") +
          when(mix(col("doc_id")) < (col("factor") - floor(col("factor"))) * 1000000L, 1L)
            .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("factor"), col("n_copies"),
        explode(expr("sequence(0L, n_copies - 1)")).as("epoch"))
  }

  def mixEpochs(t: Tables): DataFrame =
    mixEpochsUnsorted(t).orderBy(col("doc_id"), col("epoch"))

  /** mix_epochs_stats — realized epoch factor per source (copies / docs),
    * the audit a mixture config review reads.
    */
  def mixEpochsStats(t: Tables): DataFrame =
    mixEpochsUnsorted(t)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_copies"))
      .select(col("source"), col("n_docs"), col("n_copies"),
        (floor(col("n_copies") * lit(10000.0) / col("n_docs")) / 10000).as("realized"))
      .orderBy(col("source"))

  /** Output shard count for the training-order shuffle. Sized O(output
    * files) in prod (thousands); 8 keeps the oracle windows small here.
    */
  val orderShards = 8L

  /** shard_assign — the deterministic global training-order shuffle: every
    * epoch-0 data loader wants the corpus in a pseudo-random order that is
    * reproducible across reruns and independent of input partitioning. RNG
    * + repartition can't give that (seed is partition-dependent); a hash
    * CAN: order key = portable hash of the doc id under a named salt,
    * shard = key mod `orderShards`, position = rank of the key within the
    * shard. Same inputs ⇒ same shard files in the same order, bit for bit.
    *
    * Scale shape: ONE shuffle (the per-shard window), no global sort — each
    * shard sorts independently, and the shard count is the parallelism/
    * file-size knob. The hash key is uniform, so shards are balanced by
    * construction (the stats twin audits it).
    */
  private[operators] def shardAssignUnsorted(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = Dedup.portableHash(concat(lit("order:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("ord_key"), col("doc_id"))
    t.documents
      .select(col("doc_id"), key.as("ord_key"))
      .withColumn("shard", pmod(col("ord_key"), lit(orderShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"), col("ord_key"))
  }

  def shardAssign(t: Tables): DataFrame =
    shardAssignUnsorted(t).orderBy(col("doc_id"))

  /** shard_assign_stats — balance audit of the training-order shuffle:
    * per-shard doc counts and the contiguity invariant (max pos == count).
    */
  def shardAssignStats(t: Tables): DataFrame =
    shardAssignUnsorted(t)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), max(col("pos")).as("max_pos"))
      .select(col("shard"), col("n_docs"), col("max_pos"),
        (col("n_docs") === col("max_pos")).as("contiguous"))
      .orderBy(col("shard"))

  /** sample_stratified_stats — the mix audit: kept vs total per stratum with
    * the realized fraction (floor-rounded for the oracle). One
    * map-side-combined groupBy over the same zero-shuffle filter.
    */
  def sampleStratifiedStats(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val rates = broadcast(sampleRates.toDF("event_type", "rate"))
    t.events
      .join(rates, Seq("event_type"))
      .groupBy(col("event_type"), col("rate"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(mix(col("event_id")) < col("rate") * 1000000L, 1L).otherwise(0L)).as("n_kept"))
      .select(col("event_type"),
        col("n_total"), col("n_kept"),
        (floor(col("n_kept") * lit(10000.0) / col("n_total")) / 10000).as("realized"))
      .orderBy(col("event_type"))
  }

  /** corpus_stats — the dataset-card summary a training-mix review reads:
    * per (source, lang) document counts, token/char totals, mean tokens
    * per doc and the short-doc fraction. ONE map-side-combined groupBy
    * over per-row folds — at 100 TB this is a single scan emitting a
    * handful of rows, the cheapest full-corpus pass there is.
    */
  def corpusStats(t: Tables): DataFrame =
    Dedup.withWords(t.documents)
      .select(col("source"), col("lang"),
        size(col("w")).cast("long").as("tok"), length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        sum(when(col("tok") < TextAnalysis.c4MinWords, 1L).otherwise(0L)).as("n_short"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (floor(col("n_tokens") * lit(10000.0) / col("n_docs")) / 10000).as("mean_tokens"),
        (floor(col("n_short") * lit(10000.0) / col("n_docs")) / 10000).as("short_frac"))
      .orderBy(col("source"), col("lang"))

  /** corpus_stats_inc — the incremental maintenance path of the dataset
    * card (#73), the way a 100 TB card actually updates nightly: each
    * load (modeled as doc_id mod 3 — three "daily drops") aggregates its
    * own per-(source, lang) INTEGER partials, the fold re-sums them on
    * the card key, and the derived mean/short-frac columns compute from
    * the post-merge integers exactly like the full rescan. Oracle = the
    * SAME SQL as corpus_stats, so the hash match PROVES fold == full
    * rescan. Integer partials also make the merge order-free — no float
    * drift across loads, unlike a mean-of-means.
    */
  def corpusStatsInc(t: Tables): DataFrame = {
    val parts = Dedup.withWords(t.documents)
      .select(col("source"), col("lang"),
        size(col("w")).cast("long").as("tok"),
        length(col("text")).cast("long").as("chars"),
        (col("doc_id") % 3).as("inc_slice"))
      .groupBy(col("source"), col("lang"), col("inc_slice"))
      .agg(count(lit(1)).as("n_docs_p"), sum(col("tok")).as("n_tokens_p"),
        sum(col("chars")).as("n_chars_p"),
        sum(when(col("tok") < TextAnalysis.c4MinWords, 1L).otherwise(0L))
          .as("n_short_p"))
    parts
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs_p")).as("n_docs"), sum(col("n_tokens_p")).as("n_tokens"),
        sum(col("n_chars_p")).as("n_chars"), sum(col("n_short_p")).as("n_short"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chars"),
        (floor(col("n_tokens") * lit(10000.0) / col("n_docs")) / 10000)
          .as("mean_tokens"),
        (floor(col("n_short") * lit(10000.0) / col("n_docs")) / 10000)
          .as("short_frac"))
      .orderBy(col("source"), col("lang"))
  }

  /** mix_temperature — temperature-based source re-balancing (the
    * multilingual sampling recipe of Conneau & Lample 2019 / mT5): at
    * temperature τ the sampling share of source i moves from its raw
    * share p_i to p_i^(1/τ) / Σ p_j^(1/τ), boosting the tail and
    * damping the head. τ = 2 here, so the exponent is `sqrt` — IEEE
    * correctly-rounded, which is what lets the oracle replay every
    * share bit-for-bit (arbitrary τ would need `pow`). Emits per source
    * the raw/temperature shares, the boost factor, and the keep rate
    * normalized to the most-boosted source — the table a mixture config
    * review consumes; gating rides the same deterministic key-mix as
    * `mixDomains`.
    *
    * The share denominator Σ√n_j is an ordered fold over the per-source
    * counts (sorted collect, left-assoc accumulate) because a plain SUM
    * of doubles is shuffle-order-dependent and could never hash-match;
    * the source table is mixture-config-sized, so the fold is a one-row
    * broadcast. Scale shape: one map-side-combined groupBy + two 1-row
    * broadcasts.
    */
  /** Per-source raw and temperature shares (unfloored — callers floor at
    * their own precision): (source, n_docs, rs, ts). The Σ√n denominator
    * is an ordered fold (sorted collect, left-assoc accumulate) because a
    * plain double SUM is shuffle-order-dependent and could never
    * hash-match.
    */
  private def temperatureShares(t: Tables): DataFrame = {
    val counts = t.documents.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(col("n")).as("n_total"),
      aggregate(
        sort_array(collect_list(struct(col("source").as("s"), col("n").as("c")))),
        lit(0.0),
        (a, x) => a + sqrt(x.getField("c").cast("double"))).as("s_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        (col("n").cast("double") / col("n_total")).as("rs"),
        (sqrt(col("n").cast("double")) / col("s_total")).as("ts"))
  }

  def mixTemperature(t: Tables): DataFrame = {
    val j = temperatureShares(t).withColumn("raw_boost", col("ts") / col("rs"))
    val mx = j.agg(max(col("raw_boost")).as("mb"))
    j.crossJoin(broadcast(mx))
      .select(col("source"), col("n_docs"),
        (floor(col("rs") * 10000) / 10000).as("raw_share"),
        (floor(col("ts") * 10000) / 10000).as("temp_share"),
        (floor(col("raw_boost") * 10000) / 10000).as("boost"),
        (floor(col("raw_boost") / col("mb") * 10000) / 10000).as("keep_rate"))
      .orderBy(col("source"))
  }

  /** Total token budget for the budgeted mix (prod: the training-run
    * token count, e.g. 1e12; 10k bites at every test sf).
    */
  val mixBudgetTokens = 10000L

  /** mix_budget — "make me exactly a B-token mix": each source gets the
    * token quota its temperature share earns (`⌊ts_i · B⌋`), documents
    * fill the quota in the deterministic hash order (the same
    * reproducible-shuffle discipline as `shardAssign` — an RNG order
    * could never be audited or replayed), and a document is kept while
    * its running in-source token sum fits. The composition of
    * `mixTemperature` (the shares) with `packSequences`' running-window
    * shape — how a real mixture spec turns into a concrete corpus cut.
    *
    * Scale shape: shares are a config-sized broadcast; the fill is ONE
    * per-source window; the gate fuses into the scan for downstream
    * consumers. Quota boundaries are integers (`⌊ts·B⌋`), so the keep
    * verdict is exact on both engines.
    */
  def mixBudget(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = temperatureShares(t)
      .select(col("source"),
        floor(col("ts") * mixBudgetTokens).cast("long").as("quota"))
    val key = Dedup.portableHash(concat(lit("budget:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("source").orderBy(col("ord_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Dedup.withWords(t.documents)
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("tok"), key.as("ord_key"))
      .withColumn("cum", sum(col("tok")).over(w))
      .join(broadcast(quotas), "source")
      .select(col("doc_id"), col("source"), col("tok"), col("cum"), col("quota"),
        (col("cum") <= col("quota")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** UniMax epoch cap: no language may be repeated more than this many
    * times, however small it is (the paper's `N` in "at most N epochs").
    */
  val unimaxEpochCap = 4L

  /** Budget multiplier: the training budget is `corpus_tokens × mul`
    * (multi-epoch training — the paper's regime). At 3× the tail
    * languages hit the epoch cap and the head (en) is budget-bound, so
    * both allocation branches are live on the test corpora.
    */
  val unimaxBudgetMul = 3L

  /** mix_unimax — UniMax language sampling (Chung et al., ICLR 2023):
    * allocate a total token budget across languages so every language
    * gets an equal share EXCEPT that none exceeds `unimaxEpochCap`
    * epochs of its own data — the published fix for temperature
    * sampling's twin failure modes (high T starves the head, low T
    * over-repeats the tail into memorization). The paper's sequential
    * water-filling (ascending by size: grant
    * `min(cap_i, remaining/remaining_count)`) is re-expressed
    * CLOSED-FORM so both engines replay it exactly: after the first
    * language whose cap exceeds the even share, every later language
    * is uncapped and gets the SAME even share — so the fill is two
    * window passes over the size-sorted language axis:
    *  1. `rn`/`cum` over (cap asc, lang): language i is capped iff
    *     `cap_i · (n − rn_i + 1) ≤ B − cum_{i−1}` (all-integer — no
    *     double ever enters the branch decision);
    *  2. `F` = first uncapped rank; uncapped allocation is
    *     `(B − Σ_{capped} cap) div (n − F + 1)` — one integer division
    *     (the ≤ n−F+1 remainder tokens stay unallocated by contract).
    * Realized epochs floor-quantize at 4dp for the report.
    *
    * Scale shape: token counting is ONE map-side-combined groupBy on the
    * language axis; the water-fill windows run on the LANGUAGE table —
    * vocabulary-bounded (tens of rows, the DSIR-histogram boundedness
    * argument), so the global (unpartitioned) sort window is a
    * config-sized frame, not a corpus axis.
    */
  def mixUnimax(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = Dedup.withWords(t.documents)
      .select(col("lang"), size(col("w")).cast("long").as("dl"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * unimaxEpochCap)
    val scalars = dom.agg(
      count(lit(1)).as("n_domains"),
      (sum(col("n_tokens")) * unimaxBudgetMul).as("budget"))
    val wOrd = Window.orderBy(col("cap_tokens").asc, col("lang").asc)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dom.crossJoin(broadcast(scalars))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cum", sum(col("cap_tokens")).over(wCum))
      .withColumn("cond_ok",
        col("cap_tokens") * (col("n_domains") - col("rn") + 1) <=
          col("budget") - (col("cum") - col("cap_tokens")))
      .withColumn("f", min(when(!col("cond_ok"), col("rn"))).over(wAll))
      .withColumn("capped", col("f").isNull || col("rn") < col("f"))
      .withColumn("capped_sum",
        sum(when(col("capped"), col("cap_tokens")).otherwise(0L)).over(wAll))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("(budget - capped_sum) div (n_domains - f + 1)")))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("cap_tokens"),
        col("capped"), col("alloc_tokens"),
        (floor(col("alloc_tokens") * lit(10000.0) / col("n_tokens")) / 10000)
          .as("epochs_q4"))
      .orderBy(col("lang"))
  }

  /** DSIR hashed-feature dimensionality (prod: 10k buckets; 64 keeps the
    * oracle dim readable) and the target-domain membership rule (every
    * 17th doc — the stand-in for "a sample of the domain you want more
    * of", the way `contamEvalMod` stands in for the eval set).
    */
  val dsirBuckets = 64
  val dsirTargetMod = 17L

  /** dsir_importance — Data Selection via Importance Resampling (Xie et
    * al., NeurIPS 2023): estimate hashed-n-gram bucket distributions for
    * a target domain sample and for the raw corpus, then score each raw
    * document by its importance log-weight
    * `sum over features of log2(p_target(bucket) / p_raw(bucket))`
    * (Laplace-smoothed). Documents scoring >= 0 look more like the target
    * than the raw pool — the deterministic selection face of the paper's
    * Gumbel resampling (auditable and rerun-stable, which RNG draws are
    * not).
    *
    * Scale shape: features (unigrams + word bigrams, the classifier's
    * gram definition) are built in-row and exploded — one scan; the
    * bucket histogram is a `dsirBuckets`-row map-side-combined groupBy;
    * the per-bucket log-ratio dim broadcasts; scoring is broadcast-join +
    * one doc-axis groupBy. Nothing is quadratic and no state exceeds the
    * bucket count. The log-weight sum crosses a shuffle, so it floors at
    * 2dp like the unigram LM (accumulation order is plan-dependent).
    */
  /** The doc's DSIR feature array (unigrams + word bigrams — the
    * classifier's gram definition) built in-row over `w`. Shared by the
    * batch operator and the streaming gate so the feature space cannot
    * drift.
    */
  def dsirFeatures: org.apache.spark.sql.Column =
    concat(col("w"), expr(
      "IF(size(w) >= 2, transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1])), " +
        "array())"))

  /** The per-bucket log2 importance ratios as a plain array (index =
    * bucket), collected ONCE from the batch histograms — the "nightly
    * table" a streaming admission gate ships as a literal (the same move
    * the Bloom decontaminator makes with its one-blob sketch).
    */
  def dsirBucketLogRatios(t: Tables): Array[Double] = {
    val feats = Dedup.withWords(t.documents)
      .select(col("doc_id"), explode(dsirFeatures).as("f"))
      .select(
        pmod(Dedup.portableHash(col("f")), lit(dsirBuckets.toLong)).as("b"),
        (col("doc_id") % dsirTargetMod === 0).as("is_target"))
    val counts = feats.groupBy("b")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("t_b"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("s_b"))
      .collect().map(r => r.getAs[Long]("b") ->
        (r.getAs[Long]("t_b"), r.getAs[Long]("s_b"))).toMap
    val tt = counts.values.map(_._1).sum
    val ts = counts.values.map(_._2).sum
    Array.tabulate(dsirBuckets) { b =>
      val (tb, sb) = counts.getOrElse(b.toLong, (0L, 0L))
      // per-TERM ln/ln(2), not (lnT - lnS)/ln(2): the batch dim's
      // log(2.0, x) evaluates ln(x)/ln(2) per term, and matching that
      // rounding exactly leaves fold order as the gate's ONLY drift
      math.log((tb + 1).toDouble / (tt + dsirBuckets)) / math.log(2.0) -
        math.log((sb + 1).toDouble / (ts + dsirBuckets)) / math.log(2.0)
    }
  }

  def dsirImportance(t: Tables): DataFrame =
    dsirScores(t).orderBy(col("doc_id"))

  /** The unsorted score frame — chain consumers (`curationLlm`) join
    * this by doc_id, where the presentation sort would only add an
    * exchange nothing reads.
    */
  private[operators] def dsirScores(t: Tables): DataFrame = {
    val feats = Dedup.withWords(t.documents)
      .select(col("doc_id"), explode(dsirFeatures).as("f"))
      .select(col("doc_id"),
        pmod(Dedup.portableHash(col("f")), lit(dsirBuckets.toLong)).as("b"),
        (col("doc_id") % dsirTargetMod === 0).as("is_target"))
    val counts = feats.groupBy("b")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("t_b"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("s_b"))
    val totals = counts.agg(sum(col("t_b")).as("tt"), sum(col("s_b")).as("ts"))
    val dim = broadcast(counts.crossJoin(broadcast(totals))
      .select(col("b"),
        (log(2.0, (col("t_b") + 1).cast("double") / (col("tt") + dsirBuckets)) -
          log(2.0, (col("s_b") + 1).cast("double") / (col("ts") + dsirBuckets))).as("lr")))
    feats.filter(!col("is_target"))
      .join(dim, "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("logw"))
      .select(col("doc_id"), col("n_feats"),
        (floor(col("logw") * 100) / 100).as("log_weight"))
      .withColumn("selected", col("log_weight") >= 0.0)
  }

  // ---- BM25 lexical retrieval ----

  /** BM25 shape parameters — the Robertson/Spärck Jones defaults. */
  val bm25K1 = 1.2
  val bm25B = 0.75

  /** Query-by-example set: the first `bm25NQueries` documents retrieve
    * their top-`bm25TopK` lexical neighbors from the corpus (the
    * decontamination-retrieval framing: "which training docs does this
    * eval doc most resemble lexically?").
    */
  val bm25NQueries = 5L
  val bm25TopK = 5

  /** text_bm25_topk — BM25 lexical retrieval over the corpus: for each
    * query document, the top-k corpus documents by summed per-term BM25
    * contributions over the query's distinct terms.
    *
    * Two deliberate, documented deviations from the textbook formula,
    * both FOR determinism and scale:
    *  - idf is the RATIONAL odds form (N - df + 0.5) / (df + 0.5), not
    *    its log — the ranking must be bit-identical across engines and
    *    `log` is the one libm call with no cross-engine guarantee (the
    *    qualityClassifier rational-only discipline). Monotone in df like
    *    the log form, so per-term ordering is preserved.
    *  - each term's contribution is floor-quantized to micro-units
    *    (×1e6, BIGINT) BEFORE summation: integer sums are exact and
    *    order-independent, so the ranking cannot depend on aggregation
    *    order — a double sum across a shuffle could flip near-ties
    *    between engines.
    * No df cap is applied: the rational idf already collapses toward
    * ~0.5/df for corpus-wide terms, so common-term contributions are
    * structurally tiny (and the synthetic corpus draws from a small
    * shared vocabulary — EVERY term is df≈0.8N there, so a stopword cap
    * would zero the operator). At 100 TB one WOULD df-cap the query
    * terms before the posting join — the PPJoin hot-key guard — because
    * a df≈N term's posting list is the corpus; that cap is a one-line
    * filter on `df` documented here rather than planted, since its
    * correct threshold is corpus-specific.
    *
    * Scale shape: ONE postings build (explode + map-side-combined
    * groupBy on (doc_id, dl, term)); the tiny distinct query-term set
    * broadcasts into a semi-join that bounds ALL downstream work by the
    * matched posting lists (df is computed from the matched postings —
    * same value as corpus-wide df per term, never a full-vocab pass);
    * the per-(query, doc) fold is a map-side-combined integer sum; the
    * top-k is one window over the query axis. Nothing touches the full
    * vocabulary and nothing is quadratic.
    */
  /** The postings index (doc_id, dl, term, tf) — the ONE tokenize +
    * term-frequency build shared by the batch retrieval and the serving
    * leg's nightly index job (`bm25ServeStream` consumes it with df
    * attached), so the two can never drift on tokenization.
    */
  private[graft] def bm25Postings(docs: DataFrame): DataFrame =
    Dedup.withWords(docs)
      .select(col("doc_id"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** The serving index: postings with per-term df attached (what the
    * nightly job persists next to the n_docs/sum_dl scalars).
    */
  def bm25PostingsWithDf(docs: DataFrame): DataFrame = {
    // materialize the postings ONCE: both the df aggregate and the join's
    // probe side consume this frame, and without the checkpoint the full
    // tokenize + tf build runs twice (ReuseExchange does not span the two
    // differing parents of a shared aggregate — the bm25Ranked lesson
    // applied to the index write path)
    val tf = graft.engine.Reliability.planCheckpoint(bm25Postings(docs))
    tf.join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), "term")
  }

  /** Buckets for the persisted lexical index layout: a term's postings
    * live in partition `portableHash(term) % buckets`, so a serving
    * probe on a term reads ONE directory — partition pruning is the
    * term routing at the storage layer (the sink_vector_index idea on
    * the lexical axis). Engine-portable hash so the oracle replays the
    * layout.
    */
  val textIndexBuckets = 16L

  /** sink_text_index — the physical build of the lexical index the
    * serving leg consumes (`bm25PostingsWithDf` + the bucket axis),
    * written partitioned by term-hash bucket: each bucket is a
    * directory, maxRecordsPerFile bounds file sizes, and salted writers
    * spread a hot bucket (a df≈N term's posting list) across tasks —
    * the Route/vector-sink write discipline. Returns per-bucket
    * readback stats re-aggregated from the STORED files (posting rows,
    * distinct terms, distinct docs, total tf), hash-checked against the
    * shared postings CTEs — the on-disk result is proven, not assumed.
    */
  /** The physical postings write shared by the index build and the
    * compaction rewrite: bucket by portable term hash (a term probe
    * prunes to one directory), salted writers spread a hot bucket,
    * maxRecordsPerFile bounds file sizes — the sink_vector_index write
    * discipline on the lexical axis. Expects (doc_id, dl, term, tf, df).
    */
  private def writePostings(postings: DataFrame, out: String,
      mode: String = "overwrite"): Unit =
    postings
      .withColumn("bucket",
        pmod(Dedup.portableHash(col("term")), lit(textIndexBuckets)))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(8)))
      .repartition(postings.sparkSession.sessionState.conf.numShufflePartitions,
        col("bucket"), col("salt"))
      .drop("salt")
      .write.mode(mode)
      .option("maxRecordsPerFile", 1000000)
      .partitionBy("bucket").parquet(out)

  /** The scalars sidecar persisted beside a postings directory: one
    * (n_docs, sum_dl) row per write. The upsert APPENDS a delta row
    * instead of rewriting (the corpus_stats_inc fold at the storage
    * layer); readers aggregate `sum` over the rows, so base + deltas
    * always reads as the current corpus totals with no rewrite.
    */
  private def writeScalars(docs: DataFrame, out: String,
      mode: String = "overwrite"): Unit =
    Dedup.withWords(docs)
      .select(size(col("w")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1).write.mode(mode).parquet(out)

  /** Per-bucket readback stats over a stored postings directory — the
    * shared face the build and the compaction return, so their oracles
    * share one SQL builder (the readIndexStats discipline).
    */
  private def readTextIndexStats(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("tf")).as("sum_tf"))
      .orderBy(col("bucket"))

  def textIndexSink(t: Tables, outDir: Option[String] = None): DataFrame = {
    val out = outDir match {
      case Some(d) => writePostings(bm25PostingsWithDf(t.documents), d); d
      case None =>
        // the registered nightly build REBUILDS the session's ensured
        // artifact (the dupGroupsSink discipline): bench always prices
        // the build under this key, and the suite's serve faces then
        // read the artifact it refreshed — one build per axis, not a
        // duplicate scratch copy beside the ensured one
        val dir = graft.engine.ArtifactCache.rebuild(
          "tindex", textIndexFp(t))(writeTextIndex(t, _))
        s"$dir/postings"
    }
    // materialize before returning (the pqAdcTopKStored discipline): the
    // deterministic directory is overwritten per run
    graft.engine.Reliability.planCheckpoint(readTextIndexStats(t.spark, out))
  }

  /** sink_text_index_compact — the weekly PHYSICAL maintenance of the
    * persisted lexical index: read the stored postings back, drop
    * tombstoned documents' rows (the shared `Dedup.isRetired` modulus),
    * RECOMPUTE every surviving term's df, and rewrite the directory with
    * fresh bucket/salt layout. The df recompute is the point — and the
    * asymmetry with the vector index's cheap append-upsert: a PQ code
    * row depends only on its own vector, so deletes just remove rows;
    * a df-bearing posting depends on EVERY OTHER document containing
    * the term, so retiring one document invalidates the stored df of
    * each of its terms corpus-wide. A naive append/delete "upsert" of
    * this index is therefore structurally WRONG (stale df skews every
    * BM25 idf) — the lexical axis maintains by periodic rewrite, with
    * the serve path free to recompute df live from postings between
    * rewrites. Returns the same per-bucket readback stats as
    * `sink_text_index`; the oracle restricts the shared postings CTEs
    * to live documents, so a hash match proves compacted ==
    * from-scratch-on-live-docs. The spec additionally pins that no
    * retired doc survives in the stored files and that every stored df
    * equals its term's actual posting count.
    *
    * Scale shape: one scan of the stored postings (never the raw text),
    * one vocabulary-axis groupBy for the df refresh, one (bucket, salt)
    * shuffle, one write; the stats face is map-side-combined. The index
    * being maintained is the SESSION'S ENSURED artifact (`textIndexDir` —
    * in production it already exists on disk), read strictly read-only;
    * the compacted output goes to its own fingerprint-keyed directory
    * (or `outDir` when a spec isolates), so the timed body is the true
    * weekly maintenance, not a rebuild a production store already paid.
    */
  def textIndexCompact(t: Tables, outDir: Option[String] = None): DataFrame = {
    val src = textIndexDir(t) // ensured base artifact, read-only
    def maintain(out: String): Unit = {
      val live = t.spark.read.parquet(s"$src/postings")
        .filter(!Dedup.isRetired(col("doc_id")))
      val refreshed = live.drop("df")
        .join(live.groupBy("term").agg(count(lit(1)).as("df")), "term")
        .select(col("doc_id"), col("dl"), col("term"), col("tf"), col("df"))
      writePostings(refreshed, out)
    }
    val dir = outDir match {
      case Some(d) => maintain(d); d
      case None => graft.engine.ArtifactCache.rebuild(
        "tindex_compact", textIndexFp(t))(maintain)
    }
    // materialize before returning (the pqAdcTopKStored discipline)
    graft.engine.Reliability.planCheckpoint(readTextIndexStats(t.spark, dir))
  }

  /** The upserted-index write shared by `sink_text_index_upsert` and the
    * fresh-serve face: nightly base build from the pre-delta corpus
    * (postings WITH df, one scalars row), then the day's delta docs'
    * postings APPENDED with df NULL — honestly absent, because a
    * df-bearing posting depends on every other document containing the
    * term (the `textIndexCompact` asymmetry): the delta invalidates the
    * BASE rows' stored df too, so writing any number for the delta's df
    * would only dress up a value nothing may read. Between weekly
    * rewrites the serve path recomputes df live from matched postings
    * (`bm25RankedFromStoredFresh`) and reads corpus totals as the SUM of
    * sidecar rows (base + delta — the corpus_stats_inc fold).
    */
  private def writeUpsertedIndex(t: Tables, base: String): Unit = {
    // the nightly base index is the session's ensured PRE-DELTA artifact
    // (in production it already exists on disk and the append happens in
    // place); the registered face must not mutate the shared artifact, so
    // it hard-links the base into its own directory (zero-copy — see
    // ArtifactCache.cloneDir) and appends the delta there. Only the delta
    // is ever tokenized.
    val src = baseTextIndexDir(t)
    graft.engine.ArtifactCache.cloneDir(s"$src/postings", base)
    graft.engine.ArtifactCache.cloneDir(s"$src/scalars", s"${base}__scalars")
    val mx = t.documents.agg(max(col("doc_id")).as("max_id"))
    val deltaDocs = t.documents.crossJoin(broadcast(mx))
      .filter(Dedup.incIsDelta(col("doc_id"), col("max_id"))).drop("max_id")
    writePostings(
      bm25Postings(deltaDocs).withColumn("df", lit(null).cast("long")),
      base, "append")
    writeScalars(deltaDocs, s"${base}__scalars", "append")
  }

  /** sink_text_index_upsert — the DAILY maintenance leg of the persisted
    * lexical index (the vector index's `sink_vector_index_upsert` move on
    * the lexical axis, honest about the df asymmetry): the day's delta
    * documents' postings are encoded alone and APPENDED into the same
    * bucket layout (new files inside each touched term-hash partition —
    * no rewrite of existing files), with df NULL (see
    * `writeUpsertedIndex`); the scalars sidecar gets one appended delta
    * row. Returns the same per-bucket readback stats as `sink_text_index`
    * and shares its oracle — the stats face never reads df, so a hash
    * match PROVES base ∪ delta append equals the from-scratch full build
    * on the posting rows. df freshness between rewrites is the serve
    * face's job (`text_bm25_stored_fresh` — oracle-proven equal to the
    * in-plan truth) and the weekly `sink_text_index_compact` rewrite
    * restores stored df.
    *
    * Scale shape: the base never rewrites; delta work is |delta| tokenize
    * + one (bucket, salt) shuffle of delta postings; the stats face is a
    * map-side-combined groupBy on the bucket axis.
    */
  def textIndexUpsert(t: Tables, outDir: Option[String] = None): DataFrame = {
    val base = outDir match {
      case Some(d) => writeUpsertedIndex(t, d); d
      case None =>
        // the registered daily job: always re-runs the upsert (rebuild),
        // into the same fingerprint-keyed day-old-index directory the
        // between-rewrites serve faces ensure
        val dir = graft.engine.ArtifactCache.rebuild(
          "tindex_day", textIndexFp(t))(d => writeUpsertedIndex(t, s"$d/idx"))
        s"$dir/idx"
    }
    graft.engine.Reliability.planCheckpoint(readTextIndexStats(t.spark, base))
  }

  /** The shared BM25 scoring columns — ONE expression tree for the batch
    * operator and the streaming serve leg (bit-equality across the two
    * faces requires the identical IEEE op sequence). Each expects the
    * named inputs (`n_docs`, `df`, `dl`, `sum_dl`, `tf`, `dl_ratio`,
    * `idf`, `tfn`) to be in scope as columns.
    */
  private[graft] def bm25Idf: org.apache.spark.sql.Column =
    ((col("n_docs") - col("df")).cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
  private[graft] def bm25DlRatio: org.apache.spark.sql.Column =
    col("dl").cast("double") / (col("sum_dl").cast("double") / col("n_docs"))
  private[graft] def bm25Tfn: org.apache.spark.sql.Column =
    col("tf").cast("double") * (bm25K1 + 1.0) /
      (col("tf").cast("double") +
        lit(bm25K1) * (lit(1.0 - bm25B) + lit(bm25B) * col("dl_ratio")))
  private[graft] def bm25ContribQ6: org.apache.spark.sql.Column =
    floor(col("idf") * col("tfn") * 1000000.0).cast("long")

  /** BM25 FULL ranking per query — the unsorted internal face (no rank
    * cut, no orderBy) shared by the registered `bm25TopKDocs` and the
    * hybrid-retrieval lexical leg (which takes a deeper shortlist).
    * Yields (query_id, doc_id, rank, n_terms, score_q6).
    */
  private[graft] def bm25Ranked(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = bm25Postings(t.documents)
    val scalars = Dedup.withWords(t.documents)
      .select(size(col("w")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // distinct query terms — benchmark-sized, broadcast; the semi-join
    // keeps only matched posting lists in play from here on
    val qterms = tf.filter(col("doc_id") < bm25NQueries)
      .select(col("term")).distinct()
    // materialize the matched postings ONCE: both df and the scoring join
    // consume this frame, and without the checkpoint the full postings
    // build runs twice (exchange reuse does not span the differing
    // aggregates). Bounded by the matched posting lists, not the corpus.
    val tfq = graft.engine.Reliability.planCheckpoint(
      tf.join(broadcast(qterms), "term"))
    val df = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = tf.filter(col("doc_id") < bm25NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val contrib = tfq
      .join(broadcast(q), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(df), "term")
      .crossJoin(broadcast(scalars))
      .withColumn("idf", bm25Idf)
      .withColumn("dl_ratio", bm25DlRatio)
      .withColumn("tfn", bm25Tfn)
      .withColumn("c_q6", bm25ContribQ6)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q6").desc, col("doc_id").asc)
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_q6")).as("score_q6"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
  }

  def bm25TopKDocs(t: Tables): DataFrame =
    bm25Ranked(t).filter(col("rank") <= bm25TopK)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("n_terms"), col("score_q6"))
      .orderBy(col("query_id"), col("rank"))

  // ---- Hybrid retrieval (lexical + vector fusion) ----

  /** RRF smoothing constant — Cormack, Clarke & Buettcher (SIGIR 2009)
    * fix k=60 and report it insensitive; kept at the published value.
    */
  val rrfK = 60L

  /** Per-leg shortlist depth feeding the fusion (deeper than the final
    * k so a doc ranked just off one leg's top-k can still win fused).
    */
  val rrfDepth = 10

  /** Final fused top-k per query. */
  val rrfTopK = 5

  /** retrieval_hybrid_rrf — Reciprocal Rank Fusion (Cormack et al.,
    * SIGIR 2009) over the two retrieval legs this engine serves: the
    * BM25 lexical ranking and the exact-cosine vector ranking, fused as
    * score(d) = Σ_legs 1/(k + rank_leg(d)) — THE production hybrid-
    * search pattern (every lexical+vector deployment ships some form of
    * it), chosen over score normalization because it needs no
    * cross-leg score calibration: only ranks enter the fusion.
    *
    * Determinism design: each leg's contribution is the INTEGER
    * division 1000000 div (k + rank) — ranks are integers and integer
    * division is exact on both engines, so the fused score is an exact
    * integer sum (the bm25 micro-unit discipline taken to its limit:
    * no float exists anywhere in the fusion). Ties break on doc_id.
    * The two legs share the documents/embeddings id axis (the
    * embeddings table carries the documents' vectors), and the query
    * set is ids < bm25NQueries on BOTH legs.
    *
    * Scale shape: each leg is its own audited plan (BM25: broadcast
    * query-term semi-join bounds all work by matched posting lists;
    * cosine: broadcast query side, one candidate-axis window); the
    * fusion itself joins two Q×depth frames — config-sized, nothing
    * corpus-scale touches the fused axis. A missing leg contributes 0
    * via the outer join (a doc need only appear in one shortlist).
    */
  def hybridRrf(t: Tables): DataFrame = {
    val lex = bm25Ranked(t).filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("lex_rank"))
    val vec = Sim.cosineRanked(t, bm25NQueries)
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    rrfFuse(lex, vec)
  }

  /** The RRF fusion stage — ONE implementation shared by the in-plan
    * hybrid (`hybridRrf`) and the stored-index hybrid (`hybridRrfStored`),
    * so the two faces cannot drift on the fusion arithmetic. Expects each
    * leg already cut to `rrfDepth`: (query_id, doc_id, lex_rank) and
    * (query_id, doc_id, vec_rank).
    */
  private[graft] def rrfFuse(lex: DataFrame, vec: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_q6",
        coalesce(expr(s"1000000L div (${rrfK}L + lex_rank)"), lit(0L)) +
        coalesce(expr(s"1000000L div (${rrfK}L + vec_rank)"), lit(0L)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_q6").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= rrfTopK)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("lex_rank"), col("vec_rank"), col("rrf_q6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The BM25 FULL ranking served from a STORED postings directory (the
    * `sink_text_index` layout: doc_id, dl, term, tf, df, bucket) plus the
    * scalars sidecar the nightly build persists beside it — the lexical
    * leg of `retrieval_hybrid_rrf_stored`. Query terms come from the
    * INDEX itself (the query docs' own postings rows — the identical
    * distinct-(doc, term) set the in-plan build derives), df/dl/tf are
    * the STORED values, and the scoring columns are the shared
    * `bm25Idf`/`bm25DlRatio`/`bm25Tfn`/`bm25ContribQ6` expressions — the
    * identical IEEE op sequence, so stored-served ranks are bit-equal to
    * the in-plan `bm25Ranked`.
    */
  private[graft] def bm25RankedFromStored(stored: DataFrame,
      scalars: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = stored.filter(col("doc_id") < bm25NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val contrib = stored
      .join(broadcast(q), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", bm25Idf)
      .withColumn("dl_ratio", bm25DlRatio)
      .withColumn("tfn", bm25Tfn)
      .withColumn("c_q6", bm25ContribQ6)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q6").desc, col("doc_id").asc)
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_q6")).as("score_q6"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
  }

  /** The FRESH-df BM25 ranking over an UPSERTED postings directory — the
    * serve face that runs between weekly rewrites, when appended delta
    * postings have made every stored df stale (and the delta's own df is
    * NULL by design). The stored df column is NEVER read: per-term df is
    * recomputed live from the matched postings — the `bm25Ranked`
    * df-from-matched-postings move, so the recompute is bounded by the
    * query's posting lists, never a full-vocabulary pass — and the corpus
    * scalars read as the SUM of the sidecar's base + delta rows. Scoring
    * columns are the shared expressions ⇒ fresh-served ranks are
    * bit-equal to the in-plan `bm25Ranked` over the full corpus, which is
    * exactly the freshness claim: serving between rewrites never reads a
    * stale df.
    */
  private[graft] def bm25RankedFromStoredFresh(stored: DataFrame,
      sidecar: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scalars = sidecar
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val qterms = stored.filter(col("doc_id") < bm25NQueries)
      .select(col("term")).distinct()
    // one matched-postings materialization feeds df + scoring (the
    // bm25Ranked checkpoint discipline); stored df is dropped UNREAD
    val tfq = graft.engine.Reliability.planCheckpoint(
      stored.drop("df").join(broadcast(qterms), "term"))
    val df = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = tfq.filter(col("doc_id") < bm25NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val contrib = tfq
      .join(broadcast(q), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(df), "term")
      .crossJoin(broadcast(scalars))
      .withColumn("idf", bm25Idf)
      .withColumn("dl_ratio", bm25DlRatio)
      .withColumn("tfn", bm25Tfn)
      .withColumn("c_q6", bm25ContribQ6)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q6").desc, col("doc_id").asc)
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_q6")).as("score_q6"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
  }

  /** text_bm25_stored_fresh — the registered end-to-end form of serving
    * between rewrites: write the upserted index (base + appended delta,
    * stale/NULL stored df), then answer the standard BM25 top-k reading
    * ONLY the stored files through the fresh-df face. Shares
    * `text_bm25_topk`'s oracle — the hash match PROVES a day-old index
    * served fresh equals the in-plan truth over the full corpus, i.e. the
    * daily append loses nothing a reader can observe (the
    * corpus_stats_inc rule applied to retrieval). The day-old index is
    * the session's ENSURED one (`upsertedTextIndexDir` — the daily job
    * already ran; a solo run still stands alone by building it on first
    * touch), so this face prices what the between-rewrites serving tier
    * pays per query batch: fresh-df math over the stored files.
    */
  def bm25TopKStoredFresh(t: Tables): DataFrame = {
    val dir = s"${upsertedTextIndexDir(t)}/idx"
    val spark = t.spark
    graft.engine.Reliability.planCheckpoint(
      bm25RankedFromStoredFresh(
          spark.read.parquet(dir), spark.read.parquet(s"${dir}__scalars"))
        .filter(col("rank") <= bm25TopK)
        .select(col("query_id"), col("doc_id"), col("rank"),
          col("n_terms"), col("score_q6"))
        .orderBy(col("query_id"), col("rank")))
  }

  /** retrieval_hybrid_rrf_stored_fresh — the MID-DAY hybrid: the same RRF
    * fusion as `retrieval_hybrid_rrf_stored`, but both legs served from
    * DAY-OLD (upserted, not-yet-rewritten) indexes — the state a serving
    * tier actually lives in between weekly rewrites. The lexical leg
    * reads the UPSERTED postings (base + appended delta, stored df
    * provably stale / NULL) through the fresh-df face
    * (`bm25RankedFromStoredFresh` — stored df never read, scalars = the
    * sidecar SUM); the vector leg is the same IVF∘ADC probe over the
    * UPSERTED code table (`sink_vector_index_upsert`'s layout — codes
    * are per-vector facts, so the append IS the truth). SAME oracle as
    * `retrieval_hybrid_rrf_stored`: the hash match proves serving from
    * day-old indexes loses NOTHING a reader can observe — the composed
    * closing proof of the round's two index-maintenance stories.
    */
  def hybridRrfStoredFresh(t: Tables): DataFrame = {
    // both day-old indexes are the session's ensured artifacts (the
    // daily upsert jobs already ran; a solo run builds them on first
    // touch) — this face prices the mid-day SERVE math, the state a
    // serving tier actually lives in between weekly rewrites
    val tOut = s"${upsertedTextIndexDir(t)}/idx"
    val vOut = s"${Sim.upsertedVectorIndexDir(t)}/idx"
    val spark = t.spark
    val lex = bm25RankedFromStoredFresh(
        spark.read.parquet(tOut), spark.read.parquet(s"${tOut}__scalars"))
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("lex_rank"))
    val vec = Sim.ivfPqRankedFromStored(t, spark.read.parquet(vOut), bm25NQueries)
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    graft.engine.Reliability.planCheckpoint(rrfFuse(lex, vec))
  }

  /** retrieval_audit — the dedup_audit discipline applied to search: one
    * summary frame scoring the approximate retrieval stack against its
    * own accuracy ceilings, the numbers a production deployment reads
    * BEFORE trusting an index (FAISS's recall@k evaluation, run as a
    * corpus job). Five comparisons, each the top-k set overlap between
    * an approximate face and its reference face on the shared query set:
    *
    *  - adc_vs_exact    — the 4-byte-code ADC scan vs exact cosine: what
    *                      the PQ compression costs.
    *  - ivfpq_vs_adc    — IVF routing vs the full ADC scan: what probing
    *                      `ivfPqProbes` lists instead of all costs.
    *  - refine_vs_exact — the ADC→exact rerank vs exact: what the refine
    *                      stage RECOVERS (its point is ≥ adc_vs_exact).
    *  - hybrid_vs_lex / hybrid_vs_vec — RRF fusion vs each single leg:
    *                      how far the fused ranking moves from either
    *                      (1.0 would mean one leg dominates — fusion
    *                      doing nothing).
    *
    * All overlaps are INTEGER counts over rank-cut sets (the legs' own
    * deterministic rankings) ⇒ hash-exact; the floored ratio divides by
    * the constant n_queries × k, so degenerate corpora yield 0 counts,
    * never NULL or a crash. Oracle composes the SAME chain builders as
    * each face's standalone oracle (nested WITH per face — no shared-CTE
    * drift possible).
    *
    * Scale shape: every face is its own audited plan; the overlap joins
    * touch only Q×k-row frames (config-sized). The cut faces are
    * persisted so the union's branches don't recompute them. At 100 TB
    * this runs on a sampled query set — the plan is identical, only the
    * query filter changes (the dedup_audit rule).
    */
  def retrievalAudit(t: Tables): DataFrame = {
    val (plan, caches) = retrievalAuditPlan(t)
    // materialize the (5-row) summary so the three shortlist caches can be
    // released instead of leaking blocks for the rest of a 190-query session
    val res = graft.engine.Reliability.planCheckpoint(plan)
    caches.foreach(_.unpersist())
    res
  }

  /** The audit's LAZY plan + its shortlist caches (PlanAuditSpec pins the
    * join structure here — the registered face truncates the plan when it
    * materializes, which would hide the joins from the pin).
    */
  private[graft] def retrievalAuditPlan(t: Tables)
      : (DataFrame, Seq[DataFrame]) = {
    // Fold each expensive leg ONCE per audit invocation (guide §1.2 "don't
    // compute things twice"): before r13-opt the audit ran cosineRanked 3×
    // (exact5, the hybrid vec leg, the refine exact leg's query frame),
    // bm25Ranked 2× (the lex compare leg + the hybrid lex leg) and the
    // stage-1 ADC code-table scan 2× (the adc face + the refine
    // shortlist). Ranks are per-query (every ranking window partitions by
    // query_id) and rank cuts nest, so the deepest-cut frame serves every
    // shallower consumer by a plain filter — bit-identical rows.
    // planCheckpoint, not persist: a persist() here pays the columnar
    // cache build and serializes concurrent branch reads on the cache
    // locks (measured as run-time inflation at r13-opt). Footprints:
    // cosDeep/bmDeep are Q×depth rows (free); adcSc is Q×|corpus| rows —
    // linear in the corpus and held in executor block stores until
    // ContextCleaner GC, which is why the registered face eagerly
    // materializes its 5-row summary and releases the caches. At 100 TB
    // the audit runs on a sampled query set (the scale note below), so
    // Q×|corpus| stays a bounded slice, and a reliable checkpoint dir
    // (spark.graft.checkpointDir) moves the blocks off-executor.
    val cosDeep = graft.engine.Reliability.planCheckpoint(
      Sim.cosineRanked(t, Sim.nQueries)
        .filter(col("rank") <= math.max(Sim.topK, rrfDepth)))
    val bmDeep = graft.engine.Reliability.planCheckpoint(
      bm25Ranked(t).filter(col("rank") <= math.max(bm25TopK, rrfDepth)))
    // ONE code-table scan per audit: the adc legs and the ivfpq leg share
    // the checkpointed (vec_id, m, code) table (r14 — before, the ivfpq
    // leg re-ran the whole PQ encode pass the adc leg had just done)
    val codes = graft.engine.Reliability.planCheckpoint(Sim.pqDataCodes(t))
    val adcSc = graft.engine.Reliability.planCheckpoint(
      Sim.adcScores(Sim.adcLookupsFrom(t, codes)))
    val exact5 = cosDeep.filter(col("rank") <= Sim.topK)
      .select(col("query_id"), col("neighbor_id").as("nid"))
    val adc = Sim.adcRankFromScores(adcSc)
      .select(col("query_id"), col("neighbor_id").as("nid"))
    val hyb = rrfFuse(
        bmDeep.filter(col("rank") <= rrfDepth)
          .select(col("query_id"), col("doc_id"),
            col("rank").cast("long").as("lex_rank")),
        cosDeep.filter(col("query_id") < bm25NQueries && col("rank") <= rrfDepth)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank").cast("long").as("vec_rank")))
      .select(col("query_id"), col("doc_id").as("nid")).persist()
    // (hyb keeps the original persist: rrfFuse adds a window on top of the
    // checkpointed legs and two overlap branches read the fused rows)
    // each comparison carries ITS OWN cut depth (the hybrid sets are cut
    // at rrfTopK, the lexical leg at bm25TopK — all 5 today, but a
    // constant drift must change the reported k and ratio, not silently
    // mislabel them)
    def overlap(metric: String, nq: Long, k: Long, a: DataFrame, b: DataFrame)
        : DataFrame =
      a.join(b, Seq("query_id", "nid"))
        .agg(count(lit(1)).as("n_agree"))
        .select(lit(metric).as("metric"), lit(nq).as("n_queries"),
          lit(k).as("k"), col("n_agree"),
          (floor(col("n_agree") * 10000.0 / (nq * k)) / 10000)
            .as("overlap_at_k"))
    val rows = Seq(
      overlap("adc_vs_exact", Sim.nQueries, Sim.topK, adc, exact5),
      overlap("ivfpq_vs_adc", Sim.nQueries, Sim.topK,
        Sim.ivfPqTopKFrom(t, codes)
          .select(col("query_id"), col("neighbor_id").as("nid")),
        adc),
      overlap("refine_vs_exact", Sim.nQueries, Sim.topK,
        Sim.adcRefineFromScores(t, adcSc)
          .select(col("query_id"), col("neighbor_id").as("nid")),
        exact5),
      overlap("hybrid_vs_lex", bm25NQueries, math.min(rrfTopK, bm25TopK), hyb,
        bmDeep.filter(col("rank") <= bm25TopK)
          .select(col("query_id"), col("doc_id").as("nid"))),
      overlap("hybrid_vs_vec", bm25NQueries, math.min(rrfTopK, Sim.topK), hyb,
        exact5.filter(col("query_id") < bm25NQueries)))
    (rows.reduce(_ unionByName _).orderBy(col("metric")),
      Seq(hyb))
  }

  /** NDCG cut depth — matches every face's registered top-k, so the eval
    * scores exactly what the faces serve.
    */
  val ndcgK = 5

  /** Per-position DCG discounts as micro-unit integers:
    * d_i = floor(1e6 / log2(i + 1)), computed ONCE here and interpolated
    * into BOTH plans as integer literals (the bm25 shape-constants move —
    * log2 never runs inside either engine, so the one libm call with no
    * cross-engine guarantee is evaluated exactly once, on the driver).
    */
  private[graft] val ndcgDiscQ6: Seq[Long] =
    (1 to ndcgK).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Graded relevance judgments, SYSTEM-INDEPENDENT (the circularity
    * rule: ground truth must not be derived from any system under
    * evaluation): lexical 3-shingle Jaccard between each query doc and
    * every other doc, graded in ALL-INTEGER arithmetic —
    * rel 3 ⇔ j ≥ 1/25 (shared×25 ≥ union), rel 2 ⇔ j ≥ 1/50,
    * rel 1 ⇔ j ≥ 1/100 — no float ever compares against a threshold, so
    * the grade cannot flip cross-engine. The thresholds are TUNED TO THE
    * SYNTHETIC CORPUS's similarity range (query-doc jaccard tops out
    * ≈ 0.04 at sf0.01 — a 0-pair judgment list would make every DCG a
    * vacuous zero, the text_bm25_topk 0-row lesson); a real deployment
    * replaces this generator with human/LLM labels of the same schema.
    * Shares `Dedup.shingles`'s builder semantics (distinct per-doc
    * 3-grams).
    *
    * Scale shape: the query side is Q docs — its shingle set broadcasts;
    * the shared-count groupBy is bounded by matched shingle rows (≤ Q×N,
    * map-side combined); one corpus-axis join attaches per-doc shingle
    * counts. At 100 TB judgments come from human/LLM labels — same
    * schema, this generator is the deterministic stand-in.
    */
  private[graft] def relevanceJudgments(t: Tables): DataFrame = {
    val sh = Dedup.shingles(t)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    val qsh = sh.filter(col("doc_id") < bm25NQueries)
      .select(col("doc_id").as("query_id"), col("s"))
    val qcnt = cnt.filter(col("doc_id") < bm25NQueries)
      .select(col("doc_id").as("query_id"), col("c").as("qc"))
    sh.join(broadcast(qsh), "s")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .join(cnt, "doc_id")
      .join(broadcast(qcnt), "query_id")
      .withColumn("uni", col("c") + col("qc") - col("shared"))
      .withColumn("rel",
        when(col("shared") * 25 >= col("uni"), 3L)
          .when(col("shared") * 50 >= col("uni"), 2L)
          .when(col("shared") * 100 >= col("uni"), 1L)
          .otherwise(0L))
      .filter(col("rel") > 0)
      .select(col("query_id"), col("doc_id"), col("rel"))
  }

  /** retrieval_eval_ndcg — ABSOLUTE retrieval quality (retrieval_audit
    * measures agreement between faces; this measures each face against
    * graded ground truth): NDCG@k per (system, query) for the three
    * serving systems — BM25, exact cosine, hybrid RRF — against the
    * system-independent judgments. DCG = Σ rel_i × d_i with the
    * micro-unit integer discounts (`ndcgDiscQ6`), IDCG from the ideal
    * (rel desc, doc_id asc) ordering of the query's judged docs — both
    * exact integer sums; the only division is the final floored ratio
    * over a positive IDCG (NULL when a query has no judged docs — the
    * dedup_audit rule). This is the op a deployment runs on its judgment
    * list before and after every index/ranker change.
    */
  def retrievalEvalNdcg(t: Tables): DataFrame =
    ndcgScored(t, relevanceJudgments(t))

  /** Id base for the planted docs/vectors (far above any corpus id). */
  val plantedBase = 1000000L

  /** Component count kept per planted-vector variant (rest zeroed):
    * cos(q, planted_v) decreases with v, so the vector systems see three
    * well-separated relevance tiers.
    */
  val plantedDims = Seq(48, 32, 16)

  /** The planted twin corpus (the sim_ann_project_rerank move applied to
    * evaluation): for each query doc q, three planted documents with
    * KNOWN relevance — v1 is q's words repeated 4× (a verbatim copy with
    * saturated term frequencies: a 1× copy only TIES q's own tf profile
    * and on a rare-term-free query ranked 7th behind corpus docs with
    * luckier tf draws; repetition raises every term's tfn toward its k1+1
    * ceiling, so v1 dominates any doc that merely matches q's profile),
    * v2 every 2nd word, v3 every 4th (EVEN index sampling, not a prefix:
    * the corpus plants its rare high-idf topic tokens anywhere in the
    * doc, and a prefix slice silently drops a tail token — the round-10
    * lesson) — and three planted vectors keeping the first
    * `plantedDims(v-1)` components of q's embedding with the rest zeroed
    * (x*0 keeps the element type and is exact on finite inputs ⇒ graded
    * cosine tiers for the vector systems). All arithmetic is integer
    * index sampling / float zeroing, replayed verbatim by the oracle.
    */
  private[graft] def plantedTables(t: Tables): Tables = {
    val qdocs = Dedup.withWords(t.documents)
      .filter(col("doc_id") < bm25NQueries)
    val keepWords = Map(
      1 -> "flatten(array_repeat(w, 4))",
      2 -> "filter(w, (x, i) -> i % 2 = 0)",
      3 -> "filter(w, (x, i) -> i % 4 = 0)")
    val pdocs = (1 to 3).map { v =>
      qdocs.select(
        (lit(plantedBase) + col("doc_id") * 10 + v).as("doc_id"),
        concat_ws(" ", expr(keepWords(v))).as("text"))
    }.reduce(_ unionByName _)
    val docs2 = t.documents.select(col("doc_id"), col("text"))
      .unionByName(pdocs)
    val qemb = t.embeddings.filter(col("vec_id") < bm25NQueries)
    val pembs = (1 to 3).map { v =>
      val k = plantedDims(v - 1)
      qemb.select(
        (lit(plantedBase) + col("vec_id") * 10 + v).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> IF(i < $k, x, x * 0))")
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    val emb2 = t.embeddings.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(pembs)
    new Tables(t.spark, t.dir) {
      override def documents: DataFrame = docs2
      override def embeddings: DataFrame = emb2
    }
  }

  /** The planted slice's judgments are CONSTRUCTED, not measured: the
    * plant design fixes rel(q, planted_v) = 4 - v (the human/LLM-label
    * stand-in with labels known by construction). System-independent by
    * definition — no system's output enters the table.
    */
  private[graft] def plantedJudgments(t: Tables): DataFrame =
    (1 to 3).map { v =>
      t.documents.filter(col("doc_id") < bm25NQueries)
        .select(col("doc_id").as("query_id"),
          (lit(plantedBase) + col("doc_id") * 10 + v).as("doc_id"),
          lit(4L - v).as("rel"))
    }.reduce(_ unionByName _)

  /** retrieval_eval_ndcg_planted — the DISCRIMINATING retrieval eval: the
    * corpus-measured judgments of `retrieval_eval_ndcg` are honest but
    * near-vacuous for the bm25/ivfpq systems on the shuffled-vocabulary
    * synthetic corpus (all-zero NDCG rows — term overlap and 3-shingle
    * overlap diverge there); this face runs the SAME four systems over
    * the planted twin corpus, whose judgment list populates all three
    * grades for every query BY CONSTRUCTION. NDCG differences between
    * bm25 / cosine / hybrid / ivfpq are real signal here (spec pins
    * nonzero NDCG on every system), while the production schema —
    * (query, doc, graded rel) — is unchanged.
    */
  def retrievalEvalNdcgPlanted(t: Tables): DataFrame =
    ndcgScored(plantedTables(t), plantedJudgments(t))

  /** The NDCG@k scoring shared by the measured and planted evals: DCG /
    * IDCG as exact integer sums over the driver-computed micro-unit
    * discounts, four systems, one union.
    */
  private def ndcgScored(t: Tables, judgments: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // planCheckpoint, not persist (r14, guide §5): FIVE branches read the
    // judgments concurrently (the IDCG rank + four per-system DCG joins),
    // and concurrent InMemoryRelation readers serialize on cache locks;
    // checkpointed blocks don't. Blocks release via ContextCleaner once
    // the (4×Q-row) result below has materialized.
    val judg = graft.engine.Reliability.planCheckpoint(judgments)
    val disc = typedLit(ndcgDiscQ6)
    val idcg = judg
      .withColumn("irank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("irank") <= ndcgK)
      .groupBy(col("query_id"))
      .agg(sum(col("rel") * element_at(disc, col("irank"))).as("idcg_q6"))
    // Fold the two shared legs ONCE (the retrievalAuditPlan discipline):
    // the bm25 and cosine systems and the hybrid fusion's two legs are the
    // same rankings at different cuts — ranks are per-query and cuts nest,
    // so the deepest-cut persisted frame serves every consumer by a plain
    // filter (bit-identical rows; before r13-opt each ranking built twice).
    // localCheckpoint, not persist — Q×depth rows, see retrievalAuditPlan
    val bmDeep = graft.engine.Reliability.planCheckpoint(
      bm25Ranked(t).filter(col("rank") <= math.max(ndcgK, rrfDepth)))
    val cosDeep = graft.engine.Reliability.planCheckpoint(
      Sim.cosineRanked(t, bm25NQueries)
        .filter(col("rank") <= math.max(ndcgK, rrfDepth)))
    val systems = Seq(
      ("bm25", bmDeep.filter(col("rank") <= ndcgK)
        .select(col("query_id"), col("doc_id"), col("rank"))),
      ("cosine", cosDeep
        .filter(col("rank") <= ndcgK)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))),
      // cut every system frame to ndcgK EXPLICITLY (hybridRrf's rrfTopK
      // and ivfPqTopK's Sim.topK equal ndcgK today, but element_at(disc,
      // rank) indexes past the discount array under ANSI mode the day a
      // constant drifts — the cut must not be implicit)
      ("hybrid_rrf", rrfFuse(
          bmDeep.filter(col("rank") <= rrfDepth)
            .select(col("query_id"), col("doc_id"),
              col("rank").cast("long").as("lex_rank")),
          cosDeep.filter(col("rank") <= rrfDepth)
            .select(col("query_id"), col("neighbor_id").as("doc_id"),
              col("rank").cast("long").as("vec_rank")))
        .filter(col("rank") <= ndcgK)
        .select(col("query_id"), col("doc_id"), col("rank"))),
      // the COMPRESSED serving path: what the 4-byte-code index a 100 TB
      // tier actually scans costs in absolute quality vs the exact legs
      // (per-query ranks are query-independent, so the nQueries→Q cut is
      // a plain filter)
      ("ivfpq", Sim.ivfPqTopK(t)
        .filter(col("query_id") < bm25NQueries && col("rank") <= ndcgK)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))))
    val out = systems.map { case (name, ranked) =>
      ranked
        .join(judg, Seq("query_id", "doc_id"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        .groupBy(col("query_id"))
        .agg(sum(col("rel") * element_at(disc, col("rank"))).as("dcg_q6"))
        .join(idcg, Seq("query_id"), "left")
        .select(lit(name).as("system"), col("query_id"), col("dcg_q6"),
          coalesce(col("idcg_q6"), lit(0L)).as("idcg_q6"),
          when(col("idcg_q6") > 0,
            floor(col("dcg_q6") * 10000.0 / col("idcg_q6")) / 10000)
            .as("ndcg_q4"))
    }.reduce(_ unionByName _).orderBy(col("system"), col("query_id"))
    // materialize the (4×Q-row) result so the judgment blocks can be
    // reclaimed instead of leaking for the rest of the session
    graft.engine.Reliability.planCheckpoint(out)
  }

  /** The session's ensured lexical-index artifact for `t`'s corpus
    * (postings WITH df + the one-row scalars sidecar) — built by the
    * first serve-only caller, reused by every later one (the
    * ArtifactCache contract; the Sim.vectorIndexDir twin on the lexical
    * axis).
    */
  private[graft] def textIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("tindex", textIndexFp(t))(
      writeTextIndex(t, _))

  /** The full-corpus lexical-index write (postings WITH df + the scalars
    * sidecar) — ONE body shared by the session ensure and the registered
    * build face, so the nightly job and the first-touch lazy build can
    * never produce different artifacts.
    */
  private def writeTextIndex(t: Tables, dir: String): Unit = {
    writePostings(bm25PostingsWithDf(t.documents), s"$dir/postings")
    writeScalars(t.documents, s"$dir/scalars")
  }

  /** The PRE-DELTA corpus' lexical index, keyed by the FULL table's
    * fingerprint + "_base" (the Dedup.baseDupGroupsDir rationale: the
    * recency split is a pure function of the corpus, and fingerprinting
    * the derived base frame would force a corpus-linear content hash
    * inside every timed upsert that just needs the base's cache key).
    */
  private[graft] def baseTextIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("tindex", textIndexFp(t) + "_base")(
      writeTextIndex(Dedup.baseTables(t), _))

  /** The document-corpus fingerprint every lexical-index artifact keys
    * on — ONE definition shared by the full-corpus, day-old and compacted
    * artifacts so no two faces can key the same corpus differently.
    */
  private def textIndexFp(t: Tables): String =
    graft.engine.ArtifactCache.fingerprint(
      t.documents, xxhash64(col("doc_id"), col("text")))

  /** The session's DAY-OLD lexical index artifact: the upserted layout
    * (`writeUpsertedIndex` — pre-delta base + appended delta with NULL
    * df) ensured once per session, so the between-rewrites serve faces
    * (`bm25TopKStoredFresh`, `hybridRrfStoredFresh`) price serve math
    * while the registered daily job (`textIndexUpsert`) always re-runs
    * the upsert against the same directory. Index files live under
    * `$dir/idx` (+ `idx__scalars`) so the sidecar stays inside the
    * fingerprint directory.
    */
  private[graft] def upsertedTextIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("tindex_day", textIndexFp(t)) { dir =>
      writeUpsertedIndex(t, s"$dir/idx")
    }

  /** text_bm25_serve — the SERVE-ONLY face of stored lexical retrieval:
    * the same ranking as `text_bm25_topk` (same oracle — stored-served is
    * bit-equal by the shared scoring expressions), read from the
    * session's ensured index artifact instead of tokenizing the corpus
    * in-query. This is what a serving tier pays per query batch: matched
    * posting lists + the broadcast scalars row, never the raw text. Run
    * solo it still stands alone: the first touch builds the artifact.
    */
  def bm25TopKServe(t: Tables): DataFrame = {
    val dir = textIndexDir(t)
    val spark = t.spark
    // materialize (the pqAdcTopKStored discipline): the ensured directory
    // is a rebuild target of sink_text_index, so a lazily returned plan
    // could race a later rebuild's delete of these files
    graft.engine.Reliability.planCheckpoint(
      bm25RankedFromStored(spark.read.parquet(s"$dir/postings"),
          spark.read.parquet(s"$dir/scalars"))
        .filter(col("rank") <= bm25TopK)
        .select(col("query_id"), col("doc_id"), col("rank"),
          col("n_terms"), col("score_q6"))
        .orderBy(col("query_id"), col("rank")))
  }

  /** retrieval_hybrid_rrf_serve — the SERVE-ONLY hybrid: identical fusion
    * and leg math to `retrieval_hybrid_rrf_stored` (same oracle), with
    * BOTH indexes read from the session's ensured artifacts instead of
    * being written inside the query. Round 9's measurements showed the
    * self-contained stored faces' cost is dominated by their inline index
    * WRITES (two full write passes on one disk — a bench artifact of
    * standing alone, not a serve-path cost); this face is the number a
    * production query tier actually runs: ~23 s at sf10 of pure serve
    * math per the round-9 decomposition, vs 108 s with the inline builds.
    */
  def hybridRrfServe(t: Tables): DataFrame = {
    val dir = textIndexDir(t)
    val spark = t.spark
    val lex = bm25RankedFromStored(spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/scalars"))
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("lex_rank"))
    val vec = Sim.ivfPqRankedFromStored(t,
        spark.read.parquet(Sim.vectorIndexDir(t)), bm25NQueries)
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    // materialize (the pqAdcTopKStored discipline): both ensured
    // directories are rebuild targets of the registered build faces
    graft.engine.Reliability.planCheckpoint(rrfFuse(lex, vec))
  }

  /** retrieval_hybrid_rrf_stored — the AT-SCALE hybrid face: the same RRF
    * fusion as `retrieval_hybrid_rrf`, but BOTH legs served from the
    * PERSISTED indexes (the production shape — a serving tier owns two
    * stored artifacts and never touches raw text or raw floats at query
    * time). The lexical leg reads `sink_text_index`'s bucketed postings
    * (+ the n_docs/sum_dl scalars sidecar the nightly build persists —
    * the bm25ServeStream literal move, made durable); the vector leg is
    * the IVF∘ADC probe of `sink_vector_index`'s code table (cluster
    * column = the partition key, so each query scans `ivfPqProbes` lists
    * of 4-byte codes). The oracle composes the SAME bm25 ranking CTEs as
    * the in-plan hybrid with the SAME ivf-pq chain as `sim_ann_ivfpq`,
    * so a hash match proves fused-from-storage == fused-from-plan on the
    * lexical leg and == the audited index math on the vector leg.
    *
    * The vector legs of the two hybrid faces DIFFER by design: in-plan
    * fuses exact cosine (the accuracy ceiling, feasible when the floats
    * are warm), stored fuses the compressed-domain IVF∘ADC ranks (what a
    * 100 TB tier actually scans); `retrieval_audit` quantifies the gap.
    *
    * Round 11: both legs read the session's ENSURED weekly artifacts
    * instead of writing fresh index copies inside the query — the build
    * cost is priced once by the registered build faces (sink_text_index /
    * sink_vector_index), and this face prices what the serving tier
    * actually pays per query batch. `retrieval_hybrid_rrf_serve` is the
    * same math by construction; the two keys stay registered because
    * their oracles pin the face from different histories (stored grew out
    * of the self-contained build+fuse form) and the spec suite compares
    * each against an INDEPENDENT path (the day-old-index fresh face).
    */
  def hybridRrfStored(t: Tables): DataFrame = {
    val dir = textIndexDir(t)
    val spark = t.spark
    val lex = bm25RankedFromStored(
        spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/scalars"))
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("lex_rank"))
    val vec = Sim.ivfPqRankedFromStored(t,
        spark.read.parquet(Sim.vectorIndexDir(t)), bm25NQueries)
      .filter(col("rank") <= rrfDepth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    // materialize (the pqAdcTopKStored discipline): both ensured
    // directories are rebuild targets of the registered build faces
    graft.engine.Reliability.planCheckpoint(rrfFuse(lex, vec))
  }
}
