package graft

import graft.operators.{Dedup, Multimodal, Sim, TextAnalysis, TrainData}
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {

  test("exact dedup groups cover every document exactly once") {
    val rows = Dedup.exact(t).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == t.documents.count())
    rows.foreach(r => assert(r.getAs[Long]("keep_id") >= 0))
  }

  test("ngram jaccard pairs are symmetric-free and within [tau, 1]") {
    val rows = Dedup.ngramJaccard(t).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= Dedup.jaccardTau - 1e-4 && j <= 1.0)
    }
  }

  test("hot shingles never generate candidates but still count in jaccard") {
    import spark.implicits._
    // 60 docs share the ubiquitous "c1 c2 c3" shingle (df=62) but are
    // otherwise unique; docs 100/101 are true near-dups. The hot shingle is
    // corpus-frequent, so it sorts LAST in every doc's df-ascending order
    // and falls outside the prefix of any doc with enough unique content —
    // no 62² candidate blowup, no spurious pairs — yet it still counts in
    // the EXACT jaccard of surviving pairs (array_intersect sees all
    // shingles, not just prefix ones).
    val filler = (1 to 60).map(i => (i.toLong, s"c1 c2 c3 f${i}a f${i}b f${i}c"))
    val dups = Seq(
      (100L, "c1 c2 c3 a b c d"),
      (101L, "c1 c2 c3 a b c e"))
    val docs = (filler ++ dups).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.ngramJaccard(t2).collect()
    assert(rows.length == 1, s"expected only the true pair: ${rows.mkString(",")}")
    assert(rows.head.getAs[Long]("da") == 100L && rows.head.getAs[Long]("db") == 101L)
    // shingles(100)={c1c2c3,c2c3a,c3ab,abc,bcd}, shingles(101) likewise with
    // bce: shared=4 INCLUDING the hot c1c2c3, union=6 -> 0.6666 (a rare-only
    // count would give 3/7=0.4285 — this pins the hot correction)
    assert(math.abs(rows.head.getAs[Double]("jaccard") - 0.6666) < 1e-9)
  }

  test("all-hot boilerplate docs are still paired (prefix filtering is exact)") {
    import spark.implicits._
    // 12 mass-replicated templates: EVERY shingle of every doc is
    // corpus-hot (df=12). A df-cap candidate generator has zero rare
    // postings to join and silently misses all 66 J=1.0 pairs; prefix
    // filtering still finds them, because a boilerplate doc's prefix IS
    // its (hot) boilerplate. The unrelated doc must stay unpaired.
    val docs = ((1 to 12).map(i => (i.toLong, "b1 b2 b3 b4 b5")) :+
      (99L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.ngramJaccard(t2).collect()
    assert(rows.length == 66, s"expected C(12,2)=66 pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Double]("jaccard") == 1.0)
      assert(r.getAs[Long]("da") < r.getAs[Long]("db") && r.getAs[Long]("db") <= 12L)
    }
  }

  test("paragraph dedup flags shared chunks as boilerplate, unique docs clean") {
    import spark.implicits._
    // 3 docs share an identical first 8-word chunk (df=3 >= paraMinDf);
    // their tails and doc 9 are unique
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, s"$boiler t1a t1b t1c t1d t1e t1f t1g t1h"),
      (2L, s"$boiler t2a t2b t2c t2d t2e t2f t2g t2h"),
      (3L, s"$boiler t3a t3b t3c t3d t3e t3f t3g t3h"),
      (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15 u16"))
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = Dedup.paragraphBoiler(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boiler"))).toMap
    assert(got(1L) == ((2L, 1L)) && got(2L) == ((2L, 1L)) && got(3L) == ((2L, 1L)))
    assert(got(9L) == ((2L, 0L)))
  }

  test("repetition signals separate degenerate from varied text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),       // one word, one bigram
      (2L, "a b c d e f"),                          // all distinct
      (3L, "x y x y x y x y"))                      // alternating pair
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = TextAnalysis.repetition(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_word_frac"), r.getAs[Double]("dup_gram_frac"),
          r.getAs[Double]("top_gram_frac"))).toMap
    assert(got(1L) == ((0.8333, 0.8, 1.0)))   // 1/6 distinct words, 1/5 grams
    assert(got(2L) == ((0.0, 0.0, 0.2)))      // everything unique, top=1/5
    // 8 words {x,y}; 7 grams: "x y"x4, "y x"x3 -> dup 5/7, top 4/7
    assert(got(3L) == ((0.75, 0.7142, 0.5714)))
  }

  test("contamination flags train docs sharing an 8-gram with the eval set") {
    import spark.implicits._
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (0L, s"$shared e1 e2 e3"),                    // eval (0 % 97 == 0)
      (1L, s"pre1 pre2 $shared post"),              // train, contaminated
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),           // train, clean
      (3L, "tiny doc"))                             // train, too short
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = TrainData.contamination(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(!got.contains(0L), "eval docs must not appear")
    assert(got(1L) == ((4, 1L, true)))
    assert(got(2L) == ((2, 0L, false)))
    assert(got(3L) == ((0, 0L, false)))
  }

  test("bloom decontamination has no false negatives and bounded false positives") {
    val exact = TrainData.contamination(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    val bloom = TrainData.contaminationBloom(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("flagged")).toMap
    assert(bloom.keySet == exact.keySet, "doc spine must match the exact pass")
    // Bloom guarantee: every exactly-contaminated doc is flagged
    val misses = exact.collect { case (id, true) if !bloom(id) => id }
    assert(misses.isEmpty, s"bloom false negatives: $misses")
    // false positives stay rare at the configured bits/items ratio
    val cleanDocs = exact.count(!_._2)
    val fps = exact.collect { case (id, false) if bloom(id) => id }
    assert(cleanDocs == 0 || fps.size.toDouble / cleanDocs <= 0.05,
      s"bloom FP rate ${fps.size}/$cleanDocs exceeds 5%")
  }

  test("sequence packing fills bins contiguously with bounded overflow") {
    val rows = TrainData.packSequences(t).collect()
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        // the assigned bin is where the doc's first token lands
        assert(r.getAs[Long]("bin") == cum / TrainData.packBudget)
        cum += r.getAs[Long]("tok")
      }
      // bins are dense: 0..max with none skipped
      val bins = sorted.map(_.getAs[Long]("bin"))
      assert(bins.distinct.sorted.sameElements(0L to bins.max))
    }
    // stats agree with the doc-level assignment
    val stats = TrainData.packSequencesStats(t).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == rows.length)
  }

  test("unigram LM scores rare-token docs higher than common-token docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common common common common common"),
      (2L, "common common common common rare1 rare2 rare3 rare4"))
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = TextAnalysis.unigramLm(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_nll")).toMap
    // doc 1: p(common)=12/16 -> nll = log2(16/12) everywhere
    assert(math.abs(got(1L) - math.floor(math.log(16.0 / 12) / math.log(2) * 100) / 100) < 1e-9)
    assert(got(2L) > got(1L), "rare tokens must raise the mean NLL")
  }

  test("int8 quantization reconstructs within tolerance and flags saturation") {
    val rows = Sim.quantize(t).collect()
    assert(rows.length == t.embeddings.count())
    rows.foreach { r =>
      // max|q| = 127 by construction of the symmetric scale -> at least one
      // saturated slot; relative L2 error of int8 stays well under 2%
      assert(r.getAs[Int]("n_saturated") >= 1)
      assert(r.getAs[Double]("rel_err") < 0.02,
        s"vec ${r.getAs[Long]("vec_id")} rel_err ${r.getAs[Double]("rel_err")}")
      assert(r.getAs[Double]("scale6") > 0)
    }
  }

  test("curation chain composes dedup, decontamination, quality gate and packing") {
    val rows = TrainData.curation(t).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    // every survivor is its exact-dedup group representative
    val keepIds = Dedup.exact(t).collect().map(_.getAs[Long]("keep_id")).toSet
    assert(ids.subsetOf(keepIds), "curation kept a non-representative duplicate")
    // no eval docs, no contaminated docs
    assert(ids.forall(_ % TrainData.contamEvalMod != 0), "eval doc leaked through")
    val contaminated = TrainData.contamination(t).collect()
      .filter(_.getAs[Boolean]("contaminated")).map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated doc leaked through")
    // quality floor holds, and packing follows the same contiguous-fill law
    rows.foreach(r => assert(r.getAs[Double]("quality") >= TrainData.curationMinQuality))
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("bin") == cum / TrainData.packBudget)
        cum += r.getAs[Long]("tok")
      }
    }
  }

  test("blocked embedding near-dup equals brute force, no nested-loop join") {
    val blocked = Sim.embeddingNearDup(t).collect()
    val brute = Sim.embeddingNearDupBrute(t).collect()
    assert(blocked.map(_.toString).toSeq == brute.map(_.toString).toSeq)
    val p = Sim.embeddingNearDup(t).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"exact near-dup still nested-loop:\n$p")
  }

  test("minhash estimate tracks true jaccard on candidate pairs") {
    val est = Dedup.minhashCandidatePairs(t)
    assert(est.count() > 0)
    // identical signature => estimate 1.0 only when all minhashes agree
    est.collect().foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e > 0.0 && e <= 1.0) // bucket collision requires >=1 band agreement
    }
  }

  test("dup groups: transitive closure on a crafted A~B~C chain") {
    import spark.implicits._
    // A~B and B~C share 2/3+ shingles, A and C share fewer — the pair list
    // alone splits them, the component must unite them
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w2 w3 w4 w5 w6 w7"),
      (3L, "w3 w4 w5 w6 w7 w8"),
      (4L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val groups = Dedup.dupGroups(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L)
    assert(!groups.contains(4L)) // no near-dup edges -> not in any group
  }

  test("index compaction: tombstones drop, fold is the admitted delta, probes stay truthful") {
    val compacted = Dedup.indexCompact(t).collect()
      .map(r => r.getAs[String]("h") ->
        (r.getAs[Long]("keeper_id"), r.getAs[Boolean]("from_delta")))
    val byHash = compacted.toMap
    assert(compacted.length == byHash.size, "compacted index has a duplicate hash entry")
    // no tombstoned doc survives as a keeper
    assert(compacted.forall(_._2._1 % 13 != 0), "a retired doc kept an index entry")
    // the fold is EXACTLY the live subset of dedup_exact_inc's admissions
    val pre = Dedup.exactIncremental(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("h"), r.getAs[Boolean]("in_index"), r.getAs[Boolean]("keep")))
    val expectedFold = pre.collect {
      case (id, (h, _, true)) if id % 13 != 0 => h -> id
    }.toMap
    val gotFold = compacted.collect { case (h, (id, true)) => h -> id }.toMap
    assert(gotFold == expectedFold, "folded entries diverge from the admitted delta")
    // re-delivery idempotence: every folded doc's hash is now stored, so
    // replaying the same drop rejects it outright
    expectedFold.foreach { case (h, _) =>
      assert(byHash.contains(h), s"folded hash $h missing — redelivery would re-admit")
    }
    // probe equivalence on tombstone-independent rows: re-probing the same
    // delta (self-entry excluded) reproduces the pre-compaction verdict
    // for every doc whose pre-decision did not hinge on a retired carrier
    val hashes = t.documents
      .select(col("doc_id"), Dedup.normalizedMd5.as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val deltaIds = pre.map(_._1).toSet
    val preIndexCarriers = hashes.filterNot { case (id, _) => deltaIds.contains(id) }
    val allCarriersRetired = preIndexCarriers.groupBy(_._2)
      .map { case (h, docs) => h -> docs.forall(_._1 % 13 == 0) }
    pre.foreach { case (id, (h, inIndex, keepPre)) =>
      val tombstoneDependent = inIndex && allCarriersRetired.getOrElse(h, false)
      if (!tombstoneDependent && id % 13 != 0) {
        val keepPost = byHash.get(h).forall(_._1 == id)
        assert(keepPost == keepPre,
          s"doc $id verdict flipped after compaction: post=$keepPost pre=$keepPre")
      }
    }
  }

  test("vector index compaction drops tombstones, keeps layout and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vcompact").toString
    val stats = graft.operators.Sim.vectorIndexCompact(t, Some(dir)).collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_code_cells"))).toMap
    // the grown index being maintained is the ensured session artifact
    // (read-only); the compacted rewrite landed at `dir`
    val full = spark.read.parquet(graft.operators.Sim.vectorIndexDir(t))
    val compactedDf = spark.read.parquet(dir)
    // no tombstoned vector survives in any stored file
    assert(compactedDf.filter(col("vec_id") % 13 === 0).count() == 0,
      "a retired vector survived compaction")
    // the compacted files re-aggregate to the live subset of the full index
    val expected = full.filter(col("vec_id") % 13 =!= 0)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap
    assert(stats.view.mapValues(_._1).toMap == expected,
      "per-list counts diverge from the live subset")
    // partition pruning (= IVF routing at the storage layer) still works
    // on the rewritten directory; Dataset.inputFiles ignores pruning, so
    // assert on the executed plan
    val probe = compactedDf.filter(col("cluster") === 1)
    probe.collect()
    assert(probe.queryExecution.executedPlan.toString.contains("PartitionFilters: ["),
      "compacted layout lost partition pruning")
  }

  test("dupGroups under the star knob equals the propagation face") {
    // the at-scale large-star/small-star path must be a pure physical
    // swap: same groups, same sizes, bit-identical rows. Compares the
    // IN-PLAN closure (dupGroupsUnsorted) — the registered face serves
    // from the session-memoized artifact and would not re-run CC here.
    val base = Dedup.dupGroupsUnsorted(t).collect().map(_.toSeq).toSet
    spark.conf.set(Dedup.CcAlgoKey, "star")
    try {
      val star = Dedup.dupGroupsUnsorted(t).collect().map(_.toSeq).toSet
      assert(star == base, "star CC diverged from propagation on the sf corpus")
      assert(star.nonEmpty)
    } finally spark.conf.unset(Dedup.CcAlgoKey)
  }

  test("ccStar labels synthetic graphs identically to ccPropagation") {
    import spark.implicits._
    // a DEEP chain (diameter 14 — needs the alternation to actually
    // iterate), a triangle, a duplicated + reversed edge, and a hub star
    // rooted at the LARGEST id (the hot-min-label shape)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L), (6L, 5L), (7L, 6L), (8L, 7L),
      (9L, 8L), (10L, 9L), (11L, 10L), (12L, 11L), (13L, 12L), (14L, 13L),
      (15L, 14L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (31L, 30L), (30L, 31L),
      (100L, 41L), (100L, 42L), (100L, 43L), (100L, 44L), (100L, 45L),
      (100L, 46L), (100L, 47L)).toDF("da", "db")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = toMap(Dedup.ccPropagation(edges))
    val star = toMap(Dedup.ccStar(edges))
    assert(star == prop, s"star=$star\nprop=$prop")
    assert((1L to 15L).forall(star(_) == 1L), "deep chain split")
    assert(star(100L) == 41L && star(22L) == 20L && star(31L) == 30L)
  }

  test("simhash of duplicated text is identical, near count symmetric") {
    import spark.implicits._
    val dup = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashDocs(graft.sources.Tables(spark, sf)) // compile-path check
    val hashes = Dedup.withWords(dup)
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    assert(hashes.count() > 0)
    val real = Dedup.simhash(t).collect()
    assert(real.length == t.documents.count())
    real.foreach(r => assert(r.getAs[Long]("n_near") >= 0))
  }

  /** Independent brute-force replay of the capped banding rule
    * (Dedup.bandedNearCandidates' contract) over collected fingerprints —
    * plain Scala collections, no shared code with the operator.
    */
  private def cappedBandRule(hashes: Map[Long, Long], totalBits: Int,
      cap: Int): Set[(Long, Long)] = {
    val bandBits = totalBits / 4
    val subBits = (totalBits - bandBits + 3) / 4
    def pair(x: Long, y: Long) = if (x < y) (x, y) else (y, x)
    val out = scala.collection.mutable.Set[(Long, Long)]()
    for (b <- 0 until 4) {
      val buckets = hashes.toSeq.groupBy { case (_, h) =>
        (h >>> (b * bandBits)) & ((1L << bandBits) - 1)
      }
      for ((_, members) <- buckets) {
        if (members.size <= cap) {
          for (Seq((i1, _), (i2, _)) <- members.combinations(2))
            out += pair(i1, i2)
        } else {
          val comps = members.map { case (id, h) =>
            val low = h & ((1L << (b * bandBits)) - 1)
            val high = (h >>> ((b + 1) * bandBits)) << (b * bandBits)
            (id, low | high)
          }
          for (s <- 0 until 4) {
            val subBuckets = comps.groupBy { case (_, c) =>
              (c >>> (s * subBits)) & ((1L << subBits) - 1)
            }
            for ((_, ms) <- subBuckets; Seq((i1, _), (i2, _)) <- ms.combinations(2))
              out += pair(i1, i2)
          }
        }
      }
    }
    out.toSet
  }

  test("banded occupancy cap: hamming<=3 pairs survive a hot bucket via " +
      "sub-band refinement, all-sub-band-divergent pairs are shed") {
    import spark.implicits._
    // hand-built 60-bit fingerprints — full bit control. Everything shares
    // band 0 (bits 0-14) so that bucket is HOT at cap=4; bands 1-3 are
    // distinct across docs so no cold bucket rescues a pair by accident.
    val band0 = 0x1234L
    def fp(b1: Long, b2: Long, b3: Long): Long =
      band0 | (b1 << 15) | (b2 << 30) | (b3 << 45)
    // A/B: hamming 3, one differing bit in each of bands 1..3 (bits 16,
    // 32, 48) — the pigeonhole case the cap MUST NOT lose: band 0 is
    // their only shared band and it is hot, but sub-band 3 of the
    // complementary bits is clean.
    val a = 1L -> fp(0x11, 0x22, 0x33)
    val b = 2L -> fp(0x11 ^ 2, 0x22 ^ 4, 0x33 ^ 8)
    // C/D: hamming 4 with one differing bit in EVERY sub-band of band 0's
    // complement (bits 16, 28, 40, 52) — a candidate the uncapped rule
    // kept and the cap documents away.
    val c = 3L -> fp(0x55, 0x66, 0x77)
    val d = 4L -> (c._2 ^ (1L << 16) ^ (1L << 28) ^ (1L << 40) ^ (1L << 52))
    val filler = (0 until 6).map(i =>
      (10L + i) -> fp(0x100 + i, 0x200 + i * 3, 0x300 + i * 5))
    val all = (Seq(a, b, c, d) ++ filler).toMap
    val df = all.toSeq.toDF("doc_id", "fp")
    def got(cap: Int): Set[(Long, Long)] =
      Dedup.bandedNearCandidates(df, "fp", 60, cap).collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val capped = got(4)
    // full pair-set equality with the independent brute-force rule
    assert(capped == cappedBandRule(all, 60, 4))
    assert(capped.contains((1L, 2L)), "hamming-3 pair lost in a hot bucket")
    assert(!capped.contains((3L, 4L)), "all-sub-band-divergent pair kept")
    // anti-vacuity: the bucket really was hot, and the cap really binds —
    // the uncapped rule keeps C/D
    val uncapped = got(1000)
    assert(uncapped == cappedBandRule(all, 60, 1000))
    assert(uncapped.contains((3L, 4L)))
    assert(uncapped != capped)
  }

  test("default-cap simhash and phash match the uncapped semantics on a " +
      "cold corpus (no bucket near the ceiling at spec SF)") {
    val cappedS = Dedup.simhash(t).collect().map(_.toSeq).toSet
    val uncappedS = Dedup.simhash(t, Int.MaxValue).collect().map(_.toSeq).toSet
    assert(cappedS == uncappedS)
    val cappedP = Multimodal.phashDedup(t).collect().map(_.toSeq).toSet
    val uncappedP = Multimodal.phashDedup(t, Int.MaxValue).collect().map(_.toSeq).toSet
    assert(cappedP == uncappedP)
  }

  test("minhash estimate is statistically close to true jaccard on candidates") {
    val est = Dedup.minhashCandidatePairs(t)
      .select(col("da"), col("db"), col("est_jaccard"))
    val sh = Dedup.shingles(t)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val shared = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    val truth = shared
      .join(cnt.withColumnRenamed("doc_id", "da").withColumnRenamed("c", "ca"), "da")
      .join(cnt.withColumnRenamed("doc_id", "db").withColumnRenamed("c", "cb"), "db")
      .select(col("da"), col("db"),
        (col("shared").cast("double") / (col("ca") + col("cb") - col("shared"))).as("true_j"))
    val joined = est.join(truth, Seq("da", "db"), "left")
      .select(col("est_jaccard"), coalesce(col("true_j"), lit(0.0)).as("true_j"))
      .collect()
    assert(joined.nonEmpty)
    val mae = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / joined.length
    // k=16 minhash has ~1/sqrt(16)=0.25 per-pair std dev; the mean error
    // over all candidate pairs must be well inside that
    assert(mae < 0.3, s"minhash mean abs error $mae")
  }

  test("lsh band buckets are reasonably balanced per (table, band_key)") {
    val buckets = Sim.lshBucketPopulations(t).collect()
    val sizes = buckets.map(_.getAs[Long]("n"))
    val perTable = sizes.sum / Sim.lshTables // = corpus size
    assert(sizes.max <= math.max(20L, perTable / 4),
      s"degenerate bucket: max=${sizes.max} of $perTable per table")
  }

  test("lsh plane count scales with corpus size (the 100 TB knob)") {
    // expected bucket population stays ≈ targetPop as N grows: in-bucket
    // pair work is O(N · targetPop), never O(N²/const)
    assert(Sim.lshPlanesFor(500) == 4)
    assert(Sim.lshPlanesFor(2000) == 6)
    assert(Sim.lshPlanesFor(1000000) == 15)
    assert(Sim.lshPlanesFor(1000000000L) == 25)
    assert(Sim.lshPlanesFor(1000000000L) > Sim.lshPlanesFor(1000000) &&
      Sim.lshPlanesFor(1000000) > Sim.lshPlanesFor(500))
  }

  test("lsh bucket population stays bounded on a skewed corpus") {
    import spark.implicits._
    // 2000 vectors: a tight 500-vector semantic cluster around one base
    // direction plus 1500 spread vectors (the skew case the r4 verdict
    // flagged); deterministic pseudo-noise, no RNG
    val clusterN = 500
    // splitmix-style per-(i,d) pseudo-uniform in [-1, 1) — sin-of-linear
    // forms are NOT usable here: sin(a·i + b·d) corpora live on a 2-D
    // circle and genuinely cluster
    def noise(i: Long, d: Int): Double = {
      var h = i * 6364136223846793005L + (d + 1) * 1442695040888963407L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 29
      ((h & 0xffff).toDouble / 32768.0) - 1.0
    }
    val rows = (0L until 2000L).map { i =>
      val hot = i < clusterN
      (i, (0 until 64).map { d =>
        if (hot) math.sin(d * 0.7 + 1) + 0.9 * noise(i, d)
        else noise(i, d)
      }.toArray)
    }
    val skewed = rows.toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = skewed }
    val planes = Sim.lshPlanesFor(2000) // 6 -> 64 buckets/table
    val all = Sim.lshBucketPopulations(t2, Sim.lshTables, planes).collect()
      .map(_.getAs[Long]("n"))
    // (a) the SPREAD mass never pools: excluding the semantic cluster, every
    // bucket stays a small multiple of the target population — the
    // planesFor scaling is what bounds it as N grows
    val spreadOnly = new graft.sources.Tables(spark, sf) {
      override def embeddings = skewed.filter(col("vec_id") >= clusterN)
    }
    val spreadPops = Sim.lshBucketPopulations(spreadOnly, Sim.lshTables, planes)
      .collect().map(_.getAs[Long]("n"))
    assert(spreadPops.max <= 4L * Sim.lshTargetBucketPop,
      s"spread mass pooled: ${spreadPops.max} (target ${Sim.lshTargetBucketPop})")
    // (b) the hot bucket is bounded by the CLUSTER, not the corpus: mutual
    // near-neighbors colliding is LSH doing its job (their pair work is
    // real near-dup work); what must not happen is unrelated mass joining
    // them. Corpora with mass-duplicate content run exact/semantic dedup
    // first (dedup_exact / dedup_semantic are the documented path).
    assert(all.max <= clusterN + 4L * Sim.lshTargetBucketPop,
      s"hot bucket ${all.max} exceeds cluster size $clusterN + slack")
  }

  test("brute-force cosine topk: ranks dense, cos within [-1,1], no self") {
    val rows = Sim.cosineTopK(t).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Sim.nQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to Sim.topK))
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != q)
        val c = r.getAs[Double]("cos_sim")
        assert(c >= -1.0001 && c <= 1.0001)
      }
      // ranks ordered by descending cos
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
    }
  }

  test("ivf ann: probed-list search recalls most exact top-k neighbors") {
    val exact = Sim.cosineTopK(t).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = Sim.ivfTopK(t).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    val recall = exact.map { case (q, ex) =>
      ivf(q).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    // 4 of 16 lists probed: recall well above the 25% a random probe gives
    assert(recall >= 0.5, s"ivf recall $recall")
  }

  test("lsh ann: no self-neighbors, and banded recall beats a single table") {
    val rows = Sim.lshTopK(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("vec_id"))
    }
    // recall vs the exact best neighbor: the banded approximate cosine must
    // be close to the true best on average (each vector gets lshTables
    // independent chances to collide with its true neighbor)
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val exactBest = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        expr("graft_cosine(a.v, b.v)").as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val ratios = rows.map { r =>
      val best = exactBest(r.getAs[Long]("vec_id"))
      if (best <= 0) 1.0 else math.min(1.0, r.getAs[Double]("cos_sim") / best)
    }
    val mean = ratios.sum / ratios.length
    assert(mean >= 0.75, s"banded LSH mean best-cos ratio $mean")
  }

  test("pii scrub redacts emails, phones and card numbers with typed tags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or +86 138-0013-8000 now"),
      (2L, "card 4111 1111 1111 1111 on file"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val out = TextAnalysis.piiScrub(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_card"))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 >= 1)
    assert(out(2L)._3 == 1)
    assert(out(3L) == ((0, 0, 0)))
    // the scrubbed text must not contain the raw values
    // card first, like the operator — a phone pattern must not eat card digits
    val ordered = graft.operators.TextAnalysis.piiPatterns
      .sortBy { case (name, _, _) => if (name == "card") 0 else 1 }
    val clean = docs.select(col("doc_id"),
      ordered.foldLeft(col("text")) {
        case (c, (_, p, r)) => regexp_replace(c, p, r)
      }.as("ct")).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("ct")).toMap
    assert(!clean(1L).contains("example.co.uk") && clean(1L).contains("<EMAIL>"))
    assert(!clean(2L).contains("4111") && clean(2L).contains("<CARD>"))
  }

  test("langid prefers the language with most stopword hits") {
    val rows = TextAnalysis.langId(t).collect()
    rows.foreach { r =>
      val (en, es, de) = (r.getAs[Int]("en_n"), r.getAs[Int]("es_n"), r.getAs[Int]("de_n"))
      val pred = r.getAs[String]("pred_lang")
      if (en + es + de == 0) assert(pred == "unknown")
      else {
        val max = Seq(en, es, de).max
        val predScore = pred match {
          case "en" => en; case "es" => es; case "de" => de; case _ => -1
        }
        assert(predScore == max)
      }
    }
  }

  test("fingerprint is order-sensitive, min-shingle is order-robust-ish") {
    val rows = TextAnalysis.fingerprint(t).collect()
    assert(rows.length == t.documents.count())
    // deterministic across two runs
    val again = TextAnalysis.fingerprint(t).collect()
    assert(rows.map(_.getAs[Long]("fp")).sameElements(again.map(_.getAs[Long]("fp"))))
  }

  test("frame sampling is bounded, uniform and inside the clip") {
    val rows = Multimodal.frameSample(t).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, frames) =>
      assert(frames.length <= Multimodal.maxFramesPerVideo + 1)
      frames.foreach { f =>
        assert(f.getAs[Long]("frame_idx") < f.getAs[Long]("n_frames"))
        val ts = f.getAs[Long]("frame_ts_ms")
        assert(ts >= 0 && ts < f.getAs[Long]("duration_ms"))
      }
      // uniform stride: consecutive sampled indices are equidistant
      val idx = frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      val gaps = idx.sliding(2).collect { case Seq(a, b) => b - a }.toSet
      assert(gaps.size <= 1, s"non-uniform stride: $gaps")
      // per-frame stats come from a REAL raster decode
      frames.foreach { f =>
        val (mn, mx) = (f.getAs[Int]("min_gray"), f.getAs[Int]("max_gray"))
        val mean = f.getAs[Double]("mean_gray")
        assert(mn >= 0 && mx <= 255 && mn <= mx)
        assert(mean >= mn && mean <= mx)
      }
    }
  }

  test("frame raster decode: known payload yields exact stats") {
    // frame 0 of a constant payload -> constant raster -> exact stats
    val flat = Multimodal.frameRaster(Array.fill[Byte](50)(42), 0L)
    val img = Multimodal.decodePgm(
      Multimodal.encodePgm(Multimodal.frameW, Multimodal.frameH, flat))
    assert(img.contains(Multimodal.PgmImage(
      Multimodal.frameW, Multimodal.frameH, 42.0, 42, 42)))
    // the raster window moves with the frame index (seek semantics)
    val ramp = Array.tabulate[Byte](200)(_.toByte)
    assert(!Multimodal.frameRaster(ramp, 0L).sameElements(
      Multimodal.frameRaster(ramp, 1L)))
    // and is deterministic
    assert(Multimodal.frameRaster(ramp, 3L).sameElements(
      Multimodal.frameRaster(ramp, 3L)))
  }

  test("audio chunks tile each track exactly, last chunk clipped") {
    val rows = Multimodal.audioChunks(t).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("start_ms")).toSeq
      val dur = sorted.head.getAs[Long]("duration_ms")
      // chunks tile [0, dur) with no gaps or overlap
      assert(sorted.head.getAs[Long]("start_ms") == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getAs[Long]("end_ms") == b.getAs[Long]("start_ms"))
        case _ =>
      }
      assert(sorted.last.getAs[Long]("end_ms") == dur)
      sorted.foreach { c =>
        val span = c.getAs[Long]("end_ms") - c.getAs[Long]("start_ms")
        assert(span <= Multimodal.audioChunkMs)
        // REAL per-chunk features over the chunk's own sample count
        assert(c.getAs[Int]("n_samples") ==
          (span * Multimodal.audioSampleRate / 1000).toInt)
        val (rms, peak, zcr) = (c.getAs[Double]("rms"),
          c.getAs[Int]("peak"), c.getAs[Double]("zcr"))
        assert(rms >= 0.0 && rms <= 128.0)
        assert(peak >= 0 && peak <= 128 && rms <= peak + 1)
        assert(zcr >= 0.0 && zcr <= 1.0)
      }
    }
  }

  test("pcm features: known samples yield exact rms/peak/zcr") {
    // [3, -4]: rms = sqrt((9+16)/2) = 3.5355..., peak 4, one crossing / 2
    val f = Multimodal.pcmFeatures(Array[Byte](3, -4))
    assert(math.abs(f.rms - math.sqrt(12.5)) < 1e-12)
    assert(f.peak == 4 && f.zcr == 0.5)
    // silence
    assert(Multimodal.pcmFeatures(Array[Byte](0, 0, 0)) ==
      Multimodal.PcmFeatures(0.0, 0, 0.0))
    // chunk PCM is deterministic per (doc, start) and varies across chunks
    val a = Multimodal.chunkPcm(7L, 0L, 64)
    assert(a.sameElements(Multimodal.chunkPcm(7L, 0L, 64)))
    assert(!a.sameElements(Multimodal.chunkPcm(7L, 5000L, 64)))
  }

  test("pgm decode parses real payloads exactly and rejects malformed ones") {
    // 2x2 image with known pixels -> exact stats
    val img = Multimodal.encodePgm(2, 2, Array[Byte](10, 20, 30, 100))
    val d = Multimodal.decodePgm(img)
    assert(d.contains(Multimodal.PgmImage(2, 2, 40.0, 10, 100)))
    // high-bit pixels must read unsigned
    val hb = Multimodal.decodePgm(Multimodal.encodePgm(1, 2, Array[Byte](-1, 0)))
    assert(hb.exists(i => i.maxGray == 255 && i.minGray == 0 && i.meanGray == 127.5))
    // malformed: wrong magic, truncated raster, zero dims, bad maxval
    assert(Multimodal.decodePgm("P6\n2 2\n255\nxxxx".getBytes).isEmpty)
    assert(Multimodal.decodePgm(img.take(img.length - 1)).isEmpty)
    assert(Multimodal.decodePgm("P5\n0 2\n255\n".getBytes).isEmpty)
    assert(Multimodal.decodePgm("P5\n1 1\n127\nx".getBytes).isEmpty)
  }

  test("multimodal binary columns decode the corpus with per-row error handling") {
    val rows = Multimodal.binaryColumns(t).collect()
    assert(rows.length == t.documents.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("fmt") == "pgm" && r.getAs[Int]("n_bytes") > 0)
      if (id % 13 == 0) {
        // truncated wire payload -> decode refused, sentinels emitted
        assert(!r.getAs[Boolean]("decode_ok") && r.getAs[Int]("width") == -1)
      } else {
        assert(r.getAs[Boolean]("decode_ok"))
        assert(r.getAs[Int]("width") == (8 + id % 9) && r.getAs[Int]("height") == (8 + id % 5))
        val mean = r.getAs[Double]("mean_gray")
        assert(mean >= r.getAs[Int]("min_gray") && mean <= r.getAs[Int]("max_gray"))
      }
    }
  }

  test("c4 filter gate keeps clean docs and names the violated rule") {
    import spark.implicits._
    val long = (1 to 40).map(i => f"w$i%03d").mkString(" ")    // clean: 40 4-char words
    val short = "only five words in here"                      // n_words < 30
    val tiny = (1 to 40).map(_ => "a b").mkString(" ")         // short_frac = 1.0
    val wide = (1 to 40).map(i => s"verylongword$i").mkString(" ") // mwl > 5
    val docs = Seq((1L, long), (2L, short), (3L, tiny), (4L, wide))
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = TextAnalysis.c4Filters(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("keep") && got(2L).getAs[Int]("n_words") == 5)
    assert(!got(3L).getAs[Boolean]("keep") &&
      got(3L).getAs[Double]("short_frac") == 1.0)
    assert(!got(4L).getAs[Boolean]("keep") &&
      got(4L).getAs[Double]("mean_word_len") > TextAnalysis.c4MeanLenHi)
    // mean word length is exact on doc 3: all words are 1 char
    assert(got(3L).getAs[Double]("mean_word_len") == 1.0)
  }

  test("top ngrams ranks by occurrences with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"),   // "x y" x3, "y x" x2
      (2L, "x y q r"),       // "x y" again (2 docs)
      (3L, "q r s"))
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = TextAnalysis.topNgrams(t2).collect()
    assert(rows.head.getAs[String]("gram") == "x y" &&
      rows.head.getAs[Long]("n_occ") == 4L && rows.head.getAs[Long]("n_docs") == 2L)
    // equal-count grams order lexicographically
    val occs = rows.map(_.getAs[Long]("n_occ"))
    assert(occs.sameElements(occs.sortBy(-_)))
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[Long]("n_occ") == b.getAs[Long]("n_occ") =>
        assert(a.getAs[String]("gram") < b.getAs[String]("gram"))
      case _ => ()
    }
    assert(rows.length <= TextAnalysis.topNgramK)
  }

  test("domain mix keeps per-source rates and defaults unlisted sources") {
    val kept = TrainData.mixDomains(t).collect()
    val stats = TrainData.mixDomainsStats(t).collect()
    val wts = TrainData.domainWeights.toMap
    // every explicit source carries its configured weight, others the default
    stats.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Double]("weight") ==
        wts.getOrElse(src, TrainData.domainDefaultWeight))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
    // the kept listing and the stats agree exactly
    assert(kept.length == stats.map(_.getAs[Long]("n_kept")).sum)
    val keptBySrc = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    stats.foreach(r => assert(
      keptBySrc.getOrElse(r.getAs[String]("source"), 0) == r.getAs[Long]("n_kept")))
  }

  test("cluster assignment picks the nearest centroid, ties to the lower id") {
    import spark.implicits._
    def vec(hot: Int, v: Float): Seq[Float] =
      (0 until 8).map(d => if (d == hot) v else 0.0f)
    // centroids 0..7 are one-hot axes; probes point near axis 2 and axis 5
    val rows = (0 until Sim.nCentroids).map(i => (i.toLong, vec(i, 1.0f))) ++ Seq(
      (100L, vec(2, 3.0f)),                                  // exactly axis 2
      (101L, (0 until 8).map(d => if (d == 5) 0.9f else 0.1f))) // nearest axis 5
    val embs = rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = embs }
    val got = Sim.clusterAssign(t2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    // a centroid assigns to itself at cosine 1.0
    (0 until Sim.nCentroids).foreach { i =>
      assert(got(i.toLong).getAs[Long]("cluster") == i.toLong)
      assert(got(i.toLong).getAs[Double]("cos_sim") == 1.0)
    }
    assert(got(100L).getAs[Long]("cluster") == 2L &&
      got(100L).getAs[Double]("cos_sim") == 1.0)
    assert(got(101L).getAs[Long]("cluster") == 5L)
  }

  test("semantic dedup pairs within clusters and misses across the boundary") {
    import spark.implicits._
    def vec(vals: (Int, Float)*): Seq[Float] =
      (0 until 8).map(d => vals.toMap.getOrElse(d, 0.0f))
    val rows = (0 until Sim.nCentroids).map(i => (i.toLong, vec(i -> 1.0f))) ++ Seq(
      // 100/101: both nearest axis 2, cosine ~0.98 -> in-cluster pair
      (100L, vec(2 -> 1.0f, 3 -> 0.1f)),
      (101L, vec(2 -> 1.0f, 3 -> 0.3f)),
      // 103/104: cosine 0.96 near-dups SPLIT by the 3/4 centroid boundary
      // -> by design NOT reported (the documented SemDeDup approximation)
      (103L, vec(3 -> 0.8f, 4 -> 0.6f)),
      (104L, vec(3 -> 0.6f, 4 -> 0.8f)))
    val embs = rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = embs }
    val pairs = Sim.semanticDedup(t2).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    assert(pairs.contains((100L, 101L)))
    assert(!pairs.contains((103L, 104L)), "cross-cluster pair must be missed")
    // every reported pair is a true near-dup the brute-force also finds
    val brute = Sim.embeddingNearDupBrute(t2).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    assert(pairs.subsetOf(brute))
  }

  test("nCentroidsFor holds expected cluster population constant") {
    // the lshPlanesFor precedent on the centroid axis: floor at the fixed
    // count for every oracle SF, then k grows with n / targetPop
    assert(Sim.nCentroidsFor(500) == Sim.nCentroids)
    assert(Sim.nCentroidsFor(8L * Sim.centroidTargetPop) == Sim.nCentroids)
    assert(Sim.nCentroidsFor(8L * Sim.centroidTargetPop + 1) == 9)
    assert(Sim.nCentroidsFor(200000) ==
      math.ceil(200000.0 / Sim.centroidTargetPop).toInt)
  }

  test("scaled centroid count: semantic dedup + knn graph match the " +
      "window-rank reference above the 8-centroid floor") {
    import org.apache.spark.sql.expressions.Window
    // n > 8·targetPop ⇒ k = ceil(n/512) = 9 > the fixed floor: the two
    // pair faces must derive k from the corpus, assign with the max_by
    // argmax, and agree pair-for-pair / edge-for-edge with an independent
    // window-rank assignment at the SAME k (the pre-scaling shape)
    val n = 4200
    val k = Sim.nCentroidsFor(n)
    assert(k == 9, s"test geometry drifted: k=$k")
    val embs = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), d -> " +
        "CAST(sin((id % 37 + 1) * (d + 1)) AS FLOAT))").as("embedding"),
      lit(0L).as("label"))
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = embs }
    graft.functions.VectorExpressions.register(spark)
    val e = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("v").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cluster").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("graft_cosine(v, cv)"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cluster"), col("v")).cache()
    val refPairs = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .filter(col("cos") >= Sim.nearDupTau)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = Sim.semanticDedup(t2).collect()
    assert(gotPairs.map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
      == refPairs)
    // anti-vacuity: clusters beyond the fixed floor actually hold pairs
    assert(gotPairs.exists(_.getAs[Long]("cluster") >= Sim.nCentroids),
      "no pair landed in a scaled (>floor) cluster — the knob is vacuous")
    val wk = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cos").desc, col("b.vec_id"))
    val refEdges = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .withColumn("rank", row_number().over(wk)).filter(col("rank") <= Sim.knnK)
      .select(col("a.vec_id"), col("b.vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val gotEdges = Sim.knnGraph(t2).collect()
    assert(gotEdges.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet == refEdges)
    assert(gotEdges.exists(_.getAs[Long]("cluster") >= Sim.nCentroids))
    assigned.unpersist()
  }

  test("scaled centroid count above the two-stage threshold: semantic dedup " +
      "+ knn graph match the rank-rank two-stage reference") {
    import org.apache.spark.sql.expressions.Window
    // n/targetPop > twoStageMinCentroids ⇒ the registered faces route
    // through group representatives (graft_centroid_best with s = ⌈√k⌉);
    // the reference replays the same rule with two independent window
    // ranks. splitmix pseudo-noise (NOT a sin family — those live on a
    // 2-D span and make the argmax degenerate) + 200 planted near-dup
    // pairs so the pair faces have something to find.
    def noise(i: Long, d: Int): Double = {
      var h = i * 6364136223846793005L + (d + 1) * 1442695040888963407L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 29
      ((h & 0xffff).toDouble / 32768.0) - 1.0
    }
    val n = 36000
    val k = Sim.nCentroidsFor(n)
    val g = Sim.centroidSuperCount(k)
    assert(k == 71 && g == 9, s"test geometry drifted: k=$k g=$g")
    import spark.implicits._
    val rows = (0L until n.toLong).map { i =>
      val planted = i >= 18000 && i < 18200
      val src = if (planted) i - 18000 else i
      val delta = if (planted) 0.001 else 0.0
      (i, (0 until 8).map(d => (noise(src, d) + delta * (d + 1)).toFloat), 0L)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = embs }
    graft.functions.VectorExpressions.register(spark)
    val e = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // dense ids 0..k-1 ⇒ position = centroid id
    val centDf = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("v").as("cv"))
    val supDf = centDf.filter(col("cluster") < g)
      .select(col("cluster").as("scluster"), col("cv").as("scv"))
    // cell assignment: supers own their cell, every other centroid joins
    // its nearest super's cell (rank by ccos desc, super asc)
    val wc = Window.partitionBy("cluster").orderBy(col("scos").desc, col("scluster").asc)
    val cellCent = centDf.filter(col("cluster") >= g).crossJoin(broadcast(supDf))
      .withColumn("scos", expr("graft_cosine(cv, scv)"))
      .withColumn("rk", row_number().over(wc)).filter(col("rk") === 1)
      .select(col("cluster"), col("cv"), col("scluster").as("cell"))
      .unionByName(centDf.filter(col("cluster") < g)
        .select(col("cluster"), col("cv"), col("cluster").as("cell")))
    val w1 = Window.partitionBy("vec_id").orderBy(col("rcos").desc, col("scluster").asc)
    val g1 = e.crossJoin(broadcast(supDf))
      .withColumn("rcos", expr("graft_cosine(v, scv)"))
      .withColumn("rk", row_number().over(w1))
      .filter(col("rk") <= Sim.centroidRouteProbes)
      .select(col("vec_id"), col("scluster").as("cell"))
    val w2 = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cluster").asc)
    val assigned = e.join(g1, "vec_id").join(broadcast(cellCent), "cell")
      .withColumn("ccos", expr("graft_cosine(v, cv)"))
      .withColumn("rk", row_number().over(w2)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cluster"), col("v")).cache()
    // anti-vacuity 1: the routing is genuinely two-stage — it must diverge
    // from the FLAT argmax somewhere, or this spec can't tell them apart
    val wf = Window.partitionBy("vec_id").orderBy(col("fcos").desc, col("cluster").asc)
    val flat = e.crossJoin(broadcast(centDf))
      .withColumn("fcos", expr("graft_cosine(v, cv)"))
      .withColumn("rk", row_number().over(wf)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cluster").as("fcluster"))
    assert(assigned.join(flat, "vec_id")
      .filter(col("cluster") =!= col("fcluster")).count() > 0,
      "two-stage never diverged from flat — the routing is vacuous here")
    val refPairs = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .filter(col("cos") >= Sim.nearDupTau)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = Sim.semanticDedup(t2).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    assert(gotPairs == refPairs)
    // anti-vacuity 2: the planted near-dups were actually found
    assert(gotPairs.nonEmpty, "no near-dup pair found — the pair face is vacuous here")
    val wk = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cos").desc, col("b.vec_id"))
    val refEdges = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .withColumn("rank", row_number().over(wk)).filter(col("rank") <= Sim.knnK)
      .select(col("a.vec_id"), col("b.vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val gotEdges = Sim.knnGraph(t2).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    assert(gotEdges == refEdges)
    assigned.unpersist()
  }

  test("scaled centroid count: fully offset id space yields empty " +
      "assignment, not a crash") {
    // degenerate corpus above the scaling floor whose vec_ids are ALL
    // >= k (no low-id vector can serve as a centroid): the scaled
    // literal-argmax branch must return the same EMPTY result the fixed
    // branch's crossJoin-with-empty-cents produces — not index an empty
    // centroid literal (review finding r12)
    val n = 4200
    assert(Sim.nCentroidsFor(n) > Sim.nCentroids, "geometry drifted")
    val embs = spark.range(n).select((col("id") + 100000L).as("vec_id"),
      expr("transform(sequence(0, 7), d -> " +
        "CAST(sin((id % 37 + 1) * (d + 1)) AS FLOAT))").as("embedding"),
      lit(0L).as("label"))
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = embs }
    assert(Sim.semanticDedup(t2).count() == 0)
    assert(Sim.knnGraph(t2).count() == 0)
  }

  test("substring dedup: merged spans, full-copy drop, unique doc untouched") {
    import spark.implicits._
    val k = Dedup.substrK
    // 30 shared tokens between A and B (an exact copy) -> every window of
    // both is duplicated; merged-interval coverage must be the WHOLE doc
    // (30), not windows × k (15 × 16 = 240 — the double-count a naive sum
    // would produce). C is unique -> zero coverage, kept.
    val span = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, span), (2L, span),
      (3L, (1 to 30).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.substringDup(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(rows(id).getAs[Long]("covered_toks") == 30L)
      assert(rows(id).getAs[Long]("n_dup_wins") == 30L - k + 1)
      assert(rows(id).getAs[Double]("dup_frac") == 1.0)
      assert(!rows(id).getAs[Boolean]("keep"), "full copy must be dropped")
    }
    assert(rows(3L).getAs[Long]("covered_toks") == 0L)
    assert(rows(3L).getAs[Boolean]("keep"))
  }

  test("substring dedup: partial shared span covers exactly the span") {
    import spark.implicits._
    val k = Dedup.substrK
    // A and B share ONLY their first k tokens (one duplicated window each),
    // then diverge for another 24 -> coverage is exactly k of 40 tokens,
    // below the drop threshold on both sides.
    val shared = (1 to k).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " " + (1 to 24).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 24).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.substringDup(t2).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_wins") == 1L)
      assert(r.getAs[Long]("covered_toks") == k.toLong)
      assert(r.getAs[Boolean]("keep"))
    }
  }

  test("substring dedup: short docs pass through with zero coverage") {
    import spark.implicits._
    val docs = Seq((1L, "too short to window"), (2L, "too short to window"))
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.substringDup(t2).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("covered_toks") == 0L && r.getAs[Boolean]("keep"))
    }
  }

  test("incremental minhash from a stored index is order-insensitive and matches in-plan") {
    import org.apache.spark.sql.functions._
    val sig = Dedup.minhashSignaturesWide(t)
    val maxId = sig.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val index = sig.filter(!Dedup.incIsDelta(col("doc_id"), lit(maxId)))
    val delta = sig.filter(Dedup.incIsDelta(col("doc_id"), lit(maxId)))
    val inPlan = Dedup.minhashIncremental(t).collect().map(_.toSeq)
    val fromStored = Dedup.minhashIncrementalFrom(index, delta)
      .collect().map(_.toSeq)
    assert(fromStored.length == inPlan.length)
    fromStored.zip(inPlan).foreach { case (a, b) => assert(a == b) }
    // a stored index read back with a DIFFERENT column order must bind the
    // signature columns by NAME, not position (the p_id/p_mh rename trap)
    val shuffled = index.select(
      (index.columns.filter(_ != "doc_id") :+ "doc_id").map(col): _*)
    val fromShuffled = Dedup.minhashIncrementalFrom(shuffled, delta)
      .collect().map(_.toSeq)
    fromShuffled.zip(inPlan).foreach { case (a, b) => assert(a == b) }
  }

  test("split packing fills every non-final bin to exactly the budget") {
    val rows = TrainData.packSequencesSplit(t).collect()
    val byShardBin = rows.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
      .view.mapValues(_.map(_.getAs[Long]("tok_in_bin")).sum).toMap
    val lastBin = byShardBin.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    byShardBin.foreach { case ((shard, bin), toks) =>
      if (bin < lastBin(shard))
        assert(toks == TrainData.packBudget, s"bin ($shard,$bin) holds $toks")
      else assert(toks <= TrainData.packBudget)
    }
    // token conservation: split pieces sum back to each doc's token count
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("tok_in_bin")).sum).toMap
    val expected = graft.operators.Dedup.withWords(t.documents)
      .select(col("doc_id"), size(col("w")).cast("long").as("tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == expected.filter(_._2 > 0))
    // each doc has exactly one head piece
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      assert(g.count(_.getAs[Boolean]("is_head")) == 1)
    }
  }

  test("embedding quality audit counts every defect class exactly") {
    import spark.implicits._
    val good = (0 until 5).map(i => (i.toLong, Seq.fill(64)(0.5)))
    val shortDim = Seq((5L, Seq.fill(16)(1.0)))
    val withNan = Seq((6L, Seq.fill(63)(1.0) :+ Double.NaN))
    val zero = Seq((7L, Seq.fill(64)(0.0)))
    val orphan = Seq((99L, Seq.fill(64)(1.0))) // no doc 99
    val emb = (good ++ shortDim ++ withNan ++ zero ++ orphan).toDF("vec_id", "embedding")
    val docs = (0 until 9).map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) {
      override def embeddings = emb
      override def documents = docs
    }
    val r = Sim.qualityAudit(t2).collect().head
    assert(r.getAs[Long]("n_vectors") == 9L)
    assert(r.getAs[Long]("n_docs") == 9L)
    assert(r.getAs[Long]("n_missing_vec") == 1L) // doc 8 has no vector
    assert(r.getAs[Long]("n_orphan_vec") == 1L)  // vec 99 has no doc
    assert(r.getAs[Long]("n_bad_dim") == 1L)
    assert(r.getAs[Long]("n_nonfinite") == 1L)
    assert(r.getAs[Long]("n_zero_norm") == 1L)
    // the real corpus is clean
    val real = Sim.qualityAudit(t).collect().head
    assert(real.getAs[Long]("n_bad_dim") == 0L &&
      real.getAs[Long]("n_nonfinite") == 0L &&
      real.getAs[Long]("n_zero_norm") == 0L &&
      real.getAs[Long]("n_missing_vec") == 0L &&
      real.getAs[Long]("n_orphan_vec") == 0L)
  }

  test("project-rerank: candidates from the 16-dim pass recall the exact top-k") {
    val exact = Sim.cosineTopK(t).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val rr = Sim.projectRerank(t).collect()
    val rrByQ = rr.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(rrByQ.keySet == exact.keySet)
    // dense ranks, k results per query, no self-neighbors
    rr.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to Sim.topK))
      g.foreach(r =>
        assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
    // this corpus is near-orthogonal noise (max off-diag cos 0.48): its
    // "top-k" is ranking noise, which a 16-dim projection scrambles — the
    // honest claim is recall well above the random-candidate baseline
    val recall = exact.map { case (q, ex) =>
      rrByQ(q).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    val baseline = Sim.rerankCandidates.toDouble / (t.embeddings.count() - 1)
    assert(recall >= 4 * baseline,
      s"recall $recall not above 4x the random baseline $baseline")
  }

  test("project-rerank recovers PLANTED near neighbors through the projection") {
    import spark.implicits._
    // 10 noisy queries (ids 0-9), their clean twins (ids 10-19, cos≈0.95),
    // 80 deterministic near-orthogonal distractors — real neighbor
    // structure, which is what the projection must preserve
    // per-vector FREQUENCY, not phase: same-frequency sinusoids differ only
    // by phase and cosine-correlate as cos(Δphase) — the 2-D collapse the
    // LSH plane family documents (Sim.scala lshBandKey)
    def unit(seed: Int): Array[Double] = {
      val v = Array.tabulate(64)(d => math.sin((seed * 1009 + 31) * (d + 1.0)))
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bases = (0 until 10).map(unit)
    val noisy = bases.zipWithIndex.map { case (b, i) =>
      val noise = unit(1000 + i)
      b.zip(noise).map { case (x, e) => x + 0.3 * e }
    }
    val rows =
      noisy.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        bases.zipWithIndex.map { case (v, i) => (10L + i, v.toSeq) } ++
        (20 until 100).map(i => (i.toLong, unit(i).toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = emb }
    val top1 = Sim.projectRerank(t2).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = (0 until 10).count(q => top1(q.toLong) == 10L + q)
    assert(hits >= 9, s"planted twin found for only $hits/10 queries")
  }

  test("chunk windows tile each doc with stride overlap, last window clipped") {
    import spark.implicits._
    val words100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words100), (2L, "a b c")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = TrainData.chunkWindows(t2).collect()
    val d1 = rows.filter(_.getAs[Long]("doc_id") == 1L).sortBy(_.getAs[Long]("win"))
    // stride 48, size 64 over 100 words: [0,64) [48,100) [96,100)
    assert(d1.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))).toSeq ==
      Seq((0L, 64L), (48L, 100L), (96L, 100L)))
    // a short doc is one clipped window
    val d2 = rows.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))).toSeq ==
      Seq((0L, 3L)))
    // full corpus: every window non-empty and inside its doc
    TrainData.chunkWindows(t).collect().foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0 &&
        r.getAs[Long]("tok_end") > r.getAs[Long]("tok_start"))
    }
  }

  test("epoch mixing repeats by integer part and keeps the fraction deterministically") {
    val rows = TrainData.mixEpochs(t).collect()
    // src3 (factor 3.0): exactly 3 copies of every doc, epochs 0,1,2
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc("src3").groupBy(_.getAs[Long]("doc_id")).values.foreach { copies =>
      assert(copies.map(_.getAs[Long]("epoch")).sorted.toSeq == Seq(0L, 1L, 2L))
    }
    // src1 (factor 0.5): some docs dropped, kept docs appear once
    val src1Docs = bySrc("src1").groupBy(_.getAs[Long]("doc_id"))
    assert(src1Docs.values.forall(_.length == 1))
    val stats = TrainData.mixEpochsStats(t).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("realized")).toMap
    assert(stats("src3") == 3.0)
    assert(stats("src0") > 2.0 && stats("src0") < 3.0) // factor 2.5
    // unlisted sources (src4, src5) default to 1.0
    assert(stats("src4") == 1.0 && stats("src5") == 1.0)
    // partitioning independence
    val t2 = new graft.sources.Tables(spark, sf) {
      override def documents = t.documents.repartition(7)
    }
    val again = TrainData.mixEpochs(t2).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"))
    assert(rows.map(key).toSet == again.map(key).toSet)
  }

  test("bpe training learns the hand-computed merges in order") {
    import spark.implicits._
    // word dict: aaab ×3, ab ×1. Round 1: (a,a)=6 beats (a,b)=4 → 'aa'
    // (greedy-left: 'a a a b' → 'aa a b', not 'a aa b'). Round 2: (a,b)=4
    // beats (aa,a)=3 → 'ab'. Round 3: (aa,ab)=3 — the only pair left.
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val (merges, _) = TextAnalysis.bpeTrain(t2, rounds = 3)
    assert(merges == Seq((1, "a", "a", 6L), (2, "a", "b", 4L), (3, "aa", "ab", 3L)))
    // more rounds than mergeable pairs: stop clean, never crash
    val (all, _) = TextAnalysis.bpeTrain(t2, rounds = 10)
    assert(all.length == 3)
    // encode under the learned merges: every word is one token
    val enc = TextAnalysis.bpeEncode(t2).collect().head
    assert(enc.getAs[Long]("n_words") == 4L)
    assert(enc.getAs[Long]("bpe_tokens") == 4L)
    assert(enc.getAs[Double]("chars_per_token") == 3.5)
  }

  test("bpe merges on the corpus shrink tokens monotonically") {
    val merged = TextAnalysis.bpeMerges(t).collect()
    assert(merged.length == TextAnalysis.bpeMergeRounds)
    // counts never increase as rarer pairs get merged later... not strictly
    // monotone in general, but round 1 must be the global max
    val counts = merged.sortBy(_.getAs[Int]("round")).map(_.getAs[Long]("pair_count"))
    assert(counts.head == counts.max)
    // encoding with merges beats char-level: chars/token > 1 somewhere
    val enc = TextAnalysis.bpeEncode(t).collect()
    assert(enc.nonEmpty && enc.exists(_.getAs[Double]("chars_per_token") > 1.0))
  }

  test("quality classifier scores are bounded, thresholded, content-sensitive") {
    val rows = TextAnalysis.qualityClassifier(t).collect()
    assert(rows.length == t.documents.count())
    rows.foreach { r =>
      val s = r.getAs[Double]("qc_score")
      assert(s >= 0.0 && s <= 1.0, s"score out of range: $s")
      assert(r.getAs[Boolean]("keep") == (s >= TextAnalysis.qcKeepTau))
    }
    // hashed-feature scores must actually discriminate documents
    assert(rows.map(_.getAs[Double]("qc_score")).distinct.length > 10)
  }

  test("quality classifier: identical content scores identically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words entirely here")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val byId = TextAnalysis.qualityClassifier(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("qc_score")).toMap
    assert(byId(1L) == byId(2L))
  }

  test("shard assignment: balanced contiguous permutation, partitioning-independent") {
    val rows = TrainData.shardAssign(t).collect()
    assert(rows.length == t.documents.count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val stats = TrainData.shardAssignStats(t).collect()
    assert(stats.forall(_.getAs[Boolean]("contiguous")))
    val counts = stats.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= counts.min * 3, s"hash shards unbalanced: ${counts.toSeq}")
    // the training order must not depend on how the input was partitioned
    val t2 = new graft.sources.Tables(spark, sf) {
      override def documents = t.documents.repartition(7)
    }
    val again = TrainData.shardAssign(t2).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos"))
    assert(rows.map(key).toSet == again.map(key).toSet)
  }

  test("random projection: basis vector reads its matrix row, norms concentrate") {
    import spark.implicits._
    val d0 = 5
    val v = Array.fill(64)(0.0); v(d0) = 1.0
    val one = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = one }
    val r = Sim.randomProjection(t2).collect().head
    (0 until Sim.projDims).foreach { j =>
      val expect = math.floor(Sim.projSign(d0, j) * (math.sqrt(3.0) / 4.0) * 10000) / 10000
      assert(r.getAs[Double](s"p$j") == expect, s"p$j mismatch")
    }
    // JL concentration: the norm ratio sits near 1 on the real corpus
    val ratios = Sim.randomProjection(t).collect().map(_.getAs[Double]("norm_ratio"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"norm ratio mean drifted: $mean")
  }

  test("url dedup collapses tracking/case/port/slash/fragment variants") {
    val rows = Dedup.urlDedup(t).collect()
    assert(rows.length == t.documents.count())
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 20 and 220 differ in host case, default port, trailing slash,
    // utm params and fragment — the same canonical page
    assert(byId(20L).getAs[String]("canon_url") ==
      "http://www.example20.com/articles/item20?id=20")
    assert(byId(220L).getAs[String]("canon_url") ==
      byId(20L).getAs[String]("canon_url"))
    assert(byId(20L).getAs[Boolean]("keep") && !byId(220L).getAs[Boolean]("keep"))
    // non-default ports survive canonicalization
    assert(byId(41L).getAs[String]("canon_url").contains(":8080"))
    // keep is exactly min-per-canonical-group
    rows.groupBy(_.getAs[String]("canon_url")).values.foreach { g =>
      val minId = g.map(_.getAs[Long]("doc_id")).min
      g.foreach(r =>
        assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("doc_id") == minId)))
    }
  }

  test("gopher quality rules fire individually and keep is their conjunction") {
    import spark.implicits._
    val good = "the cat sat and the dog ran to be of that have with " +
      ("plain words here again " * 12) // 60+ words, all alpha, stopword-rich
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "short doc only five words"),           // fails ok_words
      (3L, ("the and " + "# " * 20) * 5),          // symbol-heavy
      (4L, ("the of " + "123 456 789 " * 30))      // numeric words sink alpha_frac
    ).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val byId = TextAnalysis.gopherQuality(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("ok_words") && !byId(2L).getAs[Boolean]("keep"))
    assert(!byId(3L).getAs[Boolean]("ok_symbols"))
    assert(!byId(4L).getAs[Boolean]("ok_alpha"))
    // every keep is exactly the conjunction of its rule verdicts
    TextAnalysis.gopherQuality(t).collect().foreach { r =>
      val expect = r.getAs[Boolean]("ok_words") && r.getAs[Boolean]("ok_mean_len") &&
        r.getAs[Boolean]("ok_symbols") && r.getAs[Boolean]("ok_alpha") &&
        r.getAs[Boolean]("ok_stopwords")
      assert(r.getAs[Boolean]("keep") == expect)
    }
  }

  test("corpus stats partition the corpus and agree with their own totals") {
    val rows = TrainData.corpusStats(t).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    rows.foreach { r =>
      val (nd, nt) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("mean_tokens") ==
        math.floor(nt * 10000.0 / nd) / 10000)
      val sf2 = r.getAs[Double]("short_frac")
      assert(sf2 >= 0.0 && sf2 <= 1.0)
    }
  }

  test("dsir importance prefers target-like documents and excludes the target") {
    import spark.implicits._
    // targets (ids % 17 == 0) all speak "zebra quagga okapi"; raw doc 1
    // speaks the same vocabulary, raw doc 2 a disjoint one — the importance
    // weight must rank 1 above 2, and the targets themselves never score
    val tgt = "zebra quagga okapi zebra quagga okapi zebra quagga"
    val docs = Seq(
      (0L, tgt), (17L, tgt), (34L, tgt),
      (1L, "zebra quagga okapi quagga zebra okapi"),
      (2L, "girder flange rivet gusset truss purlin")
    ).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = TrainData.dsirImportance(t2).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("log_weight") > byId(2L).getAs[Double]("log_weight"))
    assert(byId(1L).getAs[Boolean]("selected"))
    assert(!byId(2L).getAs[Boolean]("selected"))
  }

  test("knn graph edges stay in-cluster with contiguous ranks and monotone cosine") {
    val edges = Sim.knnGraph(t).collect()
    val cluster = Sim.clusterAssign(t).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    edges.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, es) =>
      val sorted = es.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= Sim.knnK)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      // non-increasing similarity down the rank order
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("cos_sim") >= b.getAs[Double]("cos_sim"))
        case _ =>
      }
      es.foreach { e =>
        assert(e.getAs[Long]("cluster") == cluster(v))
        assert(cluster(e.getAs[Long]("neighbor_id")) == cluster(v))
        assert(e.getAs[Long]("neighbor_id") != v)
      }
    }
  }

  test("keep-best dedup keeps exactly the highest-quality member per group") {
    val rows = Dedup.keepBest(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("group_id")).values.foreach { g =>
      assert(g.count(_.getAs[Boolean]("keep")) == 1)
      val keeper = g.find(_.getAs[Boolean]("keep")).get
      val best = g.map(r =>
        (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id"))).min
      assert((-keeper.getAs[Double]("quality"), keeper.getAs[Long]("doc_id")) == best)
      g.foreach(r => assert(r.getAs[Long]("group_size") == g.length))
    }
  }

  test("pq encoding reconstructs codebook vectors exactly and bounds codes") {
    val rows = Sim.pqEncode(t).collect()
    assert(rows.length == t.spark.read
      .parquet(s"$sf/embeddings.parquet").count())
    rows.foreach { r =>
      (0 until Sim.pqM).foreach { m =>
        val c = r.getAs[Long](s"code$m")
        assert(c >= 0 && c < Sim.pqK)
      }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
    // a vector that IS a sub-centroid encodes to itself with zero error
    rows.filter(_.getAs[Long]("vec_id") < Sim.pqK).foreach { r =>
      assert(r.getAs[Double]("recon_err") == 0.0)
      (0 until Sim.pqM).foreach(m =>
        assert(r.getAs[Long](s"code$m") == r.getAs[Long]("vec_id")))
    }
  }

  test("trained pq codebook cuts reconstruction error at adc-recall parity") {
    val base = t.spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val det = Sim.pqEncode(t).collect()
    val tr = Sim.pqEncodeTrained(t).collect()
    assert(tr.length == det.length)
    tr.foreach { r =>
      (0 until Sim.pqM).foreach { m =>
        val c = r.getAs[Long](s"code$m")
        assert(c >= 0 && c < Sim.pqK)
      }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
    // the trained codebook must not lose to "the first pqK vectors"
    val detErr = det.map(_.getAs[Double]("recon_err")).sum
    val trErr = tr.map(_.getAs[Double]("recon_err")).sum
    assert(trErr <= detErr,
      f"trained total recon error $trErr%.2f worse than deterministic $detErr%.2f")
    // ADC recall audit, driver-side: reconstruct every vector from its
    // codes under each codebook, rank by exact squared L2 to each query's raw
    // vector (= the ADC distance), compare top-k overlap with the exact
    // neighbor sets. Trained must be at parity or better.
    val trBooks = Sim.pqTrainedCenters(t)
    def trWord(m: Int, c: Long): Array[Double] = trBooks(m)(c.toInt)
    def detWord(m: Int, c: Long): Array[Double] = {
      val off = m * Sim.pqSubDim
      base(c).slice(off, off + Sim.pqSubDim)
    }
    def recon(row: org.apache.spark.sql.Row,
              word: (Int, Long) => Array[Double]): Array[Double] =
      (0 until Sim.pqM).flatMap(m =>
        word(m, row.getAs[Long](s"code$m"))).toArray
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def topk(q: Long, dist: Long => Double): Set[Long] =
      base.keys.filter(_ != q).toSeq
        .sortBy(id => (dist(id), id)).take(Sim.topK).toSet
    val queries = base.keys.filter(_ < Sim.nQueries).toSeq
    def recallOf(rows: Array[org.apache.spark.sql.Row],
                 word: (Int, Long) => Array[Double]): Int = {
      val rec = rows.map(r => r.getAs[Long]("vec_id") -> recon(r, word)).toMap
      queries.map { q =>
        val exact = topk(q, id => l2(base(q), base(id)))
        val adc = topk(q, id => l2(base(q), rec(id)))
        (exact intersect adc).size
      }.sum
    }
    val detRecall = recallOf(det, detWord)
    val trRecall = recallOf(tr, trWord)
    assert(trRecall >= detRecall,
      s"trained ADC recall $trRecall below deterministic $detRecall")
  }

  test("vector index sink lays out one directory per list and proves readback") {
    val out = java.nio.file.Files.createTempDirectory("graft_vindex_spec").toString
    val stats = Sim.vectorIndexSink(t, Some(out)).collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_code_cells"))).toMap
    // one directory per inverted list
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cluster=")).toSet
    assert(dirs == stats.keySet.map(c => s"cluster=$c"),
      s"list directories $dirs != stats keys ${stats.keySet}")
    // total vectors conserved
    assert(stats.values.map(_._1).sum ==
      t.spark.read.parquet(s"$sf/embeddings.parquet").count())
    // a single-list read prunes to that directory and agrees with stats
    val someCluster = stats.keys.min
    val one = t.spark.read.parquet(out)
      .filter(col("cluster") === someCluster)
    assert(one.count() == stats(someCluster)._1)
    // the probe must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan predicate
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\].*"),
      s"probe did not prune partitions:\n$plan")
    // and the list's own directory re-aggregates to the same count
    assert(t.spark.read.parquet(s"$out/cluster=$someCluster").count() ==
      stats(someCluster)._1)
    // stored code cells match the in-plan encode's cells per cluster —
    // a column reorder or truncation in the written files would differ
    val key = concat_ws(":", (0 until Sim.pqM).map(m => col(s"code$m")): _*)
    val inPlan = Sim.pqEncode(t)
      .join(Sim.clusterAssign(t).select(col("vec_id"), col("cluster")), "vec_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), countDistinct(key).as("cells"))
      .collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cells"))).toMap
    assert(stats == inPlan,
      s"stored layout diverged from the in-plan encode: $stats vs $inPlan")
  }

  test("stored-index adc search equals the in-plan search exactly") {
    val stored = Sim.pqAdcTopKStored(t).collect().map(_.toSeq).toSet
    val inPlan = Sim.pqAdcTopK(t).collect().map(_.toSeq).toSet
    assert(stored == inPlan,
      "searching the persisted code table diverged from the in-plan encode")
  }

  test("pq adc search ranks a planted exact twin first at zero distance") {
    import spark.implicits._
    // vec 20 IS vec 3 (a query): it encodes to query 3's own codes, so its
    // ADC distance to query 3 is exactly the query's table self-distance — 0
    val base = t.spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twin = base.filter(col("vec_id") === 3)
      .select(lit(20L).as("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") =!= 20).union(twin)
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = planted }
    val rows = Sim.pqAdcTopK(t2).collect()
    val q3 = rows.filter(_.getAs[Long]("query_id") == 3L)
      .sortBy(_.getAs[Int]("rank"))
    assert(q3.head.getAs[Long]("neighbor_id") == 20L)
    assert(q3.head.getAs[Double]("adc_dist") == 0.0)
    // structural invariants on every query: k rows, contiguous ranks,
    // non-decreasing distance, no self-matches
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length == Sim.topK)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to Sim.topK))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("adc_dist") <= b.getAs[Double]("adc_dist"))
        case _ =>
      }
      g.foreach(r =>
        assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
  }

  test("dedup audit counts are mutually consistent and catch a planted dup") {
    val r = Dedup.dedupAudit(t).collect().head
    val (ne, nc, np) = (r.getAs[Long]("n_exact"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_predicted"))
    val (nch, nph) = (r.getAs[Long]("n_cand_hits"), r.getAs[Long]("n_pred_hits"))
    assert(np <= nc, "verified subset exceeds the candidate set")
    assert(nph <= np && nph <= ne)
    assert(nch <= nc && nch <= ne)
    assert(r.getAs[Double]("precision_pred") ==
      math.floor(nph * 10000.0 / np) / 10000)
    assert(r.getAs[Double]("recall_pred") ==
      math.floor(nph * 10000.0 / ne) / 10000)
    // planted corpus: one true dup pair among unrelated docs -> the audit
    // reads exactly one pair on every axis
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"),
      (4L, "sun moon star cloud rain wind")
    ).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val p = Dedup.dedupAudit(t2).collect().head
    assert(p.getAs[Long]("n_exact") == 1)
    assert(p.getAs[Long]("n_pred_hits") == 1)
    assert(p.getAs[Double]("recall_pred") == 1.0)
    // dup-free corpus: every count is 0 (not NULL — the oracle's count(*)
    // reads 0), only the undefined ratios go NULL
    val noDups = Seq(
      (1L, "one two three four five six"),
      (2L, "sun moon star cloud rain wind")
    ).toDF("doc_id", "text")
    val t3 = new graft.sources.Tables(spark, sf) { override def documents = noDups }
    val z = Dedup.dedupAudit(t3).collect().head
    Seq("n_exact", "n_candidates", "n_predicted", "n_cand_hits", "n_pred_hits")
      .foreach(c => assert(!z.isNullAt(z.fieldIndex(c)) && z.getAs[Long](c) == 0L,
        s"$c should be 0 on a dup-free corpus"))
    assert(z.isNullAt(z.fieldIndex("precision_pred")))
    assert(z.isNullAt(z.fieldIndex("recall_pred")))
  }

  test("pq cell dedup groups planted twins and keeps the lowest id") {
    import spark.implicits._
    val base = t.spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twin = base.filter(col("vec_id") === 3)
      .select(lit(600L).as("vec_id"), col("embedding"))
    val planted = base.union(twin)
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = planted }
    val byId = Sim.pqDedup(t2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(3L).getAs[String]("code_key") == byId(600L).getAs[String]("code_key"))
    assert(byId(3L).getAs[Long]("n_same_code") >= 2)
    assert(byId(3L).getAs[Boolean]("keep"))
    assert(!byId(600L).getAs[Boolean]("keep"))
    // exactly one keeper per cell
    byId.values.groupBy(_.getAs[String]("code_key")).values.foreach { g =>
      assert(g.count(_.getAs[Boolean]("keep")) == 1)
      assert(g.forall(_.getAs[Long]("n_same_code") == g.size))
    }
  }

  test("residual pq self-encodes its codebook and wins on clustered data") {
    import spark.implicits._
    // the real corpus embeddings are near-orthogonal noise (no cluster
    // structure), where residual coding CANNOT win — the claim needs a
    // planted clustered corpus: 8 well-separated centroids, data =
    // centroid + small deterministic perturbation
    def cent(k: Int): Array[Double] =
      Array.tabulate(64)(i => if (i == k * 8) 10.0 else 0.0)
    def noise(id: Long): Array[Double] =
      Array.tabulate(64)(i => 0.3 * math.sin(id * 64 + i))
    val rows = (0L until 124L).map { id =>
      val v =
        if (id < 8) cent(id.toInt)
        else {
          val k = (id % 8).toInt
          cent(k).zip(noise(id)).map { case (a, b) => a + b }
        }
      (id, v.toSeq)
    }
    val planted = rows.toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = planted }
    val res = Sim.pqResidual(t2).collect()
    val glob = Sim.pqEncode(t2).collect()
    // codebook-source vectors (the pqK lowest non-centroid ids)
    // self-encode at zero error
    res.filter { r =>
      val id = r.getAs[Long]("vec_id")
      id >= Sim.nCentroids && id < Sim.nCentroids + Sim.pqK
    }.foreach { r =>
      assert(r.getAs[Double]("recon_err") == 0.0)
      (0 until Sim.pqM).foreach(m =>
        assert(r.getAs[Long](s"code$m") == r.getAs[Long]("vec_id")))
    }
    // every vector routes to its true cluster
    res.foreach(r =>
      assert(r.getAs[Long]("cluster") == r.getAs[Long]("vec_id") % 8))
    // and on clustered data the residual coding reconstructs better
    val mr = res.map(_.getAs[Double]("recon_err")).sum / res.length
    val mg = glob.map(_.getAs[Double]("recon_err")).sum / glob.length
    assert(mr < mg, s"residual coding lost on clustered data: $mr vs $mg")
  }

  test("residual ivf-pq search retrieves in-cluster neighbors on clustered data") {
    import spark.implicits._
    def cent(k: Int): Array[Double] =
      Array.tabulate(64)(i => if (i == k * 8) 10.0 else 0.0)
    def noise(id: Long): Array[Double] =
      Array.tabulate(64)(i => 0.3 * math.sin(id * 64 + i))
    val rows = (0L until 124L).map { id =>
      val v =
        if (id < 8) cent(id.toInt)
        else cent((id % 8).toInt).zip(noise(id)).map { case (a, b) => a + b }
      (id, v.toSeq)
    }
    val planted = rows.toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = planted }
    val out = Sim.ivfPqResidualTopK(t2).collect()
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("adc_dist") <= b.getAs[Double]("adc_dist"))
        case _ =>
      }
      g.foreach(r => assert(r.getAs[Long]("neighbor_id") != q))
      // separated clusters: the best residual-coded neighbor shares the
      // query's true cluster
      assert(sorted.head.getAs[Long]("neighbor_id") % 8 == q % 8,
        s"query $q rank-1 left its cluster")
    }
  }

  test("trained residual ivf-pq matches the deterministic search's recall") {
    import spark.implicits._
    // same planted clustered corpus as the deterministic residual tests
    def cent(k: Int): Array[Double] =
      Array.tabulate(64)(i => if (i == k * 8) 10.0 else 0.0)
    def noise(id: Long): Array[Double] =
      Array.tabulate(64)(i => 0.3 * math.sin(id * 64 + i))
    val raw = (0L until 124L).map { id =>
      val v =
        if (id < 8) cent(id.toInt)
        else cent((id % 8).toInt).zip(noise(id)).map { case (a, b) => a + b }
      (id, v)
    }
    val planted = raw.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = planted }
    val trained = Sim.ivfPqResidualTrainedTopK(t2).collect()
    val det = Sim.ivfPqResidualTopK(t2).collect()
    // structural scan invariants
    trained.groupBy(_.getAs[Long]("query_id")).foreach { case (q, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("adc_dist") <= b.getAs[Double]("adc_dist"))
        case _ =>
      }
      g.foreach(r => assert(r.getAs[Long]("neighbor_id") != q))
      // trained centroids must still keep rank-1 inside the true cluster
      assert(sorted.head.getAs[Long]("neighbor_id") % 8 == q % 8,
        s"query $q rank-1 left its true cluster under the trained index")
    }
    // recall vs exact L2 neighbors — compared on the REAL corpus, where
    // neither codebook holds exact corpus members (on the planted corpus
    // the deterministic book IS 16 true residuals and ids 0-7 ARE the
    // true centroids, an advantage no trained build can match by design)
    val realVecs = t.spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.groupBy(_.getAs[Long]("query_id")).map { case (q, g) =>
        val got = g.map(_.getAs[Long]("neighbor_id")).toSet
        val exact = realVecs.keys.filter(_ != q).toSeq
          .sortBy(id => (l2(realVecs(q), realVecs(id)), id))
          .take(g.length).toSet
        (got intersect exact).size
      }.sum
    val trR = recallOf(Sim.ivfPqResidualTrainedTopK(t).collect())
    val detR = recallOf(Sim.ivfPqResidualTopK(t).collect())
    info(s"real-corpus recall: trained=$trR deterministic=$detR")
    assert(trR >= detR,
      s"trained residual IVF-PQ recall $trR below deterministic $detR on the real corpus")
  }

  test("exact incremental admission gates index hits and in-batch dups") {
    import spark.implicits._
    // ids 1-12 are the stored index (5·id > 4·16 ⇒ delta = ids 13-16):
    // 13 duplicates an index doc, 14+15 duplicate each other, 16 is unique
    val docs = ((1L to 12L).map(i => (i, s"x$i")) ++ Seq(
      (13L, "  X1 "), // normalizes to index doc 1's content
      (14L, "fresh content here"), (15L, "fresh  CONTENT here"),
      (16L, "truly unique text"))).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.exactIncremental(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("in_index"), r.getAs[Long]("n_prior"),
          r.getAs[Boolean]("keep"))).toMap
    assert(rows.keySet == Set(13L, 14L, 15L, 16L))
    assert(rows(13L) == ((true, 0L, false)), s"index dup admitted: ${rows(13L)}")
    assert(rows(14L) == ((false, 0L, true)))
    assert(rows(15L) == ((false, 1L, false)), s"in-batch dup admitted: ${rows(15L)}")
    assert(rows(16L) == ((false, 0L, true)))
  }

  test("paragraph strip removes planted boilerplate and keeps unique content") {
    import spark.implicits._
    // 8-word boilerplate chunk shared by 4 docs (>= paraMinDf), each doc
    // followed by its own unique 8-word chunk
    val boiler = "copyright footer all rights reserved contact us now"
    val docs = (1L to 4L).map { i =>
      (i, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
    }.toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = Dedup.paragraphStrip(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("cleaned_text"))).toMap
    (1L to 4L).foreach { i =>
      val (n, kept, cleaned) = rows(i)
      assert(n == 2 && kept == 1)
      assert(cleaned == s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h",
        s"doc $i cleaned='$cleaned'")
    }
    // real corpus: kept <= chunks, order preserved (cleaned is a
    // subsequence of the doc's own chunk stream -> word count matches)
    Dedup.paragraphStrip(t).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("gate agreement table is consistent with both standalone gates") {
    val agg = TextAnalysis.qualityGateAgreement(t).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    val qcKeep = TextAnalysis.qualityClassifier(t).collect()
      .count(_.getAs[Boolean]("keep")).toLong
    val gKeep = TextAnalysis.gopherQuality(t).collect()
      .count(_.getAs[Boolean]("keep")).toLong
    assert(agg.filter(_.getAs[Boolean]("qc_keep"))
      .map(_.getAs[Long]("n_docs")).sum == qcKeep)
    assert(agg.filter(_.getAs[Boolean]("gopher_keep"))
      .map(_.getAs[Long]("n_docs")).sum == gKeep)
    agg.foreach(r => assert(r.getAs[Boolean]("agree") ==
      (r.getAs[Boolean]("qc_keep") == r.getAs[Boolean]("gopher_keep"))))
  }

  test("incremental corpus stats fold equals the full rescan") {
    // the card keys genuinely span increments (doc_id mod 3 slices)
    val spanning = t.documents
      .select(col("source"), col("lang"), (col("doc_id") % 3).as("s"))
      .distinct().groupBy("source", "lang").count().collect()
    // single-doc card keys can't span; the bulk of the keys must, or the
    // fold test would be vacuous
    assert(spanning.count(_.getAs[Long]("count") >= 2) * 2 > spanning.length,
      "most (source, lang) keys should span at least two increments")
    val full = TrainData.corpusStats(t).collect().map(_.toSeq).toSet
    val inc = TrainData.corpusStatsInc(t).collect().map(_.toSeq).toSet
    assert(inc == full, "incremental card diverged from the full rescan")
  }

  test("char entropy is exact on known distributions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),            // one symbol: entropy 0
      (2L, "aabb"),            // two equiprobable symbols: exactly 1 bit
      (3L, "abcdefgh"),        // 8 uniform symbols: exactly 3 bits
      (4L, "aab"))             // H = log2(3) - (2*log2 2)/3 = 0.9182... -> 0.91
      .toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = TextAnalysis.charEntropy(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy"))).toMap
    assert(rows(1L) == ((4L, 1L, 0.0)))
    assert(rows(2L) == ((4L, 2L, 1.0)))
    assert(rows(3L) == ((8L, 8L, 3.0)))
    assert(rows(4L) == ((3L, 2L, 0.91)))
    // corpus-wide sanity on real data: entropy within [0, log2(n)]
    val real = TextAnalysis.charEntropy(t).collect()
    assert(real.length == t.documents.count())
    real.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val n = r.getAs[Long]("n_chars")
      assert(h >= 0.0 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("perplexity buckets split each language into balanced ordered tertiles") {
    val rows = TextAnalysis.perplexityBucket(t).collect()
    assert(rows.length == t.documents.count())
    rows.groupBy(_.getAs[String]("lang")).values.foreach { g =>
      val sizes = g.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.size).toMap
      if (g.size >= 3) {
        assert(sizes.keySet == Set(1, 2, 3))
        assert(sizes.values.max - sizes.values.min <= 1)
        val head = g.filter(_.getAs[String]("band") == "head")
          .map(_.getAs[Double]("mean_nll"))
        val tail = g.filter(_.getAs[String]("band") == "tail")
          .map(_.getAs[Double]("mean_nll"))
        assert(head.max <= tail.min ||
          g.map(_.getAs[Double]("mean_nll")).distinct.length < 3)
      }
    }
  }

  test("llm curation chain survivors pass every standalone gate") {
    val out = TrainData.curationLlm(t).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    // exact-dedup winners only
    val winners = Dedup.exact(t).collect().map(_.getAs[Long]("keep_id")).toSet
    assert(ids.subsetOf(winners))
    // never an eval doc
    assert(ids.forall(_ % TrainData.contamEvalMod != 0))
    // every survivor clears the full Gopher battery
    val gopher = TextAnalysis.gopherQuality(t).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    assert(ids.subsetOf(gopher))
    // and the DSIR selection, carrying its weight into the manifest
    val dsir = TrainData.dsirImportance(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("selected"), r.getAs[Double]("log_weight"))).toMap
    out.foreach { r =>
      val (sel, lw) = dsir(r.getAs[Long]("doc_id"))
      assert(sel)
      assert(r.getAs[Double]("log_weight") == lw)
      assert(r.getAs[Long]("bin") >= 0)
    }
  }

  test("budgeted mix fills each source quota prefix-wise and stays in budget") {
    val rows = TrainData.mixBudget(t).collect()
    assert(rows.length == t.documents.count())
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val quota = g.head.getAs[Long]("quota")
      g.foreach(r => assert(r.getAs[Long]("quota") == quota))
      val kept = g.filter(_.getAs[Boolean]("keep"))
      assert(kept.map(_.getAs[Long]("tok")).sum <= quota)
      // keep is exactly the fill-order prefix: every kept cum <= every
      // dropped cum within the source
      val dropped = g.filterNot(_.getAs[Boolean]("keep"))
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_.getAs[Long]("cum")).max <
          dropped.map(_.getAs[Long]("cum")).min)
    }
    // quotas sum to the budget, up to one floor per source
    val quotas = rows.groupBy(_.getAs[String]("source"))
      .map(_._2.head.getAs[Long]("quota")).sum
    assert(quotas <= TrainData.mixBudgetTokens)
    assert(quotas > TrainData.mixBudgetTokens - rows.map(_.getAs[String]("source")).distinct.length)
  }

  test("langid agreement matrix partitions the corpus with consistent flags") {
    val rows = TextAnalysis.langIdAgreement(t).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[String]("pred_lang") == r.getAs[String]("pred_lang_ngram")))
      assert(r.getAs[Long]("n_word_correct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_ngram_correct") <= r.getAs[Long]("n_docs"))
    }
  }

  test("temperature mixing boosts the tail and damps the head") {
    val rows = TrainData.mixTemperature(t).collect()
    assert(rows.length > 1)
    val byBoost = rows.sortBy(_.getAs[Long]("n_docs"))
    // the smallest source gains share, the largest loses it (tau > 1)
    assert(byBoost.head.getAs[Double]("boost") >= 1.0,
      s"tail source not boosted: ${byBoost.head}")
    assert(byBoost.last.getAs[Double]("boost") <= 1.0,
      s"head source not damped: ${byBoost.last}")
    // keep rates normalize to the most-boosted source
    assert(rows.map(_.getAs[Double]("keep_rate")).max == 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("raw_share") > 0 && r.getAs[Double]("raw_share") <= 1)
      assert(r.getAs[Double]("temp_share") > 0 && r.getAs[Double]("temp_share") <= 1)
    }
  }

  test("ivf-pq probes its clusters only and keeps useful full-scan recall") {
    val full = Sim.pqAdcTopK(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val routed = Sim.ivfPqTopK(t).collect()
    val cluster = Sim.clusterAssign(t).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    routed.groupBy(_.getAs[Long]("query_id")).foreach { case (q, g) =>
      assert(g.length <= Sim.topK)
      // every neighbor sits in one of at most ivfPqProbes distinct clusters
      val probed = g.map(r => cluster(r.getAs[Long]("neighbor_id"))).toSet
      assert(probed.size <= Sim.ivfPqProbes, s"query $q probed $probed")
    }
    // recall vs the full ADC scan stays well above the 3/8-lists floor
    val hit = routed.count(r =>
      full((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hit.toDouble / full.size
    assert(recall >= 0.3, s"ivf-pq recall collapsed: $recall")
  }

  test("dhash gradients and phash dedup pair identical images") {
    import spark.implicits._
    // constant raster: no strict left>right gradient anywhere -> hash 0
    val flat = Array.fill(64)(100.toByte)
    assert(Multimodal.dhash56(8, 8, flat, 0) == 0L)
    // strictly decreasing rows: every comparison fires EXCEPT grid column
    // 0 — downsampling 8 pixels onto 9 sample columns maps c=0 and c=1
    // onto the same pixel (px = c*7/8), so the first gradient of each row
    // is a tie by construction
    val falling = Array.tabulate(64)(i => (255 - (i % 8) * 30).toByte)
    val col0Bits = (0 until 7).map(r => 1L << (r * 8)).sum
    assert(Multimodal.dhash56(8, 8, falling, 0) == ((1L << 56) - 1) - col0Bits)
    // ids 45 and 90 share dims (both % 9 == 0, % 5 == 0) and text -> the
    // SAME perceptual hash, so banding must surface the pair on both rows
    val docs = Seq(
      (45L, "repeated payload body words here"),
      (90L, "repeated payload body words here"),
      (2L, "a completely different document text payload")
    ).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val byId = Multimodal.phashDedup(t2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(45L).getAs[Long]("dhash") == byId(90L).getAs[Long]("dhash"))
    assert(byId(45L).getAs[Long]("n_near") >= 1L)
    assert(byId(90L).getAs[Long]("n_near") >= 1L)
    byId.values.foreach { r =>
      val h = r.getAs[Long]("dhash")
      assert(h >= 0L && h < (1L << 56))
    }
  }

  test("filtered ivf-pq stays in-label and shares the index math") {
    val labels = t.embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val filtered = Sim.ivfPqTopKFiltered(t).collect()
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      // pre-filter semantics: every neighbor carries the query's label
      assert(labels(r.getAs[Long]("neighbor_id")) ==
        r.getAs[Long]("label").toInt)
      assert(labels(r.getAs[Long]("query_id")) == r.getAs[Long]("label").toInt)
    }
    // ranks are dense 1..k' per query
    filtered.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to g.length))
    }
    // same index math: any (query, neighbor) pair both faces surface must
    // carry the SAME adc distance — the filter changes the candidate set,
    // never the arithmetic
    val unfiltered = Sim.ivfPqTopK(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adc_dist")).toMap
    val shared = filtered.flatMap { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      unfiltered.get(k).map(d => (k, r.getAs[Double]("adc_dist"), d))
    }
    shared.foreach { case (k, df, du) =>
      assert(df == du, s"pair $k scored differently across faces: $df vs $du")
    }
  }

  test("text index sink buckets by the portable term hash and prunes probes") {
    import graft.operators.Dedup
    val out = java.nio.file.Files.createTempDirectory("graft_tindex_spec").toString
    val stats = TrainData.textIndexSink(t, Some(out)).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_postings"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tf"))).toMap
    // every stored row sits in ITS term's bucket — the routing invariant
    // a serving probe relies on (a misplaced posting is unfindable)
    val misplaced = t.spark.read.parquet(out)
      .filter(col("bucket") =!=
        pmod(Dedup.portableHash(col("term")), lit(TrainData.textIndexBuckets)))
      .count()
    assert(misplaced == 0, s"$misplaced postings in the wrong bucket")
    // a term probe prunes to one directory at the scan
    val someBucket = stats.keys.min
    val one = t.spark.read.parquet(out).filter(col("bucket") === someBucket)
    assert(one.count() == stats(someBucket)._1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"probe did not prune partitions:\n$plan")
    // the stored index re-aggregates to the in-plan postings build: total
    // tf equals the corpus token count, and df rides every posting row
    // consistently with the per-bucket distinct-term counts
    val toks = Dedup.withWords(t.documents)
      .agg(sum(size(col("w")))).head.getLong(0)
    assert(stats.values.map(_._4).sum == toks,
      "stored tf total != corpus token count")
    val dfBad = t.spark.read.parquet(out).groupBy("term")
      .agg(countDistinct(col("doc_id")).as("n"), max(col("df")).as("dfmax"),
        min(col("df")).as("dfmin"))
      .filter(col("n") =!= col("dfmax") || col("n") =!= col("dfmin")).count()
    assert(dfBad == 0, "stored df column inconsistent with the posting rows")
  }

  test("bm25 ranks a lexical twin first, excludes self, scores descend") {
    import spark.implicits._
    // query doc 0 carries rare terms; doc 100 repeats them densely and in
    // a SHORT doc (max tf-norm), doc 101 shares one term, fillers share
    // none of the rare terms (only the common 'pad' tokens)
    val docs = (Seq(
      (0L, "zebra quark flux pad pad"),
      (100L, "zebra quark flux zebra quark"),
      (101L, "zebra pad pad pad pad pad pad"),
      (1L, "pad pad nothing else here")) ++
      (2 to 40).map(i => (i.toLong + 200, s"pad pad filler f$i g$i h$i"))).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val rows = TrainData.bm25TopKDocs(t2).collect()
    val q0 = rows.filter(_.getAs[Long]("query_id") == 0L)
    assert(q0.nonEmpty && q0.head.getAs[Long]("doc_id") == 100L,
      s"lexical twin must rank first: ${q0.mkString(",")}")
    // 101 shares only 'zebra'+'pad'; it must score below 100 but above
    // the no-rare-term fillers
    assert(q0.map(_.getAs[Long]("doc_id")).indexOf(101L) == 1)
    rows.foreach(r => assert(r.getAs[Long]("doc_id") != r.getAs[Long]("query_id")))
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      val scores = sorted.map(_.getAs[Long]("score_q6"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
    }
  }

  test("filtered ann matches a per-label brute force and never crosses labels") {
    val labels = t.embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = Sim.cosineTopKFiltered(t).collect()
    rows.foreach { r =>
      // every neighbor shares the query's label (pre-filter, not post-)
      assert(labels(r.getAs[Long]("neighbor_id")) == r.getAs[Long]("label").toInt)
      assert(labels(r.getAs[Long]("query_id")) == r.getAs[Long]("label").toInt)
    }
    // per query: the result IS the exact top-k of the same-label subset —
    // proven against an in-spec brute force over the collected vectors
    val vecs: Map[Long, Array[Double]] = t.embeddings.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, g) =>
      val want = vecs.keys.filter(v => v != qid && labels(v) == labels(qid))
        .map(v => (v, cos(vecs(qid), vecs(v))))
        .toSeq.sortBy { case (v, c) => (-c, v) }
        .take(Sim.topK).map(_._1)
      val got = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      assert(got == want, s"query $qid: got $got want $want")
    }
  }

  test("vector index upsert equals the from-scratch build list for list") {
    val full = Sim.vectorIndexSink(t).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_code_cells"))).sorted
    val updir = java.nio.file.Files.createTempDirectory("graft_vupsert").toString + "/idx"
    val upserted = Sim.vectorIndexUpsert(t, Some(updir)).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_code_cells"))).sorted
    assert(upserted.sameElements(full))
    // the append really happened as an append: the upsert directory holds
    // base AND delta files, and the delta ids are present post-append
    val stored = spark.read.parquet(updir)
    val maxId = t.embeddings.agg(max(col("vec_id"))).head.getLong(0)
    val deltaCount = stored.filter(col("vec_id") * 5 > maxId * 4).count()
    assert(stored.count() == t.embeddings.count())
    assert(deltaCount > 0)
  }

  test("soft weight covers every doc once and inverts the group size") {
    val rows = Dedup.softWeight(t).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.length == t.documents.count())
    val groups = Dedup.dupGroups(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_id"), r.getAs[Long]("group_size"))).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val size = r.getAs[Long]("group_size")
      groups.get(id) match {
        case Some((gid, gsz)) =>
          assert(r.getAs[Long]("group_id") == gid && size == gsz)
        case None =>
          assert(size == 1L && r.getAs[Long]("group_id") == id)
      }
      assert(r.getAs[Double]("weight") ==
        math.floor((1.0 / size) * 10000) / 10000)
    }
  }

  test("adc refine recovers exact-ranking accuracy at least as well as adc") {
    val exact = Sim.cosineTopK(t).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = rows.groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet)
      val hits = byQ.map { case (q, got) => (got & exact(q)).size }.sum
      hits.toDouble / (exact.size * Sim.topK)
    }
    val refined = Sim.adcRefineTopK(t).collect()
    val plain = Sim.pqAdcTopK(t).collect()
    assert(recall(refined) >= recall(plain),
      s"refine recall ${recall(refined)} below plain ADC ${recall(plain)}")
    // shape: k rows per query, ranks contiguous, no self-matches, and the
    // exact cosine really re-ranked (scores descend within each query)
    refined.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      assert(sorted.length == Sim.topK)
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    refined.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
  }

  test("unimax caps the tail at exactly the epoch cap and evens the head") {
    val rows = TrainData.mixUnimax(t).collect()
    val (capped, uncapped) = rows.partition(_.getAs[Boolean]("capped"))
    // both allocation branches must be live on the corpus — an all-capped
    // or all-even fill would leave half the operator unexercised (the
    // text_bm25_topk 0-row lesson)
    assert(capped.nonEmpty && uncapped.nonEmpty,
      s"degenerate fill: ${capped.length} capped / ${uncapped.length} even")
    capped.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") == r.getAs[Long]("cap_tokens"))
      assert(r.getAs[Double]("epochs_q4") == TrainData.unimaxEpochCap.toDouble)
    }
    // every uncapped language gets the SAME even share, and that share is
    // strictly below its cap (else it would have been capped)
    val shares = uncapped.map(_.getAs[Long]("alloc_tokens")).distinct
    assert(shares.length == 1, s"uneven uncapped shares: ${shares.toSeq}")
    uncapped.foreach(r =>
      assert(r.getAs[Long]("alloc_tokens") < r.getAs[Long]("cap_tokens")))
    // the fill never overspends: total allocation ≤ budget, and the
    // shortfall is only the integer-division remainder (< n_uncapped)
    val total = Dedup.withWords(t.documents)
      .agg(sum(size(col("w")))).head.getLong(0)
    val budget = total * TrainData.unimaxBudgetMul
    val spent = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(spent <= budget)
    assert(budget - spent < uncapped.length,
      s"unallocated remainder ${budget - spent} exceeds the division slack")
  }

  test("hybrid rrf fuses the two legs with exact integer reciprocal ranks") {
    val rows = TrainData.hybridRrf(t).collect()
    // recompute the fusion from the leg internals — full-outer on
    // (query, doc), integer-division contributions, doc_id tie-break
    val lex = TrainData.bm25Ranked(t).filter(col("rank") <= TrainData.rrfDepth)
      .select("query_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val vec = Sim.cosineRanked(t, TrainData.bm25NQueries)
      .filter(col("rank") <= TrainData.rrfDepth)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val fusedExp = (lex.keySet ++ vec.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq.map { k =>
          val s = lex.get(k).map(r => 1000000L / (TrainData.rrfK + r)).getOrElse(0L) +
            vec.get(k).map(r => 1000000L / (TrainData.rrfK + r)).getOrElse(0L)
          (q, k._2, s)
        }.sortBy { case (_, d, s) => (-s, d) }
          .take(TrainData.rrfTopK).zipWithIndex
          .map { case ((_, d, s), i) => (q, d) -> (i + 1, s) }
    }
    assert(rows.length == fusedExp.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      val (expRank, expScore) = fusedExp(k)
      assert(r.getAs[Int]("rank") == expRank, s"rank drift at $k")
      assert(r.getAs[Long]("rrf_q6") == expScore, s"score drift at $k")
      // a leg rank present in the output must be the leg's actual rank
      Option(r.getAs[java.lang.Long]("lex_rank")).foreach(lr =>
        assert(lex(k) == lr.longValue))
      Option(r.getAs[java.lang.Long]("vec_rank")).foreach(vr =>
        assert(vec(k) == vr.longValue))
    }
    // both fusion cases must be live on the corpus: docs found by both
    // legs AND docs carried by a single leg (the degenerate-fill lesson)
    assert(rows.exists(r => r.getAs[java.lang.Long]("lex_rank") != null &&
      r.getAs[java.lang.Long]("vec_rank") != null), "no both-legs winner")
    assert(rows.exists(r => r.getAs[java.lang.Long]("lex_rank") == null ||
      r.getAs[java.lang.Long]("vec_rank") == null), "no single-leg winner")
    // shape: k rows per query, contiguous ranks
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.length == TrainData.rrfTopK)
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to g.length))
    }
  }

  test("text index compact drops retired docs and refreshes every df") {
    val base = java.nio.file.Files.createTempDirectory("graft_tic_spec").toString + "/out"
    val stats = TrainData.textIndexCompact(t, Some(base)).collect()
    // no tombstoned doc survives in any stored file (the compacted
    // rewrite lands at `base`; the maintained index is the read-only
    // ensured session artifact)
    val stored = spark.read.parquet(base)
    assert(stored.filter(Dedup.isRetired(col("doc_id"))).count() == 0)
    // every stored df equals its term's actual surviving posting count —
    // the recompute is the point (a stale df skews every BM25 idf)
    val dfBad = stored.groupBy("term")
      .agg(count(lit(1)).as("n"), max(col("df")).as("dfmax"),
        min(col("df")).as("dfmin"))
      .filter(col("n") =!= col("dfmax") || col("n") =!= col("dfmin")).count()
    assert(dfBad == 0, "compacted df stale against surviving postings")
    // compacted == from-scratch build over live docs, row for row
    val scratch = TrainData.bm25PostingsWithDf(
        t.documents.filter(!Dedup.isRetired(col("doc_id"))))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"), col("df"))
    val storedRows = stored.select("doc_id", "dl", "term", "tf", "df")
    assert(storedRows.exceptAll(scratch).count() == 0)
    assert(scratch.exceptAll(storedRows).count() == 0)
    // the rewrite preserved the pruning layout a term probe relies on
    val someBucket = stats.map(_.getAs[Long]("bucket")).min
    val plan = stored.filter(col("bucket") === someBucket)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"compacted probe did not prune partitions:\n$plan")
  }

  test("text index upsert appends the delta with NULL df, stats equal the build") {
    val base = java.nio.file.Files.createTempDirectory("graft_tiu_spec").toString + "/idx"
    val upserted = TrainData.textIndexUpsert(t, Some(base)).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_postings"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tf"))).sorted
    val full = TrainData.textIndexSink(t).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_postings"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tf"))).sorted
    // base ∪ delta append == the from-scratch build on the posting rows
    assert(upserted.sameElements(full))
    val stored = spark.read.parquet(base)
    val maxId = t.documents.agg(max(col("doc_id"))).head.getLong(0)
    val isDelta = col("doc_id") * 5 > lit(maxId) * 4
    // the delta really appended (both populations present) and carries the
    // honest NULL df — no number exists that a reader could mistake for
    // a valid document frequency
    assert(stored.filter(isDelta).count() > 0, "no delta postings stored")
    assert(stored.filter(!isDelta).count() > 0, "no base postings stored")
    assert(stored.filter(isDelta && col("df").isNotNull).count() == 0,
      "delta postings carry a df value")
    assert(stored.filter(!isDelta && col("df").isNull).count() == 0,
      "base postings lost their df")
    // non-vacuity of the freshness problem: the delta made at least one
    // base term's STORED df stale against the true corpus posting count
    // (if this ever read 0 the fresh-serve spec would prove nothing)
    val trueDf = TrainData.bm25PostingsWithDf(t.documents)
      .select(col("term"), col("df").as("true_df")).distinct()
    val stale = stored.filter(!isDelta).select("term", "df").distinct()
      .join(trueDf, "term")
      .filter(col("df") =!= col("true_df")).count()
    assert(stale > 0, "no stored df went stale — the freshness spec is vacuous")
    // the scalars sidecar is the corpus_stats_inc fold: base + delta rows
    // summing to the corpus totals
    val sidecar = spark.read.parquet(s"${base}__scalars").collect()
    assert(sidecar.length == 2, s"expected base+delta sidecar rows: ${sidecar.length}")
    val toks = Dedup.withWords(t.documents)
      .agg(sum(size(col("w")))).head.getLong(0)
    assert(sidecar.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    assert(sidecar.map(_.getAs[Long]("sum_dl")).sum == toks)
  }

  test("fresh-df serving over an upserted index equals the in-plan truth") {
    // the upserted index's stored df is provably stale (previous spec);
    // equality with the in-plan ranking — which uses the TRUE corpus df —
    // is therefore only possible if the serve path read NO stored df
    val got = TrainData.bm25TopKStoredFresh(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("n_terms"),
        r.getAs[Long]("score_q6")))
    val want = TrainData.bm25TopKDocs(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("n_terms"),
        r.getAs[Long]("score_q6")))
    assert(got.sameElements(want),
      s"fresh-served ranking drifted from the in-plan truth")
    assert(got.nonEmpty, "0-row pass proves nothing (the bm25 lesson)")
  }

  test("the mid-day hybrid equals the weekly-fresh stored hybrid row for row") {
    // day-old indexes on both axes (stale/NULL lexical df, appended
    // vector codes) served through the fresh faces must fuse to exactly
    // what freshly rebuilt indexes fuse to — the composed proof of both
    // maintenance stories
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_q6")))
    val fresh = rows(TrainData.hybridRrfStoredFresh(t))
    val weekly = rows(TrainData.hybridRrfStored(t))
    assert(fresh.nonEmpty && fresh.sameElements(weekly),
      "day-old-index hybrid diverged from the freshly-built stored hybrid")
  }

  test("leakage-safe split never separates a near-dup pair across splits") {
    val rows = Dedup.splitLeakageSafe(t).collect()
    // every document assigned exactly once
    assert(rows.length == t.documents.count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val splitOf = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // the leakage pin against the ACTUAL near-dup pair list (not just the
    // group table the operator itself derives): each pair co-locates
    val pairs = Dedup.ngramJaccard(t).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(pairs.nonEmpty, "no near-dup pairs — the leakage pin is vacuous")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"near-dup pair ($a, $b) split across ${splitOf(a)}/${splitOf(b)}")
    }
    // the split is a function of the group hash — bucket agrees with split
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val want = if (b < Dedup.splitTrainPermille) "train"
        else if (b < Dedup.splitValPermille) "val" else "test"
      assert(r.getAs[String]("split") == want)
    }
    // all three splits are populated and train dominates (the 90/5/5
    // intent, asserted loosely — the hash is uniform, not exact)
    val counts = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(counts.keySet == Set("train", "val", "test"), s"missing split: $counts")
    assert(counts("train") > rows.length / 2, s"train not dominant: $counts")
  }

  test("ndcg judgments grade planted jaccard levels in exact integers") {
    import spark.implicits._
    // query doc 0 has shingles {"a b c", "b c d"}; each planted doc hits
    // one grade boundary EXACTLY (the all-integer comparisons, with the
    // corpus-tuned 1/25, 1/50, 1/100 thresholds). A doc of n words holds
    // n-2 distinct shingles; sharing exactly "a b c" gives
    // union = 2 + (n-2) - 1 = n - 1:
    //  100 identical              j = 1      → rel 3
    //  101 26 words, 1 shared     j = 1/25   → rel 3 (1*25 ≥ 25, boundary)
    //  102 51 words, 1 shared     j = 1/50   → rel 2 (boundary)
    //  103 101 words, 1 shared    j = 1/100  → rel 1 (boundary)
    //  104 102 words, 1 shared    j = 1/101  → dropped (1*100 < 101)
    def filler(id: Long, nWords: Int): (Long, String) =
      (id, ("a b c" +: (4 to nWords).map(j => s"w${id}x$j")).mkString(" "))
    val docs = (Seq((0L, "a b c d"), (100L, "a b c d")) ++
      Seq(filler(101L, 26), filler(102L, 51), filler(103L, 101),
        filler(104L, 102))).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val got = TrainData.relevanceJudgments(t2).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rel")).toMap
    assert(got == Map(100L -> 3L, 101L -> 3L, 102L -> 2L, 103L -> 1L),
      s"planted grades diverged: $got")
  }

  test("ndcg eval replays from the judgments and the faces it scores") {
    val disc = TrainData.ndcgDiscQ6
    val judg = TrainData.relevanceJudgments(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("rel")).toMap
    assert(judg.nonEmpty, "no judged pairs — the eval would be vacuous")
    val idcg: Map[Long, Long] = judg.toSeq
      .map { case ((q, d), rel) => (q, d, rel) }
      .groupBy(_._1).map { case (q, g) =>
        q -> g.sortBy(x => (-x._3, x._2)).take(TrainData.ndcgK)
          .zipWithIndex.map { case ((_, _, rel), i) => rel * disc(i) }.sum
      }
    def dcgOf(ranked: Array[(Long, Long, Int)]): Map[Long, Long] =
      ranked.groupBy(_._1).map { case (q, g) =>
        q -> g.map { case (_, d, rk) =>
          judg.getOrElse((q, d), 0L) * disc(rk - 1) }.sum
      }
    val faces: Map[String, Map[Long, Long]] = Map(
      "bm25" -> dcgOf(TrainData.bm25Ranked(t)
        .filter(col("rank") <= TrainData.ndcgK).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Int]("rank")))),
      "cosine" -> dcgOf(Sim.cosineRanked(t, TrainData.bm25NQueries)
        .filter(col("rank") <= TrainData.ndcgK).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank")))),
      "hybrid_rrf" -> dcgOf(TrainData.hybridRrf(t).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Int]("rank")))),
      "ivfpq" -> dcgOf(Sim.ivfPqTopK(t).collect()
        .filter(_.getAs[Long]("query_id") < TrainData.bm25NQueries)
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank")))))
    val rows = TrainData.retrievalEvalNdcg(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sys, q) = (r.getAs[String]("system"), r.getAs[Long]("query_id"))
      val wantDcg = faces(sys).getOrElse(q, 0L)
      assert(r.getAs[Long]("dcg_q6") == wantDcg, s"$sys/$q dcg drift")
      val wantIdcg = idcg.getOrElse(q, 0L)
      assert(r.getAs[Long]("idcg_q6") == wantIdcg, s"$sys/$q idcg drift")
      if (wantIdcg > 0)
        assert(r.getAs[Double]("ndcg_q4") ==
          math.floor(wantDcg * 10000.0 / wantIdcg) / 10000, s"$sys/$q ratio")
      // NDCG is a [0, 1] metric by construction: DCG over the ideal
      // ordering can never exceed IDCG
      assert(wantDcg <= wantIdcg, s"$sys/$q dcg exceeds ideal")
    }
  }

  test("retrieval audit counts the overlaps of the faces it audits") {
    def keySet(rows: Array[org.apache.spark.sql.Row], idCol: String) =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long](idCol))).toSet
    val exact5 = keySet(Sim.cosineRanked(t, Sim.nQueries)
      .filter(col("rank") <= Sim.topK).collect(), "neighbor_id")
    val adc = keySet(Sim.pqAdcTopK(t).collect(), "neighbor_id")
    val ivf = keySet(Sim.ivfPqTopK(t).collect(), "neighbor_id")
    val rfn = keySet(Sim.adcRefineTopK(t).collect(), "neighbor_id")
    val lex = keySet(TrainData.bm25Ranked(t)
      .filter(col("rank") <= TrainData.bm25TopK).collect(), "doc_id")
    val hyb = keySet(TrainData.hybridRrf(t).collect(), "doc_id")
    val expected = Map(
      "adc_vs_exact" -> (adc & exact5).size,
      "ivfpq_vs_adc" -> (ivf & adc).size,
      "refine_vs_exact" -> (rfn & exact5).size,
      "hybrid_vs_lex" -> (hyb & lex).size,
      "hybrid_vs_vec" ->
        (hyb & exact5.filter(_._1 < TrainData.bm25NQueries)).size)
    val rows = TrainData.retrievalAudit(t).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val m = r.getAs[String]("metric")
      val nAgree = r.getAs[Long]("n_agree")
      assert(nAgree == expected(m), s"$m: got $nAgree want ${expected(m)}")
      val bound = r.getAs[Long]("n_queries") * r.getAs[Long]("k")
      assert(nAgree >= 0 && nAgree <= bound, s"$m out of [0, $bound]")
      assert(r.getAs[Double]("overlap_at_k") ==
        math.floor(nAgree * 10000.0 / bound) / 10000)
    }
    // the refine stage exists to RECOVER accuracy the codes gave up: on
    // this corpus it must agree with exact at least as often as raw ADC
    assert(expected("refine_vs_exact") >= expected("adc_vs_exact"),
      "refine stage lost accuracy vs the raw ADC scan")
  }
}
