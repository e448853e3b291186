package graft

import graft.operators.{Dedup, Identity, Sim, TrainData}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Skew-proof specs for the SURVEY §5 posture: the claims "two-phase
  * salted rank", "prefix filtering kills hot-shingle blowup" and "AQE
  * skew-join splits a hot cluster" proven on PLANTED skew, with the bound
  * measured from real task metrics (max shuffle-read records per task) —
  * not asserted in prose.
  */
class SkewSpec extends SparkSpec {

  /** Run `body` and return the max shuffle-read record count any single
    * task saw — the "did one task eat the hot key" measurement.
    */
  private def maxTaskShuffleRead(body: => Unit): Long = {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          max.getAndUpdate(cur => math.max(cur, r))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener bus drains asynchronously; the margin below tolerates a
      // missed straggler (bounds are order-of-magnitude, not exact)
      Thread.sleep(1500)
    } finally spark.sparkContext.removeSparkListener(listener)
    max.get
  }

  test("two-phase rank: one app owning 90% of keys never lands in one task") {
    import spark.implicits._
    val nHot = 30000
    // 90% of the distinct key set belongs to one app — the shape that
    // makes a naive Window.partitionBy(app) rank put 30k keys through a
    // single task
    val keys = ((1 to nHot).map(i => ("hotapp", f"d$i%06d")) ++
      (1 to 3000).map(i => (s"app${i % 50}", f"d$i%06d"))).toDF("appkey", "did")
    // realistic partition economics for a 33k-row corpus: at production
    // sizes each range partition holds ~advisory-size bytes of one app's
    // keys; on KB-scale test data AQE's coalescer would legitimately merge
    // everything into one partition and mask the split being proven
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "32")
    var out: Array[org.apache.spark.sql.Row] = Array.empty
    val maxTask =
      try maxTaskShuffleRead {
        out = Identity.denseIds(keys, "appkey", "did", "zg_did").collect()
      } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    // correctness: dense 1..n per app, deterministic order
    val hot = out.filter(_.getString(0) == "hotapp").map(_.getInt(2)).sorted
    assert(hot.length == nHot && hot.head == 1 && hot.last == nHot &&
      hot.distinct.length == nHot, "hot app ids not dense 1..n")
    // skew bound: the largest task saw a range slice, not the app
    assert(maxTask > 0, "listener saw no shuffle activity")
    assert(maxTask < nHot / 3,
      s"one task read $maxTask records — the hot app was not range-split")
  }

  test("ndcg judgments: a corpus-wide hot shingle stays broadcast-bounded") {
    import spark.implicits._
    val n = 400
    // every doc (including the query docs) carries the same 5 hot
    // 3-grams plus unique filler: every (query, doc) pair matches on all
    // 5 — the shape that would melt a shuffled shingle-axis join and
    // reward losing the map-side combine of the shared-count groupBy
    val hot = "h1 h2 h3 h4 h5 h6 h7"
    val docs = (0 until n).map { i =>
      (i.toLong, s"$hot u${i}a u${i}b u${i}c")
    }.toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val judg = TrainData.relevanceJudgments(t2)
    // the query shingle set rides a broadcast — the shingle axis is never
    // a shuffled join key, so the hot shingle cannot concentrate anywhere
    val plan = judg.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") ||
      !plan.matches("(?s).*SortMergeJoin [^\\n]*\\bs\\b.*"),
      s"the shingle axis shuffled:\n$plan")
    var rows = 0L
    val maxTask = maxTaskShuffleRead { rows = judg.count() }
    // every non-query doc shares 5 of its 8 shingles with each query ⇒
    // jaccard 5/11 ≥ 1/4 ⇒ graded; the pair axis itself is the bound
    assert(rows >= TrainData.bm25NQueries * (n - TrainData.bm25NQueries),
      s"hot-shingle corpus lost judged pairs: $rows")
    val pairBound = TrainData.bm25NQueries * n
    assert(maxTask < 2 * pairBound,
      s"one task read $maxTask records — the hot shingle concentrated " +
        s"(pair-axis bound ${2 * pairBound})")
  }

  test("ppjoin: a corpus-wide hot shingle cannot go quadratic") {
    import spark.implicits._
    val n = 400
    // every doc shares one 3-gram ('hot1 hot2 hot3'); the rest is unique
    // filler. True near-dup pairs: none (J = 1/11 << tau). An unprotected
    // posting-list self-join would materialize C(400,2) = 79800 pairs in
    // the hot shingle's task.
    val docs = (1 to n).map { i =>
      (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b u${i}c u${i}d u${i}e")
    }.toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    var rows = 0L
    val maxTask = maxTaskShuffleRead { rows = Dedup.ngramJaccard(t2).count() }
    assert(rows == 0, s"hot-shingle-only docs are not near-dups, got $rows pairs")
    // prefix filtering excludes the corpus-hot shingle from every doc's
    // candidate prefix, so no task ever sees the quadratic posting list
    assert(maxTask < 20000,
      s"one task read $maxTask records — the hot shingle's posting list exploded")
  }

  test("bm25: a corpus-wide hot term spreads across tasks, never one reducer") {
    import spark.implicits._
    // every doc (queries included) contains 'the' — df = N, the posting
    // list IS the corpus. BM25 must still score those Q×N candidate rows
    // (the idf makes them near-zero, the semantics keeps them), so the
    // skew question is WHERE they flow: the term axis is BROADCAST-joined
    // (query terms and df both broadcast into the postings scan), so no
    // term-keyed exchange exists to concentrate the hot list — the only
    // shuffles key on (doc_id, term) upstream and (query_id, doc_id)
    // downstream, both of which spread the hot term by construction.
    val n = 2000
    val docs = (0L until n.toLong)
      .map(i => (i, s"the u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val conf = spark.conf
    // AQE's coalescer would legitimately merge this KB-scale corpus into
    // one partition and mask the spread being proven (the two-phase rank
    // lesson); at production sizes partitions hold advisory-size bytes
    val saved = Seq("spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    var rows: Array[org.apache.spark.sql.Row] = Array.empty
    var finalPlan = ""
    val maxTask =
      try maxTaskShuffleRead {
        val df = TrainData.bm25TopKDocs(t2)
        rows = df.collect()
        finalPlan = df.queryExecution.executedPlan.toString
      }
      finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    // every query fills its top-k through the hot term
    assert(rows.length == (TrainData.bm25NQueries * TrainData.bm25TopK).toInt,
      s"expected full top-k per query, got ${rows.length} rows")
    // structural half: every join is broadcast even with df = N — the hot
    // posting list STREAMS map-side; there is no join-side exchange on any
    // axis for it to concentrate through
    assert(!finalPlan.contains("SortMergeJoin")
      && !finalPlan.contains("ShuffledHashJoin"),
      s"hot-term corpus shuffled a join:\n${finalPlan.take(3000)}")
    // metric half: the remaining exchanges (postings partial-agg, the
    // per-(query, doc) score fold, the per-query top-k window) carry at
    // most ONE query's candidate volume per task — the window's designed
    // unit (a query's matched postings), never the Q×N total
    assert(maxTask > 0, "listener saw no shuffle activity")
    assert(maxTask < 2L * n,
      s"one task read $maxTask records — more than one query's candidate volume")
  }

  test("semantic dedup: AQE skew-join engages on a planted hot cluster") {
    import spark.implicits._
    // all but a handful of vectors collapse into centroid 0's cell, so the
    // cluster equi-join gets one hot key; with the skew thresholds scaled
    // to the corpus, AQE must split it instead of feeding one task
    // enough rows/dims that the hot cell's COMPRESSED shuffle partition
    // clears the (lowered) skew threshold — shuffle stats see lz4 bytes,
    // and a small patterned corpus compresses under any usable threshold
    val dim = 16
    val vecs = (0L until 4000L).map { i =>
      val base = Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.0f)
      if (i < Sim.nCentroids && i > 0) {
        // the other centroids point elsewhere so the hot cell stays hot
        Array.tabulate(dim)(d => if (d == (i % dim).toInt) 1.0f else 0.0f)
      } else {
        // deterministic low-compressibility jitter keeps the vectors
        // distinct but all nearest to centroid 0
        base.zipWithIndex.map { case (x, d) =>
          x + ((i * 2654435761L + d * 40503L) % 997L).toFloat * 1e-5f
        }
      }
    }.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val t2 = new graft.sources.Tables(spark, sf) { override def embeddings = emb }
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // skew-split granularity is MAP-SIDE BLOCKS: a corpus tiny enough for
    // the parallelism-first coalescer to collapse the upstream stage to
    // ONE task leaves the hot reduce partition as one unsplittable map
    // block (debugged via stage task counts — this, not detection, is why
    // a naive small-data skew test reads "0 skewed partitions"). Keep the
    // upstream stage multi-task like any real corpus's scan would be.
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
    // the self-join must shuffle for skew handling to exist at all —
    // static AND runtime broadcast both off (AQE would otherwise convert
    // the sub-64MB planted join to broadcast before skew handling runs)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Sim.semanticDedup(t2)
      // collect() drives THIS frame's QueryExecution — a count() would
      // build a separate execution and leave df's plan unfinalized
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"planted hot cluster did not trigger AQE skew-join:\n${p.take(4000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
