package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted dup-group artifact lifecycle (sink_dedup_groups /
  * dedup_groups_inc / the serve-from-stored consumers) — the index-
  * lifecycle discipline applied to the GROUP axis.
  */
class DupGroupArtifactSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus where the DELTA (newest fifth of ids) MERGES two base
    * groups: sliding word windows give A1~A2 and C1~C2 (each J ≥ 0.5)
    * with every A×C pair below tau, and the delta doc E = the middle
    * window overlaps both sides at J ≈ 0.62 — so the base closure has
    * TWO groups and the full closure has ONE. Exercises exactly the case
    * that makes labels non-foldable (a new pair joining two existing
    * components).
    */
  private def mergeCorpus = {
    val w = (1 to 16).map(i => s"mgw$i")
    def win(a: Int, b: Int) = w.slice(a - 1, b).mkString(" ")
    Seq(
      (1L, win(1, 12)),          // A1
      (2L, win(1, 12) + " mgz"), // A2 ~ A1
      (3L, win(5, 16)),          // C1  (A×C overlap ≈ 0.43 < tau)
      (4L, win(5, 16) + " mgy"), // C2 ~ C1
      (10L, win(3, 14))          // E: delta (10*5 > 10*4), ~A and ~C
    ).toDF("doc_id", "text")
  }

  test("sink_dedup_groups: stored group table equals the in-plan closure; pairs artifact matches ngramJaccard") {
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val stored = Dedup.dupGroupsSink(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inPlan = Dedup.dupGroupsUnsorted(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored.nonEmpty, "vacuous: the corpus produced no dup groups")
    assert(stored == inPlan, "stored group table diverges from the in-plan closure")
    // the pair list persisted beside the labels is the verified pair set
    val dir = Dedup.dupGroupsDir(t2)
    val storedPairs = spark.read.parquet(s"$dir/pairs")
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(t2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedPairs == exact, "stored pair list diverges from the PPJoin pair set")
  }

  test("dedup_groups_inc: fold == rescan, and the delta genuinely MERGES two base groups") {
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    // the base closure (pre-delta corpus) must have TWO groups — the
    // anti-vacuity guard: without it this test would pass on any corpus
    // whose delta adds nothing
    val mx = 10L
    val baseDocs = docs.filter(col("doc_id") * 5 <= mx * 4)
    val baseT = new graft.sources.Tables(spark, sf) { override def documents = baseDocs }
    val baseGroups = Dedup.dupGroups(baseT).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(baseGroups.keySet == Set(1L, 2L, 3L, 4L), s"base closure: $baseGroups")
    assert(baseGroups.values.toSet.size == 2, "base closure must have two groups")
    // fold == rescan
    val fold = Dedup.dupGroupsInc(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rescan = Dedup.dupGroupsUnsorted(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fold == rescan, s"fold != rescan: $fold vs $rescan")
    // and the merge actually happened: one group of all five docs
    assert(fold.size == 5 && fold.forall(x => x._2 == 1L && x._3 == 5L),
      s"expected one merged group of 5 with label 1: $fold")
  }

  test("consumers serve from the stored artifact: no rebuild between consumers; the sink face does rebuild") {
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    Dedup.dupGroups(t2).collect() // first touch builds
    val dir = Dedup.dupGroupsDir(t2)
    def successMtime: Long =
      new java.io.File(s"$dir/groups/_SUCCESS").lastModified()
    val built = successMtime
    assert(built > 0, "artifact _SUCCESS marker missing after first touch")
    Dedup.keepBest(t2).collect()
    Dedup.softWeight(t2).collect()
    Dedup.splitLeakageSafe(t2).collect()
    assert(successMtime == built,
      "a consumer rebuilt the artifact instead of serving from it")
    Thread.sleep(1100) // _SUCCESS mtime granularity can be 1 s
    Dedup.dupGroupsSink(t2).collect()
    assert(successMtime > built, "the sink face must force a rebuild")
  }

  test("artifact cache keys on corpus CONTENT: two corpora sharing a path get distinct artifacts") {
    val docsA = Seq((1L, "ka1 ka2 ka3 ka4"), (2L, "ka1 ka2 ka3 ka4 ka5"))
      .toDF("doc_id", "text")
    val docsB = Seq((1L, "kb1 kb2 kb3 kb4"), (2L, "kb9 kb8 kb7 kb6"))
      .toDF("doc_id", "text")
    val tA = new graft.sources.Tables(spark, sf) { override def documents = docsA }
    val tB = new graft.sources.Tables(spark, sf) { override def documents = docsB }
    assert(Dedup.dupGroupsDir(tA) != Dedup.dupGroupsDir(tB),
      "two different corpora resolved to the same artifact directory")
    // corpus B has no qualifying pair -> its artifact must be empty, not A's
    assert(Dedup.dupGroups(tB).count() == 0L)
    assert(Dedup.dupGroups(tA).count() == 2L)
  }

  test("dupGroupsMaintainStream: cross-batch pair arrivals fold to the batch closure (incl. a merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val allPairs = Dedup.ngramJaccard(t2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    // batch 1 = the base pairs (no endpoint is the delta doc 10),
    // batch 2 = the merging pairs through doc 10 - a genuine cross-batch
    // component merge, the case keyed state cannot express
    val (merging, base) = allPairs.partition(p => p._1 == 10L || p._2 == 10L)
    assert(base.nonEmpty && merging.nonEmpty, s"degenerate split: $base / $merging")
    val dir = java.nio.file.Files.createTempDirectory("graft_grp_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_grp_ckpt").toString
    val in = MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStreamPipeline.dupGroupsMaintainStream(
      in.toDF().select(col("_1").as("da"), col("_2").as("db")), dir, ckpt)
    try {
      in.addData(base.toSeq: _*)
      q.processAllAvailable()
      val mid = spark.read.parquet(s"$dir/groups")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
      assert(mid.values.toSet.size == 2, s"base fold should hold two groups: $mid")
      in.addData(merging.toSeq: _*)
      q.processAllAvailable()
      val fin = spark.read.parquet(s"$dir/groups")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
          r.getAs[Long]("group_size"))).toSet
      val batch = Dedup.dupGroupsUnsorted(t2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fin == batch, s"streamed fold != batch closure: $fin vs $batch")
    } finally q.stop()
  }

  test("dedup_groups_inc on the REAL corpus: fold == rescan with a non-vacuous delta") {
    // at sf0.001 the generator's dup pairs genuinely straddle the recency
    // split (10 of 28 pairs touch the newest fifth, one sits fully inside
    // it) - so this equality exercises the delta-bounded candidate path
    // on real data, not just the constructed merge corpus. (At sf0.01 the
    // generator happens to plant every dup below id 500 of 10000 - a
    // clean delta - so the driver-corpus hash match alone would not.)
    val mx = t.documents.agg(max(col("doc_id"))).head().getLong(0)
    val docs = Dedup.ppjoinDocs(t, withDelta = true).persist()
    val newPairs = Dedup.ppjoinPairs(docs, touchingDelta = true)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    docs.unpersist()
    assert(newPairs.nonEmpty, "vacuous: the sf corpus delta generated no pairs")
    assert(newPairs.forall(p => p._1 * 5 > mx * 4 || p._2 * 5 > mx * 4),
      "a generated pair touches no delta endpoint")
    val fold = Dedup.dupGroupsInc(t).collect().map(_.toSeq).toSet
    val rescan = Dedup.dupGroupsUnsorted(t).orderBy(col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(fold == rescan, "fold != rescan on the real corpus")
  }

  test("dupGroupsMaintainStream: a re-delivered batch is idempotent (restart with fresh checkpoint)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val allPairs = Dedup.ngramJaccard(t2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val (merging, base) = allPairs.partition(p => p._1 == 10L || p._2 == 10L)
    val dir = java.nio.file.Files.createTempDirectory("graft_grp_redeliver").toString
    def runOnce(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_grp_ck2").toString
      val in = MemoryStream[(Long, Long)]
      val q = graft.streaming.EventStreamPipeline.dupGroupsMaintainStream(
        in.toDF().select(col("_1").as("da"), col("_2").as("db")), dir, ckpt)
      try {
        in.addData(base.toSeq: _*); q.processAllAvailable()
        in.addData(merging.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
    }
    runOnce()
    val first = spark.read.parquet(s"$dir/groups").collect().map(_.toSeq).toSet
    // a restarted query with a FRESH checkpoint re-delivers both batches
    // under the same batch ids - the overwrite-own-subdir idiom must make
    // that a no-op on the folded state
    runOnce()
    val second = spark.read.parquet(s"$dir/groups").collect().map(_.toSeq).toSet
    assert(first == second, "re-delivered batches changed the folded groups")
    val batch = Dedup.dupGroupsUnsorted(t2).collect().map(_.toSeq).toSet
    assert(second == batch, "folded groups diverge from the batch closure")
  }

  /** The compact-spec corpus: doc 13 is the BRIDGE of {1, 13, 3} (A~X~B
    * with A!~B) and retired under the shared modulus; {2, 4} survive.
    */
  private def bridgeCorpus = {
    val w = (1 to 16).map(i => s"cpw$i")
    def win(a: Int, b: Int) = w.slice(a - 1, b).mkString(" ")
    val sv = (1 to 6).map(i => s"csv$i").mkString(" ")
    Seq(
      (1L, win(1, 12)),   // A — paired only through the bridge
      (13L, win(3, 14)),  // X: the bridge (13 % 13 == 0 -> retired)
      (3L, win(5, 16)),   // B — A~X~B, A!~B
      (2L, sv),           // surviving independent pair
      (4L, sv + " csvz")
    ).toDF("doc_id", "text")
  }

  test("sink_dedup_groups_compact: a retired BRIDGE doc splits its group; surviving pairs re-label") {
    val docs = bridgeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    // pre-compaction sanity: the bridge unites {1, 3, 13}
    val before = Dedup.dupGroupsUnsorted(t2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.keySet == Set(1L, 2L, 3L, 4L, 13L), s"before: $before")
    assert(before(1L) == before(3L) && before(3L) == before(13L),
      "the bridge doc must unite A and B before compaction")
    val compacted = Dedup.dupGroupsCompact(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // no retired doc survives; the bridged component SPLIT (A and B are
    // unpaired without X, so they leave the group table entirely) — a
    // row-delete without re-labeling would have kept them grouped
    assert(compacted == Set((2L, 2L, 2L), (4L, 2L, 2L)),
      s"compacted closure wrong: $compacted")
    // and the stored pair list holds only live-endpoint pairs (the
    // compacted output lives in its own fingerprint-keyed directory —
    // round 11 routed the old fixed /tmp scratch path through the cache)
    val compactDir = graft.engine.ArtifactCache.dir(
      "dupgroups_compact", Dedup.dupGroupsFp(t2))
    val pairs = spark.read.parquet(s"$compactDir/pairs")
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs == Set((2L, 4L)), s"compacted pairs wrong: $pairs")
  }

  test("dupGroupsMaintainWithTombstones: a live retirement drops pairs AND re-labels (state == dupGroupsCompact); retirement is monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = bridgeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val allPairs = Dedup.ngramJaccard(t2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft_grp_tomb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_grp_tck").toString
    val in = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.EventStreamPipeline.dupGroupsMaintainWithTombstones(
      in.toDF().select(col("_1").as("kind"), col("_2").as("da"), col("_3").as("db")),
      dir, ckpt)
    try {
      // batch 1: every verified pair arrives — the bridge unites {1,3,13}
      in.addData(allPairs.toSeq.map(p => ("pair", p._1, p._2)): _*)
      q.processAllAvailable()
      val before = spark.read.parquet(s"$dir/groups")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
      assert(before.keySet == Set(1L, 2L, 3L, 4L, 13L), s"before: $before")
      assert(before(1L) == before(3L) && before(3L) == before(13L),
        "anti-vacuity: the bridge must unite A and B before retirement")
      // batch 2: the bridge doc retires — its pairs drop and the component
      // SPLITS (A and B leave the table entirely); the folded state must
      // equal the batch weekly compaction on the same corpus
      in.addData(("retire", 13L, -1L))
      q.processAllAvailable()
      val after = spark.read.parquet(s"$dir/groups")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
          r.getAs[Long]("group_size"))).toSet
      val compacted = Dedup.dupGroupsCompact(t2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after == compacted, s"streamed retirement != batch compaction: $after vs $compacted")
      // batch 3: a pair through the retired doc RE-ARRIVES — retirement is
      // monotone, so the cumulative tombstone keeps it dead
      in.addData(("pair", 1L, 13L))
      q.processAllAvailable()
      val replay = spark.read.parquet(s"$dir/groups")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
          r.getAs[Long]("group_size"))).toSet
      assert(replay == after, "a re-arrived retired-endpoint pair resurrected state")
    } finally q.stop()
  }

  test("dupGroupsMaintainWithTombstones: batch subdirs consolidate to a bounded count; re-delivery after consolidation is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = mergeCorpus
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val allPairs = Dedup.ngramJaccard(t2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(allPairs.length >= 3, s"need >=3 pairs to split: ${allPairs.toSeq}")
    val chunks = allPairs.grouped(math.max(1, allPairs.length / 3)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_grp_cons").toString
    def subdirs = Option(new java.io.File(s"$dir/pairs").listFiles())
      .getOrElse(Array.empty).count(f => f.isDirectory && f.getName.startsWith("batch="))
    def runAll(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_grp_cck").toString
      val in = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.EventStreamPipeline.dupGroupsMaintainWithTombstones(
        in.toDF().select(col("_1").as("kind"), col("_2").as("da"), col("_3").as("db")),
        dir, ckpt, consolidateAfter = 1)
      try chunks.foreach { c =>
        in.addData(c.toSeq.map(p => ("pair", p._1, p._2)): _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    runAll()
    // every trigger past the threshold folds old subdirs into batch=base:
    // the count stays bounded (base + at most the newest batch) instead of
    // growing one subdir per trigger for the life of the query
    assert(subdirs <= 2, s"consolidation left $subdirs pair subdirs")
    val first = spark.read.parquet(s"$dir/groups").collect().map(_.toSeq).toSet
    val batch = Dedup.dupGroupsUnsorted(t2).collect().map(_.toSeq).toSet
    assert(first == batch, "consolidated fold diverges from the batch closure")
    // a restart with a fresh checkpoint re-delivers every batch AFTER the
    // originals were consolidated away — pair sets are sets, so recreating
    // the deleted subdirs beside batch=base changes nothing
    runAll()
    val second = spark.read.parquet(s"$dir/groups").collect().map(_.toSeq).toSet
    assert(second == first, "re-delivery after consolidation changed the folded groups")
  }
}
