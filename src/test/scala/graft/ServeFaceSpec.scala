package graft

import graft.operators.{Dedup, Sim, TrainData}
import org.apache.spark.sql.functions._

/** The serve-only retrieval faces (text_bm25_serve / sim_ann_adc_serve /
  * retrieval_hybrid_rrf_serve): identical results to their self-contained
  * twins, served from the session's ensured artifacts without rebuilding.
  */
class ServeFaceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("text_bm25_serve equals the in-plan text_bm25_topk") {
    val served = rows(TrainData.bm25TopKServe(t))
    assert(served.nonEmpty, "vacuous: no ranked rows")
    assert(served == rows(TrainData.bm25TopKDocs(t)),
      "stored-served BM25 diverges from the in-plan ranking")
  }

  test("sim_ann_adc_serve equals the self-contained stored face") {
    val served = rows(Sim.pqAdcServe(t))
    assert(served.nonEmpty, "vacuous: no ranked rows")
    assert(served == rows(Sim.pqAdcTopKStored(t)),
      "ensured-artifact ADC search diverges from the inline-built one")
  }

  test("retrieval_hybrid_rrf_serve equals the day-old-index fresh hybrid") {
    // round 11 re-pointed hybridRrfStored at the same ensured artifacts
    // the serve face reads, so comparing those two would be a tautology;
    // the INDEPENDENT path is the mid-day face — day-old upserted indexes
    // served through the fresh-df lexical leg and the appended vector
    // codes. Equality proves the whole maintenance story end to end.
    val served = rows(TrainData.hybridRrfServe(t))
    assert(served.nonEmpty, "vacuous: no fused rows")
    assert(served == rows(TrainData.hybridRrfStoredFresh(t)),
      "serve-only hybrid diverges from the day-old-index fresh hybrid")
  }

  test("artifact fingerprints of file-backed tables are metadata-only: no raw-corpus scan per serve call") {
    // the serve contract ("matched posting lists ... never the raw text")
    // requires the per-call fingerprint to avoid content-scanning the
    // corpus: a plain parquet table must take the file-metadata fast path
    val k1 = graft.engine.ArtifactCache.fileKey(t.documents)
    assert(k1.isDefined, "a plain parquet scan missed the metadata fast path")
    // stable across independent Tables instances (the per-query re-read)
    val k2 = graft.engine.ArtifactCache.fileKey(
      graft.sources.Tables(spark, sf).documents)
    assert(k1 == k2, "the metadata fingerprint is not stable across reads")
    // derived / in-memory frames (the spec-corpus case) must NOT take the
    // fast path — content keying is what isolates corpora sharing a path
    import spark.implicits._
    val mem = Seq((1L, "fk a b c")).toDF("doc_id", "text")
    assert(graft.engine.ArtifactCache.fileKey(mem).isEmpty,
      "an in-memory frame claimed a file identity")
    assert(graft.engine.ArtifactCache.fileKey(
      t.documents.filter(col("doc_id") > 0)).isEmpty,
      "a derived frame claimed its source's file identity")
  }

  test("maintenance faces never mutate the ensured base artifact they read") {
    // round 11's contract: compact/upsert faces source their BASE from
    // the session's ensured artifact READ-ONLY and write their output to
    // their own fingerprint-keyed directory. The listing triple
    // (path, length, mtime) is exactly the metadata fingerprint — any
    // mutation (including an in-place truncation reaching a shared
    // hard-link inode) would change it and silently invalidate the key.
    def listing(dir: String): Seq[(String, Long, Long)] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      java.nio.file.Files.walk(root).forEach { p =>
        if (!java.nio.file.Files.isDirectory(p))
          out += ((root.relativize(p).toString, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
      }
      out.sortBy(_._1).toSeq
    }
    val bases = Seq(
      "dupgroups"    -> Dedup.dupGroupsDir(t),
      "tindex"       -> TrainData.textIndexDir(t),
      "vindex"       -> Sim.vectorIndexDir(t),
      "tindex/base"  -> TrainData.baseTextIndexDir(t),
      "vindex/base"  -> Sim.baseVectorIndexDir(t))
    val before = bases.map { case (k, d) => (k, d, listing(d)) }
    Dedup.dupGroupsCompact(t).collect()
    TrainData.textIndexCompact(t).collect()
    Sim.vectorIndexCompact(t).collect()
    TrainData.textIndexUpsert(t).collect()
    Sim.vectorIndexUpsert(t).collect()
    TrainData.bm25TopKStoredFresh(t).collect()
    TrainData.hybridRrfStoredFresh(t).collect()
    before.foreach { case (k, d, l) =>
      assert(listing(d) == l, s"maintenance mutated the ensured $k base at $d")
    }
  }

  test("serve faces reuse the ensured artifacts: no rebuild across calls") {
    TrainData.bm25TopKServe(t).collect() // ensure both artifacts exist
    TrainData.hybridRrfServe(t).collect()
    def mtimes = Seq(
      s"${TrainData.textIndexDir(t)}/postings/_SUCCESS",
      s"${Sim.vectorIndexDir(t)}/_SUCCESS")
      .map(p => new java.io.File(p).lastModified())
    val built = mtimes
    assert(built.forall(_ > 0), "an ensured artifact is missing its _SUCCESS marker")
    Sim.pqAdcServe(t).collect()
    TrainData.hybridRrfServe(t).collect()
    assert(mtimes == built, "a serve face rebuilt an ensured artifact")
  }

  test("ArtifactCache: concurrent ensure builds once; rebuild forces; a build may ensure another artifact") {
    import graft.engine.ArtifactCache
    val fp = s"spec_${System.nanoTime()}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // 4 threads race ensure() on the SAME artifact: exactly one build
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        ArtifactCache.ensure("spec_cc", fp) { _ =>
          builds.incrementAndGet(); Thread.sleep(50)
        }; ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() == 1, s"concurrent ensure ran ${builds.get()} builds")
    // rebuild forces a second build; a later ensure reuses it
    ArtifactCache.rebuild("spec_cc", fp)(_ => { builds.incrementAndGet(); () })
    ArtifactCache.ensure("spec_cc", fp)(_ => { builds.incrementAndGet(); () })
    assert(builds.get() == 2, "rebuild must build again and ensure must then reuse")
    // the nested shape every upserted index uses (its build ensures the
    // pre-delta base): must complete — the old compute-bin design ran
    // builds inside ConcurrentHashMap bins, where a nested update of the
    // same map is forbidden and can loop when keys share a bin
    var innerRan = false
    ArtifactCache.ensure("spec_cc_outer", fp) { _ =>
      ArtifactCache.ensure("spec_cc_inner", fp) { _ => innerRan = true }; ()
    }
    assert(innerRan, "the nested ensure did not run its build")
  }
}
