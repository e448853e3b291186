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

  test("retrieval_hybrid_rrf_serve equals the self-contained stored hybrid") {
    val served = rows(TrainData.hybridRrfServe(t))
    assert(served.nonEmpty, "vacuous: no fused rows")
    assert(served == rows(TrainData.hybridRrfStored(t)),
      "serve-only hybrid diverges from the self-contained stored hybrid")
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
}
