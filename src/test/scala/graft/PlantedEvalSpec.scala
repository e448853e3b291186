package graft

import graft.operators.TrainData
import org.apache.spark.sql.functions._

/** The planted retrieval eval (retrieval_eval_ndcg_planted): the judgment
  * list populates all three grades for every query by construction, and
  * every system scores NONZERO NDCG — the discriminating eval the
  * corpus-measured judgments cannot provide on the synthetic corpus.
  */
class PlantedEvalSpec extends SparkSpec {

  test("planted judgments: all three grades for every query, known labels") {
    val judg = TrainData.plantedJudgments(t).collect()
    val byQ = judg.groupBy(_.getLong(0))
    assert(byQ.size == TrainData.bm25NQueries.toInt)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).toSet == Set(1L, 2L, 3L),
        s"query $q is missing a grade: ${rows.mkString(", ")}")
    }
  }

  test("every system scores nonzero NDCG on every query of the planted slice") {
    val out = TrainData.retrievalEvalNdcgPlanted(t).collect()
    val systems = out.map(_.getString(0)).toSet
    assert(systems == Set("bm25", "cosine", "hybrid_rrf", "ivfpq"), s"systems: $systems")
    val zeros = out.filter(r => r.isNullAt(4) || r.getDouble(4) <= 0.0)
    assert(zeros.isEmpty,
      s"zero/NULL NDCG rows on the planted slice:\n${zeros.mkString("\n")}")
    // IDCG is the same constant for every query (3 planted docs, grades 3/2/1)
    val idcg = TrainData.ndcgDiscQ6.zip(Seq(3L, 2L, 1L)).map { case (d, r) => d * r }.sum
    assert(out.forall(_.getLong(3) == idcg), "unexpected IDCG on a planted query")
  }

  test("planted corpus: vector tiers are ordered (cos v1 > v2 > v3 vs the query)") {
    val t2 = TrainData.plantedTables(t)
    graft.functions.VectorExpressions.register(spark)
    val e = t2.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < TrainData.bm25NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val planted = e.filter(col("vec_id") >= TrainData.plantedBase)
      .withColumn("qid", ((col("vec_id") - TrainData.plantedBase) / 10).cast("long"))
      .withColumn("variant", (col("vec_id") % 10).cast("int"))
    val cos = planted.join(q, "qid")
      .withColumn("cos", expr("graft_cosine(v, qv)"))
      .select("qid", "variant", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (0L until TrainData.bm25NQueries).foreach { qid =>
      assert(cos((qid, 1)) > cos((qid, 2)) && cos((qid, 2)) > cos((qid, 3)),
        s"planted cosine tiers not ordered for query $qid: " +
          s"${cos((qid, 1))}, ${cos((qid, 2))}, ${cos((qid, 3))}")
    }
  }
}
