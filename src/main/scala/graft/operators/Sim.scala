package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.8, rows
  * 40-41): brute-force cosine top-k as the correctness baseline, random-
  * hyperplane LSH bucketing as the scale path (bucket equi-join instead of
  * cross join — at 100 TB the bucket turns an O(N·Q) scan into O(N·Q/2^b)).
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions over
  * array<double> — codegen'd, no UDFs.
  */
object Sim {

  /** Sequential-fold dot product (same summation order as a plain loop, so
    * an external oracle computing left-to-right matches bit-for-bit).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  private def vecs(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  val topK = 5
  val nQueries = 10 // vec_id < 10 are the query set

  /** Exact cosine FULL ranking per query — the unsorted internal face
    * (no rank cut, no orderBy) shared by the registered `cosineTopK`
    * and the hybrid-retrieval vector leg (which needs a deeper shortlist
    * and a different query set). Yields (query_id, neighbor_id, rank,
    * cos). Query side is tiny ⇒ broadcast; the ranking window is one
    * pass over the per-query candidate axis.
    */
  private[graft] def cosineRanked(t: Tables, nQ: Long): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = vecs(t)
    val q = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, v)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** #40 sim_ann_cosine_topk — exact cosine top-k per query vector.
    * Query side is tiny ⇒ broadcast; per-vector norms computed once.
    * floor-rounding for oracle stability.
    */
  def cosineTopK(t: Tables): DataFrame =
    cosineRanked(t, nQueries).filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))

  /** sim_ann_filtered — FILTERED vector search, the vector-DB capability
    * every retrieval deployment actually runs ("nearest neighbors WHERE
    * metadata matches"): exact cosine top-k per query among only the
    * candidates sharing the query's `label` (category-scoped search).
    * The filter is an EQUI-predicate, so it rides the join key instead of
    * being a post-filter: candidates join the broadcast query set on
    * (label), and the dot product only ever runs on same-label pairs —
    * the selectivity is captured before the expensive work, not after.
    * At 100 TB the same shape is storage-level: with the index
    * partitioned (or z-ordered) by the filter column, the equi-predicate
    * becomes partition pruning and the scan reads only matching lists —
    * exactly how `sink_vector_index` turns cluster routing into pruning.
    * Post-filtering a plain top-k is the known failure mode (k survivors
    * of the filter may not exist in any unfiltered top-k') — this
    * operator filters FIRST, which is why it must be its own plan and
    * not a wrapper over `cosineTopK`.
    */
  def cosineTopKFiltered(t: Tables): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = t.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("label").as("qlabel"))
    val pairs = e.join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, v)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("qlabel").cast("long").as("label"),
        col("vec_id").as("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Cosine threshold for embedding near-dup pairs. */
  val nearDupTau = 0.4

  /** Block count for the distributed exact all-pairs join. Sized to the
    * cluster in prod (≈ sqrt(4 × executor-cores)); 8 ⇒ 36 block-pair tasks.
    */
  val nBlocks = 8

  /** dedup_embedding_cosine — embedding-space near-duplicate pairs: all
    * (a, b) with cosine ≥ τ, computed EXACTLY via a block-partitioned
    * all-pairs equi-join.
    *
    * Why not LSH candidates here: measured on the driver's corpora, true
    * pairs at τ=0.4 sit at cosine 0.40–0.60 (angle up to 66°) — random-
    * hyperplane bands would miss most of them (per-hyperplane agreement is
    * only ~0.63), so a bucketed candidate step cannot reproduce the exact
    * pair set. LSH remains the documented APPROXIMATE scale path (#41
    * `lshTopK`); the exact operator instead fixes the SHAPE of the O(N²)
    * work: instead of one BroadcastNestedLoopJoin (single-node quadratic),
    * each vector is replicated to its ~B/2 block-pair keys and the pairs
    * materialize through a shuffle/broadcast HASH join over B(B+1)/2
    * uniformly-sized tasks — O(N²) total work, O((N/B)²) per task, bounded
    * memory, no nested loop anywhere.
    */
  def embeddingNearDup(t: Tables): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = vecs(t)
      .withColumn("blk", pmod(xxhash64(col("vec_id")), lit(nBlocks)).cast("int"))
    // vector in block i joins every block-pair key (i, j≥i) on the A side
    // and (i≤j, j) on the B side; pair {x,y} with x∈i, y∈j (i<j) meets
    // exactly once under key (i,j); same-block pairs dedup on vec_id order
    val aSide = e.select(col("vec_id"), col("v"), col("blk"),
        explode(sequence(col("blk"), lit(nBlocks - 1))).as("jb"))
      .withColumn("bp", col("blk") * nBlocks + col("jb"))
    val bSide = e.select(col("vec_id").as("vb_id"), col("v").as("vb_v"),
        col("blk").as("jblk"), explode(sequence(lit(0), col("blk"))).as("ib"))
      .withColumn("bp", col("ib") * nBlocks + col("jblk"))
    aSide.join(bSide, "bp")
      .filter(col("blk") < col("jblk") || col("vec_id") < col("vb_id"))
      .withColumn("cos", expr("graft_cosine(v, vb_v)"))
      .filter(col("cos") >= nearDupTau)
      .select(least(col("vec_id"), col("vb_id")).as("va"),
        greatest(col("vec_id"), col("vb_id")).as("vb"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("va"), col("vb"))
  }

  /** Brute-force reference for the spec: the single nested-loop form the
    * blocked operator must agree with pair-for-pair.
    */
  def embeddingNearDupBrute(t: Tables): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = vecs(t)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .filter(col("cos") >= nearDupTau)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("va"), col("vb"))
  }

  // ---- IVF (inverted-file) ANN ----

  val ivfLists = 16  // coarse centroids (≈ sqrt(N) in prod, trained on a sample)
  val ivfProbes = 4  // lists probed per query

  /** sim_ann_ivf — IVF-style ANN: k-means coarse centroids partition the
    * corpus into inverted lists; a query ranks centroids by cosine and
    * probes only the `ivfProbes` nearest lists with the exact metric. The
    * scale shape: the corpus shuffles ONCE on list_id; each query fans out
    * to a constant number of lists (N·Q·probes/lists work instead of N·Q).
    * Training runs on the corpus here (a sample in prod — the model is a
    * 16×64 table either way, always broadcastable). Rows-only; recall vs
    * the exact top-k is pinned in the spec.
    */
  def ivfTopK(t: Tables): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.VectorExpressions.register(t.spark)
    val spark = t.spark
    import spark.implicits._
    val e = vecs(t).withColumn("fv", array_to_vector(col("v"))).persist()
    val model = new KMeans().setK(ivfLists).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("v"), col("prediction").as("list_id"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("list_id", "centroid")
    // per query: the ivfProbes nearest centroids by cosine
    val probeRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ccos").desc, col("list_id").asc)
    val probes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", expr("graft_cosine(qv, centroid)"))
      .withColumn("pr", row_number().over(probeRank)).filter(col("pr") <= ivfProbes)
      .select(col("query_id"), col("qv"), col("list_id"))
    // exact search inside the probed lists only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    val out = probes.join(assigned, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, v)"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
    // materialize the (Q×k) result so the MLlib feature cache can be
    // released instead of leaking for the session's lifetime
    val res = graft.engine.Reliability.planCheckpoint(out)
    e.unpersist()
    res
  }

  /** Fixed coarse-cluster count for the standalone assignment operator and
    * the stored-index faces (there the cluster id is the IVF LIST axis —
    * its scale story is the index layout, not the pair work).
    */
  val nCentroids = 8

  /** Target expected CLUSTER population for the two all-pairs-within-
    * cluster faces (`semanticDedup`, `knnGraph`). Same role as
    * `lshTargetBucketPop` on the LSH axis.
    */
  val centroidTargetPop = 512

  /** Corpus-size knob for the pair faces: enough centroids that
    * E[cluster population] = n / k ≈ targetPop. Within-cluster pair work
    * is then O(k · targetPop²) = O(n · targetPop) — LINEAR in n — instead
    * of the O(n²/k) of a fixed centroid count (the r11 verdict's measured
    * scale-killer: fixed k=8 stepped ~50× for 10× data at sf10). The
    * `lshPlanesFor` precedent, on the centroid axis. Floors at
    * `nCentroids` so every corpus ≤ 8·targetPop (all oracle SFs) keeps
    * the original 8-centroid assignment bit-for-bit.
    */
  def nCentroidsFor(n: Long, targetPop: Int = centroidTargetPop): Int =
    math.max(nCentroids, math.ceil(n.toDouble / targetPop).toInt)

  /** Centroid counts at or below this assign with the flat argmax; above
    * it, assignment routes two-stage through super-centroid Voronoi
    * cells. 64 is where 2√m clearly beats m and every oracle-SF corpus
    * (k = 8) plus the r12 scaled spec (k = 9) stays on the flat path
    * bit-for-bit.
    */
  val twoStageMinCentroids = 64

  /** Super-centroid count for the two-stage argmax: 1 (⇒ flat — one
    * cell holding every centroid) at or below the threshold, else
    * ceil(√m) — INTEGER-EXACT like `lshPlanesFor` (floor(sqrt) + an
    * integer fix-up, never a bare float ceil) so the SQL mirror can
    * never land one apart at a perfect square. The supers are the first
    * g centroids; every centroid joins its nearest super's cell
    * (`graft_centroid_best` computes the partition at plan build), so
    * per-row work is g + E[|cell|] ≈ 2√m cosines on balanced cells:
    * corpus-derived-k assignment (k = n/targetPop) drops from
    * O(n²/targetPop) total evaluations to O(n^1.5/√targetPop) — the
    * sf30–100 cliff NOTES r12 quantified (7.8e9 evals at sf100 = 2M
    * vectors, k≈3.9k) falls to ~2.5e8, codegen'd rather than
    * interpreted. Cells (not id-blocks) because routing must be
    * geometrically coherent to preserve cluster BALANCE — the measured
    * id-block variant multiplied pair work 4.6× (see the expression's
    * scaladoc). Past ~10⁷ vectors the documented hand-off remains the
    * trained-IVF face.
    */
  def centroidSuperCount(m: Int): Int =
    if (m <= twoStageMinCentroids) 1
    else {
      val s0 = math.sqrt(m.toDouble).toLong
      (if (s0 * s0 >= m) s0 else s0 + 1).toInt
    }

  /** Cells probed per row in the two-stage argmax (IVF's nprobe): the
    * argmax runs over the UNION of the `centroidRouteProbes` nearest
    * supers' cells. 1 probe minimizes per-row cost but lets boundary
    * vectors misroute, and misroutes CONCENTRATE — measured at 100×
    * (200k vectors, k=391), Σpop² (the downstream pair-work proxy) vs
    * the flat argmax's: 1 probe 1.76×, 2 probes 1.21×, 3 probes 1.10×,
    * 4 probes 1.05×. 3 is the knee: the pair faces (the dominant
    * slice) stay within 10% of flat balance while assignment is still
    * (1+3)√k per row ≈ 5× under the flat rule at sf10 and widening
    * with √k. The oracle mirrors probes as `rk <= P` on the super
    * rank.
    */
  val centroidRouteProbes = 3

  /** The ONE nearest-centroid assignment definition `clusterAssign`,
    * `semanticDedup`, `knnGraph` and the index faces all build on
    * (centroid rule: the `k` lowest-id vectors; tie-break: higher cosine,
    * then lower centroid id) — shared so the operators can never drift.
    * Returns (vec_id, cluster, v, ccos).
    *
    * ONE rule, TWO physical shapes (the spec pins their agreement):
    *  - k ≤ `nCentroids` (the fixed-count faces): broadcast the k×64
    *    centroid table, fan out k cosines per row, collapse to the
    *    argmax with `max_by` — partial aggregation reduces the n·k
    *    fan-out to n rows map-side, so the only shuffle is n
    *    pre-aggregated rows (a window rank here would shuffle all n·k).
    *  - k > `nCentroids` (the corpus-derived counts of `semanticDedup` /
    *    `knnGraph`): the n·k intermediate ROWS are the cost that made
    *    the r11 probe superlinear (78M materialized rows at sf10 for a
    *    few GFLOP of actual math), so the argmax evaluates INSIDE one
    *    native expression per row over the centroid matrix shipped as a
    *    plan constant (the streaming ingest faces' nightly-model-as-
    *    literals move) — zero joins, zero shuffle, one corpus scan.
    *    Since r13 that expression is `graft_centroid_best`
    *    (functions/VectorExpressions.scala), which (a) runs inside
    *    whole-stage codegen — the r12 `aggregate(...)` fold was a
    *    CodegenFallback higher-order chain evaluating interpreted — and
    *    (b) routes TWO-STAGE through super-centroid Voronoi cells
    *    (`centroidSuperCount`: g = ⌈√m⌉ supers above
    *    `twoStageMinCentroids`, g = 1 ⇒ bit-identical flat argmax below
    *    it), cutting per-row work from O(k) to ≈O(2√k) cosines while
    *    preserving cluster BALANCE (cells are geometrically coherent —
    *    see the expression's scaladoc for the measured id-block
    *    counterexample). That bounds total assignment at
    *    O(n^1.5/√targetPop) — the term NOTES r12 measured re-dominating
    *    in the sf30–100 range under the flat rule. Ties keep the FIRST
    *    (lowest-position = lowest-id) centroid at both stages — the
    *    same (ccos desc, cluster asc) rule the oracle's rank mirrors
    *    replay. The matrix is k×64 doubles (~200 KB at sf10's k=391,
    *    ~2 MB at sf100) — a plan constant, broadcast with the task
    *    binary.
    */
  private def assignToCentroids(t: Tables, data: Option[DataFrame] = None,
      k: Int = nCentroids): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = vecs(t)
    // the model side always anchors to `t`'s lowest-id vectors; `data`
    // optionally restricts the ASSIGNED side (the daily delta encode —
    // low ids are never in the delta, so the base model IS the full
    // model and delta assignments cannot drift)
    if (k <= nCentroids) {
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cluster"), col("v").as("cv"))
      data.getOrElse(e).crossJoin(broadcast(cents))
        .withColumn("ccos", expr("graft_cosine(v, cv)"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cluster"), col("v"), col("ccos")),
          struct(col("ccos"), negate(col("cluster")))).as("best"))
        .select(col("vec_id"), col("best.cluster").as("cluster"),
          col("best.v").as("v"), col("best.ccos").as("ccos"))
    } else {
      // ids carried separately so a sparse id space can't skew the
      // position→centroid mapping; both literals sorted by vec_id, so
      // lower position == lower centroid id (the tie-break)
      val centRows = e.filter(col("vec_id") < k).orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      val m = centRows.length
      // degenerate corpus (no vec_id < k — a fully sparse/offset id
      // space): the fold below would index an empty literal; return the
      // same EMPTY assignment the fixed branch's crossJoin-with-empty-
      // cents produces for the identical corpus
      if (m == 0)
        data.getOrElse(e).where(lit(false))
          .select(col("vec_id"), lit(-1L).as("cluster"), col("v"),
            lit(0d).as("ccos"))
      else data.getOrElse(e)
        .withColumn("best", call_function("graft_centroid_best",
          col("v"), typedLit(centRows.map(_._2).toSeq),
          lit(centroidSuperCount(m)), lit(centroidRouteProbes)))
        .withColumn("cids", typedLit(centRows.map(_._1).toSeq))
        .select(col("vec_id"),
          element_at(col("cids"), col("best.p") + 1).as("cluster"),
          col("v"), col("best.c").as("ccos"))
    }
  }

  /** emb_cluster_assign — nearest-centroid assignment, the primitive under
    * every embedding-space curation step (semantic dedup buckets, cluster-
    * balanced sampling, IVF list routing). Centroids here are the
    * `nCentroids` lowest-id vectors — DETERMINISTIC, so the operator is
    * hash-checked end-to-end (the k-means-trained variant is `ivfTopK`,
    * rows-only, where the model comes from MLlib). Ties break to the lower
    * centroid id.
    *
    * Scale shape: the centroid table is K×64 → broadcast; assignment is a
    * per-row argmax over K cosines — one scan, no shuffle except the final
    * per-vector rank (collapsed by AQE into the scan's partitioning since
    * the window key is the row key).
    */
  def clusterAssign(t: Tables): DataFrame =
    assignToCentroids(t)
      .select(col("vec_id"), col("cluster"),
        (floor(col("ccos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("vec_id"))

  /** dedup_semantic — SemDeDup-shaped near-duplicate detection: vectors are
    * first routed to their nearest centroid (the `clusterAssign` step), and
    * near-dup pairs are searched ONLY within a cluster. This is the
    * semantic-dedup design real pretraining pipelines run at scale: the
    * quadratic pair work is bounded by the largest cluster, not the corpus,
    * at the documented cost of missing cross-cluster pairs (two near-dups
    * split by a centroid boundary) — the exact-pair operator remains
    * `embeddingNearDup`. Deterministic centroids keep it hash-checked.
    *
    * Scale shape: one argmax scan to assign, ONE shuffle on the
    * cluster id, hash-join within cluster — and the centroid count is
    * CORPUS-DERIVED (`nCentroidsFor`: k = n/targetPop), holding expected
    * cluster population constant so pair work stays O(n · targetPop),
    * linear in n. Above `twoStageMinCentroids` the assignment itself
    * routes two-stage through ⌈√k⌉ super-centroid Voronoi cells
    * (`graft_centroid_best`) so the argmax term is
    * O(n·√k) = O(n^1.5/√targetPop), not the O(n²/targetPop) flat rule
    * NOTES r12 measured re-dominating past sf30. AQE skew-join covers
    * hot clusters. The oracle mirrors k via
    * greatest(8, ceil(count(*)/targetPop)) and the full two-stage rule
    * (`centroidAssignTwoStageCtes`) in SQL.
    */
  def semanticDedup(t: Tables): DataFrame = {
    val k = nCentroidsFor(t.embeddings.count())
    val assigned = assignToCentroids(t, k = k)
      .select(col("vec_id"), col("cluster"), col("v"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .filter(col("cos") >= nearDupTau)
      .select(col("a.cluster").as("cluster"),
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("va"), col("vb"))
  }

  // ---- banded random-hyperplane LSH (#41) ----

  /** LSH tables (bands). More tables = higher recall: a true neighbor pair
    * only needs to agree on ALL planes of ONE table.
    */
  val lshTables = 4

  /** Fixed plane count for callers that PIN the banding geometry (specs
    * that compare against a hand-built reference). The registered face
    * derives its count from corpus size via `lshPlanesFor` — the
    * corpus-size knob that keeps expected bucket population CONSTANT as
    * N grows (the r3/r4 verdict's scale-killer was a corpus-independent
    * bucket count: N²/256 pair work; r12's full-suite sf10 run measured
    * the registered face still carrying it — 797 s — and moved the
    * derivation into `lshTopK` itself).
    */
  val lshPlanesPerTable = 5

  /** Target expected bucket population at scale. */
  val lshTargetBucketPop = 32

  /** Corpus-size knob: planes per table such that E[bucket population] =
    * N / 2^planes ≈ targetPop. In-bucket pair work is then
    * O(buckets · targetPop²) = O(N · targetPop) — LINEAR in N, per table,
    * instead of the quadratic N²/2^const of a fixed plane count.
    *
    * INTEGER-EXACT formulation (smallest p ≥ 4 with targetPop·2^p ≥ n,
    * i.e. ceil(log2(n/targetPop)) floored at 4, never via floating log):
    * the oracle mirrors the rule in SQL, and at a power-of-two boundary
    * a JVM log(n)/log(2) and a DuckDB log2(n) can ceil to DIFFERENT
    * integers by one ulp — desyncing the whole banding. Capped at 31 so
    * every per-plane bit weight (1L << j, j ≤ 30) and the summed band
    * key stay inside a positive 32-bit range on BOTH engines — beyond 31
    * planes the band keys would silently alias (Int wrap here, INTEGER
    * shift in the SQL mirror). 31 planes saturate at targetPop·2^31 ≈
    * 6.9·10^10 vectors; past that the documented knob is a wider band-key
    * type (Long bits + BIGINT shifts on the oracle side), not more of the
    * same shift.
    */
  def lshPlanesFor(n: Long, targetPop: Int = lshTargetBucketPop): Int = {
    var p = 4
    while (p < 31 && (targetPop.toLong << p) < n) p += 1
    p
  }

  /** Deterministic pseudo-random hyperplane: global plane index p's
    * component d is sin((p*1009 + 31) * (d + 1)) — no RNG in the plan,
    * reproducible across runs AND engines (the oracle replays the same
    * formula). Each plane gets its OWN frequency (p*1009 + 31), which is
    * what makes the planes near-orthogonal: a phase-only family like
    * sin(p·a + d·b) collapses into cos/sin(d·b)'s 2-D span — every plane a
    * linear combination of two basis vectors, so k planes discriminate no
    * better than 2 and buckets cannot balance. `table`'s band key = the
    * sign pattern of its `planes` projections.
    */
  def lshBandKey(v: Column, table: Int, planes: Int): Column =
    // one fused codegen'd loop (graft_lsh_band) — bit-for-bit the
    // composed `Σ_j when(aggregate(zip_with(v, sin-planes, *)) >= 0,
    // 1<<j)` form it replaced, which was a CodegenFallback higher-order
    // chain evaluating interpreted (VectorExpressionsSpec pins the
    // equality against the composed form; callers must have
    // VectorExpressions.register'd the session)
    call_function("graft_lsh_band", v, lit(table), lit(planes))

  /** emb_quantize — int8 scalar quantization of the embedding column (the
    * 4× storage cut that makes a 100 TB vector corpus shippable): per
    * vector, symmetric scale = max|v|/127, q_i = ⌊v_i/scale + 0.5⌋ (explicit
    * half-up — engine-independent, unlike round()'s tie mode), plus the
    * quality audit a quantization pass must emit: relative L2
    * reconstruction error and saturation count. Pure per-row array
    * expressions — zero shuffle, one scan, same codegen tier as the text
    * quality ops.
    */
  def quantize(t: Tables): DataFrame = {
    val e = vecs(t)
      .withColumn("scale",
        expr("aggregate(v, 0.0d, (m, x) -> greatest(m, abs(x)))") / 127.0)
      .withColumn("q", expr("transform(v, x -> cast(floor(x / scale + 0.5d) AS int))"))
      .withColumn("err",
        // squared terms via plain multiplication: libm pow() may differ in
        // the last ulp between engines, x*x cannot
        expr("aggregate(zip_with(v, q, (x, qi) -> (x - qi * scale) * (x - qi * scale)), 0.0d, (a, x) -> a + x)"))
    e.select(col("vec_id"),
        (floor(col("scale") * 1000000) / 1000000).as("scale6"),
        (floor(sqrt(col("err")) / norm(col("v")) * 10000) / 10000).as("rel_err"),
        size(expr("filter(q, qi -> abs(qi) = 127)")).as("n_saturated"))
      .orderBy(col("vec_id"))
  }

  /** #41 sim_ann_lsh — BANDED multi-table random-hyperplane LSH (the
    * minhash banding discipline, Dedup.scala's band shape, applied to the
    * hyperplane signature): each vector lands in `lshTables` buckets — one
    * per table, keyed by that table's sign pattern — and candidate pairs
    * come from an equi-join on (table, band_key). Exact cosine runs only on
    * candidates; output is each vector's best candidate neighbor.
    *
    * Scale shape: the join key is (table, band_key), so no single bucket's
    * population is corpus-proportional once `planesPerTable` is sized by
    * `lshPlanesFor(N)` — in-bucket pair work stays O(N · targetPop) per
    * table. A pair colliding in several tables yields duplicate candidate
    * rows; they tie exactly on the (cos desc, neighbor_id) rank order, so
    * the top-1 row is deterministic WITHOUT a distinct — dropping the
    * distinct exchange that would otherwise shuffle the full pair set.
    * Hash-checked against the oracle (same sin-derived planes).
    *
    * The plane count is CORPUS-DERIVED by default (`planesPerTable` = 0 ⇒
    * `lshPlanesFor(n)`: enough planes that E[bucket population] stays at
    * `lshTargetBucketPop` as n grows) — the registered face used the
    * fixed `lshPlanesPerTable` until the r12 full-suite sf10 run measured
    * the consequence: 2^5 buckets per table at 600k vectors ⇒ ~18.7k
    * expected population ⇒ ~10^10 candidate pairs, 797 s at sf10 (~62×
    * per 10× vs the 12.9 s sf1 co-run — the same fixed-constant
    * quadratic the centroid axis had). The oracle
    * mirrors the derivation from count(*) in SQL, so the two engines
    * always band on the same plane set at any SF.
    */
  def lshTopK(t: Tables, nTables: Int = lshTables,
              planesPerTable: Int = 0): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val planes =
      if (planesPerTable > 0) planesPerTable
      else lshPlanesFor(t.embeddings.count())
    val e = vecs(t).select(col("vec_id"), col("v"),
      posexplode(array((0 until nTables).map(tb =>
        lshBandKey(col("v"), tb, planes)): _*)).as(Seq("table", "band_key")))
    val pairs = e.as("a").join(e.as("b"),
        col("a.table") === col("b.table") && col("a.band_key") === col("b.band_key") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        expr("graft_cosine(a.v, b.v)").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("vec_id"))
  }

  /** Target dimensionality of the random projection. */
  val projDims = 16

  /** emb_random_projection — Johnson-Lindenstrauss dimensionality reduction
    * (64 → `projDims`): the standard scale move before clustering /
    * LSH / brute-force rerank when the vector corpus itself is the storage
    * and compute bottleneck — pairwise geometry survives within (1±ε) while
    * dot products get 4× cheaper. The projection matrix is the sparse
    * Achlioptas family in deterministic form: R[d][j] ∈ {-1, 0, +1} · √3
    * chosen by a Knuth mix of (d, j) with P(±1)=1/6 each (E[R²]=1), scaled
    * by the JL 1/√k — no RNG in the plan, reproducible across runs AND
    * engines. The √3/√k constant is folded OUT of the per-row fold (applied
    * once at the end), so the fold is integer-weighted double sums —
    * order-pinned, exactly replayable in the oracle. Output: projected
    * coords + the norm-ratio audit column (JL says it concentrates near 1).
    *
    * Scale shape: pure per-row array math, zero shuffle, one codegen'd
    * scan; the matrix is 64×16 literals baked into the plan.
    */
  /** Projection-matrix entry sign: mix (d·projDims + j) into [0, 6);
    * 0 ⇒ +1, 1 ⇒ −1, else 0 (the Achlioptas 1/6 density). Shared with the
    * oracle generator so both engines bake the identical matrix.
    */
  def projSign(d: Int, j: Int): Int = {
    val m = ((d.toLong * projDims + j) * 2654435761L % 1000003L % 6L).toInt
    if (m == 0) 1 else if (m == 1) -1 else 0
  }

  /** The unscaled integer-weighted fold for projected coordinate j over a
    * vector column (ascending-d, left-assoc — the order the oracle
    * replays). Scale factors (√3, 1/√k) are applied by callers where they
    * matter; cosine consumers skip them (they cancel).
    */
  def projFold(v: Column, j: Int): Column = {
    val terms = (0 until 64).map(d => (d, projSign(d, j))).filter(_._2 != 0)
    terms.foldLeft(lit(0.0)) { case (acc, (d, s)) =>
      if (s > 0) acc + element_at(v, d + 1)
      else acc - element_at(v, d + 1)
    }
  }

  def randomProjection(t: Tables): DataFrame = {
    val proj = (0 until projDims).map { j =>
      (floor(projFold(col("v"), j) * (math.sqrt(3.0) / 4.0) * 10000) / 10000).as(s"p$j")
    }
    val nIn = norm(col("v"))
    // /4 = the exact-halving 1/√k for k = 16 projected dims
    val nOut = sqrt(
      (0 until projDims).map { j =>
        val folded = projFold(col("v"), j)
        folded * folded * 3.0
      }.reduce(_ + _)) / 4.0
    vecs(t)
      .select(col("vec_id") +: proj :+
        (floor(nOut / nIn * 10000) / 10000).as("norm_ratio"): _*)
      .orderBy(col("vec_id"))
  }

  /** Expected embedding dimensionality (the audit's contract). */
  val expectedDims = 64

  /** emb_quality_audit — the vector-store admission audit a pipeline runs
    * before trusting an embedding drop: corpus counts, doc↔vector
    * alignment (docs without vectors, orphan vectors), wrong-dimension
    * rows, non-finite components, zero-norm vectors, and the norm range.
    * Min/max norms only — a corpus MEAN of doubles is shuffle-order-
    * dependent and could never hash-match an oracle. One scan per side +
    * two anti-join counts; all aggregates map-side combined.
    */
  def qualityAudit(t: Tables): DataFrame = {
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bad = e.select(
      count(lit(1)).as("n_vectors"),
      sum(when(size(col("v")) =!= expectedDims, 1L).otherwise(0L)).as("n_bad_dim"),
      sum(when(expr("exists(v, x -> isnan(x) OR abs(x) > 1e308)"), 1L).otherwise(0L))
        .as("n_nonfinite"),
      sum(when(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)") === 0.0, 1L).otherwise(0L))
        .as("n_zero_norm"),
      (floor(min(norm(col("v"))) * 10000) / 10000).as("norm_min"),
      (floor(max(norm(col("v"))) * 10000) / 10000).as("norm_max"))
    val docs = t.documents.select(col("doc_id"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val missing = docs.join(e, docs("doc_id") === e("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n_missing_vec"))
    val orphan = e.join(docs, e("vec_id") === docs("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_vec"))
    bad.crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(missing))
      .crossJoin(broadcast(orphan))
      .select(col("n_vectors"), col("n_docs"), col("n_missing_vec"),
        col("n_orphan_vec"), col("n_bad_dim"), col("n_nonfinite"),
        col("n_zero_norm"), col("norm_min"), col("norm_max"))
  }

  /** Candidate pool per query for the projected first stage. */
  val rerankCandidates = 15

  /** sim_ann_project_rerank — the TWO-STAGE retrieval every production
    * vector store runs: a cheap pass over the 16-dim projected vectors
    * picks `rerankCandidates` per query, then exact 64-dim cosine re-ranks
    * only those to top-k. The projection's √3/√k scale cancels inside
    * cosine, so stage 1 uses the raw integer-weighted folds — 4× fewer
    * multiplies per pair than the exact pass, and at scale the projected
    * table is the one that fits in memory / serves from the ANN index
    * (compose with sim_ann_lsh / sim_ann_ivf for sublinear candidate
    * generation; this operator isolates the projection-quality question).
    * Recall vs the exact operator is pinned in spec; hash-checked oracle
    * (the folds and both cosines replay bit-for-bit).
    */
  def projectRerank(t: Tables): DataFrame = {
    val e = vecs(t).select(
      col("vec_id") +: col("v") +:
        (0 until projDims).map(j => projFold(col("v"), j).as(s"f$j")): _*)
    val q = e.select(
      col("vec_id").as("query_id") +: col("v").as("qv") +:
        (0 until projDims).map(j => col(s"f$j").as(s"qf$j")): _*)
      .filter(col("query_id") < nQueries)
    val dot16 = (0 until projDims).map(j => col(s"f$j") * col(s"qf$j")).reduce(_ + _)
    val n16 = sqrt((0 until projDims).map(j => col(s"f$j") * col(s"f$j")).reduce(_ + _))
    val qn16 = sqrt((0 until projDims).map(j => col(s"qf$j") * col(s"qf$j")).reduce(_ + _))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("pcos").desc, col("vec_id").asc)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("pcos", dot16 / (n16 * qn16))
      .withColumn("crank", row_number().over(w1))
      .filter(col("crank") <= rerankCandidates)
      .withColumn("cos", dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-(table, band_key) populations for the registered LSH instance —
    * the bucket-balance audit surface (spec bounds the max population).
    * Mirrors `lshTopK`: `planesPerTable` = 0 (the default) derives the
    * plane count from corpus size via `lshPlanesFor`, so the audit sees
    * the geometry the registered face actually runs; specs that pin a
    * hand-built reference pass their fixed count explicitly.
    */
  def lshBucketPopulations(t: Tables, nTables: Int = lshTables,
                           planesPerTable: Int = 0): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val planes =
      if (planesPerTable > 0) planesPerTable
      else lshPlanesFor(t.embeddings.count())
    val e = vecs(t).select(col("vec_id"),
      posexplode(array((0 until nTables).map(tb =>
        lshBandKey(col("v"), tb, planes)): _*)).as(Seq("table", "band_key")))
    e.groupBy(col("table"), col("band_key")).agg(count(lit(1)).as("n"))
  }

  /** Neighbors kept per vector in the kNN graph. */
  val knnK = 4

  /** sim_knn_graph — the within-cluster k-nearest-neighbor graph: every
    * vector's top-k cosine neighbors among vectors sharing its nearest
    * centroid. This is the primitive under SemDeDup-style pruning,
    * cluster-balanced sampling and graph-based ANN index construction
    * (the edges an HNSW/NN-descent builder would refine). Same
    * deterministic centroid rule as `clusterAssign`/`semanticDedup`, so
    * the whole graph is hash-checked.
    *
    * Scale shape: one argmax scan to assign (two-stage-routed above
    * `twoStageMinCentroids` — `semanticDedup`'s rationale applies
    * verbatim), ONE shuffle on the cluster id, per-cluster hash-join +
    * per-vector rank — and the centroid count is CORPUS-DERIVED
    * (`nCentroidsFor`, shared with `semanticDedup`), holding expected
    * cluster population at `centroidTargetPop` so pair work is
    * O(n · targetPop), linear in n; AQE skew-join covers hot clusters.
    * Cross-cluster edges are missed by design; `cosineTopK` remains the
    * exact small-query-set face.
    */
  /** Product-quantization geometry: 64 dims → `pqM` subspaces of
    * `pqSubDim` dims, each encoded as its nearest of `pqK` sub-centroids
    * (4 bits/subspace ⇒ a 64-dim float vector compresses to 4 bytes —
    * THE memory shape that lets a 100 TB corpus keep its whole vector
    * index resident for ADC scanning). Sub-centroids follow the
    * deterministic low-id rule (`nCentroids`' trick): subspace m's
    * codebook = the first `pqK` vectors' m-th subvectors — so the whole
    * encoding is hash-checked; the k-means-trained variant swaps the
    * codebook literal, not the plan.
    */
  val pqM = 8
  val pqSubDim = 8
  val pqK = 16

  /** emb_pq_encode — product-quantization encoding (Jégou et al. 2011):
    * per vector, per subspace, the argmin-L2 sub-centroid code (ties →
    * lower code) + the total squared reconstruction error. Scale shape:
    * the codebook is pqK rows → broadcast; encoding is a per-row argmin
    * over pqK × pqM distance folds — one scan, one doc-axis groupBy to
    * fold the subspace axis back into columns. The error sum is built
    * column-wise (d0+…+d7, fixed order) so the 4dp floor is exact on
    * both engines.
    */
  /** The PQ assignment core: encode `data` (vec_id, xv) against `book`
    * (code, bv) — per-subspace argmin-L2 codes (ties → lower code) + the
    * column-wise error sum (fixed order ⇒ 4dp floor exact). The
    * per-subspace L2 folds generate with the offset inlined — ascending
    * i, left-assoc, matching the oracle's list_reduce.
    */
  /** Per-subspace L2² folds over columns `xv` (data) and `bv` (codeword)
    * — ascending i, left-assoc, matching the oracle's list_reduce.
    */
  private def subspaceL2Dists: Seq[org.apache.spark.sql.Column] =
    (0 until pqM).map { m =>
      val off = m * pqSubDim
      expr(s"aggregate(sequence(0, ${pqSubDim - 1}), cast(0.0 as double), " +
        s"(a, i) -> a + (xv[$off+i]-bv[$off+i])*(xv[$off+i]-bv[$off+i]))")
    }

  private def pqAssignCodes(data: DataFrame, book: DataFrame): DataFrame = {
    val dists = subspaceL2Dists
    val exploded = data.crossJoin(broadcast(book))
      .select(col("vec_id"), col("code"),
        posexplode(array(dists: _*)).as(Seq("m", "dist")))
    // lexicographic struct-min = (dist asc, code asc) — the tie rule
    val best = exploded.groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("code"))).as("b"))
      .select(col("vec_id"), col("m"),
        col("b.dist").as("dist"), col("b.code").as("code"))
    val aggs = (0 until pqM).flatMap { m =>
      Seq(sum(when(col("m") === m, col("code"))).cast("long").as(s"code$m"),
        sum(when(col("m") === m, col("dist"))).as(s"d$m"))
    }
    val errSum = (0 until pqM).map(m => col(s"d$m")).reduce(_ + _)
    best.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id") +: (0 until pqM).map(m => col(s"code$m")) :+
        (floor(errSum * 10000) / 10000).as("recon_err"): _*)
  }

  /** The unsorted encode frame — chain consumers (`pqDataCodes`) join or
    * explode this by vec_id, where the presentation sort would only risk
    * an exchange nothing reads (the dsirScores discipline).
    */
  private def pqEncodeUnsorted(t: Tables, data: Option[DataFrame] = None)
      : DataFrame = {
    val e = vecs(t)
    // codebook always from `t`'s lowest-id vectors; `data` optionally
    // restricts the encoded side (the assignToCentroids contract)
    val cents =
      e.filter(col("vec_id") < pqK).select(col("vec_id").as("code"), col("v").as("bv"))
    pqAssignCodes(data.getOrElse(e).select(col("vec_id"), col("v").as("xv")), cents)
  }

  def pqEncode(t: Tables): DataFrame =
    pqEncodeUnsorted(t).orderBy(col("vec_id"))

  /** emb_pq_encode_trained — the PRODUCTION codebook build: per-subspace
    * k-means (Jégou et al. 2011 §II trains exactly this — k centroids per
    * subspace, independently), swapped into the SAME assignment plan
    * (`pqAssignCodes`) as the deterministic encode. Each of the pqM
    * subspaces fits an MLlib k-means on its 8-dim subvectors; codeword j
    * is the concatenation of each subspace's centroid j (subspaces are
    * independent in PQ, so the pairing is free). Rows-only like
    * `sim_ann_ivf` (k-means init/convergence is seed- and
    * parallelism-shaped, not SQL-replayable); the spec pins total
    * reconstruction error ≤ the deterministic codebook's and ADC recall
    * at parity or better.
    *
    * Scale shape: training runs on a sample in prod (the model is pqM ×
    * pqK × 8 doubles — always broadcastable); encoding is the same
    * broadcast-book scan as `emb_pq_encode`.
    */
  /** The per-subspace k-means centers (pqM × pqK × pqSubDim), materialized
    * on the driver — the model a production build broadcasts. Public so
    * the spec can reconstruct vectors and audit ADC recall against the
    * deterministic codebook.
    */
  def pqTrainedCenters(t: Tables): Seq[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = vecs(t).persist()
    // subspaces are independent in PQ, so the pqM fits are independent
    // Spark jobs — run them from a small driver thread pool (guide-§2.6
    // job overlap): each fit's stages are short and leave most cores
    // idle, and sequential fits serialized ~8× the training wall. Fit
    // results are unchanged (fixed per-subspace seed; MLlib's aggregation
    // is partition-deterministic and the input partitioning does not
    // depend on the submitting thread).
    val books = parJobs(0 until pqM) { m =>
      val off = m * pqSubDim
      val sub = e.select(
        array_to_vector(expr(s"slice(v, ${off + 1}, $pqSubDim)")).as("fv"))
      val cs = new KMeans().setK(pqK).setSeed(42 + m).setMaxIter(5)
        .setFeaturesCol("fv").fit(sub).clusterCenters
      // k-means returns < k centers when a subspace has < k distinct
      // points (a duplicate-rich corpus); cycle rather than crash the
      // books(m)(j) indexing — duplicate codewords just never win argmin
      Array.tabulate(pqK)(j => cs(j % cs.length).toArray)
    }
    e.unpersist()
    books
  }

  /** Run independent per-index Spark jobs concurrently from a bounded
    * driver pool and return results in index order. 4 in flight is
    * enough to fill a fit's scheduling gaps without starving the stages
    * themselves.
    */
  private def parJobs[A](idx: Range)(body: Int => A): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    // finite timeout + shutdownNow on ANY failure path: Duration.Inf would
    // let one hung fit wedge the query forever, and a plain shutdown()
    // lets sibling fits keep running (it only stops new submissions) after
    // the first failure has already propagated
    try Await.result(Future.traverse(idx.toList)(m => Future(body(m))), 30.minutes)
    catch { case t: Throwable => pool.shutdownNow(); throw t }
    finally pool.shutdown()
  }

  def pqEncodeTrained(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val books = pqTrainedCenters(t)
    val book = (0 until pqK).map { j =>
      (j.toLong, (0 until pqM).flatMap(m => books(m)(j).toSeq))
    }.toDF("code", "bv")
    pqAssignCodes(vecs(t).select(col("vec_id"), col("v").as("xv")), book)
      .orderBy(col("vec_id"))
  }

  /** emb_pq_residual — RESIDUAL product quantization, the faithful IVF-PQ
    * encode (Jégou et al. 2011 §III): each vector first routes to its
    * coarse centroid (the shared `assignToCentroids` rule), and PQ
    * quantizes the RESIDUAL v − c(v) — residual norms are far smaller
    * than vector norms, so the same 4 bytes buy much lower
    * reconstruction error. The residual codebook follows the
    * deterministic low-id rule on the first `pqK` NON-centroid vectors'
    * residuals (centroid vectors' residuals are identically zero and
    * would waste codewords). Closes the global-code simplification
    * documented on `sim_ann_ivfpq`. Hash-checked end-to-end.
    */
  /** The coarse centroid table (cluster, cv) — the low-id rule. */
  private def coarseCents(t: Tables): DataFrame =
    vecs(t).filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cluster"), col("v").as("cv"))

  /** Every vector's coarse residual: (vec_id, cluster, rv). */
  private def residuals(t: Tables): DataFrame =
    assignToCentroids(t).select(col("vec_id"), col("cluster"), col("v"))
      .join(broadcast(coarseCents(t)), "cluster")
      .select(col("vec_id"), col("cluster"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("rv"))

  /** The residual codebook: the pqK lowest-id NON-centroid residuals. */
  private def residualBook(res: DataFrame): DataFrame =
    res.filter(col("vec_id") >= nCentroids && col("vec_id") < nCentroids + pqK)
      .select(col("vec_id").as("code"), col("rv").as("bv"))

  /** The unsorted residual-encode frame — the search side
    * (`ivfPqResidualTopK`) explodes this by vec_id; the presentation sort
    * stays on the registered face only.
    */
  private def pqResidualUnsorted(t: Tables): DataFrame = {
    val res = residuals(t)
    pqAssignCodes(res.select(col("vec_id"), col("rv").as("xv")), residualBook(res))
      .join(res.select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("vec_id") +: col("cluster") +:
        (0 until pqM).map(m => col(s"code$m")) :+ col("recon_err"): _*)
  }

  def pqResidual(t: Tables): DataFrame =
    pqResidualUnsorted(t).orderBy(col("vec_id"))

  /** sim_ann_pq_adc — asymmetric distance computation over the PQ codes
    * (the search side of Jégou et al. 2011): each query precomputes an
    * L2² table to every sub-centroid (pqM × pqK entries), and scanning a
    * candidate costs pqM table LOOKUPS on its 4-byte code — the original
    * vector is never touched. This is how a 100 TB vector corpus is
    * actually scanned: the code table is ~25,000× smaller than the
    * floats, the distance tables broadcast (Q × pqM × pqK doubles), and
    * the scan is one linear pass; IVF routing (`ivfTopK`) composes in
    * front to shrink the candidate set.
    *
    * The ADC sum is assembled column-wise per subspace (fixed order), so
    * the 4dp floor — and the rank order both engines compute — is exact.
    * Self-matches are excluded like `cosineTopK`.
    */
  /** The per-query ADC distance table: L2² of every query subvector to
    * every sub-centroid — (query_id, code, m, d), Q × pqK × pqM rows,
    * broadcast-sized by construction.
    */
  private def adcDistTable(t: Tables): DataFrame = {
    val e = vecs(t)
    val cents = broadcast(
      e.filter(col("vec_id") < pqK).select(col("vec_id").as("code"), col("v").as("bv")))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("xv"))
    // the ONE shared fold definition — the table distances and the
    // encode-side distances can never drift
    queries.crossJoin(cents)
      .select(col("query_id"), col("code"),
        posexplode(array(subspaceL2Dists: _*)).as(Seq("m", "d")))
  }

  /** The corpus code table on its subspace axis: (vec_id, m, code).
    * private[graft] so retrieval_audit can fold it ONCE and feed both the
    * ADC legs (`adcLookupsFrom`) and the IVF leg (`ivfPqTopKFrom`) — before
    * r14 the audit's ivfpq leg re-ran the whole PQ encode pass even though
    * the adc leg had just built the identical code table.
    */
  private[graft] def pqDataCodes(t: Tables): DataFrame =
    pqEncodeUnsorted(t)
      .select(col("vec_id"),
        posexplode(array((0 until pqM).map(m => col(s"code$m")): _*))
          .as(Seq("m", "code")))

  /** Fold the (query_id, vec_id, m, d) lookup rows into per-candidate ADC
    * scores (query_id, vec_id, adc). The ADC sum assembles column-wise per
    * subspace (fixed order) so downstream floors — and the rank order —
    * are exact on both engines. Shared by the ranked search face
    * (`adcRank`) and the refine shortlist (`adcRefineTopK`).
    */
  private[graft] def adcScores(lookups: DataFrame): DataFrame = {
    val parts = lookups
      .groupBy("query_id", "vec_id")
      .agg(
        sum(when(col("m") === 0, col("d"))).as("d0"),
        (1 until pqM).map(j => sum(when(col("m") === j, col("d"))).as(s"d$j")): _*)
    val adc = (0 until pqM).map(j => col(s"d$j")).reduce(_ + _)
    parts.withColumn("adc", adc)
      .select(col("query_id"), col("vec_id"), col("adc"))
  }

  /** The FULL ADC ranking (query_id, vec_id, adc, rank) — unsorted, no
    * rank cut: the internal face the registered top-k (`adcRank`) and the
    * hybrid-retrieval vector leg (which takes a deeper shortlist) share,
    * so the two cannot drift on the ranking rule (adc asc, vec_id asc).
    */
  private[graft] def adcRanked(lookups: DataFrame): DataFrame =
    adcRankedFromScores(adcScores(lookups))

  /** The ranking window over (already folded) per-candidate ADC scores —
    * split out so a composition that needs BOTH the ranked face and the
    * refine shortlist (retrieval_audit) can fold the scores once and rank
    * them twice instead of re-running the whole code-table scan.
    */
  private[graft] def adcRankedFromScores(scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("adc").asc, col("vec_id"))
    scores.withColumn("rank", row_number().over(w))
  }

  /** Rank the ADC scores into the registered top-k face. */
  private def adcRank(lookups: DataFrame): DataFrame =
    adcRankFromScores(adcScores(lookups))

  private[graft] def adcRankFromScores(scores: DataFrame): DataFrame =
    adcRankedFromScores(scores)
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        (floor(col("adc") * 10000) / 10000).as("adc_dist"))
      .orderBy(col("query_id"), col("rank"))

  /** The shared stage-1 ADC lookup rows (code table ⋈ broadcast distance
    * tables, self-matches excluded) — `pqAdcTopK` and `adcRefineTopK` run
    * the IDENTICAL scan, so the audit composition folds it once.
    */
  private[graft] def adcLookups(t: Tables): DataFrame =
    adcLookupsFrom(t, pqDataCodes(t))

  /** The same lookup rows over an (already folded) code table — the
    * audit's one-code-table-scan seam.
    */
  private[graft] def adcLookupsFrom(t: Tables, codes: DataFrame): DataFrame =
    codes.join(broadcast(adcDistTable(t)), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))

  def pqAdcTopK(t: Tables): DataFrame = adcRank(adcLookups(t))

  /** ADC shortlist size for the refine stage — candidates surviving the
    * compressed-domain pass that get exact distances recomputed.
    */
  val refineShortlist = 20

  /** sim_ann_adc_rerank — the REFINE stage of a PQ index (FAISS's
    * IndexRefineFlat composition, Jégou et al. 2011 §V "re-ranking"):
    * the 4-byte-code ADC scan picks `refineShortlist` candidates per
    * query, then the EXACT cosine is recomputed for only those from the
    * raw vectors, and the top-k comes from the exact scores. This is how
    * a production PQ deployment recovers the accuracy the 4-byte
    * compression gave up: ADC ordering is approximate (quantization can
    * swap near-ties), so the shortlist is taken wider than k and the
    * final ranking is exact — the recall/latency knob is the shortlist
    * width, not the code length.
    *
    * Scale shape: stage 1 is the same linear code-table pass as
    * `pqAdcTopK` (raw floats never touched); stage 2 fetches raw vectors
    * for only Q × shortlist ids — a point-lookup join on the vec_id axis
    * (at 100 TB: the code table is resident, the floats are the cold
    * store this join reads ~100 rows from). Exact-over-shortlist ranking
    * replays bit-for-bit on both engines (the ADC sum is fixed-order,
    * cosine is IEEE /,*,sqrt) ⇒ hash-checked end-to-end.
    */
  def adcRefineTopK(t: Tables): DataFrame =
    adcRefineFromScores(t, adcScores(adcLookups(t)))

  /** The refine stage over (already folded) stage-1 ADC scores — the
    * composition seam `retrieval_audit` uses to pay the code-table scan
    * once for the adc face AND this shortlist.
    */
  private[graft] def adcRefineFromScores(t: Tables, scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(t.spark)
    val shortlist = scores
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc").asc, col("vec_id"))))
      .filter(col("crank") <= refineShortlist)
      .select(col("query_id"), col("vec_id"))
    val e = vecs(t)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    // the Q×shortlist id set broadcasts EXPLICITLY: the raw-float fetch
    // must stay a broadcast probe of the cold store, never a corpus
    // shuffle keyed on ~100 ids
    e.join(broadcast(shortlist), "vec_id").join(broadcast(q), "query_id")
      .withColumn("cos", expr("graft_cosine(qv, v)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** sim_ann_pq_adc_stored — the search face of the PERSISTED index: ADC
    * over a code table read back from `vectorIndexSink`'s directory
    * instead of re-encoded in-plan. THE production read path — the index
    * job runs nightly, the search never touches the raw floats or the
    * encoder, and the original vectors could be cold storage. Oracle is
    * the SAME SQL as sim_ann_pq_adc, so the hash match PROVES
    * stored == computed (the corpus_stats_inc discipline applied to the
    * index lifecycle).
    */
  def pqAdcTopKFromStored(t: Tables, codes: DataFrame): DataFrame = {
    val dataCodes = codes.select(col("vec_id"),
      posexplode(array((0 until pqM).map(m => col(s"code$m")): _*))
        .as(Seq("m", "code")))
    adcRank(
      dataCodes.join(broadcast(adcDistTable(t)), Seq("m", "code"))
        .filter(col("vec_id") =!= col("query_id")))
  }

  /** The IVF∘ADC FULL ranking served from a STORED code table — the
    * vector leg of `retrieval_hybrid_rrf_stored` and the batch twin of
    * the live `hybridServeStream` probe: candidates come from the stored
    * index's cluster column (the partition key — a probe prunes to
    * `ivfPqProbes` directories at the storage layer), distances from the
    * stored 4-byte codes via the broadcast ADC tables. Ranks to any
    * depth (no cut — callers cut; the fusion takes `rrfDepth`, deeper
    * than the registered top-k). `nQ` restricts the query set (the hybrid
    * fusion uses TrainData.bm25NQueries on BOTH legs — one query set).
    */
  private[graft] def ivfPqRankedFromStored(t: Tables, codes: DataFrame,
      nQ: Long = nQueries): DataFrame = {
    val cand = codes.select(col("vec_id"), col("cluster"))
      .join(broadcast(queryProbes(t).filter(col("query_id") < nQ)), "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val dataCodes = codes.select(col("vec_id"),
      posexplode(array((0 until pqM).map(m => col(s"code$m")): _*))
        .as(Seq("m", "code")))
    adcRanked(
      cand.join(dataCodes, "vec_id")
        .join(broadcast(adcDistTable(t)), Seq("m", "code", "query_id")))
  }

  /** The registered end-to-end form: build + persist the index, then
    * search ONLY the stored files. The build REBUILDS the session's
    * ensured artifact (the dupGroupsSink discipline — this face always
    * prices the build, and serve faces in the same session then read the
    * artifact it refreshed, instead of the suite paying a duplicate
    * scratch build beside the ensured one). The search result is
    * MATERIALIZED before returning (planCheckpoint): the directory is
    * deterministic and overwritten per rebuild, so a lazily-returned
    * plan could otherwise race a later rebuild's delete of these files.
    */
  def pqAdcTopKStored(t: Tables): DataFrame = {
    val dir = graft.engine.ArtifactCache.rebuild(
      "vindex", vectorIndexFp(t))(writeVectorIndex(t, _))
    graft.engine.Reliability.planCheckpoint(
      pqAdcTopKFromStored(t, t.spark.read.parquet(dir)))
  }

  /** The session's ensured vector-index artifact for `t`'s embeddings —
    * built by the first serve-only caller, reused by every later one
    * (the ArtifactCache contract): what separates pricing the SERVE math
    * from pricing the build the self-contained faces perform inline.
    */
  private[graft] def vectorIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("vindex", vectorIndexFp(t))(
      writeVectorIndex(t, _))

  /** The embeddings-corpus fingerprint every vector-index artifact keys
    * on — ONE definition shared by the full, day-old and compacted
    * artifacts so no two faces can key the same corpus differently.
    */
  private def vectorIndexFp(t: Tables): String =
    graft.engine.ArtifactCache.fingerprint(
      t.embeddings, xxhash64(col("vec_id"), col("embedding")))

  /** sim_ann_adc_serve — the SERVE-ONLY face of the stored ADC scan: the
    * same search math as `sim_ann_pq_adc_stored` (same oracle), but the
    * index comes from the session's ensured artifact instead of being
    * rebuilt inside the query — so a bench reading prices what a serving
    * tier actually runs per query (4-byte-code scan + broadcast ADC
    * tables), while the build cost stays on the build faces. Run solo it
    * still stands alone: the first touch builds the artifact.
    */
  def pqAdcServe(t: Tables): DataFrame =
    // materialize (the pqAdcTopKStored discipline): the ensured directory
    // is a REBUILD target of the registered build faces, so a lazily
    // returned plan could race a later rebuild's delete of these files
    graft.engine.Reliability.planCheckpoint(
      pqAdcTopKFromStored(t, t.spark.read.parquet(vectorIndexDir(t))))

  /** emb_dedup_pq — near-dup candidates at 4 bytes a vector: two vectors
    * whose PQ codes agree on EVERY subspace sit in the same Voronoi cell
    * of the product space, the cheapest possible semantic-dup screen
    * (SemDeDup's cluster-pair work, collapsed to a hash groupBy on the
    * code tuple — no pairwise step at all). Production runs this as the
    * first pass over the code table it already keeps for search, then
    * exact-verifies survivors (`dedup_embedding_cosine`). Keep rule:
    * min vec_id per cell.
    */
  def pqDedup(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = concat_ws(":", (0 until pqM).map(m => col(s"code$m")): _*)
    val w = Window.partitionBy("code_key")
    pqEncodeUnsorted(t)
      .select(col("vec_id"), key.as("code_key"))
      .withColumn("n_same_code", count(lit(1)).over(w))
      .withColumn("keep", col("vec_id") === min(col("vec_id")).over(w))
      .orderBy(col("vec_id"))
  }

  /** Coarse lists probed per query in the IVF-PQ composition. */
  val ivfPqProbes = 3

  /** sim_ann_ivfpq — the production vector-search composition: IVF coarse
    * routing in front of the ADC scan. Data vectors live in the inverted
    * list of their nearest coarse centroid (the SAME deterministic
    * assignment as `clusterAssign` — shared code, shared oracle CTEs);
    * each query probes its `ivfPqProbes` nearest lists and ADC-scores
    * ONLY their members on the 4-byte codes. Scan work drops from N×Q to
    * N×Q×(probes/lists), which is the knob that makes a 100 TB index
    * answer in milliseconds: lists ≈ √N in prod, probes stays O(10).
    * Global (non-residual) codes are the documented simplification —
    * residual encoding changes the codebook build, not this plan.
    * Deterministic end-to-end ⇒ hash-checked, unlike the MLlib-trained
    * `sim_ann_ivf` (rows-only); cross-list misses vs `pqAdcTopK` are the
    * recall price the spec audits.
    */
  /** Each query's `ivfPqProbes` nearest coarse lists: (query_id, cluster). */
  private def queryProbes(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(t.spark)
    vecs(t).filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(coarseCents(t)))
      .withColumn("ccos", expr("graft_cosine(v, cv)"))
      .withColumn("prk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cluster"))))
      .filter(col("prk") <= ivfPqProbes)
      .select(col("vec_id").as("query_id"), col("cluster"))
  }

  def ivfPqTopK(t: Tables): DataFrame = ivfPqTopKFrom(t, pqDataCodes(t))

  /** IVF-PQ over an (already folded) code table — the audit composition
    * seam: `retrieval_audit` checkpoints `pqDataCodes` once and feeds it
    * to BOTH the full-ADC legs and this routed leg, so one invocation
    * pays one PQ encode pass instead of two.
    */
  private[graft] def ivfPqTopKFrom(t: Tables, codes: DataFrame): DataFrame = {
    val assigned = assignToCentroids(t).select(col("vec_id"), col("cluster"))
    val cand = assigned.join(broadcast(queryProbes(t)), "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    adcRank(
      cand.join(codes, "vec_id")
        .join(broadcast(adcDistTable(t)), Seq("m", "code", "query_id")))
  }

  /** sim_ann_ivfpq_filtered — FILTERED search over the INDEX, the at-scale
    * face of `sim_ann_filtered` (which is exact brute force): the IVF∘ADC
    * composition with the metadata equi-predicate applied to the
    * candidate set BEFORE any distance work — candidates surviving the
    * coarse probe are label-checked against the query's label and only
    * matching ones reach the 4-byte ADC lookups. This is the vector-DB
    * "filtered search" production path: pre-filter (post-filtering the
    * unfiltered top-k is the documented failure mode — k survivors may
    * not exist in any top-k'), with the filter riding broadcast-joined
    * tiny frames (the query labels) and a doc_id-axis equi-join for the
    * candidate labels. At 100 TB the same predicate can also become
    * partition pruning when the stored index layout adds the label axis
    * (`sink_vector_index` partitions by list; a label sub-partition is
    * the same directory idea one level down). Hash-checked via the
    * SHARED ivf-pq SQL builder restricted to matching labels — the
    * filtered result provably comes from the same index math.
    */
  def ivfPqTopKFiltered(t: Tables): DataFrame = {
    val labels = t.embeddings.select(col("vec_id"), col("label"))
    val qlab = labels.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("label").cast("long").as("qlabel"))
    val assigned = assignToCentroids(t).select(col("vec_id"), col("cluster"))
    val cand = assigned.join(broadcast(queryProbes(t)), "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .join(labels, "vec_id")
      .join(broadcast(qlab), "query_id")
      .filter(col("label") === col("qlabel"))
      .select(col("query_id"), col("vec_id"))
    adcRank(
      cand.join(pqDataCodes(t), "vec_id")
        .join(broadcast(adcDistTable(t)), Seq("m", "code", "query_id")))
      .join(broadcast(qlab.select(col("query_id"), col("qlabel").as("label"))),
        "query_id")
      .select(col("query_id"), col("label"), col("neighbor_id"),
        col("rank"), col("adc_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** sim_ann_ivfpq_residual — the COMPLETE faithful IVF-PQ search
    * (Jégou et al. 2011 §III): candidates carry residual codes
    * (`pqResidual`), and each query builds one ADC table PER PROBED LIST
    * — the residual q − c(L) changes with the list, so the table key is
    * (query, cluster, subspace, code), Q × probes × pqK × pqM entries,
    * still broadcast-sized. Scan work stays N·Q·(probes/lists) lookups;
    * the residual tables are the accuracy price a real engine pays per
    * probe, and this plan shows it costs one more broadcast column, not
    * a different shape. Hash-checked end-to-end.
    */
  def ivfPqResidualTopK(t: Tables): DataFrame = {
    val res = residuals(t)
    val book = residualBook(res)
    val qres = vecs(t).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .join(broadcast(queryProbes(t)), "query_id")
      .join(broadcast(coarseCents(t)), "cluster")
      .select(col("query_id"), col("cluster"),
        zip_with(col("qv"), col("cv"), (x, y) => x - y).as("xv"))
    val table = qres.crossJoin(broadcast(book))
      .select(col("query_id"), col("cluster"), col("code"),
        posexplode(array(subspaceL2Dists: _*)).as(Seq("m", "d")))
    val dataCodes = pqResidualUnsorted(t)
      .select(col("vec_id"), col("cluster"),
        posexplode(array((0 until pqM).map(m => col(s"code$m")): _*))
          .as(Seq("m", "code")))
    adcRank(
      dataCodes.join(broadcast(table), Seq("cluster", "m", "code"))
        .filter(col("vec_id") =!= col("query_id")))
  }

  /** sim_ann_ivfpq_residual_trained — the FULL production index build
    * path, closing the last fidelity delta in the vector-index family:
    * k-means coarse centroids (the `sim_ann_ivf` training move) composed
    * with per-subspace k-means RESIDUAL sub-codebooks (the
    * `emb_pq_encode_trained` move), searched with the per-probed-list ADC
    * tables of `sim_ann_ivfpq_residual` — i.e. Jégou et al.'s IVFADC with
    * both codebooks trained, which is exactly what FAISS's IndexIVFPQ
    * builds. Rows-only like every k-means-trained variant (init is
    * seed/parallelism-shaped); the spec pins recall at
    * parity-or-better vs the deterministic residual search on the planted
    * clustered corpus plus the structural scan invariants.
    *
    * Scale shape unchanged from the deterministic composition: models are
    * driver-side tables (8×64 + 8×16×8 doubles — always broadcast), the
    * corpus shuffles once onto its list axis, each query scans
    * probes/lists of the codes with 8 lookups per code.
    */
  def ivfPqResidualTrainedTopK(t: Tables): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(t.spark)
    val spark = t.spark
    import spark.implicits._
    val e = vecs(t).withColumn("fv", array_to_vector(col("v"))).persist()
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").fit(e)
    val cents = broadcast(model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq.toDF("cluster", "cv"))
    val res = model.transform(e)
      .select(col("vec_id"), col("v"), col("prediction").as("cluster"))
      .join(cents, "cluster")
      .select(col("vec_id"), col("cluster"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("rv"))
      .persist()
    // independent per-subspace fits — same driver-pool overlap (and the
    // same unchanged-results argument) as pqTrainedCenters
    val books = parJobs(0 until pqM) { m =>
      val off = m * pqSubDim
      val sub = res.select(
        array_to_vector(expr(s"slice(rv, ${off + 1}, $pqSubDim)")).as("fv"))
      val cs = new KMeans().setK(pqK).setSeed(137 + m).setMaxIter(5)
        .setFeaturesCol("fv").fit(sub).clusterCenters
      // same under-k guard as pqTrainedCenters: residuals of planted
      // twins collapse to identical points and k-means may return < k
      Array.tabulate(pqK)(j => cs(j % cs.length).toArray)
    }
    val book = (0 until pqK).map { j =>
      (j.toLong, (0 until pqM).flatMap(m => books(m)(j).toSeq))
    }.toDF("code", "bv")
    val dataCodes = pqAssignCodes(res.select(col("vec_id"), col("rv").as("xv")), book)
      .join(res.select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("vec_id"), col("cluster"),
        posexplode(array((0 until pqM).map(m => col(s"code$m")): _*))
          .as(Seq("m", "code")))
    // ride the persisted `e` — a bare vecs(t) subplan can't substitute
    // into the cached (vecs + fv) plan and would re-scan the parquet
    val queryVecs = e.select(col("vec_id"), col("v"))
      .filter(col("vec_id") < nQueries)
    val probes = queryVecs
      .crossJoin(cents)
      .withColumn("ccos", expr("graft_cosine(v, cv)"))
      .withColumn("prk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cluster"))))
      .filter(col("prk") <= ivfPqProbes)
      .select(col("vec_id").as("query_id"), col("cluster"))
    val qres = queryVecs
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .join(broadcast(probes), "query_id")
      .join(cents, "cluster")
      .select(col("query_id"), col("cluster"),
        zip_with(col("qv"), col("cv"), (x, y) => x - y).as("xv"))
    val table = qres.crossJoin(broadcast(book))
      .select(col("query_id"), col("cluster"), col("code"),
        posexplode(array(subspaceL2Dists: _*)).as(Seq("m", "d")))
    val out = graft.engine.Reliability.planCheckpoint(adcRank(
      dataCodes.join(broadcast(table), Seq("cluster", "m", "code"))
        .filter(col("vec_id") =!= col("query_id"))))
    res.unpersist()
    e.unpersist()
    out
  }

  /** Salted writers per inverted list for the index sink (the Route sink
    * discipline: a hot list must fan out across writers).
    */
  val indexSinkSalt = 8

  /** sink_vector_index — the physical index BUILD job, completing the
    * vector-index lifecycle (encode → PERSIST → search): the 4-byte-code
    * table written PARTITIONED BY coarse cluster, so each inverted list
    * is a directory and a query's probe reads ONLY its probed lists'
    * files — partition pruning IS the IVF routing at the storage layer.
    * The model (centroids + codebook) stays driver/broadcast-sized.
    * Returns per-list readback stats re-aggregated from the STORED
    * files — vector count + distinct code cells per list — hash-checked
    * against the shared assignment/encode oracle CTEs, so the layout on
    * disk is proven, not assumed.
    *
    * Scale shape: one shuffle onto (cluster, salt) with an explicit
    * partition count (the AQE-coalesce trap), maxRecordsPerFile bounds
    * file sizes, salt bounds per-writer skew on a hot list.
    */
  /** The eager index write alone (the nightly build job's body). The
    * default directory is DETERMINISTIC and overwritten per run — a UUID
    * default would deposit a fresh index copy in /tmp on every
    * Verify/Bench invocation with no cleanup.
    */
  def writeVectorIndex(t: Tables, out: String): Unit =
    writeCodes(indexCodes(t), out, "overwrite")

  /** The (vec_id, code*, cluster) table every index lifecycle op stores.
    * `data` optionally restricts the encoded side to a subset of `t`'s
    * vectors (the daily delta encode) while the model stays `t`'s.
    */
  private def indexCodes(t: Tables, data: Option[DataFrame] = None): DataFrame =
    pqEncodeUnsorted(t, data)
      .join(assignToCentroids(t, data).select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("vec_id") +: (0 until pqM).map(m => col(s"code$m")) :+
        col("cluster"): _*)

  /** The day's DELTA codes alone: only the delta vectors are encoded
    * (the vecs-side filter bounds every downstream join by |delta|), with
    * the model anchored to the full corpus' lowest ids — which are never
    * in the delta, so these codes equal the full build's rows for the
    * same vec_ids.
    */
  private def deltaIndexCodes(t: Tables): DataFrame = {
    val mx = t.embeddings.agg(max(col("vec_id")).as("max_id"))
    val delta = vecs(t).crossJoin(broadcast(mx))
      .filter(graft.operators.Dedup.incIsDelta(col("vec_id"), col("max_id")))
      .drop("max_id")
    indexCodes(t, Some(delta))
  }

  /** The physical write shared by build / upsert / compact: shuffle onto
    * (cluster, salt) with an explicit partition count (the AQE-coalesce
    * trap), maxRecordsPerFile bounds file sizes, salt bounds per-writer
    * skew on a hot list, directory-per-cluster so partition pruning is
    * the IVF routing.
    */
  private def writeCodes(codes: DataFrame, out: String, mode: String): Unit =
    codes
      .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(indexSinkSalt)))
      .repartition(codes.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"), col("salt"))
      .drop("salt")
      .write.mode(mode)
      .option("maxRecordsPerFile", 1000000)
      .partitionBy("cluster").parquet(out)

  def vectorIndexSink(t: Tables, outDir: Option[String] = None): DataFrame = {
    val out = outDir match {
      case Some(d) => writeVectorIndex(t, d); d
      case None =>
        // the registered nightly build rebuilds the session's ensured
        // artifact (the dupGroupsSink / textIndexSink discipline)
        graft.engine.ArtifactCache.rebuild(
          "vindex", vectorIndexFp(t))(writeVectorIndex(t, _))
    }
    // materialize before returning (the pqAdcTopKStored discipline): the
    // deterministic directory is overwritten per run, so a lazily
    // returned plan could race a later rebuild's delete of these files
    graft.engine.Reliability.planCheckpoint(readIndexStats(t, out))
  }

  /** Per-list readback stats over a stored code directory — the shared
    * face every index lifecycle op (build / upsert / compact) returns, so
    * their oracles can share one SQL builder.
    */
  private def readIndexStats(t: Tables, dir: String): DataFrame = {
    val key = concat_ws(":", (0 until pqM).map(m => col(s"code$m")): _*)
    t.spark.read.parquet(dir)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"), countDistinct(key).as("n_code_cells"))
      .orderBy(col("cluster"))
  }

  /** sink_vector_index_compact — the weekly PHYSICAL maintenance of the
    * persisted index (`sink_vector_index` only ever appends): read the
    * stored code table back, drop tombstoned vectors (the shared
    * `Dedup.isRetired` modulus — deletion requests against the vector
    * store), and REWRITE the directory with fresh (cluster, salt)
    * bucketing + maxRecordsPerFile — re-leveling any occupancy skew the
    * deletes left behind while keeping partition pruning (= IVF routing)
    * intact. Returns per-list readback stats re-aggregated from the
    * COMPACTED files, hash-checked against the shared assignment/encode
    * oracle CTEs restricted to live vectors — the on-disk result is
    * proven, not assumed. The spec additionally pins that no tombstoned
    * vec_id survives in any stored file and that the compacted layout
    * still partition-prunes.
    *
    * Scale shape: one scan of the stored codes (4 bytes a vector — never
    * the raw floats), one shuffle onto (cluster, salt), one write; the
    * stats face is a map-side-combined groupBy on the list axis.
    */
  def vectorIndexCompact(t: Tables, outDir: Option[String] = None): DataFrame = {
    // the grown index being maintained is the session's ENSURED artifact
    // (in production it already exists on disk), read strictly read-only;
    // the compacted rewrite goes to its own fingerprint-keyed directory
    // (or `outDir` when a spec isolates) — the timed body is the true
    // weekly maintenance, not a rebuild a production store already paid
    val src = vectorIndexDir(t)
    def maintain(out: String): Unit = {
      val live = t.spark.read.parquet(src)
        .filter(!graft.operators.Dedup.isRetired(col("vec_id")))
      writeCodes(live, out, "overwrite")
    }
    val dir = outDir match {
      case Some(d) => maintain(d); d
      case None => graft.engine.ArtifactCache.rebuild(
        "vindex_compact", vectorIndexFp(t))(maintain)
    }
    // materialize before returning (the pqAdcTopKStored discipline): the
    // directory is deterministic and rewritten per run, so a lazily
    // returned plan could race a later rebuild's delete of these files
    graft.engine.Reliability.planCheckpoint(readIndexStats(t, dir))
  }

  /** sink_vector_index_upsert — the DAILY maintenance twin of the weekly
    * compaction: the nightly build wrote the base index from the
    * pre-delta corpus; the day's delta vectors are encoded alone and
    * APPENDED into the same directory layout (new files inside each
    * touched cluster partition — no rewrite of existing files, the cheap
    * path a daily drop must take). The model side is safe by
    * construction: centroids and PQ codebook anchor to the lowest
    * vec_ids (`nCentroids`/`pqK`), which are never in the delta
    * (`Dedup.incIsDelta` = the top-20%-by-id tail), so the base build's
    * model equals the full build's and delta assignments cannot drift.
    * Returns the same per-list readback stats as `sink_vector_index` and
    * shares its oracle — a hash match PROVES base ∪ delta append equals
    * the from-scratch full build, i.e. the upsert is lossless.
    *
    * Scale shape: the base never rewrites; delta work is |delta| encode +
    * one (cluster, salt) shuffle of delta codes; the stats face is a
    * map-side-combined groupBy on the list axis.
    */
  /** The upserted-layout write (base overwrite + delta append) shared by
    * the registered `sink_vector_index_upsert` and the day-old-index
    * hybrid face (`retrieval_hybrid_rrf_stored_fresh`), so the two can
    * never drift on what "a day-old vector index" means.
    */
  private[graft] def writeUpsertedVectorIndex(t: Tables, base: String): Unit = {
    // the nightly base index is the session's ensured PRE-DELTA artifact
    // (in production it already exists and the append happens in place);
    // the registered face must not mutate the shared artifact, so it
    // hard-links the base into its own directory (zero-copy — see
    // ArtifactCache.cloneDir) and appends the delta there. ONLY the delta
    // is encoded (`deltaIndexCodes`).
    val src = baseVectorIndexDir(t)
    graft.engine.ArtifactCache.cloneDir(src, base)
    writeCodes(deltaIndexCodes(t), base, "append")
  }

  /** The PRE-DELTA corpus' vector index, keyed by the FULL table's
    * fingerprint + "_base" (the Dedup.baseDupGroupsDir rationale: the
    * recency split is a pure function of the corpus, and fingerprinting
    * the derived base frame would force a corpus-linear content hash
    * inside every timed upsert that just needs the base's cache key).
    */
  private[graft] def baseVectorIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("vindex", vectorIndexFp(t) + "_base")(
      writeVectorIndex(graft.operators.Dedup.baseTables(t), _))

  /** The session's DAY-OLD vector index artifact (pre-delta base +
    * appended delta codes) — ensured once so the between-rewrites serve
    * faces price serve math; the registered daily job
    * (`vectorIndexUpsert`) always re-runs the upsert against it. Index
    * files live under `$dir/idx`.
    */
  private[graft] def upsertedVectorIndexDir(t: Tables): String =
    graft.engine.ArtifactCache.ensure("vindex_day", vectorIndexFp(t)) { dir =>
      writeUpsertedVectorIndex(t, s"$dir/idx")
    }

  def vectorIndexUpsert(t: Tables, outDir: Option[String] = None): DataFrame = {
    val base = outDir match {
      case Some(d) => writeUpsertedVectorIndex(t, d); d
      case None =>
        val dir = graft.engine.ArtifactCache.rebuild(
          "vindex_day", vectorIndexFp(t))(d => writeUpsertedVectorIndex(t, s"$d/idx"))
        s"$dir/idx"
    }
    graft.engine.Reliability.planCheckpoint(readIndexStats(t, base))
  }

  def knnGraph(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = nCentroidsFor(t.embeddings.count())
    val assigned = assignToCentroids(t, k = k)
      .select(col("vec_id"), col("cluster"), col("v"))
    val w = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cos").desc, col("b.vec_id"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", expr("graft_cosine(a.v, b.v)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= knnK)
      .select(col("a.vec_id").as("vec_id"), col("a.cluster").as("cluster"),
        col("b.vec_id").as("neighbor_id"), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cos_sim"))
      .orderBy(col("vec_id"), col("rank"))
  }
}
