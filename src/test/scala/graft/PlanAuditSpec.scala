package graft

import graft.operators.{Analytics, Dedup, Etl, Identity, TextAnalysis, TrainData}

/** Plan audits (SURVEY.md §5): the properties that make these plans survive
  * a 100× scale-up, asserted against the optimized physical plan so a
  * regression (lost pushdown, lost broadcast, lost partial agg) fails CI —
  * the durable form of the `.explain("formatted")` check.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The FINAL adaptive plan (post-execution): broadcast selection is
    * runtime-only in this engine (GraftSession pins static
    * autoBroadcastJoinThreshold=-1 because file-size estimates lie below
    * explode/aggregate chains), so broadcast assertions must read the
    * plan AQE actually ran, not the initial SMJ skeleton.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter reaches the parquet scan (PushedFilters)") {
    val p = plan(Analytics.q1PricingAgg(t))
    assert(p.contains("PushedFilters"), "no pushdown section in scan")
    assert(p.contains("LessThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
  }

  test("q1: scan prunes to only the columns the query touches") {
    val p = plan(Analytics.q1PricingAgg(t))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
  }

  test("q5 star join broadcasts every dimension") {
    val p = finalPlan(Analytics.q5StarJoin(t))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, s"expected >=3 broadcast joins, got $nBroadcast:\n$p")
  }

  test("app registry join is a broadcast, not a shuffle") {
    val p = plan(Etl.appIdBusiness(t))
    assert(p.contains("BroadcastHashJoin"), s"registry join shuffled:\n$p")
  }

  test("aggregations keep map-side partial aggregation") {
    val p = plan(Analytics.qEventCountsDaily(t))
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"no partial aggregation:\n$p") // partial + final
  }

  test("envelope ops prune the events scan to used columns only") {
    // jsonValidate touches only event_id + props; the envelope's other
    // derived columns must not widen the scan
    val p = plan(Etl.jsonValidate(t))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("user_id"), s"scan reads unused columns: $readSchema")
  }

  test("device map ranks distinct keys, not raw events") {
    val p = plan(Identity.deviceMap(t))
    // the aggregate (distinct) must appear below the window rank
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && aggIdx > winIdx,
      s"distinct should run before rank (deeper in plan):\n$p")
  }

  test("id maps never window an unbounded key set on appkey alone") {
    // the skew shape VERDICT r1 flagged: rank over partitionBy(appkey)
    // orderBy(key) puts one app's whole key set through a single task.
    // The two-phase scheme ranks within (range-partition, appkey) instead;
    // only the tiny per-partition offset window may partition on appkey.
    for (df <- Seq(Identity.deviceMap(t), Identity.userMap(t))) {
      val p = plan(df)
      assert(p.contains("SPARK_PARTITION_ID"), s"two-phase marker missing:\n$p")
      val badWindow =
        "windowspecdefinition\\(appkey#\\d+, (did|cuid)#\\d+".r.findFirstIn(p)
      assert(badWindow.isEmpty, s"single-app window over key column:\n$p")
    }
  }

  test("funnels are one user_id shuffle, not staged self-joins") {
    // the r1 shape rescanned events 3x and reshuffled per stage; the
    // array-aggregate rewrite must keep exactly: one exchange into the
    // per-user groupBy + the single-partition exchange of the final 1-row
    // rollup — any third exchange means a self-join crept back in
    for (df <- Seq(Analytics.qWindowFunnel(t), Analytics.qFunnelWindowed(t))) {
      val p = plan(df)
      val nExchange = "Exchange".r.findAllIn(p).length
      assert(nExchange <= 2, s"funnel grew extra shuffles ($nExchange):\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"funnel reintroduced a join:\n$p")
    }
  }

  test("exact dedup aggregates map-side on the hash key") {
    val p = plan(Dedup.exact(t))
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg:\n$p")
  }

  test("repetition signals shuffle nothing before the output sort") {
    // per-row array expressions only: the single Exchange is the final
    // global orderBy (rangepartitioning); any hashpartitioning exchange
    // means a groupBy/join crept into what must stay a scan pass
    val p = plan(TextAnalysis.repetition(t))
    assert(!p.contains("hashpartitioning"), s"repetition gained a shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashJoin"),
      s"repetition gained a join:\n$p")
  }

  test("sequence packing is one hash shuffle (the per-shard window)") {
    val p = plan(TrainData.packSequences(t))
    val nHash = "hashpartitioning".r.findAllIn(p).length
    assert(nHash == 1, s"packing must shuffle exactly once on shard ($nHash):\n$p")
  }

  test("stratified sample broadcasts the rate dim and pushes no shuffle") {
    val p = plan(TrainData.sampleStratified(t))
    assert(p.contains("BroadcastHashJoin"), s"rate dim join shuffled:\n$p")
    assert(!p.contains("hashpartitioning"), s"sample gained a shuffle:\n$p")
  }

  test("asof join is one window over user_id, never a range self-join") {
    val p = plan(Analytics.asofJoin(t))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"asof became a range join:\n$p")
    assert("Window".r.findAllIn(p).length >= 1, s"asof lost its window:\n$p")
    // exactly one hash exchange: the user_id partition feeding the window
    val nHash = "hashpartitioning".r.findAllIn(p).length
    assert(nHash == 1, s"asof shuffles more than once ($nHash):\n$p")
  }

  test("curation chain has no quadratic operator anywhere in its plan") {
    val p = plan(TrainData.curation(t))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"curation went quadratic:\n$p")
  }

  test("unigram LM vocabulary aggregates map-side before the probability join") {
    val p = plan(TextAnalysis.unigramLm(t))
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"vocab lost partial agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"LM scoring went quadratic:\n$p")
  }

  test("c4 filter gate shuffles nothing before the output sort") {
    val p = plan(TextAnalysis.c4Filters(t))
    assert(!p.contains("hashpartitioning"), s"c4 gate gained a shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashJoin"),
      s"c4 gate gained a join:\n$p")
  }

  test("top ngrams heads out through an ordered limit, not a global sort") {
    val p = plan(TextAnalysis.topNgrams(t))
    assert(p.contains("TakeOrderedAndProject"), s"top-k materialized a sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"gram count lost partial agg:\n$p")
  }

  test("domain mix broadcasts the weight dim and pushes no shuffle") {
    val p = plan(TrainData.mixDomains(t))
    assert(p.contains("BroadcastHashJoin"), s"weight dim join shuffled:\n$p")
    assert(!p.contains("hashpartitioning"), s"mix gained a shuffle:\n$p")
  }

  test("cluster assignment broadcasts the centroid table") {
    // K centroids against N vectors: the only acceptable join is a
    // broadcast nested loop (it IS the K-way fan-out); a shuffled or
    // cartesian product would mean the centroid side lost its broadcast
    val p = plan(graft.operators.Sim.clusterAssign(t))
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroids not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"assignment went cartesian:\n$p")
  }

  test("semantic dedup pairs through a cluster equi-join, never a cartesian") {
    val p = plan(graft.operators.Sim.semanticDedup(t))
    assert(!p.contains("CartesianProduct"), s"pairing went cartesian:\n$p")
    // the centroid fan-out is the (intended) broadcast nested loop; the
    // PAIR step must be a real equi-join on the cluster id
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi-join on cluster:\n$p")
  }

  test("event_attr row build broadcasts every dim and never goes cartesian") {
    val p = plan(graft.operators.Route.routeEventAttr(t))
    assert(!p.contains("CartesianProduct"), s"row build went cartesian:\n$p")
    // platform + network dims, event registry, column-index registry, app
    // registry — all config-sized, all broadcast
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 5, s"expected >=5 broadcast dim joins, got $nBroadcast:\n$p")
    // the geo interval dim rides the (intended) broadcast nested loop
    assert(p.contains("BroadcastNestedLoopJoin"), s"geo dim not broadcast:\n$p")
  }

  test("user/device row builds broadcast their dims and never go quadratic") {
    for (df <- Seq(graft.operators.Route.routeUserRow(t),
                   graft.operators.Route.routeDeviceRow(t))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
        s"row build went quadratic:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    }
  }

  test("lsh candidates equi-join on (table, band_key), no cartesian, no distinct exchange") {
    val df = graft.operators.Sim.lshTopK(t)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"lsh pairing went quadratic:\n$p")
    // the candidate join must key on BOTH table and band_key
    val joinLine = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("band_key")).getOrElse("")
    assert(joinLine.contains("table") && joinLine.contains("band_key"),
      s"candidate join not keyed on (table, band_key):\n$p")
    // duplicates dedup through the rank tie, not a distinct over all pairs:
    // exactly the band shuffle + the window shuffle
    assert("HashAggregate".r.findAllIn(p).isEmpty,
      s"lsh gained a distinct/aggregate exchange:\n$p")
  }

  test("user-profile dims broadcast and the normalizers shuffle nothing") {
    val p = plan(graft.operators.Route.dimUserProfile(t))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"profile dims not all broadcast:\n$p")
    assert(!p.contains("hashpartitioning"), s"normalizers gained a shuffle:\n$p")
  }

  test("url decode and version compare are pure scan passes") {
    for (df <- Seq(graft.operators.Enrich.urlDecode(t),
                   graft.operators.Etl.sdkvCompare(t),
                   graft.operators.Etl.dateParse(t))) {
      val p = plan(df)
      assert(!p.contains("hashpartitioning") && !p.contains("Join"),
        s"util op gained a shuffle or join:\n$p")
    }
  }

  test("whole-stage codegen covers the envelope expression work") {
    val df = Etl.schemaCheck(t)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val p = df.queryExecution.executedPlan.toString
    // codegen stages appear as "*(n)" prefixes in the simple plan string
    assert(p.contains("*("), s"no codegen spans:\n$p")
  }

  test("dw rollups keep partial aggregation and broadcast their dims") {
    for (df <- Seq(graft.operators.Dw.userActive(t),
                   graft.operators.Dw.userDuration(t))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"rollup went quadratic:\n$p")
      assert("HashAggregate".r.findAllIn(p).length >= 2,
        s"rollup lost map-side partial aggregation:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"platform dim shuffled:\n$p")
    }
  }

  test("ad-prop attach and ss bridge stay on the key axes, never quadratic") {
    for ((name, df) <- Seq(
        "adv_lid_user_first_end" -> graft.operators.Adv.lidUserFirstEnd(t),
        "adv_user_ad_source" -> graft.operators.Adv.userAdSource(t),
        "adv_ss_click_match" -> graft.operators.Adv.ssClickMatch(t))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
        s"$name went quadratic:\n$p")
      // the ad-app registry and blacklists are broadcast, not shuffled
      assert(p.contains("BroadcastHashJoin"), s"$name shuffled a config dim:\n$p")
    }
  }

  test("dw/sink aggregates never ride the presentation-sorted row builds") {
    // routeEventAttr/routeUserRow/routeUserPropRow end in a global orderBy
    // for the registered queries; internal consumers that aggregate on top
    // must use the unsorted cores — EliminateSorts cannot remove the sort
    // under min_by/max_by aggregates, so riding the sorted frame costs a
    // full-corpus range exchange + sort per consumer (a real r6 find: the
    // Dw family paid it on every leg)
    for ((name, df) <- Seq(
        "dw_user_detail_sum" -> graft.operators.Dw.userDetailSum(t),
        "dw_user_anonymous" -> graft.operators.Dw.userAnonymous(t),
        "sink_unique_key_merge" -> graft.operators.Route.sinkUniqueKeyMerge(t))) {
      val p = plan(df)
      assert(!p.contains("Sort [event_id"),
        s"$name still sorts the corpus on event_id before aggregating:\n$p")
    }
  }

  test("substring dedup has no pairwise step") {
    val p = plan(Dedup.substringDup(t))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"substring dedup gained a pairwise join:\n$p")
    // window df is a map-side-combined groupBy on the hash
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"window-frequency aggregate lost partial aggregation:\n$p")
  }

  test("audience match is one scan with compiled predicates, one rollup shuffle") {
    val p = plan(graft.operators.Adv.convertMatch(t))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"rule evaluation went pairwise:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"ad registry shuffled:\n$p")
    // rules compile to literals, never a rules-table join: exactly the
    // registry broadcast plus the two data_access_filter anti-joins of
    // the AdvJob admission gate — all broadcast, nothing else
    assert("Join".r.findAllIn(p).length <= 4, s"unexpected joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"admission gate shuffled:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"rollup lost map-side partial aggregation:\n$p")
  }

  test("deep convert: as-of is a window, never a range self-join; dims broadcast") {
    val p = finalPlan(graft.operators.Adv.deepConvert(t))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"deep convert gained a pairwise join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"ad registry shuffled:\n$p")
    // clicks attach via the kind-flag + window asof, not a clicks x convs
    // join: every shuffle join left is a zgid identity-axis equi-join
    // (uz/dz construction + attaches — corpus-sized maps, so SMJ is the
    // CORRECT at-scale shape now that broadcast selection is runtime-only
    // and mid-stage frames can't convert) — 18 today (r13-opt persisted
    // the uz axis, so the attach joins read an InMemoryRelation, which
    // AQE plans as SMJ where the inline chains could runtime-convert: a
    // few more cheap key-axis joins bought one uz build instead of ten
    // window-chain re-executions per plan); a 19th would mean the asof
    // decomposed into a join again
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 18,
      s"asof decomposed into extra shuffle joins:\n$p")
  }

  test("unified DQ chain is one scan with broadcast blacklists, no self-join") {
    val p = plan(graft.operators.Route.dqFullChain(t))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"chain gained a shuffle join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"blacklist dims not broadcast:\n$p")
    // exactly one events scan — the schema probes and the dw verdict must
    // share it, not re-read
    assert("Scan parquet".r.findAllIn(p).length <= 1, s"chain re-scans:\n$p")
  }

  test("incremental detail fold keeps partial aggregation per increment") {
    val p = plan(graft.operators.Dw.userDetailInc(t))
    assert(!p.contains("CartesianProduct"), s"fold went quadratic:\n$p")
    // three increments x (partial + final) + the merge + finish layers
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).length >= 6,
      s"partials lost map-side aggregation:\n$p")
  }

  test("f_user_all composes post-rollup frames; name dims stay literal CASEs") {
    val p = plan(graft.operators.Dw.userAll(t))
    assert(!p.contains("CartesianProduct"), s"profile join went quadratic:\n$p")
    // the carrier/platform name dims are compiled CASE expressions — they
    // must not appear as extra join relations
    assert(!p.contains("carrierDim"), s"carrier dim joined instead of compiled:\n$p")
  }

  test("archive route: five key-axis legs, registry broadcast, no cartesian") {
    val p = plan(Identity.archiveRoute(t))
    assert(!p.contains("CartesianProduct"), s"archive route went quadratic:\n$p")
    // the app registry rides every leg as a broadcast, never a shuffle join
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 5,
      s"registry dim lost its broadcast:\n$p")
  }

  test("dynamic sink readback aggregates per table with partial aggregation") {
    val out = java.nio.file.Files.createTempDirectory("graft_dynsink_plan").toString
    val p = plan(graft.operators.Route.sinkDynamicRoute(t, Some(out)))
    assert(!p.contains("CartesianProduct"), s"dynamic sink went quadratic:\n$p")
    // readback = per-app count with map-side combine over the routed files
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"readback lost partial aggregation:\n$p")
  }

  test("quality classifier and random projection are zero-shuffle scan passes") {
    // the final presentation orderBy is the only allowed exchange source;
    // strip it by auditing the pre-sort child semantics: count real
    // shuffles (rangepartitioning from the sort is fine, hash is not)
    val pc = plan(TextAnalysis.qualityClassifier(t))
    assert(!pc.contains("hashpartitioning"),
      s"classifier grew a hash shuffle:\n$pc")
    val pp = plan(graft.operators.Sim.randomProjection(t))
    assert(!pp.contains("hashpartitioning"),
      s"projection grew a hash shuffle:\n$pp")
  }

  test("chunk windows and epoch mixing stay zero-shuffle scan passes") {
    val pc = plan(TrainData.chunkWindows(t))
    assert(!pc.contains("hashpartitioning"),
      s"chunk windows grew a hash shuffle:\n$pc")
    val pm = plan(TrainData.mixEpochs(t))
    assert(!pm.contains("hashpartitioning") || pm.contains("BroadcastHashJoin"),
      s"epoch mix shuffled instead of broadcasting the factor dim:\n$pm")
    assert(pm.contains("BroadcastHashJoin"), s"factor dim lost its broadcast:\n$pm")
  }

  test("shard assign and url dedup shuffle once, on their key axis only") {
    val ps = plan(TrainData.shardAssign(t))
    assert("hashpartitioning".r.findAllIn(ps).length <= 1,
      s"shard assign shuffles more than the per-shard window:\n$ps")
    val pu = plan(Dedup.urlDedup(t))
    assert("hashpartitioning".r.findAllIn(pu).length <= 1,
      s"url dedup shuffles more than the canonical window:\n$pu")
    assert(!pu.contains("CartesianProduct"))
  }

  test("gopher gate and corpus stats are one scan pass each") {
    val pg = plan(TextAnalysis.gopherQuality(t))
    assert(!pg.contains("hashpartitioning"),
      s"gopher gate grew a hash shuffle:\n$pg")
    val pc = plan(TrainData.corpusStats(t))
    assert("HashAggregate".r.findAllIn(pc).length >= 2,
      s"corpus stats lost partial aggregation:\n$pc")
    assert(!pc.contains("CartesianProduct"))
  }

  test("dsir broadcasts the log-ratio dim and never goes quadratic") {
    val p = plan(TrainData.dsirImportance(t))
    assert(p.contains("BroadcastHashJoin"),
      s"bucket dim join shuffled instead of broadcasting:\n$p")
    assert(!p.contains("CartesianProduct"), s"dsir grew a cartesian:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"bucket histogram lost partial aggregation:\n$p")
  }

  test("knn graph and phash dedup pair through equi-joins, never a cartesian") {
    val pk = plan(graft.operators.Sim.knnGraph(t))
    assert(!pk.contains("CartesianProduct"), s"knn graph went cartesian:\n$pk")
    val pp = plan(graft.operators.Multimodal.phashDedup(t))
    assert(!pp.contains("CartesianProduct"), s"phash pairs went cartesian:\n$pp")
    assert(pp.contains("SortMergeJoin") || pp.contains("ShuffledHashJoin") ||
      pp.contains("BroadcastHashJoin"), s"no candidate equi-join found:\n$pp")
  }

  test("budget mix and perplexity buckets shuffle once per key axis") {
    val pb = plan(TrainData.mixBudget(t))
    assert(!pb.contains("CartesianProduct"), s"budget mix went cartesian:\n$pb")
    assert(pb.contains("BroadcastHashJoin") || pb.contains("BroadcastNestedLoopJoin"),
      s"quota dim lost its broadcast:\n$pb")
    val pp = plan(graft.operators.TextAnalysis.perplexityBucket(t))
    assert(!pp.contains("CartesianProduct"), s"perplexity split went cartesian:\n$pp")
  }

  test("llm curation chain has no quadratic operator anywhere in its plan") {
    val p = plan(TrainData.curationLlm(t))
    assert(!p.contains("CartesianProduct"), s"curation chain went cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"chain lost its broadcast joins (grams/dsir dims):\n$p")
  }

  test("residual pq keeps its broadcasts and avoids cartesians end-to-end") {
    val pr = plan(graft.operators.Sim.pqResidual(t))
    assert(!pr.contains("CartesianProduct"), s"residual encode went cartesian:\n$pr")
    val ps = plan(graft.operators.Sim.ivfPqResidualTopK(t))
    assert(!ps.contains("CartesianProduct"), s"residual search went cartesian:\n$ps")
    assert(ps.contains("BroadcastHashJoin"),
      s"per-list table probe lost its broadcast:\n$ps")
  }

  test("pq encode and adc search broadcast the codebook and the tables") {
    // the only non-equi joins allowed are broadcast-of-tiny (16-row
    // codebook, Q x M x K distance table)
    val pe = plan(graft.operators.Sim.pqEncode(t))
    assert(!pe.contains("CartesianProduct"), s"pq encode went cartesian:\n$pe")
    assert(pe.contains("BroadcastNestedLoopJoin") || pe.contains("BroadcastHashJoin"),
      s"codebook lost its broadcast:\n$pe")
    val pa = plan(graft.operators.Sim.pqAdcTopK(t))
    assert(!pa.contains("CartesianProduct"), s"adc search went cartesian:\n$pa")
    assert(pa.contains("BroadcastHashJoin"),
      s"distance-table probe lost its broadcast:\n$pa")
  }

  test("char entropy is a pure per-row fold: no exchange before the sort") {
    val p = plan(TextAnalysis.charEntropy(t))
    // the ONLY exchange allowed is the presentation orderBy's range
    // partitioning; a hash exchange means the fold fell out of the row
    val exchanges = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).length
    assert(exchanges == 0, s"entropy fold left the row (hash exchange):\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"scan reads unused columns: $readSchema")
  }

  test("url host stats keep partial aggregation on the host axis") {
    val p = plan(Dedup.urlHostStats(t))
    assert(!p.contains("CartesianProduct"), s"host stats went cartesian:\n$p")
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"no partial aggregation on host/canon axes:\n$p")
  }

  test("trained pq encode broadcasts the trained codebook") {
    val p = plan(graft.operators.Sim.pqEncodeTrained(t))
    assert(!p.contains("CartesianProduct"), s"trained encode went cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"trained codebook lost its broadcast:\n$p")
  }

  test("bm25 broadcasts query terms and df, keeps partial-agg postings") {
    val p = plan(TrainData.bm25TopKDocs(t))
    assert(!p.contains("CartesianProduct"), s"bm25 went cartesian:\n$p")
    // query-term set and the (matched-terms-only) df table both broadcast;
    // the 1-row scalars frame rides the intended broadcast nested loop
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 2, s"query/df sides lost their broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"scalars not broadcast:\n$p")
    // the postings build partial-aggs map-side before its exchange
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"postings build lost partial aggregation:\n$p")
  }

  test("filtered ann rides the label equi-key, never a post-filter cartesian") {
    val p = plan(graft.operators.Sim.cosineTopKFiltered(t))
    assert(!p.contains("CartesianProduct"), s"filtered ann went cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"label equi-join lost broadcast:\n$p")
  }

  test("a star CC round keeps partial-agg minima and never goes cartesian") {
    import spark.implicits._
    val edges = Seq((5L, 1L), (7L, 5L), (9L, 2L), (9L, 7L)).toDF("u", "v")
    val p = plan(Dedup.ccStarRound(edges))
    assert(!p.contains("CartesianProduct"), s"star round went cartesian:\n$p")
    // both per-center minima (large-star and small-star) must partial-agg
    // map-side before their exchange — a hot center combines locally
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 4, s"per-center minima lost partial aggregation:\n$p")
  }

  test("adc refine: code-table stage 1, point-lookup stage 2, no cartesian") {
    val p = finalPlan(graft.operators.Sim.adcRefineTopK(t))
    assert(!p.contains("CartesianProduct"), s"refine went cartesian:\n$p")
    // the ADC distance table, the query-vector side AND the Q×shortlist
    // id set all broadcast — stage 2's raw-float fetch must be a
    // broadcast probe of the cold store, never a corpus shuffle
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, s"dist table / query / shortlist lost broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"stage-2 float fetch shuffled the corpus:\n$p")
    // stage 1's per-(query, vec) ADC fold partial-aggs map-side
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"ADC fold lost partial aggregation:\n$p")
  }

  test("hybrid rrf: both legs keep their audited shapes, fusion never cartesian") {
    val p = finalPlan(TrainData.hybridRrf(t))
    assert(!p.contains("CartesianProduct"), s"hybrid rrf went cartesian:\n$p")
    // the bm25 leg's query-term/df broadcasts and the cosine leg's
    // query-side broadcast all survive into the fused plan
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, s"a leg lost its broadcast in the fused plan:\n$p")
    // postings build + per-(query, doc) folds still partial-agg map-side
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"a leg lost partial aggregation:\n$p")
  }

  test("fresh-df stored serving keeps the bm25 broadcast shape") {
    // the face that serves between index rewrites: query terms, the
    // recomputed df table and the scalars fold must all broadcast into
    // the matched-postings probe — a corpus-axis shuffle here would make
    // every between-rewrites query pay an index-wide exchange
    val dir = java.nio.file.Files.createTempDirectory("graft_pas_fresh")
      .toString + "/idx"
    val stats = TrainData.textIndexUpsert(t, Some(dir))
    stats.collect() // materialize the write
    val p = finalPlan(TrainData.bm25RankedFromStoredFresh(
      spark.read.parquet(dir), spark.read.parquet(s"${dir}__scalars")))
    assert(!p.contains("CartesianProduct"), s"fresh serve went cartesian:\n$p")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 2, s"query/df sides lost their broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"scalars not broadcast:\n$p")
  }

  test("retrieval audit joins only config-sized shortlists, never cartesian") {
    // the LAZY plan: the registered face truncates (planCheckpoint) when
    // it materializes, which would hide the joins from this pin
    val (lazyPlan, caches) = TrainData.retrievalAuditPlan(t)
    val p = finalPlan(lazyPlan)
    caches.foreach(_.unpersist())
    assert(!p.contains("CartesianProduct"), s"audit went cartesian:\n$p")
    // every overlap join is two Q×k frames — AQE must keep them broadcast
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 5, s"an overlap join shuffled a shortlist:\n$p")
  }

  test("delta-bounded group fold: candidate joins stay merge-pinned, never cartesian") {
    // the dedup_groups_inc candidate generation: both restricted joins
    // (probe-delta x index-all, probe-all x index-delta) must stay
    // sort-merge on the shingle key - downstream of an explode, Catalyst's
    // size estimate would otherwise happily broadcast a corpus-sized frame
    val docs = Dedup.ppjoinDocs(t, withDelta = true)
    val p = plan(Dedup.ppjoinPairs(docs, touchingDelta = true))
    assert(!p.contains("CartesianProduct"), s"delta fold went cartesian:\n$p")
    val nMerge = "SortMergeJoin".r.findAllIn(p).length
    assert(nMerge >= 2, s"a delta candidate join lost its merge pin:\n$p")
  }

  test("unimax counts tokens with partial agg; windows stay on the lang table") {
    val p = plan(TrainData.mixUnimax(t))
    assert(!p.contains("CartesianProduct"), s"unimax went cartesian:\n$p")
    // the corpus-axis token count combines map-side before its exchange —
    // the only heavy work; everything after runs on the language table
    val nHashAgg = "HashAggregate".r.findAllIn(p).length
    assert(nHashAgg >= 2, s"token count lost partial aggregation:\n$p")
    // the single-partition water-fill window must sit ABOVE the lang
    // aggregate (config-sized input), never over the document scan: the
    // plan has exactly one scan of documents feeding an aggregate first
    assert("Scan parquet".r.findAllIn(p).length <= 2,
      s"unimax re-scans the corpus for the fill:\n$p")
  }
}
