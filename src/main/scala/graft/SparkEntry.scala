package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a `queries` entry; each
  * SQL-expressible one also has a DuckDB oracle in `oracleSql` with
  * identically-aliased output columns.
  */
object SparkEntry {

  private def tables(spark: SparkSession, dir: String): Tables = Tables(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full IdJob→DwJob chain in one plan (envelope → one-id → enrich →
    * event_attr rows).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.eventAttr(tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 ingest / validation / envelope
    "etl_owner_normalize"  -> ((s, d) => Etl.ownerNormalize(tables(s, d))),
    "etl_json_validate"    -> ((s, d) => Etl.jsonValidate(tables(s, d))),
    "etl_schema_check"     -> ((s, d) => Etl.schemaCheck(tables(s, d))),
    "etl_appid_business"   -> ((s, d) => Etl.appIdBusiness(tables(s, d))),
    "gate_blacklist"       -> ((s, d) => Etl.gateBlacklist(tables(s, d))),
    "gate_resolve"         -> ((s, d) => Gate.gateResolve(tables(s, d))),
    "gate_resolve_stats"   -> ((s, d) => Gate.gateResolveStats(tables(s, d))),
    // §2.2 identity resolution
    "id_device_map"        -> ((s, d) => Identity.deviceMap(tables(s, d))),
    "id_user_map"          -> ((s, d) => Identity.userMap(tables(s, d))),
    "id_zgid_resolution"   -> ((s, d) => Identity.zgidResolution(tables(s, d))),
    "id_sessionize"        -> ((s, d) => Identity.sessionize(tables(s, d))),
    "id_archive_dedup"     -> ((s, d) => Identity.archiveDedup(tables(s, d))),
    "id_archive_route"     -> ((s, d) => Identity.archiveRoute(tables(s, d))),
    // §2.3 config-driven derivation
    "derive_virtual_property" -> ((s, d) => Derive.virtualProperty(tables(s, d))),
    "derive_virtual_event"    -> ((s, d) => Derive.virtualEvent(tables(s, d))),
    "derive_rule_tree"        -> ((s, d) => Derive.ruleTree(tables(s, d))),
    "derive_rule_sql"         -> ((s, d) => Derive.ruleSql(tables(s, d))),
    "derive_device_props"     -> ((s, d) => Derive.deviceProps(tables(s, d))),
    "derive_event_registry"   -> ((s, d) => Derive.eventRegistry(tables(s, d))),
    "derive_user_prop_registry" -> ((s, d) => Derive.userPropRegistry(tables(s, d))),
    "etl_prop_length_limit"   -> ((s, d) => Derive.propLengthLimit(tables(s, d))),
    // §2.4 enrichment
    "enrich_ip_geo"           -> ((s, d) => Enrich.ipGeo(tables(s, d))),
    "enrich_user_agent"       -> ((s, d) => Enrich.userAgent(tables(s, d))),
    "enrich_search_keyword"   -> ((s, d) => Enrich.searchKeyword(tables(s, d))),
    "enrich_utm_attribution"  -> ((s, d) => Enrich.utmAttribution(tables(s, d))),
    "enrich_baidu_eqid"       -> ((s, d) => Enrich.baiduEqidKeyword(tables(s, d))),
    "enrich_url_decode"       -> ((s, d) => Enrich.urlDecode(tables(s, d))),
    "etl_ts_choose"           -> ((s, d) => Etl.tsChoose(tables(s, d))),
    "etl_sdkv_compare"        -> ((s, d) => Etl.sdkvCompare(tables(s, d))),
    "etl_date_parse"          -> ((s, d) => Etl.dateParse(tables(s, d))),
    "derive_device_property_full" -> ((s, d) => Derive.devicePropertyFull(tables(s, d))),
    "adv_app_ad_latest"       -> ((s, d) => Adv.appAdLatest(tables(s, d))),
    "adv_attribute_event"     -> ((s, d) => Adv.attributeEvent(tables(s, d))),
    "adv_channel_rollup"      -> ((s, d) => Adv.channelRollup(tables(s, d))),
    "adv_asa_fields"          -> ((s, d) => Adv.asaFields(tables(s, d))),
    "adv_admission_stats"     -> ((s, d) => Adv.admissionStats(tables(s, d))),
    "adv_lid_user_first_end"  -> ((s, d) => Adv.lidUserFirstEnd(tables(s, d))),
    "adv_user_ad_source"      -> ((s, d) => Adv.userAdSource(tables(s, d))),
    "adv_ss_click_match"      -> ((s, d) => Adv.ssClickMatch(tables(s, d))),
    "sim_ann_ivf"             -> ((s, d) => Sim.ivfTopK(tables(s, d))),
    // end-to-end: the full IdJob→DwJob chain in one plan
    "pipeline_event_attr"  -> ((s, d) => Pipeline.eventAttr(tables(s, d))),
    // end-to-end: AllJob = Gate→Id→Dw with in-memory handoff
    "pipeline_all_job"     -> ((s, d) => Pipeline.allJob(tables(s, d))),
    // §2.5 routing / data quality / dims / sink
    "route_by_dt"              -> ((s, d) => Route.routeByDt(tables(s, d))),
    "route_user_row"           -> ((s, d) => Route.routeUserRow(tables(s, d))),
    "route_device_row"         -> ((s, d) => Route.routeDeviceRow(tables(s, d))),
    "route_user_prop_row"      -> ((s, d) => Route.routeUserPropRow(tables(s, d))),
    "route_event_attr"         -> ((s, d) => Route.routeEventAttr(tables(s, d))),
    "dq_validate"              -> ((s, d) => Route.dqValidate(tables(s, d))),
    "dq_full_chain"            -> ((s, d) => Route.dqFullChain(tables(s, d))),
    "dq_error_stats"           -> ((s, d) => Route.dqErrorStats(tables(s, d))),
    "dim_platform"             -> ((s, d) => Route.dimPlatform(tables(s, d))),
    "dim_network"              -> ((s, d) => Route.dimNetwork(tables(s, d))),
    "dim_user_profile"         -> ((s, d) => Route.dimUserProfile(tables(s, d))),
    "sink_partitioned_parquet" -> ((s, d) => Route.sinkPartitionedParquet(tables(s, d))),
    "sink_bucketed_join"       -> ((s, d) => Route.sinkBucketedJoin(tables(s, d))),
    "sink_dynamic_route"       -> ((s, d) => Route.sinkDynamicRoute(tables(s, d))),
    "sink_unique_key_merge"    -> ((s, d) => Route.sinkUniqueKeyMerge(tables(s, d))),
    // DW rollup tables downstream of event_attr (DUPLICATE KEY model)
    "dw_user_join"             -> ((s, d) => Dw.userJoin(tables(s, d))),
    "dw_user_active"           -> ((s, d) => Dw.userActive(tables(s, d))),
    "dw_user_duration"         -> ((s, d) => Dw.userDuration(tables(s, d))),
    "dw_user_detail"           -> ((s, d) => Dw.userDetail(tables(s, d))),
    "dw_user_detail_sum"       -> ((s, d) => Dw.userDetailSum(tables(s, d))),
    "dw_user_detail_inc"       -> ((s, d) => Dw.userDetailInc(tables(s, d))),
    "dw_user_active_inc"       -> ((s, d) => Dw.userActiveInc(tables(s, d))),
    "dw_user_duration_inc"     -> ((s, d) => Dw.userDurationInc(tables(s, d))),
    "dw_user_detail_sum_inc"   -> ((s, d) => Dw.userDetailSumInc(tables(s, d))),
    "dw_user_all"              -> ((s, d) => Dw.userAll(tables(s, d))),
    "dw_user_anonymous"        -> ((s, d) => Dw.userAnonymous(tables(s, d))),
    // §2.6 ads / attribution
    "adv_click_join"       -> ((s, d) => Adv.clickJoin(tables(s, d))),
    "adv_first_last_touch" -> ((s, d) => Adv.firstLastTouch(tables(s, d))),
    "adv_conversion"       -> ((s, d) => Adv.conversion(tables(s, d))),
    "adv_convert_match"    -> ((s, d) => Adv.convertMatch(tables(s, d))),
    "adv_deep_convert"     -> ((s, d) => Adv.deepConvert(tables(s, d))),
    "adv_add_utm"          -> ((s, d) => Adv.addUtm(tables(s, d))),
    "adv_multi_touch"      -> ((s, d) => Adv.multiTouch(tables(s, d))),
    // §2.7 analytics core
    "q1_pricing_agg"       -> ((s, d) => Analytics.q1PricingAgg(tables(s, d))),
    "q3_topk_join"         -> ((s, d) => Analytics.q3TopkJoin(tables(s, d))),
    "q5_star_join"         -> ((s, d) => Analytics.q5StarJoin(tables(s, d))),
    "q_window_funnel"      -> ((s, d) => Analytics.qWindowFunnel(tables(s, d))),
    "q_funnel_windowed"    -> ((s, d) => Analytics.qFunnelWindowed(tables(s, d))),
    "q_retention"          -> ((s, d) => Analytics.qRetention(tables(s, d))),
    "q_event_counts_daily" -> ((s, d) => Analytics.qEventCountsDaily(tables(s, d))),
    "q_user_ltv"           -> ((s, d) => Analytics.qUserLtv(tables(s, d))),
    "q_distinct_users"     -> ((s, d) => Analytics.qDistinctUsers(tables(s, d))),
    "q_distinct_users_approx" -> ((s, d) => Analytics.qDistinctUsersApprox(tables(s, d))),
    "q_event_path"         -> ((s, d) => Analytics.qEventPath(tables(s, d))),
    "q_rolling_active"     -> ((s, d) => Analytics.qRollingActive(tables(s, d))),
    "q_session_stats"      -> ((s, d) => Analytics.qSessionStats(tables(s, d))),
    "q_bounce_rate"        -> ((s, d) => Analytics.qBounceRate(tables(s, d))),
    "q_user_segment"       -> ((s, d) => Analytics.qUserSegment(tables(s, d))),
    // §2.8 LLM-pipeline extensions
    "dedup_exact"         -> ((s, d) => Dedup.exact(tables(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(tables(s, d))),
    "dedup_paragraph"     -> ((s, d) => Dedup.paragraphBoiler(tables(s, d))),
    "dedup_substring"     -> ((s, d) => Dedup.substringDup(tables(s, d))),
    "dedup_minhash_lsh"   -> ((s, d) => Dedup.minhashLsh(tables(s, d))),
    "dedup_minhash_inc"   -> ((s, d) => Dedup.minhashIncremental(tables(s, d))),
    "dedup_exact_inc"     -> ((s, d) => Dedup.exactIncremental(tables(s, d))),
    "dedup_index_compact" -> ((s, d) => Dedup.indexCompact(tables(s, d))),
    "dedup_groups"        -> ((s, d) => Dedup.dupGroups(tables(s, d))),
    "sink_dedup_groups"   -> ((s, d) => Dedup.dupGroupsSink(tables(s, d))),
    "sink_dedup_groups_compact" -> ((s, d) => Dedup.dupGroupsCompact(tables(s, d))),
    "dedup_groups_inc"    -> ((s, d) => Dedup.dupGroupsInc(tables(s, d))),
    "dedup_simhash"       -> ((s, d) => Dedup.simhash(tables(s, d))),
    "sim_ann_cosine_topk" -> ((s, d) => Sim.cosineTopK(tables(s, d))),
    "dedup_embedding_cosine" -> ((s, d) => Sim.embeddingNearDup(tables(s, d))),
    "sim_ann_lsh"         -> ((s, d) => Sim.lshTopK(tables(s, d))),
    "text_langid"         -> ((s, d) => TextAnalysis.langId(tables(s, d))),
    "text_langid_ngram"   -> ((s, d) => TextAnalysis.langIdNgram(tables(s, d))),
    "text_quality_score"  -> ((s, d) => TextAnalysis.qualityScore(tables(s, d))),
    "text_token_count"    -> ((s, d) => TextAnalysis.tokenCount(tables(s, d))),
    "text_fingerprint"    -> ((s, d) => TextAnalysis.fingerprint(tables(s, d))),
    "text_pii_scrub"      -> ((s, d) => TextAnalysis.piiScrub(tables(s, d))),
    "mm_binary_columns"   -> ((s, d) => Multimodal.binaryColumns(tables(s, d))),
    "mm_frame_sample"     -> ((s, d) => Multimodal.frameSample(tables(s, d))),
    "mm_audio_chunks"     -> ((s, d) => Multimodal.audioChunks(tables(s, d))),
    // training-data assembly + as-of state lookup
    "q_asof_join"             -> ((s, d) => Analytics.asofJoin(tables(s, d))),
    "q_value_quantiles"       -> ((s, d) => Analytics.valueQuantiles(tables(s, d))),
    "sample_stratified"       -> ((s, d) => TrainData.sampleStratified(tables(s, d))),
    "sample_stratified_stats" -> ((s, d) => TrainData.sampleStratifiedStats(tables(s, d))),
    "text_repetition"         -> ((s, d) => TextAnalysis.repetition(tables(s, d))),
    "text_contamination"      -> ((s, d) => TrainData.contamination(tables(s, d))),
    "text_contamination_bloom" -> ((s, d) => TrainData.contaminationBloom(tables(s, d))),
    "pack_sequences"          -> ((s, d) => TrainData.packSequences(tables(s, d))),
    "pack_sequences_stats"    -> ((s, d) => TrainData.packSequencesStats(tables(s, d))),
    "pipeline_curation"       -> ((s, d) => TrainData.curation(tables(s, d))),
    "text_unigram_lm"         -> ((s, d) => TextAnalysis.unigramLm(tables(s, d))),
    "emb_quantize"            -> ((s, d) => Sim.quantize(tables(s, d))),
    "text_c4_filters"         -> ((s, d) => TextAnalysis.c4Filters(tables(s, d))),
    "text_top_ngrams"         -> ((s, d) => TextAnalysis.topNgrams(tables(s, d))),
    "mix_domains"             -> ((s, d) => TrainData.mixDomains(tables(s, d))),
    "mix_domains_stats"       -> ((s, d) => TrainData.mixDomainsStats(tables(s, d))),
    "emb_cluster_assign"      -> ((s, d) => Sim.clusterAssign(tables(s, d))),
    "dedup_semantic"          -> ((s, d) => Sim.semanticDedup(tables(s, d))),
    "id_incremental_assign"   -> ((s, d) => Identity.incrementalAssign(tables(s, d))),
    "text_quality_classifier" -> ((s, d) => TextAnalysis.qualityClassifier(tables(s, d))),
    "quality_gate_agreement"  -> ((s, d) => TextAnalysis.qualityGateAgreement(tables(s, d))),
    "text_bpe_merges"         -> ((s, d) => TextAnalysis.bpeMerges(tables(s, d))),
    "text_bpe_encode"         -> ((s, d) => TextAnalysis.bpeEncode(tables(s, d))),
    "shard_assign"            -> ((s, d) => TrainData.shardAssign(tables(s, d))),
    "text_chunk_windows"      -> ((s, d) => TrainData.chunkWindows(tables(s, d))),
    "pack_sequences_split"    -> ((s, d) => TrainData.packSequencesSplit(tables(s, d))),
    "mix_epochs"              -> ((s, d) => TrainData.mixEpochs(tables(s, d))),
    "mix_epochs_stats"        -> ((s, d) => TrainData.mixEpochsStats(tables(s, d))),
    "shard_assign_stats"      -> ((s, d) => TrainData.shardAssignStats(tables(s, d))),
    "emb_random_projection"   -> ((s, d) => Sim.randomProjection(tables(s, d))),
    "sim_ann_project_rerank"  -> ((s, d) => Sim.projectRerank(tables(s, d))),
    "emb_quality_audit"       -> ((s, d) => Sim.qualityAudit(tables(s, d))),
    "dedup_url"               -> ((s, d) => Dedup.urlDedup(tables(s, d))),
    "url_host_stats"          -> ((s, d) => Dedup.urlHostStats(tables(s, d))),
    "dedup_paragraph_strip"   -> ((s, d) => Dedup.paragraphStrip(tables(s, d))),
    "text_gopher_quality"     -> ((s, d) => TextAnalysis.gopherQuality(tables(s, d))),
    "corpus_stats"            -> ((s, d) => TrainData.corpusStats(tables(s, d))),
    "corpus_stats_inc"        -> ((s, d) => TrainData.corpusStatsInc(tables(s, d))),
    "dsir_importance"         -> ((s, d) => TrainData.dsirImportance(tables(s, d))),
    "sim_knn_graph"           -> ((s, d) => Sim.knnGraph(tables(s, d))),
    "mm_phash_dedup"          -> ((s, d) => Multimodal.phashDedup(tables(s, d))),
    "dedup_keep_best"         -> ((s, d) => Dedup.keepBest(tables(s, d))),
    "mix_temperature"         -> ((s, d) => TrainData.mixTemperature(tables(s, d))),
    "dedup_audit"             -> ((s, d) => Dedup.dedupAudit(tables(s, d))),
    "pipeline_curation_llm"   -> ((s, d) => TrainData.curationLlm(tables(s, d))),
    "emb_dedup_pq"            -> ((s, d) => Sim.pqDedup(tables(s, d))),
    "emb_pq_residual"         -> ((s, d) => Sim.pqResidual(tables(s, d))),
    "sim_ann_ivfpq_residual"  -> ((s, d) => Sim.ivfPqResidualTopK(tables(s, d))),
    "sim_ann_ivfpq_residual_trained" -> ((s, d) => Sim.ivfPqResidualTrainedTopK(tables(s, d))),
    "text_perplexity_bucket"  -> ((s, d) => TextAnalysis.perplexityBucket(tables(s, d))),
    "text_token_histogram"    -> ((s, d) => TextAnalysis.tokenHistogram(tables(s, d))),
    "text_langid_agreement"   -> ((s, d) => TextAnalysis.langIdAgreement(tables(s, d))),
    "text_char_entropy"       -> ((s, d) => TextAnalysis.charEntropy(tables(s, d))),
    "mix_budget"              -> ((s, d) => TrainData.mixBudget(tables(s, d))),
    "emb_pq_encode"           -> ((s, d) => Sim.pqEncode(tables(s, d))),
    "emb_pq_encode_trained"   -> ((s, d) => Sim.pqEncodeTrained(tables(s, d))),
    "sim_ann_pq_adc"          -> ((s, d) => Sim.pqAdcTopK(tables(s, d))),
    "sink_vector_index"       -> ((s, d) => Sim.vectorIndexSink(tables(s, d))),
    "sink_vector_index_compact" -> ((s, d) => Sim.vectorIndexCompact(tables(s, d))),
    "sim_ann_pq_adc_stored"   -> ((s, d) => Sim.pqAdcTopKStored(tables(s, d))),
    "sim_ann_ivfpq"           -> ((s, d) => Sim.ivfPqTopK(tables(s, d))),
    "sim_ann_ivfpq_filtered"  -> ((s, d) => Sim.ivfPqTopKFiltered(tables(s, d))),
    "sink_vector_index_upsert" -> ((s, d) => Sim.vectorIndexUpsert(tables(s, d))),
    "sim_ann_filtered"        -> ((s, d) => Sim.cosineTopKFiltered(tables(s, d))),
    "sim_ann_adc_rerank"      -> ((s, d) => Sim.adcRefineTopK(tables(s, d))),
    "text_bm25_topk"          -> ((s, d) => TrainData.bm25TopKDocs(tables(s, d))),
    "retrieval_hybrid_rrf"    -> ((s, d) => TrainData.hybridRrf(tables(s, d))),
    "retrieval_hybrid_rrf_stored" -> ((s, d) => TrainData.hybridRrfStored(tables(s, d))),
    "retrieval_hybrid_rrf_stored_fresh" -> ((s, d) => TrainData.hybridRrfStoredFresh(tables(s, d))),
    "retrieval_hybrid_rrf_serve" -> ((s, d) => TrainData.hybridRrfServe(tables(s, d))),
    "text_bm25_serve"         -> ((s, d) => TrainData.bm25TopKServe(tables(s, d))),
    "sim_ann_adc_serve"       -> ((s, d) => Sim.pqAdcServe(tables(s, d))),
    "sink_text_index"         -> ((s, d) => TrainData.textIndexSink(tables(s, d))),
    "sink_text_index_compact" -> ((s, d) => TrainData.textIndexCompact(tables(s, d))),
    "sink_text_index_upsert"  -> ((s, d) => TrainData.textIndexUpsert(tables(s, d))),
    "text_bm25_stored_fresh"  -> ((s, d) => TrainData.bm25TopKStoredFresh(tables(s, d))),
    "retrieval_audit"         -> ((s, d) => TrainData.retrievalAudit(tables(s, d))),
    "retrieval_eval_ndcg"     -> ((s, d) => TrainData.retrievalEvalNdcg(tables(s, d))),
    "retrieval_eval_ndcg_planted" -> ((s, d) => TrainData.retrievalEvalNdcgPlanted(tables(s, d))),
    "mix_unimax"              -> ((s, d) => TrainData.mixUnimax(tables(s, d))),
    "dedup_soft_weight"       -> ((s, d) => Dedup.softWeight(tables(s, d))),
    "split_leakage_safe"      -> ((s, d) => Dedup.splitLeakageSafe(tables(s, d)))
  )

  /** DuckDB list literal for a stopword set. */
  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Projected-coordinate fold SQL, generated from the SAME projSign
    * matrix as the Spark plan — ascending d, left-assoc, so accumulation
    * is bitwise identical.
    */
  private def projFoldSql(j: Int): String =
    "(0.0" + (0 until 64).flatMap { d =>
      graft.operators.Sim.projSign(d, j) match {
        case 1  => Some(s" + v[${d + 1}]")
        case -1 => Some(s" - v[${d + 1}]")
        case _  => None
      }
    }.mkString + ")"

  /** The BPE training oracle: K chained merge rounds as generated CTE
    * stages — each round recounts pairs over the previous sequences, takes
    * the (cnt DESC, lhs, rhs) argmax, and applies the literal double-space
    * replace, exactly like TextAnalysis.bpeTrain. Every multiply-referenced
    * CTE is MATERIALIZED (DuckDB inlines by default — the r5
    * pipeline_all_job lesson).
    */
  private def bpeOracle(encode: Boolean): String = {
    val k = TextAnalysis.bpeMergeRounds
    val rounds = (1 to k).map { r =>
      s"""t$r AS (SELECT wcount, string_split(trim(seq), '  ') AS tk FROM s${r - 1}),
         e$r AS (SELECT wcount, tk, unnest(generate_series(1, len(tk)-1)) AS i
                 FROM t$r WHERE len(tk) >= 2),
         p$r AS (SELECT tk[i] AS lhs, tk[i+1] AS rhs, sum(wcount) AS cnt
                 FROM e$r GROUP BY 1, 2),
         b$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$r
                 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         s$r AS MATERIALIZED (SELECT word, wcount,
                 replace(seq, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.lhs || b.rhs || ' ') AS seq
                 FROM s${r - 1}, b$r b)"""
    }.mkString(",\n         ")
    val ctes =
      s"""WITH w0 AS (SELECT w AS word, count(*) AS wcount FROM
           (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents) GROUP BY 1),
         s0 AS MATERIALIZED (SELECT word, wcount,
           ' ' || substring(regexp_replace(word, '(.)', '\\1  ', 'g'),
                            1, length(word)*3 - 1) AS seq
           FROM w0),
         $rounds"""
    if (!encode) {
      val unions = (1 to k).map(r =>
        s"SELECT $r AS round, lhs, rhs, CAST(cnt AS BIGINT) AS pair_count, " +
          s"lhs || rhs AS merged FROM b$r").mkString("\n         UNION ALL ")
      s"""$ctes
         $unions
         ORDER BY round"""
    } else {
      s"""$ctes,
         m AS (SELECT word,
             CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_tok,
             CAST(length(word) AS BIGINT) AS n_char FROM s$k),
         d AS (SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
           FROM documents)
         SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS bpe_tokens,
           floor(sum(n_char) * 10000.0 / sum(n_tok)) / 10000 AS chars_per_token
         FROM d JOIN m USING (word) GROUP BY doc_id ORDER BY doc_id"""
    }
  }

  /** Expected UA-parse results per Envelope.uaSet index — the oracle's
    * independently hand-derived truth table for the regexp-based parser
    * (os, os_version, browser, browser_version, device_type, device_brand).
    */
  private val uaExpected: Seq[(String, String, String, String, String, String)] = Seq(
    ("Windows", "10.0", "Chrome", "120", "Desktop", "Microsoft"),
    ("Mac OS X", "10.15.7", "Safari", "17", "Desktop", "Apple"),
    ("Linux", "\\N", "Firefox", "121", "Desktop", "\\N"),
    ("iOS", "17.1", "MicroMessenger", "8", "Mobile", "Apple"),
    ("Windows", "10.0", "Edge", "120", "Desktop", "Microsoft"),
    ("Android", "12", "Chrome", "118", "Mobile", "Huawei"),
    ("iOS", "16.6", "Safari", "16", "Tablet", "Apple"),
    ("Android", "11", "UCBrowser", "15", "Mobile", "Redmi"),
    ("Android", "13", "QQBrowser", "14", "Mobile", "Samsung"),
    ("Windows", "10.0", "Opera", "105", "Desktop", "Microsoft"))

  /** CASE over event_id % 10 for one field of the UA truth table. */
  private def uaCase(f: ((String, String, String, String, String, String)) => String,
                     idCol: String = "event_id"): String =
    s"CASE $idCol % 10 " + uaExpected.zipWithIndex
      .map { case (row, i) => s"WHEN $i THEN '${f(row)}'" }.mkString(" ") + " END"

  private def advOrigList: String = operators.Adv.adIdOriginExclude.map(s => s"'$s'").mkString(", ")
  private def advMd5List: String = operators.Adv.adIdMd5Exclude.map(s => s"'$s'").mkString(", ")

  /** The AdvJob admission CTE chain ending in `advadm` (mirrors
    * Adv.advAdmitted): raw ⋈ the company/business-admitted ad-app registry,
    * minus the per-app data_access_filter ip/ua blacklist rows — shared by
    * every adv oracle so the gate cannot drift between legs.
    */
  private def advAdmitCte: String = {
    val apps = operators.Adv.adAppRegistry
      .map { case (k, id) => s"('$k', $id)" }.mkString(", ")
    val ips = Etl.ipBlacklist.map { case (a, i) => s"('$a', '$i')" }.mkString(", ")
    val uas = Etl.uaBlacklist.map { case (a, u) => s"('$a', '$u')" }.mkString(", ")
    s"""apps(appkey, ad_app_id) AS (VALUES $apps),
       aipb(appkey, ip) AS (VALUES $ips),
       auab(appkey, ua) AS (VALUES $uas),
       advadm AS (SELECT r.*, a.ad_app_id FROM raw r
         JOIN apps a ON r.appkey = a.appkey
         WHERE NOT EXISTS (SELECT 1 FROM aipb b
             WHERE b.appkey = r.appkey AND b.ip = r.ip)
           AND NOT EXISTS (SELECT 1 FROM auab b
             WHERE b.appkey = r.appkey AND b.ua = r.ua))"""
  }

  /** Shared DuckDB CTE chain for the ad-state operators (mirrors
    * Adv.appAdLatest): registered apps → synthesized adtf clicks →
    * normalized ids → match keys → latest-per-key rank in `l`.
    */
  private def advAdStateCtes: String =
    s"""$advAdmitCte,
       clicks AS (
         SELECT r.event_id AS lid, r.ad_app_id, r.ip, r.ua,
           CASE r.event_id % 13 WHEN 0 THEN '0' WHEN 1 THEN 'NULL' WHEN 2 THEN ''
             WHEN 3 THEN 'cfcd208495d565ef66e7dff9f98764da'
             WHEN 4 THEN md5(concat('m', cast(r.user_id AS string)))
             ELSE concat('muid-', cast(r.user_id AS string)) END AS muid_raw,
           CASE WHEN r.event_id % 7 = 0 THEN '(null)'
             ELSE concat('oaid-', cast(r.user_id AS string)) END AS oaid_raw,
           CASE WHEN r.event_id % 2 = 0 THEN (1700000000 + r.event_id) * 1000
             ELSE 1700000000000 + r.event_id END AS click_time
         FROM advadm r
         WHERE r.event_type = 'click'),
       nrm AS (SELECT *,
           CASE WHEN click_time < 10000000000 THEN click_time * 1000
                ELSE click_time END AS ct,
           CASE WHEN muid_raw IN ($advOrigList) OR lower(muid_raw) IN ($advMd5List) THEN ''
                WHEN length(muid_raw) = 32 THEN lower(muid_raw)
                ELSE md5(muid_raw) END AS muid,
           CASE WHEN oaid_raw IN ($advOrigList) OR lower(oaid_raw) IN ($advMd5List) THEN ''
                WHEN length(oaid_raw) = 32 THEN lower(oaid_raw)
                ELSE md5(oaid_raw) END AS oaid
         FROM clicks),
       kk AS (
         SELECT concat('adtfad:', cast(ad_app_id AS string), ':', muid) AS match_key,
                lid, ct FROM nrm WHERE muid <> ''
         UNION ALL
         SELECT concat('adtfad:', cast(ad_app_id AS string), ':', oaid), lid, ct
         FROM nrm WHERE oaid <> ''
         UNION ALL
         SELECT concat('adtfad:', cast(ad_app_id AS string), ':', ip, ua), lid, ct
         FROM nrm WHERE ip <> ''),
       l AS (SELECT match_key, lid, ct,
           row_number() OVER (PARTITION BY match_key ORDER BY ct DESC, lid DESC) AS rn
         FROM kk)"""

  /** DuckDB mirror of Gate.gateResolve's resolver chain: probes + verdict
    * in CTE `v`, with the caller supplying the final SELECT over it.
    */
  private def gateResolveOracle(finalSelect: String): String =
    s"""WITH ${Envelope.oracleRaw},
       $gateVerdictCtes
       $finalSelect"""

  /** The MsgResolver verdict CTE chain (g → p → q → v) over `raw`; shared by
    * the gate operators and the AllJob oracle.
    */
  private def gateVerdictCtes: String = {
    val num = "('UBIGINT','BIGINT','DOUBLE')"
    s"""g AS (SELECT event_id, json_valid(gate_msg) AS okj,
               CASE WHEN json_valid(gate_msg) THEN gate_msg ELSE '{}' END AS gm
             FROM raw),
       p AS (SELECT event_id, okj,
           gm::JSON->>'Ip' AS ip_s, json_type(gm::JSON->'Ip') AS ip_t,
           gm::JSON->>'Now' AS now_s, json_type(gm::JSON->'Now') AS now_t,
           gm::JSON->>'Header' AS header_s, json_type(gm::JSON->'Header') AS header_t,
           gm::JSON->>'Args' AS args_s, json_type(gm::JSON->'Args') AS args_t
         FROM g),
       q AS (SELECT *,
           coalesce(CASE WHEN header_t = 'VARCHAR' AND json_valid(header_s)
                         THEN header_s::JSON->>'user-agent' END, 'DEFAULT') AS hdr_ua,
           CASE WHEN args_t = 'VARCHAR' AND json_valid(args_s)
                THEN args_s::JSON->>'event' END AS arg_event,
           CASE WHEN args_t = 'VARCHAR' AND json_valid(args_s)
                THEN args_s::JSON->>'compress' END AS arg_compress,
           CASE WHEN args_t = 'VARCHAR' AND json_valid(args_s)
                THEN args_s::JSON->>'encrypt' END AS arg_encrypt,
           CASE WHEN args_t = 'VARCHAR' AND json_valid(args_s)
                THEN args_s::JSON->>'type' END AS arg_type
         FROM p),
       v AS MATERIALIZED (SELECT event_id, ip_s, now_s, hdr_ua,
           CASE WHEN NOT okj THEN 'JSON_BAD'
                WHEN ip_s IS NULL OR ip_t IN $num THEN 'IP_BAD'
                WHEN now_s IS NULL OR now_t NOT IN $num THEN 'NOW_BAD'
                WHEN header_s IS NULL OR header_t IN $num THEN 'HEADER_BAD'
                WHEN args_s IS NULL OR args_t IN $num
                     OR (arg_event IS NULL AND arg_compress IS NULL
                         AND arg_encrypt IS NULL) THEN 'ARGS_BAD'
                WHEN arg_encrypt IS NOT NULL AND arg_encrypt NOT IN ('0','1') THEN 'ENCRYPT_BAD'
                WHEN arg_compress IS NOT NULL AND arg_compress NOT IN ('0','1') THEN 'COMPRESS_BAD'
                -- the oracle cannot decrypt; it replays the generator's
                -- truncated-ciphertext class (%3=0 on BOTH the SM4 type-2
                -- and AES type-1 branches) and, for intact ciphertext,
                -- validates the PLAINTEXT its raw CTE carries where Spark
                -- carries the ciphertext
                WHEN arg_encrypt = '1' AND event_id % 3 = 0 THEN 'EVENT_DECRYPT_BAD'
                WHEN NOT json_valid(arg_event) THEN 'EVENT_BAD'
                ELSE 'OK' END AS verdict
         FROM q)"""
  }

  /** URL synthesis + canonicalization CTE chain — the oracle mirror of
    * `Dedup.syntheticUrl`/`canonicalUrl`, shared by dedup_url and
    * url_host_stats so the two oracles can't drift. Yields
    * `c` = (doc_id, canon_url). Plain (non-interpolated) string: the
    * regex backslashes must reach DuckDB literally.
    */
  private val urlCanonCtes: String =
    """u AS (SELECT doc_id,
             concat(
               CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END, '://',
               CASE WHEN doc_id % 2 = 0
                 THEN concat('WWW.Example', CAST(doc_id % 40 AS VARCHAR), '.COM')
                 ELSE concat('www.example', CAST(doc_id % 40 AS VARCHAR), '.com') END,
               CASE WHEN doc_id % 5 = 0
                 THEN CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END
                 WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END,
               concat('/articles/item', CAST(doc_id % 25 AS VARCHAR),
                 CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END),
               '?',
               concat_ws('&',
                 CASE WHEN doc_id % 2 = 0
                   THEN concat('utm_source=feed', CAST(doc_id % 3 AS VARCHAR)) END,
                 concat('id=', CAST(doc_id % 25 AS VARCHAR)),
                 CASE WHEN doc_id % 7 < 3 THEN 'ref=rss' END),
               CASE WHEN doc_id % 6 < 2
                 THEN concat('#sec', CAST(doc_id % 3 AS VARCHAR)) ELSE '' END
             ) AS url
           FROM documents),
         nf AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u),
         hd AS (SELECT doc_id,
             regexp_replace(regexp_replace(
               lower(regexp_extract(nf, '^[A-Za-z]+://[^/?#]*')),
               '^(https://[^/:]*):443$', '\1'),
               '^(http://[^/:]*):80$', '\1') AS head,
             substring(nf, length(regexp_extract(nf, '^[A-Za-z]+://[^/?#]*')) + 1) AS rest
           FROM nf),
         pq AS (SELECT doc_id, head,
             regexp_replace(regexp_replace(rest, '\?.*$', ''), '/+$', '') AS path,
             regexp_extract(rest, '\?(.*)$', 1) AS q
           FROM hd),
         pr AS (SELECT doc_id, head, path,
             array_to_string(list_sort(list_filter(string_split(q, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^(utm_|fbclid|gclid)'))), '&')
               AS params
           FROM pq),
         c AS (SELECT doc_id,
             concat(head, path,
               CASE WHEN params = '' THEN '' ELSE concat('?', params) END) AS canon_url
           FROM pr)"""

  /** The classifier's hashed-bucket weight-sum fold over a list column —
    * THE one SQL weight formula, shared by text_quality_classifier and
    * quality_gate_agreement so the report can't drift from the gate.
    * Left-fold so accumulation order (and every bit) matches Spark's.
    */
  private def qcWSumSql(listCol: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform($listCol, x ->
         CAST((CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % ${TextAnalysis.qcBuckets})
              * 2654435761 % 1000 AS DOUBLE) / 1000 - 0.5)),
         (a, b) -> a + b)"""

  /** The Gopher signal CTE body over a words CTE `src` — shared by
    * text_gopher_quality and quality_gate_agreement (same drift rule).
    * Yields columns (doc_id, n_words, mean_word_len, symbol_ratio,
    * alpha_frac, stop_hits).
    */
  private def gopherSignalSql(src: String): String = {
    import TextAnalysis._
    val reqList = gopherRequiredWords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, len(w) AS n_words,
         floor(CAST(list_aggregate(list_transform(w, x -> len(x)), 'sum')
           AS DOUBLE) / len(w) * 10000) / 10000 AS mean_word_len,
         floor(CAST(len(list_filter(w, x -> x = '#' OR x LIKE '%...%'))
           AS DOUBLE) / len(w) * 10000) / 10000 AS symbol_ratio,
         floor(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
           AS DOUBLE) / len(w) * 10000) / 10000 AS alpha_frac,
         len(list_filter(w, x -> x IN ($reqList))) AS stop_hits
       FROM $src"""
  }

  /** The dataset-card oracle, shared verbatim by corpus_stats and its
    * incremental fold (hash match there proves fold == full rescan).
    */
  private def corpusStatsSql: String =
    s"""WITH d AS (SELECT source, lang,
           len(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
           length(text) AS chars
         FROM documents)
       SELECT source, lang, count(*) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS n_tokens, CAST(sum(chars) AS BIGINT) AS n_chars,
         floor(sum(tok) * 10000.0 / count(*)) / 10000 AS mean_tokens,
         floor(sum(CASE WHEN tok < ${TextAnalysis.c4MinWords} THEN 1 ELSE 0 END)
           * 10000.0 / count(*)) / 10000 AS short_frac
       FROM d GROUP BY source, lang ORDER BY source, lang"""

  /** The ADC-search oracle, shared verbatim by sim_ann_pq_adc and its
    * stored-index face (hash match there proves the persisted code table
    * searches identically to the in-plan encode).
    */
  /** The ADC-ranking CTE chain (encode + per-query distance tables +
    * ranked candidates) — ONE builder for the plain ADC search and the
    * refine shortlist, so the two oracles cannot drift on the ADC sum.
    * Yields `k` = (query_id, vec_id, adc, rank) with NO rank cut, plus
    * pqEncodeCtes' `e` = (vec_id, v) for exact-distance consumers.
    */
  private def pqAdcChain: String = {
    val (m, sd) = (Sim.pqM, Sim.pqSubDim)
    val dCols = (0 until m)
      .map(j => s"sum(CASE WHEN b.m = $j THEN d END) AS d$j").mkString(",\n           ")
    val adcSum = (0 until m).map(j => s"d$j").mkString(" + ")
    s"""$pqEncodeCtes,
       q AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id < ${Sim.nQueries}),
       tbl AS (SELECT q.query_id, c.code, m.m,
               list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                 i -> (q.qv[m.m*$sd+i] - c.cv[m.m*$sd+i])
                      * (q.qv[m.m*$sd+i] - c.cv[m.m*$sd+i]))),
                 (a, b) -> a + b) AS d
             FROM q CROSS JOIN c
               CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) m),
       s AS (SELECT tbl.query_id, b.vec_id,
         $dCols
         FROM b JOIN tbl ON b.m = tbl.m AND b.code = tbl.code
         WHERE b.vec_id <> tbl.query_id GROUP BY 1, 2),
       k AS (SELECT query_id, vec_id, ($adcSum) AS adc, row_number() OVER (
               PARTITION BY query_id ORDER BY ($adcSum), vec_id) AS rank FROM s)"""
  }

  private def pqAdcSql: String =
    s"""WITH $pqAdcChain
       SELECT query_id, vec_id AS neighbor_id, rank,
         floor(adc * 10000) / 10000 AS adc_dist
       FROM k WHERE rank <= ${Sim.topK} ORDER BY query_id, rank"""

  /** The refine chain: ADC shortlist (shared chain) → exact cosine from
    * the raw vectors → full exact re-ranking (ends in `rr`, no rank cut).
    * ONE builder for the sim_ann_adc_rerank oracle and the retrieval
    * audit's refine face, so the two cannot drift.
    */
  private def pqAdcRefineChain: String =
    s"""$pqAdcChain,
       sl AS (SELECT query_id, vec_id FROM k
              WHERE rank <= ${Sim.refineShortlist}),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
              WHERE vec_id < ${Sim.nQueries}),
       x AS (SELECT sl.query_id, sl.vec_id,
               list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm) AS cos
             FROM sl JOIN qn USING (query_id) JOIN n USING (vec_id)),
       rr AS (SELECT query_id, vec_id, cos, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM x)"""

  private def pqAdcRerankSql: String =
    s"""WITH $pqAdcRefineChain
       SELECT query_id, vec_id AS neighbor_id, rank,
         floor(cos * 10000) / 10000 AS cos_sim
       FROM rr WHERE rank <= ${Sim.topK} ORDER BY query_id, rank"""

  /** The retrieval_audit oracle: five top-k set-overlap counts, each face
    * nested as its OWN `WITH` subquery built from the SAME chain builders
    * as that face's standalone oracle (pqAdcChain / ivfPqAdcChain /
    * pqAdcRefineChain / bm25RankCtes / cosineRankCtes / rrfFuseSql) — so
    * the audit provably scores the audited math, and no CTE names can
    * clash across faces.
    */
  private def retrievalAuditSql: String = {
    val k = Sim.topK
    def row(metric: String, nq: Long, body: String): String =
      s"""SELECT '$metric' AS metric, CAST($nq AS BIGINT) AS n_queries,
         CAST($k AS BIGINT) AS k, n_agree,
         floor(n_agree * 10000.0 / (${nq * k})) / 10000 AS overlap_at_k
         FROM (WITH $body) z"""
    val hybCte =
      s"""hyk AS (WITH ${bm25RankCtes()},
             ${cosineRankCtes(TrainData.bm25NQueries)},
             ${rrfFuseSql(
               s"""SELECT query_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
                  FROM lxr WHERE rank <= ${TrainData.rrfDepth}""",
               s"""SELECT query_id, neighbor_id AS doc_id,
                    CAST(rank AS BIGINT) AS vec_rank
                  FROM cr WHERE rank <= ${TrainData.rrfDepth}""")})"""
    val rows = Seq(
      row("adc_vs_exact", Sim.nQueries,
        s"""$pqAdcChain,
           ${cosineRankCtes(Sim.nQueries)}
           SELECT count(*) AS n_agree
           FROM (SELECT query_id, vec_id FROM k WHERE rank <= $k) a
           JOIN (SELECT query_id, neighbor_id AS vec_id FROM cr
                 WHERE rank <= $k) b
           USING (query_id, vec_id)"""),
      row("ivfpq_vs_adc", Sim.nQueries,
        s"""ivk AS (WITH ${ivfPqAdcChain(filtered = false)}
                    SELECT query_id, vec_id FROM k WHERE rank <= $k),
           adk AS (WITH $pqAdcChain
                   SELECT query_id, vec_id FROM k WHERE rank <= $k)
           SELECT count(*) AS n_agree
           FROM ivk JOIN adk USING (query_id, vec_id)"""),
      row("refine_vs_exact", Sim.nQueries,
        s"""$pqAdcRefineChain,
           ${cosineRankCtes(Sim.nQueries)}
           SELECT count(*) AS n_agree
           FROM (SELECT query_id, vec_id FROM rr WHERE rank <= $k) a
           JOIN (SELECT query_id, neighbor_id AS vec_id FROM cr
                 WHERE rank <= $k) b
           USING (query_id, vec_id)"""),
      row("hybrid_vs_lex", TrainData.bm25NQueries,
        s"""$hybCte,
           lx5 AS (WITH ${bm25RankCtes()}
                   SELECT query_id, doc_id FROM lxr
                   WHERE rank <= ${TrainData.bm25TopK})
           SELECT count(*) AS n_agree
           FROM (SELECT query_id, doc_id FROM hyk) h
           JOIN lx5 USING (query_id, doc_id)"""),
      row("hybrid_vs_vec", TrainData.bm25NQueries,
        s"""$hybCte,
           vc5 AS (WITH ${cosineRankCtes(TrainData.bm25NQueries)}
                   SELECT query_id, neighbor_id AS doc_id FROM cr
                   WHERE rank <= $k)
           SELECT count(*) AS n_agree
           FROM (SELECT query_id, doc_id FROM hyk) h
           JOIN vc5 USING (query_id, doc_id)"""))
    rows.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) u ORDER BY metric")
  }

  /** The retrieval_eval_ndcg oracle. Judgments replay the all-integer
    * Jaccard grading over the SAME distinct per-doc 3-shingles as
    * Dedup.shingles; the three system rankings nest their own chain
    * builders (the retrievalAuditSql pattern); the DCG discounts are the
    * SAME Scala-computed micro-unit literals the Spark plan uses
    * (`TrainData.ndcgDiscQ6`) — log2 never runs in either engine.
    */
  /** The NDCG@k scoring tail shared by the measured and planted evals:
    * takes a CTE prelude that must END with `jrel` (query_id, doc_id,
    * rel) and the two system source tables (physical names or prelude
    * CTE names — the planted eval passes its augmented-corpus CTEs), and
    * emits jidcg + the four system frames + the final union. ONE builder,
    * so the two oracles cannot drift on the scoring arithmetic.
    */
  private def ndcgEvalSql(jrelPrelude: String, docsSrc: String,
      embSrc: String): String = {
    val k = TrainData.ndcgK
    val disc = s"[${TrainData.ndcgDiscQ6.mkString(", ")}]"
    val nq = TrainData.bm25NQueries
    def evalSelect(name: String, sys: String): String =
      s"""SELECT '$name' AS system, g.query_id, g.dcg_q6,
           coalesce(ji.idcg_q6, 0) AS idcg_q6,
           CASE WHEN ji.idcg_q6 > 0
             THEN floor(g.dcg_q6 * 10000.0 / ji.idcg_q6) / 10000 END AS ndcg_q4
         FROM (SELECT r.query_id,
                 CAST(sum(coalesce(jrel.rel, 0) * ($disc)[r.rank]) AS BIGINT)
                   AS dcg_q6
               FROM $sys r LEFT JOIN jrel
                 ON jrel.query_id = r.query_id AND jrel.doc_id = r.doc_id
               GROUP BY 1) g
         LEFT JOIN jidcg ji ON ji.query_id = g.query_id"""
    s"""WITH $jrelPrelude,
       jidcg AS (SELECT query_id,
                   CAST(sum(rel * ($disc)[irank]) AS BIGINT) AS idcg_q6
                 FROM (SELECT query_id, rel, row_number() OVER (
                         PARTITION BY query_id ORDER BY rel DESC, doc_id)
                         AS irank FROM jrel)
                 WHERE irank <= $k GROUP BY 1),
       bm AS (WITH ${bm25RankCtes(docsSrc)}
              SELECT query_id, doc_id, rank FROM lxr WHERE rank <= $k),
       cs AS (WITH ${cosineRankCtes(nq, embSrc)}
              SELECT query_id, neighbor_id AS doc_id, rank FROM cr
              WHERE rank <= $k),
       iv AS (WITH ${ivfPqAdcChain(filtered = false, src = embSrc)}
              SELECT query_id, vec_id AS doc_id, rank FROM k
              WHERE rank <= $k AND query_id < $nq),
       hy AS (WITH ${bm25RankCtes(docsSrc)},
              ${cosineRankCtes(nq, embSrc)},
              ${rrfFuseSql(
                s"""SELECT query_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
                   FROM lxr WHERE rank <= ${TrainData.rrfDepth}""",
                s"""SELECT query_id, neighbor_id AS doc_id,
                     CAST(rank AS BIGINT) AS vec_rank
                   FROM cr WHERE rank <= ${TrainData.rrfDepth}""")})
       SELECT * FROM (
         ${evalSelect("bm25", "bm")}
         UNION ALL
         ${evalSelect("cosine", "cs")}
         UNION ALL
         ${evalSelect("hybrid_rrf", "hy")}
         UNION ALL
         ${evalSelect("ivfpq", "iv")}
       ) u ORDER BY system, query_id"""
  }

  private def retrievalEvalNdcgSql: String = {
    val nq = TrainData.bm25NQueries
    ndcgEvalSql(
      s"""jd AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
       jsh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s
               FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
                     FROM jd WHERE len(w) >= 3)),
       jcnt AS (SELECT doc_id, count(*) AS c FROM jsh GROUP BY 1),
       jrel AS (SELECT query_id, doc_id, rel FROM (
                  SELECT p.qid AS query_id, p.did AS doc_id,
                    CASE WHEN p.shared * 25 >= cd.c + cq.c - p.shared THEN 3
                         WHEN p.shared * 50 >= cd.c + cq.c - p.shared THEN 2
                         WHEN p.shared * 100 >= cd.c + cq.c - p.shared THEN 1
                         ELSE 0 END AS rel
                  FROM (SELECT q.doc_id AS qid, d.doc_id AS did,
                          count(*) AS shared
                        FROM jsh d JOIN jsh q ON d.s = q.s
                        WHERE q.doc_id < $nq AND d.doc_id <> q.doc_id
                        GROUP BY 1, 2) p
                  JOIN jcnt cd ON cd.doc_id = p.did
                  JOIN jcnt cq ON cq.doc_id = p.qid)
                WHERE rel > 0)""",
      "documents", "embeddings")
  }

  /** The planted-slice eval oracle: the SAME augmentation arithmetic as
    * TrainData.plantedTables (word repeat / mod-index sampling, first-k
    * component keep with x*0 zeroing) as corpus CTEs, the CONSTRUCTED
    * judgment list (rel = 4 - v by the plant design), and the shared
    * scoring tail over the augmented sources.
    */
  private def retrievalEvalNdcgPlantedSql: String = {
    val nq = TrainData.bm25NQueries
    val base = TrainData.plantedBase
    val dims = TrainData.plantedDims
    ndcgEvalSql(
      s"""pw AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents WHERE doc_id < $nq),
       pv AS (SELECT * FROM (VALUES (1, ${dims(0)}), (2, ${dims(1)}),
               (3, ${dims(2)})) t(v, kd)),
       pdocs AS (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT $base + pw.doc_id * 10 + pv.v AS doc_id,
            array_to_string(CASE pv.v
              WHEN 1 THEN flatten([w, w, w, w])
              WHEN 2 THEN list_transform(list_filter(generate_series(1, len(w)),
                i -> (i-1) % 2 = 0), i -> w[i])
              ELSE list_transform(list_filter(generate_series(1, len(w)),
                i -> (i-1) % 4 = 0), i -> w[i])
            END, ' ') AS text
          FROM pw CROSS JOIN pv),
       pe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding, label
              FROM embeddings),
       pemb AS (SELECT vec_id, embedding, label FROM pe
          UNION ALL
          SELECT $base + pe.vec_id * 10 + pv.v AS vec_id,
            list_transform(generate_series(1, len(embedding)), i ->
              CASE WHEN i <= pv.kd THEN embedding[i]
                   ELSE embedding[i] * 0 END) AS embedding,
            label
          FROM pe CROSS JOIN pv WHERE pe.vec_id < $nq),
       jrel AS (SELECT pw.doc_id AS query_id,
                  $base + pw.doc_id * 10 + pv.v AS doc_id,
                  CAST(4 - pv.v AS BIGINT) AS rel
                FROM pw CROSS JOIN pv)""",
      "pdocs", "pemb")
  }

  /** Nearest-centroid assignment CTE chain — the oracle mirror of
    * Sim.assignToCentroids, shared by emb_cluster_assign, dedup_semantic
    * and sim_knn_graph so the oracles can't drift. Yields
    * `a` = (vec_id, v, nrm, cluster, ccos). `kSql` is the centroid-count
    * expression: the fixed `Sim.nCentroids` for the standalone assignment
    * face, `scaledCentroidKSql` (the corpus-derived `nCentroidsFor`
    * mirror) for the two all-pairs faces.
    */
  private def scaledCentroidKSql(src: String = "embeddings"): String =
    s"(SELECT greatest(${Sim.nCentroids}, CAST(ceil(count(*) / " +
      s"${Sim.centroidTargetPop}.0) AS BIGINT)) FROM $src)"

  private def centroidAssignCtes(src: String = "embeddings",
      kSql: String = graft.operators.Sim.nCentroids.toString): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       c AS (SELECT vec_id AS cluster, v AS cv, nrm AS cn FROM n
             WHERE vec_id < $kSql),
       p AS (SELECT n.vec_id, n.v, n.nrm, c.cluster,
               list_dot_product(n.v, c.cv) / (n.nrm * c.cn) AS ccos
             FROM n CROSS JOIN c),
       r AS (SELECT vec_id, v, nrm, cluster, ccos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY ccos DESC, cluster) AS rk
             FROM p),
       a AS (SELECT vec_id, v, nrm, cluster, ccos FROM r WHERE rk = 1)"""

  /** The TWO-STAGE mirror of `Sim.assignToCentroids`' corpus-derived
    * branch (graft_centroid_best + Sim.centroidSuperCount), used by the
    * two faces whose centroid count scales with the corpus. Same `a`
    * shape as `centroidAssignCtes`. The super count replays
    * `centroidSuperCount` integer-exactly: g = 1 at or below the
    * two-stage threshold (one cell holding every centroid ⇒ the chain
    * COLLAPSES to the flat argmax, which is why every oracle-SF corpus
    * hashes identically to the r12 chain), else floor(sqrt(m)) with an
    * integer fix-up — never a bare float ceil, whose last-ulp behavior
    * at a perfect square could differ between engines. Supers = the
    * first g positions; a super owns its own cell, every other centroid
    * ranks the supers by (ccos DESC, super pos) and joins the winner's
    * cell; stage 1 ranks the supers the same way per vector and keeps
    * the top `centroidRouteProbes` cells (IVF nprobe); stage 2 ranks
    * within the union of the routed cells by (ccos DESC, cluster) —
    * the first-kept strict-greater loops of the native expression
    * (cells partition the centroids, so the union join can never
    * duplicate a candidate row).
    */
  private def centroidAssignTwoStageCtes(src: String = "embeddings",
      kSql: String = scaledCentroidKSql()): String = {
    val fs = "CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)"
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       c0 AS (SELECT vec_id AS cluster, v AS cv, nrm AS cn,
                row_number() OVER (ORDER BY vec_id) - 1 AS pos
              FROM n WHERE vec_id < $kSql),
       prm AS (SELECT CASE WHEN count(*) <= ${graft.operators.Sim.twoStageMinCentroids}
                    THEN CAST(1 AS BIGINT)
                    ELSE CASE WHEN $fs * $fs >= count(*) THEN $fs ELSE $fs + 1 END
                  END AS g
               FROM c0),
       sup AS (SELECT c0.pos AS spos, c0.cv AS scv, c0.cn AS scn
               FROM c0, prm WHERE c0.pos < prm.g),
       ca AS (SELECT c0.pos, sup.spos,
                row_number() OVER (PARTITION BY c0.pos
                  ORDER BY list_dot_product(c0.cv, sup.scv) / (c0.cn * sup.scn) DESC,
                           sup.spos) AS rk
              FROM c0 CROSS JOIN sup, prm WHERE c0.pos >= prm.g),
       cm AS (SELECT c0.cluster, c0.cv, c0.cn, ca.spos AS cell
              FROM c0 JOIN ca ON c0.pos = ca.pos AND ca.rk = 1
              UNION ALL
              SELECT c0.cluster, c0.cv, c0.cn, c0.pos AS cell
              FROM c0, prm WHERE c0.pos < prm.g),
       s1 AS (SELECT n.vec_id, sup.spos AS cell,
                row_number() OVER (PARTITION BY n.vec_id
                  ORDER BY list_dot_product(n.v, sup.scv) / (n.nrm * sup.scn) DESC,
                           sup.spos) AS rk
              FROM n CROSS JOIN sup),
       g1 AS (SELECT vec_id, cell FROM s1
              WHERE rk <= ${graft.operators.Sim.centroidRouteProbes}),
       p AS (SELECT n.vec_id, n.v, n.nrm, cm.cluster,
               list_dot_product(n.v, cm.cv) / (n.nrm * cm.cn) AS ccos
             FROM n JOIN g1 ON n.vec_id = g1.vec_id JOIN cm ON cm.cell = g1.cell),
       r AS (SELECT vec_id, v, nrm, cluster, ccos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY ccos DESC, cluster) AS rk
             FROM p),
       a AS (SELECT vec_id, v, nrm, cluster, ccos FROM r WHERE rk = 1)"""
  }

  /** The banded near-pair CTE tail shared by the dedup_simhash and
    * mm_phash_dedup oracles — SQL mirror of `Dedup.bandedNearCandidates`
    * (4 primary bands; buckets above the occupancy ceiling refined by 4
    * sub-bands over the complementary bits; see the helper's contract
    * for the preserved hamming-≤3 pigeonhole guarantee). Emits CTEs
    * `bands` … `near`, where `near` = DISTINCT (da, db, sa, sb) with
    * da < db. `docsRel` must provide (doc_id, `hashCol`).
    */
  private def bandedNearSql(docsRel: String, hashCol: String,
      totalBits: Int): String = {
    val cap = graft.operators.Dedup.bandBucketCap
    val bandBits = totalBits / 4
    val bandMask = (1L << bandBits) - 1
    val subBits = (totalBits - bandBits + 3) / 4
    val subMask = (1L << subBits) - 1
    s"""bands AS MATERIALIZED (SELECT doc_id, $hashCol AS h, band,
             ($hashCol >> (band * $bandBits)) & $bandMask AS band_val
           FROM $docsRel, (SELECT unnest([0, 1, 2, 3]) AS band)),
       bp AS (SELECT band, band_val, count(*) AS bn
              FROM bands GROUP BY band, band_val),
       bx AS (SELECT bands.*, bp.bn FROM bands JOIN bp USING (band, band_val)),
       coldp AS (SELECT a.doc_id AS da, b.doc_id AS db, a.h AS sa, b.h AS sb
                 FROM bx a JOIN bx b ON a.band = b.band
                   AND a.band_val = b.band_val AND a.doc_id < b.doc_id
                 WHERE a.bn <= $cap),
       hotb AS (SELECT doc_id, h, band, band_val,
                  (h & ((CAST(1 AS BIGINT) << (band * $bandBits)) - 1))
                    | ((h >> ((band + 1) * $bandBits)) << (band * $bandBits)) AS comp
                FROM bx WHERE bn > $cap),
       hots AS (SELECT doc_id, h, band, band_val, sub,
                  (comp >> (sub * $subBits)) & $subMask AS sub_val
                FROM hotb, (SELECT unnest([0, 1, 2, 3]) AS sub)),
       hotp AS (SELECT a.doc_id AS da, b.doc_id AS db, a.h AS sa, b.h AS sb
                FROM hots a JOIN hots b ON a.band = b.band
                  AND a.band_val = b.band_val AND a.sub = b.sub
                  AND a.sub_val = b.sub_val AND a.doc_id < b.doc_id),
       near AS (SELECT DISTINCT da, db, sa, sb FROM
                  (SELECT * FROM coldp UNION ALL SELECT * FROM hotp))"""
  }

  /** dHash bit-sum SQL, generated from the SAME grid geometry as
    * `Multimodal.dhash56`: sample point (r, c) reads the padded text's
    * character code (the raster byte — the corpus is ASCII) at pixel
    * (r·(h−1) div (rows−1), c·(w−1) div (cols−1)); bit r·8+c is set iff
    * the left sample exceeds its right neighbor. Integral `//` throughout
    * so both engines agree on every sample index.
    */
  private def dhashSql: String = {
    val rows = Multimodal.dhashRows
    val cols = Multimodal.dhashCols
    def cell(r: Int, c: Int) =
      s"ord(substring(padded, (($r * (h - 1)) // ${rows - 1}) * w" +
        s" + (($c * (w - 1)) // ${cols - 1}) + 1, 1))"
    (for { r <- 0 until rows; c <- 0 until cols - 1 } yield
      s"(CASE WHEN ${cell(r, c)} > ${cell(r, c + 1)}" +
        s" THEN ${1L << (r * (cols - 1) + c)} ELSE 0 END)")
      .mkString("\n             + ")
  }

  /** PQ-encoding CTE chain — the oracle mirror of Sim.pqEncode's
    * argmin-L2 sub-centroid assignment, shared by emb_pq_encode and
    * sim_ann_pq_adc so the two oracles can't drift. Yields
    * `e` = (vec_id, v), `c` = (code, cv), `b` = (vec_id, m, code, dist).
    */
  /** The encode chain body with a CTE-name prefix, so it can compose with
    * other chains (the centroid CTEs also use c/p/r) in one WITH. The
    * caller must already have defined `e` = (vec_id, v).
    */
  private def pqEncodeChain(px: String): String = {
    val (m, sd, k) = (Sim.pqM, Sim.pqSubDim, Sim.pqK)
    s"""${px}c AS (SELECT vec_id AS code, v AS cv FROM e WHERE vec_id < $k),
       ${px}p AS (SELECT e.vec_id, ${px}c.code, m.m,
               list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                 i -> (e.v[m.m*$sd+i] - ${px}c.cv[m.m*$sd+i])
                      * (e.v[m.m*$sd+i] - ${px}c.cv[m.m*$sd+i]))),
                 (a, b) -> a + b) AS dist
             FROM e CROSS JOIN ${px}c
               CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) m),
       ${px}r AS (SELECT vec_id, m, code, dist, row_number() OVER (
               PARTITION BY vec_id, m ORDER BY dist, code) AS rk FROM ${px}p),
       ${px}b AS MATERIALIZED (SELECT vec_id, m, code, dist FROM ${px}r WHERE rk = 1)"""
  }

  private val pqEncodeCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       ${pqEncodeChain("")}"""

  /** Per-inverted-list readback stats over the shared assignment + encode
    * chains — the sink_vector_index oracle; the compaction face passes
    * the live-vectors filter.
    */
  private def vectorIndexStatsSql(where: String): String =
    s"""WITH ${centroidAssignCtes()},
       ${pqEncodeChain("q")},
       ck AS (SELECT vec_id, array_to_string(list(code ORDER BY m), ':') AS ck
              FROM qb GROUP BY vec_id)
       SELECT a.cluster, count(*) AS n_vecs,
         count(DISTINCT ck.ck) AS n_code_cells
       FROM a JOIN ck USING (vec_id)
       $where
       GROUP BY a.cluster ORDER BY a.cluster"""

  /** Residual-PQ CTE chain (composes after `centroidAssignCtes` — uses
    * its `a`, `c`, `e`): `res` = (vec_id, cluster, rv), `rb` = the
    * residual codebook (code, bv), `rbb` = (vec_id, m, code, dist) —
    * shared by emb_pq_residual and sim_ann_ivfpq_residual so the encode
    * the search scans is the encode the encoder emits.
    */
  private val pqResidualCtes: String = {
    val (m, sd, k) = (Sim.pqM, Sim.pqSubDim, Sim.pqK)
    val nc = Sim.nCentroids
    s"""res AS MATERIALIZED (SELECT a.vec_id, a.cluster,
             list_transform(generate_series(1, ${Sim.expectedDims}),
               i -> a.v[i] - c.cv[i]) AS rv
           FROM a JOIN c ON a.cluster = c.cluster),
       rb AS (SELECT vec_id AS code, rv AS bv FROM res
              WHERE vec_id >= $nc AND vec_id < ${nc + k}),
       rp AS (SELECT res.vec_id, rb.code, m.m,
               list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                 i -> (res.rv[m.m*$sd+i] - rb.bv[m.m*$sd+i])
                      * (res.rv[m.m*$sd+i] - rb.bv[m.m*$sd+i]))),
                 (x, y) -> x + y) AS dist
             FROM res CROSS JOIN rb
               CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) m),
       rr AS (SELECT vec_id, m, code, dist, row_number() OVER (
               PARTITION BY vec_id, m ORDER BY dist, code) AS rk FROM rp),
       rbb AS MATERIALIZED (SELECT vec_id, m, code, dist FROM rr WHERE rk = 1)"""
  }

  /** Transitive dup-group CTE chain — the oracle mirror of
    * Dedup.dupGroups' fixpoint as a recursive transitive closure, shared
    * by dedup_groups and dedup_keep_best so the two oracles can't drift.
    * Yields `d` = (doc_id, w), `lbl` = (doc_id, group_id), `sz` =
    * (group_id, group_size).
    */
  /** The BM25 postings CTE chain (tokenize + per-(doc, term) tf) — ONE
    * builder for the retrieval oracle and the persisted-index oracle, so
    * the two cannot drift on tokenization. A WITH-free fragment so the
    * hybrid-retrieval oracle can compose it beside the cosine chain.
    */
  private def bm25PostingsCtes(src: String = "documents"): String =
    s"""d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                   FROM $src),
       tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM
                (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d)
              GROUP BY 1, 2, 3)"""

  /** The BM25 FULL-ranking CTE chain — postings → matched-postings df →
    * micro-unit integer contributions → per-(query, doc) sum → rank.
    * ONE builder (ending in `lxr` = query_id, doc_id, rank, n_terms,
    * score_q6, NO rank cut) shared by the text_bm25_topk oracle and the
    * hybrid-retrieval lexical leg, so the two cannot drift on scoring.
    */
  private def bm25RankCtes(src: String = "documents"): String = {
    val k1 = TrainData.bm25K1
    val k1p1 = TrainData.bm25K1 + 1.0
    val b = TrainData.bm25B
    val b1 = 1.0 - TrainData.bm25B
    s"""${bm25PostingsCtes(src)},
       sc AS (SELECT count(*) AS n_docs, sum(len(w)) AS sum_dl FROM d),
       qt AS (SELECT DISTINCT term FROM tf
              WHERE doc_id < ${TrainData.bm25NQueries}),
       tfq AS MATERIALIZED (SELECT tf.* FROM tf JOIN qt USING (term)),
       dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
       q AS (SELECT doc_id AS query_id, term FROM tfq
             WHERE doc_id < ${TrainData.bm25NQueries}),
       c0 AS (SELECT q.query_id, tfq.doc_id,
                CAST(n_docs - df AS DOUBLE) + 0.5 AS idf_n,
                CAST(df AS DOUBLE) + 0.5 AS idf_d,
                CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs) AS dl_ratio,
                CAST(tf AS DOUBLE) AS tfd
              FROM tfq JOIN q USING (term) JOIN dfq USING (term), sc
              WHERE tfq.doc_id <> q.query_id),
       c AS (SELECT query_id, doc_id,
               CAST(floor((idf_n / idf_d)
                 * (tfd * $k1p1 / (tfd + $k1 * ($b1 + $b * dl_ratio)))
                 * 1000000.0) AS BIGINT) AS c_q6
             FROM c0),
       s AS (SELECT query_id, doc_id, CAST(sum(c_q6) AS BIGINT) AS score_q6,
               count(*) AS n_terms
             FROM c GROUP BY 1, 2),
       lxr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score_q6 DESC, doc_id) AS rank FROM s)"""
  }

  /** The RRF fusion tail — ONE SQL builder for both hybrid oracles (the
    * rrfFuse discipline on the oracle side): takes the two leg CTE bodies
    * (each yielding query_id, doc_id, {lex,vec}_rank already cut to
    * rrfDepth) and emits the all-integer fusion + final select.
    */
  private def rrfFuseSql(lxCte: String, vxCte: String): String = {
    val (k, tk) = (TrainData.rrfK, TrainData.rrfTopK)
    s"""lx AS ($lxCte),
       vx AS ($vxCte),
       f AS (SELECT coalesce(lx.query_id, vx.query_id) AS query_id,
               coalesce(lx.doc_id, vx.doc_id) AS doc_id, lex_rank, vec_rank
             FROM lx FULL OUTER JOIN vx
               ON lx.query_id = vx.query_id AND lx.doc_id = vx.doc_id),
       g AS (SELECT query_id, doc_id, lex_rank, vec_rank,
               coalesce(1000000 // ($k + lex_rank), 0)
                 + coalesce(1000000 // ($k + vec_rank), 0) AS rrf_q6
             FROM f),
       rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_q6 DESC, doc_id) AS rank FROM g)
       SELECT query_id, doc_id, rank, lex_rank, vec_rank, rrf_q6
       FROM rr WHERE rank <= $tk ORDER BY query_id, rank"""
  }

  /** The stored-hybrid oracle: the SAME bm25 ranking CTEs as the in-plan
    * hybrid (stored == computed on the lexical leg is sink_text_index's
    * proven contract; fresh-df-served == in-plan is text_bm25_stored_
    * fresh's), vector leg = the SAME ivf-pq chain as sim_ann_ivfpq
    * (stored == computed is sink_vector_index's; upsert == build is
    * sink_vector_index_upsert's), fused by the SAME rrfFuseSql builder.
    * ONE string serves both the weekly-fresh and the mid-day faces.
    */
  private def hybridStoredSql: String =
    s"""WITH ${bm25RankCtes()},
       vk AS (WITH ${ivfPqAdcChain(filtered = false)}
              SELECT query_id, vec_id, rank FROM k
              WHERE query_id < ${TrainData.bm25NQueries}),
       ${rrfFuseSql(
         s"""SELECT query_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
            FROM lxr WHERE rank <= ${TrainData.rrfDepth}""",
         s"""SELECT query_id, vec_id AS doc_id,
              CAST(rank AS BIGINT) AS vec_rank
            FROM vk WHERE rank <= ${TrainData.rrfDepth}""")}"""

  /** The exact-cosine FULL-ranking CTE chain (ending in `cr` = query_id,
    * neighbor_id, rank, cos — NO rank cut), parameterized by the query
    * set size; CTE names prefixed `c` so the hybrid oracle can compose
    * it beside the BM25 chain. Shared by sim_ann_cosine_topk and the
    * hybrid-retrieval vector leg.
    */
  private def cosineRankCtes(nq: Long, src: String = "embeddings"): String =
    s"""ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ce),
       cq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM cn
              WHERE vec_id < $nq),
       cp AS (SELECT cq.query_id, cn.vec_id AS neighbor_id,
                list_dot_product(qv, v) / (qn * nrm) AS cos
              FROM cq JOIN cn ON cn.vec_id <> cq.query_id),
       cr AS (SELECT query_id, neighbor_id, cos,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank
              FROM cp)"""

  /** Per-bucket readback stats over the lexical postings — ONE builder
    * for the index build (`where` = "") and the compaction face (`where`
    * = the live-docs filter), sharing the postings CTEs with
    * text_bm25_topk so none of the three can drift on tokenization.
    */
  private def textIndexStatsSql(where: String): String =
    s"""WITH ${bm25PostingsCtes()},
       b AS (SELECT CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT)
               % ${TrainData.textIndexBuckets} AS bucket,
               term, doc_id, tf
             FROM tf $where)
       SELECT bucket, count(*) AS n_postings,
         count(DISTINCT term) AS n_terms,
         count(DISTINCT doc_id) AS n_docs,
         CAST(sum(tf) AS BIGINT) AS sum_tf
       FROM b GROUP BY 1 ORDER BY 1"""

  private def dupGroupsCtes(where: String = ""): String =
    s"""WITH RECURSIVE d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                   FROM documents $where),
       d3 AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
       s0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM d3),
       sh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s FROM s0),
       cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       j AS (SELECT da, db, CAST(shared AS DOUBLE) / (ca.c + cb.c - shared) AS jac
             FROM p JOIN cnt ca ON p.da = ca.doc_id JOIN cnt cb ON p.db = cb.doc_id),
       pairs AS (SELECT da, db FROM j WHERE jac >= ${operators.Dedup.jaccardTau}),
       e AS (SELECT da AS a, db AS b FROM pairs
             UNION SELECT db AS a, da AS b FROM pairs),
       reach AS (
         SELECT a, b FROM e
         UNION
         SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
       lbl AS (SELECT a AS doc_id, least(a, min(b)) AS group_id
               FROM reach GROUP BY a),
       sz AS (SELECT group_id, count(*) AS group_size FROM lbl GROUP BY 1)"""

  /** zgid-resolution CTE chain (shared by id_zgid_resolution and the
    * end-to-end pipeline oracles; `src` = the event source CTE — `raw` for
    * the Id-entry operators, the gate-passed set for the AllJob chain).
    */
  private def zgidCtes(src: String = "raw"): String =
    s"""ev AS MATERIALIZED (SELECT event_id, ts, appkey, did, cuid FROM $src WHERE appkey <> ''),
       ufd AS MATERIALIZED (SELECT appkey, cuid, did FROM (
         SELECT appkey, cuid, did,
           row_number() OVER (PARTITION BY appkey, cuid ORDER BY ts, event_id) AS rn
         FROM ev WHERE cuid IS NOT NULL AND did <> '') WHERE rn = 1),
       dfu AS MATERIALIZED (SELECT appkey, did, cuid AS first_cuid FROM (
         SELECT appkey, did, cuid,
           row_number() OVER (PARTITION BY appkey, did ORDER BY ts, event_id) AS rn
         FROM ev WHERE did <> '' AND cuid IS NOT NULL) WHERE rn = 1),
       uz0 AS (SELECT u.appkey, u.cuid,
           CASE WHEN f.first_cuid = u.cuid THEN concat('z:d:', u.appkey, ':', u.did)
                ELSE concat('z:u:', u.appkey, ':', u.cuid) END AS zgid
         FROM ufd u LEFT JOIN dfu f ON u.appkey = f.appkey AND u.did = f.did),
       uz AS MATERIALIZED (SELECT a.appkey, a.cuid,
           coalesce(z.zgid, concat('z:u:', a.appkey, ':', a.cuid)) AS u_zgid
         FROM (SELECT DISTINCT appkey, cuid FROM ev WHERE cuid IS NOT NULL) a
         LEFT JOIN uz0 z ON a.appkey = z.appkey AND a.cuid = z.cuid),
       dz AS MATERIALIZED (SELECT d.appkey, d.did,
           coalesce(z.u_zgid, concat('z:d:', d.appkey, ':', d.did)) AS d_zgid
         FROM (SELECT DISTINCT appkey, did FROM ev WHERE did <> '') d
         LEFT JOIN dfu f ON d.appkey = f.appkey AND d.did = f.did
         LEFT JOIN uz z ON f.appkey = z.appkey AND f.first_cuid = z.cuid)"""

  private val zgidSelect: String =
    """SELECT e.event_id,
         CASE WHEN e.cuid IS NOT NULL THEN u.u_zgid
              WHEN e.did <> '' THEN d.d_zgid
              ELSE NULL END AS zgid
       FROM ev e
       LEFT JOIN uz u ON e.appkey = u.appkey AND e.cuid = u.cuid
       LEFT JOIN dz d ON e.appkey = d.appkey AND e.did = d.did"""

  /** The basicSchema probe + error list as a CTE chain ending in `se`
    * (carries every raw column plus okj/schema_errors) — the DuckDB mirror
    * of Etl.withSchemaErrors, shared by etl_schema_check and
    * dq_full_chain.
    */
  private def schemaProbeCtes: String = {
    val duckPreds = Map(
      "DATA_NONE"    -> "j_data IS NULL",
      "DATA_DT_NONE" -> "j_data IS NOT NULL AND j_dt IS NULL",
      "DATA_PR_NONE" -> "j_data IS NOT NULL AND j_pr IS NULL",
      "SID_TYPE"     -> "j_sid IS NOT NULL AND try_cast(j_sid AS DOUBLE) IS NULL",
      "CT_TYPE"      -> "j_ct IS NOT NULL AND try_cast(j_ct AS DOUBLE) IS NULL",
      "TZ_NONE"      -> "j_tz IS NULL",
      "AK_NONE"      -> "j_ak IS NULL",
      "DEBUG_NONE"   -> "j_debug IS NULL",
      "DEBUG_TYPE"   -> "j_debug IS NOT NULL AND try_cast(j_debug AS BIGINT) IS NULL",
      "SLN_NONE"     -> "j_sln IS NULL",
      "OWNER_NONE"   -> "j_owner IS NULL",
      "PL_ENUM"      -> ("j_pl IS NULL OR j_pl NOT IN " +
        "('none','and','ios','js','wxa','server','harmonyos')"),
      "SDK_NONE"     -> "j_sdk IS NULL",
      "SDKV_NONE"    -> "j_sdkv IS NULL",
      "USR_NONE"     -> "j_usr IS NULL",
      "DID_NONE"     -> "j_did IS NULL OR length(j_did) < 1",
      "DID_LEN"      -> "j_did IS NOT NULL AND length(j_did) > 100",
      "UT_NONE"      -> "j_ut IS NULL",
      "IP_NONE"      -> "j_ip IS NULL",
      "UA_NONE"      -> "j_ua IS NULL")
    val cases = Etl.schemaMatrix
      .map { case (tag, _) => s"CASE WHEN ${duckPreds(tag)} THEN '$tag' END" }
      .mkString(", ")
    s"""sp AS (SELECT raw.*, json_valid(msg) AS okj,
           CASE WHEN json_valid(msg) THEN msg ELSE '{}' END AS jm
         FROM raw),
       sj AS (SELECT sp.*,
           jm::JSON->'data' AS j_data,
           jm::JSON->'data'->0->>'dt' AS j_dt,
           jm::JSON->'data'->0->'pr' AS j_pr,
           json_extract_string(jm, '$$.data[0].pr."$$sid"') AS j_sid,
           json_extract_string(jm, '$$.data[0].pr."$$ct"') AS j_ct,
           jm::JSON->>'tz' AS j_tz, jm::JSON->>'ak' AS j_ak,
           jm::JSON->>'debug' AS j_debug, jm::JSON->>'sln' AS j_sln,
           jm::JSON->>'owner' AS j_owner, jm::JSON->>'pl' AS j_pl,
           jm::JSON->>'sdk' AS j_sdk, jm::JSON->>'sdkv' AS j_sdkv,
           jm::JSON->'usr' AS j_usr, jm::JSON->'usr'->>'did' AS j_did,
           jm::JSON->>'ut' AS j_ut, jm::JSON->>'ip' AS j_ip,
           jm::JSON->>'ua' AS j_ua
         FROM sp),
       se AS (SELECT sj.*,
           CASE WHEN NOT okj THEN 'BASIC_SCHEMA_FORMAT_NOT_MATCH'
                ELSE concat_ws(',', $cases) END AS schema_errors
         FROM sj)"""
  }

  private def platformDimCte: String =
    "dim(pl, platform_id) AS (VALUES " +
      Route.platformDim.map { case (k, v) => s"('$k', $v)" }.mkString(", ") + ")"

  /** Admitted event_attr corpus + the DW rollup keys as a CTE chain ending
    * in `adm` (mirrors Dw.admitted) — shared by the three DW rollup
    * oracles so the admission rule can't drift between them.
    */
  /** The admitted-DW-corpus CTE body (`adm`) — expects `raw`, `zg`, `dev`
    * and `dim` already defined upstream, so it can ride either the
    * dedicated prefix below or the wider `eventAttrRowCtes` chain.
    */
  private def dwAdmittedBody: String =
    """adm AS MATERIALIZED (SELECT r.*, z.zgid, dv.zg_did,
           coalesce(d.platform_id, 0) AS platform,
           CAST(strftime(r.ts, '%Y%m%d') AS INT) AS begin_day_id,
           CAST(year(r.ts) * 100 + weekofyear(CAST(r.ts AS DATE)) AS INT) AS yearweek,
           CAST(strftime(r.ts, '%Y%m') AS INT) AS yearmonth
         FROM raw r
         JOIN zg z ON r.event_id = z.event_id
         JOIN dev dv ON r.appkey = dv.appkey AND r.did = dv.did
         LEFT JOIN dim d ON r.pl = d.pl
         WHERE r.dt IN ('evt','vtl','mkt','ss','se','abp')
           AND z.zgid IS NOT NULL AND r.did <> '')"""

  /** The t_user_join row set as a CTE (`ujoin`) over `adm`. */
  private def userJoinBody: String =
    """uj0 AS (SELECT *, row_number() OVER (PARTITION BY zgid
           ORDER BY ts, event_id) AS rn
         FROM adm),
       ujoin AS (SELECT zgid AS zg_id, zg_did AS device_id,
           epoch_ns(ts) // 1000000000 AS begin_date, begin_day_id,
           md5(concat_ws(':', appkey, CAST(event_id AS VARCHAR), dt)) AS uuid,
           yearweek, yearmonth, platform
         FROM uj0 WHERE rn = 1)"""

  private def dwAdmittedCtes: String =
    s"""${Envelope.oracleRaw},
       ${zgidCtes()},
       zg AS MATERIALIZED ($zgidSelect),
       $platformDimCte,
       $devMapCte,
       $dwAdmittedBody"""

  /** The t_user_detail row set (mirror of Dw.userDetail) as a CTE chain
    * ending in `udetail` — shared by dw_user_detail, dw_user_detail_sum
    * and the f_user_all composition so the profile surface cannot drift.
    */
  private def userDetailCtes: String =
    s"""$eventAttrRowCtes,
       dd AS (SELECT r.event_id, r.appkey, dv.zg_did,
           coalesce(d.platform_id, 0) AS pid,
           list_filter(string_split_regex(r.rs, '[^0-9]'), x -> x <> '') AS rs_runs,
           r.dev_brand, r.dev_model
         FROM raw r
         JOIN dev dv ON r.appkey = dv.appkey AND r.did = dv.did
         LEFT JOIN dim d ON r.pl = d.pl
         WHERE r.dt = 'pl' AND r.did <> '' AND r.appkey <> ''),
       dl AS (SELECT *, row_number() OVER (PARTITION BY appkey, zg_did
                ORDER BY event_id DESC) AS rn
              FROM dd),
       dcur AS (SELECT appkey, zg_did,
           CASE WHEN len(rs_runs) >= 2 THEN try_cast(rs_runs[1] AS INT) END AS current_l,
           CASE WHEN len(rs_runs) >= 2 THEN try_cast(rs_runs[2] AS INT) END AS current_h,
           CASE WHEN pid = 2 THEN 'Apple'
                WHEN dev_brand IS NULL OR dev_brand = '' THEN '\\N'
                ELSE dev_brand END AS cur_brand,
           CASE WHEN dev_model IS NULL OR dev_model = '' THEN '\\N'
                ELSE dev_model END AS cur_model
         FROM dl WHERE rn = 1),
       wf AS (SELECT *,
           row_number() OVER (PARTITION BY zgid
             ORDER BY begin_date, event_id) AS rn_f,
           row_number() OVER (PARTITION BY zgid
             ORDER BY begin_date DESC, event_id DESC) AS rn_l
         FROM ea),
       fst AS (SELECT zgid, app_version AS first_version,
           channel AS first_channel, website AS first_website,
           utm_source, utm_medium, utm_campaign, utm_content, utm_term,
           referrer_url AS first_referrer_url
         FROM wf WHERE rn_f = 1),
       lst AS (SELECT zgid, platform_id AS platform,
           string_split(zgid, ':')[3] AS appkey,
           app_version AS current_app_version,
           channel AS current_app_channel,
           country AS current_country, area AS current_area,
           city AS current_city,
           try_cast(mccmnc AS INT) AS current_mccmnc,
           bs AS current_bs, try_cast(bv AS INT) AS current_bv,
           os AS current_os,
           try_cast(string_split(ov, '.')[1] AS INT) AS current_ov,
           zg_did AS cur_did
         FROM wf WHERE rn_l = 1),
       ag AS (SELECT zgid,
           min(begin_date) AS first_visit_time,
           max(begin_date) AS last_visit_time,
           CAST(count(DISTINCT CASE WHEN zg_sid <> -1 THEN zg_sid END) AS INT)
             AS visit_times,
           CAST(sum(try_cast(duration AS BIGINT)) AS BIGINT) AS duration,
           max(CASE WHEN zg_uid <> '\\N' THEN 1 ELSE 0 END) AS is_registered
         FROM ea GROUP BY zgid),
       udetail AS MATERIALIZED (SELECT a.zgid AS zg_id, l.platform, a.first_visit_time,
           a.last_visit_time, a.visit_times, a.duration,
           f.first_version, f.first_channel,
           l.current_app_version, l.current_app_channel, f.first_website,
           f.utm_source, f.utm_medium, f.utm_campaign, f.utm_content,
           f.utm_term, f.first_referrer_url,
           l.current_country, l.current_area, l.current_city,
           l.current_mccmnc, l.current_bs, l.current_bv, l.current_os,
           l.current_ov, dc.current_l, dc.current_h,
           coalesce(dc.cur_brand, '\\N') AS current_device_brand,
           coalesce(dc.cur_model, '\\N') AS current_device_model,
           a.is_registered, '\\N' AS attr1, '\\N' AS attr2, '\\N' AS attr3,
           '\\N' AS attr4, '\\N' AS attr5
         FROM ag a
         JOIN fst f ON a.zgid = f.zgid
         JOIN lst l ON a.zgid = l.zgid
         LEFT JOIN dcur dc ON l.appkey = dc.appkey AND l.cur_did = dc.zg_did)"""

  /** The b_user row set (mirror of Route.routeUserRow) as a CTE chain
    * ending in `burow` — shared by route_user_row and the b_user_anonymous
    * view oracle.
    */
  private def userRowCtes: String =
    s"""${Envelope.oracleRaw},
       ${Envelope.appRegistryOracle},
       ${zgidCtes()},
       zg AS MATERIALIZED ($zgidSelect),
       $platformDimCte,
       $devMapCte,
       $usrMapCte,
       burow AS (SELECT r.event_id, ar.app_id, z.zgid, dv.zg_did,
           coalesce(CAST(u.zg_uid AS VARCHAR), '\\N') AS user_id,
           epoch_ns(r.ts) // 1000000000 AS begin_date,
           coalesce(d.platform_id, 0) AS platform_id
         FROM raw r
         JOIN zg z ON r.event_id = z.event_id
         JOIN reg ar ON r.appkey = ar.appkey
         JOIN dev dv ON r.appkey = dv.appkey AND r.did = dv.did
         LEFT JOIN usrm u ON r.appkey = u.appkey AND r.cuid = u.cuid
         LEFT JOIN dim d ON r.pl = d.pl
         WHERE r.dt = 'zgid' AND r.did <> '' AND z.zgid IS NOT NULL
           AND try_cast(r.tzms AS BIGINT) IS NOT NULL
           AND abs(try_cast(r.tzms AS BIGINT)) <= ${Route.tzRangeMs})"""

  /** The full event_attr row (mirror of Route.routeEventAttr) as a CTE
    * chain ending in `ea` — shared by the route_event_attr oracle and the
    * dw_user_detail rollup oracle so the row surface cannot drift.
    */
  private def eventAttrRowCtes: String = {
      val nets = Route.networkDim.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      val geoCountry = operators.Enrich.geoBlocks
        .map { case (o, c, _, _) => s"WHEN $o THEN '$c'" }.mkString(" ")
      val geoProv = operators.Enrich.geoBlocks
        .map { case (o, _, p, _) => s"WHEN $o THEN '$p'" }.mkString(" ")
      val geoCity = operators.Enrich.geoBlocks
        .map { case (o, _, _, c) => s"WHEN $o THEN '$c'" }.mkString(" ")
      val reserved = Derive.mktAbpReservedAttrs.map(s => s"'$s'").mkString(", ")
      val cusSel = (1 to Derive.customColumns).map(i =>
        s"CASE WHEN ci.col_index = $i THEN r.cus_val ELSE '\\N' END AS cus$i").mkString(", ")
      val ptSel = (1 to Derive.customColumns).map(i =>
        s"CASE WHEN ci.col_index = $i THEN r.cus_type ELSE '\\N' END AS pt$i").mkString(", ")
      s"""${Envelope.oracleRaw},
         ${Envelope.appRegistryOracle},
         ${zgidCtes()},
         zg AS MATERIALIZED ($zgidSelect),
         $platformDimCte,
         netd(net, network_id) AS (VALUES $nets),
         $devMapCte,
         $usrMapCte,
         ereg AS (SELECT appkey, event_type,
             dense_rank() OVER (PARTITION BY appkey ORDER BY fts, event_type) AS eid
           FROM (SELECT appkey, event_type, min(ts) AS fts
                 FROM raw WHERE appkey <> '' GROUP BY 1, 2)),
         cidx0 AS (SELECT appkey, event_type, cus_key,
             dense_rank() OVER (PARTITION BY appkey, event_type
               ORDER BY fts, cus_key) AS col_index
           FROM (SELECT appkey, event_type, cus_key, min(ts) AS fts
                 FROM raw
                 WHERE appkey <> '' AND ((dt = 'evt' AND starts_with(cus_key, '_'))
                   OR (dt IN ('mkt', 'abp') AND NOT starts_with(cus_key, '$$')
                       AND cus_key NOT IN ($reserved)))
                 GROUP BY 1, 2, 3)),
         cidx AS (SELECT * FROM cidx0 WHERE col_index <= ${Derive.customColumns}),
         ea AS MATERIALIZED (SELECT r.event_id,
           z.zgid,
           coalesce(try_cast(r.sid_raw AS BIGINT), -1) AS zg_sid,
           md5(concat_ws(':', r.appkey, CAST(r.event_id AS VARCHAR), r.dt)) AS uuid,
           CASE r.dt WHEN 'ss' THEN -1 WHEN 'se' THEN -2 ELSE g.eid END AS eid,
           strftime(r.ts, '%Y%m%d') AS day_id,
           epoch_ns(r.ts) // 1000000000 AS begin_date,
           concat(strftime(r.ts, '%H'), '0', strftime(r.ts, '%M')) AS time_id,
           concat(strftime(r.ts, '%Y'), '-',
             lpad(cast(weekofyear(CAST(r.ts AS DATE)) AS string), 2, '0')) AS year_week,
           dv.zg_did,
           coalesce(CAST(u.zg_uid AS VARCHAR), '\\N') AS zg_uid,
           CASE r.dt WHEN 'ss' THEN 'st' WHEN 'se' THEN 'se'
             ELSE r.event_type END AS event_name,
           coalesce(d.platform_id, 0) AS platform_id,
           coalesce(nd.network_id, 0) AS network_id,
           CASE WHEN r.cr = '' OR r.cr = 'null' THEN '\\N'
                WHEN length(r.cr) > 6 OR NOT regexp_full_match(r.cr, '[0-9]*') THEN '\\N'
                ELSE r.cr END AS mccmnc,
           r.ua AS useragent,
           CASE r.event_id % 7 WHEN 0 THEN 'www.baidu.com' WHEN 1 THEN 'www.google.com'
             WHEN 2 THEN 'www.sogou.com' WHEN 3 THEN 'cn.bing.com'
             WHEN 4 THEN 'news.example.com' WHEN 5 THEN 'www.baidu.com'
             ELSE '\\N' END AS website,
           r.url AS current_url,
           CASE WHEN r.referrer = '' THEN '\\N' ELSE r.referrer END AS referrer_url,
           CASE WHEN r.cn = '' THEN '\\N' ELSE r.cn END AS channel,
           CASE WHEN r.vn = '' THEN '\\N' ELSE r.vn END AS app_version,
           CAST(string_split(r.ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(r.ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(r.ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(r.ip, '.')[4] AS BIGINT) AS ip,
           r.ip AS ip_str,
           CASE WHEN r.event_id % 11 <= 3 THEN '\\N'
             ELSE CASE r.user_id % 8 $geoCountry END END AS country,
           CASE WHEN r.event_id % 11 <= 3 THEN '\\N'
             ELSE CASE r.user_id % 8 $geoProv END END AS area,
           CASE WHEN r.event_id % 11 <= 3 THEN '\\N'
             ELSE CASE r.user_id % 8 $geoCity END END AS city,
           ${uaCase(_._1, "r.event_id")} AS os,
           ${uaCase(_._2, "r.event_id")} AS ov,
           ${uaCase(_._3, "r.event_id")} AS bs,
           ${uaCase(_._4, "r.event_id")} AS bv,
           CASE WHEN r.event_id % 3 = 0 THEN 'wechat'
             WHEN r.event_id % 7 = 0 THEN 'www.baidu.com'
             WHEN r.event_id % 7 = 1 THEN 'www.google.com'
             WHEN r.event_id % 7 = 2 THEN 'www.sogou.com'
             WHEN r.event_id % 7 = 3 THEN 'cn.bing.com'
             WHEN r.event_id % 7 = 4 THEN 'news.example.com'
             WHEN r.event_id % 7 = 5 THEN 'www.baidu.com'
             ELSE '\\N' END AS utm_source,
           CASE WHEN r.event_id % 3 = 0 THEN 'cpc'
             WHEN r.event_id % 7 IN (0,1,2,3,5) THEN '搜索自然流量'
             WHEN r.event_id % 7 = 4 THEN '引荐'
             ELSE '\\N' END AS utm_medium,
           CASE WHEN r.event_id % 3 = 0 THEN 'spring' ELSE '\\N' END AS utm_campaign,
           '\\N' AS utm_content,
           CASE r.event_id % 7 WHEN 0 THEN 'spark etl' WHEN 1 THEN 'zhuge analytics'
             WHEN 2 THEN 'graft engine' WHEN 3 THEN 'etl'
             ELSE '\\N' END AS utm_term,
           CASE WHEN try_cast(r.dru AS INTEGER) IS NOT NULL
                 AND try_cast(r.dru AS INTEGER) BETWEEN 0 AND 86400000
             THEN r.dru ELSE '0' END AS duration,
           coalesce(ar.business, '\\N') AS attr1,
           CASE WHEN r.wxeid = '' THEN '\\N' ELSE r.wxeid END AS attr2,
           '\\N' AS attr3,
           '\\N' AS attr4,
           concat(z.zgid, '_',
             CAST(coalesce(try_cast(r.sid_raw AS BIGINT), -1) AS VARCHAR)) AS attr5,
           $cusSel, $ptSel
         FROM raw r
         JOIN zg z ON r.event_id = z.event_id
         JOIN ereg g ON r.appkey = g.appkey AND r.event_type = g.event_type
         LEFT JOIN dev dv ON r.appkey = dv.appkey AND r.did = dv.did
         LEFT JOIN usrm u ON r.appkey = u.appkey AND r.cuid = u.cuid
         LEFT JOIN dim d ON r.pl = d.pl
         LEFT JOIN netd nd ON r.net = nd.net
         LEFT JOIN cidx ci ON r.appkey = ci.appkey AND r.event_type = ci.event_type
           AND r.cus_key = ci.cus_key
         LEFT JOIN reg ar ON r.appkey = ar.appkey
         WHERE r.dt IN ('evt','vtl','mkt','ss','se','abp')
           AND z.zgid IS NOT NULL AND r.did <> '')"""
  }

  /** Surrogate device-id map CTE (mirrors Identity.deviceMap) — ONE copy
    * shared by every row-build oracle so an ordering change can't drift.
    */
  private def devMapCte: String =
    """dev AS MATERIALIZED (SELECT appkey, did,
         dense_rank() OVER (PARTITION BY appkey ORDER BY did) AS zg_did
       FROM (SELECT DISTINCT appkey, did FROM raw WHERE appkey <> '' AND did <> ''))"""

  /** Surrogate user-id map CTE (mirrors Identity.userMap). */
  private def usrMapCte: String =
    """usrm AS MATERIALIZED (SELECT appkey, cuid,
         dense_rank() OVER (PARTITION BY appkey ORDER BY cuid) AS zg_uid
       FROM (SELECT DISTINCT appkey, cuid FROM raw WHERE appkey <> '' AND cuid IS NOT NULL))"""

  /** DevicePropertyParser CTE chain over `src` (ends in `dp2` carrying
    * src.* + lb/sm/sb/cat) — shared by derive_device_property_full and the
    * route_device_row oracle.
    */
  private def devPropCtes(src: String): String = {
    val brandChain = operators.Derive.brandMapping
      .map { case (k, v) => s"WHEN contains(lb, '$k') THEN '$v'" }.mkString(" ")
    def anyKw(c: String, kws: Seq[String]) =
      kws.map(k => s"contains(upper($c), '$k')").mkString("(", " OR ", ")")
    val fold = anyKw("sm", operators.Derive.foldableKeywords)
    val flag = anyKw("sm", operators.Derive.flagshipKeywords)
    s"""dp0 AS (SELECT *, lower(trim(dev_brand)) AS lb,
           regexp_replace(regexp_replace(trim(dev_model), '\\s+', ' ', 'g'),
             '[^a-zA-Z0-9 +\\-]', '', 'g') AS sm
         FROM $src),
       dp1 AS (SELECT *, CASE $brandChain
           ELSE concat(upper(substr(dev_brand, 1, 1)), lower(substr(dev_brand, 2))) END AS sb
         FROM dp0),
       dp2 AS (SELECT *,
           CASE WHEN $fold THEN 'Foldable'
                WHEN $flag THEN 'Flagship'
                WHEN sb = 'Apple' THEN
                  CASE WHEN contains(upper(sm), 'SE') THEN 'Entry-level' ELSE 'Mid-range' END
                WHEN sb = 'Redmi' THEN
                  CASE WHEN contains(upper(sm), 'K') OR contains(upper(sm), 'NOTE')
                       THEN 'Mid-range' ELSE 'Entry-level' END
                ELSE 'Mid-range' END AS cat
         FROM dp1)"""
  }

  /** The full user-property row set as a CTE chain ending in `uprows`
    * (mirrors Route.routeUserPropRow) — shared by route_user_prop_row and
    * the UNIQUE KEY merge-on-write sink oracle.
    */
  private def userPropRowCtes: String = {
    val bl = operators.Derive.userPropBlacklist.map(s => s"'$s'").mkString(", ")
    s"""${Envelope.oracleRaw},
       ${Envelope.appRegistryOracle},
       ${zgidCtes()},
       zg AS MATERIALIZED ($zgidSelect),
       $platformDimCte,
       $usrMapCte,
       upreg AS (SELECT appkey, prop_key,
           dense_rank() OVER (PARTITION BY appkey ORDER BY first_ts, prop_key) AS prop_id
         FROM (SELECT appkey, upper(concat('p', cast(user_id % 7 AS string))) AS prop_key,
                 min(ts) AS first_ts
               FROM raw
               WHERE dt = 'usr' AND cuid IS NOT NULL AND appkey <> ''
                 AND concat('p', cast(user_id % 7 AS string)) NOT IN ($bl)
               GROUP BY 1, 2)),
       base AS MATERIALIZED (SELECT r.*, ar.app_id, z.zgid, u.zg_uid,
           coalesce(d.platform_id, 0) AS pid,
           epoch_ns(r.ts) // 1000000000 AS lu,
           concat('p', cast(r.user_id % 7 AS string)) AS pn
         FROM raw r
         JOIN zg z ON r.event_id = z.event_id
         JOIN reg ar ON r.appkey = ar.appkey
         JOIN usrm u ON r.appkey = u.appkey AND r.cuid = u.cuid
         LEFT JOIN dim d ON r.pl = d.pl
         WHERE r.dt = 'usr' AND r.cuid IS NOT NULL AND r.appkey <> ''
           AND try_cast(r.tzms AS BIGINT) IS NOT NULL
           AND abs(try_cast(r.tzms AS BIGINT)) <= ${Route.tzRangeMs}
           AND z.zgid IS NOT NULL),
       uprows AS (
         SELECT b.event_id, b.app_id, b.zgid,
           CAST(b.zg_uid AS VARCHAR) AS user_id,
           CAST(g.prop_id AS VARCHAR) AS prop_id,
           b.pn AS prop_name, b.cus_type AS prop_type,
           b.cus_val AS prop_value, b.pid AS platform_id, b.lu AS last_update
         FROM base b JOIN upreg g ON b.appkey = g.appkey AND upper(b.pn) = g.prop_key
         UNION ALL
         SELECT event_id, app_id, zgid, CAST(zg_uid AS VARCHAR),
           '-1', 'app_user_id', 'string', cuid, pid, lu
         FROM base)"""
  }

  /** The seven parsed device-property output columns over `dp2`. */
  private def devPropSelect: String = {
    val foldRaw = operators.Derive.foldableKeywords
      .map(k => s"contains(upper(dev_model), '$k')").mkString("(", " OR ", ")")
    s"""CASE WHEN trim(dev_brand) = '' THEN 'UNKNOWN' ELSE sb END AS std_brand,
       CASE WHEN trim(dev_brand) = '' THEN '' ELSE sm END AS std_model,
       CASE WHEN trim(dev_brand) = '' THEN 'UNKNOWN' ELSE cat END AS category,
       CASE WHEN trim(dev_brand) = '' THEN 'UNKNOWN'
            WHEN cat IN ('Foldable','Flagship') THEN 'Premium'
            WHEN cat = 'Entry-level' THEN 'Budget'
            WHEN sb = 'Apple' THEN 'Premium'
            WHEN sb IN ('Redmi','Realme') THEN 'Budget'
            ELSE 'Mid' END AS price_range,
       CASE WHEN trim(dev_brand) = '' THEN false
            ELSE regexp_matches(dev_model, '(?i)5G|全网通') END AS is_5g,
       CASE WHEN trim(dev_brand) = '' THEN false ELSE $foldRaw END AS is_foldable,
       CASE WHEN trim(dev_brand) = '' THEN ''
            ELSE regexp_extract(sm, '(20[12][0-9])', 1) END AS release_year"""
  }

  /** The Dw event_attr row build (mirrors Pipeline.eventAttr's projection)
    * over `src` — `raw` for pipeline_event_attr, the gate-passed CTE for
    * pipeline_all_job. Expects `zg` and `dim` CTEs in scope.
    */
  private def eventAttrSelect(src: String): String =
    s"""SELECT r.event_id,
         coalesce(z.zgid, '\\N') AS zgid,
         coalesce(try_cast(r.sid_raw AS BIGINT), -1) AS zg_sid,
         strftime(r.ts, '%Y%m%d') AS day_id,
         epoch_ns(r.ts) // 1000000000 AS begin_date,
         coalesce(d.platform_id, 0) AS platform_id,
         r.event_type AS event_name,
         ${uaCase(_._1, "r.event_id")} AS os,
         ${uaCase(_._3, "r.event_id")} AS browser,
         CASE WHEN r.event_id % 3 = 0 THEN 'wechat'
           WHEN r.event_id % 7 = 0 THEN 'www.baidu.com'
           WHEN r.event_id % 7 = 1 THEN 'www.google.com'
           WHEN r.event_id % 7 = 2 THEN 'www.sogou.com'
           WHEN r.event_id % 7 = 3 THEN 'cn.bing.com'
           WHEN r.event_id % 7 = 4 THEN 'news.example.com'
           WHEN r.event_id % 7 = 5 THEN 'www.baidu.com'
           ELSE '\\N' END AS utm_source,
         CASE WHEN r.event_id % 3 = 0 THEN 'cpc'
           WHEN r.event_id % 7 IN (0,1,2,3,5) THEN '搜索自然流量'
           WHEN r.event_id % 7 = 4 THEN '引荐'
           ELSE '\\N' END AS utm_medium
       FROM $src r
       LEFT JOIN zg z ON r.event_id = z.event_id
       LEFT JOIN dim d ON r.pl = d.pl
       WHERE r.dt IN ('evt','vtl','mkt','ss','se','abp')
       ORDER BY r.event_id"""

  /** DuckDB-runnable oracle SQL per query (same parquet tables, same column
    * aliases, same ordering).
    */
  def oracleSql: Map[String, String] = Map(
    "etl_owner_normalize" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT owner_raw,
           CASE WHEN owner_raw IN ('zg_adp','zg_mkt','zg_cdp') THEN owner_raw ELSE 'zg' END AS owner,
           count(*) AS n
         FROM raw GROUP BY 1, 2 ORDER BY owner_raw""",
    "etl_json_validate" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT event_id,
           CASE WHEN json_valid(raw_props) THEN 0 ELSE -1 END AS result,
           CASE WHEN json_valid(raw_props) THEN NULL ELSE 1020002 END AS error_code
         FROM raw ORDER BY event_id""",
    "etl_schema_check" ->
      s"""WITH ${Envelope.oracleRaw},
         $schemaProbeCtes
         SELECT event_id,
           CASE WHEN schema_errors <> '' THEN -1 ELSE 0 END AS result,
           schema_errors AS errors
         FROM se ORDER BY event_id""",
    "dq_full_chain" -> {
      val ips = Etl.ipBlacklist.map { case (a, i) => s"('$a', '$i')" }.mkString(", ")
      val uas = Etl.uaBlacklist.map { case (a, u) => s"('$a', '$u')" }.mkString(", ")
      val aks = Etl.akBlacklist.map(a => s"'$a'").mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         $schemaProbeCtes,
         ipb(appkey, ip) AS (VALUES $ips),
         uab(appkey, ua) AS (VALUES $uas)
         SELECT s.event_id,
           CASE WHEN i.ip IS NOT NULL THEN ${Etl.Err.IpBlock}
                WHEN u.ua IS NOT NULL THEN ${Etl.Err.UaBlock}
                WHEN NOT s.okj THEN ${Etl.Err.JsonFormatError}
                WHEN s.appkey = '' THEN ${Etl.Err.AkNone}
                WHEN s.schema_errors <> '' THEN ${Etl.Err.BasicSchemaFormatNotMatch}
                WHEN s.appkey = '' OR (s.did = '' AND s.cuid IS NULL)
                  THEN ${Route.Err.ZgZgidNone}
                WHEN s.did = '' THEN ${Route.Err.ZgDidNone}
                WHEN s.sdk NOT IN ('zg_server','zg-cdp')
                     AND (s.ts < TIMESTAMP '${Route.dqWindowStart}'
                          OR s.ts >= TIMESTAMP '${Route.dqWindowEnd}')
                  THEN ${Route.Err.EventTimeExceedsRange}
                ELSE 0 END AS error_code
         FROM se s
         LEFT JOIN ipb i ON s.appkey = i.appkey AND s.ip = i.ip
         LEFT JOIN uab u ON s.appkey = u.appkey AND s.ua = u.ua
         WHERE s.appkey NOT IN ($aks)
         ORDER BY s.event_id"""
    },
    "etl_appid_business" ->
      s"""WITH ${Envelope.oracleRaw},
         ${Envelope.appRegistryOracle}
         SELECT r.appkey, g.app_id, g.business,
           CASE WHEN g.app_id IS NULL THEN 1010006 END AS error_code,
           count(*) AS n
         FROM raw r LEFT JOIN reg g ON r.appkey = g.appkey
         GROUP BY 1, 2, 3, 4 ORDER BY r.appkey""",
    "gate_blacklist" -> {
      val ips = Etl.ipBlacklist.map { case (a, i) => s"('$a', '$i')" }.mkString(", ")
      val uas = Etl.uaBlacklist.map { case (a, u) => s"('$a', '$u')" }.mkString(", ")
      val aks = Etl.akBlacklist.map(a => s"'$a'").mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         ipb(appkey, ip) AS (VALUES $ips),
         uab(appkey, ua) AS (VALUES $uas)
         SELECT r.appkey,
           CASE WHEN i.ip IS NOT NULL THEN ${Etl.Err.IpBlock}
                WHEN u.ua IS NOT NULL THEN ${Etl.Err.UaBlock}
                ELSE 0 END AS error_code,
           count(*) AS n
         FROM raw r
         LEFT JOIN ipb i ON r.appkey = i.appkey AND r.ip = i.ip
         LEFT JOIN uab u ON r.appkey = u.appkey AND r.ua = u.ua
         WHERE r.appkey NOT IN ($aks)
         GROUP BY 1, 2 ORDER BY r.appkey, error_code"""
    },
    "gate_resolve" -> gateResolveOracle(
      """SELECT event_id, verdict,
         CASE WHEN verdict = 'OK' THEN ip_s ELSE '\N' END AS ip_out,
         CASE WHEN verdict = 'OK' THEN cast(now_s AS BIGINT) END AS st,
         CASE WHEN verdict = 'OK' THEN hdr_ua ELSE '\N' END AS ua_out
         FROM v ORDER BY event_id"""),
    "gate_resolve_stats" -> gateResolveOracle(
      "SELECT verdict, count(*) AS n FROM v GROUP BY verdict ORDER BY verdict"),
    "id_device_map" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT appkey, did,
           dense_rank() OVER (PARTITION BY appkey ORDER BY did) AS zg_did
         FROM (SELECT DISTINCT appkey, did FROM raw WHERE appkey <> '' AND did <> '')
         ORDER BY appkey, did""",
    "id_user_map" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT appkey, cuid,
           dense_rank() OVER (PARTITION BY appkey ORDER BY cuid) AS zg_uid
         FROM (SELECT DISTINCT appkey, cuid FROM raw WHERE appkey <> '' AND cuid IS NOT NULL)
         ORDER BY appkey, cuid""",
    "id_zgid_resolution" ->
      s"""WITH ${Envelope.oracleRaw},
         ${zgidCtes()}
         $zgidSelect
         ORDER BY e.event_id""",
    "pipeline_event_attr" ->
      s"""WITH ${Envelope.oracleRaw},
         ${zgidCtes()},
         zg AS MATERIALIZED ($zgidSelect),
         $platformDimCte
         ${eventAttrSelect("raw")}""",
    "pipeline_all_job" -> {
      val ips = Etl.ipBlacklist.map { case (a, i) => s"('$a', '$i')" }.mkString(", ")
      val uas = Etl.uaBlacklist.map { case (a, u) => s"('$a', '$u')" }.mkString(", ")
      val aks = Etl.akBlacklist.map(a => s"'$a'").mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         $gateVerdictCtes,
         ipb(appkey, ip) AS (VALUES $ips),
         uab(appkey, ua) AS (VALUES $uas),
         pass AS MATERIALIZED (
           SELECT r.* FROM raw r
           JOIN v ON r.event_id = v.event_id
           LEFT JOIN ipb i ON r.appkey = i.appkey AND r.ip = i.ip
           LEFT JOIN uab u ON r.appkey = u.appkey AND r.ua = u.ua
           WHERE v.verdict = 'OK' AND r.appkey NOT IN ($aks)
             AND i.ip IS NULL AND u.ua IS NULL),
         ${zgidCtes("pass")},
         zg AS MATERIALIZED ($zgidSelect),
         $platformDimCte
         ${eventAttrSelect("pass")}"""
    },
    "id_sessionize" ->
      """WITH s AS (
           SELECT user_id, event_id, ts,
             epoch_ns(ts) // 1000000000 AS sec,
             lag(epoch_ns(ts) // 1000000000)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
           FROM events),
         x AS (
           SELECT user_id, ts,
             sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
           FROM s)
         SELECT user_id,
           concat(cast(user_id AS string), '-', cast(sess_idx AS string)) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
         FROM x GROUP BY user_id, sess_idx ORDER BY user_id, session_id""",
    "id_archive_route" ->
      s"""WITH ${Envelope.oracleRaw},
         ${Envelope.appRegistryOracle},
         ${zgidCtes()},
         $devMapCte,
         $usrMapCte,
         fe AS (SELECT appkey, cuid, ts, event_id FROM (
             SELECT appkey, cuid, ts, event_id,
               row_number() OVER (PARTITION BY appkey, cuid
                 ORDER BY ts, event_id) AS rn
             FROM ev WHERE cuid IS NOT NULL) WHERE rn = 1),
         zu AS (SELECT appkey, map_key, map_value FROM (
             SELECT u.appkey, u.u_zgid AS map_key,
               CAST(m.zg_uid AS VARCHAR) AS map_value,
               row_number() OVER (PARTITION BY u.appkey, u.u_zgid
                 ORDER BY f.ts DESC, f.event_id DESC) AS rn
             FROM uz u
             JOIN fe f ON u.appkey = f.appkey AND u.cuid = f.cuid
             JOIN usrm m ON u.appkey = m.appkey AND u.cuid = m.cuid)
           WHERE rn = 1),
         allmaps AS (
           SELECT 1 AS archive_type, 'DEVICE' AS type_name, appkey,
             did AS map_key, CAST(zg_did AS VARCHAR) AS map_value FROM dev
           UNION ALL
           SELECT 2, 'USER', appkey, cuid, CAST(zg_uid AS VARCHAR) FROM usrm
           UNION ALL
           SELECT 3, 'DEVICE_ZGID', d.appkey, CAST(v.zg_did AS VARCHAR), d.d_zgid
           FROM dz d JOIN dev v ON d.appkey = v.appkey AND d.did = v.did
           UNION ALL
           SELECT 4, 'USER_ZGID', u.appkey, CAST(m.zg_uid AS VARCHAR), u.u_zgid
           FROM uz u JOIN usrm m ON u.appkey = m.appkey AND u.cuid = m.cuid
           UNION ALL
           SELECT 5, 'ZGID_USER', appkey, map_key, map_value FROM zu)
         SELECT a.archive_type, a.type_name, g.app_id, a.map_key, a.map_value
         FROM allmaps a JOIN reg g ON a.appkey = g.appkey
         ORDER BY a.archive_type, g.app_id, a.map_key""",
    "adv_admission_stats" -> {
      val comp = operators.Adv.advCompanyRegistry
        .map { case (k, a, c) => s"('$k', $a, $c)" }.mkString(", ")
      val adm = operators.Adv.adAppRegistry
        .map { case (k, _) => s"('$k')" }.mkString(", ")
      val ips = Etl.ipBlacklist.map { case (a, i) => s"('$a', '$i')" }.mkString(", ")
      val uas = Etl.uaBlacklist.map { case (a, u) => s"('$a', '$u')" }.mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         comp(appkey, ad_app_id, company_id) AS (VALUES $comp),
         adm(appkey) AS (VALUES $adm),
         aipb(appkey, ip) AS (VALUES $ips),
         auab(appkey, ua) AS (VALUES $uas)
         SELECT r.appkey,
           CASE WHEN c.ad_app_id IS NULL THEN 'NOT_AD_APP'
                WHEN a.appkey IS NULL THEN 'BUSINESS_BLOCKED'
                WHEN i.ip IS NOT NULL THEN 'IP_BLOCK'
                WHEN u.ua IS NOT NULL THEN 'UA_BLOCK'
                ELSE 'OK' END AS verdict,
           count(*) AS n
         FROM raw r
         LEFT JOIN comp c ON r.appkey = c.appkey
         LEFT JOIN adm a ON r.appkey = a.appkey
         LEFT JOIN aipb i ON r.appkey = i.appkey AND r.ip = i.ip
         LEFT JOIN auab u ON r.appkey = u.appkey AND r.ua = u.ua
         WHERE r.appkey <> ''
         GROUP BY 1, 2 ORDER BY r.appkey, verdict"""
    },
    "adv_lid_user_first_end" -> {
      val nameCase = operators.Adv.adChannelDim
        .map { case (c, n) => s"WHEN '$c' THEN '$n'" }.mkString(" ")
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         ${zgidCtes()},
         zg AS MATERIALIZED ($zgidSelect),
         base AS (SELECT r.event_id, r.ad_app_id, z.zgid,
             epoch_ns(r.ts) // 1000000000 * 1000 AS ct, r.event_type
           FROM advadm r JOIN zg z ON r.event_id = z.event_id
           WHERE r.dt = 'evt' AND z.zgid IS NOT NULL),
         tch AS (SELECT *,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
             CASE WHEN event_type = 'click' THEN event_id END AS t_lid,
             CASE WHEN event_type = 'click'
               THEN concat('link-', CAST(event_id AS VARCHAR)) END AS t_lname,
             CASE WHEN event_type = 'click' THEN
               (CASE WHEN event_id % 16 = 0 THEN ''
                     ELSE CAST(event_id % 16 AS VARCHAR) END) END AS t_ctype,
             CASE WHEN event_type = 'click' THEN
               (CASE WHEN event_id % 5 = 0 THEN ''
                     ELSE concat('acct-', CAST(event_id % 50 AS VARCHAR)) END) END AS t_acct,
             CASE WHEN event_type = 'click' THEN event_id % 100 END AS t_camp,
             CASE WHEN event_type = 'click' THEN event_id % 37 END AS t_adg,
             CASE WHEN event_type = 'click' THEN event_id % 23 END AS t_adid,
             CASE WHEN event_type = 'click' THEN event_id % 11 END AS t_kw
           FROM base),
         wst AS (SELECT *,
             last_value(t_lid IGNORE NULLS) OVER wa AS l_lid,
             last_value(t_lname IGNORE NULLS) OVER wa AS l_lname,
             last_value(t_ctype IGNORE NULLS) OVER wa AS l_ctype,
             last_value(t_acct IGNORE NULLS) OVER wa AS l_acct,
             last_value(t_camp IGNORE NULLS) OVER wa AS l_camp,
             last_value(t_adg IGNORE NULLS) OVER wa AS l_adg,
             last_value(t_adid IGNORE NULLS) OVER wa AS l_adid,
             last_value(t_kw IGNORE NULLS) OVER wa AS l_kw,
             first_value(t_lid IGNORE NULLS) OVER wa AS f_lid,
             first_value(t_lname IGNORE NULLS) OVER wa AS f_lname
           FROM tch
           WINDOW wa AS (PARTITION BY ad_app_id, zgid ORDER BY ct, kind, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id,
           coalesce(l_lid, -1) AS lid,
           CASE WHEN l_lid IS NOT NULL AND l_ctype <> '' THEN l_ctype
                ELSE '\\N' END AS channel_type,
           CASE WHEN l_lid IS NOT NULL AND l_ctype <> ''
                THEN (CASE l_ctype $nameCase ELSE '' END)
                ELSE '\\N' END AS channel_name,
           CASE WHEN l_lid IS NOT NULL AND l_acct <> ''
                THEN concat(l_ctype, chr(36), l_acct) ELSE '\\N' END AS account_id,
           CASE WHEN l_lid IS NOT NULL AND l_camp <> 0
                THEN concat(l_ctype, chr(36), CAST(l_camp AS VARCHAR))
                ELSE '\\N' END AS campaign_id,
           CASE WHEN l_lid IS NOT NULL AND l_adg <> 0
                THEN concat(l_ctype, chr(36), CAST(l_adg AS VARCHAR))
                ELSE '\\N' END AS adgroup_id,
           CASE WHEN l_lid IS NOT NULL AND l_adid <> 0
                THEN concat(l_ctype, chr(36), CAST(l_adid AS VARCHAR))
                ELSE '\\N' END AS ad_id,
           CASE WHEN l_lid IS NOT NULL AND l_kw <> 0
                THEN concat(l_ctype, chr(36), CAST(l_kw AS VARCHAR))
                ELSE '\\N' END AS keyword_id,
           coalesce(f_lid, -1) AS first_lid,
           coalesce(f_lname, '\\N') AS first_ad_source,
           CASE WHEN l_lid IS NOT NULL AND
                  concat(CAST(l_lid AS VARCHAR), ',', l_lname) <>
                  concat(CAST(f_lid AS VARCHAR), ',', f_lname)
                THEN l_lid ELSE -1 END AS fol_lid,
           CASE WHEN l_lid IS NOT NULL AND
                  concat(CAST(l_lid AS VARCHAR), ',', l_lname) <>
                  concat(CAST(f_lid AS VARCHAR), ',', f_lname)
                THEN l_lname ELSE '\\N' END AS fol_ad_source
         FROM wst WHERE kind = 1 ORDER BY event_id"""
    },
    "adv_user_ad_source" ->
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         ${zgidCtes()},
         zg AS MATERIALIZED ($zgidSelect),
         tc AS (SELECT r.event_id, r.ad_app_id, z.zgid,
             epoch_ns(r.ts) // 1000000000 * 1000 AS ct,
             r.event_id AS t_lid,
             concat('link-', CAST(r.event_id AS VARCHAR)) AS t_lname
           FROM advadm r JOIN zg z ON r.event_id = z.event_id
           WHERE r.dt = 'evt' AND r.event_type = 'click' AND z.zgid IS NOT NULL),
         ws AS (SELECT *,
             row_number() OVER (PARTITION BY ad_app_id, zgid
               ORDER BY ct, event_id) AS rna,
             row_number() OVER (PARTITION BY ad_app_id, zgid
               ORDER BY ct DESC, event_id DESC) AS rnd,
             count(*) OVER (PARTITION BY ad_app_id, zgid) AS n_touches
           FROM tc),
         fl AS (SELECT ad_app_id, zgid, n_touches,
             max(CASE WHEN rna = 1 THEN t_lid END) AS first_lid,
             max(CASE WHEN rna = 1 THEN t_lname END) AS first_ad_source,
             max(CASE WHEN rnd = 1 THEN t_lid END) AS last_lid,
             max(CASE WHEN rnd = 1 THEN t_lname END) AS last_lname
           FROM ws GROUP BY 1, 2, 3)
         SELECT ad_app_id, zgid, first_lid, first_ad_source,
           CASE WHEN concat(CAST(last_lid AS VARCHAR), ',', last_lname) <>
                  concat(CAST(first_lid AS VARCHAR), ',', first_ad_source)
                THEN last_lid ELSE -1 END AS fol_lid,
           CASE WHEN concat(CAST(last_lid AS VARCHAR), ',', last_lname) <>
                  concat(CAST(first_lid AS VARCHAR), ',', first_ad_source)
                THEN last_lname ELSE '\\N' END AS fol_ad_source,
           n_touches
         FROM fl ORDER BY ad_app_id, zgid""",
    "adv_ss_click_match" ->
      s"""WITH ${Envelope.oracleRaw},
         $advAdStateCtes,
         st AS (SELECT match_key, lid, ct FROM l WHERE rn = 1),
         probes AS (SELECT r.event_id, r.ad_app_id, r.ip, r.ua,
             epoch_ns(r.ts) // 1000000000 * 1000 AS ct,
             CASE r.event_id % 13 WHEN 0 THEN '0' WHEN 1 THEN 'NULL' WHEN 2 THEN ''
               WHEN 3 THEN 'cfcd208495d565ef66e7dff9f98764da'
               WHEN 4 THEN md5(concat('m', cast(r.user_id AS string)))
               ELSE concat('muid-', cast(r.user_id AS string)) END AS muid_raw,
             CASE WHEN r.event_id % 7 = 0 THEN '(null)'
               ELSE concat('oaid-', cast(r.user_id AS string)) END AS oaid_raw
           FROM advadm r WHERE r.dt = 'ss'),
         pn AS (SELECT *,
             CASE WHEN muid_raw IN ($advOrigList) OR lower(muid_raw) IN ($advMd5List) THEN ''
                  WHEN length(muid_raw) = 32 THEN lower(muid_raw)
                  ELSE md5(muid_raw) END AS muid,
             CASE WHEN oaid_raw IN ($advOrigList) OR lower(oaid_raw) IN ($advMd5List) THEN ''
                  WHEN length(oaid_raw) = 32 THEN lower(oaid_raw)
                  ELSE md5(oaid_raw) END AS oaid
           FROM probes),
         pk AS (SELECT *,
             CASE WHEN muid <> '' THEN concat('adtfad:', cast(ad_app_id AS string), ':', muid) END AS muid_key,
             CASE WHEN oaid <> '' THEN concat('adtfad:', cast(ad_app_id AS string), ':', oaid) END AS oaid_key,
             concat('adtfad:', cast(ad_app_id AS string), ':', ip, ua) AS ipua_key
           FROM pn),
         hit AS (SELECT p.event_id, p.ct,
             m.lid AS lid_muid, m.ct AS ct_muid,
             o.lid AS lid_oaid, o.ct AS ct_oaid,
             f.lid AS lid_ipua, f.ct AS ct_ipua
           FROM pk p
           LEFT JOIN st m ON p.muid_key = m.match_key
           LEFT JOIN st o ON p.oaid_key = o.match_key
           LEFT JOIN st f ON p.ipua_key = f.match_key),
         b AS (SELECT *,
             coalesce(lid_muid, lid_oaid, lid_ipua) AS m_lid,
             CASE WHEN lid_muid IS NOT NULL THEN ct_muid
                  WHEN lid_oaid IS NOT NULL THEN ct_oaid
                  ELSE ct_ipua END AS m_ct,
             CASE WHEN lid_muid IS NOT NULL THEN 'muid'
                  WHEN lid_oaid IS NOT NULL THEN 'oaid'
                  WHEN lid_ipua IS NOT NULL THEN 'ipua' END AS m_axis
           FROM hit),
         rk AS (SELECT *, row_number() OVER (
             PARTITION BY coalesce(m_lid, -event_id)
             ORDER BY ct, event_id) AS rn2 FROM b)
         SELECT event_id,
           CASE WHEN m_lid IS NOT NULL AND rn2 = 1 THEN m_lid
                ELSE -1 END AS matched_lid,
           CASE WHEN m_lid IS NOT NULL AND rn2 = 1 THEN m_ct
                ELSE -1 END AS click_ct,
           CASE WHEN m_lid IS NOT NULL AND rn2 = 1 THEN m_axis
                ELSE 'none' END AS match_axis
         FROM rk ORDER BY event_id""",
    "id_archive_dedup" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT appkey, did, cuid, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
         FROM (
           SELECT appkey, did, cuid, ts,
             row_number() OVER (PARTITION BY appkey, did ORDER BY ts DESC, event_id DESC) AS rn
           FROM raw WHERE appkey <> '' AND did <> '' AND cuid IS NOT NULL)
         WHERE rn = 1 ORDER BY appkey, did""",
    "derive_virtual_property" -> {
      val cols = Derive.virtualPropertyRules.map { case (n, e) => s"$e AS $n" }.mkString(", ")
      s"SELECT event_id, $cols FROM events ORDER BY event_id"
    },
    "derive_virtual_event" -> {
      // independent filters resolution: the pr map's keys are static
      // ({_plan, src, k}), so each filter key's "_"+k ?? k lookup resolves
      // STATICALLY to a column (or to never-matches when absent)
      val prCols = Map(
        "_plan" -> "pr_plan",
        "src"   -> "pr_src",
        "k"     -> ("CASE WHEN json_valid(raw_props) " +
          "THEN json_extract_string(raw_props, '$.k') END"))
      def rulePred(filtersJson: String): String = {
        val preds = Derive.parseFilters(filtersJson).map { case (k, v) =>
          prCols.get("_" + k).orElse(prCols.get(k)) match {
            case Some(c) => s"($c) = '$v'"
            case None    => "FALSE"
          }
        }
        if (preds.isEmpty) "TRUE" else preds.mkString(" AND ")
      }
      val branches = Derive.virtualEventFilterRules.map { case (evt, fjson, name) =>
        s"""SELECT event_id, '$name' AS virtual_name
           FROM raw WHERE dt IN ('evt', 'abp') AND event_type = '$evt'
             AND ${rulePred(fjson)}"""
      }.mkString(" UNION ALL ")
      s"""WITH ${Envelope.oracleRaw}
         SELECT event_id, virtual_name FROM ($branches)
         ORDER BY event_id, virtual_name"""
    },
    "derive_rule_tree" ->
      """SELECT event_id,
         CASE WHEN value >= 100 THEN 'high' WHEN value >= 10 THEN 'mid' ELSE 'low' END AS rt_bucket,
         CAST(floor(value * 0.05 + 1) AS BIGINT) AS rt_fee,
         concat(upper(event_type), '-evt') AS rt_label
         FROM events ORDER BY event_id""",
    "derive_rule_sql" ->
      """SELECT event_id,
         CASE WHEN value >= 100 THEN 'high' WHEN value >= 10 THEN 'mid' ELSE 'low' END AS rs_bucket,
         CAST(floor(value * 0.05 + 1) AS BIGINT) AS rs_fee,
         concat(upper(event_type), '-evt') AS rs_label,
         CASE WHEN value > 1000 AND event_type = 'purchase' THEN 'bulk_discount'
              WHEN value > 1000 THEN 'price_discount'
              ELSE 'no_discount' END AS rs_discount
         FROM events ORDER BY event_id""",
    "derive_device_props" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT event_id,
           CASE WHEN json_valid(raw_props)
                THEN CAST(json_extract_string(raw_props, '$$.k') AS INTEGER) END AS prop_k
         FROM raw ORDER BY event_id""",
    "derive_event_registry" ->
      s"""WITH ${Envelope.oracleRaw},
         f AS (SELECT appkey, event_type, min(ts) AS fts, count(*) AS n
               FROM raw WHERE appkey <> '' GROUP BY 1, 2)
         SELECT appkey, event_type AS event_name,
           dense_rank() OVER (PARTITION BY appkey ORDER BY fts, event_type) AS eid, n
         FROM f ORDER BY appkey, eid""",
    "derive_user_prop_registry" -> {
      val bl = Derive.userPropBlacklist.map(s => s"'$s'").mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         f AS (SELECT appkey, upper(concat('p', cast(user_id % 7 AS string))) AS prop_key,
                 min(ts) AS first_ts, count(*) AS n
               FROM raw
               WHERE dt = 'usr' AND cuid IS NOT NULL AND appkey <> ''
                 AND concat('p', cast(user_id % 7 AS string)) NOT IN ($bl)
               GROUP BY 1, 2)
         SELECT appkey, prop_key,
           dense_rank() OVER (PARTITION BY appkey ORDER BY first_ts, prop_key) AS prop_id, n
         FROM f ORDER BY appkey, prop_id"""
    },
    "etl_prop_length_limit" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT substr(ua, 1, 64) AS ua_limited, count(*) AS n, max(length(ua)) AS orig_len
         FROM raw GROUP BY 1 ORDER BY 1""",
    "enrich_ip_geo" -> {
      def geoCase(f: ((Int, String, String, String)) => String): String =
        "CASE user_id % 8 " + Enrich.geoBlocks.map(b => s"WHEN ${b._1} THEN '${f(b)}'")
          .mkString(" ") + " END"
      s"""WITH ${Envelope.oracleRaw}
         SELECT event_id, ip,
           CASE WHEN event_id % 11 IN (0,1,2,3) THEN '\\N' ELSE ${geoCase(_._2)} END AS country,
           CASE WHEN event_id % 11 IN (0,1,2,3) THEN '\\N' ELSE ${geoCase(_._3)} END AS province,
           CASE WHEN event_id % 11 IN (0,1,2,3) THEN '\\N' ELSE ${geoCase(_._4)} END AS city
         FROM raw ORDER BY event_id"""
    },
    "enrich_user_agent" ->
      s"""SELECT event_id,
         ${uaCase(_._1)} AS os,
         ${uaCase(_._2)} AS os_version,
         ${uaCase(_._3)} AS browser,
         ${uaCase(_._4)} AS browser_version,
         ${uaCase(_._5)} AS device_type,
         ${uaCase(_._6)} AS device_brand
         FROM events ORDER BY event_id""",
    "enrich_search_keyword" ->
      """SELECT engine, keyword, count(*) AS n FROM (
           SELECT
             CASE event_id % 7 WHEN 0 THEN 'baidu' WHEN 1 THEN 'google'
               WHEN 2 THEN 'sogou' WHEN 3 THEN 'bing' WHEN 5 THEN 'baidu'
               ELSE 'unknown' END AS engine,
             CASE event_id % 7 WHEN 0 THEN 'spark etl' WHEN 1 THEN 'zhuge analytics'
               WHEN 2 THEN 'graft engine' WHEN 3 THEN 'etl' ELSE '' END AS keyword
           FROM events)
         GROUP BY 1, 2 ORDER BY engine, keyword""",
    "enrich_baidu_eqid" -> {
      val cacheMax = Enrich.baiduEqidCache.size
      s"""SELECT concat('eq', cast(event_id % 50 AS string)) AS eqid,
           CASE WHEN event_id % 50 < $cacheMax
                THEN concat('kw', cast(event_id % 50 AS string)) ELSE '\\N' END AS keyword,
           (event_id % 50 < $cacheMax) AS cache_hit,
           count(*) AS n
         FROM events WHERE event_id % 7 = 5
         GROUP BY 1, 2, 3 ORDER BY eqid"""
    },
    "derive_device_property_full" ->
      s"""WITH ${Envelope.oracleRaw},
         ${devPropCtes("raw")}
         SELECT event_id, $devPropSelect
         FROM dp2 ORDER BY event_id""",
    "adv_app_ad_latest" ->
      s"""WITH ${Envelope.oracleRaw},
         $advAdStateCtes
         SELECT match_key, lid, ct FROM l WHERE rn = 1 ORDER BY match_key""",
    "adv_attribute_event" ->
      s"""WITH ${Envelope.oracleRaw},
         $advAdStateCtes,
         state AS (SELECT match_key, lid, ct FROM l WHERE rn = 1),
         probes AS (
           SELECT r.event_id, r.ad_app_id, r.ip, r.ua,
             CASE r.event_id % 13 WHEN 0 THEN '0' WHEN 1 THEN 'NULL' WHEN 2 THEN ''
               WHEN 3 THEN 'cfcd208495d565ef66e7dff9f98764da'
               WHEN 4 THEN md5(concat('m', cast(r.user_id AS string)))
               ELSE concat('muid-', cast(r.user_id AS string)) END AS muid_raw
           FROM advadm r
           WHERE r.event_type = 'purchase'),
         pn AS (SELECT *,
             CASE WHEN muid_raw IN (${advOrigList}) OR lower(muid_raw) IN (${advMd5List}) THEN ''
                  WHEN length(muid_raw) = 32 THEN lower(muid_raw)
                  ELSE md5(muid_raw) END AS muid
           FROM probes)
         SELECT p.event_id,
           coalesce(se.lid, sf.lid) AS matched_lid,
           CASE WHEN se.lid IS NOT NULL THEN 'exact'
                WHEN sf.lid IS NOT NULL THEN 'fuzzy'
                ELSE 'none' END AS match_type
         FROM pn p
         LEFT JOIN state se
           ON p.muid <> '' AND se.match_key =
              concat('adtfad:', cast(p.ad_app_id AS string), ':', p.muid)
         LEFT JOIN state sf
           ON sf.match_key = concat('adtfad:', cast(p.ad_app_id AS string), ':', p.ip, p.ua)
         ORDER BY p.event_id""",
    "adv_channel_rollup" -> {
      val dims = operators.Adv.adChannelDim
        .map { case (k, v) => s"('$k', '$v')" }.mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         dim(channel_type, channel_name) AS (VALUES $dims),
         clicks AS (
           SELECT r.event_id AS lid, cast(r.event_id % 16 AS string) AS channel_type
           FROM advadm r
           WHERE r.event_type = 'click')
         SELECT c.channel_type, coalesce(d.channel_name, '') AS channel_name,
           count(*) AS n_clicks, max(c.lid) AS last_lid
         FROM clicks c LEFT JOIN dim d ON c.channel_type = d.channel_type
         GROUP BY 1, 2 ORDER BY c.channel_type"""
    },
    "adv_asa_fields" -> {
      def legacy(key: String) =
        s"""cast(coalesce(try_cast(regexp_extract(asa_raw, '$key="?([0-9]+)', 1) AS BIGINT), 0) AS VARCHAR)"""
      def json(field: String) =
        s"""cast(coalesce(try_cast(json_extract_string(asa_raw, '$$.$field') AS BIGINT), 0) AS VARCHAR)"""
      def pick(key: String, field: String, alias: String) =
        s"CASE WHEN legacy THEN ${legacy(key)} ELSE ${json(field)} END AS $alias"
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         c AS (SELECT r.event_id, r.user_id FROM advadm r
               WHERE r.event_type = 'click'),
         w AS (SELECT event_id,
                 CASE event_id % 3
                 WHEN 0 THEN concat('iad-org-id=', cast(user_id AS string),
                   ';iad-campaign-id="', cast(event_id % 97 AS string),
                   '";iad-adgroup-id=', cast(event_id % 53 AS string),
                   ';iad-keyword-id=', cast(event_id % 31 AS string))
                 WHEN 1 THEN concat('{"orgId":', cast(user_id AS string),
                   ',"campaignId":', cast(event_id % 97 AS string),
                   ',"adGroupId":', cast(event_id % 53 AS string),
                   ',"adId":0,"creativeSetId":', cast(event_id % 17 AS string),
                   ',"keywordId":', cast(event_id % 31 AS string), '}')
                 ELSE concat('{"orgId":', cast(user_id AS string),
                   ',"campaignId":', cast(event_id % 97 AS string),
                   ',"adGroupId":', cast(event_id % 53 AS string),
                   ',"adId":', cast(event_id % 17 + 1 AS string),
                   ',"keywordId":', cast(event_id % 31 AS string), '}')
                 END AS asa_raw
               FROM c),
         p AS (SELECT event_id, asa_raw, asa_raw NOT LIKE '{%' AS legacy FROM w)
         SELECT event_id, '苹果ASA' AS lname, '-2' AS lid, '5' AS channel_type,
           ${pick("iad-org-id", "orgId", "channel_account_id")},
           ${pick("iad-campaign-id", "campaignId", "channel_campaign_id")},
           ${pick("iad-adgroup-id", "adGroupId", "channel_adgroup_id")},
           CASE WHEN legacy THEN '0'
                WHEN coalesce(try_cast(json_extract_string(asa_raw, '$$.adId') AS BIGINT), 0) = 0
                THEN ${json("creativeSetId")}
                ELSE ${json("adId")} END AS channel_ad_id,
           ${pick("iad-keyword-id", "keywordId", "channel_keyword_id")}
         FROM p ORDER BY event_id"""
    },
    "enrich_utm_attribution" ->
      """SELECT utm_source, utm_medium, count(*) AS n FROM (
           SELECT
             CASE WHEN event_id % 3 = 0 THEN 'wechat'
               WHEN event_id % 7 = 0 THEN 'www.baidu.com'
               WHEN event_id % 7 = 1 THEN 'www.google.com'
               WHEN event_id % 7 = 2 THEN 'www.sogou.com'
               WHEN event_id % 7 = 3 THEN 'cn.bing.com'
               WHEN event_id % 7 = 4 THEN 'news.example.com'
               WHEN event_id % 7 = 5 THEN 'www.baidu.com'
               ELSE '\N' END AS utm_source,
             CASE WHEN event_id % 3 = 0 THEN 'cpc'
               WHEN event_id % 7 IN (0,1,2,3,5) THEN '搜索自然流量'
               WHEN event_id % 7 = 4 THEN '引荐'
               ELSE '\N' END AS utm_medium
           FROM events)
         GROUP BY 1, 2 ORDER BY utm_source, utm_medium""",
    "route_by_dt" -> {
      val cases = Route.dtRoutes.map { case (dt, r) => s"WHEN '$dt' THEN '$r'" }.mkString(" ")
      val bl = Route.appBlacklist.map(a => s"'$a'").mkString(", ")
      s"""WITH ${Envelope.oracleRaw}
         SELECT CASE dt $cases ELSE 'drop' END AS route, count(*) AS n
         FROM raw WHERE appkey NOT IN ($bl) GROUP BY 1 ORDER BY route"""
    },
    "route_event_attr" ->
      s"""WITH $eventAttrRowCtes
         SELECT * FROM ea ORDER BY event_id""",
    "route_user_row" ->
      s"""WITH $userRowCtes
         SELECT * FROM burow ORDER BY event_id""",
    "route_device_row" ->
      s"""WITH ${Envelope.oracleRaw},
         $platformDimCte,
         $devMapCte,
         dbase AS (SELECT r.*, dv.zg_did, coalesce(d.platform_id, 0) AS pid,
             list_filter(string_split_regex(r.rs, '[^0-9]'), x -> x <> '') AS rs_runs
           FROM raw r
           JOIN dev dv ON r.appkey = dv.appkey AND r.did = dv.did
           LEFT JOIN dim d ON r.pl = d.pl
           WHERE r.dt = 'pl' AND r.did <> '' AND r.appkey <> ''),
         ${devPropCtes("dbase")}
         SELECT event_id, zg_did,
           did AS device_md5,
           pid AS platform_id,
           '\\N' AS device_type,
           CASE WHEN len(rs_runs) >= 2 THEN rs_runs[1] ELSE '\\N' END AS h_pixel,
           CASE WHEN len(rs_runs) >= 2 THEN rs_runs[2] ELSE '\\N' END AS v_pixel,
           CASE WHEN pid = 2 THEN 'Apple'
                WHEN dev_brand = '' THEN '\\N' ELSE dev_brand END AS device_brand,
           CASE WHEN dev_model = '' THEN '\\N' ELSE dev_model END AS device_model,
           CASE WHEN rs = '' THEN '\\N' ELSE rs END AS resolution,
           '\\N' AS phone,
           CASE WHEN imei = '' THEN '\\N' ELSE imei END AS imei,
           '\\N' AS mac,
           jailp AS is_prison_break,
           crackp AS is_crack,
           CASE WHEN lang = '' THEN '\\N' ELSE lang END AS language,
           tzms AS timezone,
           CASE WHEN zs = '' THEN '\\N' ELSE zs END AS attr1,
           CASE WHEN try_cast(tzms AS BIGINT) IS NOT NULL
                 AND abs(try_cast(tzms AS BIGINT)) > ${Route.tzRangeMs}
             THEN '\\N'
             ELSE CAST(epoch_ns(ts) // 1000000000 AS VARCHAR) END AS last_update,
           $devPropSelect
         FROM dp2 ORDER BY event_id""",
    "route_user_prop_row" ->
      s"""WITH $userPropRowCtes
         SELECT * FROM uprows ORDER BY event_id, prop_name""",
    "sink_unique_key_merge" ->
      s"""WITH $userPropRowCtes,
         m AS (SELECT *, row_number() OVER (PARTITION BY zgid, prop_id
                 ORDER BY last_update DESC, event_id DESC) AS rn
               FROM uprows)
         SELECT event_id, app_id, zgid, user_id, prop_id, prop_name,
           prop_type, prop_value, platform_id, last_update
         FROM m WHERE rn = 1 ORDER BY zgid, prop_id""",
    // the partitioned sink's readback is a pure per-day count of the
    // envelope rows it wrote — the write/readback machinery is what the
    // spec pins; the CONTENT is oracle-checkable
    "sink_partitioned_parquet" ->
      """SELECT strftime(ts, '%Y%m%d') AS day_id, count(*) AS n
         FROM events GROUP BY 1 ORDER BY day_id""",
    // the bucketed sink's readback join of facts to their own per-user
    // rollup counts each user's facts beside the rollup's ltv — both pure
    // functions of the events table
    "sink_bucketed_join" ->
      """SELECT user_id, round(sum(value), 4) AS ltv, count(*) AS n
         FROM events GROUP BY 1 ORDER BY user_id""",
    // the dynamic sink's readback is the per-app routed row count — the
    // registry join decides which table (if any) each row lands in
    "sink_dynamic_route" ->
      s"""WITH ${Envelope.oracleRaw},
         ${Envelope.appRegistryOracle}
         SELECT concat('b_user_event_attr_', CAST(g.app_id AS VARCHAR)) AS table_name,
           g.app_id, count(*) AS n
         FROM raw r JOIN reg g ON r.appkey = g.appkey
         GROUP BY g.app_id ORDER BY g.app_id""",
    "dw_user_join" ->
      s"""WITH $dwAdmittedCtes,
         $userJoinBody
         SELECT * FROM ujoin ORDER BY zg_id""",
    "dw_user_active" ->
      s"""WITH $dwAdmittedCtes
         SELECT zgid AS zg_id, begin_day_id, CAST(count(*) AS INT) AS times,
           yearweek, yearmonth, platform
         FROM adm GROUP BY 1, 2, 4, 5, 6
         ORDER BY zg_id, begin_day_id, platform""",
    "dw_user_duration" ->
      s"""WITH $dwAdmittedCtes
         SELECT zgid AS zg_id, begin_day_id AS day_id, strftime(ts, '%H') AS period,
           CAST(sum(CASE WHEN try_cast(dru AS INTEGER) IS NOT NULL
                 AND try_cast(dru AS INTEGER) BETWEEN 0 AND 86400000
               THEN try_cast(dru AS INTEGER) ELSE 0 END) AS BIGINT) AS duration,
           CAST(count(*) AS INT) AS times, yearweek, yearmonth, platform
         FROM adm GROUP BY 1, 2, 3, 6, 7, 8
         ORDER BY zg_id, day_id, period, platform""",
    "dw_user_detail" ->
      s"""WITH $userDetailCtes
         SELECT * FROM udetail ORDER BY zg_id""",
    // incremental folds of the day-grain rollups and the sums table:
    // SAME oracle text as their full-rescan counterparts — a hash match
    // proves each fold lossless
    "dw_user_active_inc" ->
      s"""WITH $dwAdmittedCtes
         SELECT zgid AS zg_id, begin_day_id, CAST(count(*) AS INT) AS times,
           yearweek, yearmonth, platform
         FROM adm GROUP BY 1, 2, 4, 5, 6
         ORDER BY zg_id, begin_day_id, platform""",
    "dw_user_duration_inc" ->
      s"""WITH $dwAdmittedCtes
         SELECT zgid AS zg_id, begin_day_id AS day_id, strftime(ts, '%H') AS period,
           CAST(sum(CASE WHEN try_cast(dru AS INTEGER) IS NOT NULL
                 AND try_cast(dru AS INTEGER) BETWEEN 0 AND 86400000
               THEN try_cast(dru AS INTEGER) ELSE 0 END) AS BIGINT) AS duration,
           CAST(count(*) AS INT) AS times, yearweek, yearmonth, platform
         FROM adm GROUP BY 1, 2, 3, 6, 7, 8
         ORDER BY zg_id, day_id, period, platform""",
    "dw_user_detail_sum_inc" ->
      s"""WITH $userDetailCtes
         SELECT zg_id, platform, visit_times, duration,
           attr1, attr2, attr3, attr4, attr5
         FROM udetail ORDER BY zg_id""",
    // the incremental fold must equal the full rescan — SAME oracle text,
    // so a hash match proves the merge is lossless on this corpus
    "dw_user_detail_inc" ->
      s"""WITH $userDetailCtes
         SELECT * FROM udetail ORDER BY zg_id""",
    "dw_user_detail_sum" ->
      s"""WITH $userDetailCtes
         SELECT zg_id, platform, visit_times, duration,
           attr1, attr2, attr3, attr4, attr5
         FROM udetail ORDER BY zg_id""",
    "dw_user_all" -> {
      val carrier = operators.Dw.carrierDim
        .map { case (c, n) => s"WHEN $c THEN '$n'" }.mkString(" ")
      val pname = Route.platformDim
        .map { case (k, c) => s"WHEN $c THEN '$k'" }.mkString(" ")
      s"""WITH $userDetailCtes,
         $dwAdmittedBody,
         $userJoinBody
         SELECT d.zg_id, d.first_visit_time, d.last_visit_time,
           d.first_version, d.first_channel,
           d.current_app_version, d.current_app_channel,
           d.first_website, d.utm_source, d.utm_medium, d.utm_campaign,
           d.utm_content, d.utm_term, d.first_referrer_url,
           d.current_country, d.current_area, d.current_city,
           d.current_mccmnc, d.current_bs, d.current_bv, d.current_os,
           d.current_ov, d.current_l, d.current_h,
           d.current_device_brand, d.current_device_model, d.is_registered,
           j.device_id, j.begin_date, j.begin_day_id, j.uuid,
           j.yearweek, j.yearmonth, j.platform,
           CAST(d.visit_times AS BIGINT) AS visit_times, d.duration,
           CASE WHEN d.current_mccmnc IS NOT NULL
                 AND d.current_mccmnc >= 46000 AND d.current_mccmnc < 46100
             THEN CASE d.current_mccmnc - 46000 $carrier ELSE '\\N' END
             ELSE '\\N' END AS current_mccmnc_name,
           d.current_device_model AS current_device_model_name,
           CASE j.platform $pname ELSE '\\N' END AS platform_name,
           d.attr1, d.attr2, d.attr3, d.attr4, d.attr5
         FROM udetail d LEFT JOIN ujoin j ON d.zg_id = j.zg_id
         ORDER BY d.zg_id"""
    },
    "dw_user_anonymous" ->
      s"""WITH $userRowCtes
         SELECT zgid AS zg_id,
           max(try_cast(user_id AS BIGINT)) AS user_id,
           CASE WHEN max(try_cast(user_id AS BIGINT)) IS NULL
                THEN '匿名' ELSE '实名' END AS is_anonymous
         FROM burow GROUP BY zgid ORDER BY zg_id""",
    "dq_validate" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT event_id,
           CASE WHEN appkey = '' OR (did = '' AND cuid IS NULL) THEN ${Route.Err.ZgZgidNone}
                WHEN did = '' THEN ${Route.Err.ZgDidNone}
                WHEN sdk NOT IN ('zg_server','zg-cdp')
                     AND (ts < TIMESTAMP '${Route.dqWindowStart}'
                          OR ts >= TIMESTAMP '${Route.dqWindowEnd}') THEN ${Route.Err.EventTimeExceedsRange}
                ELSE 0 END AS error_code
         FROM raw ORDER BY event_id""",
    "dq_error_stats" ->
      s"""WITH ${Envelope.oracleRaw}
         SELECT appkey,
           CASE WHEN appkey = '' OR (did = '' AND cuid IS NULL) THEN ${Route.Err.ZgZgidNone}
                WHEN did = '' THEN ${Route.Err.ZgDidNone}
                WHEN sdk NOT IN ('zg_server','zg-cdp')
                     AND (ts < TIMESTAMP '${Route.dqWindowStart}'
                          OR ts >= TIMESTAMP '${Route.dqWindowEnd}') THEN ${Route.Err.EventTimeExceedsRange}
                ELSE 0 END AS error_code,
           count(*) AS n
         FROM raw GROUP BY 1, 2 ORDER BY appkey, error_code""",
    "dim_platform" -> {
      val dims = Route.platformDim.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         dim(pl, platform_id) AS (VALUES $dims)
         SELECT r.pl, coalesce(d.platform_id, 0) AS platform_id, count(*) AS n
         FROM raw r LEFT JOIN dim d ON r.pl = d.pl
         GROUP BY 1, 2 ORDER BY r.pl"""
    },
    "dim_network" -> {
      val dims = Route.networkDim.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      s"""WITH ${Envelope.oracleRaw},
         dim(net, network_id) AS (VALUES $dims)
         SELECT r.net, coalesce(d.network_id, 0) AS network_id, count(*) AS n
         FROM raw r LEFT JOIN dim d ON r.net = d.net
         GROUP BY 1, 2 ORDER BY r.net"""
    },
    "adv_click_join" ->
      s"""WITH ${Envelope.oracleRaw},
         e AS (SELECT * FROM raw WHERE appkey <> '' AND did <> ''),
         c AS (SELECT appkey, did, event_id AS click_id, ts AS click_ts
               FROM e WHERE event_type = 'click'),
         v AS (SELECT appkey, did, event_id AS conv_id, ts AS conv_ts
               FROM e WHERE event_type = 'purchase'),
         j AS (SELECT v.conv_id, c.click_id,
                 row_number() OVER (PARTITION BY v.conv_id
                   ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
               FROM v JOIN c ON v.appkey = c.appkey AND v.did = c.did
               WHERE c.click_ts <= v.conv_ts
                 AND epoch_ns(v.conv_ts) // 1000000000
                     - epoch_ns(c.click_ts) // 1000000000 <= ${Adv.lookbackSec})
         SELECT conv_id, click_id FROM j WHERE rn = 1 ORDER BY conv_id""",
    "adv_first_last_touch" ->
      s"""WITH s AS (
           SELECT user_id, ts, event_id,
             CASE WHEN event_id % 3 = 0 THEN 'wechat'
               WHEN event_id % 7 = 0 THEN 'www.baidu.com'
               WHEN event_id % 7 = 1 THEN 'www.google.com'
               WHEN event_id % 7 = 2 THEN 'www.sogou.com'
               WHEN event_id % 7 = 3 THEN 'cn.bing.com'
               WHEN event_id % 7 = 4 THEN 'news.example.com'
               WHEN event_id % 7 = 5 THEN 'www.baidu.com'
               ELSE '\\N' END AS source
           FROM events),
         f AS (SELECT user_id, source,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
           FROM s)
         SELECT user_id,
           max(CASE WHEN rf = 1 THEN source END) AS first_source,
           max(CASE WHEN rl = 1 THEN source END) AS last_source,
           count(*) AS n_touch
         FROM f GROUP BY user_id ORDER BY user_id""",
    "adv_conversion" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS conv_day,
         count(*) AS n_raw, round(sum(value), 4) AS conv_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1, 2 ORDER BY user_id, conv_day""",
    "adv_convert_match" -> {
      import graft.functions.MatchRules
      // the same label -> pr column resolution Adv.matchValue compiles
      def valueSql(label: String): String = label match {
        case "ct"  => "ct_s"
        case "plan" => "pr_plan"
        case other => other
      }
      val ruleRows = operators.Adv.adMatchRules.map { r =>
        val cond = MatchRules.conditionSql(valueSql(r.label), r, operators.Adv.matchNowMs)
        s"""SELECT ${r.linkId} AS link_id, '${r.eventType}' AS event_name,
            count(*) FILTER (WHERE event_type = '${r.eventType}') AS n_events,
            count(*) FILTER (WHERE event_type = '${r.eventType}' AND $cond) AS n_matched,
            count(DISTINCT user_id)
              FILTER (WHERE event_type = '${r.eventType}' AND $cond) AS n_users
            FROM e"""
      }.mkString(" UNION ALL ")
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         e AS (SELECT r.*, CAST(epoch_ns(r.ts) // 1000000000 AS VARCHAR) AS ct_s
               FROM advadm r WHERE r.dt = 'evt')
         $ruleRows ORDER BY link_id"""
    },
    "adv_deep_convert" -> {
      import graft.functions.MatchRules
      val links = operators.Adv.adsLinkRegistry
      val lids = links.map(_.lid)
      val lidCase = lids.zipWithIndex
        .map { case (lid, i) => s"WHEN $i THEN $lid" }.mkString(" ")
      val convEvents = links.flatMap(_.eventIds).distinct
      val evList = convEvents.map(e => s"'$e'").mkString(", ")
      val mNulls = links.map(l => s"CAST(NULL AS BOOLEAN) AS m_${l.lid}").mkString(", ")
      // the same label -> pr column mapping Adv.matchValue compiles, over
      // base's columns (ct_s = epoch seconds, matching matchValue("ct"))
      def valueSql(label: String): String = label match {
        case "ct"   => "ct_s"
        case "plan" => "pr_plan"
        case other  => other
      }
      val mCols = links.map { l =>
        val cond = l.rule
          .map(r => MatchRules.conditionSql(valueSql(r.label), r, operators.Adv.matchNowMs))
          .getOrElse("TRUE")
        s"$cond AS m_${l.lid}"
      }.mkString(", ")
      val qualify = links.map { l =>
        val evs = l.eventIds.map(e => s"'$e'").mkString(", ")
        s"WHEN ${l.lid} THEN event_name IN ($evs) " +
          s"AND ct - click_ct <= ${l.windowSec * 1000L} AND m_${l.lid}"
      }.mkString(" ")
      val lastCols = convEvents.map(e =>
        s"max(CASE WHEN event_name = '$e' THEN ct END) OVER wl AS last_$e")
        .mkString(", ")
      val completeCase = links.map { l =>
        val conds = l.eventIds.map(e =>
          s"(last_$e IS NOT NULL AND ct - last_$e <= ${l.windowSec * 1000L})")
          .mkString(" AND ")
        s"WHEN ${l.lid} THEN $conds"
      }.mkString(" ")
      s"""WITH ${Envelope.oracleRaw},
         $advAdmitCte,
         ${zgidCtes()},
         zg AS MATERIALIZED ($zgidSelect),
         base AS (SELECT r.event_id, r.ad_app_id, z.zgid,
             epoch_ns(r.ts) // 1000000000 * 1000 AS ct,
             CAST(epoch_ns(r.ts) // 1000000000 AS VARCHAR) AS ct_s,
             r.event_type, r.dru, r.pr_plan, r.cn, r.vn, r.cr, r.ua
           FROM advadm r
           JOIN zg z ON r.event_id = z.event_id
           WHERE r.dt = 'evt' AND z.zgid IS NOT NULL),
         u AS (
           SELECT ad_app_id, zgid, ct, 0 AS kind, event_id,
             CASE CAST(event_id % ${lids.size} AS INT) $lidCase END AS lid,
             CAST(NULL AS VARCHAR) AS event_name, $mNulls
           FROM base WHERE event_type = 'click'
           UNION ALL
           SELECT ad_app_id, zgid, ct, 1, event_id, NULL, event_type, $mCols
           FROM base WHERE event_type IN ($evList)),
         wclick AS (SELECT *,
             last_value(CASE WHEN kind = 0 THEN ct END IGNORE NULLS)
               OVER w AS click_ct,
             last_value(CASE WHEN kind = 0 THEN lid END IGNORE NULLS)
               OVER w AS click_lid
           FROM u
           WINDOW w AS (PARTITION BY ad_app_id, zgid ORDER BY ct, kind, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         q AS (SELECT event_id, click_lid AS lid, event_name, zgid, ct, click_ct
           FROM wclick
           WHERE kind = 1 AND click_ct IS NOT NULL AND ct >= click_ct
             AND (CASE click_lid $qualify ELSE FALSE END)),
         comp AS (SELECT *, $lastCols FROM q
           WINDOW wl AS (PARTITION BY lid ORDER BY ct, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         c2 AS (SELECT * FROM comp WHERE CASE lid $completeCase ELSE FALSE END),
         sent AS (SELECT *, row_number() OVER (PARTITION BY event_name, lid, zgid
             ORDER BY ct, event_id) AS rn FROM c2)
         SELECT event_id, lid, event_name, zgid, ct AS conv_ct, click_ct
         FROM sent WHERE rn = 1 ORDER BY event_id"""
    },
    "adv_add_utm" -> {
      val cfgRows = operators.Adv.utmConfigRegistry
        .map { case (e, s0, m, c, ct, tm) => s"($e, '$s0', '$m', '$c', '$ct', '$tm')" }
        .mkString(", ")
      def pick(cfgCol: String, param: String) =
        s"""CASE WHEN c.cfg_source IS NOT NULL THEN c.$cfgCol
            WHEN contains(r.url, '$param=')
              THEN regexp_extract(r.url, '$param=([^&#]*)', 1) END AS $param"""
      s"""WITH ${Envelope.oracleRaw},
         ereg AS (SELECT appkey, event_type,
             dense_rank() OVER (PARTITION BY appkey ORDER BY fts, event_type) AS eid
           FROM (SELECT appkey, event_type, min(ts) AS fts
                 FROM raw WHERE appkey <> '' GROUP BY 1, 2)),
         cfg(eid, cfg_source, cfg_medium, cfg_campaign, cfg_content, cfg_term)
           AS (VALUES $cfgRows)
         SELECT r.event_id, g.eid, (c.cfg_source IS NOT NULL) AS utm_hit,
           ${pick("cfg_source", "utm_source")},
           ${pick("cfg_medium", "utm_medium")},
           ${pick("cfg_campaign", "utm_campaign")},
           ${pick("cfg_content", "utm_content")},
           ${pick("cfg_term", "utm_term")}
         FROM raw r
         JOIN ereg g ON r.appkey = g.appkey AND r.event_type = g.event_type
         LEFT JOIN cfg c ON g.eid = c.eid
         WHERE r.dt IN ('evt', 'abp') AND r.appkey <> ''
         ORDER BY event_id"""
    },
    "q_funnel_windowed" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type='view' GROUP BY user_id
         ), c AS (
           SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts2
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type='click' AND e.ts > v.v_ts
             AND epoch_ns(e.ts) // 1000000000 <= epoch_ns(v.v_ts) // 1000000000 + 604800
           GROUP BY e.user_id
         ), p AS (
           SELECT e.user_id, min(e.ts) AS p_ts
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type='purchase' AND e.ts > c.c_ts
             AND epoch_ns(e.ts) // 1000000000 <= epoch_ns(c.v_ts2) // 1000000000 + 604800
           GROUP BY e.user_id
         )
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click_7d,
                (SELECT count(*) FROM p) AS n_purchase_7d""",
    "adv_multi_touch" ->
      s"""WITH s AS (
           SELECT user_id,
             CASE WHEN event_id % 3 = 0 THEN 'wechat'
               WHEN event_id % 7 = 0 THEN 'www.baidu.com'
               WHEN event_id % 7 = 1 THEN 'www.google.com'
               WHEN event_id % 7 = 2 THEN 'www.sogou.com'
               WHEN event_id % 7 = 3 THEN 'cn.bing.com'
               WHEN event_id % 7 = 4 THEN 'news.example.com'
               WHEN event_id % 7 = 5 THEN 'www.baidu.com'
               ELSE '\\N' END AS source
           FROM events),
         touches AS (SELECT user_id, source FROM s WHERE source <> '\\N'),
         conv AS (SELECT user_id, sum(value) AS conv_value FROM events
                  WHERE event_type = 'purchase' GROUP BY user_id),
         pu AS (SELECT user_id, count(*) AS n_touch FROM touches GROUP BY user_id)
         SELECT t.source,
           floor(sum(c.conv_value / pu.n_touch) * 10000) / 10000 AS credit,
           count(*) AS n_touches
         FROM touches t JOIN pu ON t.user_id = pu.user_id
         JOIN conv c ON t.user_id = c.user_id
         GROUP BY t.source ORDER BY t.source""",
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),4) AS sum_qty,
         round(sum(l_extendedprice),4) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_topk_join" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q5_star_join" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_window_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type='view' GROUP BY user_id
         ), c AS (
           SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type='click' AND e.ts > v.v_ts GROUP BY e.user_id
         ), p AS (
           SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type='purchase' AND e.ts > c.c_ts GROUP BY e.user_id
         )
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click_after_view,
                (SELECT count(*) FROM p) AS n_purchase_after_click""",
    "q_retention" ->
      """WITH by_day AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
         ), cohort AS (
           SELECT user_id, min(d) AS d0 FROM by_day GROUP BY user_id
         ), retained AS (
           SELECT c.d0, count(*) AS retained_7d FROM cohort c
           JOIN by_day b ON c.user_id = b.user_id AND b.d = c.d0 + INTERVAL 7 DAY
           GROUP BY c.d0
         )
         SELECT strftime(c.d0, '%Y-%m-%d') AS cohort_day,
                count(*) AS cohort_size,
                coalesce(any_value(r.retained_7d), 0) AS retained_7d
         FROM cohort c LEFT JOIN retained r ON c.d0 = r.d0
         GROUP BY c.d0
         ORDER BY cohort_day""",
    "q_event_counts_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         count(*) AS n, round(sum(value),4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q_user_ltv" ->
      """SELECT user_id, count(*) AS n_events,
         round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END),4) AS ltv,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_session_stats" ->
      """WITH s AS (
           SELECT user_id, event_id, ts,
             epoch_ns(ts) // 1000000000 AS sec,
             lag(epoch_ns(ts) // 1000000000)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
           FROM events),
         x AS (
           SELECT user_id, ts, sec,
             sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
           FROM s),
         sess AS (
           SELECT user_id, sess_idx, count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d') AS day,
             max(sec) - min(sec) AS dur_sec
           FROM x GROUP BY user_id, sess_idx)
         SELECT day, count(*) AS n_sessions,
           floor(avg(dur_sec) * 100) / 100 AS avg_dur_sec,
           floor(avg(n_events) * 100) / 100 AS avg_events
         FROM sess GROUP BY day ORDER BY day""",
    "q_bounce_rate" ->
      """WITH s AS (
           SELECT user_id, event_id, ts,
             epoch_ns(ts) // 1000000000 AS sec,
             lag(epoch_ns(ts) // 1000000000)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
           FROM events),
         x AS (
           SELECT user_id, ts,
             sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
           FROM s),
         sess AS (
           SELECT user_id, sess_idx, count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d') AS day
           FROM x GROUP BY user_id, sess_idx)
         SELECT day, count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000) / 10000 AS bounce_rate
         FROM sess GROUP BY day ORDER BY day""",
    "q_rolling_active" ->
      """WITH bd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         days AS (SELECT DISTINCT d AS day FROM bd)
         SELECT strftime(day, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS wau,
           count(*) AS active_user_days
         FROM days JOIN bd ON bd.d <= days.day AND bd.d >= days.day - INTERVAL 6 DAY
         GROUP BY days.day ORDER BY day""",
    "q_event_path" ->
      """WITH s AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
           FROM events)
         SELECT prev_event, event_type AS next_event, count(*) AS n
         FROM s WHERE prev_event IS NOT NULL
         GROUP BY 1, 2 ORDER BY prev_event, next_event""",
    "q_user_segment" ->
      """WITH a AS (
           SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS monetary
           FROM events GROUP BY user_id)
         SELECT user_id,
           datediff('day', CAST(last_ts AS DATE), DATE '2024-07-01') AS recency_days,
           frequency, monetary,
           CASE WHEN frequency >= 100 AND monetary >= 1000 THEN 'vip'
                WHEN monetary >= 100 THEN 'paying'
                WHEN frequency >= 10 THEN 'active'
                ELSE 'casual' END AS segment
         FROM a ORDER BY user_id""",
    "text_pii_scrub" -> {
      val ordered = TextAnalysis.piiPatterns
        .sortBy { case (name, _, _) => if (name == "card") 0 else 1 }
      val nested = ordered.foldLeft("text") { case (c, (_, pat, repl)) =>
        s"regexp_replace($c, '$pat', '$repl', 'g')"
      }
      val counts = TextAnalysis.piiPatterns.map { case (name, pat, _) =>
        s"len(regexp_extract_all(text, '$pat')) AS n_$name"
      }.mkString(", ")
      s"""SELECT doc_id, md5($nested) AS clean_md5, $counts
         FROM documents ORDER BY doc_id"""
    },
    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
         min(doc_id) AS keep_id, count(*) AS n
         FROM documents GROUP BY 1 ORDER BY h""",
    "dedup_exact_inc" ->
      """WITH h AS (SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           FROM documents),
         mx AS (SELECT max(doc_id) AS m FROM h),
         idx AS (SELECT DISTINCT h.h FROM h, mx WHERE NOT (doc_id * 5 > m * 4)),
         d AS (SELECT h.doc_id, h.h FROM h, mx WHERE doc_id * 5 > m * 4),
         r AS (SELECT doc_id, h,
                 h IN (SELECT h FROM idx) AS in_index,
                 CAST(row_number() OVER (PARTITION BY h ORDER BY doc_id) - 1
                   AS BIGINT) AS n_prior
               FROM d)
         SELECT doc_id, h, in_index, n_prior,
           (NOT in_index AND n_prior = 0) AS keep
         FROM r ORDER BY doc_id""",
    // weekly index maintenance: tombstoned docs drop (doc_id % 13 = 0 —
    // the declared synthetic retirement set), the delta's admissions
    // (replayed against the PRE-compaction index, exactly dedup_exact_inc)
    // fold in, keepers hand over to the next live sibling
    "dedup_index_compact" ->
      """WITH h AS (SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           FROM documents),
         mx AS (SELECT max(doc_id) AS m FROM h),
         liveidx AS (SELECT h.h, min(doc_id) AS keeper_id FROM h, mx
                     WHERE NOT (doc_id * 5 > m * 4) AND doc_id % 13 <> 0
                     GROUP BY h.h),
         pre AS (SELECT DISTINCT h.h FROM h, mx WHERE NOT (doc_id * 5 > m * 4)),
         d AS (SELECT h.doc_id, h.h FROM h, mx WHERE doc_id * 5 > m * 4),
         keep AS (SELECT doc_id, h FROM (
                    SELECT doc_id, h,
                      h IN (SELECT h FROM pre) AS in_index,
                      row_number() OVER (PARTITION BY h ORDER BY doc_id) - 1 AS n_prior
                    FROM d)
                  WHERE NOT in_index AND n_prior = 0 AND doc_id % 13 <> 0)
         SELECT h, keeper_id, from_delta FROM (
           SELECT h, keeper_id, false AS from_delta FROM liveidx
           UNION ALL
           SELECT h, doc_id AS keeper_id, true AS from_delta FROM keep)
         ORDER BY h""",
    "dedup_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         d3 AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
         s0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM d3),
         sh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s FROM s0),
         cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
         p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         j AS (SELECT da, db, CAST(shared AS DOUBLE) / (ca.c + cb.c - shared) AS jac
               FROM p JOIN cnt ca ON p.da = ca.doc_id JOIN cnt cb ON p.db = cb.doc_id)
         SELECT da, db, floor(jac * 10000) / 10000 AS jaccard
         FROM j WHERE jac >= ${Dedup.jaccardTau} ORDER BY da, db""",
    // the min-label fixpoint IS oracle SQL: transitive closure by recursive
    // CTE over the (tiny) near-dup pair graph, then min-reachable per node
    "dedup_groups" ->
      s"""${dupGroupsCtes()}
         SELECT l.doc_id, l.group_id, s.group_size
         FROM lbl l JOIN sz s ON l.group_id = s.group_id ORDER BY l.doc_id""",
    // the BUILD face returns the group table re-read from the STORED
    // artifact — SAME oracle as dedup_groups, so the hash match proves
    // stored == computed (the sink_vector_index rule on the group axis)
    "sink_dedup_groups" ->
      s"""${dupGroupsCtes()}
         SELECT l.doc_id, l.group_id, s.group_size
         FROM lbl l JOIN sz s ON l.group_id = s.group_id ORDER BY l.doc_id""",
    // the WEEKLY compaction: tombstoned docs' pairs drop and the
    // survivors RE-LABEL (a retired bridge doc splits its component);
    // oracle = the SAME recursive closure restricted to live docs, so
    // the hash match proves compacted == from-scratch-on-live
    "sink_dedup_groups_compact" ->
      s"""${dupGroupsCtes("WHERE doc_id % 13 <> 0")}
         SELECT l.doc_id, l.group_id, s.group_size
         FROM lbl l JOIN sz s ON l.group_id = s.group_id ORDER BY l.doc_id""",
    // the DAILY fold: stored base pairs + delta-bounded new pairs,
    // re-labeled — SAME oracle as dedup_groups (the full-corpus rescan),
    // so the hash match proves fold == rescan (the corpus_stats_inc rule)
    "dedup_groups_inc" ->
      s"""${dupGroupsCtes()}
         SELECT l.doc_id, l.group_id, s.group_size
         FROM lbl l JOIN sz s ON l.group_id = s.group_id ORDER BY l.doc_id""",
    "dedup_keep_best" ->
      s"""${dupGroupsCtes()},
         q AS (SELECT doc_id,
                 floor((CAST(least(len(w), 50) AS DOUBLE) / 50 * 0.5
                   + CAST(len(list_filter(w, x ->
                       x IN (${inList(TextAnalysis.stopwords.head._2)}))) AS DOUBLE)
                     / len(w) * 0.5) * 10000) / 10000 AS quality
               FROM d),
         gq AS (SELECT l.doc_id, l.group_id, s.group_size, q.quality
                FROM lbl l JOIN sz s ON l.group_id = s.group_id
                  JOIN q ON l.doc_id = q.doc_id),
         k AS (SELECT *, row_number() OVER (PARTITION BY group_id
                 ORDER BY quality DESC, doc_id) AS rk FROM gq)
         SELECT doc_id, group_id, group_size, quality, rk = 1 AS keep
         FROM k ORDER BY doc_id""",
    // soft dedup: every doc kept, weighted 1/|cluster|; singletons (no
    // near-dup pair) weigh 1.0 — the left join against the corpus axis
    "dedup_soft_weight" ->
      s"""${dupGroupsCtes()}
         SELECT dd.doc_id,
           coalesce(l.group_id, dd.doc_id) AS group_id,
           CAST(coalesce(s.group_size, 1) AS BIGINT) AS group_size,
           floor((1.0 / coalesce(s.group_size, 1)) * 10000) / 10000 AS weight
         FROM documents dd
         LEFT JOIN lbl l ON dd.doc_id = l.doc_id
         LEFT JOIN sz s ON l.group_id = s.group_id
         ORDER BY dd.doc_id""",
    // leakage-safe split: the assignment hashes the GROUP id (shared
    // dup-groups closure), so near-dup clusters cannot straddle splits;
    // the portable 60-bit md5 permille bucket replays exactly
    "split_leakage_safe" ->
      s"""${dupGroupsCtes()},
         base AS (SELECT dd.doc_id,
                    coalesce(l.group_id, dd.doc_id) AS group_id,
                    CAST(coalesce(s.group_size, 1) AS BIGINT) AS group_size
                  FROM documents dd
                  LEFT JOIN lbl l ON dd.doc_id = l.doc_id
                  LEFT JOIN sz s ON l.group_id = s.group_id),
         bk AS (SELECT *,
                  CAST(concat('0x', substring(md5(CAST(group_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 1000 AS bucket
                FROM base)
         SELECT doc_id, group_id, group_size, bucket,
           CASE WHEN bucket < ${Dedup.splitTrainPermille} THEN 'train'
                WHEN bucket < ${Dedup.splitValPermille} THEN 'val'
                ELSE 'test' END AS split
         FROM bk ORDER BY doc_id""",
    "sim_ann_cosine_topk" ->
      s"""WITH ${cosineRankCtes(Sim.nQueries)}
         SELECT query_id, neighbor_id, rank, floor(cos * 10000) / 10000 AS cos_sim
         FROM cr WHERE rank <= ${Sim.topK} ORDER BY query_id, rank""",
    // filtered vector search: the label equi-predicate joins BEFORE the
    // distance work (pre-filtering — post-filtering a plain top-k is the
    // documented failure mode), candidates restricted to the query's label
    "sim_ann_filtered" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                     FROM embeddings),
         n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel, nrm AS qn
               FROM n WHERE vec_id < ${Sim.nQueries}),
         p AS (SELECT q.query_id, CAST(q.qlabel AS BIGINT) AS label,
                 n.vec_id AS neighbor_id,
                 list_dot_product(qv, v) / (qn * nrm) AS cos
               FROM q JOIN n ON n.label = q.qlabel AND n.vec_id <> q.query_id),
         r AS (SELECT query_id, label, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
               FROM p)
         SELECT query_id, label, neighbor_id, rank,
           floor(cos * 10000) / 10000 AS cos_sim
         FROM r WHERE rank <= ${Sim.topK} ORDER BY query_id, rank""",
    "dedup_embedding_cosine" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                 list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
               FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT va, vb, floor(cos * 10000) / 10000 AS cos_sim
         FROM p WHERE cos >= ${Sim.nearDupTau} ORDER BY va, vb""",
    "text_langid" -> {
      val hits = TextAnalysis.stopwords.map { case (lang, ws) =>
        s"len(list_filter(w, x -> x IN (${inList(ws)}))) AS ${lang}_n"
      }.mkString(", ")
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents)
         SELECT doc_id, $hits,
           CASE WHEN en_n + es_n + de_n = 0 THEN 'unknown'
                WHEN en_n >= es_n AND en_n >= de_n THEN 'en'
                WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
         FROM d ORDER BY doc_id"""
    },
    "text_langid_ngram" -> {
      val hits = TextAnalysis.bigramProfiles.map { case (lang, ps) =>
        val list = ps.map(p => s"'$p'").mkString(", ")
        s"len(list_filter(list_transform(generate_series(1, length(text) - 1), " +
          s"i -> substr(text, i, 2)), x -> x IN ($list))) AS ${lang}_bg"
      }.mkString(", ")
      s"""SELECT doc_id, $hits,
         CASE WHEN en_bg + es_bg + de_bg = 0 THEN 'unknown'
              WHEN en_bg >= es_bg AND en_bg >= de_bg THEN 'en'
              WHEN es_bg >= de_bg THEN 'es' ELSE 'de' END AS pred_lang_ngram
         FROM documents ORDER BY doc_id"""
    },
    "text_quality_score" ->
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         s AS (SELECT doc_id, len(w) AS n_words,
                 len(list_filter(w, x -> x IN (${inList(TextAnalysis.stopwords.head._2)}))) AS stop_hits
               FROM d)
         SELECT doc_id, n_words,
           floor(CAST(stop_hits AS DOUBLE) / n_words * 10000) / 10000 AS stop_ratio,
           floor((CAST(least(n_words, 50) AS DOUBLE) / 50 * 0.5
                  + CAST(stop_hits AS DOUBLE) / n_words * 0.5) * 10000) / 10000 AS quality
         FROM s ORDER BY doc_id""",
    "text_token_count" ->
      s"""WITH s AS (SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS ws_tokens,
             len(regexp_extract_all(text, '${TextAnalysis.bpePattern}')) AS bpe_tokens,
             length(text) AS n_chars
           FROM documents)
         SELECT doc_id, ws_tokens, bpe_tokens,
           floor(CAST(n_chars AS DOUBLE) / bpe_tokens * 10000) / 10000 AS chars_per_token
         FROM s ORDER BY doc_id""",
    "dedup_paragraph" -> {
      val p = Dedup.paraWords
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         i AS (SELECT doc_id, w,
                 unnest(generate_series(0, CAST(floor((len(w)-1)/$p) AS INT))) AS i
               FROM d),
         c AS (SELECT doc_id,
                 md5(array_to_string(w[i*$p+1 : i*$p+$p], ' ')) AS ch
               FROM i),
         f AS (SELECT ch, count(DISTINCT doc_id) AS cdf FROM c GROUP BY 1)
         SELECT c.doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.cdf >= ${Dedup.paraMinDf} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           floor(sum(CASE WHEN f.cdf >= ${Dedup.paraMinDf} THEN 1 ELSE 0 END)
                 * 10000.0 / count(*)) / 10000 AS boiler_frac
         FROM c JOIN f ON c.ch = f.ch
         GROUP BY c.doc_id ORDER BY c.doc_id"""
    },
    "dedup_paragraph_strip" -> {
      val p = Dedup.paraWords
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         i AS (SELECT doc_id, w,
                 unnest(generate_series(0, CAST(floor((len(w)-1)/$p) AS INT))) AS i
               FROM d),
         c AS MATERIALIZED (SELECT doc_id, i AS pos,
                 array_to_string(w[i*$p+1 : i*$p+$p], ' ') AS chunk,
                 md5(array_to_string(w[i*$p+1 : i*$p+$p], ' ')) AS ch
               FROM i),
         f AS (SELECT ch, count(DISTINCT doc_id) AS cdf FROM c GROUP BY 1)
         SELECT c.doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.cdf < ${Dedup.paraMinDf} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           coalesce(array_to_string(
             list(c.chunk ORDER BY c.pos) FILTER (WHERE f.cdf < ${Dedup.paraMinDf}),
             ' '), '') AS cleaned_text
         FROM c JOIN f ON c.ch = f.ch
         GROUP BY c.doc_id ORDER BY c.doc_id"""
    },
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN ts END AS c_ts
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (SELECT *,
             last_value(c_id IGNORE NULLS) OVER win AS asof_click_id,
             last_value(c_ts IGNORE NULLS) OVER win AS asof_click_ts
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, asof_click_id,
           epoch_ns(ts) // 1000000000 - epoch_ns(asof_click_ts) // 1000000000 AS gap_sec
         FROM w WHERE event_type = 'purchase' ORDER BY event_id""",
    "sample_stratified" -> {
      val values = TrainData.sampleRates
        .map { case (k, r) => s"('$k', $r)" }.mkString(", ")
      s"""WITH rates(event_type, rate) AS (VALUES $values)
         SELECT e.event_id, e.event_type, e.user_id
         FROM events e JOIN rates r ON e.event_type = r.event_type
         WHERE (e.event_id % 100003) * 2654435761 % 1000000
               < CAST(r.rate AS DOUBLE) * 1000000
         ORDER BY e.event_id"""
    },
    "sample_stratified_stats" -> {
      val values = TrainData.sampleRates
        .map { case (k, r) => s"('$k', $r)" }.mkString(", ")
      s"""WITH rates(event_type, rate) AS (VALUES $values)
         SELECT e.event_type, count(*) AS n_total,
           CAST(sum(CASE WHEN (e.event_id % 100003) * 2654435761 % 1000000
                         < CAST(r.rate AS DOUBLE) * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           floor(sum(CASE WHEN (e.event_id % 100003) * 2654435761 % 1000000
                               < CAST(r.rate AS DOUBLE) * 1000000
                               THEN 1 ELSE 0 END)
                 * 10000.0 / count(*)) / 10000 AS realized
         FROM events e JOIN rates r ON e.event_type = r.event_type
         GROUP BY e.event_type ORDER BY e.event_type"""
    },
    "q_value_quantiles" ->
      """SELECT event_type, count(*) AS n,
           floor(quantile_cont(value, 0.5) * 10000) / 10000 AS p50,
           floor(quantile_cont(value, 0.9) * 10000) / 10000 AS p90,
           floor(quantile_cont(value, 0.99) * 10000) / 10000 AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
         f AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE len(w) >= 2),
         g AS (SELECT doc_id, nw, unnest(generate_series(1, nw - 1)) AS i, w FROM f),
         pg AS (SELECT doc_id, nw, w[i] || ' ' || w[i+1] AS gram, count(*) AS c
                FROM g GROUP BY 1, 2, 3),
         agg AS (SELECT doc_id, nw, count(*) AS d_grams, max(c) AS top_run
                 FROM pg GROUP BY 1, 2),
         wrd AS (SELECT doc_id, len(list_distinct(w)) AS d_words FROM f)
         SELECT a.doc_id, a.nw AS n_words, a.nw - 1 AS n_grams,
           floor((1.0 - wrd.d_words / CAST(a.nw AS DOUBLE)) * 10000) / 10000
             AS dup_word_frac,
           floor((1.0 - a.d_grams / CAST(a.nw - 1 AS DOUBLE)) * 10000) / 10000
             AS dup_gram_frac,
           floor(a.top_run / CAST(a.nw - 1 AS DOUBLE) * 10000) / 10000
             AS top_gram_frac
         FROM agg a JOIN wrd ON a.doc_id = wrd.doc_id ORDER BY a.doc_id""",
    // BM25 retrieval: rational odds idf (log-free — the one libm call with
    // no cross-engine guarantee) and per-term micro-unit (×1e6 BIGINT)
    // contributions so the summed score is exact and order-independent;
    // shape constants interpolated from the Scala vals so both engines
    // parse the SAME double literals. df from matched postings only (equal
    // to corpus-wide df per matched term); no df cap — the rational idf
    // already collapses for corpus-wide terms (see bm25TopKDocs Scaladoc).
    "text_bm25_topk" ->
      s"""WITH ${bm25RankCtes()}
         SELECT query_id, doc_id, rank, n_terms, score_q6
         FROM lxr WHERE rank <= ${TrainData.bm25TopK} ORDER BY query_id, rank""",
    // Reciprocal Rank Fusion over the two ranking chains — BOTH legs are
    // the shared builders (bm25RankCtes / cosineRankCtes), so the fused
    // result provably comes from the same leg math as the standalone
    // faces; the fusion itself is all-integer (1e6 div (k + rank))
    "retrieval_hybrid_rrf" ->
      s"""WITH ${bm25RankCtes()},
         ${cosineRankCtes(TrainData.bm25NQueries)},
         ${rrfFuseSql(
           s"""SELECT query_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
              FROM lxr WHERE rank <= ${TrainData.rrfDepth}""",
           s"""SELECT query_id, neighbor_id AS doc_id,
                CAST(rank AS BIGINT) AS vec_rank
              FROM cr WHERE rank <= ${TrainData.rrfDepth}""")}""",
    // the stored-index hybrid: SAME bm25 ranking CTEs (stored == computed
    // on the lexical leg is sink_text_index's proven contract), vector
    // leg = the SAME ivf-pq chain as sim_ann_ivfpq (stored == computed is
    // sink_vector_index's), fused by the SAME rrfFuseSql builder — the
    // hash match proves fused-from-storage == fused-from-plan leg math
    "retrieval_hybrid_rrf_stored" -> hybridStoredSql,
    // the mid-day (upserted, not-yet-rewritten indexes) hybrid: SAME
    // oracle as the stored hybrid — the hash match proves serving from
    // day-old indexes on BOTH axes loses nothing a reader can observe
    // (fresh-df lexical == in-plan truth; the vector append == the build)
    "retrieval_hybrid_rrf_stored_fresh" -> hybridStoredSql,
    // the SERVE-ONLY hybrid reads the session's ensured artifacts instead
    // of writing indexes in-query: identical leg + fusion math, SAME
    // oracle — the hash match proves the serve path alone reproduces the
    // self-contained face (whose build half is already proven by the sink
    // oracles)
    "retrieval_hybrid_rrf_serve" -> hybridStoredSql,
    // the SERVE-ONLY lexical face: stored-served is bit-equal to the
    // in-plan ranking by the shared scoring expressions — text_bm25_topk's
    // oracle verbatim
    "text_bm25_serve" ->
      s"""WITH ${bm25RankCtes()}
         SELECT query_id, doc_id, rank, n_terms, score_q6
         FROM lxr WHERE rank <= ${TrainData.bm25TopK} ORDER BY query_id, rank""",
    // readback-stats oracle for the persisted lexical index: per term-hash
    // bucket (the portable 60-bit md5 hash — the dedup_audit replay), the
    // posting rows, distinct terms/docs and total tf the stored files must
    // re-aggregate to; shares the postings CTEs with text_bm25_topk
    "sink_text_index" -> textIndexStatsSql(""),
    // the compaction face: the SAME stats builder restricted to live
    // (non-tombstoned) documents — a hash match proves the rewritten
    // directory equals a from-scratch build over the surviving docs
    "sink_text_index_compact" ->
      textIndexStatsSql(s"WHERE doc_id % 13 <> 0"),
    // the daily append: SAME oracle as the from-scratch build — the stats
    // face never reads df, so the hash match proves base ∪ delta equals
    // the full build on the posting rows (the sink_vector_index_upsert
    // rule on the lexical axis)
    "sink_text_index_upsert" -> textIndexStatsSql(""),
    // serving an UPSERTED (stale-stored-df) index through the fresh-df
    // face: SAME oracle as text_bm25_topk — the hash match proves a
    // day-old index served fresh equals the in-plan truth, i.e. serving
    // between rewrites never reads a stale df
    "text_bm25_stored_fresh" ->
      s"""WITH ${bm25RankCtes()}
         SELECT query_id, doc_id, rank, n_terms, score_q6
         FROM lxr WHERE rank <= ${TrainData.bm25TopK} ORDER BY query_id, rank""",
    "retrieval_audit" -> retrievalAuditSql,
    "retrieval_eval_ndcg" -> retrievalEvalNdcgSql,
    // the planted twin-corpus eval: constructed judgments (labels known
    // by the plant design), augmented sources via the parameterized chain
    // builders, SAME scoring tail — discriminating NDCG on all 4 systems
    "retrieval_eval_ndcg_planted" -> retrievalEvalNdcgPlantedSql,
    "text_contamination" -> {
      val g = TrainData.contamGram
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         gs AS (SELECT doc_id,
                  list_distinct(list_transform(generate_series(1, len(w) - ${g - 1}),
                    i -> array_to_string(w[i : i + ${g - 1}], ' '))) AS grams
                FROM d WHERE len(w) >= $g),
         e AS (SELECT DISTINCT unnest(grams) AS gram FROM gs
               WHERE doc_id % ${TrainData.contamEvalMod} = 0),
         tr AS (SELECT doc_id, unnest(grams) AS gram FROM gs
                WHERE doc_id % ${TrainData.contamEvalMod} <> 0),
         h AS (SELECT tr.doc_id, count(*) AS n_hits
               FROM tr JOIN e ON tr.gram = e.gram GROUP BY 1)
         SELECT d.doc_id, greatest(len(d.w) - ${g - 1}, 0) AS n_grams,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
         FROM d LEFT JOIN h ON d.doc_id = h.doc_id
         WHERE d.doc_id % ${TrainData.contamEvalMod} <> 0
         ORDER BY d.doc_id"""
    },
    "pack_sequences_split" -> {
      val b = TrainData.packBudget
      s"""WITH d AS (SELECT doc_id,
             (doc_id % 100003) * 2654435761 % 1000000 % ${TrainData.packShards} AS shard,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS tok
           FROM documents),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM d WHERE tok > 0),
         s AS (SELECT doc_id, shard, tok, CAST(cum AS BIGINT) AS cum,
                 CAST(cum - tok AS BIGINT) AS strt FROM c),
         x AS (SELECT doc_id, shard, strt, cum,
                 unnest(generate_series(strt // $b, (cum - 1) // $b)) AS bin
               FROM s)
         SELECT doc_id, shard, bin,
           least(cum, (bin + 1) * $b) - greatest(strt, bin * $b) AS tok_in_bin,
           bin = strt // $b AS is_head
         FROM x ORDER BY doc_id, bin"""
    },
    "pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
             (doc_id % 100003) * 2654435761 % 1000000 % ${TrainData.packShards} AS shard,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS tok
           FROM documents),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
         SELECT doc_id, shard, tok,
           CAST(floor((cum - tok) / ${TrainData.packBudget}.0) AS BIGINT) AS bin
         FROM c ORDER BY doc_id""",
    "pack_sequences_stats" ->
      s"""WITH d AS (SELECT doc_id,
             (doc_id % 100003) * 2654435761 % 1000000 % ${TrainData.packShards} AS shard,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS tok
           FROM documents),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
         b AS (SELECT shard,
                 CAST(floor((cum - tok) / ${TrainData.packBudget}.0) AS BIGINT) AS bin,
                 tok
               FROM c)
         SELECT shard, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           floor(sum(tok) * 10000.0 / ${TrainData.packBudget}) / 10000 AS fill
         FROM b GROUP BY shard, bin ORDER BY shard, bin""",
    "pipeline_curation" -> {
      val g = TrainData.contamGram
      s"""WITH d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
           FROM documents),
         q AS (SELECT doc_id, w, h, len(w) AS tok,
                 floor((CAST(least(len(w), 50) AS DOUBLE) / 50 * 0.5
                   + CAST(len(list_filter(w, x -> x IN
                       (${inList(TextAnalysis.stopwords.head._2)}))) AS DOUBLE)
                     / len(w) * 0.5) * 10000) / 10000 AS quality
               FROM d),
         dd AS (SELECT q.* FROM q
                JOIN (SELECT h, min(doc_id) AS keep_id FROM q GROUP BY h) k
                  ON q.h = k.h AND q.doc_id = k.keep_id),
         gs AS (SELECT doc_id,
                  list_distinct(list_transform(generate_series(1, len(w) - ${g - 1}),
                    i -> array_to_string(w[i : i + ${g - 1}], ' '))) AS grams
                FROM dd WHERE len(w) >= $g),
         e AS (SELECT DISTINCT unnest(grams) AS gram FROM gs
               WHERE doc_id % ${TrainData.contamEvalMod} = 0),
         bad AS (SELECT DISTINCT tr.doc_id
                 FROM (SELECT doc_id, unnest(grams) AS gram FROM gs
                       WHERE doc_id % ${TrainData.contamEvalMod} <> 0) tr
                 JOIN e ON tr.gram = e.gram),
         clean AS (SELECT dd.doc_id,
                     (dd.doc_id % 100003) * 2654435761 % 1000000
                       % ${TrainData.packShards} AS shard,
                     CAST(dd.tok AS BIGINT) AS tok, dd.quality
                   FROM dd
                   WHERE dd.doc_id % ${TrainData.contamEvalMod} <> 0
                     AND dd.doc_id NOT IN (SELECT doc_id FROM bad)
                     AND dd.quality >= ${TrainData.curationMinQuality}),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM clean)
         SELECT doc_id, shard, tok, quality,
           CAST(floor((cum - tok) / ${TrainData.packBudget}.0) AS BIGINT) AS bin
         FROM c ORDER BY doc_id"""
    },
    "dedup_substring" -> {
      val k = Dedup.substrK
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         base AS (SELECT doc_id, len(w) AS n_words, w FROM d),
         wk AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - $k + 1)) AS i
                FROM base WHERE n_words >= $k),
         wins AS (SELECT doc_id, i AS pos,
             CAST(concat('0x', substring(md5(array_to_string(w[i:i+${k - 1}], ' ')), 1, 15))
               AS BIGINT) AS h
           FROM wk),
         dfc AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                                FROM wins GROUP BY h) WHERE nd > 1),
         dup AS (SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dfc)),
         led AS (SELECT doc_id, pos,
                   lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
                 FROM dup),
         pd AS (SELECT doc_id, count(*) AS n_dup_wins,
             CAST(sum(CASE WHEN np IS NULL THEN $k
                           ELSE least($k, np - pos) END) AS BIGINT) AS covered_toks
           FROM led GROUP BY doc_id)
         SELECT b.doc_id, b.n_words,
           coalesce(pd.n_dup_wins, 0) AS n_dup_wins,
           coalesce(pd.covered_toks, 0) AS covered_toks,
           floor(CAST(coalesce(pd.covered_toks, 0) AS DOUBLE) / b.n_words * 10000)
             / 10000 AS dup_frac,
           floor(CAST(coalesce(pd.covered_toks, 0) AS DOUBLE) / b.n_words * 10000)
             / 10000 < ${Dedup.substrDropTau} AS keep
         FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id ORDER BY b.doc_id"""
    },
    "dedup_minhash_lsh" -> {
      val p = Dedup.MersennePrime
      val mins = (0 until Dedup.minhashK).map(j =>
        s"min((h0 * ${2 * j + 3} + ${j.toLong * 2654435761L} + 1) % $p) AS mh$j").mkString(", ")
      val allMh = (0 until Dedup.minhashK).map(j => s"mh$j").mkString(", ")
      val bandSelects = (0 until Dedup.minhashK / Dedup.bandSize).map { b =>
        val cols = (b * Dedup.bandSize until (b + 1) * Dedup.bandSize)
          .map(j => s"mh$j").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws(':', $cols)) AS band_key FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         d3 AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
         s0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM d3),
         sh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s FROM s0),
         h AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % $p AS h0
               FROM sh),
         sig AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         bands AS ($bandSelects),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id),
         nc AS (SELECT doc_id, count(*) AS n FROM
                  (SELECT da AS doc_id FROM cand UNION ALL SELECT db FROM cand)
                GROUP BY doc_id)
         SELECT s.doc_id, md5(concat_ws(':', $allMh)) AS sig_id,
           coalesce(nc.n, 0) AS n_candidates
         FROM sig s LEFT JOIN nc ON s.doc_id = nc.doc_id ORDER BY s.doc_id"""
    },
    "dedup_minhash_inc" -> {
      val p = Dedup.MersennePrime
      val mins = (0 until Dedup.minhashK).map(j =>
        s"min((h0 * ${2 * j + 3} + ${j.toLong * 2654435761L} + 1) % $p) AS mh$j").mkString(", ")
      val agreeSql = (0 until Dedup.minhashK)
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      val allMh = (0 until Dedup.minhashK).map(j => s"mh$j").mkString(", ")
      val bandSelects = (0 until Dedup.minhashK / Dedup.bandSize).map { b =>
        val cols = (b * Dedup.bandSize until (b + 1) * Dedup.bandSize)
          .map(j => s"mh$j").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws(':', $cols)) AS band_key FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         d3 AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
         s0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM d3),
         sh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s FROM s0),
         h AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % $p AS h0
               FROM sh),
         sig AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         mx AS (SELECT max(doc_id) AS m FROM sig),
         bands AS ($bandSelects),
         db AS (SELECT b.* FROM bands b, mx WHERE b.doc_id * 5 > mx.m * 4),
         ib AS (SELECT b.* FROM bands b, mx WHERE NOT (b.doc_id * 5 > mx.m * 4)),
         cand AS (
           SELECT DISTINCT a.doc_id, b.doc_id AS pid, TRUE AS from_index
           FROM db a JOIN ib b
             ON a.band = b.band AND a.band_key = b.band_key
           UNION ALL
           SELECT DISTINCT a.doc_id, b.doc_id, FALSE
           FROM db a JOIN db b
             ON a.band = b.band AND a.band_key = b.band_key
                AND b.doc_id < a.doc_id),
         est AS (SELECT c.doc_id, c.pid, c.from_index,
             ($agreeSql) / ${Dedup.minhashK}.0 AS est
           FROM cand c
           JOIN sig sa ON c.doc_id = sa.doc_id
           JOIN sig sb ON c.pid = sb.doc_id),
         ver AS (SELECT doc_id,
             CAST(sum(CASE WHEN from_index THEN 1 ELSE 0 END) AS BIGINT) AS n_idx,
             CAST(sum(CASE WHEN NOT from_index THEN 1 ELSE 0 END) AS BIGINT) AS n_pri,
             max(est) AS max_est
           FROM est GROUP BY doc_id),
         delta AS (SELECT s.* FROM sig s, mx WHERE s.doc_id * 5 > mx.m * 4)
         SELECT s.doc_id, md5(concat_ws(':', $allMh)) AS sig_id,
           coalesce(v.n_idx, 0) AS n_index_candidates,
           coalesce(v.n_pri, 0) AS n_prior_candidates,
           floor(coalesce(v.max_est, 0) * 10000) / 10000 AS max_est,
           coalesce(v.max_est >= ${Dedup.minhashVerifyTau}, FALSE) AS is_dup
         FROM delta s LEFT JOIN ver v ON s.doc_id = v.doc_id
         ORDER BY s.doc_id"""
    },
    "dedup_simhash" -> {
      val bits = Dedup.simhashBits
      val bsum = (0 until bits).map(i => s"sum((h >> $i) & 1) AS b$i").mkString(", ")
      val sim = (0 until bits)
        .map(i => s"CASE WHEN b$i * 2 > n_tok THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         tk AS (SELECT doc_id, unnest(w) AS tok FROM d),
         hh AS (SELECT doc_id,
                  CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
                FROM tk),
         agg AS (SELECT doc_id, count(*) AS n_tok, $bsum FROM hh GROUP BY doc_id),
         docs AS (SELECT doc_id, $sim AS simhash FROM agg),
         ${bandedNearSql("docs", "simhash", bits)},
         nf AS (SELECT da, db FROM near
                WHERE bit_count(xor(sa, sb)) <= ${Dedup.simhashMaxHamming}),
         nn AS (SELECT doc_id, count(*) AS n FROM
                  (SELECT da AS doc_id FROM nf UNION ALL SELECT db FROM nf)
                GROUP BY doc_id)
         SELECT d2.doc_id, d2.simhash, coalesce(nn.n, 0) AS n_near
         FROM docs d2 LEFT JOIN nn ON d2.doc_id = nn.doc_id ORDER BY d2.doc_id"""
    },
    "text_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
         hs AS (SELECT doc_id,
                  list_transform(w, x ->
                    CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % 1000000007) AS hl
                FROM d),
         f AS (SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS BIGINT), hl),
                   (a, x) -> (a * 131 + x) % 1000000007) AS fp
               FROM hs),
         d3 AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
         s0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM d3),
         sh AS (SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s FROM s0),
         mn AS (SELECT doc_id,
                  min(CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % 1000000007)
                    AS fp_min
                FROM sh GROUP BY doc_id)
         SELECT f.doc_id, f.fp, coalesce(mn.fp_min, -1) AS fp_min
         FROM f LEFT JOIN mn ON f.doc_id = mn.doc_id ORDER BY f.doc_id""",
    "sim_ann_lsh" -> {
      // banded multi-table signatures: per table tb, the band key is the
      // sign pattern of planes p = tb*planes + j (same sin-derived planes
      // as Sim.lshBandKey). The plane count is CORPUS-DERIVED in SQL with
      // the same integer-exact rule as Sim.lshPlanesFor — smallest p >= 4
      // with targetPop<<p >= count(*) — never via floating log2, whose
      // ceil can differ by one ulp between engines at power-of-two counts
      val tableVals = (0 until Sim.lshTables).map(tb => s"($tb)").mkString(", ")
      s"""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
         np AS (SELECT greatest(4,
                  coalesce((SELECT min(g.p) FROM generate_series(1, 31) g(p), cnt
                   WHERE (CAST(${Sim.lshTargetBucketPop} AS BIGINT) << g.p) >= cnt.n), 31))
                  AS planes),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         bj AS (SELECT e.vec_id, e.v, tb.t AS tbl, np.planes AS planes,
                  unnest(range(np.planes)) AS j
                FROM e CROSS JOIN (VALUES $tableVals) tb(t) CROSS JOIN np),
         bits AS (SELECT vec_id, tbl,
                    CASE WHEN list_dot_product(v,
                      list_transform(generate_series(0, 63),
                        d -> sin(((tbl * planes + j) * 1009 + 31) * (d + 1)))) >= 0
                    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bit
                  FROM bj),
         b AS (SELECT vec_id, tbl, sum(bit) AS band_key
               FROM bits GROUP BY vec_id, tbl),
         p AS (SELECT a.vec_id, b2.vec_id AS neighbor_id,
                 list_dot_product(ea.v, eb.v)
                   / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
               FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.band_key = b2.band_key
                 AND a.vec_id <> b2.vec_id
               JOIN e ea ON ea.vec_id = a.vec_id
               JOIN e eb ON eb.vec_id = b2.vec_id),
         r AS (SELECT vec_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, neighbor_id) AS rank
               FROM p)
         SELECT vec_id, neighbor_id, floor(cos * 10000) / 10000 AS cos_sim
         FROM r WHERE rank = 1 ORDER BY vec_id"""
    },
    "text_unigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
         tk AS (SELECT doc_id, unnest(w) AS tok FROM d),
         v AS (SELECT tok, count(*) AS tf FROM tk GROUP BY 1),
         tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n_total FROM v),
         s AS (SELECT tk.doc_id, -log2(CAST(v.tf AS DOUBLE) / tot.n_total) AS nll
               FROM tk JOIN v ON tk.tok = v.tok CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_tok,
           floor(sum(nll) / count(*) * 100) / 100 AS mean_nll
         FROM s GROUP BY doc_id ORDER BY doc_id""",
    "emb_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         s AS (SELECT vec_id, v,
                 list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS scale
               FROM e),
         q AS (SELECT vec_id, v, scale,
                 list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)) AS qv
               FROM s),
         err AS (SELECT vec_id, scale, qv,
                   list_sum(list_transform(generate_series(1, len(v)),
                     i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale))) AS err,
                   sqrt(list_dot_product(v, v)) AS nrm
                 FROM q)
         SELECT vec_id, floor(scale * 1000000) / 1000000 AS scale6,
           floor(sqrt(err) / nrm * 10000) / 10000 AS rel_err,
           len(list_filter(qv, qi -> abs(qi) = 127)) AS n_saturated
         FROM err ORDER BY vec_id""",
    "text_c4_filters" -> {
      import TextAnalysis.{c4MinWords, c4MeanLenLo, c4MeanLenHi, c4ShortFracMax}
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         s AS (SELECT doc_id, len(w) AS n_words,
                 list_aggregate(list_transform(w, x -> len(x)), 'sum') AS sum_len,
                 len(list_filter(w, x -> len(x) <= 2)) AS n_short,
                 list_aggregate(list_transform(w, x -> len(x)), 'max') AS max_word_len
               FROM d),
         f AS (SELECT doc_id, n_words,
                 floor(CAST(sum_len AS DOUBLE) / n_words * 10000) / 10000 AS mean_word_len,
                 floor(CAST(n_short AS DOUBLE) / n_words * 10000) / 10000 AS short_frac,
                 max_word_len
               FROM s)
         SELECT doc_id, n_words, mean_word_len, short_frac, max_word_len,
           (n_words >= $c4MinWords
            AND mean_word_len >= $c4MeanLenLo AND mean_word_len <= $c4MeanLenHi
            AND short_frac <= $c4ShortFracMax) AS keep
         FROM f ORDER BY doc_id"""
    },
    "text_top_ngrams" ->
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         f AS (SELECT doc_id, w FROM d WHERE len(w) >= 2),
         g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1])) AS gram
               FROM f)
         SELECT gram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
         FROM g GROUP BY gram
         ORDER BY n_occ DESC, gram LIMIT ${TextAnalysis.topNgramK}""",
    "mix_domains" -> {
      val values = TrainData.domainWeights
        .map { case (k, w) => s"('$k', $w)" }.mkString(", ")
      s"""WITH wts(source, weight) AS (VALUES $values),
         d AS (SELECT doc_id, d.source, lang,
                 CAST(coalesce(w.weight, ${TrainData.domainDefaultWeight}) AS DOUBLE)
                   AS weight
               FROM documents d LEFT JOIN wts w ON d.source = w.source)
         SELECT doc_id, source, lang, weight FROM d
         WHERE (doc_id % 100003) * 2654435761 % 1000000 < weight * 1000000
         ORDER BY doc_id"""
    },
    "mix_domains_stats" -> {
      val values = TrainData.domainWeights
        .map { case (k, w) => s"('$k', $w)" }.mkString(", ")
      s"""WITH wts(source, weight) AS (VALUES $values),
         d AS (SELECT doc_id, d.source,
                 CAST(coalesce(w.weight, ${TrainData.domainDefaultWeight}) AS DOUBLE)
                   AS weight
               FROM documents d LEFT JOIN wts w ON d.source = w.source)
         SELECT source, weight, count(*) AS n_total,
           CAST(sum(CASE WHEN (doc_id % 100003) * 2654435761 % 1000000
                              < weight * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           floor(sum(CASE WHEN (doc_id % 100003) * 2654435761 % 1000000
                               < weight * 1000000 THEN 1 ELSE 0 END)
                 * 10000.0 / count(*)) / 10000 AS realized
         FROM d GROUP BY source, weight ORDER BY source"""
    },
    "emb_cluster_assign" ->
      s"""WITH ${centroidAssignCtes()}
         SELECT vec_id, cluster, floor(ccos * 10000) / 10000 AS cos_sim
         FROM a ORDER BY vec_id""",
    "dedup_semantic" ->
      s"""WITH ${centroidAssignTwoStageCtes()},
         pr AS (SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb,
                  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
                FROM a JOIN a b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
         SELECT cluster, va, vb, floor(cos * 10000) / 10000 AS cos_sim
         FROM pr WHERE cos >= ${Sim.nearDupTau} ORDER BY va, vb""",
    "enrich_url_decode" -> {
      // one percent-decode pass over the corpus's bounded escape set; the
      // order ('%20' before '%25') can't mis-fire because '%2520' contains
      // neither '%20' nor '%3D'/'%26' as a substring
      def pass(s: String) =
        s"replace(replace(replace(replace(replace($s, '+', ' '), '%20', ' '), " +
          "'%3D', '='), '%26', '&'), '%25', '%')"
      val valid = "'([^%]|%[0-9a-fA-F]{2})*'"
      s"""WITH r AS (SELECT event_id,
           CASE event_id % 5
             WHEN 0 THEN 'https://a.cn/p?q=hello%20world&x=1'
             WHEN 1 THEN 'k%253Dv%2526w' || CAST(event_id % 7 AS VARCHAR)
             WHEN 2 THEN 'plain/no/escapes'
             WHEN 3 THEN 'bad%zzpct'
             ELSE 'a+b%20c' || CAST(event_id % 3 AS VARCHAR) END AS url_enc
           FROM events),
         d AS (SELECT event_id, url_enc,
             regexp_full_match(url_enc, $valid) AS v1,
             ${pass("url_enc")} AS p1
           FROM r),
         d2 AS (SELECT *, regexp_full_match(p1, $valid) AS v2,
             ${pass("p1")} AS p2
           FROM d)
         SELECT event_id, url_enc,
           CASE WHEN NOT v1 THEN url_enc
                WHEN contains(p1, '%') THEN
                  CASE WHEN v2 THEN p2 ELSE url_enc END
                ELSE p1 END AS decoded
         FROM d2 ORDER BY event_id"""
    },
    "etl_ts_choose" ->
      """SELECT event_id,
           CAST(event_id % 4 + 1 AS INT) AS sdk_code,
           CASE WHEN event_id % 4 + 1 = 3
             THEN epoch_ns(ts) // 1000000000 + event_id % 120
             ELSE epoch_ns(ts) // 1000000000 END AS chosen_ts,
           's' || CAST(event_id % 100 AS VARCHAR)
             || lpad(CAST(event_id % 1000000000 AS VARCHAR), 9, '0') AS session_id
         FROM events ORDER BY event_id""",
    "etl_date_parse" ->
      """WITH r AS (SELECT event_id,
           CASE event_id % 4
             WHEN 0 THEN '2023-01-0' || CAST(event_id % 9 + 1 AS VARCHAR)
               || 'T08:11:2' || CAST(event_id % 6 AS VARCHAR) || 'Z'
             WHEN 1 THEN '2023-01-0' || CAST(event_id % 9 + 1 AS VARCHAR)
               || 'T08:1' || CAST(event_id % 6 AS VARCHAR) || 'Z'
             WHEN 2 THEN ''
             ELSE '04/01/2023 08:11' END AS date_raw
           FROM events)
         SELECT event_id, date_raw,
           coalesce(CAST(epoch_ms(CASE WHEN length(date_raw) > 17
             THEN try_strptime(date_raw, '%Y-%m-%dT%H:%M:%SZ')
             ELSE try_strptime(date_raw, '%Y-%m-%dT%H:%MZ') END) AS BIGINT), 0)
             AS ts_millis
         FROM r ORDER BY event_id""",
    "etl_sdkv_compare" ->
      """WITH r AS (SELECT event_id,
           CASE WHEN event_id % 2 = 0
             THEN 'v1.' || CAST(event_id % 3 AS VARCHAR)
             ELSE 'v1.' || CAST(event_id % 3 AS VARCHAR)
                  || '.' || CAST(event_id % 5 AS VARCHAR) END AS sdkv_a,
           CASE event_id % 3 WHEN 0 THEN 'v1.0.7' WHEN 1 THEN 'v1.1'
             ELSE 'v1.1.2.9' END AS sdkv_b
           FROM events),
         s AS (SELECT *,
             string_split(replace(sdkv_a, 'v', ''), '.') AS av,
             string_split(replace(sdkv_b, 'v', ''), '.') AS bv
           FROM r),
         d AS (SELECT event_id, av, bv,
             unnest(generate_series(1, len(av))) AS i FROM s),
         dec AS (SELECT event_id, i,
             CASE WHEN i > len(bv) THEN 1
                  WHEN CAST(av[i] AS INT) > CAST(bv[i] AS INT) THEN 1
                  WHEN CAST(av[i] AS INT) < CAST(bv[i] AS INT) THEN -1
                  ELSE 0 END AS dc
           FROM d),
         fz AS (SELECT event_id,
             coalesce(arg_min(dc, i) FILTER (WHERE dc <> 0), 0) AS cmp
           FROM dec GROUP BY event_id)
         SELECT r.event_id, r.sdkv_a, r.sdkv_b, CAST(fz.cmp AS INT) AS cmp,
           coalesce(TRY_CAST(substring(r.sdkv_a, 2) AS DOUBLE), 0.0) AS sdkv_num
         FROM r JOIN fz USING (event_id) ORDER BY r.event_id""",
    "dim_user_profile" -> {
      val gVals = operators.Route.genderDim
        .map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      val jVals = operators.Route.jailDim
        .map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      s"""WITH r AS (SELECT event_id,
           CASE event_id % 10 WHEN 0 THEN 'm' WHEN 1 THEN 'MALE'
             WHEN 2 THEN '男' WHEN 3 THEN 'f' WHEN 4 THEN 'Female'
             WHEN 5 THEN '女' WHEN 6 THEN 'n' WHEN 7 THEN 'none'
             WHEN 8 THEN '未知' ELSE 'x' END AS gender_raw,
           CASE event_id % 4 WHEN 0 THEN '' WHEN 1 THEN '0'
             WHEN 2 THEN '1' ELSE '2' END AS jail_raw,
           CASE (event_id + 1) % 4 WHEN 0 THEN '' WHEN 1 THEN '0'
             WHEN 2 THEN '1' ELSE '2' END AS pirate_raw,
           CASE event_id % 3
             WHEN 0 THEN '46000' || CAST(event_id % 10 AS VARCHAR)
             WHEN 1 THEN '中国移动'
             ELSE '4600' || CAST(event_id % 10 AS VARCHAR) END AS carrier_raw,
           CASE WHEN event_id % 2 = 0
             THEN '1992/03/0' || CAST(event_id % 9 + 1 AS VARCHAR)
             ELSE 'bad-date' END AS birthday_raw,
           CASE event_id % 3
             WHEN 0 THEN '+8613800138' || lpad(CAST(event_id % 100 AS VARCHAR), 3, '0')
             WHEN 1 THEN '138abc'
             ELSE '13800' || lpad(CAST(event_id % 1000 AS VARCHAR), 4, '0')
             END AS phone_raw,
           CASE event_id % 3 WHEN 0 THEN 'v1.' || CAST(event_id % 10 AS VARCHAR)
             WHEN 1 THEN '1.2' ELSE 'v' END AS sdkv_raw
           FROM events),
         g(gk, gid) AS (VALUES $gVals),
         j(jk, jid) AS (VALUES $jVals),
         p2 AS (SELECT r.*, CASE WHEN length(phone_raw) > 11
                  THEN substring(phone_raw, length(phone_raw) - 10, 11)
                  ELSE phone_raw END AS ptail FROM r)
         SELECT p2.event_id,
           coalesce(g.gid, 0) AS gender_id,
           coalesce(j1.jid, 0) AS jail_id,
           coalesce(j2.jid, 0) AS pirate_id,
           CASE WHEN regexp_full_match(carrier_raw, '[0-9]{6}')
             THEN CAST(carrier_raw AS INTEGER) ELSE 0 END AS carrier_code,
           strftime(try_strptime(birthday_raw, '%Y/%m/%d'), '%Y%m%d') AS birthday_fmt,
           CASE WHEN regexp_full_match(ptail, '[0-9]+') THEN ptail
             ELSE NULL END AS phone_norm,
           regexp_full_match(sdkv_raw, 'v([0-9]+\\.)*[0-9]+') AS sdkv_valid
         FROM p2
         LEFT JOIN g ON lower(p2.gender_raw) = g.gk
         LEFT JOIN j j1 ON p2.jail_raw = j1.jk
         LEFT JOIN j j2 ON p2.pirate_raw = j2.jk
         ORDER BY p2.event_id"""
    },
    "id_incremental_assign" ->
      s"""WITH ${Envelope.oracleRaw},
         old AS (SELECT DISTINCT appkey, did FROM raw
                 WHERE appkey <> '' AND did <> ''
                   AND CAST(('0x' || substring(md5(appkey || ':' || did), 1, 15))
                            AS BIGINT) % 2 = 0),
         ex AS (SELECT appkey, did,
                  dense_rank() OVER (PARTITION BY appkey ORDER BY did) AS zg_did
                FROM old),
         today AS (SELECT DISTINCT appkey, did FROM raw
                   WHERE appkey <> '' AND did <> ''),
         nw AS (SELECT t.appkey, t.did FROM today t
                LEFT JOIN ex ON t.appkey = ex.appkey AND t.did = ex.did
                WHERE ex.did IS NULL),
         mx AS (SELECT appkey, max(zg_did) AS max_id FROM ex GROUP BY appkey),
         asg AS (SELECT n.appkey, n.did,
                   coalesce(m.max_id, 0)
                     + dense_rank() OVER (PARTITION BY n.appkey ORDER BY n.did)
                     AS zg_did
                 FROM nw n LEFT JOIN mx m ON n.appkey = m.appkey)
         SELECT appkey, did, zg_did, false AS is_new FROM ex
         UNION ALL
         SELECT appkey, did, zg_did, true AS is_new FROM asg
         ORDER BY appkey, did""",
    "emb_quality_audit" -> {
      val d = Sim.expectedDims
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         b AS (SELECT count(*) AS n_vectors,
             CAST(sum(CASE WHEN len(v) <> $d THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
             CAST(sum(CASE WHEN len(list_filter(v,
                 x -> isnan(x) OR abs(x) > 1e308)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonfinite,
             CAST(sum(CASE WHEN list_dot_product(v, v) = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm,
             floor(min(sqrt(list_dot_product(v, v))) * 10000) / 10000 AS norm_min,
             floor(max(sqrt(list_dot_product(v, v))) * 10000) / 10000 AS norm_max
           FROM e),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         mi AS (SELECT count(*) AS n_missing_vec FROM documents d2
                WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.vec_id = d2.doc_id)),
         orp AS (SELECT count(*) AS n_orphan_vec FROM e
                 WHERE NOT EXISTS (SELECT 1 FROM documents d2 WHERE d2.doc_id = e.vec_id))
         SELECT n_vectors, n_docs, n_missing_vec, n_orphan_vec, n_bad_dim,
           n_nonfinite, n_zero_norm, norm_min, norm_max
         FROM b, nd, mi, orp"""
    },
    "sim_ann_project_rerank" -> {
      val k = Sim.projDims
      val fs = (0 until k).map(j => s"${projFoldSql(j)} AS f$j").mkString(",\n             ")
      val qfs = (0 until k).map(j => s"f$j AS qf$j").mkString(", ")
      val dot16 = (0 until k).map(j => s"f.f$j * q.qf$j").mkString(" + ")
      val n16 = (0 until k).map(j => s"f.f$j * f.f$j").mkString(" + ")
      val qn16 = (0 until k).map(j => s"q.qf$j * q.qf$j").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         f AS MATERIALIZED (SELECT vec_id, v,
             $fs
           FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, $qfs FROM f
               WHERE vec_id < ${Sim.nQueries}),
         p AS (SELECT f.vec_id, f.v, q.query_id, q.qv,
                 ($dot16) / (sqrt($n16) * sqrt($qn16)) AS pcos
               FROM f JOIN q ON f.vec_id <> q.query_id),
         c AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY pcos DESC, vec_id) AS crank FROM p),
         r AS (SELECT query_id, vec_id,
                 list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
               FROM c WHERE crank <= ${Sim.rerankCandidates}),
         k AS (SELECT query_id, vec_id, cos, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id) AS rank FROM r)
         SELECT query_id, vec_id AS neighbor_id, rank,
           floor(cos * 10000) / 10000 AS cos_sim
         FROM k WHERE rank <= ${Sim.topK} ORDER BY query_id, rank"""
    },
    "text_chunk_windows" -> {
      val (cs, st) = (TrainData.chunkSize, TrainData.chunkStride)
      s"""WITH d AS (SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_words
           FROM documents),
         w AS (SELECT doc_id, n_words,
             unnest(generate_series(0,
               greatest(0, CAST(ceil((n_words - 1) / $st.0) AS BIGINT)))) AS win
           FROM d)
         SELECT doc_id, win, win * $st AS tok_start,
           least(win * $st + $cs, n_words) AS tok_end,
           least(win * $st + $cs, n_words) - win * $st AS n_tokens
         FROM w WHERE win * $st < n_words ORDER BY doc_id, win"""
    },
    "mix_epochs" -> {
      val values = TrainData.epochFactors
        .map { case (k, f) => s"('$k', $f)" }.mkString(", ")
      s"""WITH f(source, factor) AS (VALUES $values),
         d AS (SELECT doc_id, 'src' || CAST(doc_id % 6 AS VARCHAR) AS source
               FROM documents),
         j AS (SELECT d.doc_id, d.source,
                 coalesce(CAST(f.factor AS DOUBLE), ${TrainData.epochDefaultFactor})
                   AS factor
               FROM d LEFT JOIN f USING (source)),
         c AS (SELECT doc_id, source, factor,
             CAST(floor(factor) AS BIGINT)
               + CASE WHEN (doc_id % 100003) * 2654435761 % 1000000
                        < (factor - floor(factor)) * 1000000
                 THEN 1 ELSE 0 END AS n_copies
           FROM j)
         SELECT doc_id, source, factor, n_copies,
           unnest(generate_series(0, n_copies - 1)) AS epoch
         FROM c WHERE n_copies > 0 ORDER BY doc_id, epoch"""
    },
    "mix_epochs_stats" -> {
      val values = TrainData.epochFactors
        .map { case (k, f) => s"('$k', $f)" }.mkString(", ")
      s"""WITH f(source, factor) AS (VALUES $values),
         d AS (SELECT doc_id, 'src' || CAST(doc_id % 6 AS VARCHAR) AS source
               FROM documents),
         j AS (SELECT d.doc_id, d.source,
                 coalesce(CAST(f.factor AS DOUBLE), ${TrainData.epochDefaultFactor})
                   AS factor
               FROM d LEFT JOIN f USING (source)),
         c AS (SELECT doc_id, source,
             CAST(floor(factor) AS BIGINT)
               + CASE WHEN (doc_id % 100003) * 2654435761 % 1000000
                        < (factor - floor(factor)) * 1000000
                 THEN 1 ELSE 0 END AS n_copies
           FROM j)
         SELECT source, count(DISTINCT doc_id) AS n_docs,
           CAST(sum(n_copies) AS BIGINT) AS n_copies,
           floor(sum(n_copies) * 10000.0 / count(DISTINCT doc_id)) / 10000 AS realized
         FROM c WHERE n_copies > 0 GROUP BY source ORDER BY source"""
    },
    "text_bpe_merges" -> bpeOracle(encode = false),
    "text_bpe_encode" -> bpeOracle(encode = true),
    "text_quality_classifier" -> {
      def wSum(listCol: String) = qcWSumSql(listCol)
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         g AS (SELECT doc_id, w,
                 CASE WHEN len(w) >= 2
                   THEN list_transform(generate_series(1, len(w)-1),
                          i -> concat(w[i], ' ', w[i+1]))
                   ELSE [] END AS g
               FROM d),
         s AS (SELECT doc_id, len(w) + len(g) AS n_feats,
                 ${wSum("w")} + ${wSum("g")} AS raw
               FROM g),
         m AS (SELECT doc_id, n_feats, raw / n_feats AS m FROM s)
         SELECT doc_id, n_feats,
           floor((0.5 + 0.5 * m / (1 + abs(m))) * 10000) / 10000 AS qc_score,
           floor((0.5 + 0.5 * m / (1 + abs(m))) * 10000) / 10000
             >= ${TextAnalysis.qcKeepTau} AS keep
         FROM m ORDER BY doc_id"""
    },
    "shard_assign" ->
      s"""WITH k AS (SELECT doc_id,
             CAST(concat('0x', substring(md5(concat('order:',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS ord_key
           FROM documents)
         SELECT doc_id, ord_key % ${TrainData.orderShards} AS shard,
           CAST(row_number() OVER (PARTITION BY ord_key % ${TrainData.orderShards}
             ORDER BY ord_key, doc_id) AS BIGINT) AS pos,
           ord_key
         FROM k ORDER BY doc_id""",
    "shard_assign_stats" ->
      s"""WITH k AS (SELECT doc_id,
             CAST(concat('0x', substring(md5(concat('order:',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS ord_key
           FROM documents),
         a AS (SELECT doc_id, ord_key % ${TrainData.orderShards} AS shard,
             CAST(row_number() OVER (PARTITION BY ord_key % ${TrainData.orderShards}
               ORDER BY ord_key, doc_id) AS BIGINT) AS pos
           FROM k)
         SELECT shard, count(*) AS n_docs, max(pos) AS max_pos,
           count(*) = max(pos) AS contiguous
         FROM a GROUP BY shard ORDER BY shard""",
    "emb_random_projection" -> {
      val fs = (0 until Sim.projDims)
        .map(j => s"${projFoldSql(j)} AS f$j").mkString(",\n             ")
      val ps = (0 until Sim.projDims)
        .map(j => s"floor(f$j * (sqrt(3) / 4) * 10000) / 10000 AS p$j").mkString(",\n           ")
      val nsum = (0 until Sim.projDims).map(j => s"f$j * f$j * 3").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         f AS (SELECT vec_id, v,
             $fs
           FROM e)
         SELECT vec_id,
           $ps,
           floor(sqrt($nsum) / 4 / sqrt(list_dot_product(v, v)) * 10000) / 10000
             AS norm_ratio
         FROM f ORDER BY vec_id"""
    },
    "dedup_url" ->
      s"""WITH $urlCanonCtes
         SELECT doc_id, canon_url,
           doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep,
           count(*) OVER (PARTITION BY canon_url) AS n_aliases
         FROM c ORDER BY doc_id""",
    "url_host_stats" ->
      s"""WITH $urlCanonCtes,
         h AS (SELECT doc_id, canon_url,
             regexp_extract(canon_url, '^[a-z]+://([^/:?#]+)', 1) AS host
           FROM c)
         SELECT host, count(*) AS n_urls,
           count(DISTINCT canon_url) AS n_canonical,
           count(*) - count(DISTINCT canon_url) AS n_dup,
           floor((count(*) - count(DISTINCT canon_url)) * 10000.0 / count(*)) / 10000
             AS dup_frac
         FROM h GROUP BY host ORDER BY host""",
    "text_gopher_quality" -> {
      import TextAnalysis._
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         s AS (${gopherSignalSql("d")}),
         v AS (SELECT *,
                 (n_words >= $gopherMinWords AND n_words <= $gopherMaxWords) AS ok_words,
                 (mean_word_len >= $gopherMeanLenLo
                  AND mean_word_len <= $gopherMeanLenHi) AS ok_mean_len,
                 symbol_ratio <= $gopherSymbolRatioMax AS ok_symbols,
                 alpha_frac >= $gopherAlphaFracMin AS ok_alpha,
                 stop_hits >= $gopherMinStopHits AS ok_stopwords
               FROM s)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
           ok_words, ok_mean_len, ok_symbols, ok_alpha, ok_stopwords,
           (ok_words AND ok_mean_len AND ok_symbols AND ok_alpha AND ok_stopwords)
             AS keep
         FROM v ORDER BY doc_id"""
    },
    "quality_gate_agreement" -> {
      import TextAnalysis._
      def wSum(listCol: String) = qcWSumSql(listCol)
      s"""WITH dd AS MATERIALIZED (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS w
             FROM documents),
         g AS (SELECT doc_id, w,
                 CASE WHEN len(w) >= 2
                   THEN list_transform(generate_series(1, len(w)-1),
                          i -> concat(w[i], ' ', w[i+1]))
                   ELSE [] END AS g
               FROM dd),
         q AS (SELECT doc_id,
                 (${wSum("w")} + ${wSum("g")}) / (len(w) + len(g)) AS m
               FROM g),
         qk AS (SELECT doc_id,
                 floor((0.5 + 0.5 * m / (1 + abs(m))) * 10000) / 10000
                   >= $qcKeepTau AS qc_keep
               FROM q),
         s AS (${gopherSignalSql("dd")}),
         gk AS (SELECT doc_id, n_words AS tok,
                 (n_words >= $gopherMinWords AND n_words <= $gopherMaxWords
                  AND mean_word_len >= $gopherMeanLenLo
                  AND mean_word_len <= $gopherMeanLenHi
                  AND symbol_ratio <= $gopherSymbolRatioMax
                  AND alpha_frac >= $gopherAlphaFracMin
                  AND stop_hits >= $gopherMinStopHits) AS gopher_keep
               FROM s)
         SELECT qc_keep, gopher_keep, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           qc_keep = gopher_keep AS agree
         FROM qk JOIN gk USING (doc_id)
         GROUP BY qc_keep, gopher_keep
         ORDER BY qc_keep, gopher_keep"""
    },
    "corpus_stats" -> corpusStatsSql,
    // the incremental fold's oracle IS the full-rescan oracle: a hash
    // match proves the per-load partial merge lossless
    "corpus_stats_inc" -> corpusStatsSql,
    "dsir_importance" -> {
      val (bk, tm) = (TrainData.dsirBuckets, TrainData.dsirTargetMod)
      s"""WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                     FROM documents),
         g AS (SELECT doc_id, w,
                 CASE WHEN len(w) >= 2
                   THEN list_transform(generate_series(1, len(w)-1),
                          i -> concat(w[i], ' ', w[i+1]))
                   ELSE [] END AS g
               FROM d),
         f AS MATERIALIZED (SELECT doc_id,
                 CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % $bk AS b,
                 doc_id % $tm = 0 AS is_target
               FROM (SELECT doc_id, unnest(list_concat(w, g)) AS x FROM g)),
         cnt AS MATERIALIZED (SELECT b,
                 sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b,
                 sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS s_b
               FROM f GROUP BY b),
         tot AS (SELECT sum(t_b) AS tt, sum(s_b) AS ts FROM cnt),
         dim AS (SELECT b,
                 log2(CAST(t_b + 1 AS DOUBLE) / (tt + $bk))
                   - log2(CAST(s_b + 1 AS DOUBLE) / (ts + $bk)) AS lr
               FROM cnt, tot)
         SELECT f.doc_id, count(*) AS n_feats,
           floor(sum(lr) * 100) / 100 AS log_weight,
           floor(sum(lr) * 100) / 100 >= 0.0 AS selected
         FROM f JOIN dim USING (b) WHERE NOT is_target
         GROUP BY f.doc_id ORDER BY f.doc_id"""
    },
    "sim_knn_graph" ->
      s"""WITH ${centroidAssignTwoStageCtes()},
         pr AS (SELECT a.vec_id, a.cluster, b.vec_id AS neighbor_id,
                  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
                FROM a JOIN a b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
         k AS (SELECT vec_id, cluster, neighbor_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, neighbor_id) AS rank
               FROM pr)
         SELECT vec_id, cluster, neighbor_id, rank,
           floor(cos * 10000) / 10000 AS cos_sim
         FROM k WHERE rank <= ${Sim.knnK} ORDER BY vec_id, rank""",
    "mm_phash_dedup" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(8 + doc_id % 9 AS BIGINT) AS w, CAST(8 + doc_id % 5 AS BIGINT) AS h,
             rpad(text, 192, ' ') AS padded
           FROM documents),
         hs AS MATERIALIZED (SELECT doc_id,
             ($dhashSql) AS dhash
           FROM d),
         ${bandedNearSql("hs", "dhash", Multimodal.dhashBits)},
         hm AS (SELECT da, db FROM near
                WHERE bit_count(xor(sa, sb)) <= ${Multimodal.dhashMaxHamming}),
         nn AS (SELECT doc_id, count(*) AS n_near FROM
                  (SELECT da AS doc_id FROM hm UNION ALL SELECT db FROM hm)
                GROUP BY doc_id)
         SELECT hs.doc_id, hs.dhash, coalesce(nn.n_near, 0) AS n_near
         FROM hs LEFT JOIN nn USING (doc_id) ORDER BY doc_id""",
    "text_char_entropy" ->
      s"""WITH c AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
             i -> substring(text, i, 1))) AS ch
           FROM documents WHERE length(text) > 0),
         g AS (SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c FROM c GROUP BY doc_id, ch),
         e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
                 count(*) AS n_distinct_chars, sum(c * log2(c)) AS s
               FROM g GROUP BY doc_id)
         SELECT doc_id, n_chars, CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
           floor((log2(n_chars) - s / n_chars) * 100) / 100 AS entropy
         FROM e ORDER BY doc_id""",
    "mm_binary_columns" ->
      // replays the FULL wire path through char codes: PGM header length
      // (9 + digits of w + digits of h), the `% 13` half-truncation (which
      // always cuts into the raster, so decode fails), and the per-pixel
      // stats over the first w*h chars of the padded text. Division before
      // the 4dp floor matches the Scala `sum/(w*h)` then `*10000` order.
      s"""WITH d AS (SELECT doc_id,
             CAST(8 + doc_id % 9 AS BIGINT) AS w, CAST(8 + doc_id % 5 AS BIGINT) AS h,
             rpad(text, 192, ' ') AS padded
           FROM documents),
         p AS (SELECT doc_id, w, h, doc_id % 13 = 0 AS trunc,
             9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w*h AS full_len,
             list_transform(generate_series(1, CAST(w*h AS INT)),
               i -> ord(substring(padded, i, 1))) AS px
           FROM d)
         SELECT doc_id, 'pgm' AS fmt,
           CAST(CASE WHEN trunc THEN full_len // 2 ELSE full_len END AS INT) AS n_bytes,
           NOT trunc AS decode_ok,
           CAST(CASE WHEN trunc THEN -1 ELSE w END AS INT) AS width,
           CAST(CASE WHEN trunc THEN -1 ELSE h END AS INT) AS height,
           CASE WHEN trunc THEN -1.0
             ELSE floor(CAST(list_sum(px) AS DOUBLE) / (w*h) * 10000) / 10000 END AS mean_gray,
           CAST(CASE WHEN trunc THEN -1 ELSE list_min(px) END AS INT) AS min_gray,
           CAST(CASE WHEN trunc THEN -1 ELSE list_max(px) END AS INT) AS max_gray
         FROM p ORDER BY doc_id""",
    "mm_frame_sample" -> {
      // frameRaster's cyclic window: pixel j of frame idx reads text char
      // ((idx*31) % len + j) % len; the 16x9 raster then folds to the same
      // mean/min/max the Scala decode emits. `range` (exclusive stop) under
      // stride equals Spark's `sequence(0, n_frames-1, stride)`.
      val n = Multimodal.frameW * Multimodal.frameH
      s"""WITH d AS (SELECT doc_id, text, length(text) AS len,
             CAST(1000 + doc_id % 29 * 1000 AS BIGINT) AS duration_ms,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 30 END AS INT) AS fps
           FROM documents),
         f AS (SELECT doc_id, text, len, duration_ms, fps,
             duration_ms // 1000 * fps AS n_frames,
             greatest(1, CAST(ceil(CAST(duration_ms // 1000 * fps AS DOUBLE)
               / ${Multimodal.maxFramesPerVideo}) AS BIGINT)) AS stride
           FROM d),
         fr AS (SELECT doc_id, text, len, duration_ms, fps, n_frames,
             unnest(range(0, n_frames, stride)) AS frame_idx
           FROM f),
         px AS (SELECT doc_id, duration_ms, fps, n_frames, frame_idx,
             list_transform(generate_series(0, ${n - 1}),
               j -> CASE WHEN len = 0 THEN 0 ELSE ord(substring(text,
                 CAST(((frame_idx*31) % len + j) % len + 1 AS INT), 1)) END) AS px
           FROM fr)
         SELECT doc_id, duration_ms, fps, n_frames, frame_idx,
           frame_idx * 1000 // fps AS frame_ts_ms,
           floor(CAST(list_sum(px) AS DOUBLE) / $n * 10000) / 10000 AS mean_gray,
           CAST(list_min(px) AS INT) AS min_gray,
           CAST(list_max(px) AS INT) AS max_gray
         FROM px ORDER BY doc_id, frame_idx"""
    },
    "mm_audio_chunks" -> {
      // exact LCG replay via the closed form state_j = A^j*seed + C*S_j
      // (mod 2^32): a recursive CTE builds the (A^j, S_j) table once, then
      // every sample is two table lookups — no sequential fold. mulmod on
      // 32-bit values splits the top 16 bits so ALL intermediates stay in
      // BIGINT (the 64-bit-LCG hugeint version measured >600 s; this runs
      // ~26 s at sf0.01). Sample j's sign is state<2^31; its byte is the
      // state's top 8 bits; crossings compare sample j with j-1 via a
      // second closed-form lookup, not a 64M-row window.
      val (a, c) = (Multimodal.pcmLcgA, Multimodal.pcmLcgC)
      val maxN = (Multimodal.audioChunkMs * Multimodal.audioSampleRate / 1000).toInt
      def mm32(x: String, y: String) =
        s"((($x) % 65536) * ($y) % 4294967296 + ((($x) // 65536) * ($y) % 65536) * 65536) % 4294967296"
      s"""WITH RECURSIVE powt(j, aj, sj) AS (
             SELECT 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
             UNION ALL
             SELECT j+1, aj * $a % 4294967296, (sj * $a + 1) % 4294967296
             FROM powt WHERE j < $maxN
         ),
         powt2 AS MATERIALIZED (SELECT p.j, p.aj, p.sj, q.aj AS aj1, q.sj AS sj1
             FROM powt p JOIN powt q ON q.j = p.j + 1),
         d AS (SELECT doc_id,
             CAST(2500 + doc_id % 17 * 1700 AS BIGINT) AS duration_ms FROM documents),
         ch AS (SELECT doc_id, duration_ms,
             unnest(range(0, duration_ms, ${Multimodal.audioChunkMs})) AS start_ms FROM d),
         ch2 AS MATERIALIZED (SELECT doc_id, duration_ms, start_ms,
             least(start_ms + ${Multimodal.audioChunkMs}, duration_ms) AS end_ms,
             CAST((end_ms - start_ms) * ${Multimodal.audioSampleRate} // 1000 AS INT) AS n,
             (doc_id * ${Multimodal.pcmSeedDocMix}
               + start_ms * ${Multimodal.pcmSeedMsMix} + 1) % 4294967296 AS seed
           FROM ch),
         sm AS (SELECT doc_id, start_ms, n, seed,
             unnest(generate_series(0, n - 1)) AS j FROM ch2),
         st AS (SELECT doc_id, start_ms, n, sm.j AS j,
             (${mm32("p.aj1", "seed")} + $c * p.sj1 % 4294967296) % 4294967296 AS cur,
             (${mm32("p.aj", "seed")} + $c * p.sj % 4294967296) % 4294967296 AS prv
           FROM sm JOIN powt2 p ON sm.j = p.j),
         sb AS (SELECT doc_id, start_ms, n, j,
             CASE WHEN cur // 16777216 > 127
               THEN cur // 16777216 - 256 ELSE cur // 16777216 END AS s,
             cur < 2147483648 AS cur_pos, prv < 2147483648 AS prv_pos
           FROM st),
         agg AS (SELECT doc_id, start_ms, n,
             sum(s*s) AS sum_sq, max(abs(s)) AS peak,
             sum(CASE WHEN j > 0 AND cur_pos <> prv_pos THEN 1 ELSE 0 END) AS crossings
           FROM sb GROUP BY doc_id, start_ms, n)
         SELECT a.doc_id, c.duration_ms, a.start_ms, c.end_ms, a.n AS n_samples,
           floor(sqrt(CAST(sum_sq AS DOUBLE) / a.n) * 10000) / 10000 AS rms,
           CAST(peak AS INT) AS peak,
           floor(CAST(crossings AS DOUBLE) / a.n * 10000) / 10000 AS zcr
         FROM agg a JOIN ch2 c ON a.doc_id = c.doc_id AND a.start_ms = c.start_ms
         ORDER BY a.doc_id, a.start_ms"""
    },
    "emb_pq_encode" -> {
      val m = Sim.pqM
      val codeCols = (0 until m)
        .map(j => s"CAST(sum(CASE WHEN m = $j THEN code END) AS BIGINT) AS code$j")
        .mkString(",\n           ")
      val errSum = (0 until m)
        .map(j => s"sum(CASE WHEN m = $j THEN dist END)").mkString(" + ")
      s"""WITH $pqEncodeCtes
         SELECT vec_id,
           $codeCols,
           floor(($errSum) * 10000) / 10000 AS recon_err
         FROM b GROUP BY vec_id ORDER BY vec_id"""
    },
    // readback-stats oracle from the SHARED assignment + encode chains:
    // per inverted list, the vector count and distinct code cells the
    // stored files must re-aggregate to. ONE builder for the build sink
    // and its weekly compaction (live-vectors filter), so the two cannot
    // drift.
    "sink_vector_index" -> vectorIndexStatsSql(""),
    "sink_vector_index_compact" ->
      vectorIndexStatsSql("WHERE vec_id % 13 <> 0"),
    // the daily append fold: base build + delta append must equal the
    // from-scratch full build — SAME oracle as sink_vector_index, so the
    // hash match PROVES the upsert lossless (the corpus_stats_inc rule)
    "sink_vector_index_upsert" -> vectorIndexStatsSql(""),
    "dedup_audit" -> {
      val p = operators.Dedup.MersennePrime
      val mins = (0 until operators.Dedup.minhashK).map(j =>
        s"min((h0 * ${2 * j + 3} + ${j.toLong * 2654435761L} + 1) % $p) AS mh$j")
        .mkString(", ")
      val agreeSql = (0 until operators.Dedup.minhashK)
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END").mkString(" + ")
      val bandSelects = (0 until operators.Dedup.minhashK / operators.Dedup.bandSize)
        .map { b =>
          val cols = (b * operators.Dedup.bandSize until (b + 1) * operators.Dedup.bandSize)
            .map(j => s"mh$j").mkString(", ")
          s"SELECT doc_id, $b AS band, md5(concat_ws(':', $cols)) AS band_key FROM sig"
        }.mkString(" UNION ALL ")
      s"""${dupGroupsCtes()},
         h2 AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % $p AS h0
               FROM sh),
         sig AS (SELECT doc_id, $mins FROM h2 GROUP BY doc_id),
         bands AS ($bandSelects),
         mcand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b ON a.band = b.band
                     AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         mpred AS (SELECT mc.da, mc.db FROM mcand mc
                   JOIN sig sa ON mc.da = sa.doc_id
                   JOIN sig sb ON mc.db = sb.doc_id
                   WHERE ($agreeSql) / ${operators.Dedup.minhashK}.0
                     >= ${operators.Dedup.jaccardTau}),
         n1 AS (SELECT count(*) AS n_exact FROM pairs),
         n2 AS (SELECT count(*) AS n_candidates FROM mcand),
         n3 AS (SELECT count(*) AS n_predicted FROM mpred),
         n4 AS (SELECT count(*) AS n_cand_hits FROM mcand JOIN pairs USING (da, db)),
         n5 AS (SELECT count(*) AS n_pred_hits FROM mpred JOIN pairs USING (da, db))
         SELECT n_exact, n_candidates, n_predicted, n_cand_hits, n_pred_hits,
           CASE WHEN n_predicted > 0
             THEN floor(n_pred_hits * 10000.0 / n_predicted) / 10000 END
             AS precision_pred,
           CASE WHEN n_exact > 0
             THEN floor(n_pred_hits * 10000.0 / n_exact) / 10000 END
             AS recall_pred
         FROM n1, n2, n3, n4, n5"""
    },
    "pipeline_curation_llm" -> {
      import TextAnalysis._
      val g = TrainData.contamGram
      val (bk, tm) = (TrainData.dsirBuckets, TrainData.dsirTargetMod)
      val reqList = inList(gopherRequiredWords)
      s"""WITH d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
           FROM documents),
         sig AS (SELECT doc_id, w, h, len(w) AS tok,
                 floor(CAST(list_aggregate(list_transform(w, x -> len(x)), 'sum')
                   AS DOUBLE) / len(w) * 10000) / 10000 AS mean_word_len,
                 floor(CAST(len(list_filter(w, x -> x = '#' OR x LIKE '%...%'))
                   AS DOUBLE) / len(w) * 10000) / 10000 AS symbol_ratio,
                 floor(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                   AS DOUBLE) / len(w) * 10000) / 10000 AS alpha_frac,
                 len(list_filter(w, x -> x IN ($reqList))) AS stop_hits
               FROM d),
         dd AS (SELECT sig.* FROM sig
                JOIN (SELECT h, min(doc_id) AS keep_id FROM sig GROUP BY h) k
                  ON sig.h = k.h AND sig.doc_id = k.keep_id),
         gs AS (SELECT doc_id,
                  list_distinct(list_transform(generate_series(1, len(w) - ${g - 1}),
                    i -> array_to_string(w[i : i + ${g - 1}], ' '))) AS grams
                FROM dd WHERE len(w) >= $g),
         e AS (SELECT DISTINCT unnest(grams) AS gram FROM gs
               WHERE doc_id % ${TrainData.contamEvalMod} = 0),
         bad AS (SELECT DISTINCT tr.doc_id
                 FROM (SELECT doc_id, unnest(grams) AS gram FROM gs
                       WHERE doc_id % ${TrainData.contamEvalMod} <> 0) tr
                 JOIN e ON tr.gram = e.gram),
         dg AS (SELECT doc_id, w,
                 CASE WHEN len(w) >= 2
                   THEN list_transform(generate_series(1, len(w)-1),
                          i -> concat(w[i], ' ', w[i+1]))
                   ELSE [] END AS bg
               FROM d),
         fx AS MATERIALIZED (SELECT doc_id,
                 CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % $bk AS b,
                 doc_id % $tm = 0 AS is_target
               FROM (SELECT doc_id, unnest(list_concat(w, bg)) AS x FROM dg)),
         dcnt AS MATERIALIZED (SELECT b,
                 sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b,
                 sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS s_b
               FROM fx GROUP BY b),
         dtot AS (SELECT sum(t_b) AS tt, sum(s_b) AS ts FROM dcnt),
         ddim AS (SELECT b,
                 log2(CAST(t_b + 1 AS DOUBLE) / (tt + $bk))
                   - log2(CAST(s_b + 1 AS DOUBLE) / (ts + $bk)) AS lr
               FROM dcnt, dtot),
         dscore AS (SELECT fx.doc_id, floor(sum(lr) * 100) / 100 AS log_weight
                    FROM fx JOIN ddim USING (b) WHERE NOT is_target
                    GROUP BY fx.doc_id),
         clean AS (SELECT dd.doc_id,
                     (dd.doc_id % 100003) * 2654435761 % 1000000
                       % ${TrainData.packShards} AS shard,
                     CAST(dd.tok AS BIGINT) AS tok, dscore.log_weight
                   FROM dd JOIN dscore ON dd.doc_id = dscore.doc_id
                   WHERE dd.doc_id % ${TrainData.contamEvalMod} <> 0
                     AND dd.doc_id NOT IN (SELECT doc_id FROM bad)
                     AND dd.tok >= $gopherMinWords AND dd.tok <= $gopherMaxWords
                     AND dd.mean_word_len >= $gopherMeanLenLo
                     AND dd.mean_word_len <= $gopherMeanLenHi
                     AND dd.symbol_ratio <= $gopherSymbolRatioMax
                     AND dd.alpha_frac >= $gopherAlphaFracMin
                     AND dd.stop_hits >= $gopherMinStopHits
                     AND dscore.log_weight >= 0.0),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM clean)
         SELECT doc_id, shard, tok, log_weight,
           CAST(floor((cum - tok) / ${TrainData.packBudget}.0) AS BIGINT) AS bin
         FROM c ORDER BY doc_id"""
    },
    "emb_pq_residual" -> {
      val m = Sim.pqM
      val codeCols = (0 until m)
        .map(j => s"CAST(sum(CASE WHEN m = $j THEN code END) AS BIGINT) AS code$j")
        .mkString(",\n           ")
      val errSum = (0 until m)
        .map(j => s"sum(CASE WHEN m = $j THEN dist END)").mkString(" + ")
      val outCodes = (0 until m).map(j => s"code$j").mkString(", ")
      s"""WITH ${centroidAssignCtes()},
         $pqResidualCtes,
         enc AS (SELECT vec_id,
           $codeCols,
           floor(($errSum) * 10000) / 10000 AS recon_err
           FROM rbb GROUP BY vec_id)
         SELECT enc.vec_id, res.cluster, $outCodes, recon_err
         FROM enc JOIN res ON enc.vec_id = res.vec_id ORDER BY enc.vec_id"""
    },
    "sim_ann_ivfpq_residual" -> {
      val (m, sd) = (Sim.pqM, Sim.pqSubDim)
      val dCols = (0 until m)
        .map(j => s"sum(CASE WHEN rbb.m = $j THEN d END) AS d$j")
        .mkString(",\n           ")
      val adcSum = (0 until m).map(j => s"d$j").mkString(" + ")
      s"""WITH ${centroidAssignCtes()},
         $pqResidualCtes,
         pr AS (SELECT vec_id AS query_id, cluster FROM (
                  SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cluster) AS prk
                  FROM p WHERE vec_id < ${Sim.nQueries})
                WHERE prk <= ${Sim.ivfPqProbes}),
         qr AS (SELECT pr.query_id, pr.cluster,
                 list_transform(generate_series(1, ${Sim.expectedDims}),
                   i -> q.qv[i] - c.cv[i]) AS xv
               FROM (SELECT vec_id AS query_id, v AS qv FROM e
                     WHERE vec_id < ${Sim.nQueries}) q
               JOIN pr ON q.query_id = pr.query_id
               JOIN c ON pr.cluster = c.cluster),
         qtbl AS (SELECT qr.query_id, qr.cluster, rb.code, m.m,
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                   i -> (qr.xv[m.m*$sd+i] - rb.bv[m.m*$sd+i])
                        * (qr.xv[m.m*$sd+i] - rb.bv[m.m*$sd+i]))),
                   (x, y) -> x + y) AS d
               FROM qr CROSS JOIN rb
                 CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) m),
         s AS (SELECT qtbl.query_id, rbb.vec_id,
           $dCols
           FROM rbb JOIN res ON rbb.vec_id = res.vec_id
             JOIN qtbl ON qtbl.cluster = res.cluster
               AND qtbl.m = rbb.m AND qtbl.code = rbb.code
           WHERE rbb.vec_id <> qtbl.query_id GROUP BY 1, 2),
         k AS (SELECT query_id, vec_id, ($adcSum) AS adc, row_number() OVER (
                 PARTITION BY query_id ORDER BY ($adcSum), vec_id) AS rank FROM s)
         SELECT query_id, vec_id AS neighbor_id, rank,
           floor(adc * 10000) / 10000 AS adc_dist
         FROM k WHERE rank <= ${Sim.topK} ORDER BY query_id, rank"""
    },
    "emb_dedup_pq" -> {
      val m = Sim.pqM
      val codeCols = (0 until m)
        .map(j => s"CAST(sum(CASE WHEN m = $j THEN code END) AS BIGINT) AS code$j")
        .mkString(",\n           ")
      val keyCols = (0 until m).map(j => s"code$j").mkString(", ")
      s"""WITH $pqEncodeCtes,
         cd AS (SELECT vec_id,
           $codeCols
           FROM b GROUP BY vec_id),
         k AS (SELECT vec_id, concat_ws(':', $keyCols) AS code_key FROM cd)
         SELECT vec_id, code_key,
           count(*) OVER (PARTITION BY code_key) AS n_same_code,
           vec_id = min(vec_id) OVER (PARTITION BY code_key) AS keep
         FROM k ORDER BY vec_id"""
    },
    "text_perplexity_bucket" ->
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
         tk AS (SELECT doc_id, unnest(w) AS tok FROM d),
         v AS (SELECT tok, count(*) AS tf FROM tk GROUP BY 1),
         tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n_total FROM v),
         s AS (SELECT tk.doc_id, -log2(CAST(v.tf AS DOUBLE) / tot.n_total) AS nll
               FROM tk JOIN v ON tk.tok = v.tok CROSS JOIN tot),
         lm AS (SELECT doc_id, floor(sum(nll) / count(*) * 100) / 100 AS mean_nll
                FROM s GROUP BY doc_id),
         bk AS (SELECT lm.doc_id, doc.lang, lm.mean_nll,
                 ntile(3) OVER (PARTITION BY doc.lang
                   ORDER BY lm.mean_nll, lm.doc_id) AS bucket
               FROM lm JOIN documents doc ON lm.doc_id = doc.doc_id)
         SELECT doc_id, lang, mean_nll, bucket,
           CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
             ELSE 'tail' END AS band
         FROM bk ORDER BY doc_id""",
    "text_langid_agreement" -> {
      val wHits = TextAnalysis.stopwords.map { case (lang, ws) =>
        s"len(list_filter(w, x -> x IN (${inList(ws)}))) AS ${lang}_n"
      }.mkString(", ")
      val bHits = TextAnalysis.bigramProfiles.map { case (lang, ps) =>
        val list = ps.map(p => s"'$p'").mkString(", ")
        s"len(list_filter(list_transform(generate_series(1, length(text) - 1), " +
          s"i -> substr(text, i, 2)), x -> x IN ($list))) AS ${lang}_bg"
      }.mkString(", ")
      s"""WITH d AS (SELECT doc_id, lang, text,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
         s AS (SELECT doc_id, lang, $wHits, $bHits FROM d),
         p AS (SELECT doc_id, lang,
                 CASE WHEN en_n + es_n + de_n = 0 THEN 'unknown'
                      WHEN en_n >= es_n AND en_n >= de_n THEN 'en'
                      WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang,
                 CASE WHEN en_bg + es_bg + de_bg = 0 THEN 'unknown'
                      WHEN en_bg >= es_bg AND en_bg >= de_bg THEN 'en'
                      WHEN es_bg >= de_bg THEN 'es' ELSE 'de' END AS pred_lang_ngram
               FROM s)
         SELECT pred_lang, pred_lang_ngram, count(*) AS n_docs,
           CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_word_correct,
           CAST(sum(CASE WHEN pred_lang_ngram = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ngram_correct,
           pred_lang = pred_lang_ngram AS agree
         FROM p GROUP BY pred_lang, pred_lang_ngram
         ORDER BY pred_lang, pred_lang_ngram"""
    },
    "text_token_histogram" -> {
      val b = TextAnalysis.tokenHistBucket
      s"""WITH d AS (SELECT len(string_split_regex(lower(trim(text)), '\\s+')) AS n
                     FROM documents),
         g AS (SELECT n // $b AS bucket, count(*) AS n_docs,
                 CAST(sum(n) AS BIGINT) AS n_tokens
               FROM d GROUP BY 1)
         SELECT bucket, bucket * $b AS bucket_lo, (bucket + 1) * $b - 1 AS bucket_hi,
           n_docs, n_tokens
         FROM g ORDER BY bucket"""
    },
    "mix_budget" ->
      s"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         tot AS (SELECT list_reduce(list_prepend(0.0,
                   list_transform(list(n ORDER BY source),
                     x -> sqrt(CAST(x AS DOUBLE)))),
                   (a, b) -> a + b) AS s_total
               FROM cnt),
         q AS (SELECT source,
                 CAST(floor(sqrt(CAST(n AS DOUBLE)) / s_total
                   * ${TrainData.mixBudgetTokens}) AS BIGINT) AS quota
               FROM cnt, tot),
         d AS (SELECT doc_id, source,
                 len(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
                 CAST(concat('0x', substring(md5(concat('budget:',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS ord_key
               FROM documents),
         c AS (SELECT *, sum(tok) OVER (PARTITION BY source
                 ORDER BY ord_key, doc_id ROWS UNBOUNDED PRECEDING) AS cum
               FROM d)
         SELECT doc_id, source, CAST(tok AS BIGINT) AS tok,
           CAST(cum AS BIGINT) AS cum, quota, cum <= quota AS keep
         FROM c JOIN q USING (source) ORDER BY doc_id""",
    "mix_temperature" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                 list_reduce(list_prepend(0.0,
                   list_transform(list(n ORDER BY source),
                     x -> sqrt(CAST(x AS DOUBLE)))),
                   (a, b) -> a + b) AS s_total
               FROM cnt),
         j AS (SELECT source, n AS n_docs,
                 CAST(n AS DOUBLE) / n_total AS rs,
                 sqrt(CAST(n AS DOUBLE)) / s_total AS ts
               FROM cnt, tot),
         b AS (SELECT *, ts / rs AS raw_boost FROM j),
         mx AS (SELECT max(raw_boost) AS mb FROM b)
         SELECT source, n_docs,
           floor(rs * 10000) / 10000 AS raw_share,
           floor(ts * 10000) / 10000 AS temp_share,
           floor(raw_boost * 10000) / 10000 AS boost,
           floor(raw_boost / mb * 10000) / 10000 AS keep_rate
         FROM b, mx ORDER BY source""",
    // UniMax water-filling, closed form: the capped/uncapped branch is
    // decided in ALL-INTEGER arithmetic and the uncapped share is one
    // integer division — no double ever enters an allocation
    "mix_unimax" -> {
      val cap = TrainData.unimaxEpochCap
      val mul = TrainData.unimaxBudgetMul
      s"""WITH d AS (SELECT lang,
                len(string_split_regex(lower(trim(text)), '\\s+')) AS dl
              FROM documents),
         dom AS (SELECT lang, count(*) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
         sc AS (SELECT count(*) AS n_domains,
                  CAST(sum(n_tokens) AS BIGINT) * $mul AS budget FROM dom),
         r AS (SELECT lang, n_docs, n_tokens, n_tokens * $cap AS cap_tokens,
                 n_domains, budget,
                 row_number() OVER (ORDER BY n_tokens * $cap, lang) AS rn,
                 CAST(sum(n_tokens * $cap) OVER (ORDER BY n_tokens * $cap, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM dom, sc),
         cnd AS (SELECT *, (cap_tokens * (n_domains - rn + 1)
                   <= budget - (cum - cap_tokens)) AS cond_ok FROM r),
         ff AS (SELECT *, min(CASE WHEN NOT cond_ok THEN rn END) OVER () AS f
                FROM cnd),
         g AS (SELECT *, (f IS NULL OR rn < f) AS capped FROM ff),
         h AS (SELECT *, CAST(sum(CASE WHEN capped THEN cap_tokens ELSE 0 END)
                 OVER () AS BIGINT) AS capped_sum FROM g),
         alloc AS (SELECT *, CAST(CASE WHEN capped THEN cap_tokens
                     ELSE (budget - capped_sum) // (n_domains - f + 1)
                   END AS BIGINT) AS alloc_tokens FROM h)
         SELECT lang, n_docs, n_tokens,
           CAST(cap_tokens AS BIGINT) AS cap_tokens, capped, alloc_tokens,
           floor(alloc_tokens * 10000.0 / n_tokens) / 10000 AS epochs_q4
         FROM alloc ORDER BY lang"""
    },
    "sim_ann_pq_adc" -> pqAdcSql,
    // the stored-index search's oracle IS the in-plan search's oracle:
    // a hash match proves the persisted code table searches identically
    "sim_ann_pq_adc_stored" -> pqAdcSql,
    // the SERVE-ONLY face reads the ensured artifact instead of building
    // in-query — same search math, same oracle
    "sim_ann_adc_serve" -> pqAdcSql,
    // the refine stage: ADC shortlist (shared chain with sim_ann_pq_adc)
    // → exact cosine over only the shortlist → top-k on exact scores
    "sim_ann_adc_rerank" -> pqAdcRerankSql,
    "sim_ann_ivfpq" -> ivfPqAdcSql(filtered = false),
    // the filtered-search face: the SAME ivf-pq builder restricted to
    // same-label candidates BEFORE the ADC lookups — the filtered result
    // provably comes from the same index math
    "sim_ann_ivfpq_filtered" -> ivfPqAdcSql(filtered = true)
  )

  /** The IVF∘ADC oracle chain — ONE builder for the unfiltered search and
    * the label-filtered face, so the two cannot drift on probe routing,
    * encode, or ADC arithmetic; `filtered` adds the label equi-predicate
    * to the candidate CTE (pre-filter, before any distance work) and the
    * label column to the output.
    */
  /** The IVF∘ADC CTE chain up to the full ranking `k` (query_id, vec_id,
    * adc, rank[, label]) — shared by the two registered ivf-pq faces and
    * the stored-hybrid oracle's vector leg (which cuts `k` at rrfDepth
    * instead of topK).
    */
  private def ivfPqAdcChain(filtered: Boolean, src: String = "embeddings"): String = {
    val (m, sd) = (Sim.pqM, Sim.pqSubDim)
    val dCols = (0 until m)
      .map(j => s"sum(CASE WHEN qb.m = $j THEN d END) AS d$j").mkString(",\n           ")
    val adcSum = (0 until m).map(j => s"d$j").mkString(" + ")
    val labCte =
      if (filtered) s",\n       lab AS (SELECT vec_id, label FROM $src)"
      else ""
    val candCte =
      if (filtered)
        s"""cand AS (SELECT pr.query_id, CAST(ql.label AS BIGINT) AS label, a.vec_id
                  FROM a JOIN pr USING (cluster)
                    JOIN lab cl ON cl.vec_id = a.vec_id
                    JOIN lab ql ON ql.vec_id = pr.query_id
                  WHERE a.vec_id <> pr.query_id AND cl.label = ql.label)"""
      else
        """cand AS (SELECT pr.query_id, a.vec_id
                  FROM a JOIN pr USING (cluster) WHERE a.vec_id <> pr.query_id)"""
    val labelSel = if (filtered) "cand.label," else ""
    val labelGrp = if (filtered) "GROUP BY 1, 2, 3" else "GROUP BY 1, 2"
    s"""${centroidAssignCtes(src)},
       ${pqEncodeChain("q")},
       pr AS (SELECT vec_id AS query_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
                  ORDER BY ccos DESC, cluster) AS prk
                FROM p WHERE vec_id < ${Sim.nQueries})
              WHERE prk <= ${Sim.ivfPqProbes}),
       qq AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < ${Sim.nQueries}),
       tbl AS (SELECT qq.query_id, qc.code, m.m,
               list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                 i -> (qq.qv[m.m*$sd+i] - qc.cv[m.m*$sd+i])
                      * (qq.qv[m.m*$sd+i] - qc.cv[m.m*$sd+i]))),
                 (a, b) -> a + b) AS d
             FROM qq CROSS JOIN qc
               CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) m)$labCte,
       $candCte,
       s AS (SELECT cand.query_id, $labelSel cand.vec_id,
         $dCols
         FROM cand JOIN qb ON qb.vec_id = cand.vec_id
           JOIN tbl ON tbl.m = qb.m AND tbl.code = qb.code
             AND tbl.query_id = cand.query_id
         $labelGrp),
       k AS (SELECT *, ($adcSum) AS adc, row_number() OVER (
               PARTITION BY query_id ORDER BY ($adcSum), vec_id) AS rank FROM s)"""
  }

  private def ivfPqAdcSql(filtered: Boolean): String = {
    val labelOut = if (filtered) "label," else ""
    s"""WITH ${ivfPqAdcChain(filtered)}
       SELECT query_id, $labelOut vec_id AS neighbor_id, rank,
         floor(adc * 10000) / 10000 AS adc_dist
       FROM k WHERE rank <= ${Sim.topK} ORDER BY query_id, rank"""
  }
}
