package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full IdJob→DwJob chain as ONE declarative plan (the reference runs
  * ~15 Flink operators with async state RPCs to produce this row —
  * EventAttrTransfer.java + DataRouterOperator.java): envelope → identity
  * resolution → session id → enrichment (geo/UA/UTM) → time components →
  * platform dim → DQ verdict, emitting the event_attr table that lands in
  * the warehouse.
  *
  * Cost shape at 100 TB: one events scan feeds everything; the only wide
  * exchanges are the identity-resolution shuffles on (app, device) and
  * (app, user); every dim (platform, geo ranges) broadcasts; all scalar
  * work is whole-stage codegen. This is the query `entry` smoke-checks.
  */
object Pipeline {

  def eventAttr(t: Tables): DataFrame =
    eventAttrUnsorted(t).orderBy(col("event_id"))

  /** The pipeline row without the presentation orderBy — the streaming
    * salted sink repartitions by (day, salt) right after, so a global sort
    * here would be shuffled away unread.
    */
  private[graft] def eventAttrUnsorted(t: Tables): DataFrame = {
    val env = Envelope.attach(t.events)
      .filter(col("dt").isin("evt", "vtl", "mkt", "ss", "se", "abp"))
    // zgids resolve on the (appkey, cuid)/(appkey, did) KEY AXES — the same
    // shuffles the id maps pay anyway — instead of materializing per-event
    // zgids and re-joining on event_id (a full event-axis exchange this
    // plan never needs; same rewrite as the Route row builds)
    val (_, uz, dz) = Identity.zgidAxes(t)

    // enrichment columns (same exprs as #15-#18)
    val ua = col("ua")
    val os = Enrich.Ua.os(ua)
    val browser = Enrich.Ua.browser(ua)
    val utmSource = nullif(parse_url(col("url"), lit("QUERY"), lit("utm_source")), lit(""))
    val utmMedium = nullif(parse_url(col("url"), lit("QUERY"), lit("utm_medium")), lit(""))
    val host = parse_url(col("referrer"), lit("HOST"))
    val engine = Enrich.engineOf(col("referrer"))
    val medium = when(utmSource.isNotNull, coalesce(utmMedium, lit(Enrich.NullValue)))
      .when(engine =!= "unknown", lit("搜索自然流量"))
      .when(col("referrer") =!= "", lit("引荐"))
      .otherwise(Enrich.NullValue)
    val source = when(utmSource.isNotNull, utmSource)
      .when(engine =!= "unknown", host)
      .when(col("referrer") =!= "", host)
      .otherwise(Enrich.NullValue)

    // the uz/dz attaches MERGE-pin ABOVE the corpus-size threshold (r14):
    // the suite-wide AQE shuffled-hash conversion regressed exactly this
    // face at the sf10 gate (pipeline_all_job 59 -> 85 s, gc 3.4 ->
    // 4.4 s — per-partition hash maps of the corpus-scale key axes thrash
    // where the sorted merge streams; measured both ways at sf10, SMJ
    // wins 60.3 vs 86.4 solo), while at sf0.1 the converted join is ~1 s
    // FASTER — so the pin derives from input size (Identity.bigCorpus)
    // instead of hard-coding either scale's winner. Results are
    // strategy-independent; the oracle checks both regimes (sf0.01
    // unpinned, the sf10 gate pinned). Route's transfer row keeps the
    // conversion at every scale — its uz/dz joins sit under different
    // reuse and measured FASTER converted at sf10.
    val pin = Identity.bigCorpus(t)
    def axis(df: DataFrame) = if (pin) df.hint("merge") else df
    env
      .join(axis(uz), Seq("appkey", "cuid"), "left")
      .join(axis(dz), Seq("appkey", "did"), "left")
      .join(Route.platformId(t), Seq("pl"), "left")
      .select(
        col("event_id"),
        coalesce(
          when(col("cuid").isNotNull, col("u_zgid"))
            .when(col("did") =!= "", col("d_zgid")),
          lit(Enrich.NullValue)).as("zgid"),
        // SessionIdProcessOperator.java:63-67: $sid numeric -> $zg_sid else -1
        coalesce(expr("try_cast(sid_raw AS bigint)"), lit(-1L)).as("zg_sid"),
        date_format(col("ts"), "yyyyMMdd").as("day_id"),
        unix_timestamp(col("ts")).as("begin_date"),
        coalesce(col("platform_id"), lit(0)).as("platform_id"),
        col("event_type").as("event_name"),
        os.as("os"),
        browser.as("browser"),
        source.as("utm_source"),
        medium.as("utm_medium"))
  }

  /** pipeline_all_job — AllJob.java:49-56, the reference's full-chain job:
    * GateJob → IdJob → DwJob with in-memory handoff (no intermediate Kafka).
    *
    * Gate leg: the transport resolver verdict (MsgResolver) is computed as a
    * COLUMN on the envelope scan (`Gate.resolveCols`) — no join back — and
    * the per-app ip/ua blacklists + blocked-ak drop (GateFlatMapFunction)
    * are broadcast anti-joins. Only fully-resolved, unblocked messages
    * proceed, exactly like GateJob.execute's output stream.
    *
    * Id+Dw legs: `eventAttr` over the SURVIVING events — identity
    * resolution's first-writer ranks run on the gate-passed set (the
    * reference's IdJob consumes GateJob's output, so a gate-rejected event
    * can never be a first writer). The filtered envelope is checkpointed
    * once: five id/dw plan branches read it.
    */
  def allJob(t: Tables): DataFrame = {
    graft.functions.CodecExpressions.register(t.spark)
    val eventCols = t.events.columns
    // Materialize (event cols, gate keys, verdict) BEFORE the filter and
    // anti-joins: the resolver verdict is one expensive expression tree
    // (message construction + the variant parse), and evaluating it
    // inside the filter/join stage re-inlines that tree into every
    // consumer (the predicate, each join key path, the output projection)
    // — measured 62 s vs ~8 s for exactly one evaluation pass per row.
    // After the checkpoint the gate decision chain runs over materialized
    // bytes: a broadcast-hash anti-join pair plus a string filter.
    val keep = eventCols.map(col) ++ Seq(col("appkey"), col("ip"), col("ua"), col("verdict"))
    val resolved = graft.engine.Reliability.planCheckpoint(
      Gate.resolveCols(Envelope.attach(t.events)).select(keep: _*))
    val passed = graft.engine.Reliability.planCheckpoint(
      Gate.passEvents(resolved).select(eventCols.map(col): _*))
    Pipeline.eventAttr(new Tables(t.spark, t.dir) {
      override def events: DataFrame = passed
    })
  }
}
