package graft.streaming

import graft.operators.{Envelope, Route}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the Flink jobs (SURVEY.md §2.9).
  *
  * The reference runs IdJob → DwJob as per-record Flink operators with async
  * state RPCs (main/IdJob.java:22-43, main/DwJob.java:414-428). Streaming-
  * on-Spark: the same chain is `readStream` → the *identical* column
  * expressions used in batch (validation, enrichment, routing are all pure
  * exprs, so batch and streaming share one implementation) → watermarked
  * windowed aggregation for DQ stats → `flatMapGroupsWithState` for the one
  * genuinely stateful step (sessionization).
  *
  * At scale: stateless stages are shard-parallel with no state store;
  * only sessionization keys state by user — the same single-shuffle posture
  * as the batch sessionizer (#8).
  */
object EventStreamPipeline {

  /** Events schema as the streaming source sees it. `ts` defaults to a raw
    * long: the generator's physical type has varied across rounds
    * (TIMESTAMP(NANOS), TIMESTAMP(MICROS)/NTZ — both INT64 on disk), and a
    * long schema reads every INT64 variant; `Tables.epochMicros` then detects
    * the precision by magnitude and restores a proper timestamp, exactly like
    * the batch loader. `readEvents` probes the parquet footer once at stream
    * setup and swaps in the actual physical type, so a future non-INT64 form
    * (e.g. a plain instant timestamp) streams too instead of failing the read.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // One batch footer probe at setup (files are staged before the stream
    // starts); the normalization then mirrors Tables.events exactly.
    val physicalTs = spark.read.parquet(dir).schema("ts").dataType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = physicalTs) else f))
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    physicalTs match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(graft.sources.Tables.epochMicros(col("ts"))))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** The IdJob+DwJob chain as one streaming transform: envelope → owner
    * normalization → DQ verdict → route. All stateless column work —
    * identical semantics to the batch operators (#1, #19, #21).
    */
  def pipeline(events: DataFrame): DataFrame = {
    val route = Route.dtRoutes.foldRight(lit("drop")) { case ((dt, r), other) =>
      when(col("dt") === dt, r).otherwise(other)
    }
    Envelope.attach(events)
      .withColumn("owner",
        when(col("owner_raw").isin("zg_adp", "zg_mkt", "zg_cdp"), col("owner_raw"))
          .otherwise(lit("zg")))
      .withColumn("route", route)
  }

  /** Watermarked hourly DQ counts (the DQ Kafka topic as a live aggregate).
    * 1-day watermark bounds state; late events beyond it are dropped.
    */
  def dqWindowCounts(enriched: DataFrame): DataFrame =
    enriched
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour"), col("route"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("route"), col("n"))

  /** Watermarked hourly counts per UNIFIED chain error code — the live
    * form of the reference's DQ Kafka topic with real ErrorMessageEnum
    * codes. `Route.withChainCode` is the SAME expression set as the batch
    * ledger (stateless + broadcast dims), so the stream cannot drift from
    * the batch semantics.
    */
  def dqChainWindowCounts(events: DataFrame): DataFrame =
    Route.withChainCode(Envelope.attach(events))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour"), col("error_code"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("error_code"), col("n"))

  /** Stream-static enrichment: the geo interval dim (tiny, broadcast) range-
    * joined against the live stream — the streaming form of #15. Stream-
    * static joins are stateless on the stream side, so this adds zero state
    * store pressure at any scale.
    */
  def enrichGeoStream(enriched: DataFrame): DataFrame = {
    import graft.operators.Enrich
    val spark = enriched.sparkSession
    import spark.implicits._
    val dim = Enrich.geoBlocks.map { case (octet, country, province, city) =>
      val base = 203L * (1L << 24) + octet * 256L
      (base, base + 255L, country, province, city)
    }.toDF("ip_start", "ip_end", "geo_country", "geo_province", "geo_city")
    enriched
      .withColumn("ip_long", Enrich.ipToLong(col("ip")))
      .withColumn("is_private", Enrich.isPrivateIp(col("ip")))
      .join(broadcast(dim),
        !col("is_private") && col("ip_long") >= col("ip_start") && col("ip_long") <= col("ip_end"),
        "left")
      .withColumn("country",
        when(col("is_private"), Enrich.NullValue)
          .otherwise(coalesce(col("geo_country"), lit(Enrich.NullValue))))
  }

  /** Streaming virtual events — #11 on the live stream: the SAME compiled
    * rule cells as the batch operator (`Derive.virtualEventCols` — shared
    * builder, zero drift), stateless, one derived row per matching rule.
    */
  def virtualEventsStream(events: DataFrame): DataFrame =
    graft.operators.Derive.virtualEventCols(Envelope.attach(events))
      .select(col("event_id"), col("virtual_name"), col("ts"))

  /** Watermarked streaming dedup — the streaming analog of #9/#36: exactly
    * one row per event_id within the watermark horizon (late duplicates
    * beyond 1 day are dropped with their state).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming gate leg — GateJob on the live stream: the transport
    * resolver verdict (`Gate.resolveCols`, pure column expressions — the
    * identical implementation batch uses) plus the broadcast blacklist
    * anti-joins. Stateless: no state store at any scale, so the gate adds
    * zero streaming memory pressure. Emits only surviving events, exactly
    * like GateJob.execute's output stream feeding IdJob.
    */
  def gateStream(events: DataFrame): DataFrame = {
    import graft.operators.{Envelope, Gate}
    graft.functions.CodecExpressions.register(events.sparkSession)
    Gate.passEvents(Gate.resolveCols(Envelope.attach(events)))
      .select(events.columns.map(col) :+ col("verdict"): _*)
  }

  // ---- stateful device-state id leg (streaming analog of #7's dz/dfu) ----

  case class DevState(firstCuid: String)
  case class DevUpdate(appkey: String, did: String, firstCuid: String,
                       nEvents: Long)

  /** Streaming device-state leg of OneIdService (the dfu/dz Kvrocks-hash
    * WRITES, OneIdService.java:441-660): keyed state per (appkey, did)
    * remembers the device's FIRST real-name user — the HSETNX
    * first-writer-wins — and emits the current binding each batch.
    * In-batch rows are processed in (ts, event_id) order so a replay
    * matches the batch operator's deterministic first-writer tie-break
    * (spec-matched against batch `dfu`). Resolving the binding into a
    * final zgid is the READ side — a join against the user axis, the same
    * downstream join batch `zgidResolution` does.
    *
    * State per ever-seen device is ONE string — the same bound as the
    * reference's hash entry, keyed the same way; no watermark expiry
    * because the binding is permanent (the reference never expires dz
    * either).
    */
  def deviceFirstUserStream(events: DataFrame): Dataset[DevUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    Envelope.attach(events)
      .filter(col("appkey") =!= "" && col("did") =!= "")
      .select(col("appkey"), col("did"), col("cuid"), col("ts"), col("event_id"))
      .as[(String, String, Option[String], java.sql.Timestamp, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[DevState, DevUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((appkey, did), rows, state: GroupState[DevState]) =>
          val ordered = rows.toSeq.sortBy(r => (r._4.getTime, r._5))
          var st = state.getOption.getOrElse(DevState(null))
          ordered.foreach { r =>
            if (st.firstCuid == null && r._3.isDefined)
              st = DevState(r._3.get)
          }
          state.update(st)
          Iterator(DevUpdate(appkey, did, st.firstCuid, ordered.size.toLong))
      }
  }

  /** Streaming zgid READ side — the dz→zgid resolution
    * (OneIdService.java:441-660's read path) end-to-end on the stream:
    * `deviceFirstUserStream` holds the WRITE side (the device's first
    * real-name user as keyed state); each emitted binding then resolves to
    * its final zgid by joining the user axis — a device whose first user
    * has a zgid inherits it, an anonymous-only device mints `z:d:app:did`.
    * The user axis arrives as a dimension frame (stream-static broadcast
    * join — in production the continuously-maintained uz table/state
    * store; here `Identity.zgidAxes`' uz so stream and batch read the
    * SAME axis definition). Stateless beyond the write-side state: no new
    * state store pressure at scale.
    */
  def deviceZgidStream(events: DataFrame, userAxis: DataFrame): DataFrame =
    deviceFirstUserStream(events).toDF()
      .join(broadcast(userAxis.withColumnRenamed("cuid", "firstCuid")),
        Seq("appkey", "firstCuid"), "left")
      .select(col("appkey"), col("did"),
        coalesce(col("u_zgid"),
          concat(lit("z:d:"), col("appkey"), lit(":"), col("did"))).as("zgid"))

  case class RegState(assigned: Map[String, Int])
  case class RegUpdate(appkey: String, eventType: String, cusKey: String, colIndex: Int)

  /** Streaming column-index registry — EventAttrAsyncOperator's
    * per-record registration as keyed state: each (appkey, event_type)
    * group assigns the next free cus-column index to every NEW eligible
    * custom-property key, first-come-first-served within the column
    * budget, and emits the assignment once (the Kvrocks HSETNX + INCR
    * pair re-expressed as one state map). In-batch rows process in
    * (ts, event_id) order so a replay matches the batch registry's
    * first-seen rank. State per group is bounded by the column budget —
    * at most `Derive.customColumns` entries, exactly the reference's hash
    * size. Spec-matched against batch `Derive.eventAttrColumnIndex`.
    */
  def columnIndexRegistryStream(events: DataFrame): Dataset[RegUpdate] = {
    import graft.operators.Derive
    val spark = events.sparkSession
    import spark.implicits._
    Envelope.attach(events)
      .filter(col("appkey") =!= "" && Derive.customPropEligible)
      .select(col("appkey"), col("event_type"), col("cus_key"), col("ts"), col("event_id"))
      .as[(String, String, String, java.sql.Timestamp, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[RegState, RegUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((appkey, eventType), rows, state: GroupState[RegState]) =>
          // (ts, cus_key, event_id): the KEY tie-break matches the batch
          // registry's dense_rank ORDER BY (first_ts, cus_key), so a
          // single-batch replay agrees with the batch ranks even when two
          // new keys share a first-seen timestamp
          val ordered = rows.toSeq.sortBy(r => (r._4.getTime, r._3, r._5))
          var st = state.getOption.getOrElse(RegState(Map.empty))
          val out = ordered.flatMap { r =>
            val key = r._3
            if (st.assigned.contains(key) || st.assigned.size >= Derive.customColumns) None
            else {
              val idx = st.assigned.size + 1
              st = RegState(st.assigned + (key -> idx))
              Some(RegUpdate(appkey, eventType, key, idx))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class MintIn(appkey: String, key: String, ts: java.sql.Timestamp,
      eventId: Long)
  case class NewKey(appkey: String, key: String, ordNs: Long, ordId: Long)
  case class MintCounter(next: Long)
  case class SurrogateAssign(appkey: String, key: String, surrogateId: Long)

  /** Streaming surrogate-id mint — OneIdService's WRITE path
    * (OneIdService.java:312-409: HSETNX first-writer-wins on the
    * device_id/user_id hash, then INCR for the new id) as two keyed
    * stages with BOUNDED state:
    *
    *   stage 1, keyed (appkey, key) — the HSETNX gate: each device/user
    *   key passes exactly once, at first sight, stamped with its event's
    *   full-precision order key (one boolean per ever-seen key — the
    *   hash-existence bound the reference itself carries);
    *
    *   stage 2, keyed appkey — the INCR counter: new keys take the next
    *   dense id in first-seen order. State is ONE long per app; the
    *   per-app serialization point is the same one the reference has in
    *   the Kvrocks counter.
    *
    * Arrival-order ids are the reference's real semantics (snowflake/INCR
    * values depend on arrival, not key ordering), so the batch parity
    * contract is BIJECTION with `Identity.deviceMap`/`userMap` — same key
    * set, dense 1..n per app — plus cross-batch monotonicity (earlier
    * first-sight ⇒ smaller id), not value equality with the batch dense
    * rank. `axis` = "did" (device) or "cuid" (user).
    */
  def surrogateIdStream(events: DataFrame, axis: String): Dataset[SurrogateAssign] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keep =
      if (axis == "did") col("did") =!= "" else col("cuid").isNotNull
    val fresh = Envelope.attach(events)
      .filter(col("appkey") =!= "" && keep)
      .select(col("appkey"), col(axis).as("key"), col("ts"), col("event_id").as("eventId"))
      .as[MintIn]
      .groupByKey(r => (r.appkey, r.key))
      .flatMapGroupsWithState[ArchSeen, NewKey](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((appkey, key), rows, state: GroupState[ArchSeen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(r => (eventOrdNs(r.ts), r.eventId))
            state.update(ArchSeen(true))
            Iterator(NewKey(appkey, key, eventOrdNs(first.ts), first.eventId))
          }
      }
    fresh
      .groupByKey(_.appkey)
      .flatMapGroupsWithState[MintCounter, SurrogateAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (appkey, rows, state: GroupState[MintCounter]) =>
          var next = state.getOption.map(_.next).getOrElse(1L)
          // (ord, key, id): the KEY tie-break keeps a same-instant replay
          // deterministic, like the column-index registry
          val out = rows.toSeq.sortBy(r => (r.ordNs, r.key, r.ordId)).map { r =>
            val a = SurrogateAssign(appkey, r.key, next)
            next += 1
            a
          }
          state.update(MintCounter(next))
          out.iterator
      }
  }

  case class UserPropRegState(assigned: Map[String, Int], counts: Map[String, Long])
  case class UserPropRegUpdate(appkey: String, propKey: String, propId: Int, n: Long)

  /** Streaming user-prop registry — UserPropAsyncOperator's per-record id
    * registration (the user_property:{appId} Kvrocks hash) as keyed state
    * per app: every NEW upper-cased prop key gets the next dense id in
    * first-seen order (blacklisted names skipped — the same gate as batch
    * `Derive.userPropRegistry`), and each touched key re-emits its
    * registry row with the running observation count. In-batch rows
    * process in (ts, prop_key, event_id) order so replays agree with the
    * batch dense_rank's (first_ts, prop_key) tie-break. State per app is
    * the prop map itself — exactly the reference's hash size.
    * Spec-matched against the batch registry.
    */
  def userPropRegistryStream(events: DataFrame): Dataset[UserPropRegUpdate] = {
    import graft.operators.Derive
    val spark = events.sparkSession
    import spark.implicits._
    Envelope.attach(events)
      .filter(col("dt") === "usr" && col("cuid").isNotNull && col("appkey") =!= "")
      .select(col("appkey"), col("ts"), col("event_id"),
        concat(lit("p"), col("user_id") % 7).as("prop_name"))
      .filter(!col("prop_name").isin(Derive.userPropBlacklist: _*))
      .select(col("appkey"), upper(col("prop_name")).as("prop_key"),
        col("ts"), col("event_id"))
      .as[(String, String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserPropRegState, UserPropRegUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (appkey, rows, state: GroupState[UserPropRegState]) =>
          // full-precision first_ts tie-break: the batch dense_rank orders
          // by exact (first_ts, prop_key), so the replay must too
          val ordered = rows.toSeq.sortBy(r => (eventOrdNs(r._3), r._2, r._4))
          var st = state.getOption.getOrElse(UserPropRegState(Map.empty, Map.empty))
          ordered.foreach { r =>
            if (!st.assigned.contains(r._2))
              st = st.copy(assigned = st.assigned + (r._2 -> (st.assigned.size + 1)))
            st = st.copy(counts =
              st.counts.updated(r._2, st.counts.getOrElse(r._2, 0L) + 1L))
          }
          state.update(st)
          ordered.map(_._2).distinct.map(k =>
            UserPropRegUpdate(appkey, k, st.assigned(k), st.counts(k))).iterator
      }
  }

  case class ArchMsg(archiveType: Int, appId: Int, appkey: String,
      mapKey: String, mapValue: String, ordNs: Long, ordId: Long)
  case class ArchSeen(seen: Boolean)
  case class ArchRouteState(ordNs: Long, ordId: Long, value: String, seq: Long)
  case class ArchRouteUpdate(archiveType: Int, typeName: String, appId: Int,
      mapKey: String, mapValue: String, seq: Long)

  private val archTypeNames = Map(1 -> "DEVICE", 2 -> "USER",
    3 -> "DEVICE_ZGID", 4 -> "USER_ZGID", 5 -> "ZGID_USER")

  /** Full-precision event-time order key (epoch ns): Timestamp.getTime is
    * ms-truncated, so ms-tied micro-distinct events would sort by the
    * wrong axis; getNanos restores the sub-second part exactly.
    */
  private def eventOrdNs(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000L * 1000000000L + ts.getNanos

  /** Streaming 5-way archive router — IdArchiveJob in its native shape
    * (IdArchiveRouterOperator.java:74-127 + ArchiveType.java:11-18). The
    * reference's id legs emit ONE archive message per id-binding WRITE
    * (the Kvrocks HSETNX that fired); the router fans each message into
    * its ArchiveType mapping table, where the sink upserts latest-wins.
    * Re-expressed as two keyed stages sharing the batch axis definitions:
    *
    *   stage 1, keyed (appkey, did) / (appkey, cuid) — the HSETNX gate:
    *   a device/user emits its archive messages exactly ONCE, at first
    *   sight, stamped with that event's order key. The id VALUES ride
    *   stream-static broadcast dims (the continuously-maintained
    *   surrogate/zgid maps — `deviceZgidStream`'s state-store argument);
    *   a device key yields DEVICE + DEVICE_ZGID, a user key yields USER +
    *   USER_ZGID + ZGID_USER, exactly the reference's per-write fan-out.
    *
    *   stage 2, keyed (archive_type, appkey, map_key) — the router + the
    *   sink's UNIQUE KEY upsert: state carries the winning (order, value)
    *   and emits a table update only when a LATER-ordered message changes
    *   the value (types 1-4 are single-valued per key by construction, so
    *   the contest only ever fires on the ZGID_USER reverse map — the same
    *   latest-wins the batch leg resolves with max_by).
    *
    * State bounds: one boolean per ever-seen key axis member (stage 1 —
    * the reference's own hash-existence bound) and one small struct per
    * mapping-table row (stage 2 — the table itself). Spec-matched against
    * batch `Identity.archiveRoute` across day-sliced micro-batches.
    */
  def archiveRouteStream(events: DataFrame, devMap: DataFrame,
      usrMap: DataFrame, uz: DataFrame, dz: DataFrame): Dataset[ArchRouteUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val reg = broadcast(
      graft.operators.Envelope.appRegistryDf(spark).select(col("appkey"), col("app_id")))
    val env = Envelope.attach(events).filter(col("appkey") =!= "")

    val devMsgs = env.filter(col("did") =!= "")
      .select(col("appkey"), col("did"), col("ts"), col("event_id"))
      .join(reg, Seq("appkey"))
      .join(broadcast(devMap.select(col("appkey"), col("did"), col("zg_did"))),
        Seq("appkey", "did"))
      .join(broadcast(dz.select(col("appkey"), col("did"), col("d_zgid"))),
        Seq("appkey", "did"), "left")
      .select(col("appkey"), col("did"), col("ts"), col("event_id"),
        col("app_id"), col("zg_did"), col("d_zgid"))
      .as[(String, String, java.sql.Timestamp, Long, Int, Int, Option[String])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[ArchSeen, ArchMsg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((appkey, did), rows, state: GroupState[ArchSeen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(r => (eventOrdNs(r._3), r._4))
            state.update(ArchSeen(true))
            val ord = eventOrdNs(first._3)
            val dev = ArchMsg(1, first._5, appkey, did,
              first._6.toString, ord, first._4)
            first._7 match {
              case Some(z) =>
                Iterator(dev, ArchMsg(3, first._5, appkey,
                  first._6.toString, z, ord, first._4))
              case None => Iterator(dev)
            }
          }
      }

    val usrMsgs = env.filter(col("cuid").isNotNull)
      .select(col("appkey"), col("cuid"), col("ts"), col("event_id"))
      .join(reg, Seq("appkey"))
      .join(broadcast(usrMap.select(col("appkey"), col("cuid"), col("zg_uid"))),
        Seq("appkey", "cuid"))
      .join(broadcast(uz.select(col("appkey"), col("cuid"), col("u_zgid"))),
        Seq("appkey", "cuid"))
      .select(col("appkey"), col("cuid"), col("ts"), col("event_id"),
        col("app_id"), col("zg_uid"), col("u_zgid"))
      .as[(String, String, java.sql.Timestamp, Long, Int, Int, String)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[ArchSeen, ArchMsg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((appkey, cuid), rows, state: GroupState[ArchSeen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(r => (eventOrdNs(r._3), r._4))
            state.update(ArchSeen(true))
            val ord = eventOrdNs(first._3)
            Iterator(
              ArchMsg(2, first._5, appkey, cuid, first._6.toString, ord, first._4),
              ArchMsg(4, first._5, appkey, first._6.toString, first._7, ord, first._4),
              ArchMsg(5, first._5, appkey, first._7, first._6.toString, ord, first._4))
          }
      }

    devMsgs.union(usrMsgs)
      .groupByKey(m => (m.archiveType, m.appkey, m.mapKey))
      .flatMapGroupsWithState[ArchRouteState, ArchRouteUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((tpe, _, key), rows, state: GroupState[ArchRouteState]) =>
          val ordered = rows.toSeq.sortBy(m => (m.ordNs, m.ordId))
          var st = state.getOption.getOrElse(
            ArchRouteState(Long.MinValue, Long.MinValue, null, 0L))
          val out = ordered.flatMap { m =>
            val later = m.ordNs > st.ordNs ||
              (m.ordNs == st.ordNs && m.ordId >= st.ordId)
            if (later && m.mapValue != st.value) {
              st = ArchRouteState(m.ordNs, m.ordId, m.mapValue, st.seq + 1)
              Some(ArchRouteUpdate(tpe, archTypeNames(tpe), m.appId,
                key, m.mapValue, st.seq))
            } else {
              if (later) st = st.copy(ordNs = m.ordNs, ordId = m.ordId)
              None
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class ConvIn(adAppId: Int, zgid: String, ct: Long, kind: Int,
      eventId: Long, lid: Int, eventName: String, flags: Seq[Boolean])
  case class ClickState(clickCt: Long, clickLid: Int)
  case class LidState(lastCt: Map[String, Long], sent: Set[(String, String)])
  case class ConvSend(eventId: Long, lid: Int, eventName: String,
      zgid: String, convCt: Long, clickCt: Long)

  /** Streaming deep-conversion decisions — AdvConvertEventFlatMapFunction
    * as TWO chained keyed-state stages, the shape the reference actually
    * runs against Redis:
    *
    *   stage 1, keyed (ad_app_id, zgid) — the adtf:ct/adtf:data state:
    *   holds the user's latest click (ct + lid); each conversion checks
    *   the click's link config — event set, attribution window, compiled
    *   audience flag (`Adv.clickLid` / `Adv.linkFlag`, the SAME
    *   expressions as batch `deepConvert`) — and emits the QUALIFYING
    *   conversions;
    *
    *   stage 2, keyed lid — the corpus-global adtf:convert status keys +
    *   ads_frequency_first: running per-event last-ct implements the
    *   TTL'd multi-event 回传事件组 completion, and the sent-set caps each
    *   (event, link, user) at one send. Same relational semantics as the
    *   batch operator's lid window + first-send dedup, so the spec matches
    *   stream to batch EXACTLY, multi-event links included.
    *
    * State bounds: stage 1 is one click struct per active user; stage 2 is
    * |event names| cts plus the sent key set — the latter grows with
    * senders exactly like the reference's ads_frequency_first table (no
    * TTL by design there either). The zgid axes arrive as static dimension
    * frames (stream-static broadcast), like `deviceZgidStream`.
    */
  /** The streaming AdvJob admission + zgid attach — ONE definition of the
    * gate batch centralizes in `Adv.advAdmitted` (ad-app registry join,
    * per-app ip/ua data_access_filter broadcast anti-joins — all
    * stateless) plus the zgid resolution on the broadcast axes. Both ad
    * streams (`deepConvertStream`, `lidAttachStream`) derive through it
    * so their admitted sets cannot drift.
    */
  private def advAdmittedStream(events: DataFrame, uz: DataFrame,
      dz: DataFrame): DataFrame = {
    import graft.operators.Adv
    val spark = events.sparkSession
    import spark.implicits._
    val apps = broadcast(Adv.adAppRegistry.toDF("appkey", "ad_app_id"))
    val ipB = broadcast(graft.operators.Etl.ipBlacklist.toDF("appkey", "ip"))
    val uaB = broadcast(graft.operators.Etl.uaBlacklist.toDF("appkey", "ua"))
    Envelope.attach(events)
      .filter(col("dt") === "evt" && col("appkey") =!= "")
      .join(apps, Seq("appkey"))
      .join(ipB, Seq("appkey", "ip"), "left_anti")
      .join(uaB, Seq("appkey", "ua"), "left_anti")
      .join(broadcast(uz), Seq("appkey", "cuid"), "left")
      .join(broadcast(dz), Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull)
  }

  def deepConvertStream(events: DataFrame, uz: DataFrame, dz: DataFrame): Dataset[ConvSend] = {
    import graft.operators.Adv
    val spark = events.sparkSession
    import spark.implicits._
    val links = Adv.adsLinkRegistry
    val byLid = links.map(l => l.lid -> l).toMap
    val idxOf = links.map(_.lid).zipWithIndex.toMap
    val convEvents = links.flatMap(_.eventIds).distinct
    val qualifying = advAdmittedStream(events, uz, dz)
      .filter(col("event_type").isin("click" +: convEvents: _*))
      .select(
        col("ad_app_id").as("adAppId"), col("zgid"),
        (unix_timestamp(col("ts")) * 1000).as("ct"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"),
        col("event_id").as("eventId"),
        when(col("event_type") === "click", Adv.clickLid).otherwise(-1).as("lid"),
        col("event_type").as("eventName"),
        array(links.map(Adv.linkFlag): _*).as("flags"))
      .as[ConvIn]
      .groupByKey(r => (r.adAppId, r.zgid))
      .flatMapGroupsWithState[ClickState, ConvSend](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((_, zgid), rows, state: GroupState[ClickState]) =>
          val ordered = rows.toSeq.sortBy(r => (r.ct, r.kind, r.eventId))
          var st = state.getOption.getOrElse(ClickState(-1L, -1))
          val out = ordered.flatMap { r =>
            if (r.kind == 0) { st = ClickState(r.ct, r.lid); None }
            else if (st.clickCt < 0) None
            else byLid.get(st.clickLid) match {
              case Some(l) if l.eventIds.contains(r.eventName) &&
                  r.ct >= st.clickCt &&
                  r.ct - st.clickCt <= l.windowSec * 1000L &&
                  r.flags(idxOf(l.lid)) =>
                Some(ConvSend(r.eventId, l.lid, r.eventName, zgid, r.ct, st.clickCt))
              case _ => None
            }
          }
          state.update(st)
          out.iterator
      }
    qualifying
      .groupByKey(_.lid)
      .flatMapGroupsWithState[LidState, ConvSend](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (lid, rows, state: GroupState[LidState]) =>
          val link = byLid(lid)
          val ordered = rows.toSeq.sortBy(r => (r.convCt, r.eventId))
          var st = state.getOption.getOrElse(LidState(Map.empty, Set.empty))
          val out = ordered.flatMap { r =>
            // own status refreshes first (the reference SETs before MGET)
            st = st.copy(lastCt = st.lastCt.updated(r.eventName,
              math.max(st.lastCt.getOrElse(r.eventName, Long.MinValue), r.convCt)))
            val complete = link.eventIds.forall(e =>
              st.lastCt.get(e).exists(s => r.convCt - s <= link.windowSec * 1000L))
            val key = (r.eventName, r.zgid)
            if (complete && !st.sent(key)) {
              st = st.copy(sent = st.sent + key)
              Some(r)
            } else None
          }
          state.update(st)
          out.iterator
      }
  }

  case class LidIn(adAppId: Int, zgid: String, ct: Long, kind: Int,
    eventId: Long, lname: String, ctype: String, acct: String,
    camp: Long, adg: Long, adid: Long, kw: Long)
  case class AdTouch(lid: Long, lname: String, ctype: String, acct: String,
    camp: Long, adg: Long, adid: Long, kw: Long)
  case class LidAttachState(first: Option[AdTouch], last: Option[AdTouch])
  case class LidAttach(eventId: Long, lid: Long, channelType: String,
    channelName: String, accountId: String, campaignId: String,
    adgroupId: String, adId: String, keywordId: String, firstLid: Long,
    firstAdSource: String, folLid: Long, folAdSource: String)

  /** Streaming ad-prop attach — AdvLidAndUserFirstEndFlatMapFunction in
    * its native keyed-state shape: per (ad_app_id, zgid) the state is
    * exactly the reference's Redis pair (the latest touch's detail = the
    * adms JSON at maxCt, plus the first/follow "lid,lname" string —
    * carried as first/last `AdTouch`s). Clicks update the state; every
    * other evt row reads it and emits the attach row — the same columns,
    * gates ($-formatting, zero-means-absent, empty-channel suppression)
    * and first/follow rule as batch `Adv.lidUserFirstEnd`, which the spec
    * matches EXACTLY. Touch synthesis is the SAME `Adv.touchStruct`
    * column as batch — the state function never re-derives it.
    *
    * State bounds: two fixed-size touch structs per active (app, user) —
    * the reference's own per-user Redis footprint.
    */
  def lidAttachStream(events: DataFrame, uz: DataFrame,
      dz: DataFrame): Dataset[LidAttach] = {
    import graft.operators.Adv
    val spark = events.sparkSession
    import spark.implicits._
    val n = "\\N"
    val dim = Adv.adChannelDim.toMap
    advAdmittedStream(events, uz, dz)
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("touch", when(col("kind") === 0, Adv.touchStruct))
      .select(
        col("ad_app_id").as("adAppId"), col("zgid"),
        (unix_timestamp(col("ts")) * 1000).as("ct"),
        col("kind"), col("event_id").as("eventId"),
        col("touch.lname").as("lname"), col("touch.ctype").as("ctype"),
        col("touch.acct").as("acct"),
        coalesce(col("touch.camp"), lit(0L)).as("camp"),
        coalesce(col("touch.adg"), lit(0L)).as("adg"),
        coalesce(col("touch.adid"), lit(0L)).as("adid"),
        coalesce(col("touch.kw"), lit(0L)).as("kw"))
      .as[LidIn]
      .groupByKey(r => (r.adAppId, r.zgid))
      .flatMapGroupsWithState[LidAttachState, LidAttach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[LidAttachState]) =>
          val ordered = rows.toSeq.sortBy(r => (r.ct, r.kind, r.eventId))
          var st = state.getOption.getOrElse(LidAttachState(None, None))
          def fmt(ctype: String, v: String) = s"$ctype$$$v"
          val out = ordered.flatMap { r =>
            if (r.kind == 0) {
              val tch = AdTouch(r.eventId, r.lname, r.ctype, r.acct,
                r.camp, r.adg, r.adid, r.kw)
              st = LidAttachState(st.first.orElse(Some(tch)), Some(tch))
              None
            } else (st.first, st.last) match {
              case (Some(f), Some(l)) =>
                val folDiffers = s"${l.lid},${l.lname}" != s"${f.lid},${f.lname}"
                Some(LidAttach(
                  r.eventId, l.lid,
                  if (l.ctype != "") l.ctype else n,
                  if (l.ctype != "") dim.getOrElse(l.ctype, "") else n,
                  if (l.acct != "") fmt(l.ctype, l.acct) else n,
                  if (l.camp != 0) fmt(l.ctype, l.camp.toString) else n,
                  if (l.adg != 0) fmt(l.ctype, l.adg.toString) else n,
                  if (l.adid != 0) fmt(l.ctype, l.adid.toString) else n,
                  if (l.kw != 0) fmt(l.ctype, l.kw.toString) else n,
                  f.lid, f.lname,
                  if (folDiffers) l.lid else -1L,
                  if (folDiffers) l.lname else n))
              case _ =>
                Some(LidAttach(r.eventId, -1L, n, n, n, n, n, n, n,
                  -1L, n, -1L, n))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  // ---- stateful sessionization (streaming analog of #8 id_sessionize) ----

  case class SessionState(lastSec: Long, nEvents: Int, nSessions: Int)
  case class SessionUpdate(userId: Long, nSessions: Int, nEvents: Int)

  val gapSec = 1800L

  /** Watermark horizon for the stateful stages: bounds both cross-batch
    * event disorder and state retention.
    */
  val sessionWatermark = "1 hour"

  /** Gap-based sessionization with explicit keyed state — the streaming
    * analog of SessionIdProcessOperator + Flink session windows. Emits the
    * running per-user session count each batch (Update mode).
    *
    * State discipline: input is WATERMARKED, and the gap tracking times out
    * at lastSec + gap via EventTimeTimeout — but timeout only expires the
    * `lastSec` tracking (the session is closed), NOT the running
    * (nSessions, nEvents) totals, which are retained as a compact two-int
    * dormant state so a user who reappears CONTINUES their counts instead
    * of restarting from zero (matching the batch sessionizer's per-user
    * totals). Timeout emits nothing — the totals were already emitted with
    * the last batch that touched the key, so a consumer never sees the same
    * final counts twice. State per ever-seen user is two ints — the same
    * bound as any per-user running aggregate. A cross-batch straggler can
    * never move `lastSec` backwards, so out-of-order arrivals within the
    * watermark horizon join the session they fall into instead of
    * re-opening it.
    */
  def sessionize(events: DataFrame): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", sessionWatermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the session gap elapsed past the watermark: close the session
            // (drop the gap tracking) but carry the totals dormant; no
            // emission — the last data batch already emitted these counts
            state.update(state.get.copy(lastSec = Long.MinValue))
            Iterator.empty
          } else {
            val sorted = rows.map(_._2.getTime / 1000L).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0, 0))
            sorted.foreach { sec =>
              val newSession = st.lastSec == Long.MinValue || sec - st.lastSec > gapSec
              st = SessionState(math.max(sec, st.lastSec), st.nEvents + 1,
                st.nSessions + (if (newSession) 1 else 0))
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              (st.lastSec + gapSec) * 1000L, state.getCurrentWatermarkMs + 1))
            Iterator(SessionUpdate(userId, st.nSessions, st.nEvents))
          }
      }
  }

  /** Documents schema for the streaming ingest-curation leg. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming documents source. The corpus carries no crawl timestamp, so
    * a deterministic synthetic ingest time (epoch 2024-01-01 + doc_id
    * seconds, folded mod 3600) stands in — the column the watermarked dedup
    * state expires on, exactly where a real crawl's fetch time would go.
    * The fold keeps the synthetic spread INSIDE curationStream's 1-hour
    * watermark horizon at every sf, so the batch-equivalence assertion
    * (stream distinct == batch distinct) stays valid as the corpus grows;
    * an unfolded doc_id clock would push early hashes past the horizon once
    * doc_id spread exceeds 3600 and re-emit repeated contents. (In
    * production ingest_ts is a real arrival clock and repeats beyond the
    * horizon re-emitting is the CORRECT bounded-state behavior.)
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ingest_ts", expr("timestamp_seconds(1704067200 + doc_id % 3600)"))

  /** Streaming corpus curation — the training-data pipeline on a live
    * ingest stream (the streaming face of batch #54 `pipeline_curation`):
    * quality + C4 gates are the IDENTICAL batch column expressions
    * (TextAnalysis.qualityCol / c4KeepCol — stateless, fused into the
    * scan), then exact dedup as `dropDuplicatesWithinWatermark` on the
    * normalized-content hash — state is one 16-byte hash per surviving doc
    * within the horizon, the streaming analog of the batch groupBy-on-md5.
    * Decontamination joins the same way the gate blacklists do
    * (stream-static broadcast anti-join) and is left to that composition.
    */
  case class FrontierState(admittedDoc: Long)
  case class FrontierAdmit(canonUrl: String, docId: Long)

  /** Streaming URL frontier — the crawl-side admission gate and the
    * streaming face of batch `dedup_url`: each arriving document's
    * canonical URL hits first-seen keyed state (the HSETNX-gate shape
    * every id leg uses), the first arrival per canonical is admitted with
    * its doc id and every later alias — same batch or any later batch —
    * drops silently. Canonicalization is the SAME `Dedup.canonicalUrl` /
    * `syntheticUrl` expressions as batch, so the two sides cannot drift.
    *
    * State is one long per admitted canonical URL. A production frontier
    * bounds it with a state timeout / TTL matching its recrawl policy;
    * NoTimeout here keeps the spec's batch-equality exact.
    */
  def urlFrontierStream(docs: DataFrame): Dataset[FrontierAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        graft.operators.Dedup.canonicalUrl(graft.operators.Dedup.syntheticUrl)
          .as("canon_url"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[FrontierState, FrontierAdmit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (canon, rows, state: GroupState[FrontierState]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.map(_._1).min
            state.update(FrontierState(first))
            Iterator(FrontierAdmit(canon, first))
          }
      }
  }

  case class MinhashCandRow(docId: Long, sig: Seq[Long], pid: Long,
      pSig: Seq[Long], fromIndex: Boolean)
  case class MinhashBandState(seen: List[(Long, Seq[Long])])
  case class MinhashSeen(seen: Boolean)
  case class MinhashAdmit(docId: Long, sigId: String, nIndexCandidates: Long,
      nPriorCandidates: Long, maxEst: Double, isDup: Boolean)

  /** The near-dup admission gate LIVE — the streaming face of
    * `dedup_minhash_inc`, the one production face the §2.9 set was still
    * missing: each arriving document computes its k-minhash signature
    * IN-ROW (`Dedup.minhashShingleHashes` + `minhashSigArray` — the same
    * permutations as the stored index, spec-pinned equal), probes the
    * STORED band index as a stream-static join, probes EARLIER delta
    * arrivals through per-band-key keyed state (the admitted-so-far side
    * of the index, exactly what the batch operator calls prior
    * candidates), and verifies every band collision with the full
    * est-Jaccard before a drop verdict — a band hash collision alone can
    * never delete a non-duplicate.
    *
    * Shape: signature + banding are zero-shuffle row work; the index probe
    * is a stream-static equi-join on (band, band_key); stage-2 folds each
    * doc's candidates to one verdict row.
    *
    * State-size contract (stated honestly): stage 1 stores EVERY arriving
    * doc's full k-long signature under each of its `minhashBands` band
    * keys — the keyed state is ~bands × the DELTA corpus signatures, not
    * "band occupancy" — and stage 2 keeps one tombstone per delta doc
    * (the at-least-once redelivery guard). That is fine for the intended
    * deployment unit (one daily delta per stream, then the admitted
    * signatures fold into the stored index and the stream restarts
    * against the refreshed index — `dedup_minhash_inc`'s batch fold), but
    * a gate left running across many deltas would grow state without
    * bound. For that long-lived shape, set
    * `spark.graft.frontierStateTtlMs`: both stages then take a
    * processing-time timeout and expire entries idle past the TTL — the
    * production contract being "anything older than the TTL has already
    * been folded into the stored index the stream-static probe reads".
    * Like `packStream`, a doc_id-ordered feed reproduces the batch
    * incremental verdicts bit for bit (the spec proves it across
    * micro-batches); an unordered feed still gates correctly in arrival
    * order — the same contract as the batch operator under a different
    * delta order.
    */
  /** Session conf key: keyed-state TTL (ms) for the frontier gates; unset
    * = NoTimeout (the one-delta-per-stream deployment unit).
    */
  val FrontierTtlKey = "spark.graft.frontierStateTtlMs"

  def minhashFrontierStream(docs: DataFrame, index: DataFrame): Dataset[MinhashAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.Dedup
    val k = Dedup.minhashK
    val ttlMs: Option[Long] =
      spark.conf.getOption(FrontierTtlKey).map(_.trim).filter(_.nonEmpty).map { s =>
        try s.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$FrontierTtlKey must be a millisecond count, got '$s'")
        }
      }
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val sigd = docs
      .withColumn("w", Dedup.wordsCol)
      .filter(size(col("w")) >= 3)
      .withColumn("h0s", Dedup.minhashShingleHashes)
      .select(col("doc_id"), Dedup.minhashSigArray.as("sig"))
    val withBands = sigd
      .select(col("doc_id"), col("sig"),
        posexplode(Dedup.bandKeysOfSig).as(Seq("band", "band_key")))

    // the stored index's band axis (static side of the probe join) —
    // persisted: a stream-static join re-evaluates the static plan every
    // micro-batch, and without the cache each trigger would re-scan the
    // index and recompute 4 md5 band keys per signature. The cache lives
    // for the stream's (= session's) lifetime by design — construct this
    // stream ONCE per query; a short-lived caller releases it with
    // clearCache()/unpersist after stopping the query
    val idxBands = index.select(
      col("doc_id").as("pid"),
      array((0 until k).map(j => col(s"mh$j")): _*).as("p_sig"),
      posexplode(array(Dedup.bandKeys: _*)).as(Seq("band", "band_key")))
      .persist()

    val idxCand = withBands
      .join(idxBands, Seq("band", "band_key"))
      .select(col("doc_id").as("docId"), col("sig"), col("pid"),
        col("p_sig").as("pSig"), lit(true).as("fromIndex"))
      .as[MinhashCandRow]

    // earlier-delta candidates: per-band-key keyed state carrying the
    // signatures seen with that band key; in-batch rows process in
    // doc_id order, so an ordered feed reproduces the batch pid < doc_id
    // rule and an unordered feed still gates in arrival order
    val priorCand = withBands
      .select(col("doc_id"), col("sig"), col("band"), col("band_key"))
      .as[(Long, Seq[Long], Int, String)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[MinhashBandState, MinhashCandRow](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[MinhashBandState]) =>
          if (state.hasTimedOut) {
            // TTL compaction: these signatures are past the fold horizon —
            // the stored index the stream-static probe reads now carries them
            state.remove(); Iterator.empty
          } else {
          val ordered = rows.toSeq.sortBy(_._1)
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[MinhashCandRow]()
          ordered.foreach { r =>
            // EVERY stored signature is a prior — priority is ARRIVAL
            // order (the HSETNX discipline), not doc_id order, so a
            // late-arriving smaller id still sees the earlier arrival
            // as its prior and the pair can never slip through unflagged.
            // pid != docId: an at-least-once re-delivery of the SAME doc
            // must not pair the doc with itself (est 1.0 would reject a
            // globally-unique document outright)
            seen.foreach { case (pid, psig) =>
              if (pid != r._1)
                out += MinhashCandRow(r._1, r._2, pid, psig, fromIndex = false)
            }
            seen = (r._1, r._2) :: seen
          }
          state.update(MinhashBandState(seen))
          ttlMs.foreach(state.setTimeoutDuration)
          out.iterator
          }
      }

    // self rows carry every delta doc (and its signature) into the verdict
    // stage, so zero-candidate docs still emit their admission row
    val self = sigd
      .select(col("doc_id").as("docId"), col("sig"), lit(-1L).as("pid"),
        expr("CAST(array() AS ARRAY<BIGINT>)").as("pSig"),
        lit(false).as("fromIndex"))
      .as[MinhashCandRow]

    idxCand.union(priorCand).union(self)
      .groupByKey(_.docId)
      .flatMapGroupsWithState[MinhashSeen, MinhashAdmit](
        OutputMode.Append, timeoutConf) {
        case (docId, rows, state: GroupState[MinhashSeen]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(MinhashSeen(true))
            ttlMs.foreach(state.setTimeoutDuration)
            val rs = rows.toSeq
            val sig = rs.find(_.pid == -1L).map(_.sig).getOrElse(rs.head.sig)
            // a pair can collide in several bands — distinct partners only
            val partners = rs.filter(_.pid >= 0L).groupBy(_.pid).map(_._2.head)
            def est(p: MinhashCandRow): Double =
              (0 until k).count(j => sig(j) == p.pSig(j)).toDouble / k
            val maxEst = if (partners.isEmpty) 0.0 else partners.map(est).max
            val sigId = {
              val d = java.security.MessageDigest.getInstance("MD5")
                .digest(sig.mkString(":").getBytes("UTF-8"))
              d.map("%02x".format(_)).mkString
            }
            Iterator(MinhashAdmit(docId, sigId,
              partners.count(_.fromIndex).toLong,
              partners.count(!_.fromIndex).toLong,
              math.floor(maxEst * 10000) / 10000,
              maxEst >= Dedup.minhashVerifyTau))
          }
      }
  }

  case class AdcServe(queryId: Long, neighborId: Long, rank: Int, adcDist: Double)
  case class AdcServeSeen(seen: Boolean)

  /** Online ANN serving — the LIVE face of the persisted vector index
    * (the last production shape of the index lifecycle: build → persist
    * → batch search → SERVE): each arriving query vector routes to its
    * `ivfPqProbes` nearest coarse lists PER-ROW (centroids and the PQ
    * codebook ship as LITERALS — the nightly-model move dsirGateStream
    * and the Bloom decontaminator make), probes the STORED code table as
    * a stream-static join on the list key (partition pruning at the
    * storage layer bounds the scan to probes/lists), computes the full
    * ADC distance in ONE row expression per candidate (8 lookups into
    * the codebook literal, same fold order as the batch scan), and folds
    * each query's candidates to its top-k in a keyed verdict stage.
    * The spec pins EXACT equality with batch `sim_ann_ivfpq`.
    *
    * `storedCodes` is caller-owned: persist it before constructing the
    * stream (a stream-static join re-evaluates the static plan every
    * micro-batch — the idxBands lesson), and unpersist on query stop.
    */
  def adcServeStream(queries: DataFrame, storedCodes: DataFrame,
      cents: Seq[Seq[Double]], book: Seq[Seq[Double]]): Dataset[AdcServe] = {
    import graft.operators.Sim
    val spark = queries.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val (m, sd) = (Sim.pqM, Sim.pqSubDim)
    val probed = queries
      .withColumn("cents", typedLit(cents))
      // per-row probe ranking: (-cosine, list) ascending = cosine desc
      // with ties to the lower list id — the batch queryProbes rule
      .withColumn("probes", expr(
        s"""transform(slice(array_sort(transform(
              sequence(0, ${Sim.nCentroids - 1}),
              k -> struct(-graft_cosine(v, cents[k]) AS nc, k AS k))),
            1, ${Sim.ivfPqProbes}), s -> s.k)"""))
      .select(col("query_id"), col("v"), explode(col("probes")).as("cluster"))
    val adc = (0 until m).map { j =>
      val off = j * sd
      expr(s"""aggregate(sequence(0, ${sd - 1}), cast(0.0 as double),
           (a, i) -> a + (v[$off+i] - book[code$j][$off+i])
                       * (v[$off+i] - book[code$j][$off+i]))""")
    }.reduce(_ + _)
    probed
      .join(storedCodes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("book", typedLit(book))
      .select(col("query_id"), col("vec_id"), adc.as("adc"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AdcServeSeen, AdcServe](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (q, rows, state: GroupState[AdcServeSeen]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(AdcServeSeen(true))
            rows.toSeq.sortBy(r => (r._3, r._2)).take(Sim.topK).zipWithIndex
              .map { case ((_, vid, d), i) =>
                AdcServe(q, vid, i + 1, math.floor(d * 10000) / 10000)
              }.iterator
          }
      }
  }

  /** Live vector-index INGESTION — the streaming face of the index build
    * (`sink_vector_index`) and its daily upsert: each arriving vector
    * encodes IN-ROW against the nightly model shipped as literals
    * (coarse centroids + PQ codebook — the adcServeStream move) and the
    * caller appends the (vec_id, code*, cluster) rows into the
    * partitioned layout with a parquet stream sink
    * (`.partitionBy("cluster")`, append mode) — new files inside each
    * touched inverted list, never a rewrite, exactly the upsert's cheap
    * path but continuous. Encoding replays the batch rules bit-for-bit:
    * cluster = max cosine with ties to the lower centroid id
    * (`assignToCentroids`), per-subspace code = lexicographic
    * (distance, code) minimum over the SAME left-to-right L2 fold as
    * `pqAssignCodes` — the spec pins row-set equality with the batch
    * stored index. Micro-batch file sizing is the trigger's job;
    * the weekly `sink_vector_index_compact` re-levels whatever file
    * fragmentation continuous ingestion leaves behind — closing the
    * lifecycle loop: INGEST live → compact weekly → serve live.
    */
  def indexIngestStream(vectors: DataFrame,
      cents: Seq[Seq[Double]], book: Seq[Seq[Double]]): DataFrame = {
    import graft.operators.Sim
    graft.functions.VectorExpressions.register(vectors.sparkSession)
    val (m, sd) = (Sim.pqM, Sim.pqSubDim)
    val withModel = vectors
      .withColumn("cents", typedLit(cents))
      .withColumn("book", typedLit(book))
      .withColumn("cluster", expr(
        s"""array_sort(transform(sequence(0, ${Sim.nCentroids - 1}),
              k -> struct(-graft_cosine(v, cents[k]) AS nc, k AS k)))[0].k"""))
    val coded = (0 until m).foldLeft(withModel) { case (df, j) =>
      val off = j * sd
      df.withColumn(s"code$j", expr(
        s"""array_sort(transform(sequence(0, ${Sim.pqK - 1}),
              c -> struct(aggregate(sequence(0, ${sd - 1}), cast(0.0 as double),
                (a, i) -> a + (v[$off+i]-book[c][$off+i])
                            * (v[$off+i]-book[c][$off+i])) AS d,
                c AS c)))[0].c"""))
    }
    coded.select(col("vec_id") +:
      (0 until m).map(j => col(s"code$j").cast("long").as(s"code$j")) :+
      col("cluster").cast("long").as("cluster"): _*)
  }

  /** Live lexical-index INGESTION — the `indexIngestStream` twin on the
    * text axis, matching the daily upsert's delta contract
    * (`sink_text_index_upsert`): each arriving document tokenizes IN-ROW
    * (the shared `Dedup.wordsCol` — ingestion can never drift from the
    * batch tokenizer), folds to its per-term tf WITHOUT any stateful
    * aggregation (distinct terms + an in-row occurrence count over the
    * words array — zero shuffle, append-mode safe), and emits postings
    * rows (doc_id, dl, term, tf, df = NULL, bucket) for the caller to
    * append `.partitionBy("bucket")` into the persisted layout — new
    * files inside each touched term-hash directory, never a rewrite.
    * df is NULL by the upsert's design: a new document invalidates the
    * BASE rows' stored df corpus-wide (the `textIndexCompact` asymmetry),
    * so no per-row number could be correct — readers between rewrites
    * serve through the fresh-df face (`text_bm25_stored_fresh`), and the
    * weekly compaction restores stored df. The spec pins row-set and
    * partition-layout equality with the batch upsert's delta portion —
    * closing the lexical lifecycle loop: INGEST live → serve fresh →
    * compact weekly.
    */
  def textIngestStream(docs: DataFrame): DataFrame = {
    import graft.operators.{Dedup, TrainData}
    docs
      .withColumn("w", Dedup.wordsCol)
      // dl stays INT (size()'s type) — the batch postings' parquet schema,
      // so streamed files append cleanly into the stored layout
      .withColumn("dl", size(col("w")))
      .select(col("doc_id"), col("dl"),
        explode(array_distinct(col("w"))).as("term"), col("w"))
      // in-row tf is O(distinct terms × dl) per doc — the price of
      // avoiding a stateful streaming aggregate; fine at real document
      // lengths, and bulk backfill takes the batch upsert path anyway
      .withColumn("tf",
        expr("size(filter(w, x -> x = term))").cast("long"))
      .withColumn("df", lit(null).cast("long"))
      .withColumn("bucket",
        pmod(Dedup.portableHash(col("term")),
          lit(TrainData.textIndexBuckets)))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"),
        col("df"), col("bucket"))
  }

  /** The vector-index data columns as stored (partition col `cluster`
    * rides the directory layout).
    */
  private def vectorIndexDataSchema: String =
    ("vec_id LONG" +: (0 until graft.operators.Sim.pqM).map(j => s"code$j LONG"))
      .mkString(", ")

  /** The lexical postings data columns as stored (partition col `bucket`
    * rides the directory layout). dl is INT — size()'s type, the batch
    * postings' parquet schema.
    */
  private def textIndexDataSchema: String =
    "doc_id LONG, dl INT, term STRING, tf LONG, df LONG"

  /** Live vector-index ingestion WITH the small-file loop closed — the
    * sink face of `indexIngestStream`: each micro-batch lands under a
    * batch-keyed subdirectory of the LIVE tier
    * (`<dir>/ingest/batch=B/cluster=N/`, overwrite-own-subdir — the
    * at-least-once idiom), and once more than `consolidateAfter` batch
    * subdirs accumulate they fold into the COMPACT tier
    * (`<dir>/compact/cluster=N/` — the batch stored index's exact
    * partition layout), so the file count per inverted list stays
    * BOUNDED across unbounded triggers instead of growing one file per
    * touched list per trigger forever. Readers go through
    * `storedVectorIngestRows` (compact ∪ ingest, distinct — code rows
    * are deterministic functions of vec_id under the shipped model, so
    * duplicates from a re-delivered batch collapse exactly).
    */
  def indexIngestMaintainSink(vectors: DataFrame, cents: Seq[Seq[Double]],
      book: Seq[Seq[Double]], dir: String, checkpointDir: String,
      consolidateAfter: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    ingestMaintainSink(indexIngestStream(vectors, cents, book), dir,
      checkpointDir, "cluster", vectorIndexDataSchema, consolidateAfter)

  /** Live lexical-index ingestion WITH the small-file loop closed — the
    * `indexIngestMaintainSink` twin on the text axis: micro-batches of
    * `textIngestStream` postings land batch-keyed, consolidation folds
    * them into `<dir>/compact/bucket=N/` (the stored lexical index's
    * partition layout; df stays the upsert contract's honest NULL — the
    * weekly `sink_text_index_compact` rewrite restores stored df).
    * Posting rows are deterministic per document, so the reader's
    * distinct() collapses re-delivery duplicates exactly.
    */
  def textIngestMaintainSink(docs: DataFrame, dir: String,
      checkpointDir: String, consolidateAfter: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestMaintainSink(textIngestStream(docs), dir, checkpointDir,
      "bucket", textIndexDataSchema, consolidateAfter)

  /** Current row set of a maintained ingest directory (vector axis). */
  def storedVectorIngestRows(spark: SparkSession, dir: String): DataFrame =
    storedIndexRows(spark, dir, "cluster", vectorIndexDataSchema)

  /** Current row set of a maintained ingest directory (text axis). */
  def storedTextIngestRows(spark: SparkSession, dir: String): DataFrame =
    storedIndexRows(spark, dir, "bucket", textIndexDataSchema)

  /** Marker gating the consolidation swap: written explicitly AFTER the
    * `compact_next` write action returns, so completeness never depends
    * on the output committer's `_SUCCESS` (which
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` disables —
    * a recovery keyed on `_SUCCESS` alone would then mistake every
    * complete fold for a partial one and DELETE it).
    */
  private val swapReadyMarker = "_GRAFT_SWAP_READY"

  private def listBatchSubdirs(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Array[org.apache.hadoop.fs.FileStatus] =
    try fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    catch { case _: java.io.FileNotFoundException =>
      Array.empty[org.apache.hadoop.fs.FileStatus] }

  /** The shared consolidating sink: append batch-keyed, fold past the
    * threshold. The consolidation rewrite avoids needing a transactional
    * table format via a marker-gated swap directory:
    *
    *   1. recover any interrupted swap (a COMPLETE `compact_next` — its
    *      `swapReadyMarker` exists — always supersedes `compact` by
    *      construction; a partial one is deleted),
    *   2. write the (compact ∪ ingest) union to `compact_next` (one
    *      shuffle on the partition key ⇒ ~one file per partition), then
    *      drop the marker in — no materialization needed: the write
    *      target is disjoint from the source files and every deletion
    *      below runs strictly after the write action returns,
    *   3. drop the folded ingest batch subdirs,
    *   4. swap: delete `compact`, rename `compact_next` → `compact`.
    *
    * Scope: crash-safe on stores with ATOMIC directory rename (local,
    * HDFS) — a crash between any two steps leaves every row reachable
    * to `storedIndexRows` (which prefers a complete `compact_next`),
    * and the next trigger's step 1 finishes the swap. On object stores
    * (s3a: rename = per-object copy+delete) a crash INSIDE step 4 can
    * split files across the two directories — there, production fronts
    * the layout with a committer/table format; a failed rename/delete
    * is surfaced, not ignored. All listing, deletion and rename go
    * through the Hadoop FileSystem resolved from the path.
    */
  private def ingestMaintainSink(rows: DataFrame, dir: String,
      checkpointDir: String, partCol: String, dataSchema: String,
      consolidateAfter: Int): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        import org.apache.hadoop.fs.Path
        val spark = batch.sparkSession
        val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
        def swapIn(): Unit = {
          if (!fs.delete(new Path(s"$dir/compact"), true) &&
              fs.exists(new Path(s"$dir/compact")))
            sys.error(s"could not delete $dir/compact for the swap")
          if (!fs.rename(new Path(s"$dir/compact_next"),
              new Path(s"$dir/compact")))
            sys.error(s"rename $dir/compact_next -> $dir/compact failed")
          fs.delete(new Path(s"$dir/compact/$swapReadyMarker"), false)
          ()
        }
        // step 1: finish (or clear) any interrupted swap from a crash
        if (fs.exists(new Path(s"$dir/compact_next"))) {
          if (fs.exists(new Path(s"$dir/compact_next/$swapReadyMarker")))
            swapIn()
          else fs.delete(new Path(s"$dir/compact_next"), true)
        }
        batch.write.mode("overwrite").partitionBy(partCol)
          .parquet(s"$dir/ingest/batch=$bid")
        val subs = listBatchSubdirs(fs, s"$dir/ingest")
        if (subs.length > consolidateAfter) {
          storedIndexRows(spark, dir, partCol, dataSchema)
            .repartition(col(partCol))
            .write.mode("overwrite").partitionBy(partCol)
            .parquet(s"$dir/compact_next")
          if (!fs.createNewFile(new Path(s"$dir/compact_next/$swapReadyMarker")))
            sys.error(s"could not mark $dir/compact_next complete")
          subs.foreach(s => fs.delete(s.getPath, true))
          swapIn()
        }
        ()
      }
      .start()

  /** Union of a maintained ingest directory's tiers, duplicate-free:
    * the compact tier (or a complete mid-swap `compact_next` — its
    * `swapReadyMarker` present — which supersedes it) plus every live
    * batch subdir. Explicit schemas throughout — a tree of empty
    * batches has nothing to infer from — and a partition-key filter
    * prunes to `<tier>/<partCol>=k/` directories on both tiers.
    *
    * Concurrency scope: the tier choice binds at CONSTRUCTION and the
    * scan runs when the caller's action does — a fold/recovery swap
    * racing an in-flight read can delete the bound directory under it
    * (the ArtifactCache rebuild-vs-read posture). Same-JVM sequential
    * execution (read between triggers, or inside the foreachBatch) is
    * the supported scope; a deployment serving DURING folds puts the
    * compact tier behind a snapshot/table format.
    */
  private def storedIndexRows(spark: SparkSession, dir: String,
      partCol: String, dataSchema: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val schema = s"$dataSchema, $partCol LONG"
    val compactPath =
      if (fs.exists(new Path(s"$dir/compact_next/$swapReadyMarker")))
        Some(s"$dir/compact_next")
      else if (fs.exists(new Path(s"$dir/compact"))) Some(s"$dir/compact")
      else None
    val tiers =
      compactPath.map(p => spark.read.schema(schema).parquet(p)).toSeq ++
        (if (fs.exists(new Path(s"$dir/ingest")))
          Seq(spark.read.schema(s"$schema, batch LONG")
            .parquet(s"$dir/ingest").drop("batch"))
        else Nil)
    require(tiers.nonEmpty, s"no stored index tiers under $dir")
    tiers.reduce(_.unionByName(_)).distinct()
  }

  case class Bm25Serve(queryId: Long, docId: Long, rank: Int,
      nTerms: Long, scoreQ6: Long)
  case class Bm25Seen(seen: Boolean)

  /** Online BM25 retrieval — the LIVE face of the lexical index, the
    * adcServeStream shape applied to text ("which training docs does
    * this just-arrived eval doc most resemble?" served as the doc
    * lands): each arriving query document tokenizes IN-ROW (the shared
    * `Dedup.wordsCol` definition — serving can never drift from the
    * batch tokenizer), its distinct terms probe the PERSISTED postings
    * index as a stream-static join on the term key (work bounded by the
    * matched posting lists, exactly the batch semi-join bound), each
    * candidate row scores through the SHARED `TrainData.bm25*` columns
    * (one expression tree ⇒ the integer micro-unit contributions are
    * bit-equal to batch), and a keyed verdict stage folds each query's
    * candidates to its top-k — integer sums, so the fold order cannot
    * matter. Corpus scalars (n_docs, sum_dl) ship as literals — the
    * nightly-model move. First arrival wins; a re-delivered query id is
    * ignored (at-least-once safety, the AdcServe discipline).
    *
    * `postings` is caller-owned (doc_id, dl, term, tf, df — build with
    * `TrainData.bm25PostingsWithDf`): persist it before constructing the
    * stream (a stream-static join re-evaluates the static plan every
    * micro-batch) and unpersist on query stop.
    */
  def bm25ServeStream(queries: DataFrame, postings: DataFrame,
      nDocs: Long, sumDl: Long): Dataset[Bm25Serve] = {
    import graft.operators.TrainData
    val spark = queries.sparkSession
    import spark.implicits._
    val qt = queries.select(col("doc_id").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.wordsCol)).as("term"))
    qt.join(postings, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("sum_dl", lit(sumDl))
      .withColumn("idf", TrainData.bm25Idf)
      .withColumn("dl_ratio", TrainData.bm25DlRatio)
      .withColumn("tfn", TrainData.bm25Tfn)
      .withColumn("c_q6", TrainData.bm25ContribQ6)
      .select(col("query_id"), col("doc_id"), col("c_q6"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Bm25Seen, Bm25Serve](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (q, rows, state: GroupState[Bm25Seen]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(Bm25Seen(true))
            val byDoc = rows.toSeq.groupBy(_._2).map { case (d, rs) =>
              (d, rs.map(_._3).sum, rs.size.toLong)
            }.toSeq
            byDoc.sortBy { case (d, s, _) => (-s, d) }
              .take(TrainData.bm25TopK).zipWithIndex
              .map { case ((d, s, n), i) => Bm25Serve(q, d, i + 1, n, s) }
              .iterator
          }
      }
  }

  case class HybridServe(queryId: Long, docId: Long, rank: Int,
      lexRank: Option[Long], vecRank: Option[Long], rrfQ6: Long)
  case class HybridSeen(seen: Boolean)

  /** Online HYBRID retrieval — the live face of the STORED hybrid
    * (`retrieval_hybrid_rrf_stored`), the serving story closed at scale:
    * an arriving query document (text + embedding) probes BOTH persisted
    * indexes — its distinct in-row terms hit the lexical postings index
    * (the bm25ServeStream path, shared `TrainData.bm25*` expression
    * columns), and its vector routes to its `ivfPqProbes` nearest coarse
    * lists PER-ROW (centroids + PQ codebook as LITERALS — the
    * adcServeStream nightly-model move) and ADC-scores ONLY those lists'
    * stored 4-byte codes — then ONE keyed verdict stage ranks each leg
    * to `rrfDepth`, fuses with the all-integer reciprocal-rank sum
    * (1e6 div (k + rank) — no float in the fusion, so the in-group fold
    * order cannot matter), and emits the fused top-k. This is the 100 TB
    * shape the round-8 Scaladoc promised: raw floats never enter the
    * serve path — the vector leg scans probes/lists of the code table,
    * exactly the batch `ivfPqRankedFromStored` contract (the spec pins
    * exact equality with `TrainData.hybridRrfStored`). Both legs'
    * candidates for a query arrive in the same micro-batch (each is a
    * stream-static join off the same input row), so the group sees the
    * complete candidate set atomically. First arrival wins; re-delivered
    * query ids are ignored (the AdcServe at-least-once discipline).
    *
    * `postings` (doc_id, dl, term, tf, df) and `storedCodes` (vec_id,
    * code0..m-1, cluster — `sink_vector_index`'s layout read back) are
    * caller-owned: persist before constructing the stream, unpersist on
    * stop (a stream-static join re-evaluates the static plan every
    * micro-batch).
    */
  def hybridServeStream(queries: DataFrame, postings: DataFrame,
      storedCodes: DataFrame, cents: Seq[Seq[Double]], book: Seq[Seq[Double]],
      nDocs: Long, sumDl: Long): Dataset[HybridServe] = {
    import graft.operators.{Sim, TrainData}
    val spark = queries.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val lex = queries.select(col("doc_id").as("query_id"),
        explode(array_distinct(graft.operators.Dedup.wordsCol)).as("term"))
      .join(postings, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("sum_dl", lit(sumDl))
      .withColumn("idf", TrainData.bm25Idf)
      .withColumn("dl_ratio", TrainData.bm25DlRatio)
      .withColumn("tfn", TrainData.bm25Tfn)
      .withColumn("c_q6", TrainData.bm25ContribQ6)
      .select(col("query_id"), col("doc_id").as("cand_id"),
        lit("lex").as("leg"), col("c_q6"),
        lit(null).cast("double").as("adc"))
    // the vector leg IS the adcServeStream probe: per-row coarse routing
    // against the centroid literals, stream-static join on the stored
    // index's cluster key (partition pruning bounds the scan), ADC in one
    // row expression against the codebook literal — identical fold order
    // to the batch dist-table scan, so ranks are bit-equal
    val (m, sd) = (Sim.pqM, Sim.pqSubDim)
    val probed = queries
      .withColumn("cents", typedLit(cents))
      .withColumn("probes", expr(
        s"""transform(slice(array_sort(transform(
              sequence(0, ${Sim.nCentroids - 1}),
              k -> struct(-graft_cosine(v, cents[k]) AS nc, k AS k))),
            1, ${Sim.ivfPqProbes}), s -> s.k)"""))
      .select(col("doc_id").as("query_id"), col("v"),
        explode(col("probes")).as("cluster"))
    val adcExpr = (0 until m).map { j =>
      val off = j * sd
      expr(s"""aggregate(sequence(0, ${sd - 1}), cast(0.0 as double),
           (a, i) -> a + (v[$off+i] - book[code$j][$off+i])
                       * (v[$off+i] - book[code$j][$off+i]))""")
    }.reduce(_ + _)
    val vec = probed
      .join(storedCodes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("book", typedLit(book))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        lit("vec").as("leg"), lit(null).cast("long").as("c_q6"),
        adcExpr.as("adc"))
    lex.unionByName(vec)
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HybridSeen, HybridServe](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (q, rows, state: GroupState[HybridSeen]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(HybridSeen(true))
            val rs = rows.toSeq
            // per-leg ranking replays the batch contracts: lexical =
            // (integer score desc, doc asc), vector = the ADC rule
            // (distance asc, vec_id asc — adcRanked's window)
            val lexRanks = rs.filter(_._3 == "lex")
              .groupBy(_._2).map { case (d, g) => (d, g.flatMap(_._4).sum) }
              .toSeq.sortBy { case (d, s) => (-s, d) }
              .take(TrainData.rrfDepth).zipWithIndex
              .map { case ((d, _), i) => d -> (i + 1).toLong }.toMap
            val vecRanks = rs.filter(_._3 == "vec")
              .map(r => (r._2, r._5.get))
              .sortBy { case (d, c) => (c, d) }
              .take(TrainData.rrfDepth).zipWithIndex
              .map { case ((d, _), i) => d -> (i + 1).toLong }.toMap
            (lexRanks.keySet ++ vecRanks.keySet).toSeq.map { d =>
              val s =
                lexRanks.get(d).map(r => 1000000L / (TrainData.rrfK + r))
                  .getOrElse(0L) +
                vecRanks.get(d).map(r => 1000000L / (TrainData.rrfK + r))
                  .getOrElse(0L)
              (d, s)
            }.sortBy { case (d, s) => (-s, d) }
              .take(TrainData.rrfTopK).zipWithIndex
              .map { case ((d, s), i) =>
                HybridServe(q, d, i + 1, lexRanks.get(d), vecRanks.get(d), s)
              }.iterator
          }
      }
  }

  /** The dataset card LIVE (the streaming face of corpus_stats): running
    * per-(source, lang) document/token/char totals maintained as a
    * complete-mode aggregation — the card a data-ops dashboard reads
    * while a crawl is still landing. All stored state is the tiny group
    * table (integer sums only ⇒ exact equality with batch at any point);
    * the derived mean/short-frac columns compute from those integers, so
    * they too replay exactly.
    */
  def corpusStatsStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", graft.operators.Dedup.wordsCol)
      .select(col("source"), col("lang"),
        size(col("w")).cast("long").as("tok"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        sum(when(col("tok") < graft.operators.TextAnalysis.c4MinWords, 1L)
          .otherwise(0L)).as("n_short"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chars"),
        (floor(col("n_tokens") * lit(10000.0) / col("n_docs")) / 10000)
          .as("mean_tokens"),
        (floor(col("n_short") * lit(10000.0) / col("n_docs")) / 10000)
          .as("short_frac"))

  /** The domain-weighted mix gate LIVE: the weight dim is a static
    * broadcast (stream-static join) and the keep decision is the SAME
    * deterministic key mix as batch `mixDomains` — stateless, zero
    * shuffle, so the live mix admits exactly the documents the batch mix
    * would (the spec proves set equality). The way a live ingest applies
    * the training-mix config without an RNG (and therefore replayably).
    */
  def mixDomainsStream(docs: DataFrame): DataFrame = {
    import graft.operators.TrainData
    val spark = docs.sparkSession
    import spark.implicits._
    val wts = broadcast(TrainData.domainWeights.toDF("source", "weight"))
    docs
      .join(wts, Seq("source"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(TrainData.domainDefaultWeight)))
      .filter(TrainData.keyMix(col("doc_id")) < col("weight") * 1000000L)
      .select(col("doc_id"), col("source"), col("lang"), col("weight"))
  }

  /** The DSIR admission gate LIVE: last night's batch histograms collapse
    * into one 64-double log-ratio array (`dsirBucketLogRatios` — the same
    * one-literal move the Bloom decontaminator makes), and each arriving
    * document scores with a per-row fold over its own features — zero
    * shuffle, zero state, pure codegen'd map work, which is exactly what
    * an ingest-path quality gate must be. Feature space is the shared
    * `dsirFeatures` expression — zero drift from batch.
    */
  def dsirGateStream(docs: DataFrame, lr: Array[Double]): DataFrame = {
    import graft.operators.{Dedup, TrainData}
    val lrArr = array(lr.map(lit(_)): _*)
    docs
      .withColumn("w", Dedup.wordsCol)
      .filter(col("doc_id") % TrainData.dsirTargetMod =!= 0)
      .withColumn("f", TrainData.dsirFeatures)
      .withColumn("lrs", lrArr)
      .select(col("doc_id"), size(col("f")).cast("long").as("n_feats"),
        expr(s"""aggregate(f, cast(0.0 as double),
          (a, x) -> a + lrs[CAST(pmod(
            CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT),
            ${TrainData.dsirBuckets}) AS INT)])""").as("raw"))
      .select(col("doc_id"), col("n_feats"),
        (floor(col("raw") * 100) / 100).as("log_weight"))
      .withColumn("selected", col("log_weight") >= 0.0)
  }

  case class PackState(cum: Long)
  case class PackAssign(docId: Long, shard: Long, tok: Long, bin: Long)

  /** Sequence packing LIVE (the streaming face of #51 pack_sequences):
    * each shard's keyed state carries ONE long — the running token sum —
    * and every arriving document lands in the bin its first token falls
    * into, exactly the batch rule (`⌊cum_before / budget⌋`, integer
    * division — identical to the batch double-floor on non-negative
    * longs). This is how a trainer's data service fills context windows
    * from a live feed: per-shard sequential fill, shard count = the
    * parallelism knob, O(shards) state total.
    *
    * Within a micro-batch a shard's arrivals sort by doc_id, so a
    * doc_id-ordered feed reproduces the batch packing bit for bit (the
    * spec proves it across day-sliced files); an unordered feed still
    * packs correctly, just in arrival order — the same contract as the
    * batch operator under a different document order.
    */
  def packStream(docs: DataFrame): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.{Dedup, TrainData}
    docs
      .withColumn("w", Dedup.wordsCol)
      .select(col("doc_id"),
        (TrainData.keyMix(col("doc_id")) % TrainData.packShards).as("shard"),
        size(col("w")).cast("long").as("tok"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[PackState, PackAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, tok) =>
            val bin = cum / TrainData.packBudget
            cum += tok
            PackAssign(id, shard, tok, bin)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  case class PhashAdmit(dhash: Long, docId: Long)

  /** The image-ingest admission gate LIVE (the streaming face of
    * mm_phash_dedup's hash side): each incoming image decodes through the
    * SAME real P5 parse + dHash as batch (`Multimodal.dhash56` — zero
    * drift), and first-seen keyed state on the exact perceptual hash
    * admits one document per fingerprint; every later arrival with the
    * same hash — same batch or any later batch — drops. Near-dup pairs
    * (hamming > 0) remain batch work: keyed state can gate on equality,
    * not on distance, which is exactly how production ingest splits the
    * two (exact-hash gate inline, banded hamming sweep offline).
    *
    * State is one long per admitted fingerprint; a production gate bounds
    * it with a TTL matching its reingest policy.
    */
  def phashFrontierStream(docs: DataFrame): Dataset[PhashAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Multimodal.dhashFrame(docs)
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[FrontierState, PhashAdmit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (hash, rows, state: GroupState[FrontierState]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.map(_._1).min
            state.update(FrontierState(first))
            Iterator(PhashAdmit(hash, first))
          }
      }
  }

  def curationStream(docs: DataFrame): DataFrame = {
    import graft.operators.{TextAnalysis, TrainData}
    docs
      .withColumn("w", graft.operators.Dedup.wordsCol)
      .withColumn("quality", TextAnalysis.qualityCol)
      .filter(col("quality") >= TrainData.curationMinQuality && TextAnalysis.c4KeepCol)
      .withColumn("h", graft.operators.Dedup.normalizedMd5)
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("h"), size(col("w")).as("tok"), col("quality"))
  }

  /** The salted day-partitioned write every streaming sink leg shares
    * (identical discipline to batch #24: explicit partition count so AQE
    * can't coalesce the salt away, bounded files per writer).
    */
  private def writeSalted(batch: Dataset[org.apache.spark.sql.Row], outDir: String): Unit = {
    batch
      .withColumn("salt",
        pmod(xxhash64(col("event_id")), lit(Route.sinkWritersPerDay)))
      .repartition(batch.sparkSession.sessionState.conf.numShufflePartitions,
        col("day_id"), col("salt"))
      .drop("salt")
      .write.mode("append")
      .option("maxRecordsPerFile", Route.sinkMaxRecordsPerFile)
      .partitionBy("day_id").parquet(outDir)
    ()
  }

  /** Streaming sink leg — the streaming analog of #24 / the Doris sink
    * (VERDICT r1 item 10): `foreachBatch` writes each micro-batch through
    * the SAME salted day-repartition + bounded-file discipline as the
    * batch sink, so a heavy day inside one trigger still fans out over
    * Route.sinkWritersPerDay writer tasks. Returns the started query.
    */
  def sinkToParquet(events: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("day_id", date_format(col("ts"), "yyyyMMdd"))
      .select("event_id", "day_id", "event_type", "value")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        writeSalted(batch, outDir)
      }
      .start()

  /** Streaming GROUP-artifact maintenance — the LIVE face of
    * `dedup_groups_inc`, closing the group axis's lifecycle (build
    * nightly / fold daily / MAINTAIN live): VERIFIED near-dup pairs
    * arrive (in production, the minhash frontier's verified output —
    * candidate generation, the chain's dominant cost, already happened
    * upstream on the frontier), and each micro-batch folds them into the
    * persisted group artifact. Connected-component labels are GLOBAL —
    * one arriving pair can merge two components neither of whose other
    * members appears in this batch or under any one state key, so no
    * keyed-state formulation can maintain labels locally (state for key
    * A cannot read key B's) — the fold therefore runs per TRIGGER
    * through the stored artifact, exactly the daily fold at micro-batch
    * granularity: the batch's pairs land under a batch-keyed
    * subdirectory (a re-delivered batch OVERWRITES its own files —
    * at-least-once safe, the foreachBatch idempotency idiom), and the
    * group table re-labels from the DISTINCT union pair set via the same
    * conf-selected CC engines as every batch face. Returns the started
    * query; the caller owns checkpointing and stop.
    *
    * Upgrade note: this face now projects the caller's pairs to
    * (kind, da, db) and casts to LONG on write. A state directory written
    * by the pre-tombstone signature from an int-typed pair stream holds
    * INT32 `batch=N` parquet the explicit `da LONG, db LONG` read schema
    * will reject — rewrite (or read with mergeSchema + cast once and
    * consolidate into `batch=base`) such directories before resuming an
    * old checkpoint on this code.
    */
  def dupGroupsMaintainStream(pairs: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    dupGroupsMaintainWithTombstones(
      pairs.select(lit("pair").as("kind"), col("da"), col("db")),
      dir, checkpointDir)

  /** The FULL live face of the group artifact: pair arrivals AND
    * tombstones (document retirements — deletion requests, domain bans)
    * on one update stream, closing the last asymmetry between the group
    * axis's batch and live maintenance: the batch side retires via
    * `sink_dedup_groups_compact`, and a retiring doc must drop its pairs
    * AND re-label, because it can be the BRIDGE of its component (A~X~B
    * with A!~B — a row delete without re-running connected components
    * would leave A and B labeled as one group that no longer exists).
    * The per-trigger fold-through-storage design already supports this:
    * labels are re-derived from the stored union pair set every trigger,
    * so retirement is just one more restriction of that set.
    *
    * `updates` rows are (kind, da, db): kind="pair" carries a verified
    * near-dup pair, kind="retire" carries the retiring doc_id in `da`.
    * Each batch's rows land under batch-keyed subdirectories (overwrite-
    * own-subdir — re-delivered batches stay idempotent, the at-least-once
    * contract), and the group table re-labels from (distinct stored
    * pairs) minus (pairs touching ANY cumulative tombstone) — so a pair
    * re-arriving AFTER its endpoint retired stays dead (retirement is
    * monotone), and the state after a retirement batch equals
    * `dupGroupsCompact` on the same corpus (spec-pinned).
    *
    * Scale shape per trigger: two bounded batch writes, one scan of the
    * stored pair list (never the corpus text), two anti-joins against the
    * (tiny) tombstone set, the CC re-label over the live pair set. The
    * batch-subdirectory count is BOUNDED: once more than
    * `consolidateAfter` subdirectories accumulate, the (already
    * materialized) distinct union is rewritten into one `batch=base`
    * subdirectory and the per-batch subdirs are dropped — safe under
    * re-delivery because pair and tombstone sets are SETS (a re-delivered
    * batch re-creating its deleted subdir just re-adds rows the base
    * already holds; `distinct()` makes the union idempotent).
    */
  def dupGroupsMaintainWithTombstones(updates: DataFrame, dir: String,
      checkpointDir: String, consolidateAfter: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // cast on WRITE so the stored layout is always INT64 regardless
        // of the caller's integer type — the fold below reads with an
        // explicit LONG schema, and an int32-typed pair stream would
        // otherwise persist INT32 files that schema can't read
        batch.filter(col("kind") === "pair")
          .select(col("da").cast("long").as("da"),
            col("db").cast("long").as("db"))
          .write.mode("overwrite").parquet(s"$dir/pairs/batch=$batchId")
        batch.filter(col("kind") === "retire")
          .select(col("da").cast("long").as("doc"))
          .write.mode("overwrite").parquet(s"$dir/tombstones/batch=$batchId")
        // explicit read schemas: a batch with no rows of one kind writes
        // only a _SUCCESS marker in its subdirectory, and schema
        // INFERENCE over a tree of empty batches would fail (a pair-only
        // stream never writes a tombstone row)
        val rawPairs = graft.engine.Reliability.planCheckpoint(
          spark.read.schema("da LONG, db LONG").parquet(s"$dir/pairs")
            .select(col("da"), col("db")).distinct())
        val rawTomb = graft.engine.Reliability.planCheckpoint(
          spark.read.schema("doc LONG").parquet(s"$dir/tombstones")
            .select(col("doc")).distinct())
        val live = rawPairs
          .join(rawTomb.withColumnRenamed("doc", "da"), Seq("da"), "left_anti")
          .join(rawTomb.withColumnRenamed("doc", "db"), Seq("db"), "left_anti")
          .select(col("da"), col("db"))
        graft.operators.Dedup.groupsFromPairs(spark, live)
          .repartition(spark.sessionState.conf.numShufflePartitions,
            col("doc_id"))
          .write.mode("overwrite").parquet(s"$dir/groups")
        // bound the subdirectory count: fold accumulated batch subdirs
        // into one base subdir (rawPairs/rawTomb are MATERIALIZED above —
        // planCheckpoint — so rewriting their source files is safe).
        // Listing/deletion go through the Hadoop FileSystem resolved from
        // the path — the data writes do, and a java.io.File walk would
        // silently never run on hdfs://, s3a:// or even a file: URI,
        // quietly reverting to unbounded per-trigger growth
        def consolidate(root: String, df: DataFrame): Unit =
          consolidateBatchSubdirs(spark, root, df, consolidateAfter)
        consolidate(s"$dir/pairs", rawPairs)
        consolidate(s"$dir/tombstones", rawTomb)
        ()
      }
      .start()

  /** Fold past-threshold `batch=N` subdirectories under `root` into one
    * `batch=base` subdir holding `df` (which the caller MUST have
    * materialized — the rewrite deletes the frame's source files), then
    * drop the per-batch subdirs. Set-idempotent under at-least-once
    * re-delivery: a re-delivered batch re-creating its deleted subdir
    * re-adds rows the base already holds, and every reader goes through
    * `distinct()` / set semantics. All listing and deletion runs through
    * the Hadoop FileSystem resolved from the path, so the bound holds on
    * any store the stream can write to (local, hdfs://, s3a://).
    */
  private[graft] def consolidateBatchSubdirs(spark: SparkSession, root: String,
      df: DataFrame, consolidateAfter: Int): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val subs = listBatchSubdirs(fs, root)
    if (subs.length > consolidateAfter) {
      df.write.mode("overwrite").parquet(s"$root/batch=base")
      subs.filter(_.getPath.getName != "batch=base")
        .foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** Streaming AllJob — the reference's full chain (AllJob.java:49-56,
    * GateJob→IdJob→DwJob with in-memory handoff) as ONE streaming query:
    * the stateless gate leg (resolver verdict + blacklist anti-joins) runs
    * on the live stream; inside `foreachBatch`, the surviving micro-batch
    * flows through the SAME batch Id+Dw plan (`Pipeline.eventAttr` —
    * shared implementation, zero drift) and lands through the salted
    * day-partitioned sink.
    *
    * Identity scope note: each micro-batch resolves ids over the events
    * it contains (plus whatever upstream already assigned) — the
    * cross-batch id contract is `Identity.incrementalAssign`'s
    * keep-existing/continue-above-max discipline against the id store;
    * with a single trigger the output equals batch `pipeline_all_job`
    * row-for-row (spec-matched).
    */
  def allJobStream(events: DataFrame, sfDir: String, outDir: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val eventCols = rawSchema.fieldNames.toSeq
    gateStream(events)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val passed = batch.select(eventCols.map(col): _*)
        val tb = new graft.sources.Tables(batch.sparkSession, sfDir) {
          override def events: DataFrame = passed
        }
        writeSalted(graft.operators.Pipeline.eventAttrUnsorted(tb), outDir)
      }
      .start()
  }

  // ---- streaming profile maintenance (t_user_detail live) ----

  /** One fact-stream row — the event_attr transfer columns the profile
    * state consumes (the profile maintainer tails the fact table/topic,
    * exactly like a warehouse-side updater downstream of DwJob's sink).
    */
  case class FactRow(zgid: String, begin_date: Long, event_id: Long,
    platform_id: Int, zg_sid: Long, duration: String, app_version: String,
    channel: String, website: String, utm_source: String, utm_medium: String,
    utm_campaign: String, utm_content: String, utm_term: String,
    referrer_url: String, country: String, area: String, city: String,
    mccmnc: String, bs: String, bv: String, os: String, ov: String,
    zg_did: Int, zg_uid: String)

  /** First-touch fields + their (begin_date, event_id) order key. */
  case class TouchFirst(d: Long, id: Long, app_version: String,
    channel: String, website: String, utm_source: String, utm_medium: String,
    utm_campaign: String, utm_content: String, utm_term: String,
    referrer_url: String)

  /** Last-touch fields + their order key. */
  case class TouchLast(d: Long, id: Long, platform_id: Int,
    app_version: String, channel: String, country: String, area: String,
    city: String, mccmnc: String, bs: String, bv: String, os: String,
    ov: String, zg_did: Int)

  /** The per-zgid mergeable partial — the keyed-state form of
    * Dw.detailPartial: first/last touch as (order-key, fields) pairs,
    * sessions as an exact id set (bounded per user; the at-scale swap is
    * an HLL sketch, same as the batch doc), sums/maxes for the rest.
    */
  case class DetailState(f: TouchFirst, l: TouchLast, first_visit: Long,
    last_visit: Long, sids: Set[Long], duration: Long, is_registered: Int,
    seq: Long)

  /** The emitted profile row per update — detailAgg's column surface, so
    * the spec can diff it against the batch aggregate verbatim. `upd_seq`
    * counts state updates so a consumer (and the spec) can pick the latest
    * emission per key.
    */
  case class DetailRowUpdate(zg_id: String, platform: Int,
    first_visit_time: Long, last_visit_time: Long, visit_times: Int,
    duration: Long, first_version: String, first_channel: String,
    current_app_version: String, current_app_channel: String,
    first_website: String, utm_source: String, utm_medium: String,
    utm_campaign: String, utm_content: String, utm_term: String,
    first_referrer_url: String, current_country: String,
    current_area: String, current_city: String, cur_mccmnc_s: String,
    current_bs: String, cur_bv_s: String, current_os: String,
    cur_ov_s: String, cur_did: Int, is_registered: Int, upd_seq: Long)

  /** Streaming t_user_detail maintenance — the profile table as keyed
    * per-zgid state over the live event_attr stream: each micro-batch
    * folds its rows into the stored mergeable partial (the SAME merge
    * semantics as the batch incremental path `Dw.userDetailInc` — min/max
    * by the (begin_date, event_id) order key, session-id set union,
    * duration sum, registration max) and emits the updated profile row.
    * This unites the incremental fold and the streaming state shapes: a
    * micro-batch IS an increment.
    *
    * At scale: state is one partial per active user — the same footprint
    * as the reference's per-user profile row in Doris — and each trigger
    * shuffles only its own rows on the zgid axis.
    */
  def userDetailStream(eventAttr: DataFrame): Dataset[DetailRowUpdate] = {
    val spark = eventAttr.sparkSession
    import spark.implicits._
    val n = "\\N"
    eventAttr.select(
        col("zgid"), col("begin_date"), col("event_id"), col("platform_id"),
        col("zg_sid"), col("duration"), col("app_version"), col("channel"),
        col("website"), col("utm_source"), col("utm_medium"),
        col("utm_campaign"), col("utm_content"), col("utm_term"),
        col("referrer_url"), col("country"), col("area"), col("city"),
        col("mccmnc"), col("bs"), col("bv"), col("os"), col("ov"),
        col("zg_did"), col("zg_uid"))
      .as[FactRow]
      .groupByKey(_.zgid)
      .flatMapGroupsWithState[DetailState, DetailRowUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (zgid, rows, state: GroupState[DetailState]) =>
          var st = state.getOption.orNull
          // in-batch order matches the batch aggregate's order key
          rows.toSeq.sortBy(r => (r.begin_date, r.event_id)).foreach { r =>
            val f = TouchFirst(r.begin_date, r.event_id, r.app_version,
              r.channel, r.website, r.utm_source, r.utm_medium,
              r.utm_campaign, r.utm_content, r.utm_term, r.referrer_url)
            val l = TouchLast(r.begin_date, r.event_id, r.platform_id,
              r.app_version, r.channel, r.country, r.area, r.city, r.mccmnc,
              r.bs, r.bv, r.os, r.ov, r.zg_did)
            val sid = if (r.zg_sid != -1L) Set(r.zg_sid) else Set.empty[Long]
            // null-safe like the batch partial's try_cast: a malformed
            // duration from a producer bypassing the transfer's own "0"
            // guard must degrade (skip), not kill the streaming query
            val dur = r.duration.toLongOption.getOrElse(0L)
            val reg = if (r.zg_uid != n) 1 else 0
            st =
              if (st == null)
                DetailState(f, l, r.begin_date, r.begin_date, sid, dur, reg, 0L)
              else DetailState(
                if (f.d < st.f.d || (f.d == st.f.d && f.id < st.f.id)) f else st.f,
                if (l.d > st.l.d || (l.d == st.l.d && l.id > st.l.id)) l else st.l,
                math.min(st.first_visit, r.begin_date),
                math.max(st.last_visit, r.begin_date),
                st.sids ++ sid, st.duration + dur,
                math.max(st.is_registered, reg), st.seq)
          }
          st = st.copy(seq = st.seq + 1)
          state.update(st)
          val u = DetailRowUpdate(zgid, st.l.platform_id, st.first_visit,
            st.last_visit, st.sids.size, st.duration, st.f.app_version,
            st.f.channel, st.l.app_version, st.l.channel, st.f.website,
            st.f.utm_source, st.f.utm_medium, st.f.utm_campaign,
            st.f.utm_content, st.f.utm_term, st.f.referrer_url,
            st.l.country, st.l.area, st.l.city, st.l.mccmnc, st.l.bs,
            st.l.bv, st.l.os, st.l.ov, st.l.zg_did, st.is_registered,
            st.seq)
          Iterator(u)
      }
  }
}
