package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Routing / data quality / dims / sink (SURVEY.md §2.5, rows 19-24) —
  * DwJob step 2: DataRouterOperator splits the stream per message type into
  * the four Doris tables, DataValidator/TimeValidator gate what lands, and
  * Dims maps enum strings to dim codes. Batch-on-Spark: routing is a
  * `when` chain (one pass, codegen), validation is pure column predicates,
  * dims are broadcast joins, and the Doris sink becomes a day-partitioned
  * parquet writer.
  */
object Route {

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** Error codes pinned from ErrorMessageEnum.java:32-36. */
  object Err {
    val ZgZgidNone            = 1030001
    val ZgDidNone             = 1030003
    val EventTimeExceedsRange = 1030005
    val NoneError             = 0
  }

  /** Blacklisted apps (data_access_filter config in the reference). */
  val appBlacklist: Seq[String] = Seq("app_blocked")

  /** dt -> sink route (DataRouterOperator.java:255-295). */
  val dtRoutes: Seq[(String, String)] = Seq(
    "zgid" -> "user", "pl" -> "device", "usr" -> "user_prop",
    "evt" -> "event_attr", "vtl" -> "event_attr", "mkt" -> "event_attr",
    "ss" -> "event_attr", "se" -> "event_attr", "abp" -> "event_attr")

  /** #19 route_by_dt — message-type routing + app blacklist. Single narrow
    * groupBy; the real split at scale is `df.filter(route === ...)` per sink
    * over one cached pass.
    */
  def routeByDt(t: Tables): DataFrame = {
    val route = dtRoutes.foldRight(lit("drop")) { case ((dt, r), other) =>
      when(col("dt") === dt, r).otherwise(other)
    }
    env(t)
      .filter(!col("appkey").isin(appBlacklist: _*))
      .select(route.as("route"))
      .groupBy(col("route")).agg(count(lit(1)).as("n"))
      .orderBy(col("route"))
  }

  /** Platform dim (dim.json "sdk" dim / Dims.sdk): key -> code, unknown -> 0. */
  val platformDim: Seq[(String, Int)] = Seq(
    "none" -> 0, "and" -> 1, "ios" -> 2, "js" -> 3,
    "wxa" -> 4, "server" -> 5, "harmonyos" -> 6)

  def platformId(t: Tables, plCol: String = "pl"): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    broadcast(platformDim.toDF(plCol, "platform_id"))
  }

  /** #20 route_event_attr — EventAttrTransfer.fillBasicFieldsFromMap time
    * components: day id `yyyyMMdd`, epoch seconds, time id (HH + "0" + mm,
    * EventAttrTransfer.java:249-251), ISO year-week, platform dim code.
    * Pure expressions + one broadcast join.
    */
  def routeEventAttr(t: Tables): DataFrame =
    env(t)
      .filter(col("dt").isin("evt", "vtl", "mkt", "ss", "se", "abp"))
      .join(platformId(t), Seq("pl"), "left")
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyyMMdd").as("day_id"),
        unix_timestamp(col("ts")).as("begin_date"),
        concat(date_format(col("ts"), "HH"), lit("0"), date_format(col("ts"), "mm")).as("time_id"),
        concat(date_format(col("ts"), "yyyy"), lit("-"),
          lpad(weekofyear(col("ts")).cast("string"), 2, "0")).as("year_week"),
        coalesce(col("platform_id"), lit(0)).as("platform_id"),
        col("event_type").as("event_name"))
      .orderBy(col("event_id"))

  /** route_user_row — UserTransfer.java:40-84 (dt=zgid → user table): needs
    * device key + resolved zgid (skip otherwise), carries user id, epoch
    * seconds, platform code. The zgid join is the identity shuffle the
    * pipeline already paid for.
    */
  def routeUserRow(t: Tables): DataFrame = {
    val zg = Identity.zgidResolution(t)
    env(t).filter(col("dt") === "zgid" && col("did") =!= "")
      .join(zg, Seq("event_id"))
      .filter(col("zgid").isNotNull)
      .join(platformId(t), Seq("pl"), "left")
      .select(
        col("event_id"), col("zgid"), col("did"),
        coalesce(col("cuid"), lit("\\N")).as("user_id"),
        unix_timestamp(col("ts")).as("begin_date"),
        coalesce(col("platform_id"), lit(0)).as("platform_id"))
      .orderBy(col("event_id"))
  }

  /** route_device_row — DeviceTransfer.java:85-104 (dt=pl → device table):
    * device key, platform code, parsed device property, and the full UA
    * device matrix (Enrich.Ua re-expresses UserAgentParser.java:150-243
    * incl. the inferDeviceType fallback).
    */
  def routeDeviceRow(t: Tables): DataFrame = {
    val ua = col("ua")
    env(t).filter(col("dt") === "pl")
      .join(platformId(t), Seq("pl"), "left")
      .select(
        col("event_id"), col("did"),
        coalesce(col("platform_id"), lit(0)).as("platform_id"),
        Enrich.Ua.deviceType(ua).as("device_type"),
        Enrich.Ua.deviceBrand(ua).as("device_brand"),
        from_json(col("raw_props"), lit("k INT")).getField("k").as("prop_k"))
      .orderBy(col("event_id"))
  }

  /** route_user_prop_row — UserPropertyTransfer.java:125-162 (dt=usr →
    * user_property table): one row per custom property plus the implicit
    * app_user_id property row the reference always emits for real-name
    * users. Union of two projections over one scan.
    */
  def routeUserPropRow(t: Tables): DataFrame = {
    val base = env(t).filter(col("dt") === "usr" && col("cuid").isNotNull)
    val custom = base
      .select(col("event_id"), col("cuid"), lit("k").as("prop_name"),
        get_json_object(col("raw_props"), "$.k").as("prop_value"),
        unix_timestamp(col("ts")).as("last_update"))
      .filter(col("prop_value").isNotNull)
    val appUserId = base
      .select(col("event_id"), col("cuid"), lit("app_user_id").as("prop_name"),
        col("cuid").as("prop_value"),
        unix_timestamp(col("ts")).as("last_update"))
    custom.union(appUserId).orderBy(col("event_id"), col("prop_name"))
  }

  /** DQ time window, pinned for determinism (TimeValidator takes
    * (subDays=7, addDays=1) around "today"; we pin today = 2024-06-30 so the
    * oracle is reproducible — SURVEY.md §3).
    */
  val dqWindowStart = "2024-06-23 00:00:00"
  val dqWindowEnd   = "2024-07-02 00:00:00" // exclusive

  /** #21 dq_validate — DataValidator.java:40-80 first-failure-wins checks:
    * zgid ⇒ did ⇒ time-range (ct/tz always present here), with the
    * TimeValidator.java:40-60 sdk exemption for zg_server / zg-cdp.
    */
  def dqValidate(t: Tables): DataFrame =
    env(t).select(col("event_id"), errorCodeCol.as("error_code"))
      .orderBy(col("event_id"))

  /** The #21 validation verdict as a single column expression (shared by
    * dq_validate and dq_error_stats so the stats path needs no self-join —
    * one scan, one narrow shuffle).
    */
  private def errorCodeCol = {
    val zgidMissing = col("appkey") === "" || (col("did") === "" && col("cuid").isNull)
    val didMissing  = col("did") === ""
    val timeExempt  = col("sdk").isin("zg_server", "zg-cdp")
    val timeBad     = !timeExempt &&
      (col("ts") < lit(dqWindowStart).cast("timestamp") ||
        col("ts") >= lit(dqWindowEnd).cast("timestamp"))
    when(zgidMissing, lit(Err.ZgZgidNone))
      .when(didMissing, lit(Err.ZgDidNone))
      .when(timeBad, lit(Err.EventTimeExceedsRange))
      .otherwise(lit(Err.NoneError))
  }

  /** #22 dq_error_stats — the DQ Kafka topic re-expressed as a stats table:
    * error-code counts per app (IdResultProcessFunction / DataQuality
    * KafkaService). Inlines #21's verdict expression: one scan, one shuffle
    * on the tiny (app, code) key space.
    */
  def dqErrorStats(t: Tables): DataFrame =
    env(t)
      .groupBy(col("appkey"), errorCodeCol.as("error_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("appkey"), col("error_code"))

  /** #23 dim_platform — Dims.sdk (dim.json): enum string -> code, unknown
    * -> 0. Broadcast join + histogram.
    */
  def dimPlatform(t: Tables): DataFrame =
    env(t)
      .join(platformId(t), Seq("pl"), "left")
      .groupBy(col("pl"), coalesce(col("platform_id"), lit(0)).as("platform_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pl"))

  /** Network dim (dim.json "network": none/2g/3g/4g/wifi; unknown -> 0). */
  val networkDim: Seq[(String, Int)] = Seq(
    "none" -> 0, "2g" -> 1, "3g" -> 2, "4g" -> 3, "wifi" -> 4)

  /** dim_network — Dims.getDimId("network") / EventAttrTransfer
    * .ensureNetwork: enum string -> code, unknown -> 0, broadcast join.
    */
  def dimNetwork(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    env(t)
      .join(broadcast(networkDim.toDF("net", "network_id")), Seq("net"), "left")
      .groupBy(col("net"), coalesce(col("network_id"), lit(0)).as("network_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("net"))
  }

  /** The user-profile dim tables (dim.json gender/jail/pirate: lowercased
    * key -> id, null/miss -> 0). One copy — the oracle VALUES lists are
    * built from these.
    */
  val genderDim: Seq[(String, Int)] = Seq(
    "m" -> 1, "male" -> 1, "男" -> 1, "f" -> 2, "female" -> 2, "女" -> 2,
    "n" -> 0, "none" -> 0, "未知" -> 0)
  val jailDim: Seq[(String, Int)] = Seq("" -> 0, "1" -> 1, "0" -> 2)

  /** dim_user_profile — DimUtils.java:42-95, the user-profile normalizers
    * UserTransfer feeds from $-props:
    *  - gender/jail/pirate: dim lookup on the LOWERCASED key, null or
    *    unmapped -> 0 (`getDimId`);
    *  - carrier: exactly-6-digit MCC+MNC string -> int, else 0;
    *  - birthday: strict yyyy/MM/dd -> yyyyMMdd, null on parse failure
    *    (FormatUtil.formatDate's contract);
    *  - phone: strings longer than 11 keep their LAST 11 chars; the result
    *    must be all digits, else null;
    *  - sdkv validity: full-match ^v(\d+\.)*\d+ (isSdkvVersionValid).
    * Raw inputs cycle deterministically from event_id (mixed-case and
    * invalid values included so every branch is exercised); the oracle
    * re-creates the same cycles. All broadcast dims + column expressions —
    * zero shuffle beyond the final sort.
    */
  def dimUserProfile(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val id = col("event_id")
    def cyc(c: org.apache.spark.sql.Column, vals: Seq[String]) =
      vals.zipWithIndex.tail.foldLeft(when(c === 0, vals.head)) {
        case (acc, (v, i)) => acc.when(c === i, v)
      }
    val raw = t.events.select(
      id,
      cyc(pmod(id, lit(10)), Seq("m", "MALE", "男", "f", "Female", "女", "n", "none", "未知", "x"))
        .as("gender_raw"),
      cyc(pmod(id, lit(4)), Seq("", "0", "1", "2")).as("jail_raw"),
      cyc(pmod(id + 1, lit(4)), Seq("", "0", "1", "2")).as("pirate_raw"),
      when(pmod(id, lit(3)) === 0, concat(lit("46000"), pmod(id, lit(10)).cast("string")))
        .when(pmod(id, lit(3)) === 1, lit("中国移动"))
        .otherwise(concat(lit("4600"), pmod(id, lit(10)).cast("string"))).as("carrier_raw"),
      when(pmod(id, lit(2)) === 0,
        concat(lit("1992/03/0"), (pmod(id, lit(9)) + 1).cast("string")))
        .otherwise(lit("bad-date")).as("birthday_raw"),
      when(pmod(id, lit(3)) === 0,
        concat(lit("+8613800138"), lpad(pmod(id, lit(100)).cast("string"), 3, "0")))
        .when(pmod(id, lit(3)) === 1, lit("138abc"))
        .otherwise(concat(lit("13800"), lpad(pmod(id, lit(1000)).cast("string"), 4, "0")))
        .as("phone_raw"),
      when(pmod(id, lit(3)) === 0, concat(lit("v1."), pmod(id, lit(10)).cast("string")))
        .when(pmod(id, lit(3)) === 1, lit("1.2"))
        .otherwise(lit("v")).as("sdkv_raw"))
    val phoneTail = when(length(col("phone_raw")) > 11,
      substring(col("phone_raw"), -11, 11)).otherwise(col("phone_raw"))
    raw
      .join(broadcast(genderDim.toDF("gk", "gender_id")),
        lower(col("gender_raw")) === col("gk"), "left")
      .join(broadcast(jailDim.toDF("jk", "jail_id")),
        col("jail_raw") === col("jk"), "left")
      .join(broadcast(jailDim.toDF("pk", "pirate_id")),
        col("pirate_raw") === col("pk"), "left")
      .select(
        id,
        coalesce(col("gender_id"), lit(0)).as("gender_id"),
        coalesce(col("jail_id"), lit(0)).as("jail_id"),
        coalesce(col("pirate_id"), lit(0)).as("pirate_id"),
        when(col("carrier_raw").rlike("^[0-9]{6}$"), col("carrier_raw").cast("int"))
          .otherwise(lit(0)).as("carrier_code"),
        // try_to_date: malformed input must yield null (the reference's
        // formatDate contract), never an ANSI parse error
        date_format(expr("try_to_date(birthday_raw, 'yyyy/MM/dd')"), "yyyyMMdd")
          .as("birthday_fmt"),
        when(phoneTail.rlike("^[0-9]+$"), phoneTail)
          .otherwise(lit(null).cast("string")).as("phone_norm"),
        col("sdkv_raw").rlike("^v([0-9]+\\.)*[0-9]+$").as("sdkv_valid"))
      .orderBy(id)
  }

  /** Writer tasks per day partition and file-size bound for the sink. At
    * 100 TB one day is TBs: repartitioning on day_id alone funnels each day
    * through ONE writer task (the r1 VERDICT scale-killer). A salt spreads
    * every day over `sinkWritersPerDay` tasks and maxRecordsPerFile bounds
    * individual files, so a heavy day writes many bounded files in
    * parallel while small days still avoid the shuffle-partitions × days
    * small-file explosion.
    */
  val sinkWritersPerDay = 4
  val sinkMaxRecordsPerFile = 2000L

  /** #24 sink_partitioned_parquet — the Doris sink's batch analog: write
    * event_attr rows day-partitioned (partition pruning for every downstream
    * day-ranged query), read the sink back, return per-day counts.
    * Rows-only check; the >1-file-per-heavy-day property is spec-asserted.
    */
  def sinkPartitionedParquet(t: Tables, outDir: Option[String] = None): DataFrame = {
    val out = outDir.getOrElse(
      s"/tmp/graft_sink/${java.util.UUID.randomUUID().toString.take(8)}")
    val rows = env(t)
      .withColumn("day_id", date_format(col("ts"), "yyyyMMdd"))
      .select("event_id", "day_id", "event_type", "value")
    rows
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(sinkWritersPerDay)))
      // explicit partition count: an unspecified one lets AQE coalesce the
      // salted shuffle back into few partitions, re-creating the single
      // writer the salt exists to avoid
      .repartition(t.spark.sessionState.conf.numShufflePartitions,
        col("day_id"), col("salt"))
      .drop("salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", sinkMaxRecordsPerFile)
      .partitionBy("day_id").parquet(out)
    t.spark.read.parquet(out)
      .groupBy(col("day_id").cast("string").as("day_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day_id"))
  }
}
