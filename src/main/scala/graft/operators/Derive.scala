package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven derivation (SURVEY.md §2.3, rows 10-14).
  *
  * The reference evaluates admin-configured rules per record: virtual
  * properties are SQL-ish expression strings compiled to a JSON rule tree and
  * interpreted in Java (VirtualPropertyOperator.java + the virtualAttribute
  * package), virtual events are config rows matched against each event
  * (VirtualEventOperator.java:89-260). Spark-first, the rule *string* is the
  * program: `expr()` compiles it straight into Catalyst, so rules run inside
  * whole-stage codegen instead of a per-record interpreter — and the rule
  * table join is a broadcast of config rows against the stream.
  */
object Derive {

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** #10 virtual property rules: name -> expression string. The strings live
    * in config (here: one shared constant) and compile via `expr()` on the
    * Spark side and verbatim SQL on the oracle side — Spark IS the rule
    * engine the reference hand-rolled in its virtualAttribute package.
    */
  val virtualPropertyRules: Seq[(String, String)] = Seq(
    "vp_value_cny"    -> "round(value * 7, 2)",
    "vp_value_bucket" -> ("CASE WHEN value >= 100 THEN 'high' " +
      "WHEN value >= 10 THEN 'mid' ELSE 'low' END"),
    "vp_type_upper"   -> "upper(event_type)",
    "vp_is_purchase"  -> "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
  )

  /** #10 derive_virtual_property — VirtualPropertyOperator.java: evaluate
    * every configured rule as a derived column. Zero shuffle, pure codegen.
    */
  def virtualProperty(t: Tables): DataFrame =
    t.events
      .select(col("event_id") +: virtualPropertyRules.map { case (n, e) => expr(e).as(n) }: _*)
      .orderBy(col("event_id"))

  /** Virtual-attribute rules in the reference's ACTUAL config format — the
    * JSON expression trees SqlToJsonExpressionConverter produces and the
    * admin UI stores. Compiled by graft.functions.RuleCompiler into Catalyst
    * columns (the Spark-first replacement for the per-record Java
    * interpreter in VirtualAttributeExpressionEvaluator.java).
    */
  val ruleTrees: Seq[(String, String)] = Seq(
    // multi-branch CASE over a numeric field
    "rt_bucket" ->
      """{"type":"condition","conditions":[
        {"condition":{"type":"operation","operator":"greater_equal","operands":[
           {"type":"field","field":"value"},{"type":"constant","value":100,"dataType":"number"}]},
         "value":{"type":"constant","value":"high","dataType":"string"}},
        {"condition":{"type":"operation","operator":"greater_equal","operands":[
           {"type":"field","field":"value"},{"type":"constant","value":10,"dataType":"number"}]},
         "value":{"type":"constant","value":"mid","dataType":"string"}}],
        "defaultValue":{"type":"constant","value":"low","dataType":"string"}}""",
    // arithmetic + function composition
    "rt_fee" ->
      """{"type":"function","function":"floor","parameters":[
        {"type":"operation","operator":"add","operands":[
          {"type":"operation","operator":"multiply","operands":[
            {"type":"field","field":"value"},
            {"type":"constant","value":0.05,"dataType":"number"}]},
          {"type":"constant","value":1,"dataType":"number"}]}]}""",
    // string functions
    "rt_label" ->
      """{"type":"function","function":"concat","parameters":[
        {"type":"function","function":"upper","parameters":[
          {"type":"field","field":"event_type"}]},
        {"type":"constant","value":"-evt","dataType":"string"}]}""")

  /** derive_rule_tree — #10 in the reference's own rule format: each stored
    * JSON tree compiles once to a Column; evaluation is codegen'd.
    */
  def ruleTree(t: Tables): DataFrame =
    t.events.select(
      col("event_id") +: ruleTrees.map { case (name, json) =>
        graft.functions.RuleCompiler.compile(json).as(name)
      }: _*)
      .orderBy(col("event_id"))

  /** SQL-string rules (the admin-facing form SqlToJsonExpressionConverter
    * accepts — its own documented examples use exactly this shape). Compiled
    * by `functions.SqlRules` through Spark's SQL parser instead of the
    * reference's hand-rolled tokenizer.
    */
  val sqlRules: Seq[(String, String)] = Seq(
    "rs_bucket" ->
      "CASE WHEN event.value >= 100 THEN 'high' WHEN event.value >= 10 THEN 'mid' ELSE 'low' END",
    "rs_fee" -> "FLOOR(event.value * 0.05 + 1)",
    "rs_label" -> "CONCAT(UPPER(event.event_type), '-evt')",
    "rs_discount" ->
      """CASE WHEN event.value > 1000 AND event.event_type = 'purchase' THEN 'bulk_discount'
              WHEN event.value > 1000 THEN 'price_discount'
              ELSE 'no_discount' END""")

  /** derive_rule_sql — #10 in the reference's SQL-string rule form: each
    * rule parses through Spark's expression parser, validates against the
    * reference's operator/function whitelist, and compiles to a codegen'd
    * Column — same execution tier as the JSON-tree path (`derive_rule_tree`),
    * one scan, zero shuffle.
    */
  def ruleSql(t: Tables): DataFrame =
    t.events.select(
      col("event_id") +: sqlRules.map { case (name, sql) =>
        graft.functions.SqlRules.compile(sql, t.spark).as(name)
      }: _*)
      .orderBy(col("event_id"))

  /** #11 virtual event rules in the reference's ACTUAL config shape
    * (VirtualEventOperator: each rule = virtual_name + a `filters` value
    * that may be null, a JSON-object STRING, or a map): matching is
    * per-key EXACT equality against the pr map — for each filter key k,
    * the pr value is `pr["_"+k]` (custom-prop form) falling back to
    * `pr[k]`, and null/empty/unparseable filters match everything
    * (matchFilters' null, isEmpty and catch branches,
    * VirtualEventOperator.java:216-254). Rules here exercise every branch:
    * single-key, two-key, null, empty-object, unparseable (→ match-all),
    * a key absent from pr (→ never matches), and a JSON-number prop
    * compared in canonical string form.
    */
  val virtualEventFilterRules: Seq[(String, String, String)] = Seq(
    ("purchase", """{"plan":"pro"}""", "pro_purchase"),
    ("purchase", """{"plan":"ent","src":"web"}""", "ent_web_purchase"),
    ("purchase", "definitely not json", "purchase_all"),
    ("click", null, "any_click"),
    ("view", "{}", "page_view_vtl"),
    ("signup", """{"absent":"x"}""", "never_matches"),
    ("error", """{"k":"7"}""", "k7_error")
  )

  /** The pr custom-property map the filters probe: '_plan' carries the
    * underscore-prefixed custom-key form, 'src' the bare-key fallback form,
    * 'k' the JSON-number prop (string-canonical, null when the payload is
    * corrupt — exactly the reference's Map.get miss).
    */
  def virtualEventPrMap: org.apache.spark.sql.Column = map(
    lit("_plan"), col("pr_plan"),
    lit("src"), col("pr_src"),
    lit("k"), get_json_object(col("raw_props"), "$.k"))

  /** Parse a rule's `filters` config value into (key, canonical-string
    * value) pairs. None of the reference's three match-all roads survives
    * as a predicate: null filters, an empty object and a parse failure all
    * return an EMPTY pair list (= match everything).
    */
  def parseFilters(filtersJson: String): Seq[(String, String)] =
    if (filtersJson == null) Seq.empty
    else try {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(filtersJson) match {
        case JObject(fields) => fields.collect {
          case (k, JString(s))  => (k, s)
          case (k, JInt(i))     => (k, i.toString)
          case (k, JDouble(d))  => (k, d.toString)
          case (k, JBool(b))    => (k, b.toString)
        }
        case _ => Seq.empty
      }
    } catch { // unparseable -> match-all; fatal JVM errors must propagate
      case scala.util.control.NonFatal(_) => Seq.empty
    }

  /** One rule's match predicate over the pr map: every filter key's value
    * must equal pr["_"+k] ?? pr[k] (a missing key yields null ⇒ the
    * equality is never true, like Objects.equals(v, null) for v != null).
    */
  private def filterMatchCol(pr: org.apache.spark.sql.Column,
                             filters: Seq[(String, String)]): org.apache.spark.sql.Column =
    filters
      .map { case (k, v) =>
        coalesce(element_at(pr, "_" + k), element_at(pr, k)) === lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Shared batch/stream match builder: rules are static config, so each
    * rule COMPILES into the plan as one `when` cell of an array — a single
    * scan, zero shuffle, full codegen; `explode` emits one derived row per
    * matching rule, exactly the reference's per-rule message fan-out. Only
    * dt ∈ {evt, abp} items carry virtual events
    * (VirtualEventOperator.java:116). A dynamically-loaded rule table
    * would instead broadcast-join exploded (rule, key, value) rows — same
    * cost shape, interpreter tier.
    */
  def virtualEventCols(envDf: DataFrame): DataFrame = {
    val pr = virtualEventPrMap
    val cells = virtualEventFilterRules.map { case (onEvent, filtersJson, vname) =>
      when(col("event_type") === onEvent &&
        filterMatchCol(pr, parseFilters(filtersJson)), lit(vname))
    }
    envDf
      .filter(col("dt").isin("evt", "abp"))
      .withColumn("virtual_name",
        explode(filter(array(cells: _*), c => c.isNotNull)))
  }

  /** #11 derive_virtual_event — VirtualEventOperator.java:89-260 with the
    * REAL filters-map semantics (see `virtualEventFilterRules`).
    */
  def virtualEvent(t: Tables): DataFrame =
    virtualEventCols(env(t))
      .select(col("event_id"), col("virtual_name"))
      .orderBy(col("event_id"), col("virtual_name"))

  /** #12 derive_device_props — DevicePropertyParser.java: schema'd JSON
    * parse of the property payload. `from_json` yields NULL fields for
    * corrupt payloads (the parser's try/catch-null), all inside codegen.
    */
  def deviceProps(t: Tables): DataFrame =
    env(t)
      .select(
        col("event_id"),
        from_json(col("raw_props"), lit("k INT")).getField("k").as("prop_k"))
      .orderBy(col("event_id"))

  // ---- full device-property parse (DevicePropertyParser.java) ----

  /** Brand standardization map (DevicePropertyParser.java:29-68), in a
    * DETERMINISTIC order (the Java HashMap's contains-fallback iterates in
    * unspecified order; here declaration order is the contract).
    */
  val brandMapping: Seq[(String, String)] = Seq(
    "huawei" -> "Huawei", "honor" -> "Honor", "荣耀" -> "Honor",
    "xiaomi" -> "Xiaomi", "redmi" -> "Redmi", "红米" -> "Redmi",
    "oppo" -> "OPPO", "realme" -> "Realme", "oneplus" -> "OnePlus",
    "vivo" -> "Vivo", "iqoo" -> "iQOO",
    "apple" -> "Apple", "iphone" -> "Apple",
    "samsung" -> "Samsung",
    "meizu" -> "Meizu", "魅族" -> "Meizu",
    "lenovo" -> "Lenovo", "联想" -> "Lenovo",
    "zte" -> "ZTE", "中兴" -> "ZTE",
    "nubia" -> "Nubia", "努比亚" -> "Nubia",
    "黑鲨" -> "BlackShark", "黑莓" -> "BlackBerry",
    "mi" -> "Xiaomi")

  val flagshipKeywords: Seq[String] = Seq(
    "PRO", "ULTRA", "MAX", "PLUS", "MATE", "FIND", "X", "PRO+", "GT", "ACE",
    "旗舰", "折叠")
  val foldableKeywords: Seq[String] = Seq("FOLD", "FLIP", "MIX FOLD", "MATE X", "折叠")

  /** derive_device_property_full — the COMPLETE DevicePropertyParser.java
    * surface as pure column expressions: brand standardization (exact then
    * contains fallback then capitalize), model normalization (whitespace
    * collapse + special-char strip), device category (foldable / flagship /
    * Apple + Redmi special cases), price range, 5G detection (raw model,
    * incl. 全网通), foldable flag, release-year extraction. Empty raw brand
    * ⇒ the parser's setDefaults row.
    */
  def devicePropertyFull(t: Tables): DataFrame =
    devicePropertyCols(env(t))
      .select(col("event_id"), col("std_brand"), col("std_model"), col("category"),
        col("price_range"), col("is_5g"), col("is_foldable"), col("release_year"))
      .orderBy(col("event_id"))

  /** The parser surface as a reusable column builder over any envelope
    * frame (route_device_row composes it — zero drift with the standalone
    * operator above): appends std_brand / std_model / category /
    * price_range / is_5g / is_foldable / release_year.
    */
  def devicePropertyCols(envDf: DataFrame): DataFrame = {
    val rawBrand = col("dev_brand")
    val rawModel = col("dev_model")
    val lb = lower(trim(rawBrand))
    val stdBrand = brandMapping.foldRight(
      // capitalize fallback (DevicePropertyParser.java:307-312)
      concat(upper(substring(rawBrand, 1, 1)), lower(expr("substring(dev_brand, 2)")))) {
      case ((key, std), other) => when(lb.contains(key), std).otherwise(other)
    }
    val stdModel = regexp_replace(
      regexp_replace(trim(rawModel), "\\s+", " "), "[^a-zA-Z0-9 +\\-]", "")
    def containsAny(c: org.apache.spark.sql.Column, kws: Seq[String]) =
      kws.map(k => upper(c).contains(k)).reduce(_ || _)
    // staged projections: std_brand/std_model materialize as COLUMNS before
    // the category/price logic references them — building everything in one
    // projection expanded the brand when-chain once per consumer and pushed
    // the stage past the huge-method codegen limit
    val withCat = envDf
      .withColumn("sb", stdBrand)
      .withColumn("sm", stdModel)
      .withColumn("cat",
        when(containsAny(col("sm"), foldableKeywords), "Foldable")
          .when(containsAny(col("sm"), flagshipKeywords), "Flagship")
          .when(col("sb") === "Apple",
            when(upper(col("sm")).contains("SE"), "Entry-level").otherwise("Mid-range"))
          .when(col("sb") === "Redmi",
            when(upper(col("sm")).contains("K") || upper(col("sm")).contains("NOTE"),
              "Mid-range").otherwise("Entry-level"))
          .otherwise("Mid-range"))
    val empty = trim(col("dev_brand")) === ""
    withCat
      .withColumn("std_brand", when(empty, "UNKNOWN").otherwise(col("sb")))
      .withColumn("std_model", when(empty, "").otherwise(col("sm")))
      .withColumn("category", when(empty, "UNKNOWN").otherwise(col("cat")))
      .withColumn("price_range", when(empty, "UNKNOWN").otherwise(
        when(col("cat").isin("Foldable", "Flagship"), "Premium")
          .when(col("cat") === "Entry-level", "Budget")
          .when(col("sb") === "Apple", "Premium")
          .when(col("sb").isin("Redmi", "Realme"), "Budget")
          .otherwise("Mid")))
      .withColumn("is_5g",
        when(empty, false).otherwise(col("dev_model").rlike("(?i)5G|全网通")))
      .withColumn("is_foldable",
        when(empty, false).otherwise(containsAny(col("dev_model"), foldableKeywords)))
      .withColumn("release_year",
        when(empty, "").otherwise(regexp_extract(col("sm"), "(20[12][0-9])", 1)))
      .drop("sb", "sm", "cat")
  }

  /** #13 derive_event_registry — EventAsyncOperator.java: the reference
    * hands out incremental event ids per app as names first appear (Kvrocks
    * counter). Batch: rank names by first-seen time. The rank runs over
    * |distinct names| per app — at 100 TB the groupBy pre-aggregation does
    * all the heavy lifting map-side.
    */
  /** The unsorted registry — chain consumers (Route, Adv) join this by
    * key; the presentation sort stays on the registered face only.
    */
  private[operators] def eventRegistryUnsorted(t: Tables): DataFrame =
    env(t).filter(col("appkey") =!= "")
      .groupBy(col("appkey"), col("event_type"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n"))
      .withColumn("eid",
        dense_rank().over(Window.partitionBy("appkey").orderBy("first_ts", "event_type")))
      .select(col("appkey"), col("event_type").as("event_name"), col("eid"), col("n"))

  def eventRegistry(t: Tables): DataFrame =
    eventRegistryUnsorted(t).orderBy(col("appkey"), col("eid"))

  /** Blacklisted user-property names (UserPropAsyncOperator's
    * blackUserPropSet: blacklisted properties never register).
    */
  val userPropBlacklist: Seq[String] = Seq("p6")

  /** derive_user_prop_registry — UserPropAsyncOperator.java: the reference
    * hands out per-app property ids on first sight (Kvrocks
    * appIdPropIdMap hash + user-level locks + a property blacklist).
    * Batch: blacklist-filter, then rank property names by first-seen time
    * per app — the same first-writer-wins ids without any lock, because
    * the groupBy IS the coordination. Names are UPPERCASED for the
    * registry key exactly like the reference's field format.
    */
  private[operators] def userPropRegistryUnsorted(t: Tables): DataFrame =
    env(t)
      .filter(col("dt") === "usr" && col("cuid").isNotNull && col("appkey") =!= "")
      .select(col("appkey"), col("ts"),
        concat(lit("p"), col("user_id") % 7).as("prop_name"))
      .filter(!col("prop_name").isin(userPropBlacklist: _*))
      .groupBy(col("appkey"), upper(col("prop_name")).as("prop_key"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n"))
      .withColumn("prop_id",
        dense_rank().over(Window.partitionBy("appkey").orderBy("first_ts", "prop_key")))
      .select(col("appkey"), col("prop_key"), col("prop_id"), col("n"))

  def userPropRegistry(t: Tables): DataFrame =
    userPropRegistryUnsorted(t).orderBy(col("appkey"), col("prop_id"))

  /** Custom-property column budget (EventAttrRow.CUSTOM_COLUMNS — 100 in
    * the reference, configurable via EventAttrRow.configure; 10 here so
    * the 1..customColumns bound is actually exercised: the synthetic
    * corpus registers up to 14 keys per event type).
    */
  val customColumns = 10

  /** Reserved mkt/abp attr names (EventAttrTransfer's mktAttrs/abpAttrs):
    * bare keys in this set are NOT custom properties.
    */
  val mktAbpReservedAttrs: Seq[String] = Seq(
    "ct", "tz", "zg_zgid", "zg_did", "zg_eid", "zg_sid", "zg_uid", "eid", "uuid")

  /** Custom-property eligibility over the envelope's cus_key
    * (fillCustomPropertiesBatchAsync's two branches,
    * EventAttrTransfer.java:170-188): evt keys must be '_'-prefixed;
    * mkt/abp keys must be neither '$'-prefixed nor reserved.
    */
  def customPropEligible: org.apache.spark.sql.Column =
    (col("dt") === "evt" && col("cus_key").startsWith("_")) ||
      (col("dt").isin("mkt", "abp") && !col("cus_key").startsWith("$") &&
        !col("cus_key").isin(mktAbpReservedAttrs: _*))

  /** The event-attr column-index registry — the batch re-expression of
    * ConfigCacheService.batchGetEventAttrColumnIndex (the Kvrocks hash the
    * reference probes per record, EventAttrTransfer.java:204-222): each
    * registered event type allocates column indexes to its custom
    * properties in first-seen order. dense_rank over the distinct
    * (appkey, event_type, key) set, bounded to 1..customColumns — indexes
    * beyond the budget never materialize, exactly like the reference's
    * colIndex range check.
    */
  def eventAttrColumnIndex(t: Tables): DataFrame =
    env(t)
      .filter(col("appkey") =!= "" && customPropEligible)
      .groupBy(col("appkey"), col("event_type"), col("cus_key"))
      .agg(min(col("ts")).as("first_ts"))
      .withColumn("col_index",
        dense_rank().over(
          Window.partitionBy("appkey", "event_type").orderBy("first_ts", "cus_key")))
      .filter(col("col_index") <= customColumns)
      .select(col("appkey"), col("event_type"), col("cus_key"), col("col_index"))

  /** #14 etl_prop_length_limit — EventAttrTransfer.ensureLength: every
    * string property is truncated to its column budget before sinking
    * (maxPropLength). Shown on the longest envelope string (ua, 64 chars).
    */
  def propLengthLimit(t: Tables): DataFrame =
    env(t)
      .groupBy(substring(col("ua"), 1, 64).as("ua_limited"))
      .agg(count(lit(1)).as("n"), max(length(col("ua"))).as("orig_len"))
      .orderBy(col("ua_limited"))
}
