package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The REAL zg-etl ingest path: the Kafka JSON envelope
  * `{owner, ak, pl, sdk, sdkv, ua, ip, usr:{did,cuid}, data:[{dt, pr:{...}}]}`
  * (basicSchema.json; CheckJsonAndOwnerOperator.java:16-69) parsed and
  * flattened to one row per data item — the schema every operator in
  * graft.operators consumes.
  *
  * The driver's testdata has no such stream (operators run on the
  * synthesized Envelope instead), but a production deployment points this at
  * the real topic and gets the same downstream pipeline. `pr` is kept as
  * map<string,string>: zg property payloads are open-schema ($-system and
  * _-custom keys), and every consumer (EventAttrTransfer etc.) reads them
  * as strings before typing.
  */
object RawEnvelope {

  val prType: MapType = MapType(StringType, StringType)

  val schema: StructType = StructType(Seq(
    StructField("owner", StringType),
    StructField("ak", StringType),
    StructField("debug", IntegerType),
    StructField("sln", StringType),
    StructField("pl", StringType),
    StructField("sdk", StringType),
    StructField("sdkv", StringType),
    StructField("tz", StringType),
    StructField("ut", StringType),
    StructField("ip", StringType),
    StructField("ua", StringType),
    StructField("usr", StructType(Seq(
      StructField("did", StringType),
      StructField("cuid", StringType)))),
    StructField("data", ArrayType(StructType(Seq(
      StructField("dt", StringType),
      StructField("pr", prType)))))))

  /** Parse a column of raw JSON envelopes and flatten to one row per data
    * item. Malformed JSON ⇒ result = -1 with BASIC_SCHEMA_FORMAT_NOT_MATCH
    * and no data rows (the reference drops them to the DQ topic); valid
    * envelopes get owner normalized exactly like operator #1.
    */
  def parse(df: DataFrame, jsonCol: String = "raw"): DataFrame = {
    val parsed = df.withColumn("env", from_json(col(jsonCol), schema))
    val valid = parsed.filter(col("env").isNotNull && col("env.data").isNotNull)
    valid.select(
        when(col("env.owner").isin("zg_adp", "zg_mkt", "zg_cdp"), col("env.owner"))
          .otherwise(lit("zg")).as("owner"),
        col("env.ak").as("appkey"),
        col("env.pl").as("pl"),
        col("env.sdk").as("sdk"),
        col("env.ip").as("ip"),
        col("env.ua").as("ua"),
        col("env.usr.did").as("did"),
        col("env.usr.cuid").as("cuid"),
        posexplode(col("env.data")).as(Seq("item_idx", "item")))
      .select(col("owner"), col("appkey"), col("pl"), col("sdk"), col("ip"),
        col("ua"), col("did"), col("cuid"), col("item_idx"),
        col("item.dt").as("dt"), col("item.pr").as("pr"))
  }

  /** Rejected envelopes (the DQ side of the split). */
  def rejects(df: DataFrame, jsonCol: String = "raw"): DataFrame =
    df.withColumn("env", from_json(col(jsonCol), schema))
      .filter(col("env").isNull || col("env.data").isNull)
      .select(col(jsonCol).as("raw"),
        lit(-1).as("result"),
        lit(1020002).as("error_code")) // BASIC_SCHEMA_FORMAT_NOT_MATCH

  /** Reserved mkt/abp attribute names (EventAttrTransfer.getAttrSet). */
  val reservedAttrs: Set[String] = Set("eid", "ct", "sid", "uuid", "net", "cr", "vn", "dru")

  /** Custom-property classification — EventAttrTransfer.java:170-190: for
    * `evt` items custom props are the `_`-prefixed keys; for `mkt`/`abp`
    * they are keys neither `$`-prefixed nor in the reserved attr set.
    * One explode over the pr map, pure predicate columns.
    */
  def customProps(parsed: DataFrame): DataFrame =
    parsed
      .select(col("appkey"), col("dt"), explode(col("pr")).as(Seq("prop_key", "prop_value")))
      .withColumn("is_custom",
        when(col("dt") === "evt", col("prop_key").startsWith("_"))
          .when(col("dt").isin("mkt", "abp"),
            !col("prop_key").startsWith("$") &&
              !col("prop_key").isin(reservedAttrs.toSeq.map(lit): _*))
          .otherwise(lit(false)))

  /** Streaming ingest from Kafka — the direct analog of the reference's
    * FlinkKafkaConsumer source (IdJob.java:22-30). Not exercisable in this
    * environment (no broker); the parse/flatten chain it feeds is fully
    * covered by RawEnvelopeSpec on literal JSON.
    */
  def kafka(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    parse(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .load()
        .selectExpr("CAST(value AS STRING) AS raw"))
}
