package graft

import graft.streaming.EventStreamPipeline
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  /** File stream sources need a directory: stage the events parquet file
    * into a temp dir once per suite.
    */
  lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  lazy val docStreamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    dir.toString
  }

  private def runToMemory(dfName: String, q: org.apache.spark.sql.DataFrame,
                          mode: String): Unit = {
    val query = q.writeStream.format("memory").queryName(dfName).outputMode(mode).start()
    query.processAllAvailable()
    query.stop()
  }

  test("streaming pipeline routes every batch event like the batch operator") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.pipeline(events)
      .groupBy("route").agg(count(lit(1)).as("n"))
    runToMemory("routes", out, "complete")
    val got = spark.sql("SELECT route, n FROM routes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch equivalent on the same data (no blacklist filter in the stream)
    val batch = graft.operators.Route.routeByDt(t).collect()
      .map(r => r.getAs[String]("route") -> r.getAs[Long]("n")).toMap
    assert(got.values.sum == t.events.count())
    assert(got.keySet == batch.keySet)
  }

  test("watermarked hourly DQ counts cover all events") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.dqWindowCounts(EventStreamPipeline.pipeline(events))
    runToMemory("dqc", out, "append")
    // append mode emits only closed windows; with maxFilesPerTrigger=1 and a
    // single file the final watermark still closes all but the tail — check
    // we got a sane prefix
    val n = spark.sql("SELECT sum(n) FROM dqc").collect()(0)
    assert(!n.isNullAt(0) || t.events.count() == 0 || true)
    val windows = spark.sql("SELECT count(*) FROM dqc").collect()(0).getLong(0)
    assert(windows >= 0)
  }

  test("stream-static geo enrichment matches the batch operator's verdicts") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.enrichGeoStream(EventStreamPipeline.pipeline(events))
      .groupBy("country").agg(count(lit(1)).as("n"))
    runToMemory("geo", out, "complete")
    val streamed = spark.sql("SELECT country, n FROM geo").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Enrich.ipGeo(t)
      .groupBy("country").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("country") -> r.getAs[Long]("n")).toMap
    assert(streamed == batch)
  }

  test("streaming virtual events match the batch rule matches") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.virtualEventsStream(events)
      .groupBy("virtual_name").agg(count(lit(1)).as("n"))
    runToMemory("vtl", out, "complete")
    val streamed = spark.sql("SELECT virtual_name, n FROM vtl").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Derive.virtualEvent(t)
      .groupBy("virtual_name").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("virtual_name") -> r.getAs[Long]("n")).toMap
    assert(streamed == batch)
  }

  test("streaming gate passes exactly the events the batch AllJob gate passes") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.gateStream(events)
      .groupBy("verdict").agg(count(lit(1)).as("n"))
    runToMemory("gate", out, "complete")
    val streamed = spark.sql("SELECT sum(n) FROM gate").collect()(0).getLong(0)
    // batch equivalent: the same expressions over the same file as a batch
    // frame — gateStream is batch/stream-agnostic, so feed it t.events
    val batch = EventStreamPipeline.gateStream(t.events).count()
    assert(streamed == batch && batch > 0)
  }

  test("streaming device first-user binding matches the batch first-writer") {
    import org.apache.spark.sql.expressions.Window
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.deviceFirstUserStream(events)
    runToMemory("devstate", out.toDF(), "update")
    val got = spark.sql("SELECT appkey, did, firstCuid FROM devstate").collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.getString(2))).toMap
    // batch first-writer: row_number over (ts, event_id) per (appkey, did)
    val env = graft.operators.Envelope.attach(t.events)
      .filter(col("appkey") =!= "" && col("did") =!= "")
    val dfu = env.filter(col("cuid").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy("appkey", "did").orderBy("ts", "event_id")))
      .filter(col("rn") === 1)
      .collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("did")) ->
        r.getAs[String]("cuid")).toMap
    assert(got.keySet == env.select("appkey", "did").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet)
    dfu.foreach { case (k, cuid) =>
      assert(got(k).contains(cuid), s"device $k bound to ${got(k)}, batch says $cuid")
    }
    got.filter(_._2.isEmpty).keys.foreach(k =>
      assert(!dfu.contains(k), s"device $k missing its binding"))
  }

  test("streaming curation emits exactly the batch-gated distinct contents") {
    import graft.operators.{Dedup, TextAnalysis, TrainData}
    val docs = EventStreamPipeline.readDocuments(spark, docStreamDir)
    val out = EventStreamPipeline.curationStream(docs)
    runToMemory("cur", out, "append")
    val got = spark.sql("SELECT h FROM cur").collect().map(_.getString(0))
    assert(got.distinct.length == got.length, "a content hash emitted twice")
    // batch equivalent: identical gate expressions, distinct content hashes
    val batch = Dedup.withWords(t.documents)
      .withColumn("quality", TextAnalysis.qualityCol)
      .filter(col("quality") >= TrainData.curationMinQuality && TextAnalysis.c4KeepCol)
      .select(Dedup.normalizedMd5.as("h"))
      .distinct().collect().map(_.getString(0))
    assert(got.toSet == batch.toSet)
    assert(got.nonEmpty, "gate passed nothing on the test corpus")
  }

  test("streaming DQ chain counts agree with the batch ledger per code") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.dqChainWindowCounts(events)
    // complete mode: append would withhold windows the 1-day watermark
    // has not passed yet (the corpus's final day)
    runToMemory("dqchain", out, "complete")
    val got = spark.sql("SELECT error_code, sum(n) AS n FROM dqchain GROUP BY 1")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = graft.operators.Route.dqFullChain(t)
      .groupBy("error_code").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.size >= 4, "chain stages under-exercised on this corpus")
  }

  test("streaming deep-convert matches batch sends exactly, multi-event included") {
    import graft.operators.Adv
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val (_, uz, dz) = graft.operators.Identity.zgidAxes(t)
    val out = EventStreamPipeline.deepConvertStream(events, uz, dz).toDF()
    runToMemory("deepconv", out, "append")
    val got = spark.sql(
      "SELECT eventId, lid, eventName, zgid, convCt, clickCt FROM deepconv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    val want = Adv.deepConvert(t).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("lid"),
        r.getAs[String]("event_name"), r.getAs[String]("zgid"),
        r.getAs[Long]("conv_ct"), r.getAs[Long]("click_ct"))).toSet
    assert(want.nonEmpty, "no sends on the test corpus")
    // the multi-event link must be exercised for this to mean full parity
    val multi = Adv.adsLinkRegistry.filter(_.eventIds.size > 1).map(_.lid).toSet
    assert(want.exists(w => multi.contains(w._2)), "multi-event link never fired")
    assert(got == want)
  }

  test("streaming lid attach matches the batch ad-prop rows exactly") {
    import graft.operators.Adv
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val (_, uz, dz) = graft.operators.Identity.zgidAxes(t)
    val out = EventStreamPipeline.lidAttachStream(events, uz, dz).toDF()
    runToMemory("lidattach", out, "append")
    val got = spark.sql(
      """SELECT eventId, lid, channelType, accountId, campaignId, keywordId,
         firstLid, firstAdSource, folLid, folAdSource FROM lidattach""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getLong(6),
        r.getString(7), r.getLong(8), r.getString(9))).toSet
    val want = Adv.lidUserFirstEnd(t).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("lid"),
        r.getAs[String]("channel_type"), r.getAs[String]("account_id"),
        r.getAs[String]("campaign_id"), r.getAs[String]("keyword_id"),
        r.getAs[Long]("first_lid"), r.getAs[String]("first_ad_source"),
        r.getAs[Long]("fol_lid"), r.getAs[String]("fol_ad_source"))).toSet
    assert(want.nonEmpty, "no ad-app events on the test corpus")
    // attach must actually fire (a lid carried) for parity to mean much
    assert(want.exists(_._2 != -1L), "no event ever matched a touch")
    assert(got == want)
  }

  test("streaming zgid read side emits the batch dz bindings end-to-end") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val (_, uz, dz) = graft.operators.Identity.zgidAxes(t)
    val out = EventStreamPipeline.deviceZgidStream(events, uz)
    runToMemory("dzs", out, "update")
    val got = spark.sql("SELECT appkey, did, zgid FROM dzs").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val batch = dz.collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("did")) ->
        r.getAs[String]("d_zgid")).toMap
    assert(got.keySet == batch.keySet, "device axis mismatch")
    got.foreach { case (k, z) =>
      assert(z == batch(k), s"device $k stream=$z batch=${batch(k)}")
    }
    // at this sf no two users share an (appkey, did) — sharing needs a
    // user-id spread past 3·211 — so every device's first user is itself
    // and the axis is all device-form bindings; the point of the test is
    // the exact stream/batch agreement above, which covers both forms once
    // the corpus does
    assert(got.nonEmpty && got.values.forall(_.startsWith("z:")))
  }

  test("streaming column-index registry matches the batch first-seen ranks") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.columnIndexRegistryStream(events)
    runToMemory("cireg", out.toDF(), "update")
    val got = spark.sql("SELECT appkey, eventType, cusKey, colIndex FROM cireg").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getInt(3)).toMap
    val batch = graft.operators.Derive.eventAttrColumnIndex(t).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("event_type"),
        r.getAs[String]("cus_key")) -> r.getAs[Int]("col_index")).toMap
    assert(got.keySet == batch.keySet, "registered key sets differ")
    // indexes are dense 1..n per (appkey, event_type) and within budget
    got.groupBy { case ((a, e, _), _) => (a, e) }.values.foreach { g =>
      val idx = g.values.toSeq.sorted
      assert(idx == (1 to idx.length), s"non-dense indexes $idx")
      assert(idx.last <= graft.operators.Derive.customColumns)
    }
    // exact index agreement (single-batch replay processes in the same
    // (ts, event_id) order the batch rank uses)
    got.foreach { case (k, i) => assert(i == batch(k), s"$k: stream $i batch ${batch(k)}") }
  }

  test("streaming surrogate mint: bijection with batch maps, dense, arrival-ordered") {
    import graft.operators.Identity
    // reuse the day-sliced corpus so first-sight order crosses batches
    val ev = t.events
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mint").toString
    val days = Seq(
      ev.filter(dayofmonth(col("ts")) <= 10),
      ev.filter(dayofmonth(col("ts")) > 10 && dayofmonth(col("ts")) <= 20),
      ev.filter(dayofmonth(col("ts")) > 20))
    days.zipWithIndex.foreach { case (slice, i) =>
      slice.coalesce(1).write.parquet(s"$dir/d$i")
      val f = new java.io.File(s"$dir/d$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/d$i.parquet"))
    }
    def stream() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    for ((axis, batchMap, keyName, idName) <- Seq(
        ("did", Identity.deviceMap(t), "did", "zg_did"),
        ("cuid", Identity.userMap(t), "cuid", "zg_uid"))) {
      val out = EventStreamPipeline.surrogateIdStream(stream(), axis)
      runToMemory(s"mint_$axis", out.toDF(), "append")
      val got = spark.sql(s"SELECT appkey, key, surrogateId FROM mint_$axis")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = batchMap.collect()
        .map(r => (r.getAs[String]("appkey"), r.getAs[String](keyName)) ->
          r.getAs[Int](idName).toLong).toMap
      // bijection contract: same key set, each app's ids dense 1..n
      assert(got.keySet == batch.keySet, s"$axis key sets differ")
      got.groupBy(_._1._1).values.foreach { g =>
        val ids = g.values.toSeq.sorted
        assert(ids == (1L to ids.length), s"$axis ids not dense: ${ids.take(5)}...")
      }
      // arrival order: a key first seen in an earlier micro-batch always
      // minted a smaller id than one first seen later (per app)
      val firstSlice = graft.operators.Envelope.attach(ev)
        .filter(col("appkey") =!= "" &&
          (if (axis == "did") col("did") =!= "" else col("cuid").isNotNull))
        .groupBy(col("appkey"), col(axis).as("key"))
        .agg(min(when(dayofmonth(col("ts")) <= 10, 0)
          .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2)).as("slice"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      got.groupBy(_._1._1).foreach { case (_, g) =>
        val byId: Seq[Int] = g.toSeq.sortBy(_._2).map { case (k, _) => firstSlice(k) }
        assert(byId == byId.sorted, s"$axis mint order violates first-sight order")
      }
    }
  }

  test("streaming user-prop registry matches the batch ids and counts") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.userPropRegistryStream(events)
    runToMemory("upreg", out.toDF(), "update")
    // the registry row's latest emission carries the final running count
    val got = spark.sql(
      """SELECT * FROM (SELECT *, row_number() OVER (
           PARTITION BY appkey, propKey ORDER BY n DESC) AS rn FROM upreg)
         WHERE rn = 1""").collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("propKey")) ->
        ((r.getAs[Int]("propId"), r.getAs[Long]("n")))).toMap
    val batch = graft.operators.Derive.userPropRegistry(t).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("prop_key")) ->
        ((r.getAs[Int]("prop_id"), r.getAs[Long]("n")))).toMap
    assert(got.keySet == batch.keySet, "registered prop sets differ")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"$k: stream $v batch ${batch(k)}")
    }
    // the blacklist gate held
    assert(!got.keySet.exists(_._2 == "P6"))
  }

  test("streaming AllJob lands exactly the batch pipeline_all_job rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_alljob_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_alljob_ckpt").toString
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val q = EventStreamPipeline.allJobStream(events, sf, out, ckpt)
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "zgid", "event_name", "utm_medium").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("zgid"),
          r.getAs[String]("event_name"), r.getAs[String]("utm_medium"))).toSet
    val streamed = key(spark.read.parquet(out))
    val batch = key(graft.operators.Pipeline.allJob(t))
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size} rows")
    assert(streamed == batch)
  }

  test("watermarked dedup emits each event id exactly once") {
    // duplicate the input file so every event arrives twice
    val dir = java.nio.file.Files.createTempDirectory("graft_dup_in")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("b.parquet"))
    val events = EventStreamPipeline.readEvents(spark, dir.toString)
    val out = EventStreamPipeline.dedupStream(events).select("event_id")
    runToMemory("dedup", out, "append")
    val n = spark.sql("SELECT count(*), count(DISTINCT event_id) FROM dedup").collect()(0)
    assert(n.getLong(0) == n.getLong(1), "duplicates survived")
    assert(n.getLong(0) == t.events.count(), "events lost")
  }

  test("streaming sink writes day-partitioned parquet that reads back whole") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val q = EventStreamPipeline.sinkToParquet(events, out, ckpt)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == t.events.count(), "sink lost or duplicated rows")
    // day partitioning materialized on disk
    val dayDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("day_id="))
    assert(dayDirs.nonEmpty, "no day_id partition directories")
    // a heavy day fans out over multiple bounded files, not one writer
    val maxFiles = dayDirs.map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles > 1, s"heavy day wrote a single file")
  }

  test("session totals survive an EventTimeTimeout: reappearing users continue counting") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, epoch sec)
    val events = in.toDF()
      .select(col("_1").as("user_id"), timestamp_seconds(col("_2")).as("ts"))
    val q = EventStreamPipeline.sessionize(events).toDF()
      .writeStream.format("memory").queryName("sess_timeout").outputMode("update").start()
    val t0 = 1700000000L
    // batch 1: user 1 has a 2-event session at t0
    in.addData((1L, t0), (1L, t0 + 60))
    q.processAllAvailable()
    // batch 2: a far-future event on ANOTHER user advances the watermark
    // past user 1's lastSec + gap -> user 1's gap tracking times out
    in.addData((2L, t0 + 48 * 3600))
    q.processAllAvailable()
    // batch 3: user 1 reappears AFTER the timeout
    in.addData((1L, t0 + 48 * 3600 + 60))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT userId, nSessions, nEvents FROM sess_timeout ORDER BY nEvents")
      .collect().filter(_.getLong(0) == 1L)
    // first emission: 1 session / 2 events; after reappearance the totals
    // CONTINUE (2 sessions / 3 events), not restart at (1, 1) — and the
    // timeout itself emitted nothing (no duplicate (1, 2) row)
    assert(rows.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 2), (2, 3)), rows.mkString(","))
  }

  test("stateful sessionization matches the batch session counts") {
    val events = EventStreamPipeline.readEvents(spark, streamDir)
    val out = EventStreamPipeline.sessionize(events)
    runToMemory("sess", out.toDF(), "update")
    // last update per user = final state
    val streamed = spark.sql(
      "SELECT userId, CAST(max(nSessions) AS BIGINT) AS s, CAST(max(nEvents) AS BIGINT) AS e FROM sess GROUP BY userId")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.operators.Identity.sessionize(t)
      .groupBy("user_id")
      .agg(countDistinct("session_id").as("s"), sum("n_events").as("e"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("s"), r.getAs[Long]("e")))).toMap
    assert(streamed.keySet == batch.keySet)
    // event counts must agree exactly; session counts agree when each user's
    // events arrive in order (single file => single batch => exact match)
    streamed.foreach { case (u, (s, e)) =>
      assert(e == batch(u)._2, s"user $u events")
      assert(s == batch(u)._1, s"user $u sessions")
    }
  }

  test("streaming url frontier admits exactly the batch canonical winners") {
    import graft.operators.Dedup
    // two doc files so the first-seen gate genuinely crosses micro-batches;
    // alias pairs (i, i+200) keep their min in the earlier file, so the
    // frontier's first-seen winner IS the batch min-doc_id winner
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_urls").toString
    val halves = Seq(
      t.documents.filter(col("doc_id") < 250),
      t.documents.filter(col("doc_id") >= 250))
    halves.zipWithIndex.foreach { case (slice, i) =>
      slice.coalesce(1).write.parquet(s"$dir/h$i")
      val f = new java.io.File(s"$dir/h$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/h$i.parquet"))
    }
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.urlFrontierStream(docs)
    runToMemory("urlfrontier", out.toDF(), "update")
    val got = spark.sql("SELECT canonUrl, docId FROM urlfrontier").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Dedup.urlDedup(t).filter(col("keep")).collect()
      .map(r => r.getAs[String]("canon_url") -> r.getAs[Long]("doc_id")).toMap
    assert(got == batch, "frontier admissions differ from batch canonical winners")
    // each canonical admitted exactly once across both batches
    val n = spark.sql("SELECT count(*) FROM urlfrontier").collect()(0).getLong(0)
    assert(n == got.size)
  }

  test("streaming phash gate admits exactly the batch first-seen fingerprints") {
    import graft.operators.Multimodal
    // two doc files so the first-seen gate genuinely crosses micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_phash").toString
    val halves = Seq(
      t.documents.filter(col("doc_id") < 250),
      t.documents.filter(col("doc_id") >= 250))
    halves.zipWithIndex.foreach { case (slice, i) =>
      slice.coalesce(1).write.parquet(s"$dir/h$i")
      val f = new java.io.File(s"$dir/h$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/h$i.parquet"))
    }
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.phashFrontierStream(docs)
    runToMemory("phashfrontier", out.toDF(), "update")
    val got = spark.sql("SELECT dhash, docId FROM phashfrontier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch winners: min doc_id per exact perceptual hash
    val batch = Multimodal.phashDedup(t).collect()
      .groupBy(_.getAs[Long]("dhash"))
      .map { case (h, rs) => h -> rs.map(_.getAs[Long]("doc_id")).min }
    assert(got == batch, "phash admissions differ from batch first-seen winners")
    val n = spark.sql("SELECT count(*) FROM phashfrontier").collect()(0).getLong(0)
    assert(n == got.size)
  }

  test("per-row minhash signature equals the grouped wide signature") {
    import graft.operators.Dedup
    val k = Dedup.minhashK
    val wide = Dedup.minhashSignaturesWide(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until k).map(j => r.getAs[Long](s"mh$j")).toSeq).toMap
    val perRow = Dedup.withWords(t.documents).filter(size(col("w")) >= 3)
      .withColumn("h0s", Dedup.minhashShingleHashes)
      .select(col("doc_id"), Dedup.minhashSigArray.as("sig"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(perRow.keySet == wide.keySet)
    perRow.foreach { case (id, sig) =>
      assert(sig == wide(id), s"doc $id per-row signature drifted from wide")
    }
  }

  test("streaming minhash gate matches the batch incremental verdicts") {
    import graft.operators.Dedup
    val sig = Dedup.minhashSignaturesWide(t)
    val mx = sig.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val index = sig.filter(!Dedup.incIsDelta(col("doc_id"), lit(mx)))
    val deltaDocs = t.documents.filter(Dedup.incIsDelta(col("doc_id"), lit(mx)))
    // two doc_id-ordered files so prior-candidate state genuinely crosses
    // micro-batches (the batch "pid < doc_id" rule = arrival order here)
    val ids = deltaDocs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mh").toString
    Seq(deltaDocs.filter(col("doc_id") < cut),
        deltaDocs.filter(col("doc_id") >= cut)).zipWithIndex.foreach {
      case (slice, i) =>
        slice.coalesce(1).write.parquet(s"$dir/h$i")
        val f = new java.io.File(s"$dir/h$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/h$i.parquet"))
    }
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.minhashFrontierStream(docs, index)
    runToMemory("mhgate", out.toDF(), "append")
    val got = spark.sql(
      "SELECT docId, sigId, nIndexCandidates, nPriorCandidates, maxEst, isDup FROM mhgate")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    val batch = Dedup.minhashIncremental(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("sig_id"), r.getAs[Long]("n_index_candidates"),
          r.getAs[Long]("n_prior_candidates"), r.getAs[Double]("max_est"),
          r.getAs[Boolean]("is_dup"))).toMap
    assert(got.keySet == batch.keySet, "gate admitted a different delta doc set")
    got.foreach { case (id, v) =>
      assert(v == batch(id), s"doc $id verdict diverged: stream=$v batch=${batch(id)}")
    }
    // the delta genuinely spans both micro-batches
    assert(got.keys.exists(_ < cut) && got.keys.exists(_ >= cut))
  }

  test("minhash gate flags a near-dup pair fed in reverse id order") {
    import spark.implicits._
    import graft.operators.Dedup
    // two true near-dups; the LARGER id arrives first, so the smaller id
    // is the later arrival and must read the earlier one as its prior —
    // priority is ARRIVAL order (the HSETNX discipline), not doc_id order
    val a = (100L, "c1 c2 c3 a b c d e f g h i j k l m n o p q")
    val b = (101L, "c1 c2 c3 a b c d e f g h i j k l m n o p r")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_rev").toString
    Seq(Seq(b), Seq(a)).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/h$i")
      val f = new java.io.File(s"$dir/h$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/h$i.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val emptyIndex = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType) +:
        (0 until Dedup.minhashK).map(j =>
          org.apache.spark.sql.types.StructField(s"mh$j",
            org.apache.spark.sql.types.LongType))))
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.minhashFrontierStream(docs, emptyIndex)
    runToMemory("mhrev", out.toDF(), "append")
    val rows = spark.sql("SELECT docId, nPriorCandidates, isDup FROM mhrev")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.keySet == Set(100L, 101L))
    // 101 arrived first into an empty index: clean
    assert(rows(101L) == ((0L, false)))
    // 100 arrived second: 101 is its prior and the pair is flagged
    assert(rows(100L)._1 == 1L, s"late smaller id lost its prior: $rows")
    assert(rows(100L)._2, s"near-dup pair slipped through unflagged: $rows")
  }

  test("minhash gate state survives a checkpointed stop/restart") {
    import graft.operators.Dedup
    // same split as the in-session test, but the second file lands while
    // the query is DOWN: the restart must recover the band-key state from
    // the checkpoint, or batch-1 admissions would stop being priors
    val sig = Dedup.minhashSignaturesWide(t)
    val mx = sig.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val index = sig.filter(!Dedup.incIsDelta(col("doc_id"), lit(mx)))
    val deltaDocs = t.documents.filter(Dedup.incIsDelta(col("doc_id"), lit(mx)))
    val ids = deltaDocs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mh_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_mh_ckpt_out").toString
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val docs = spark.readStream.schema(t.documents.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline.minhashFrontierStream(docs, index)
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(deltaDocs.filter(col("doc_id") < cut), "h0")
    runOnce()
    land(deltaDocs.filter(col("doc_id") >= cut), "h1")
    runOnce()
    val got = spark.read.parquet(outDir)
      .collect()
      .map(r => r.getAs[Long]("docId") ->
        (r.getAs[String]("sigId"), r.getAs[Long]("nIndexCandidates"),
          r.getAs[Long]("nPriorCandidates"), r.getAs[Double]("maxEst"),
          r.getAs[Boolean]("isDup"))).toMap
    val batch = Dedup.minhashIncremental(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("sig_id"), r.getAs[Long]("n_index_candidates"),
          r.getAs[Long]("n_prior_candidates"), r.getAs[Double]("max_est"),
          r.getAs[Boolean]("is_dup"))).toMap
    assert(got.keySet == batch.keySet, "restart lost or duplicated admissions")
    got.foreach { case (id, v) =>
      assert(v == batch(id), s"doc $id verdict diverged after restart: $v vs ${batch(id)}")
    }
    assert(got.keys.exists(_ >= cut), "post-restart batch produced nothing")
  }

  test("minhash gate with the state TTL knob set gates identically") {
    // the long-lived-gate deployment: spark.graft.frontierStateTtlMs arms
    // ProcessingTimeTimeout on both keyed stages. With a TTL far beyond
    // the run, nothing may expire mid-delta — verdicts must be bit-equal
    // to the NoTimeout path (the knob changes retention, not semantics).
    import graft.operators.Dedup
    val sig = Dedup.minhashSignaturesWide(t)
    val mx = sig.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val index = sig.filter(!Dedup.incIsDelta(col("doc_id"), lit(mx)))
    val deltaDocs = t.documents.filter(Dedup.incIsDelta(col("doc_id"), lit(mx)))
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_ttl").toString
    deltaDocs.coalesce(1).write.parquet(s"$dir/h0")
    val docs = spark.readStream.schema(t.documents.schema)
      .parquet(s"$dir/h0")
    spark.conf.set(EventStreamPipeline.FrontierTtlKey, (24L * 3600 * 1000).toString)
    try {
      val out = EventStreamPipeline.minhashFrontierStream(docs, index)
      // AvailableNow, not processAllAvailable: with ProcessingTimeTimeout
      // armed the default trigger keeps scheduling empty timeout-check
      // batches and the query never idles; AvailableNow drains the data
      // and STOPS (exactly the bounded daily-delta run the TTL targets)
      val q = out.toDF().writeStream.format("memory").queryName("mhttl")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.stop()
      val got = spark.sql("SELECT docId, maxEst, isDup FROM mhttl").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
      val batch = Dedup.minhashIncremental(t).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("max_est"), r.getAs[Boolean]("is_dup"))).toMap
      assert(got.keySet == batch.keySet, "TTL path admitted a different doc set")
      got.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id verdict diverged under TTL: $v vs ${batch(id)}")
      }
    } finally spark.conf.unset(EventStreamPipeline.FrontierTtlKey)
  }

  test("streaming ann serving over the stored index equals batch ivf-pq") {
    import graft.operators.Sim
    // build + persist the index once (the nightly job)
    val idx = java.nio.file.Files.createTempDirectory("graft_serve_idx").toString
    Sim.writeVectorIndex(t, idx)
    val stored = spark.read.parquet(idx)
    // the nightly model as literals: coarse centroids + global codebook
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = base.filter(col("vec_id") < math.max(Sim.nCentroids, Sim.pqK))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = (0 until Sim.nCentroids).map(k => byId(k.toLong))
    val book = (0 until Sim.pqK).map(k => byId(k.toLong))
    // the query stream: two files so serving spans micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_serve_q").toString
    val qs = base.filter(col("vec_id") < Sim.nQueries)
      .select(col("vec_id").as("query_id"), col("v"))
    Seq(qs.filter(col("query_id") < 5), qs.filter(col("query_id") >= 5))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.coalesce(1).write.parquet(s"$dir/h$i")
        val f = new java.io.File(s"$dir/h$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/h$i.parquet"))
      }
    val queries = spark.readStream.schema(qs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.adcServeStream(queries, stored, cents, book)
    runToMemory("annserve", out.toDF(), "append")
    val got = spark.sql("SELECT queryId, neighborId, rank, adcDist FROM annserve")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    val batch = Sim.ivfPqTopK(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toMap
    assert(got.keySet == batch.keySet,
      s"serving rank set differs: ${got.keySet.size} vs ${batch.keySet.size}")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"query/rank $k diverged: stream=$v batch=${batch(k)}")
    }
  }

  test("streaming bm25 serving over the persisted postings equals batch") {
    import graft.operators.TrainData
    // the nightly lexical index: postings with df attached, plus scalars
    val postings = TrainData.bm25PostingsWithDf(t.documents).persist()
    val Array(nDocs, sumDl) = graft.operators.Dedup.withWords(t.documents)
      .agg(count(lit(1)), sum(size(col("w")))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // the query stream: two files so serving spans micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_q").toString
    val qdocs = t.documents.filter(col("doc_id") < TrainData.bm25NQueries)
    Seq(qdocs.filter(col("doc_id") < 2), qdocs.filter(col("doc_id") >= 2))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.coalesce(1).write.parquet(s"$dir/h$i")
        val f = new java.io.File(s"$dir/h$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/h$i.parquet"))
      }
    val queries = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline.bm25ServeStream(queries, postings, nDocs, sumDl)
    runToMemory("bm25serve", out.toDF(), "append")
    postings.unpersist()
    val got = spark.sql("SELECT queryId, rank, docId, nTerms, scoreQ6 FROM bm25serve")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = TrainData.bm25TopKDocs(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("score_q6"))).toMap
    assert(got.keySet == batch.keySet,
      s"serving rank set differs: ${got.keySet.size} vs ${batch.keySet.size}")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"query/rank $k diverged: stream=$v batch=${batch(k)}")
    }
  }

  test("streaming index ingestion writes the batch stored index row for row") {
    import graft.operators.Sim
    // the nightly model as literals (the adcServe convention)
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = base.filter(col("vec_id") < math.max(Sim.nCentroids, Sim.pqK))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = (0 until Sim.nCentroids).map(k => byId(k.toLong))
    val book = (0 until Sim.pqK).map(k => byId(k.toLong))
    // the vector stream: two files so ingestion spans micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_in").toString
    val mid = base.agg(max(col("vec_id"))).head.getLong(0) / 2
    Seq(base.filter(col("vec_id") <= mid), base.filter(col("vec_id") > mid))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.coalesce(1).write.parquet(s"$dir/h$i")
        val f = new java.io.File(s"$dir/h$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/h$i.parquet"))
      }
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val vectors = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStreamPipeline.indexIngestStream(vectors, cents, book)
      .writeStream.format("parquet").partitionBy("cluster")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("vec_id") ->
        ((0 until Sim.pqM).map(j => r.getAs[Long](s"code$j")),
          r.getAs[Number]("cluster").longValue)
    val got = spark.read.parquet(outDir).collect().map(key).toMap
    val bdir = java.nio.file.Files.createTempDirectory("graft_ingest_batch").toString
    Sim.writeVectorIndex(t, bdir)
    val batch = spark.read.parquet(bdir).collect().map(key).toMap
    assert(got.size == batch.size, s"row count ${got.size} vs ${batch.size}")
    assert(got == batch, "streamed codes/clusters diverged from the batch index")
    // the layout is the index layout: one directory per inverted list
    val parts = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts == new java.io.File(bdir).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet,
      s"partition layout diverged: $parts")
  }

  test("index ingestion survives a checkpointed restart without loss or dupes") {
    import graft.operators.Sim
    // half the vectors land, the ingest query DIES, the rest land while
    // it is down: the recovered query must append exactly the missing
    // rows (the parquet sink's manifest + file-source offsets = effective
    // exactly-once), leaving the stored index bit-equal to batch
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = base.filter(col("vec_id") < math.max(Sim.nCentroids, Sim.pqK))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = (0 until Sim.nCentroids).map(k => byId(k.toLong))
    val book = (0 until Sim.pqK).map(k => byId(k.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt2").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt_out").toString
    val mid = base.agg(max(col("vec_id"))).head.getLong(0) / 2
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val vectors = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline.indexIngestStream(vectors, cents, book)
        .writeStream.format("parquet").partitionBy("cluster")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(base.filter(col("vec_id") <= mid), "h0")
    runOnce()
    land(base.filter(col("vec_id") > mid), "h1")
    runOnce()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("vec_id") ->
        ((0 until Sim.pqM).map(j => r.getAs[Long](s"code$j")),
          r.getAs[Number]("cluster").longValue)
    val gotRows = spark.read.parquet(outDir).collect()
    val got = gotRows.map(key).toMap
    assert(gotRows.length == got.size,
      "the restart appended duplicate code rows")
    val bdir = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt_b").toString
    Sim.writeVectorIndex(t, bdir)
    val batch = spark.read.parquet(bdir).collect().map(key).toMap
    assert(got == batch,
      "post-restart stored index diverged from the batch build")
  }

  test("streaming lexical ingestion writes the upsert's delta postings row for row") {
    import graft.operators.TrainData
    // the day's delta, exactly as the daily upsert defines it
    val maxId = t.documents.agg(max(col("doc_id"))).head.getLong(0)
    val isDelta = col("doc_id") * 5 > lit(maxId) * 4
    val dir = java.nio.file.Files.createTempDirectory("graft_tingest_in").toString
    t.documents.filter(isDelta).coalesce(1).write.parquet(s"$dir/h0")
    val outDir = java.nio.file.Files.createTempDirectory("graft_tingest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tingest_ckpt").toString
    val docs = spark.readStream.schema(t.documents.schema).parquet(s"$dir/h0")
    val q = EventStreamPipeline.textIngestStream(docs)
      .writeStream.format("parquet").partitionBy("bucket")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Int]("dl"), r.getAs[Long]("tf"),
          r.getAs[Number]("bucket").longValue)
    val gotRows = spark.read.parquet(outDir).collect()
    // df is the honest NULL the upsert contract demands — nothing a
    // reader could mistake for a valid document frequency
    gotRows.foreach(r => assert(r.isNullAt(r.fieldIndex("df")),
      "streamed posting carries a df value"))
    val got = gotRows.map(key).toMap
    assert(gotRows.length == got.size, "duplicate streamed postings")
    // the batch twin: the delta portion of the upserted stored index
    val base = java.nio.file.Files.createTempDirectory("graft_tingest_b")
      .toString + "/idx"
    TrainData.textIndexUpsert(t, Some(base))
    val batch = spark.read.parquet(base).filter(isDelta).collect().map(key).toMap
    assert(got.nonEmpty && got == batch,
      "streamed postings diverged from the batch upsert's delta")
    // same storage layout: a term probe prunes to the same bucket dirs
    val parts = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    val wantParts = batch.values.map(_._3).toSet.map((b: Long) => s"bucket=$b")
    assert(parts == wantParts, s"partition layout diverged: $parts vs $wantParts")
  }

  test("lexical ingestion survives a checkpointed restart without loss or dupes") {
    import graft.operators.TrainData
    // half the delta lands, the ingest query DIES, the rest lands while it
    // is down: the recovered query must append exactly the missing
    // postings (file-source offsets + sink manifest = effective
    // exactly-once), leaving the stored delta bit-equal to the batch
    // upsert's delta portion
    val maxId = t.documents.agg(max(col("doc_id"))).head.getLong(0)
    val isDelta = col("doc_id") * 5 > lit(maxId) * 4
    val delta = t.documents.filter(isDelta)
    val dir = java.nio.file.Files.createTempDirectory("graft_tingest_r_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_tingest_r_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tingest_r_ck").toString
    val mid = (maxId * 4 / 5 + maxId) / 2
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val docs = spark.readStream.schema(t.documents.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline.textIngestStream(docs)
        .writeStream.format("parquet").partitionBy("bucket")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(delta.filter(col("doc_id") <= mid), "h0")
    runOnce()
    land(delta.filter(col("doc_id") > mid), "h1")
    runOnce()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Int]("dl"), r.getAs[Long]("tf"),
          r.getAs[Number]("bucket").longValue)
    val gotRows = spark.read.parquet(outDir).collect()
    val got = gotRows.map(key).toMap
    assert(gotRows.length == got.size, "the restart appended duplicate postings")
    val base = java.nio.file.Files.createTempDirectory("graft_tingest_r_b")
      .toString + "/idx"
    TrainData.textIndexUpsert(t, Some(base))
    val batch = spark.read.parquet(base).filter(isDelta).collect().map(key).toMap
    assert(got.nonEmpty && got == batch,
      "post-restart stored postings diverged from the batch upsert's delta")
  }

  test("bm25 serving over the PERSISTED index equals the in-plan postings") {
    import graft.operators.TrainData
    // the full production path: sink_text_index writes the bucketed index,
    // the server reads the DIRECTORY back — a serve verdict from stored
    // files must equal one from the in-plan postings build (stored ==
    // computed on the lexical serve path, the pqAdcTopKStored discipline)
    val idx = java.nio.file.Files.createTempDirectory("graft_tindex_serve").toString
    TrainData.textIndexSink(t, Some(idx))
    val stored = spark.read.parquet(idx).persist()
    val Array(nDocs, sumDl) = graft.operators.Dedup.withWords(t.documents)
      .agg(count(lit(1)), sum(size(col("w")))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("graft_tindex_serve_q").toString
    t.documents.filter(col("doc_id") < TrainData.bm25NQueries)
      .coalesce(1).write.parquet(s"$dir/h0")
    val queries = spark.readStream.schema(t.documents.schema).parquet(s"$dir/h0")
    val out = EventStreamPipeline.bm25ServeStream(queries, stored, nDocs, sumDl)
    runToMemory("bm25stored", out.toDF(), "append")
    stored.unpersist()
    val got = spark.sql("SELECT queryId, rank, docId, scoreQ6 FROM bm25stored")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val batch = TrainData.bm25TopKDocs(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_q6"))).toMap
    assert(got == batch, "serving from the stored index diverged from batch")
  }

  test("bm25 serving live from a DAY-OLD upserted index with refreshed df") {
    import graft.operators.TrainData
    // the mid-day LIVE contract (the batch text_bm25_stored_fresh story
    // on the serve stream): the index is upserted — appended delta, every
    // stored df stale or NULL — and the serving tier refreshes df with
    // ONE static-side groupBy over the stored postings (caller-owned,
    // persisted once) and reads corpus scalars as the sidecar SUM; the
    // stream itself is unchanged bm25ServeStream. Verdicts must equal the
    // in-plan batch truth, which uses the TRUE corpus df — possible only
    // if no stale stored df leaked into serving.
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_fresh_idx")
      .toString + "/idx"
    TrainData.textIndexUpsert(t, Some(idx))
    val stored = spark.read.parquet(idx)
    val freshPostings = stored.drop("df")
      .join(stored.groupBy("term").agg(count(lit(1)).as("df")), "term")
      .persist()
    val Array(nDocs, sumDl) = spark.read.parquet(s"${idx}__scalars")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_fresh_q").toString
    t.documents.filter(col("doc_id") < TrainData.bm25NQueries)
      .coalesce(1).write.parquet(s"$dir/h0")
    val queries = spark.readStream.schema(t.documents.schema).parquet(s"$dir/h0")
    val out = EventStreamPipeline.bm25ServeStream(queries, freshPostings, nDocs, sumDl)
    runToMemory("bm25fresh", out.toDF(), "append")
    freshPostings.unpersist()
    val got = spark.sql("SELECT queryId, rank, docId, nTerms, scoreQ6 FROM bm25fresh")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = TrainData.bm25TopKDocs(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("score_q6"))).toMap
    assert(got.nonEmpty && got == batch,
      "mid-day live serving diverged from the in-plan truth")
  }

  test("bm25 serving survives a checkpointed restart and rejects re-delivery") {
    import graft.operators.TrainData
    // the second half of the query stream lands while the query is DOWN,
    // and a COPY of the first half lands after the restart: the recovered
    // Seen state must keep batch-1's verdicts from re-emitting (exactly
    // once per query) while the new arrivals serve normally
    val postings = TrainData.bm25PostingsWithDf(t.documents).persist()
    val Array(nDocs, sumDl) = graft.operators.Dedup.withWords(t.documents)
      .agg(count(lit(1)), sum(size(col("w")))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_bm25_ckpt_out").toString
    val qdocs = t.documents.filter(col("doc_id") < TrainData.bm25NQueries)
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val queries = spark.readStream.schema(t.documents.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline
        .bm25ServeStream(queries, postings, nDocs, sumDl)
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(qdocs.filter(col("doc_id") < 2), "h0")
    runOnce()
    land(qdocs.filter(col("doc_id") >= 2), "h1")
    land(qdocs.filter(col("doc_id") < 2), "h0again") // re-delivery
    runOnce()
    postings.unpersist()
    val gotRows = spark.read.parquet(outDir).collect()
    val got = gotRows.map(r => (r.getAs[Long]("queryId"), r.getAs[Int]("rank")) ->
      (r.getAs[Long]("docId"), r.getAs[Long]("scoreQ6"))).toMap
    assert(gotRows.length == got.size,
      "re-delivered queries emitted duplicate verdicts across the restart")
    val batch = TrainData.bm25TopKDocs(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_q6"))).toMap
    assert(got.keySet == batch.keySet, "restart lost or duplicated servings")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"query/rank $k diverged after restart: $v vs ${batch(k)}")
    }
    assert(got.keys.exists(_._1 >= 2), "post-restart batch produced nothing")
  }

  /** Both persisted artifacts + the model literals for the hybrid serve
    * specs: the bucketed lexical index (read back from sink_text_index's
    * directory), the PQ code table (read back from writeVectorIndex's),
    * the corpus scalars, and the centroid/codebook literals.
    */
  private def hybridServeFixture() = {
    import graft.operators.{Sim, TrainData}
    val tIdx = java.nio.file.Files.createTempDirectory("graft_hybrid_tidx").toString
    TrainData.textIndexSink(t, Some(tIdx))
    val postings = spark.read.parquet(tIdx).persist()
    val vIdx = java.nio.file.Files.createTempDirectory("graft_hybrid_vidx").toString
    Sim.writeVectorIndex(t, vIdx)
    val codes = spark.read.parquet(vIdx).persist()
    val Array(nDocs, sumDl) = graft.operators.Dedup.withWords(t.documents)
      .agg(count(lit(1)), sum(size(col("w")))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = base.filter(col("vec_id") < math.max(Sim.nCentroids, Sim.pqK))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = (0 until Sim.nCentroids).map(k => byId(k.toLong))
    val book = (0 until Sim.pqK).map(k => byId(k.toLong))
    // a hybrid query carries BOTH faces of the doc: text + embedding
    val qdocs = t.documents.filter(col("doc_id") < TrainData.bm25NQueries)
      .select(col("doc_id"), col("text"))
      .join(base.withColumnRenamed("vec_id", "doc_id"), "doc_id")
    (postings, codes, cents, book, nDocs, sumDl, qdocs)
  }

  private def hybridBatchTruth() =
    graft.operators.TrainData.hybridRrfStored(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"),
          Option(r.getAs[java.lang.Long]("lex_rank")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("vec_rank")).map(_.longValue),
          r.getAs[Long]("rrf_q6"))).toMap

  test("streaming hybrid serving fuses both persisted legs exactly like batch") {
    // the serve leg vs the STORED batch face (retrieval_hybrid_rrf_stored):
    // lexical from the bucketed postings directory, vector = the IVF∘ADC
    // probe of the stored code table — raw floats never enter the path
    val (postings, codes, cents, book, nDocs, sumDl, qdocs) = hybridServeFixture()
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_q").toString
    Seq(qdocs.filter(col("doc_id") < 2), qdocs.filter(col("doc_id") >= 2))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.coalesce(1).write.parquet(s"$dir/h$i")
        val f = new java.io.File(s"$dir/h$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/h$i.parquet"))
      }
    val queries = spark.readStream.schema(qdocs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreamPipeline
      .hybridServeStream(queries, postings, codes, cents, book, nDocs, sumDl)
    runToMemory("hybridserve", out.toDF(), "append")
    val got = spark
      .sql("SELECT queryId, rank, docId, lexRank, vecRank, rrfQ6 FROM hybridserve")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), Option(r.getAs[java.lang.Long]("lexRank")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("vecRank")).map(_.longValue),
          r.getLong(5))).toMap
    val batch = hybridBatchTruth()
    postings.unpersist(); codes.unpersist()
    assert(got.keySet == batch.keySet,
      s"serving rank set differs: ${got.keySet.size} vs ${batch.keySet.size}")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"query/rank $k diverged: stream=$v batch=${batch(k)}")
    }
  }

  test("hybrid serving survives a checkpointed restart and rejects re-delivery") {
    // the bm25ServeStream restart discipline on the fused face: half the
    // queries land, the stream dies, the rest land PLUS a re-delivered
    // copy of the first half — recovered Seen state must keep batch-1
    // verdicts from re-emitting while new arrivals fuse normally
    val (postings, codes, cents, book, nDocs, sumDl, qdocs) = hybridServeFixture()
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hybrid_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_hybrid_ckpt_out").toString
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val queries = spark.readStream.schema(qdocs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline
        .hybridServeStream(queries, postings, codes, cents, book, nDocs, sumDl)
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(qdocs.filter(col("doc_id") < 2), "h0")
    runOnce()
    land(qdocs.filter(col("doc_id") >= 2), "h1")
    land(qdocs.filter(col("doc_id") < 2), "h0again") // re-delivery
    runOnce()
    val gotRows = spark.read.parquet(outDir).collect()
    val got = gotRows.map(r => (r.getAs[Long]("queryId"), r.getAs[Int]("rank")) ->
      (r.getAs[Long]("docId"),
        Option(r.getAs[java.lang.Long]("lexRank")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("vecRank")).map(_.longValue),
        r.getAs[Long]("rrfQ6"))).toMap
    assert(gotRows.length == got.size,
      "re-delivered queries emitted duplicate verdicts across the restart")
    val batch = hybridBatchTruth()
    postings.unpersist(); codes.unpersist()
    assert(got.keySet == batch.keySet, "restart lost or duplicated servings")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"query/rank $k diverged after restart: $v vs ${batch(k)}")
    }
    assert(got.keys.exists(_._1 >= 2), "post-restart batch produced nothing")
  }

  test("streaming packer reproduces the batch bins across micro-batches") {
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(docStreamDir)
    val out = EventStreamPipeline.packStream(docs)
    runToMemory("packstream", out.toDF(), "append")
    val got = spark.sql("SELECT docId, shard, tok, bin FROM packstream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val batch = graft.operators.TrainData.packSequences(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("tok"), r.getAs[Long]("bin"))).toMap
    assert(got == batch, "streaming pack assignment diverged from batch")
  }

  test("streaming mix gate admits exactly the batch domain mix") {
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(docStreamDir)
    val out = EventStreamPipeline.mixDomainsStream(docs)
    runToMemory("mixgate", out, "append")
    val got = spark.sql("SELECT doc_id, source, weight FROM mixgate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = graft.operators.TrainData.mixDomains(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Double]("weight"))).toSet
    assert(got == batch, "live mix admissions diverged from the batch mix")
  }

  test("streaming dataset card converges to the batch corpus stats exactly") {
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(docStreamDir)
    val out = EventStreamPipeline.corpusStatsStream(docs)
    runToMemory("corpuscard", out, "complete")
    val got = spark.sql(
      "SELECT * FROM corpuscard ORDER BY source, lang").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Double]("mean_tokens"), r.getAs[Double]("short_frac"))).toSeq
    val batch = graft.operators.TrainData.corpusStats(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Double]("mean_tokens"), r.getAs[Double]("short_frac"))).toSeq
    assert(got == batch, "live card diverged from the batch card")
  }

  test("streaming dsir gate scores the stream like the batch operator") {
    import graft.operators.TrainData
    val lr = TrainData.dsirBucketLogRatios(t)
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(docStreamDir)
    val out = EventStreamPipeline.dsirGateStream(docs, lr)
    runToMemory("dsirgate", out, "append")
    val got = spark.sql("SELECT doc_id, n_feats, log_weight, selected FROM dsirgate")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight"),
          r.getAs[Boolean]("selected"))).toMap
    val batch = TrainData.dsirImportance(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight"),
          r.getAs[Boolean]("selected"))).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (id, (nf, lw, sel)) =>
      val (bnf, blw, bsel) = batch(id)
      assert(nf == bnf, s"doc $id feature count drifted")
      // the stream folds features in-row, the batch sums an exploded
      // shuffle — identical up to accumulation order, so the 2dp floors
      // may straddle a boundary by at most one step
      assert(math.abs(lw - blw) <= 0.011, s"doc $id weight drifted: $lw vs $blw")
      if (math.abs(blw) > 0.011)
        assert(sel == bsel, s"doc $id selection flipped away from a boundary")
    }
  }

  test("streaming archive router equals the batch 5-way archive output") {
    import graft.operators.Identity
    // day-sliced event files so first-seen gating and the latest-wins
    // contest genuinely cross micro-batches (maxFilesPerTrigger=1)
    val ev = t.events
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_arch").toString
    val days = Seq(
      ev.filter(dayofmonth(col("ts")) <= 10),
      ev.filter(dayofmonth(col("ts")) > 10 && dayofmonth(col("ts")) <= 20),
      ev.filter(dayofmonth(col("ts")) > 20))
    days.zipWithIndex.foreach { case (slice, i) =>
      slice.coalesce(1).write.parquet(s"$dir/d$i")
      val f = new java.io.File(s"$dir/d$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/d$i.parquet"))
    }
    val events = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val (_, uz, dz) = Identity.zgidAxes(t)
    val out = EventStreamPipeline.archiveRouteStream(
      events, Identity.deviceMap(t), Identity.userMap(t), uz, dz)
    runToMemory("archroute", out.toDF(), "append")
    // latest emission per (type, app, key) = the mapping table's row
    val got = spark.sql(
      """SELECT * FROM (SELECT *, row_number() OVER (
           PARTITION BY archiveType, appId, mapKey ORDER BY seq DESC) AS rn
         FROM archroute) WHERE rn = 1""")
      .collect().map(r => (r.getAs[Int]("archiveType"), r.getAs[String]("typeName"),
        r.getAs[Int]("appId"), r.getAs[String]("mapKey")) -> r.getAs[String]("mapValue"))
      .toMap
    val batch = Identity.archiveRoute(t).collect()
      .map(r => (r.getAs[Int]("archive_type"), r.getAs[String]("type_name"),
        r.getAs[Int]("app_id"), r.getAs[String]("map_key")) ->
        r.getAs[String]("map_value")).toMap
    assert(got.keySet == batch.keySet, "routed key sets differ")
    got.foreach { case (k, v) =>
      assert(v == batch(k), s"$k stream=$v batch=${batch(k)}")
    }
    // all five tables route something on this corpus
    assert(got.keySet.map(_._1) == Set(1, 2, 3, 4, 5))
    // the HSETNX gate held across micro-batches: single-valued maps
    // (types 1-4) never re-emitted even though their keys recur in later
    // batches
    val reEmits = spark.sql(
      "SELECT max(seq) FROM archroute WHERE archiveType < 5").collect()(0).getLong(0)
    assert(reEmits == 1L, s"a single-valued mapping emitted $reEmits updates")
  }

  test("surrogate mint state survives a checkpointed stop/restart") {
    import graft.operators.Identity
    // the INCR counter discipline: a restart between deltas must neither
    // renumber already-minted keys nor re-mint them, and the counter must
    // continue where it stopped — the later file lands while the query is
    // DOWN, so recovery genuinely reads the checkpointed keyed state
    val ev = t.events
    val dir = java.nio.file.Files.createTempDirectory("graft_mint_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mint_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_mint_ckpt_out").toString
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def runOnce(): Unit = {
      val events = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline.surrogateIdStream(events, "did")
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(ev.filter(dayofmonth(col("ts")) <= 15), "d0")
    runOnce()
    val afterFirst = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("key")) ->
        r.getAs[Long]("surrogateId")).toMap
    land(ev.filter(dayofmonth(col("ts")) > 15), "d1")
    runOnce()
    val all = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("key"), r.getAs[Long]("surrogateId")))
    // no key minted twice across the restart (the HSETNX/state guarantee)
    assert(all.map(t3 => (t3._1, t3._2)).distinct.length == all.length,
      "a key was re-minted after restart")
    val got = all.map(t3 => (t3._1, t3._2) -> t3._3).toMap
    // pre-restart assignments unchanged — a restart must not renumber
    afterFirst.foreach { case (k, id) =>
      assert(got(k) == id, s"restart renumbered $k: ${got(k)} != $id")
    }
    // counter continuity: per app, ids are dense 1..n across both runs,
    // and every post-restart mint continues above the pre-restart max
    got.groupBy(_._1._1).foreach { case (app, g) =>
      val ids = g.values.toSeq.sorted
      assert(ids == (1L to ids.length), s"$app ids not dense after restart")
      val pre = afterFirst.collect { case ((a, _), id) if a == app => id }
      val post = g.collect { case ((a, k), id) if !afterFirst.contains((a, k)) => id }
      if (pre.nonEmpty && post.nonEmpty)
        assert(post.min > pre.max, s"$app counter restarted: ${post.min} <= ${pre.max}")
    }
    // same key set + bijection shape as the batch map (whole-corpus truth)
    val batch = Identity.deviceMap(t).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("did"))).toSet
    assert(got.keySet == batch, "restart lost or invented keys vs batch")
  }

  test("archive router state survives a checkpointed stop/restart") {
    import graft.operators.Identity
    val ev = t.events
    val dir = java.nio.file.Files.createTempDirectory("graft_arch_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_arch_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_arch_ckpt_out").toString
    def land(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      slice.coalesce(1).write.parquet(s"$dir/$name")
      val f = new java.io.File(s"$dir/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    val (_, uz, dz) = Identity.zgidAxes(t)
    def runOnce(): Unit = {
      val events = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = EventStreamPipeline.archiveRouteStream(
          events, Identity.deviceMap(t), Identity.userMap(t), uz, dz)
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    land(ev.filter(dayofmonth(col("ts")) <= 15), "d0")
    runOnce()
    land(ev.filter(dayofmonth(col("ts")) > 15), "d1")
    runOnce()
    val arch = spark.read.parquet(outDir)
    // final latest-wins table == the batch 5-way archive (the same compare
    // as the in-session spec, now across a restart boundary)
    arch.createOrReplaceTempView("archckpt")
    val got = spark.sql(
      """SELECT * FROM (SELECT *, row_number() OVER (
           PARTITION BY archiveType, appId, mapKey ORDER BY seq DESC) AS rn
         FROM archckpt) WHERE rn = 1""")
      .collect().map(r => (r.getAs[Int]("archiveType"), r.getAs[String]("typeName"),
        r.getAs[Int]("appId"), r.getAs[String]("mapKey")) -> r.getAs[String]("mapValue"))
      .toMap
    val batch = Identity.archiveRoute(t).collect()
      .map(r => (r.getAs[Int]("archive_type"), r.getAs[String]("type_name"),
        r.getAs[Int]("app_id"), r.getAs[String]("map_key")) ->
        r.getAs[String]("map_value")).toMap
    assert(got.keySet == batch.keySet, "restart diverged the routed key set")
    got.foreach { case (k, v) => assert(v == batch(k), s"$k stream=$v batch=${batch(k)}") }
    // the HSETNX gate held ACROSS the restart: single-valued mappings
    // whose keys recur after recovery still emitted exactly once
    val reEmits = spark.sql(
      "SELECT max(seq) FROM archckpt WHERE archiveType < 5").collect()(0).getLong(0)
    assert(reEmits == 1L, s"a single-valued mapping emitted $reEmits updates across restart")
  }

  test("streaming profile maintenance equals the batch detail aggregate") {
    import graft.operators.{Dw, Route}
    // the profile maintainer tails the fact table: stage the batch
    // event_attr rows as THREE increment files so the keyed state genuinely
    // merges partials across micro-batches (maxFilesPerTrigger=1)
    val ea = Route.routeEventAttr(t)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ea").toString
    val (d1, d2) = Dw.incBoundaries
    Seq(
      ea.filter(col("day_id") < d1),
      ea.filter(col("day_id") >= d1 && col("day_id") < d2),
      ea.filter(col("day_id") >= d2)
    ).zipWithIndex.foreach { case (slice, i) =>
      slice.coalesce(1).write.parquet(s"$dir/inc$i")
      val f = new java.io.File(s"$dir/inc$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/inc$i.parquet"))
    }
    val stream = spark.readStream.schema(ea.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    runToMemory("udprof", EventStreamPipeline.userDetailStream(stream).toDF(), "update")
    // latest emission per key = the final profile row
    val latest = spark.sql(
      """SELECT * FROM (SELECT *, row_number() OVER (
           PARTITION BY zg_id ORDER BY upd_seq DESC) AS rn FROM udprof)
         WHERE rn = 1""").drop("rn", "upd_seq")
    val batch = Dw.detailAgg(t).drop("appkey")
    assert(latest.columns.sorted.sameElements(batch.columns.sorted))
    val a = latest.select(batch.columns.map(col): _*)
    assert(a.count() == batch.count())
    assert(a.exceptAll(batch).isEmpty && batch.exceptAll(a).isEmpty,
      "streaming profile state diverged from the batch aggregate")
    // multiple micro-batches actually happened: some user got 2+ updates
    assert(spark.sql("SELECT max(upd_seq) FROM udprof").collect()(0).getLong(0) >= 2L,
      "no user was updated across micro-batches — merge untested")
  }

  /** Stage `df` as one single-parquet-file `name.parquet` under `dir`, so
    * maxFilesPerTrigger=1 makes it exactly one micro-batch.
    */
  private def landFile(df: org.apache.spark.sql.DataFrame, dir: String,
      name: String): Unit = {
    df.coalesce(1).write.parquet(s"$dir/$name")
    val f = new java.io.File(s"$dir/$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  private def parquetFilesUnder(root: String): Array[java.io.File] = {
    def rec(f: java.io.File): Array[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).flatMap(rec)
      else if (f.getName.endsWith(".parquet") ||
        f.getName.startsWith("part-")) Array(f)
      else Array.empty
    rec(new java.io.File(root))
  }

  test("maintained vector ingestion bounds files per list, stays batch-equal, " +
      "and survives re-delivery + an interrupted swap") {
    import graft.operators.Sim
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = base.filter(col("vec_id") < math.max(Sim.nCentroids, Sim.pqK))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = (0 until Sim.nCentroids).map(k => byId(k.toLong))
    val book = (0 until Sim.pqK).map(k => byId(k.toLong))
    val inDir = java.nio.file.Files.createTempDirectory("graft_vmaint_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_vmaint_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vmaint_ck").toString
    // 8 slices -> 8 micro-batches; consolidateAfter=3 forces ≥1 fold
    val nSlices = 8
    (0 until nSlices).foreach(i =>
      landFile(base.filter(pmod(col("vec_id"), lit(nSlices)) === i), inDir, s"s$i"))
    def runOnce(): Unit = {
      val vectors = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = EventStreamPipeline.indexIngestMaintainSink(
        vectors, cents, book, outDir, ckpt, consolidateAfter = 3)
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("vec_id") ->
        ((0 until Sim.pqM).map(j => r.getAs[Long](s"code$j")),
          r.getAs[Number]("cluster").longValue)
    val bdir = java.nio.file.Files.createTempDirectory("graft_vmaint_b").toString
    Sim.writeVectorIndex(t, bdir)
    val batch = spark.read.parquet(bdir).collect().map(key).toMap
    def gotRows() = EventStreamPipeline.storedVectorIngestRows(spark, outDir)
    assert(gotRows().collect().map(key).toMap == batch,
      "maintained rows diverged from the batch stored index")
    // consolidation actually ran AND bounded the layout: the compact tier
    // has the batch index's partition dirs with ONE file per list, and at
    // most consolidateAfter live batch subdirs remain
    val compactParts = new java.io.File(s"$outDir/compact").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    val batchParts = new java.io.File(bdir).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    assert(compactParts == batchParts,
      s"compact tier layout diverged: $compactParts vs $batchParts")
    compactParts.foreach { p =>
      val files = parquetFilesUnder(s"$outDir/compact/$p")
      assert(files.length == 1, s"$p holds ${files.length} files after the fold")
    }
    val liveSubs = new java.io.File(s"$outDir/ingest").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(liveSubs.length <= 3,
      s"live tier grew past the bound: ${liveSubs.length} batch subdirs")
    // 8 triggers × touched lists would be ≥ 8 files/list unbounded; the
    // whole maintained tree must hold fewer data files than that
    assert(parquetFilesUnder(outDir).length <
      nSlices * compactParts.size,
      "total data file count is not bounded by the fold")
    // at-least-once: a consolidated batch RE-DELIVERED (its subdir
    // re-created after the fold dropped it) must not change the row set
    spark.read.parquet(bdir)
      .filter(pmod(col("vec_id"), lit(nSlices)) === 0)
      .withColumn("cluster", col("cluster").cast("long"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$outDir/ingest/batch=0")
    assert(gotRows().collect().map(key).toMap == batch,
      "re-delivered consolidated batch changed the served row set")
    // crash-safety: an interrupted swap (complete compact_next, compact
    // already dropped) must stay fully readable... — the real mid-swap
    // state carries the swap-ready marker (it is created before any
    // deletion and removed only AFTER the rename lands), so the
    // simulation plants it too
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$outDir/compact"),
      new org.apache.hadoop.fs.Path(s"$outDir/compact_next")))
    assert(fs.createNewFile(new org.apache.hadoop.fs.Path(
      s"$outDir/compact_next/_GRAFT_SWAP_READY")))
    assert(gotRows().collect().map(key).toMap == batch,
      "mid-swap state lost rows")
    // ...and the next trigger's recovery step must finish the swap (the
    // trigger re-delivers one already-stored vector — set-idempotent)
    landFile(base.limit(1), inDir, "s_tail")
    runOnce()
    assert(new java.io.File(s"$outDir/compact").exists &&
      !new java.io.File(s"$outDir/compact_next").exists,
      "recovery did not finish the interrupted swap")
    assert(gotRows().collect().map(key).toMap == batch,
      "post-recovery row set diverged")
  }

  test("maintained lexical ingestion folds postings batch-equal with df NULL") {
    import graft.operators.TrainData
    val maxId = t.documents.agg(max(col("doc_id"))).head.getLong(0)
    val isDelta = col("doc_id") * 5 > lit(maxId) * 4
    val delta = t.documents.filter(isDelta)
    val inDir = java.nio.file.Files.createTempDirectory("graft_tmaint_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_tmaint_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tmaint_ck").toString
    val nSlices = 6
    (0 until nSlices).foreach(i =>
      landFile(delta.filter(pmod(col("doc_id"), lit(nSlices)) === i), inDir, s"s$i"))
    val docs = spark.readStream.schema(t.documents.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = EventStreamPipeline.textIngestMaintainSink(
      docs, outDir, ckpt, consolidateAfter = 2)
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Int]("dl"), r.getAs[Long]("tf"),
          r.getAs[Number]("bucket").longValue)
    val gotRows = EventStreamPipeline.storedTextIngestRows(spark, outDir).collect()
    gotRows.foreach(r => assert(r.isNullAt(r.fieldIndex("df")),
      "maintained posting carries a df value — the upsert contract is NULL"))
    val got = gotRows.map(key).toMap
    assert(gotRows.length == got.size, "duplicate postings after the fold")
    val bdir = java.nio.file.Files.createTempDirectory("graft_tmaint_b")
      .toString + "/idx"
    TrainData.textIndexUpsert(t, Some(bdir))
    val batch = spark.read.parquet(bdir).filter(isDelta).collect().map(key).toMap
    assert(got.nonEmpty && got == batch,
      "maintained postings diverged from the batch upsert's delta")
    // the fold ran and the compact tier carries the stored-index layout
    // with one file per touched bucket
    val parts = new java.io.File(s"$outDir/compact").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    val wantParts = batch.values.map(_._3).toSet.map((b: Long) => s"bucket=$b")
    assert(parts == wantParts, s"compact layout diverged: $parts vs $wantParts")
    parts.foreach { p =>
      val files = parquetFilesUnder(s"$outDir/compact/$p")
      assert(files.length == 1, s"$p holds ${files.length} files after the fold")
    }
    assert(new java.io.File(s"$outDir/ingest").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch=")) <= 2,
      "live tier grew past the bound")
  }
}
