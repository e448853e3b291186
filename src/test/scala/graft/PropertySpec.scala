package graft

import graft.functions.RuleCompiler
import graft.operators.{Dedup, Identity, TextAnalysis}
import scala.util.Random

/** Property-style invariants over generated inputs (seeded, deterministic) —
  * the guarantees the operators must hold for ANY data, not just the
  * driver's testdata.
  */
class PropertySpec extends SparkSpec {

  test("rule compiler arithmetic agrees with direct evaluation on random inputs") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 10).foreach { _ =>
      val v = rnd.nextDouble() * 2000 - 1000
      val m = rnd.nextDouble() * 99 + 1
      val rule =
        s"""{"type":"operation","operator":"add","operands":[
           {"type":"operation","operator":"multiply","operands":[
             {"type":"field","field":"value"},
             {"type":"constant","value":$m,"dataType":"number"}]},
           {"type":"constant","value":1,"dataType":"number"}]}"""
      val got = Seq(v).toDF("value")
        .select(RuleCompiler.compile(rule)).collect()(0).getDouble(0)
      assert(got == v * m + 1)
    }
  }

  test("sessionize: count conservation + session count == gaps>30min for random streams") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 5).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val secs = List.fill(n)(rnd.nextLong().abs % 100000L)
      val df = secs.zipWithIndex
        .map { case (s, i) => (i.toLong, 1L, new java.sql.Timestamp(s * 1000L)) }
        .toDF("event_id", "user_id", "ts")
      val t2 = new graft.sources.Tables(spark, sf) { override def events = df }
      val sess = Identity.sessionize(t2).collect()
      assert(sess.map(_.getAs[Long]("n_events")).sum == secs.length)
      val sorted = secs.sorted
      val expected = 1 + sorted.sliding(2).count {
        case List(a, b) => b - a > 1800
        case _          => false
      }
      assert(sess.length == expected, s"secs=$sorted")
    }
  }

  test("per-row minhash signature equals the wide signature on random texts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(23)
    val vocab = Vector("ga", "bu", "zo", "meu", "lorem", "ipsum", "dolor")
    val docs = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(30)
      (id, List.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val k = Dedup.minhashK
    val wide = Dedup.minhashSignaturesWide(t2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until k).map(j => r.getAs[Long](s"mh$j"))).toMap
    val perRow = Dedup.withWords(docs).filter(size(col("w")) >= 3)
      .withColumn("h0s", Dedup.minhashShingleHashes)
      .select(col("doc_id"), Dedup.minhashSigArray.as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(perRow.keySet == wide.keySet)
    perRow.foreach { case (id, s) => assert(s == wide(id), s"doc $id drifted") }
  }

  test("char entropy bounds hold on random strings") {
    import spark.implicits._
    val rnd = new Random(31)
    val docs = (1L to 30L).map { id =>
      val n = 1 + rnd.nextInt(200)
      (id, List.fill(n)(('a' + rnd.nextInt(6)).toChar).mkString)
    }.toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    TextAnalysis.charEntropy(t2).collect().foreach { r =>
      val (n, nd, h) = (r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_distinct_chars"), r.getAs[Double]("entropy"))
      assert(h >= 0.0, s"negative entropy $h")
      // entropy can never exceed log2 of the distinct-symbol count
      assert(h <= math.log(nd.toDouble) / math.log(2.0) + 1e-9,
        s"entropy $h above log2($nd)")
      if (nd == 1) assert(h == 0.0)
      assert(n >= nd)
    }
  }

  test("minhash signatures are bounded and identical texts collide") {
    import spark.implicits._
    val rnd = new Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    (1 to 3).foreach { _ =>
      val words = List.fill(12)(vocab(rnd.nextInt(vocab.length)))
      val text = words.mkString(" ")
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
      val sig = Dedup.minhashSignaturesWide(t2).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (0 until Dedup.minhashK).map(j => r.getAs[Long](s"mh$j"))))
        .toMap
      // identical text => identical full signature
      assert(sig(1L) == sig(2L))
      sig.values.flatten.foreach(v => assert(v >= 0 && v < 2147483647L))
    }
  }

  test("exact dedup groups duplicated corpus correctly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick  brown fox"), // double space normalizes away
      (2L, " the quick brown fox "),
      (3L, "THE QUICK BROWN FOX"),
      (4L, "something else")).toDF("doc_id", "text")
    val t2 = new graft.sources.Tables(spark, sf) { override def documents = docs }
    val groups = Dedup.exact(t2).collect()
    assert(groups.length == 2)
    val dupGroup = groups.find(_.getAs[Long]("n") == 3).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("url canonicalization is idempotent on messy and already-clean urls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val nasty = Seq(
      "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=1#frag",
      "http://ex.com:80//",
      "http://ex.com:8080/p?b=2&a=1&fbclid=zz",
      "https://ex.com/p/q///?gclid=1",
      "http://ex.com/p",
      "HTTP://EX.com/p?z=9&utm_medium=m&y=8#x").toDF("url")
    val once = nasty.select(Dedup.canonicalUrl(col("url")).as("c1"))
    val twice = once.select(col("c1"), Dedup.canonicalUrl(col("c1")).as("c2")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
    // the whole synthetic corpus is idempotent too
    val corpus = t.documents
      .select(Dedup.canonicalUrl(Dedup.syntheticUrl).as("c1"))
      .select(col("c1"), Dedup.canonicalUrl(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2"))
    assert(corpus.count() == 0)
  }

  test("dhash56: bounds, determinism, and brightness invariance on random rasters") {
    import graft.operators.Multimodal
    val rnd = new Random(11)
    (1 to 50).foreach { _ =>
      val w = 8 + rnd.nextInt(9)
      val h = 8 + rnd.nextInt(5)
      val raster = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val hash = Multimodal.dhash56(w, h, raster, 0)
      // 56-bit range (the simhash-style headroom that keeps SQL safe)
      assert(hash >= 0L && hash < (1L << 56))
      // deterministic
      assert(Multimodal.dhash56(w, h, raster.clone(), 0) == hash)
      // gradient signs survive a uniform brightness shift that doesn't
      // clip — the property that makes dHash perceptual, not a checksum
      val headroom = raster.map(_ & 0xFF)
      val shift = 1 + rnd.nextInt(8)
      if (headroom.forall(p => p + shift <= 255)) {
        val brighter = raster.map(p => ((p & 0xFF) + shift).toByte)
        assert(Multimodal.dhash56(w, h, brighter, 0) == hash,
          s"brightness shift changed the hash (w=$w h=$h shift=$shift)")
      }
    }
  }
}
