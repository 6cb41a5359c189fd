package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {

  test("streaming ingest: sanitize + content-address + dedup within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val source = input.toDF().select($"value".as("content"))
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    input.addData("first doc", "second doc see /home/u/f.txt", "first doc")
    val q = StreamingIngest.startIngest(
      StreamingIngest.ingestPipeline(source), outDir, ckpt,
      trigger = Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 2) // duplicate content deduped by id
    val contents = out.select("content").as[String].collect().toSet
    assert(contents.exists(_.contains("[REDACTED_PATH]")))
    assert(out.columns.contains("id") && out.columns.contains("ingest_ts"))
  }

  test("file source end-to-end: rate-limited stream -> staging -> compaction MERGE -> searchable collection") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val landing = Files.createTempDirectory("graft-landing").toString
    val staging = Files.createTempDirectory("graft-staging").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    // producers drop files into the landing zone (one line = one document)
    Files.writeString(java.nio.file.Paths.get(landing, "batch1.txt"),
      "alpha document about spark\nbeta document about joins\n")
    Files.writeString(java.nio.file.Paths.get(landing, "batch2.txt"),
      "gamma document about vectors\nalpha document about spark\n")
    val source = StreamingIngest.fileSource(spark, landing, maxFilesPerTrigger = 1)
    assert(source.isStreaming)
    val q = StreamingIngest.startIngest(
      StreamingIngest.ingestPipeline(source), staging, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()
    // the duplicate "alpha" arrived in a different file; both copies may
    // survive the per-stream dedup -> compaction must resolve them
    val wh = Files.createTempDirectory("graft-wh").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("streamed")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "streamed"))
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder)
    assert(merged == 3, s"3 distinct documents after compaction, got $merged")
    val stored = api.catalog.readDocuments(entry)
    assert(stored.count() == 3)
    // compaction is idempotent: a second run merges the same ids
    assert(StreamingIngest.compact(spark, api.catalog, entry, staging, embedder) == 3)
    assert(api.catalog.readDocuments(entry).count() == 3)
    // and the collection is immediately searchable through the governed API
    val res = api.lexicalSearch("streamed", Seq("spark"), 5)
    assert(res.results.nonEmpty)
    assert(res.results.head.content.contains("spark"))
  }

  test("gated compaction drops corpus near-dups through the LSH index") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-sgate").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("sgate",
      documents = Some(Seq(("existing seed document", Map.empty[String, String]))
        .toDF("content", "metadata")))
    api.buildLshIndex("sgate", bits = 1, tables = 8)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "sgate"))
    val staging = Files.createTempDirectory("graft-staging-sgate").toString
    Seq(("brand new incoming document", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("content", "ingest_ts")
      .withColumn("id", graft.ingest.Ingest.contentId(org.apache.spark.sql.functions.col("content")))
      .write.mode("overwrite").parquet(staging)
    // threshold no cosine clears: the doc merges
    val m1 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      nearDupCosine = Some(1.1))
    assert(m1 == 1 && api.catalog.readDocuments(entry).count() == 2)
    // threshold every bucket-mate clears: an unseen doc is rejected
    Seq(("another different document entirely", java.sql.Timestamp.valueOf("2026-01-01 00:00:01")))
      .toDF("content", "ingest_ts")
      .withColumn("id", graft.ingest.Ingest.contentId(org.apache.spark.sql.functions.col("content")))
      .write.mode("overwrite").parquet(staging)
    val m2 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      nearDupCosine = Some(-1.0))
    assert(m2 == 0 && api.catalog.readDocuments(entry).count() == 2)
  }

  test("gated compaction drops textual near-dups through the MinHash index") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-sgate2").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("sgate2",
      documents = Some(Seq(("an existing seed document body with several tokens",
        Map.empty[String, String])).toDF("content", "metadata")))
    api.buildMinHashIndex("sgate2", bands = 16, shingleN = 2)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "sgate2"))
    val staging = Files.createTempDirectory("graft-staging-sgate2").toString
    def stage(content: String): Unit =
      Seq((content, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("content", "ingest_ts")
        .withColumn("id", graft.ingest.Ingest.contentId(
          org.apache.spark.sql.functions.col("content")))
        .write.mode("overwrite").parquet(staging)
    // one-token tweak of the seed: 2-gram jaccard 5/9 >= 0.5 -> dropped
    stage("an existing seed document body with numerous tokens")
    val m1 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      nearDupJaccard = Some(0.5))
    assert(m1 == 0 && api.catalog.readDocuments(entry).count() == 1,
      "textual near-dup must not merge")
    // genuinely novel text merges, and the index refresh makes it corpus
    stage("completely unrelated streaming payload about parquet files")
    val m2 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      nearDupJaccard = Some(0.5))
    assert(m2 == 1 && api.catalog.readDocuments(entry).count() == 2)
    stage("completely unrelated streaming payload about orc files")
    val m3 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      nearDupJaccard = Some(0.5))
    assert(m3 == 0 && api.catalog.readDocuments(entry).count() == 2,
      "gate must see documents compacted through itself")
  }

  test("gated compaction drops disallowed languages before the embed pass") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-sgate4").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("sgate4",
      documents = Some(Seq(("seed document in the english language with all the words",
        Map.empty[String, String])).toDF("content", "metadata")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "sgate4"))
    val staging = Files.createTempDirectory("graft-staging-sgate4").toString
    def stage(contents: Seq[String]): Unit =
      contents.map((_, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("content", "ingest_ts")
        .withColumn("id", graft.ingest.Ingest.contentId(
          org.apache.spark.sql.functions.col("content")))
        .write.mode("overwrite").parquet(staging)
    stage(Seq(
      "The people who would have been there said that they could never find the way home.",
      "Die Kinder haben gesagt, dass sie nicht wissen, wo der Zug zwischen den Orten ist."))
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      langAllow = Some(Set("en")))
    assert(merged == 1, "only the English row lands")
    val texts = api.catalog.readDocuments(entry).collect()
      .map(_.getAs[String]("content")).toSet
    assert(texts.exists(_.contains("never find the way home")))
    assert(!texts.exists(_.contains("Die Kinder")))
  }

  test("gated compaction drops structurally invalid chat transcripts") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-sgate5").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("sgate5",
      documents = Some(Seq(("seed transcript placeholder with enough words",
        Map.empty[String, String])).toDF("content", "metadata")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "sgate5"))
    val staging = Files.createTempDirectory("graft-staging-sgate5").toString
    def stage(contents: Seq[String]): Unit =
      contents.map((_, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("content", "ingest_ts")
        .withColumn("id", graft.ingest.Ingest.contentId(
          org.apache.spark.sql.functions.col("content")))
        .write.mode("overwrite").parquet(staging)
    stage(Seq(
      // valid: system -> user -> assistant
      """[{"role":"system","content":"rules"},{"role":"user","content":"the valid question"},{"role":"assistant","content":"the valid answer"}]""",
      // invalid: double user turn
      """[{"role":"user","content":"first broken"},{"role":"user","content":"second broken"},{"role":"assistant","content":"late answer"}]""",
      // invalid: unparseable JSON
      """this is not a transcript at all"""))
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      chatGate = Some(StreamingIngest.ChatGate()))
    assert(merged == 1, "only the structurally valid transcript lands")
    val texts = api.catalog.readDocuments(entry).collect()
      .map(_.getAs[String]("content")).toSet
    assert(texts.exists(_.contains("the valid answer")))
    assert(!texts.exists(_.contains("second broken")))
    assert(!texts.exists(_.contains("not a transcript")))
    // requireSystem drops the otherwise-valid system-less transcript
    stage(Seq(
      """[{"role":"user","content":"fine question"},{"role":"assistant","content":"fine answer"}]"""))
    val merged2 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      chatGate = Some(StreamingIngest.ChatGate(requireSystem = true)))
    assert(merged2 == 0, "requireSystem must drop the system-less transcript")
    // two staged docs with IDENTICAL valid transcripts: the gate must not
    // double the turns under one conv_id and reject both — one copy lands
    Seq(
      ("""[{"role":"user","content":"twin question"},{"role":"assistant","content":"twin answer"}]""",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "idA"),
      ("""[{"role":"user","content":"twin question"},{"role":"assistant","content":"twin answer"}]""",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), "idB"))
      .toDF("content", "ingest_ts", "id")
      .write.mode("overwrite").parquet(staging)
    val merged3 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      chatGate = Some(StreamingIngest.ChatGate()))
    assert(merged3 == 1, s"identical valid twins must land once, got $merged3")
    // tool-role grammar flows through the gate: a tool result directly
    // after its assistant call lands; one directly after user drops
    stage(Seq(
      """[{"role":"user","content":"call the weather tool"},{"role":"assistant","content":"calling"},{"role":"tool","content":"72F sunny"},{"role":"assistant","content":"it is sunny"}]""",
      """[{"role":"user","content":"broken tool placement"},{"role":"tool","content":"orphan result"},{"role":"assistant","content":"answer"}]"""))
    val merged4 = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      chatGate = Some(StreamingIngest.ChatGate()))
    assert(merged4 == 1, s"only the well-placed tool transcript lands, got $merged4")
    val texts4 = api.catalog.readDocuments(entry).collect()
      .map(_.getAs[String]("content")).toSet
    assert(texts4.exists(_.contains("it is sunny")))
    assert(!texts4.exists(_.contains("orphan result")))
    // the structural gates are mutually exclusive: C4's line rewrite
    // would mangle the JSON the chat gate just validated
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
        chatGate = Some(StreamingIngest.ChatGate()),
        c4Gate = Some(StreamingIngest.C4Gate()))
    }
    assert(ex.getMessage.contains("mutually exclusive"))
  }

  test("streaming windowed counts with watermark emit correct aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val source = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingIngest.windowedCounts(source, "1 hour", "2 hours")
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData(
      (ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
      (ts(11, 10), "click", 4.0), (ts(10, 20), "view", 8.0))
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT event_type, n, sum_value FROM wincounts ORDER BY window_start, event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 8.0), ("click", 1L, 4.0)))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val source = input.toDF().toDF("user_id", "ts", "value")
    val sessions = StreamingIngest.sessionize(spark, source)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two bursts 2h apart -> first session closes when the second
    // burst's watermark passes the timeout
    input.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 14:00:00"), 4.0))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 18:00:00"), 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, n_events, sum_value FROM sess ORDER BY start_ms")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.contains((1L, 2, 3.0))) // first burst closed as one session
    assert(rows.contains((1L, 1, 4.0))) // second burst closed after third arrives
  }

  test("gated compaction drops low-quality rows under a persisted classifier model") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    import graft.operators.QualityClassifier
    val wh = Files.createTempDirectory("graft-wh-qgate").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("qgate")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "qgate"))
    // train offline on a separable corpus, persist, load — the deployment path
    val train = (1 to 100).map { i =>
      if (i % 2 == 0) (i.toLong, 1, Seq("science", "method", "data"))
      else (i.toLong, 0, Seq("spam", "click", "win"))
    }.toDF("id", "label", "toks")
    val model = QualityClassifier.train(QualityClassifier.features(train, 64), 64, 8)
    val mpath = Files.createTempDirectory("graft-qmodel").toString + "/m"
    QualityClassifier.save(model, spark, mpath)
    val loaded = QualityClassifier.load(spark, mpath)
    val gate = StreamingIngest.QualityGate(loaded, 64, minMarginMicro = 0L)
    val staging = Files.createTempDirectory("graft-staging-qgate").toString
    Seq(("science method data analysis", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
        ("spam click win now", java.sql.Timestamp.valueOf("2026-01-01 00:00:01")))
      .toDF("content", "ingest_ts")
      .withColumn("id", graft.ingest.Ingest.contentId(
        org.apache.spark.sql.functions.col("content")))
      .write.mode("append").parquet(staging)
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      qualityGate = Some(gate))
    val landed = api.catalog.readDocuments(entry).select("content")
      .collect().map(_.getString(0))
    assert(merged == 1 && landed.length == 1, s"expected 1 landed, got ${landed.toSeq}")
    assert(landed.head.contains("science"), "the target-like row must land")
  }

  test("C4 compaction gate rewrites kept lines and drops failing pages") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-c4gate").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("c4gate")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c4gate"))
    val staging = Files.createTempDirectory("graft-staging-c4gate").toString
    Seq(
      ("this is a good first line.\nbad fragment\nand a second proper sentence here!",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      ("code page with a brace {x}.\nanother fully punctuated line right here.",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:01")))
      .toDF("content", "ingest_ts")
      .withColumn("id", graft.ingest.Ingest.contentId(
        org.apache.spark.sql.functions.col("content")))
      .write.mode("append").parquet(staging)
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      c4Gate = Some(StreamingIngest.C4Gate(minLineWords = 3, minSentences = 2)))
    val landed = api.catalog.readDocuments(entry).select("content")
      .collect().map(_.getString(0))
    assert(merged == 1 && landed.length == 1, s"expected 1 landed, got ${landed.toSeq}")
    assert(landed.head == "this is a good first line.\nand a second proper sentence here!",
      s"stored content must be the line-filtered text, got '${landed.head}'")
  }

  test("language and quality gates COMPOSE: both drop when configured together") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    import graft.operators.QualityClassifier
    val wh = Files.createTempDirectory("graft-wh-compose").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("composegate")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "composegate"))
    val train = (1 to 100).map { i =>
      if (i % 2 == 0) (i.toLong, 1, Seq("science", "method", "data"))
      else (i.toLong, 0, Seq("spam", "click", "win"))
    }.toDF("id", "label", "toks")
    val model = QualityClassifier.train(QualityClassifier.features(train, 64), 64, 8)
    val staging = Files.createTempDirectory("graft-staging-compose").toString
    Seq(
      // English + target-like: the only row that should land
      ("the science method and the data they would have been using there.",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      // English + spam-like: quality gate drops it
      ("spam click win spam click win spam click win now and here you are the one.",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:01")),
      // German + target-like words: language gate must STILL drop it (the
      // r7 regression: the quality gate used to rebuild from the
      // pre-language frame, un-dropping disallowed languages)
      ("die wissenschaft science method data und die kinder haben gesagt dass sie nicht wissen wo der zug ist.",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:02")))
      .toDF("content", "ingest_ts")
      .withColumn("id", graft.ingest.Ingest.contentId(
        org.apache.spark.sql.functions.col("content")))
      .write.mode("append").parquet(staging)
    val merged = StreamingIngest.compact(spark, api.catalog, entry, staging, embedder,
      qualityGate = Some(StreamingIngest.QualityGate(model, 64, minMarginMicro = 0L)),
      langAllow = Some(Set("en")))
    val landed = api.catalog.readDocuments(entry).select("content")
      .collect().map(_.getString(0))
    assert(merged == 1 && landed.length == 1, s"expected 1 landed, got ${landed.toSeq}")
    assert(landed.head.contains("they would have been using"))
  }

  test("stream-stream attribution join matches clicks inside the window only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingIngest.attributionJoin(
      imps.toDF().toDF("imp_user", "imp_ts", "campaign"),
      clks.toDF().toDF("click_user", "click_ts"),
      attributionWindow = "30 minutes")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    imps.addData(
      (1L, ts("2024-01-01 10:00:00"), "campA"),
      (2L, ts("2024-01-01 10:00:00"), "campB"),
      (3L, ts("2024-01-01 10:00:00"), "campC"))
    clks.addData(
      (1L, ts("2024-01-01 10:10:00")), // in window -> attributed
      (2L, ts("2024-01-01 11:00:00")), // 60 min later -> outside window
      (3L, ts("2024-01-01 09:50:00")), // BEFORE the impression -> no match
      (4L, ts("2024-01-01 10:05:00"))) // click with no impression
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, campaign, latency_ms FROM attrib")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "campA", 600000L)))
  }

  test("stream-stream attribution equals the batch range join on the replayed event log") {
    // the REAL sf0.001 log (188 views, 210 clicks, 15 users, 30 days),
    // views fed as impressions and clicks as clicks in event-time order
    // across three chunks — batch truth is the bucketed RangeJoin (the
    // no-theta-join batch analog), so one assertion pins BOTH engines to
    // the same closed-interval semantics on the same data.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
          .as("tsu"))
      .collect()
    val views = ev.filter(_.getString(2) == "view")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3)
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3)
    def tstamp(us: Long) = { // full microsecond precision
      val t = new java.sql.Timestamp(us / 1000000 * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    // batch truth: clicks matched to views with vtsu in [ctsu-30min, ctsu]
    val batch = graft.operators.RangeJoin.range(
        clicks.toSeq.toDF("user_id", "click_id", "ctsu"),
        views.toSeq.toDF("user_id", "view_id", "vtsu"),
        Seq("user_id"), "ctsu", "vtsu", before = 1800000000L, after = 0L,
        leftCols = Seq("click_id", "ctsu"), rightCols = Seq("view_id", "vtsu"))
      .select(col("user_id"), col("view_id").cast("string").as("campaign"),
        expr("(ctsu - vtsu) div 1000").as("latency_ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(batch.nonEmpty, "fixture must produce attributed pairs")
    // streaming side: same rows through the watermarked two-sided join,
    // fed in three event-time chunks (both streams cut at the same
    // instants so neither watermark races past the other's pending state)
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingIngest.attributionJoin(
      imps.toDF().toDF("imp_user", "imp_ts", "campaign"),
      clks.toDF().toDF("click_user", "click_ts"),
      attributionWindow = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib_parity")
      .outputMode("append").start()
    val allTs = (views.map(_._3) ++ clicks.map(_._3)).sorted
    val cuts = Seq(allTs(allTs.length / 3), allTs(2 * allTs.length / 3), Long.MaxValue)
    var (vOff, cOff) = (0, 0)
    cuts.foreach { cut =>
      val vs = views.drop(vOff).takeWhile(_._3 <= cut)
      val cs = clicks.drop(cOff).takeWhile(_._3 <= cut)
      vOff += vs.length; cOff += cs.length
      if (vs.nonEmpty)
        imps.addData(vs.map(v => (v._1, tstamp(v._3), v._2.toString)).toSeq)
      if (cs.nonEmpty)
        clks.addData(cs.map(c => (c._1, tstamp(c._3))).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.sql(
        "SELECT user_id, campaign, latency_ms FROM attrib_parity")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.size} vs ${batch.size} pairs")
  }

  test("continuous profiling: per-batch sketch folds equal the one-shot batch sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.SketchMaintenance
    import graft.operators.{Cms, Hll}
    val dir = Files.createTempDirectory("graft-sketch").toString
    val hllPath = s"$dir/hll.regs"
    val cmsPath = s"$dir/cms.cells"
    val all = (0 until 300)
      .map(i => (s"doc${i % 240}", s"tok${i % 13} tok${i % 7} filler"))
      .toDF("id", "content")
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(
      explode(graft.functions.TextFunctions.tokens(col("content"))).as("tok"))
    // three disjoint micro-batches folded in sequence
    (0 until 3).foreach { b =>
      val batch = all.filter(abs(xxhash64(col("id"), col("content"))) % 3 === b)
      SketchMaintenance.foldHll(hllPath, batch.select("id"), Seq(), "id")
      SketchMaintenance.foldCms(cmsPath, toks(batch), "tok", width = 256, depth = 4)
    }
    // stored register table == the batch sketch over the union — exact,
    // register for register / cell for cell
    def hllRows(df: org.apache.spark.sql.DataFrame) =
      df.select("reg_idx", "reg").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val stored = hllRows(spark.read.parquet(hllPath))
    val oneShot = hllRows(Hll.registers(all.select("id"), Seq(), "id"))
    assert(stored == oneShot && stored.nonEmpty)
    def cmsRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val storedCms = cmsRows(spark.read.parquet(cmsPath))
    val oneShotCms = cmsRows(Cms.sketch(toks(all), "tok", 256, 4))
    assert(storedCms == oneShotCms && storedCms.nonEmpty)
    // estimates read off the stored tables match a full recompute
    val est = SketchMaintenance.hllEstimate(spark, hllPath, Seq()).get
      .select("est").head().getDouble(0)
    val direct = Hll.estimate(Hll.registers(all.select("id"), Seq(), "id"), Seq())
      .select("est").head().getDouble(0)
    assert(est == direct)
    val cEst = SketchMaintenance.cmsEstimate(spark, cmsPath, Seq("filler"), 256, 4).get
      .head().getLong(1)
    assert(cEst >= 300L) // every row contributes one 'filler' token
  }

  test("sketch writeSwap survives a crash between its two renames") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.SketchMaintenance
    val dir = Files.createTempDirectory("graft-sketch-crash").toString
    val hllPath = s"$dir/hll.regs"
    val b1 = (0 until 100).map(i => s"doc$i").toDF("id")
    val b2 = (100 until 150).map(i => s"doc$i").toDF("id")
    SketchMaintenance.foldHll(hllPath, b1, Seq(), "id")
    val committed = spark.read.parquet(hllPath)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // simulate the torn swap: live renamed to .bak, staging move never
    // happened (the exact window the old delete-then-move scheme lost)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(hllPath),
      java.nio.file.Paths.get(hllPath + ".bak"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(hllPath)))
    // load() reads the backup in place (mutation-free recovery — a
    // rename here would race a cross-process writer's staging move)
    val recovered = SketchMaintenance.load(spark, hllPath).get
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(recovered == committed)
    // mutation-free: reading did NOT restore the live dir
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(hllPath)))
    // and the interrupted fold re-runs cleanly on the recovered state
    SketchMaintenance.foldHll(hllPath, b2, Seq(), "id")
    val est = SketchMaintenance.hllEstimate(spark, hllPath, Seq()).get
      .select("est").head().getDouble(0)
    val direct = graft.operators.Hll.estimate(
      graft.operators.Hll.registers(b1.unionAll(b2), Seq(), "id"), Seq())
      .select("est").head().getDouble(0)
    assert(est == direct)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(hllPath + ".bak")))
  }

  test("sketch estimates are materialized: a swap deleting the files cannot fail a returned frame") {
    import spark.implicits._
    import graft.streaming.SketchMaintenance
    val dir = Files.createTempDirectory("graft-sketch-mat").toString
    val hllPath = s"$dir/hll.regs"
    val batch = (0 until 80).map(i => s"doc$i").toDF("id")
    SketchMaintenance.foldHll(hllPath, batch, Seq(), "id")
    val est = SketchMaintenance.hllEstimate(spark, hllPath, Seq()).get
    // a cross-process writer's swap can delete the dir a lock-free reader
    // loaded from (the .bak window) AFTER the estimate call returned —
    // the returned frame must not depend on those files anymore
    graft.catalog.PartitionedTable.deleteDir(java.nio.file.Paths.get(hllPath))
    val e = est.select("est").head().getDouble(0)
    val direct = graft.operators.Hll.estimate(
      graft.operators.Hll.registers(batch, Seq(), "id"), Seq())
      .select("est").head().getDouble(0)
    assert(e == direct)
  }

  test("compaction with profile sidecars folds HLL/CMS continuously") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    import graft.streaming.SketchMaintenance
    val wh = Files.createTempDirectory("graft-wh").toString
    val staging1 = Files.createTempDirectory("graft-st1").toString
    val staging2 = Files.createTempDirectory("graft-st2").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("profiled")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "profiled"))
    def stage(path: String, contents: Seq[String]): Unit =
      contents.toDF("content")
        .withColumn("id", graft.ingest.Ingest.contentId(org.apache.spark.sql.functions.col("content")))
        .withColumn("ingest_ts", org.apache.spark.sql.functions.current_timestamp())
        .write.mode("overwrite").parquet(path)
    stage(staging1, Seq("alpha about spark", "beta about joins"))
    stage(staging2, Seq("gamma about vectors", "delta about state"))
    val prof = StreamingIngest.ProfileSketches(
      s"$wh/profiled.hll", s"$wh/profiled.cms", width = 256, depth = 4)
    assert(StreamingIngest.compact(spark, api.catalog, entry, staging1, embedder,
      profile = Some(prof)) == 2)
    assert(StreamingIngest.compact(spark, api.catalog, entry, staging2, embedder,
      profile = Some(prof)) == 2)
    // 4 distinct ids ever landed; at n << m the HLL estimate is the exact
    // linear-counting answer
    val est = SketchMaintenance.hllEstimate(spark, prof.hllPath, Seq()).get
      .select("est").head().getDouble(0)
    assert(math.round(est) == 4L, s"est=$est")
    // the token CMS saw both batches: 'about' occurs once per document
    val aboutEst = SketchMaintenance.cmsEstimate(
      spark, prof.cmsPath, Seq("about"), 256, 4).get.head().getLong(1)
    assert(aboutEst == 4L, s"about=$aboutEst")
  }

  test("compaction maintains the chunk-vector index like every other derived index") {
    import spark.implicits._
    import graft.ingest.DeterministicHashEmbedder
    val wh = Files.createTempDirectory("graft-wh-chunkc").toString
    val staging = Files.createTempDirectory("graft-st-chunkc").toString
    val embedder = new DeterministicHashEmbedder(16)
    val api = new Api(spark, wh, embedder)
    api.createCollection("chunked", documents = Some(
      (0 until 8).map(i => s"seed document $i with plenty of words " +
        s"so chunking at four tokens splits it into several pieces")
        .toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "chunked"))
    api.buildChunkIndex("chunked", maxTokens = 4)
    (10 until 14).map(i => s"streamed document $i arrives later with more words than four")
      .toDF("content")
      .withColumn("id", graft.ingest.Ingest.contentId(org.apache.spark.sql.functions.col("content")))
      .withColumn("ingest_ts", org.apache.spark.sql.functions.current_timestamp())
      .write.mode("overwrite").parquet(staging)
    assert(StreamingIngest.compact(spark, api.catalog, entry, staging, embedder) == 4)
    // the streamed batch's chunks landed AND the whole index equals a
    // from-scratch rebuild — one maintenance path for batch and stream
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "chunk_idx", "vec").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val got = rows(graft.search.ChunkIndex.load(spark, api.catalog, entry))
    val rebuilt = rows(graft.search.ChunkIndex.indexRows(
      api.catalog.readDocuments(entry).select("id", "content"), embedder, 4))
    assert(got == rebuilt)
    assert(got.map(_._1).distinct.size == 12)
  }
}
