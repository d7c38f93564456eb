package graft

import graft.streaming.StreamingIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.sql.Timestamp

/** Structured Streaming surfaces: incremental file indexer and the
  * watermarked windowed aggregation, driven synchronously. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("file index stream: new files → chunked+embedded parquet index") {
    val root: Path = Files.createTempDirectory("graft-stream")
    val in = root.resolve("in"); Files.createDirectories(in)
    val out = root.resolve("index").toString
    val ckpt = root.resolve("ckpt").toString
    Files.write(in.resolve("a.log"),
      ("alpha beta\n" + "x" * 250 + "\ngamma").getBytes(StandardCharsets.UTF_8))
    Files.write(in.resolve("b.log"),
      "delta epsilon zeta\n\n".getBytes(StandardCharsets.UTF_8))

    val q = StreamingIndex
      .fileIndexStream(spark, in.toString, out, ckpt, chunkSize = 100)
      .start()
    q.awaitTermination(120000)

    val idx = spark.read.parquet(out)
    assert(idx.count() > 0)
    assert(idx.columns.toSet ==
      Set("source", "total_chunks", "chunk_index", "text", "id", "embedding"))
    // oversize line preserved as its own chunk through the stream
    assert(idx.filter(length(col("text")) > 100).count() == 1)
    // incremental: a third file arrives, only it is processed
    Files.write(in.resolve("c.log"), "eta theta".getBytes(StandardCharsets.UTF_8))
    val q2 = StreamingIndex
      .fileIndexStream(spark, in.toString, out, ckpt, chunkSize = 100)
      .start()
    q2.awaitTermination(120000)
    val after = spark.read.parquet(out)
    assert(after.count() == idx.count() + 1)
  }

  test("event rate stream: watermarked sliding window aggregation") {
    val root = Files.createTempDirectory("graft-events")
    val src = root.resolve("events").toString
    def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0),
      (ts(2), "error", 3.0), (ts(7), "click", 4.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(src)
    val agg = StreamingIndex.eventRateStream(stream)
    val q = agg.writeStream
      .format("memory").queryName("rates").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT event_type, sum(n) FROM rates GROUP BY event_type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sliding 5-min windows step 1 min: each event lands in 5 windows
    assert(rows("click") == 15L)
    assert(rows("error") == 5L)
  }

  test("anomaly score stream: batch-trained stats flag a streamed spike hour") {
    import graft.ops.Events
    val root = Files.createTempDirectory("graft-anom-stream")
    // history (nanosecond-long events table): 10 hours of 2 + one of 3
    val hist = root.resolve("hist").toString
    val hour = 3600L
    val histRows = (0 until 10).flatMap(h =>
      Seq.tabulate(2)(i => (h * 100L + i, (h * hour + i) * 1000000000L))) ++
      Seq.tabulate(3)(i => (1000L + i, (10 * hour + i) * 1000000000L))
    histRows.map { case (id, ns) => (id, ns, 1L, "error", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$hist/events.parquet")
    val stats = Events.hourlyStats(spark, hist)

    // stream: a normal hour (2 events), a spike hour (40), and a
    // sentinel 6 h later that advances the watermark past both
    val src = root.resolve("ev").toString
    def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
    val streamRows =
      Seq.tabulate(2)(i => (ts(100 * hour + i), "error")) ++
        Seq.tabulate(40)(i => (ts(101 * hour + i), "error")) ++
        Seq((ts(107 * hour), "error"))
    streamRows.toDF("ts", "event_type").write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING").parquet(src)
    val q = graft.streaming.StreamingIndex.anomalyScoreStream(stream, stats)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT hour, n, is_anomaly FROM anom").collect()
      .map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(got.contains(2L) && got.contains(40L), s"both closed hours emit: $got")
    assert(got(2L) == 0, "normal hour must not flag")
    assert(got(40L) == 1, "spike hour must flag")
    assert(!got.contains(1L), "sentinel hour is still open (watermark)")
  }

  test("streaming dedup-on-ingest: corpus Bloom sketch flags near-dup arrivals map-only") {
    import graft.streaming.StreamingDedup
    val root = Files.createTempDirectory("graft-sdedup")
    // static corpus: two real documents
    val corpusDoc =
      "the quick brown fox jumps over the lazy dog while the cat watches " +
        "from a warm window sill and the rain falls softly on the quiet street outside"
    val otherDoc =
      "distributed query engines shuffle data between executors when joins " +
        "and aggregations repartition rows across the cluster network fabric"
    val corpus = Seq((1L, corpusDoc), (2L, otherDoc)).toDF("doc_id", "text")
    val sketch = StreamingDedup.corpusSketch(corpus)

    // stream: an exact copy, a near copy (two words changed), a novel doc
    val src = root.resolve("in").toString
    val nearCopy = corpusDoc.replace("quick", "swift").replace("rain", "snow")
    val novel =
      "completely unrelated content about baking sourdough bread with a " +
        "long cold fermentation and a very hot dutch oven for the final crust"
    Seq((10L, corpusDoc), (11L, nearCopy), (12L, novel))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(src)
    val q = StreamingDedup.flagAgainstCorpus(stream, sketch)
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val flags = spark.sql("SELECT doc_id, dup_candidate FROM sdedup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(10L), "exact copy must flag")
    assert(flags(11L), "near copy (2 word edit) must share a signature band")
    assert(!flags(12L), "novel doc must pass")
  }

  test("anomaly stream ≡ batch rate_anomaly: full row equality on a bounded source") {
    import graft.ops.Events
    val dir = "/root/testdata/sf0.001"
    val batch = Events.rateAnomaly(spark, dir).collect().map(_.toString).toSeq

    // same events through the stream, plus one far-future sentinel so
    // the 2 h watermark closes every real hour; the sentinel's own
    // window stays open and never emits
    val root = Files.createTempDirectory("graft-anom-eq")
    val src = root.resolve("ev").toString
    val evts = Events.eventsTable(spark, dir).select(col("ts"), col("event_type"))
    val maxTs = evts.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = Seq((new Timestamp(maxTs.getTime + 10L * 3600 * 1000), "view"))
      .toDF("ts", "event_type")
    evts.union(sentinel).write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING").parquet(src)
    val q = StreamingIndex.anomalyScoreStream(stream, Events.hourlyStats(spark, dir))
      .writeStream.format("memory").queryName("anom_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM anom_eq")
      .filter(col("hour") <= maxTs)
      .orderBy(col("hour"), col("event_type"))
      .collect().map(_.toString).toSeq
    // the shared zScore formula + shared stats make this exact, not
    // approximate: same hours, same counts, same z to the last bit
    assert(streamed == batch, s"stream rows ${streamed.size} vs batch ${batch.size}")
  }

  test("curation stream ≡ batch gopher_quality: map-only filter, full row equality") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.ops.Curation.gopherQuality(spark, dir)
      .collect().map(_.toString).toSeq
    val src = Files.createTempDirectory("graft-cur-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(src)
    val q = StreamingIndex.curationStream(stream)
      .writeStream.format("memory").queryName("cur_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM cur_eq")
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    // one shared column definition (Curation.gopherScore) → exact
    // equality, and no state/watermark/shuffle anywhere in the stream
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("dsir stream ≡ batch dsir_weights: frozen-model map-only scoring, row equality") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.ops.Dsir.dsirWeights(spark, dir)
      .collect().map(_.toString).toSeq
    val (model, tr, tt) = graft.ops.Dsir.fittedModel(spark, dir)
    val src = Files.createTempDirectory("graft-dsir-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(src)
    val q = StreamingIndex.dsirScoreStream(stream, model, tr, tt)
      .writeStream.format("memory").queryName("dsir_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM dsir_eq")
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    // scoring the training corpus itself through the frozen model
    // must reproduce the batch relation bit-for-bit — one shared
    // term arithmetic (Dsir.scoreUdf ↔ dsirWeights), no state
    // store, no watermark, no shuffle anywhere in the stream
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("quality stream ≡ batch scoring: frozen-weights map-only projection, row equality") {
    val dir = "/root/testdata/sf0.001"
    val (w1, w2, w3) = graft.ops.QualityModel.fitWeights(spark, dir)
    val batch = graft.ops.QualityModel
      .scoreWith(spark.read.parquet(s"$dir/documents.parquet"), w1, w2, w3)
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val src = Files.createTempDirectory("graft-qual-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(src)
    val q = StreamingIndex.qualityScoreStream(stream, w1, w2, w3)
      .writeStream.format("memory").queryName("qual_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM qual_eq")
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    // one shared projection (QualityModel.scoreWith) → bit equality;
    // no state store, no watermark, no shuffle anywhere
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("drift stream ≡ batch driftErrors: frozen-quantizer map-only scoring, row equality") {
    val dir = "/root/testdata/sf0.001"
    val cents = graft.ops.KMeansVec.driftCentroids(spark, dir)
    val batch = graft.ops.KMeansVec
      .driftErrors(spark.read.parquet(s"$dir/embeddings.parquet"), cents)
      .orderBy(col("vec_id")).collect().map(_.toString).toSeq
    val src = Files.createTempDirectory("graft-drift-eq").resolve("vecs").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .parquet(src)
    val q = StreamingIndex.driftScoreStream(stream, cents)
      .writeStream.format("memory").queryName("drift_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM drift_eq")
      .orderBy(col("vec_id")).collect().map(_.toString).toSeq
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("bloom stream ≡ batch bloom_decontaminate: frozen-bitset map-only scoring") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.ops.Bloom.bloomDecontaminate(spark, dir)
      .collect().map(_.toString).toSeq
    val bits = graft.ops.Bloom.benchBitset(spark, dir)
    val src = Files.createTempDirectory("graft-bloom-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 =!= 0)
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(src)
    val q = StreamingIndex.bloomScoreStream(stream, bits)
      .writeStream.format("memory").queryName("bloom_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM bloom_eq WHERE n_flagged > 0")
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("funnel stream ≡ batch funnel_steps: per-step user counts on the events fixture") {
    import graft.ops.Events
    import graft.streaming.FunnelStream
    val dir = "/root/testdata/sf0.001"
    val batchCounts = Events.funnelSteps(spark, dir).collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users")).toMap

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-funnel-eq")
      val src = root.resolve("ev").toString
      Events.eventsTable(spark, dir)
        .select(col("user_id"), col("ts"), col("event_type"))
        .write.mode("overwrite").parquet(src)
      val ev = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING").parquet(src)
        .as[FunnelStream.StageEvent]
      val q = FunnelStream.funnel(ev).toDF("user_id", "stage", "lag_us")
        .writeStream.format("memory").queryName("funnel_eq")
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
      // single bounded batch → one emission per user at their final
      // stage; step-k user count = users whose final stage ≥ k
      val finalStage = spark.sql("SELECT user_id, max(stage) AS s FROM funnel_eq GROUP BY user_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val streamCounts = (1 to 3).map(k =>
        k.toLong -> finalStage.values.count(_ >= k).toLong).toMap
      assert(streamCounts == batchCounts,
        s"stream $streamCounts vs batch $batchCounts")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsert index stream: a re-arrived version replaces only its source partition") {
    val root = Files.createTempDirectory("graft-upsert")
    val in = root.resolve("in"); Files.createDirectories(in)
    val idx = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    Files.write(in.resolve("a.log.v1"), "old alpha content here".getBytes)
    Files.write(in.resolve("b.log.v1"), "stable beta content".getBytes)
    StreamingIndex.upsertIndexStream(spark, in.toString, idx, ckpt, chunkSize = 100)
      .start().awaitTermination(120000)
    val first = spark.read.parquet(idx)
    assert(first.select("source").distinct().count() === 2)

    // version 2 of a.log arrives; b.log untouched
    Files.write(in.resolve("a.log.v2"), "new alpha replacement text".getBytes)
    StreamingIndex.upsertIndexStream(spark, in.toString, idx, ckpt, chunkSize = 100)
      .start().awaitTermination(120000)
    val after = spark.read.parquet(idx)
    val aTexts = after.filter(col("source").endsWith("a.log"))
      .select("text").collect().map(_.getString(0))
    assert(aTexts.toSeq === Seq("new alpha replacement text"),
      "v1 chunks must be replaced, not appended")
    assert(after.filter(col("source").endsWith("b.log")).count() === 1,
      "untouched source keeps its chunks")
  }

  test("streaming dedup: watermarked state drops re-arrived content") {
    val root = Files.createTempDirectory("graft-sdedup")
    val src = root.resolve("docs").toString
    def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // same content arrives three times inside the horizon → keep one
    Seq(
      (ts(0), "a.log", "alpha beta"),
      (ts(1), "b.log", "alpha beta"),
      (ts(2), "c.log", "gamma delta"),
      (ts(3), "d.log", "alpha beta"))
      .toDF("ts", "source", "content")
      .write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, source STRING, content STRING")
      .parquet(src)
    val q = StreamingIndex.dedupStream(stream)
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val contents = spark.sql("SELECT content FROM sdedup").collect()
      .map(_.getString(0)).sorted
    assert(contents === Array("alpha beta", "gamma delta"))
  }

  test("stream-stream interval join: purchases attributed to preceding clicks") {
    val root = Files.createTempDirectory("graft-ssj")
    val pSrc = root.resolve("p").toString
    val cSrc = root.resolve("c").toString
    def ts(sec: Int): Timestamp = new Timestamp(1704067200000L + sec * 1000L)
    Seq((100L, ts(100)), (200L, ts(400)))
      .toDF("purchase_id", "ts").write.mode("overwrite").parquet(pSrc)
    // clicks: 70s and 95s precede P100 within 60s; 10s is too old;
    // 399s matches P200
    Seq((1L, ts(70)), (2L, ts(95)), (3L, ts(10)), (4L, ts(399)))
      .toDF("click_id", "cts").write.mode("overwrite").parquet(cSrc)

    val p = spark.readStream.schema("purchase_id BIGINT, ts TIMESTAMP").parquet(pSrc)
    val c = spark.readStream.schema("click_id BIGINT, cts TIMESTAMP").parquet(cSrc)
    val q = StreamingIndex.attributionStream(p, c)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql("SELECT purchase_id, click_id FROM attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 1L), (100L, 2L), (200L, 4L)))
  }

  test("stream-static join: streaming events enriched with a broadcast dimension") {
    val root = Files.createTempDirectory("graft-ss")
    val src = root.resolve("ev").toString
    Seq((1L, "click", 2.0), (2L, "error", 1.0), (1L, "view", 3.0))
      .toDF("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    val dim = Seq((1L, "gold"), (2L, "bronze")).toDF("user_id", "tier")

    val stream = spark.readStream
      .schema("user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(src)
    val joined = stream.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
    val q = joined.writeStream.format("memory").queryName("tiers")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT tier, n FROM tiers").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("gold" -> 2L, "bronze" -> 1L))
  }

  test("transformWithState: running totals persist across restarts in RocksDB state") {
    import graft.streaming.{CountProcessor, SessionStream}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-tws")
      val src = root.resolve("ev").toString
      val ckpt = root.resolve("ckpt").toString
      def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      Seq((1L, ts(0), 2.0), (1L, ts(1), 3.0), (2L, ts(2), 5.0))
        .toDF("user_id", "ts", "value")
        .write.mode("overwrite").parquet(src)
      val out = root.resolve("out").toString
      def run(): Unit = {
        val ev = spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE").parquet(src)
          .as[SessionStream.UserEvent]
        val q = CountProcessor.runningTotals(ev)
          .toDF("user_id", "n", "total")
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
        q.processAllAvailable(); q.stop()
      }
      run()
      val first = spark.read.parquet(out)
        .groupBy("user_id").agg(max("n").as("n"), max("total").as("t"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(first === Map(1L -> ((2L, 5.0)), 2L -> ((1L, 5.0))))
      // new events arrive; state restores from the checkpoint
      Seq((1L, ts(5), 10.0)).toDF("user_id", "ts", "value")
        .write.mode("append").parquet(src)
      run()
      val second = spark.read.parquet(out)
        .groupBy("user_id").agg(max("n").as("n"), max("total").as("t"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(second(1L) === ((3L, 15.0)), "running count continues from restored state")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel: stage advances emit once, order enforced across batches") {
    import graft.streaming.FunnelStream
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-funnel-stream")
      val src = root.resolve("ev").toString
      val ckpt = root.resolve("ckpt").toString
      val out = root.resolve("out").toString
      def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      def run(): Unit = {
        val ev = spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING").parquet(src)
          .as[FunnelStream.StageEvent]
        val q = FunnelStream.funnel(ev).toDF("user_id", "stage", "lag_us")
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
        q.processAllAvailable(); q.stop()
      }
      // batch 1: user 1 views+clicks; user 2 clicks (no view — stuck)
      Seq((1L, ts(0), "view"), (1L, ts(1), "click"), (2L, ts(0), "click"))
        .toDF("user_id", "ts", "event_type").write.mode("overwrite").parquet(src)
      run()
      // batch 2: user 1 purchases (state restored); user 2 views —
      // NOW at stage 1, but the old click must not count
      Seq((1L, ts(2), "purchase"), (2L, ts(1), "view"))
        .toDF("user_id", "ts", "event_type").write.mode("append").parquet(src)
      run()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows === Set(
        (1L, 2, 60000000L),   // batch 1: view→click, 60 s lag
        (1L, 3, 120000000L),  // batch 2: full funnel, 120 s lag
        (2L, 1, 0L)),         // batch 2: view only — pre-view click ignored
        s"got $rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful sessionization: flatMapGroupsWithState closes gapped sessions") {
    import graft.streaming.SessionStream
    import graft.streaming.SessionStream.UserEvent
    val root = Files.createTempDirectory("graft-sess")
    val src = root.resolve("ev").toString
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two sessions (40-min gap); user 2: one open session
    Seq(
      UserEvent(1L, ts(0, 0), 1.0), UserEvent(1L, ts(0, 10), 1.0),
      UserEvent(1L, ts(0, 50), 1.0), UserEvent(1L, ts(0, 55), 1.0),
      UserEvent(2L, ts(0, 5), 1.0))
      .toDF().write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      .parquet(src).as[UserEvent]
    val q = SessionStream.sessionize(stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM sessions").collect()
    // only user 1's first session is closed (by the 00:50 event)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Timestamp]("session_start") == ts(0, 0))
    assert(r.getAs[Timestamp]("session_end") == ts(0, 10))
    assert(r.getAs[Long]("n_events") == 2L)
  }

  test("streaming domain cap: per-source counter state gates across batch boundaries ≡ batch arrival form") {
    import spark.implicits._
    val cap = 4
    val root = Files.createTempDirectory("graft-capgate")
    val src = root.resolve("docs").toString
    // batch 1: 3 docs for "big" (under cap), 2 for "small"
    val b1 = Seq((1L, "big"), (2L, "big"), (3L, "big"), (4L, "small"), (5L, "small"))
    // batch 2: 3 more for "big" — the cap (4) straddles the boundary:
    // doc 6 passes on carried state, docs 7 and 8 must gate
    val b2 = Seq((6L, "big"), (7L, "big"), (8L, "big"), (9L, "small"))
    b1.toDF("doc_id", "source").write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema("doc_id LONG, source STRING").parquet(src)
    val q = StreamingIndex.sourceCapStream(stream, cap)
      .writeStream.format("memory").queryName("cap_gate").outputMode("append").start()
    q.processAllAvailable()
    b2.toDF("doc_id", "source").write.mode("append").parquet(src)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM cap_gate").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(streamed.size == 9, s"every arrival gets a decision: $streamed")
    assert(streamed(6L) == 1, "the counter must carry across the batch boundary")
    assert(streamed(7L) == 0 && streamed(8L) == 0, "past-cap arrivals gate")
    assert(Seq(1L, 2L, 3L, 4L, 5L, 9L).forall(streamed(_) == 1))
    // ≡ the batch arrival form over the same union
    val batch = graft.ops.Curation.sourceCapArrivalOf(
      (b1 ++ b2).toDF("doc_id", "source"), cap).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(streamed == batch, "stream ≡ batch per-doc decisions")
  }

  test("markup gate stream ≡ batch flags; the streamed rows fold to the batch report exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see &amp; and <div plus https://a.example/x", "s1"),
      (2L, "a literal \\n escape rides here", "s1"),
      (3L, "clean text only", "s2"))
    val dir = Files.createTempDirectory("graft-markup-eq").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchFlags = graft.ops.Curation.markupFlagsOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING")
      .parquet(s"$dir/documents.parquet")
    val q = StreamingIndex.markupGateStream(stream)
      .writeStream.format("memory").queryName("markup_gate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM markup_gate").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batchFlags, "one shared projection — per-doc bit equality")
    assert(streamed(1L).last == 0 && streamed(2L).last == 0 && streamed(3L).last == 1)
    // folding the per-doc rows by source reproduces the report
    val folded = spark.sql(
      """SELECT source, COUNT(*), SUM(1 - keep), SUM(n_entities), SUM(n_tags),
        |       SUM(n_urls), SUM(n_escapes)
        |FROM markup_gate GROUP BY source""".stripMargin).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong(_))).toMap
    val report = graft.ops.Curation.markupArtifactsReportOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong(_))).toMap
    assert(folded == report, "stream rows fold to the batch report")
  }

  test("streaming event transitions: per-user state carries pairs across batch boundaries; folded counts ≡ the batch matrix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-transgate")
    val src = root.toString
    def row(id: Long, us: Long, uid: Long, typ: String) = (id, us, uid, typ)
    // user 1 straddles the boundary: view(b1) -> click(b2); user 2's
    // two events share a timestamp (event_id order decides the pair)
    val b1 = Seq(row(10L, 1000L, 1L, "view"),
      row(20L, 5000L, 2L, "a"), row(21L, 5000L, 2L, "b"))
    val b2 = Seq(row(11L, 9000L, 1L, "click"), row(12L, 9500L, 1L, "view"))
    def write(rows: Seq[(Long, Long, Long, String)], mode: String): Unit =
      rows.toDF("event_id", "us", "user_id", "event_type")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"))
        .write.mode(mode).parquet(s"$src/events.parquet")
    write(b1, "overwrite")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .parquet(s"$src/events.parquet")
    val q = StreamingIndex.transitionStream(stream)
      .writeStream.format("memory").queryName("trans_gate").outputMode("append").start()
    q.processAllAvailable()
    write(b2, "append")
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM trans_gate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // u2's tied pair resolves a->b (event_id order); u1: view->click
    // ACROSS the boundary (state-carried), then click->view in batch 2
    assert(streamed.toSet == Set(
      (2L, "a", "b", 21L),
      (1L, "view", "click", 11L),
      (1L, "click", "view", 12L)), s"got: ${streamed.toSeq}")
    // folded (from, to) counts ≡ the batch pair counts over the union
    val folded = spark.sql(
      """SELECT from_type, to_type, COUNT(*) AS n FROM trans_gate
        |GROUP BY from_type, to_type""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.Events.eventTransitions(spark, src).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(folded == batch, s"stream fold ≡ batch matrix: $folded vs $batch")
  }

  test("mojibake gate stream ≡ batch flags; streamed rows fold to the batch report") {
    import spark.implicits._
    val docs = Seq(
      (1L, "CafÃ© rÃ©sumÃ© here", "s1"), // latin1 digraphs
      (2L, "donât and bad�byte", "s1"), // trigraph + FFFD (+C1)
      (3L, "clean ascii text only", "s2"))
    val dir = Files.createTempDirectory("graft-mojibake-eq").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchFlags = graft.ops.Curation.mojibakeFlagsOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING")
      .parquet(s"$dir/documents.parquet")
    val q = StreamingIndex.mojibakeGateStream(stream)
      .writeStream.format("memory").queryName("mojibake_gate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM mojibake_gate").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batchFlags, "one shared projection — per-doc bit equality")
    assert(streamed(1L).last == 0 && streamed(2L).last == 0 && streamed(3L).last == 1)
    val folded = spark.sql(
      """SELECT source, COUNT(*), SUM(1 - keep), SUM(n_latin1), SUM(n_punct3),
        |       SUM(n_fffd), SUM(n_c1)
        |FROM mojibake_gate GROUP BY source""".stripMargin).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong(_))).toMap
    val report = graft.ops.Curation.mojibakeReportOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong(_))).toMap
    assert(folded == report, "stream rows fold to the batch report")
  }

  test("synthetic-text gate stream ≡ batch hits; the keep decision gates boilerplate on ingest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "As an AI language model, I cannot assist with that", "s1"),
      (2L, "I hope this helps! I hope this helps!", "s1"),
      (3L, "organic prose with zero boilerplate", "s2"))
    val dir = Files.createTempDirectory("graft-synth-eq").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchHits = graft.ops.Curation.syntheticHitsOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING")
      .parquet(s"$dir/documents.parquet")
    val q = StreamingIndex.syntheticGateStream(stream)
      .writeStream.format("memory").queryName("synth_gate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM synth_gate").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batchHits, "one shared projection — per-doc bit equality")
    // doc 1: two single-hit markers; doc 2: one marker twice; doc 3 clean
    val nHits = spark.sql("SELECT doc_id, n_hits, keep FROM synth_gate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(nHits(1L) == ((2L, 0)) && nHits(2L) == ((2L, 0)) && nHits(3L) == ((0L, 1)))
  }

  test("salted aggregation ≡ direct aggregation (skew mitigation is exact)") {
    import graft.ops.Skew
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val direct = Skew.directCountSum(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(direct == salted)
  }

  test("sql registration: float_dot callable from SQL") {
    org.apache.spark.sql.graft.GraftFunctionRegistry.register(spark)
    val got = spark.sql(
      "SELECT float_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
        "CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d").head.getDouble(0)
    assert(got == 11.0)
    val cos = spark.sql(
      "SELECT float_cosine_distance(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), " +
        "CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS d").head.getDouble(0)
    assert(cos == 1.0, "orthogonal vectors: cosine distance 1")
  }

  test("langid stream ≡ batch langid_ngram: frozen-model map-only scoring, per-doc equality") {
    val dir = "/root/testdata/sf0.001"
    val m = graft.ops.TextOps.fitLangidModel(spark, dir).get
    val batch = graft.ops.TextOps.langidNgram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val src = Files.createTempDirectory("graft-langid-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = StreamingIndex.langidStream(stream, m)
      .writeStream.format("memory").queryName("langid_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM langid_eq").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch, "closure scorer must be bit-equal to the batch join form")
    assert(batch.values.exists(_.nonEmpty))
  }

  test("semantic decontamination stream ≡ batch: frozen benchmark closure, per-doc equality") {
    val dir = "/root/testdata/sf0.001"
    val bench = graft.ops.Curation.benchEmbedFrozen(spark, dir)
    assert(bench.nonEmpty, "fixture must have benchmark docs (% 50 = 0)")
    val batch = graft.ops.Curation.semanticDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val src = Files.createTempDirectory("graft-semdecon-eq").resolve("docs").toString
    // the arriving stream is UNFILTERED — benchmark docs (% 50 = 0)
    // included, so the operator's own in-stream exclusion is what
    // keeps them from flagging ~1.0 against themselves (the batch
    // corpus-side contract, enforced inside semanticDecontamStream)
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(src)
    val q = StreamingIndex.semanticDecontamStream(stream, bench)
      .writeStream.format("memory").queryName("semdecon_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM semdecon_eq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch,
      "closure scorer must flag the same docs with bit-equal sims as the batch broadcast join")
    assert(batch.nonEmpty, "the fixture corpus must contain at least one flagged leak")
  }

  test("media alignment stream ≡ batch: row-local pair scoring, per-pair equality") {
    import graft.ops.Multimodal
    val dir = "/root/testdata/sf0.001"
    // the shared kernel is TOTAL: null-align rows (missing caption —
    // the batch LEFT join's unmatched side) compare too
    val batch = Multimodal.mediaTextAlign(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))).toMap
    // the arriving stream carries (payload, caption) pairs — the
    // crawler's output shape — built by the same fixture convention
    // (LEFT join: a pair whose caption doc is missing still arrives,
    // with a NULL caption)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val caps = d.select(col("doc_id").as("caption_id"),
      array_join(slice(split(col("text"), " "), 1, Multimodal.CaptionWords), " ").as("caption"))
    val src = Files.createTempDirectory("graft-mta-eq").resolve("pairs").toString
    d.select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("caption_id",
        when(col("media_id") % 11 === 3, col("media_id") + 1).otherwise(col("media_id")))
      .join(caps, Seq("caption_id"), "left")
      .select("media_id", "caption_id", "payload", "caption")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("media_id LONG, caption_id LONG, payload BINARY, caption STRING")
      .parquet(src)
    val q = StreamingIndex.mediaAlignStream(stream)
      .writeStream.format("memory").queryName("mta_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM mta_eq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch,
      "row-local pair scoring must equal the batch two-tower join per pair")
    assert(batch.values.exists(_._3 == 0) && batch.values.exists(_._3 == 1),
      "the fixture must exercise both keep outcomes")
  }

  test("blocklist gate stream ≡ batch per-source decisions; license stream folds to the batch report") {
    import graft.ops.Curation
    val dir = "/root/testdata/sf0.001"
    // batch truth: the registered per-source rollup
    val batch = Curation.urlFilter(spark, dir).collect()
      .map(r => r.getString(0) -> (Option(r.getString(2)), r.getInt(3))).toMap
    val src = Files.createTempDirectory("graft-blgate").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING")
      .parquet(src)
    val q = StreamingIndex.blocklistGateStream(stream,
        Curation.BlockedSourcesExact.toSet, Seq(Curation.BlockedSourcePattern))
      .select("doc_id", "source", "rule", "keep")
      .writeStream.format("memory").queryName("bl_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM bl_eq").collect()
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      val (rule, keep) = (Option(r.getString(2)), r.getInt(3))
      assert(batch(r.getString(1)) == ((rule, keep)),
        s"doc ${r.getLong(0)} (${r.getString(1)}): stream gate $rule/$keep " +
          s"must agree with the batch rollup ${batch(r.getString(1))}")
    }
    assert(streamed.exists(_.getInt(3) == 0) && streamed.exists(_.getInt(3) == 1),
      "the fixture must exercise both gate outcomes")

    // license scorer: per-doc marker rows fold to the batch report
    val q2 = StreamingIndex.licenseScoreStream(stream, Curation.LicenseMarkers)
      .writeStream.format("memory").queryName("lic_eq").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val folded = spark.sql(
      """SELECT source, marker, SUM(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END),
        |  SUM(n_matches) FROM lic_eq GROUP BY source, marker""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val report = Curation.licenseReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4), r.getLong(5))).toMap
    report.foreach { case (k, v) =>
      assert(folded.getOrElse(k, (0L, 0L)) == v,
        s"$k: stream fold ${folded.get(k)} must equal the batch report $v")
    }
    assert(report.values.exists(_._2 > 0), "at least one marker fires on the fixture")
  }

  test("repetition scrub stream ≡ batch: the row-local kernel runs unchanged on a stream") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.ops.Dedup.repetitionScrub(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val src = Files.createTempDirectory("graft-rep-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(src)
    val q = StreamingIndex.repetitionScrubStream(stream)
      .writeStream.format("memory").queryName("rep_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM rep_eq").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch, "one shared projection — per-doc bit equality")
    assert(batch.nonEmpty)
  }

  test("coarse repetition scrub stream ≡ batch on planted long self-copies") {
    import spark.implicits._
    val h14 = (1 to 14).map(i => s"g$i")
    val h10 = (1 to 10).map(i => s"h$i")
    val docs = Seq(
      (1L, (h14 ++ Seq("m1", "m2") ++ h14).mkString(" ")),   // coarse cut
      (2L, (h10 ++ Seq("m1") ++ h10).mkString(" ")),          // signal, no cut
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")))         // clean
    val dir = Files.createTempDirectory("graft-repc-eq").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.ops.Dedup.repetitionScrubCoarse(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(batch(1L)._3 == 14L && batch(2L)._3 == 0L && batch(2L)._2 > 0L,
      s"planted coarse semantics: $batch")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(s"$dir/documents.parquet")
    val q = StreamingIndex.repetitionScrubCoarseStream(stream)
      .writeStream.format("memory").queryName("repc_eq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM repc_eq").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(streamed == batch, "one shared projection — per-doc bit equality")
  }

  test("hostile doc shapes stream ≡ batch across the map-only twins (fixture-trait coverage)") {
    import spark.implicits._
    // the tools/make_hostile_fixture.py trait set, replayed through
    // the streaming twins: empty, whitespace-only, leading/trailing/
    // double spaces, near-miss codec magic, a 64-byte frame-edge
    // text, and both repetition grains — every row-local kernel must
    // produce bit-identical rows at stream arrival
    val h14 = (1 to 14).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (0L, ""), (1L, "   "), (2L, " lead pad one two three"),
      (3L, "trail pad one two three "), (4L, "dbl  space one two three"),
      (5L, "GIF89a d15w15x0 d15w22x1 d15w29x2"),
      (6L, "BM d19w19x0 d19w26x1 d19w33x2"),
      (7L, ("frameedge alpha bravo charlie delta echoes foxtrots golfing hh zz").take(64)),
      (8L, s"$h14 mid1 mid2 $h14"),
      (9L, "echo foxtrot golf hotel a1 a2 echo foxtrot golf hotel tail"))
    val dir = Files.createTempDirectory("graft-hostile-eq").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(s"$dir/documents.parquet")
    def key5(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    // fine grain
    val fineB = graft.ops.Dedup.repetitionScrub(spark, dir).collect().map(key5).toMap
    val q1 = StreamingIndex.repetitionScrubStream(stream)
      .writeStream.format("memory").queryName("hx_fine").outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.sql("SELECT * FROM hx_fine").collect().map(key5).toMap == fineB)
    assert(fineB(9L)._2 > 0L, "scattered 4-word phrase must flag at the fine grain")
    // coarse grain
    val coarseB = graft.ops.Dedup.repetitionScrubCoarse(spark, dir).collect().map(key5).toMap
    val q2 = StreamingIndex.repetitionScrubCoarseStream(stream)
      .writeStream.format("memory").queryName("hx_coarse").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.sql("SELECT * FROM hx_coarse").collect().map(key5).toMap == coarseB)
    assert(coarseB(8L)._3 == 14L, "replayed 14-word head must cut at the coarse grain")
    assert(coarseB(9L)._3 == 0L, "coarse grain is structurally blind to the 4-word phrase")
    // gopher curation (map-only signals over the same hostile rows)
    val curB = StreamingIndex.curationStream(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val q3 = StreamingIndex.curationStream(stream)
      .writeStream.format("memory").queryName("hx_cur").outputMode("append").start()
    q3.processAllAvailable(); q3.stop()
    val curS = spark.sql("SELECT * FROM hx_cur").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(curS == curB, "gopher signals bit-equal on every hostile shape incl. empty/whitespace docs")
    assert(curB.size == docs.size, "no hostile row may vanish from the curation stream")
  }

  test("maximal scrub stream ≡ batch indexed scrub: variable-length islands at stream arrival") {
    val dir = "/root/testdata/sf0.001"
    graft.ops.Dedup.writeMaximalIndex(spark, dir, "mx_idx_stream")
    val batch = graft.ops.Dedup.maximalScrubIndexed(spark, dir, "mx_idx_stream")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val src = Files.createTempDirectory("graft-mx-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
      .select("ts", "doc_id", "text")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("ts TIMESTAMP, doc_id LONG, text STRING")
      .parquet(src)
    val q = StreamingIndex.maximalScrubStream(stream, spark, "mx_idx_stream")
      .writeStream.format("memory").queryName("mx_eq").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM mx_eq").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch,
      "streaming island reassembly must rebuild byte-identically to the batch probe")
    assert(batch.nonEmpty)
  }

  test("substring scrub stream ≡ batch indexed scrub: stream-static probe, per-doc equality") {
    val dir = "/root/testdata/sf0.001"
    graft.ops.Dedup.writeSubstrIndex(spark, dir, "substr_idx_stream")
    val batch = graft.ops.Dedup.substrScrubIndexed(spark, dir, "substr_idx_stream")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val src = Files.createTempDirectory("graft-substr-eq").resolve("docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
      .select("ts", "doc_id", "text")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("ts TIMESTAMP, doc_id LONG, text STRING")
      .parquet(src)
    val q = StreamingIndex.substrScrubStream(stream, spark, "substr_idx_stream")
      .writeStream.format("memory").queryName("substr_eq").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM substr_eq").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch, "streaming scrub must rebuild byte-identically to batch")
    assert(batch.nonEmpty)
  }
}
