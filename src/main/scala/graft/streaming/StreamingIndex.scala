package graft.streaming

import graft.embed.{EmbedOps, Embedder, HashEmbedder}
import graft.ingest.Chunker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Incremental indexer: the Structured Streaming form of the batch
  * index build (SURVEY §7.6 extension — the reference is one-shot
  * batch, `index.py:322-407`; this adds what a continuously-fed log
  * pipeline needs).
  *
  * Source: file stream of text documents. Transform: same chunk →
  * embed dataflow as batch (code shared, so semantics cannot
  * drift). Sink: parquet append with checkpointing, or
  * `foreachBatch` for upsert-style maintenance. Also ships a
  * watermarked event-rate monitor as the streaming windowed-agg
  * surface.
  */
object StreamingIndex {

  /** `(source, content)` stream → chunk+embedding stream. Map-only:
    * safe under any output mode, no state store needed. */
  def chunkEmbedStream(
      files: DataFrame,
      chunkSize: Int = Chunker.DefaultChunkSize,
      embedder: Embedder = HashEmbedder.default): DataFrame =
    EmbedOps.withEmbedding(
      Chunker.chunkDF(files, "source", "content", chunkSize), "text", "embedding", embedder)

  /** File-source incremental index: watches `inDir` for new text
    * files (one doc per file via `wholetext`), appends chunk rows to
    * the parquet index. `maxFilesPerTrigger` bounds batch size so a
    * backlog cannot OOM an executor. */
  def fileIndexStream(
      spark: SparkSession,
      inDir: String,
      indexDir: String,
      checkpointDir: String,
      chunkSize: Int = Chunker.DefaultChunkSize): DataStreamWriter[Row] = {
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", 64)
      .load(inDir)
      .select(
        graft.ingest.Sources.relativeSource(input_file_name(), inDir).as("source"),
        col("value").as("content"))
    chunkEmbedStream(files, chunkSize)
      .writeStream
      .format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
  }

  /** Upsert-style incremental index via `foreachBatch` + dynamic
    * partition overwrite — the streaming fix for quirk Q3: the
    * reference deletes the WHOLE collection on re-index
    * (`index.py:426-429`); here a re-arrived document version
    * replaces only its own source partition and untouched sources
    * keep their chunks. The logical source strips a `.vN` version
    * suffix, so `app.log.v2` supersedes `app.log.v1`'s chunks (file
    * streams never re-read a mutated path, so re-ingest arrives as
    * a new version file). At scale this is the maintenance pattern
    * for a continuously-fed 100 TB index: per-partition overwrite
    * touches only the changed slices. */
  def upsertIndexStream(
      spark: SparkSession,
      inDir: String,
      indexDir: String,
      checkpointDir: String,
      chunkSize: Int = Chunker.DefaultChunkSize): DataStreamWriter[Row] = {
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", 64)
      .load(inDir)
      .select(
        regexp_replace(
          graft.ingest.Sources.relativeSource(input_file_name(), inDir),
          "\\.v\\d+$", "").as("source"),
        col("value").as("content"))
    chunkEmbedStream(files, chunkSize)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("source")
          .parquet(indexDir)
      }
      .trigger(Trigger.AvailableNow())
  }

  /** Continuous ANN-index maintenance: a file stream of vector
    * batches (parquet rows `vec_id, label, embedding`) is appended
    * into the MATERIALIZED graph and PQ indexes per micro-batch —
    * [[graft.ops.GraphAnn.appendGraphIndex]] adds each batch as fresh
    * graph segments, [[graft.ops.Pq.appendPqIndex]] encodes it with
    * the frozen codebooks, and (when `ivfIndexDir` is set)
    * [[graft.ops.KMeansVec.appendIvfIndex]] assigns it against the
    * frozen coarse centroids — so searches see new vectors without a
    * full index rebuild, the same continuous-ingest contract the
    * flat-index upsert above gives the chunk store.
    * [[graft.ops.GraphAnn.maintainGraphIndex]] is the merge policy
    * that bounds segment accumulation — run it from the same periodic
    * maintenance job that retrains codebooks, swapping the live
    * pointer when it reports a compaction. `maxFilesPerTrigger`
    * bounds a backlog.
    *
    * Delivery: foreachBatch is at-least-once — checkpointed source
    * offsets never re-read a processed file in normal operation, but
    * a crash BETWEEN the appends can replay a batch, and the default
    * appends assume batch vec_ids are new, so a replay would
    * duplicate rows. `idempotent = true` closes exactly that window,
    * per structure by the mechanism its layout supports:
    *  - graph: segment shard ids become a pure function of the
    *    micro-batch id and the write is a dynamic partition OVERWRITE
    *    (`appendGraphIndex(segmentTag)`) — a replay rewrites its own
    *    `shard=N/` dirs, the standard Spark idempotent-sink pattern;
    *  - PQ / IVF / IVF-PQ / SQ: `dedupeExisting` anti-joins the batch
    *    against the existing rows first (pruned to the batch's own
    *    cells where the layout is partitioned), so replayed or
    *    partially-applied batches CONVERGE at the row level.
    * The default stays false: ingest of provably-fresh ids skips the
    * existing-row scans and keeps append strictly map-only. */
  def annAppendStream(
      spark: SparkSession,
      inDir: String,
      graphIndexDir: String,
      pqIndexDir: String,
      checkpointDir: String,
      ivfIndexDir: Option[String] = None,
      ivfPqIndexDir: Option[String] = None,
      sqIndexDir: Option[String] = None,
      idempotent: Boolean = false): DataStreamWriter[Row] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.GraphAnn.appendGraphIndex(batch.sparkSession, graphIndexDir, batch,
          segmentTag = if (idempotent) Some(batchId) else None)
        graft.ops.Pq.appendPqIndex(batch.sparkSession, pqIndexDir, batch,
          dedupeExisting = idempotent)
        ivfIndexDir.foreach(d =>
          graft.ops.KMeansVec.appendIvfIndex(batch.sparkSession, d, batch,
            dedupeExisting = idempotent))
        ivfPqIndexDir.foreach(d =>
          graft.ops.Pq.appendIvfPqIndex(batch.sparkSession, d, batch,
            dedupeExisting = idempotent))
        sqIndexDir.foreach(d =>
          graft.ops.Quantize.appendSqIndex(batch.sparkSession, d, batch,
            dedupeExisting = idempotent))
      }
      .trigger(Trigger.AvailableNow())
  }

  /** Streaming curation filter — the gopher quality gate applied to a
    * document stream, scoring and flagging each arriving doc with the
    * SAME shared column definitions as the batch `gopher_quality`
    * query ([[graft.ops.Curation.gopherScore]] — one definition,
    * semantics cannot drift). The scoring is map-only array HOFs, so
    * the stream needs no state store, no watermark, and no shuffle:
    * unbounded ingest throughput, the property that makes quality
    * filtering the FIRST stage of a streaming curation pipeline
    * (drop early, embed/index only survivors — compose with
    * [[dedupStream]] and [[chunkEmbedStream]] downstream). Callers
    * filter `keep = 1` to curate or keep the full scores to audit. */
  def curationStream(docs: DataFrame): DataFrame =
    graft.ops.Curation.gopherScore(docs)

  /** Streaming DSIR scorer — the importance-resampling front half on
    * a document stream, train-on-history / score-the-stream: the
    * frozen hashed-n-gram model (two ≤512-bucket marginals + totals,
    * parameter-bounded by construction) rides the closure, so
    * scoring is MAP-ONLY — no state store, no watermark, no shuffle,
    * unbounded throughput (the StreamingDedup shape). Shares
    * [[graft.ops.Dsir.scoreUdf]]'s arithmetic with the batch query
    * verbatim — batch ≡ stream row equality asserted in
    * StreamingSpec. Selection (the Gumbel-top-k back half) stays a
    * batch/window concern downstream. */
  def dsirScoreStream(docs: DataFrame,
      model: Map[Long, (Long, Long)], tr: Long, tt: Long): DataFrame =
    docs
      // the batch dsirWeights drops null-text docs structurally (the
      // feature explode of NULL yields no rows) — the stream must
      // drop them too or the batch ≡ stream contract breaks
      .filter(col("text").isNotNull)
      .withColumn("sc", graft.ops.Dsir.scoreUdf(model, tr, tt)(col("text")))
      .select(col("doc_id"), col("lang"),
        col("sc._1").as("n_feats"), col("sc._2").as("logw"))

  /** Streaming quality-model scorer — train-on-history /
    * score-the-stream for the learned ridge model: the THREE frozen
    * coefficients ([[graft.ops.QualityModel.fitWeights]] on the
    * historical corpus) ride as literals, and scoring is the ONE
    * shared map-only projection ([[graft.ops.QualityModel.scoreWith]])
    * — no state store, no watermark, no shuffle; batch ≡ stream row
    * equality asserted in StreamingSpec. A model refresh is a stream
    * restart with refitted weights (model swap, not state
    * migration — the dsirScoreStream convention). Ranking/top-k
    * stays a batch/window concern downstream. */
  def qualityScoreStream(
      docs: DataFrame, w1: Double, w2: Double, w3: Double): DataFrame =
    graft.ops.QualityModel.scoreWith(docs.filter(col("text").isNotNull), w1, w2, w3)

  /** Streaming Bloom decontamination — the same train-on-history /
    * score-the-stream split as [[dsirScoreStream]]: the 2 KB
    * benchmark bitset ([[graft.ops.Bloom.benchBitset]], frozen at
    * stream start) rides the closure, and scoring is MAP-ONLY via
    * the ONE shared [[graft.ops.Bloom.scoreDocs]] definition — no
    * state store, no watermark, no shuffle. A benchmark refresh is a
    * stream restart with a rebuilt bitset (model swap, not state
    * migration). */
  def bloomScoreStream(docs: DataFrame, bits: java.util.BitSet): DataFrame =
    graft.ops.Bloom.scoreDocs(docs, bits)

  /** Streaming quantizer-drift scorer — the continuous-ingest half
    * of [[graft.ops.KMeansVec.indexDriftReport]]'s contract: the
    * frozen K·dim quantizer (the index sidecar in production) rides
    * the closure, every arriving vector scores its quantization
    * error through the ONE shared definition
    * ([[graft.ops.KMeansVec.driftErrors]] — batch ≡ stream
    * bit-for-bit), map-only with no state store; a foreachBatch
    * consumer aggregates each micro-batch's mean error against the
    * train-time baseline and triggers the retrain-rewrite once the
    * ratio crosses [[graft.ops.KMeansVec.DriftRetrainRatio]]. */
  def driftScoreStream(
      vecs: DataFrame, cents: Array[Array[Double]]): DataFrame =
    graft.ops.KMeansVec.driftErrors(
      vecs.filter(col("embedding").isNotNull), cents)

  /** Streaming language ID — train-on-history, score-the-stream:
    * the frozen NB model (`TextOps.fitLangidModel`, batch-fit on the
    * historical corpus) rides the closure of one map-only UDF, so
    * classifying a document stream needs no state store, no
    * watermark, and no shuffle; a nightly-refit model takes effect
    * by restarting with the new closure. Predictions are bit-equal
    * to the batch `langid_ngram` scorer (StreamingSpec pins the
    * equality per doc). */
  def langidStream(
      docs: DataFrame, m: graft.ops.TextOps.LangidModel): DataFrame =
    docs.select(col("doc_id"),
      graft.ops.TextOps.langidPredictUdf(m)(col("text")).as("lang_pred"))

  /** Streaming semantic decontamination — continuous-ingest
    * deployments decontaminate ON ARRIVAL, not in nightly batches:
    * the frozen benchmark embeddings
    * ([[graft.ops.Curation.benchEmbedFrozen]], tiny by the
    * decontaminate size rule — the same fact that lets the batch
    * join broadcast) ride the closure of ONE map-only UDF, so each
    * arriving document embeds, scores against every benchmark
    * vector, and emits its best match above the threshold — no state
    * store, no watermark, no shuffle (the langidStream shape). A
    * benchmark refresh is a stream restart with re-collected
    * embeddings (model swap, not state migration). Flagged rows are
    * bit-equal to the batch [[graft.ops.Curation.semanticDecontaminate]]
    * (StreamingSpec pins the per-doc equality) — INCLUDING the
    * batch's benchmark exclusion: a benchmark doc (the fixture's
    * `doc_id % 50 = 0` convention) that leaks into the arriving
    * stream would score ~1.0 against itself and flag spuriously, so
    * the stream drops it exactly as the batch corpus side does. */
  def semanticDecontamStream(
      docs: DataFrame, bench: Array[(Long, Array[Float], Double)]): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .filter(col("doc_id") % 50 =!= 0)
      .withColumn("m",
        graft.ops.Curation.semanticDecontamPredictUdf(bench)(col("text")))
      .filter(col("m").isNotNull)
      .select(col("doc_id"), col("m._1").as("bench_id"), col("m._2").as("sim"))

  /** Streaming media–text alignment — (payload, caption) pairs
    * arrive TOGETHER (the crawler emits an asset with its harvested
    * alt-text), so alignment scoring is intrinsically map-only: both
    * towers embed in the row, the cosine and threshold are row-local
    * — no state store, no watermark, no shuffle. IS the batch kernel
    * ([[graft.ops.Multimodal.alignPairs]] — one definition, batch ≡
    * stream cannot drift; StreamingSpec pins per-pair equality),
    * totality included: a null caption/payload or zero-norm tower
    * emits `keep = 0` with a NULL score rather than vanishing from
    * the audit. */
  def mediaAlignStream(pairs: DataFrame): DataFrame =
    graft.ops.Multimodal.alignPairs(pairs)

  /** Streaming substring scrub — arriving documents are cut of every
    * 15-word window present in the PERSISTED corpus index
    * (`Dedup.writeSubstrIndex`), continuously: the window stream
    * LEFT-joins the static bucketed hash table (stream-static joins
    * are STATELESS — the index is re-read per micro-batch, so a
    * compaction/append takes effect without restarting), and the
    * per-doc reassembly is one watermarked aggregation whose state
    * is bounded by horizon × arrival rate (each doc's group closes
    * when the watermark passes its window). `posexplode_outer` keeps
    * short docs total; same byte-exact rebuild row as the batch
    * `substr_scrub_incremental` (the spec pins per-doc equality). */
  def substrScrubStream(
      docs: DataFrame, s: SparkSession, table: String): DataFrame = {
    import graft.ops.Dedup
    // fail at stream CONSTRUCTION if the persisted index predates the
    // current hash derivation — a stale generation would quietly miss
    // every split-parity-affected window for the stream's lifetime
    Dedup.requireIndexFormat(s, table)
    val idx = s.table(table).withColumn("hit", lit(1))
    docs
      .select(col("ts"), col("doc_id"), col("text"),
        posexplode_outer(Dedup.substrWinUdf(col("text"))).as(Seq("pos", "h")))
      .join(idx, Seq("h"), "left_outer")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("doc_id"), col("text"))
      .agg(sort_array(collect_list(when(col("hit") === 1, col("pos")))).as("starts"))
      .withColumn("clean", Dedup.substrScrubUdf(col("text"), col("starts")))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (size(split(col("text"), " ")) -
          when(col("clean") === "", 0)
            .otherwise(size(split(col("clean"), " ")))).cast("long").as("n_removed"),
        length(col("clean")).cast("long").as("len_clean"),
        graft.functions.CrossHash.md5Hash60Col(col("clean")).as("clean_h"))
  }

  /** Streaming VARIABLE-LENGTH (maximal) scrub — the
    * [[substrScrubStream]] twin at the [[graft.ops.Dedup
    * .MaximalAtomWords]] grain: arriving documents probe the
    * persisted corpus index (`Dedup.writeMaximalIndex` — membership
    * suffices, an arrival is never the corpus first), the
    * watermarked per-doc aggregation collects each doc's duplicated
    * window positions (state bounded by horizon × arrival rate), and
    * island reassembly + the ≥ [[graft.ops.Dedup
    * .MaximalMinSpanWords]] cut + the byte-exact rebuild run in ONE
    * per-doc kernel ([[graft.ops.Dedup.maximalCleanOf]]) — the
    * islands need no second shuffle because the positions are
    * already grouped. Stream-static join: the index re-reads per
    * micro-batch, so append/compact generations take effect without
    * a restart. Bit-equal to the batch [[graft.ops.Dedup
    * .maximalScrubIndexed]] (StreamingSpec pins per-doc equality). */
  def maximalScrubStream(
      docs: DataFrame, s: SparkSession, table: String): DataFrame = {
    import graft.ops.Dedup
    Dedup.requireIndexFormat(s, table)
    // DISTINCT membership: appended segments may re-insert a hash,
    // and a duplicated index row would double the joined position —
    // the fold is on the bucketing key, so it never shuffles
    val idx = s.table(table).select(col("h")).distinct().withColumn("hit", lit(1))
    docs
      .select(col("ts"), col("doc_id"), col("text"),
        posexplode_outer(Dedup.maximalWinUdf(col("text"))).as(Seq("pos", "h")))
      .join(idx, Seq("h"), "left_outer")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("doc_id"), col("text"))
      .agg(sort_array(collect_list(when(col("hit") === 1, col("pos")))).as("badpos"))
      .withColumn("clean", Dedup.maximalCleanUdf(col("text"), col("badpos")))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (size(split(col("text"), " ")) -
          when(col("clean") === "", 0)
            .otherwise(size(split(col("clean"), " ")))).cast("long").as("n_removed"),
        length(col("clean")).cast("long").as("len_clean"),
        graft.functions.CrossHash.md5Hash60Col(col("clean")).as("clean_h"))
  }

  /** Streaming source-blocklist gate — the per-DOCUMENT grain of the
    * batch [[graft.ops.Curation.urlFilterAgainst]] decision, applied
    * on arrival: the config-sized blocklist rides the closure (the
    * frozen-model convention — a list refresh is a stream restart),
    * so gating is MAP-ONLY: no state store, no watermark, no
    * shuffle. Each arriving doc gains (rule, keep); exact wins over
    * pattern, and `find`-semantics match the batch `rlike` arm
    * (StreamingSpec pins per-source agreement with the batch
    * rollup). Compose ahead of [[curationStream]]: a blocked source
    * should never cost a quality score. */
  def blocklistGateStream(
      docs: DataFrame, exact: Set[String], patterns: Seq[String]): DataFrame = {
    val compiled = patterns.map(java.util.regex.Pattern.compile)
    val ruleUdf = udf { (src: String) =>
      if (src != null && exact.contains(src)) Some("exact")
      else if (src != null && compiled.exists(_.matcher(src).find())) Some("pattern")
      else None
    }
    docs
      .withColumn("rule", ruleUdf(col("source")))
      .withColumn("keep", when(col("rule").isNull, 1).otherwise(0))
  }

  /** Streaming license/robots-signal scorer — the per-DOCUMENT grain
    * of [[graft.ops.Curation.licenseReportFor]]: every marker counts
    * in ONE map-side projection per arriving doc (the compiled-
    * config convention), emitting one (doc_id, marker, class,
    * n_matches) row per marker. Map-only; a downstream watermarked
    * aggregation (or the batch report) rolls flags up per source.
    * StreamingSpec pins that stream rows fold to the batch report's
    * per-source totals. */
  def licenseScoreStream(
      docs: DataFrame, markers: Seq[(String, String, String)]): DataFrame = {
    val cnts = markers.zipWithIndex.map { case ((_, pat, _), i) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"c$i")
    }
    val stackExpr = markers.zipWithIndex
      .map { case ((m, _, cls), i) => s"'$m', '$cls', c$i" }
      .mkString(", ")
    docs
      .filter(col("text").isNotNull)
      .select(Seq(col("doc_id"), col("source")) ++ cnts: _*)
      .selectExpr("doc_id", "source",
        s"stack(${markers.size}, $stackExpr) AS (marker, license_class, n_matches)")
  }

  /** Streaming intra-doc repetition scrub — the cheapest curation
    * stage there is, streamed: detection, islands, the span cut and
    * the byte-exact rebuild are all INSIDE one row
    * ([[graft.ops.Dedup.repetitionScored]] — the SAME projection as
    * the batch query, so batch ≡ stream cannot drift), which makes
    * the stream map-only: no state store, no watermark, no shuffle,
    * no index — run it FIRST in a streaming curation pipeline (drop
    * repeated mass before embedding/indexing survivors). */
  def repetitionScrubStream(docs: DataFrame): DataFrame =
    graft.ops.Dedup.repetitionScored(docs.filter(col("text").isNotNull))

  /** [[repetitionScrubStream]] at the coarse cross-doc grain (8/12,
    * [[graft.ops.Dedup.repetitionScrubCoarse]]) — the same shared
    * row-local projection, so the stream IS the batch kernel: no
    * state store, no watermark, no shuffle. */
  def repetitionScrubCoarseStream(docs: DataFrame): DataFrame =
    graft.ops.Dedup.repetitionScoredCoarse(docs.filter(col("text").isNotNull))

  /** Streaming anomaly scorer — train-on-history, score-the-stream:
    * watermarked hourly tumbling counts per event type, stream-static
    * joined to a batch-trained stats table (`Events.hourlyStats`),
    * z-scored with the SAME shared formula as the batch query
    * (`Events.zScore` — one definition, semantics cannot drift).
    * Append mode emits each hour once, when the watermark closes it;
    * the static stats side is re-broadcast per micro-batch, so a
    * nightly-retrained stats table takes effect without restarting
    * the stream. */
  def anomalyScoreStream(events: DataFrame, stats: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(stats), "event_type")
      .select(col("window.start").as("hour"), col("event_type"),
        col("c").as("n"), graft.ops.Events.zScore(col("c")).as("z"))
      .withColumn("is_anomaly", (abs(col("z")) > 3.0).cast("int"))

  /** Watermarked sliding-window event-rate monitor: late data beyond
    * 10 minutes is dropped, state is bounded by the watermark. */
  def eventRateStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming extraction-artifact gate — release QA applied ON
    * INGEST: per-doc entity/tag/URL/escape counters and the keep
    * flag, the SAME projection as the batch report's row half
    * ([[graft.ops.Curation.markupFlagsOf]], shared verbatim — the
    * langidStream frozen-closure shape, except here there isn't even
    * a model: pure codegen'd regex counters, map-only, no state, no
    * watermark, unbounded throughput). Folding the emitted rows by
    * source reproduces the batch report exactly (StreamingSpec). */
  def markupGateStream(docs: DataFrame): DataFrame =
    graft.ops.Curation.markupFlagsOf(docs)

  /** Streaming encoding-damage gate — [[markupGateStream]]'s twin
    * over the mojibake counters: the SAME row-local projection as
    * the batch report ([[graft.ops.Curation.mojibakeFlagsOf]],
    * shared verbatim), pure codegen'd code-point-class counters,
    * map-only, no state, no watermark. Folding the emitted rows by
    * source reproduces the batch report exactly (StreamingSpec). */
  def mojibakeGateStream(docs: DataFrame): DataFrame =
    graft.ops.Curation.mojibakeFlagsOf(docs)

  /** Streaming synthetic-text gate — the LLM-boilerplate
    * contamination check applied ON INGEST (the one place it
    * actually prevents model collapse: before the doc enters the
    * pool). Row half shared verbatim with the batch report
    * ([[graft.ops.Curation.syntheticHitsOf]]); literal
    * replace/length arithmetic, map-only, no state. */
  def syntheticGateStream(docs: DataFrame): DataFrame =
    graft.ops.Curation.syntheticHitsOf(docs)

  case class CapDoc(doc_id: Long, source: String)
  case class CapDecision(doc_id: Long, source: String, keep: Int)

  /** Streaming domain cap — the arrival-order twin of
    * [[graft.ops.Curation.sourceCapSample]]'s cap, gating ON INGEST:
    * each source's first `cap` docs pass, later arrivals flag
    * keep=0 the moment they arrive (a crawl frontier throttling a
    * mega-host before it floods the corpus). State is ONE BIGINT
    * counter per source — parameter-bounded by source cardinality,
    * never by stream lifetime — and carries across micro-batches,
    * so a cap that straddles a batch boundary gates exactly like
    * the batch arrival form ([[graft.ops.Curation.sourceCapArrivalOf]],
    * stream ≡ batch pinned in StreamingSpec). Arrival order within
    * a micro-batch is doc_id (the repo's explicit-arrival
    * convention, same as the incremental scrubs) — deciding WHICH
    * docs cross the cap boundary therefore buffers and sorts the
    * source's micro-batch slice in one task, a cost bounded by
    * micro-batch size × source skew, NOT by stream lifetime. The
    * buffer exists only while the source is still BELOW cap: once
    * the counter saturates, every later arrival flags keep=0
    * whatever its intra-batch order, so capped sources stream
    * through unbuffered (the mega-host flood case is exactly the
    * one that never pays the buffer). */
  def sourceCapStream(
      docs: DataFrame,
      cap: Int = graft.ops.Curation.CapDocsPerSource): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"))
      .as[CapDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, it: Iterator[CapDoc], state: GroupState[Long]) => {
          val seen = state.getOption.getOrElse(0L)
          if (seen >= cap) {
            // Saturated: every arrival is keep=0 regardless of
            // intra-batch order, and nothing downstream reads the
            // counter past cap — emit lazily, no buffer, no sort.
            state.update(seen)
            it.map(d => CapDecision(d.doc_id, src, 0))
          } else {
            val batch = it.toArray.sortBy(_.doc_id)
            val out = batch.zipWithIndex.map { case (d, i) =>
              CapDecision(d.doc_id, src, if (seen + i + 1 <= cap) 1 else 0)
            }
            // Saturate at cap: the counter's only reader is the cap
            // comparison, so min(total seen, cap) is the invariant.
            state.update(math.min(seen + batch.length, cap.toLong))
            out.iterator
          }
        })
      .toDF()
  }

  case class TransEvent(user_id: Long, event_type: String, ts_us: Long, event_id: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String, event_id: Long)
  case class LastEvent(event_type: String, ts_us: Long, event_id: Long)

  /** Streaming event-transition extraction — the stateful twin of
    * [[graft.ops.Events.eventTransitions]]'s pair step, running ON
    * INGEST: each user's arrival emits one (from → to) transition
    * against that user's PREVIOUS event, so the transition matrix is
    * a plain downstream count over this stream instead of a lookback
    * window over stored history. State is ONE (type, ts, id) triple
    * per user — user-cardinality-bounded, never stream-lifetime-
    * bounded (the [[sourceCapStream]] rule). Order within a
    * micro-batch is the repo's explicit (ts_us, event_id) arrival
    * convention — exact microseconds, the same total order as the
    * batch window — and the state triple carries sequences across
    * micro-batch boundaries (a pair straddling a boundary emits
    * exactly like the batch form; pinned in StreamingSpec). Folding
    * the emitted rows by (from_type, to_type) reproduces the batch
    * pair counts exactly. */
  def transitionStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    events
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[TransEvent], state: GroupState[LastEvent]) => {
          val (out, last) = transitionFold(uid, state.getOption, it.toSeq)
          last.foreach(state.update)
          out.iterator
        })
      .toDF()
  }

  /** The per-user micro-batch fold of [[transitionStream]] as a PURE
    * kernel (KernelPropertySpec law: folding any split of a sequence
    * into micro-batches emits exactly the single-batch transitions —
    * batch-boundary invariance, PROVIDED batches arrive in order,
    * the streaming source contract): sort the slice by the
    * (ts_us, event_id) arrival order, emit one transition per event
    * that has a predecessor (carried state included), return the new
    * last-event state. */
  private[graft] def transitionFold(
      uid: Long, state: Option[LastEvent], batch: Seq[TransEvent]):
      (Seq[Transition], Option[LastEvent]) = {
    val sorted = batch.sortBy(e => (e.ts_us, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer[Transition]()
    var last = state
    sorted.foreach { e =>
      last.foreach(l => out += Transition(uid, l.event_type, e.event_type, e.event_id))
      last = Some(LastEvent(e.event_type, e.ts_us, e.event_id))
    }
    (out.toSeq, last)
  }

  /** Streaming exact dedup — the streaming twin of
    * `Dedup.dedupExact`: re-arrivals of the same content fingerprint
    * are dropped for as long as the event-time watermark keeps their
    * key in state. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) is the scale-safe form: state is evicted at
    * the watermark horizon, so the store is bounded by horizon ×
    * arrival rate instead of growing with the stream's lifetime. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(col("content")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

  /** Watermarked stream-stream interval join — the streaming twin of
    * the batch banded range join (ops/Events.rangeJoinBanded): each
    * purchase matches every click in its preceding band. Spark
    * refuses stream-stream joins without an equality predicate, so
    * the SAME bucket rewrite the batch plan uses for scale is
    * load-bearing here: both sides carry a band-width bucket key
    * (the purchase side exploded into its bucket and the previous
    * one), the range predicate rides along as a residual, and the
    * time constraint + both watermarks let the state store evict
    * rows that can no longer match — state bounded by band +
    * watermark, not stream lifetime. */
  def attributionStream(
      purchases: DataFrame,
      clicks: DataFrame,
      bandSec: Int = 60): DataFrame = {
    val bandUs = bandSec * 1000000L
    val p = purchases.withWatermark("ts", "10 minutes")
      .withColumn("b0", expr(s"unix_micros(ts) div $bandUs"))
      .withColumn("b", explode(array(col("b0"), col("b0") - 1)))
      .drop("b0")
    val c = clicks.withWatermark("cts", "10 minutes")
      .withColumn("cb", expr(s"unix_micros(cts) div $bandUs"))
    p.join(c,
        col("b") === col("cb") &&
          col("cts") >= col("ts") - expr(s"interval $bandSec seconds") &&
          col("cts") <= col("ts"),
        "inner")
      .drop("b", "cb")
  }
}
