package graft

import graft.embed.{EmbedOps, Embedder, HashEmbedder, OllamaEmbedder, RemoteEmbedder, TransformerEmbedder}
import graft.index.{IndexManifest, VectorIndex}
import graft.ingest.{Chunker, Sources}
import graft.query.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing facade — the engine's equivalents of the reference's
  * two CLI entry points (`python index.py <repo>` and `python
  * ask.py`, log-vector `index.py:481-584` / `ask.py:276-326`). A
  * reference user switches by calling [[index]] then [[ask]].
  */
object Graft {

  case class IndexConfig(
      chunkSize: Int = Chunker.DefaultChunkSize,
      embedder: Embedder = HashEmbedder.default,
      numPartitions: Option[Int] = None)

  /** Batch index build: scan → sniff/decode → chunk → embed →
    * overwrite parquet index + manifest (the reference's
    * `process_repository` + `save_to_chromadb` + `save_metadata`
    * pipeline as one lazy map-only Spark plan). */
  def index(
      spark: SparkSession,
      corpusDir: String,
      indexPath: String,
      cfg: IndexConfig = IndexConfig()): IndexManifest = {
    val files = Sources.readTextFiles(spark, corpusDir)
    val chunks = Chunker.chunkDF(files, "source", "content", cfg.chunkSize)
    val embedded = EmbedOps.withEmbedding(chunks, "text", "embedding", cfg.embedder)
    val manifest = IndexManifest(
      indexed_at = java.time.Instant.now().toString,
      repository = corpusDir,
      embedding_type = cfg.embedder.kind,
      embedding_model = cfg.embedder.model,
      chunk_size = cfg.chunkSize,
      index_path = indexPath)
    VectorIndex.write(embedded, indexPath, manifest, cfg.numPartitions)
    manifest
  }

  case class AskResult(hits: DataFrame, context: String)

  /** The chunk id ("{basename}:{i}", quirk Q1) COLLIDES across
    * directories; (source, chunk_index) is the true unique key, so
    * retrieval scores and rejoins on a synthesized unique uid. */
  private def withUid(vectors: DataFrame): DataFrame =
    vectors.withColumn("_uid",
      concat_ws("\u0000", col("source"), col("chunk_index")))

  private def retrieve(vectors: DataFrame, question: String, k: Int,
      embedder: Embedder): DataFrame =
    Knn.topKWithFetch(
      withUid(vectors), EmbedOps.embedLiteral(question, embedder), k,
      idCol = "_uid", fetchCols = Seq("id", "source", "chunk_index", "text"))
      .drop("_uid")

  private def assembleOrEmpty(hits: DataFrame): String = {
    val cached = hits.cache()
    try {
      if (cached.isEmpty) "No relevant data found in the database."
      else Knn.assembleContext(cached).head().getString(0)
    } finally cached.unpersist()
  }

  /** The manifest must match the query-side embedder — a question
    * embedded in a different space returns plausible-looking
    * garbage with no error otherwise. */
  private def validate(manifest: IndexManifest, embedder: Embedder): Unit = {
    require(manifest.embedding_type == embedder.kind,
      s"index was built with embedding_type=${manifest.embedding_type}, " +
        s"query embedder is ${embedder.kind}")
    require(manifest.embedding_model == embedder.model,
      s"index was built with model=${manifest.embedding_model}, " +
        s"query embedder is ${embedder.model}")
  }

  /** Interactive-session handle — the REPL equivalent (the
    * reference keeps one ChromaDB collection + manifest open across
    * questions, `ask.py:298-326`). The vector index is cached once
    * (`persist`) so every question after the first skips the scan;
    * `close()` releases it. */
  final class AskSession private[Graft] (
      spark: SparkSession,
      val manifest: IndexManifest,
      vectors: DataFrame,
      embedder: Embedder) extends AutoCloseable {

    def ask(question: String, k: Int = 5): AskResult = {
      val hits = retrieve(vectors, question, k, embedder)
      AskResult(hits, assembleOrEmpty(hits))
    }

    /** Hybrid ask: keyword BM25 + vector cosine, fused by
      * reciprocal rank (ops.Retrieval's combiner on the LIVE index).
      * A hit scores 1/(60+r) per system it appears in (top-`depth`
      * lists; absence contributes 0 — standard RRF). Catches what
      * pure vector search misses: exact identifiers, error codes,
      * rare tokens the embedder smears. */
    def askHybrid(question: String, k: Int = 5, depth: Int = graft.ops.Retrieval.FuseDepth): AskResult = {
      val hits = retrieveHybrid(vectors, question, k, depth, embedder)
      AskResult(hits, assembleOrEmpty(hits))
    }

    override def close(): Unit = vectors.unpersist()
  }

  private def retrieveHybrid(vectors: DataFrame, question: String, k: Int,
      depth: Int, embedder: Embedder): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uids = withUid(vectors)
    val terms = HashEmbedder.tokenize(question).distinct.toSeq
    val kwTop = graft.ops.Retrieval
      .bm25Score(uids.select(col("_uid"), col("text")), "_uid", "text", terms)
      .filter(col("score") > 0) // a zero-score doc holds no keyword rank
      .orderBy(col("score").desc, col("_uid")).limit(depth)
      .withColumn("r_kw",
        // bounded ≤depth-row slice — see WindowKeys.boundedRankKey
        row_number().over(Window.partitionBy(
          graft.functions.WindowKeys.boundedRankKey(col("_uid")))
          .orderBy(col("score").desc, col("_uid"))))
      .select(col("_uid"), col("r_kw"))
    val vecTop = Knn
      .topK(uids.select(col("_uid"), col("embedding")),
        EmbedOps.embedLiteral(question, embedder), depth, idCol = "_uid")
      .withColumn("r_vec",
        row_number().over(Window.partitionBy(
          graft.functions.WindowKeys.boundedRankKey(col("_uid")))
          .orderBy(col("dist"), col("_uid"))))
      .select(col("_uid"), col("r_vec"))
    val fused = kwTop.join(vecTop, Seq("_uid"), "full_outer")
      .withColumn("fused",
        coalesce(lit(1.0) / (lit(60.0) + col("r_kw")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_vec")), lit(0.0)))
      .orderBy(col("fused").desc, col("_uid")).limit(k)
    uids.select(col("_uid"), col("id"), col("source"), col("chunk_index"), col("text"))
      .join(broadcast(fused.select(col("_uid"), col("fused"))), Seq("_uid"))
      // assembleContext orders ascending on `dist`; negated fused
      // score gives best-first with the same contract
      .withColumn("dist", -col("fused"))
      .drop("_uid", "fused")
      .orderBy(col("dist"), col("id"))
  }

  /** Backend endpoints for manifest-driven dispatch (reference env
    * defaults: EMBEDDING_SERVER / OLLAMA_HOST), plus the optional
    * local model directory that makes the `local` manifest tag run
    * fully in-process (the reference's SentenceTransformer path). */
  case class Backends(
      remoteUrl: String = "http://localhost:8080",
      ollamaUrl: String = "http://localhost:11434",
      localModelDir: Option[String] = None)

  object Backends {
    /** Backend URLs from the reference's env names (index.py/ask.py
      * read OLLAMA_HOST / EMBEDDING_SERVER from .env). Index-side and
      * ask-side MUST resolve identically: an index built against a
      * non-default host, opened by an ask session pointing at
      * localhost, would degrade every query embedding to the
      * zero-fallback vector with no error. GRAFT_LOCAL_MODEL points at
      * a local sentence-encoder export (safetensors + vocab) for the
      * in-process `local` backend. */
    def fromEnv(): Backends = Backends(
      remoteUrl = sys.env.getOrElse("EMBEDDING_SERVER", "http://localhost:8080"),
      ollamaUrl = sys.env.getOrElse("OLLAMA_HOST", "http://localhost:11434"),
      localModelDir = sys.env.get("GRAFT_LOCAL_MODEL"))
  }

  /** Manifest-driven embedder dispatch — the reference resolves the
    * query-side backend from the index's recorded `embedding_type`
    * (`ask.py:109-116`: ollama → per-text Ollama client, local →
    * in-process model, else → batched remote server). Here: the
    * offline-deterministic hash featurizer keeps its own tag, ollama
    * gets the zero-fallback stack, anything else the retrying remote
    * client — the same resolution order. */
  def embedderFor(
      manifest: IndexManifest,
      dim: Int = 64,
      backends: Backends = Backends()): Embedder =
    manifest.embedding_type match {
      case "hash" => new HashEmbedder(dim)
      case "ollama" =>
        OllamaEmbedder.resilient(backends.ollamaUrl, manifest.embedding_model, dim)
      case "local" =>
        backends.localModelDir match {
          // real in-process model: the reference's primary path
          // (index.py:72-111 loads a SentenceTransformer in-process)
          case Some(dir) => new TransformerEmbedder(dir)
          // no local weights configured: the reference's own
          // ImportError path falls back to the remote server
          // (ask.py:160-163) — same here, with the wrapper keeping the
          // manifest's `local` tag so validation stays consistent
          case None =>
            val fallback =
              RemoteEmbedder.withRetry(backends.remoteUrl, manifest.embedding_model, dim)
            new Embedder {
              override def dim: Int = fallback.dim
              override def model: String = fallback.model
              override def kind: String = "local"
              override def embed(texts: Seq[String]): Seq[Array[Float]] = fallback.embed(texts)
            }
        }
      case _ =>
        RemoteEmbedder.withRetry(backends.remoteUrl, manifest.embedding_model, dim)
    }

  /** Open an index letting the manifest choose the embedder — the
    * exact reference flow (load metadata, then dispatch on
    * embedding_type). */
  def openAuto(
      spark: SparkSession,
      indexPath: String,
      dim: Int = 64,
      backends: Backends = Backends()): AskSession = {
    val manifest = readManifestOrFail(spark, indexPath)
    // fail fast at open time, reference-style (ask.py checks backend
    // availability before answering): a down or dim-mismatched server
    // behind the zero-fallback stack would otherwise silently turn
    // every query embedding into a zero vector (empty kNN context)
    gateBackend(spark, indexPath, manifest, dim, backends)
    // dispatch and open share ONE manifest read — no second fetch, no
    // window for the manifest to change between dispatch and validate
    openWith(spark, indexPath, manifest, embedderFor(manifest, dim, backends))
  }

  /** Open-time availability + probe gate on the RAW (unwrapped) HTTP
    * client — probing the resilient wrapper would be useless, its
    * fallback swallows exactly the failures the gate must surface.
    * The probe embed additionally catches a live server whose model
    * emits a different dimensionality (availability alone cannot). */
  private def gateBackend(spark: SparkSession, indexPath: String,
      manifest: IndexManifest, dim: Int, backends: Backends): Unit = {
    def probe(e: Embedder, what: String): Unit =
      try e.embedOne("probe")
      catch {
        case ex: Exception => throw new IllegalStateException(
          s"$what probe embed failed (is the model's dimensionality $dim?): ${ex.getMessage}", ex)
      }
    manifest.embedding_type match {
      case "hash" => ()
      case "local" if backends.localModelDir.isDefined =>
        // in-process model gate: loading + one probe embed surfaces a
        // missing/corrupt export; the dim check compares against the
        // INDEXED vectors themselves (not the caller's dim param, which
        // AskCli can't know for an arbitrary model) — a wrong model dir
        // for this index fails fast instead of searching a mixed space
        val e = new TransformerEmbedder(backends.localModelDir.get)
        probe(e, s"local model ${backends.localModelDir.get}")
        VectorIndex.readVectors(spark, indexPath)
          .select(org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.col("embedding")))
          .head(1).headOption.map(_.getInt(0)).foreach { indexDim =>
          if (e.dim != indexDim)
            throw new IllegalStateException(
              s"local model ${backends.localModelDir.get} emits dim ${e.dim}, " +
                s"index vectors are dim $indexDim")
        }
      case "ollama" =>
        val raw = new OllamaEmbedder(backends.ollamaUrl, manifest.embedding_model, dim)
        if (!raw.checkAvailability())
          throw new IllegalStateException(
            s"Ollama not available at ${backends.ollamaUrl} (or model ${manifest.embedding_model} missing)")
        probe(raw, "Ollama")
      case _ =>
        val raw = new RemoteEmbedder(backends.remoteUrl, manifest.embedding_model, dim)
        if (!raw.checkAvailability())
          throw new IllegalStateException(
            s"embedding server not available at ${backends.remoteUrl}")
        probe(raw, "embedding server")
    }
  }

  private def readManifestOrFail(spark: SparkSession, indexPath: String): IndexManifest =
    try VectorIndex.readManifest(spark, indexPath)
    catch {
      case e: Exception =>
        throw new IllegalStateException(
          s"No index found at $indexPath — run Graft.index first", e)
    }

  /** Open an index for repeated questions. Fails fast with a clear
    * message when the index is absent (reference behavior,
    * `ask.py:66-82`). */
  def open(
      spark: SparkSession,
      indexPath: String,
      embedder: Embedder = HashEmbedder.default): AskSession =
    openWith(spark, indexPath, readManifestOrFail(spark, indexPath), embedder)

  private def openWith(
      spark: SparkSession,
      indexPath: String,
      manifest: IndexManifest,
      embedder: Embedder): AskSession = {
    validate(manifest, embedder)
    val vectors = VectorIndex.readVectors(spark, indexPath).persist()
    new AskSession(spark, manifest, vectors, embedder)
  }

  /** Retrieval query: embed the question (driver-side scalar, like
    * the reference's single-string `get_embedding`, ask.py:109-116),
    * exact cosine top-k over the index with text fetched only for
    * the k survivors, context assembly, empty-result guard
    * (ask.py:219-220). LLM generation is out of engine scope by
    * design (SURVEY Q5) — callers take `context` to their model. */
  def ask(
      spark: SparkSession,
      indexPath: String,
      question: String,
      k: Int = 5,
      embedder: Embedder = HashEmbedder.default): AskResult = {
    val manifest = VectorIndex.readManifest(spark, indexPath)
    validate(manifest, embedder)
    val vectors = VectorIndex.readVectors(spark, indexPath)
    val hits = retrieve(vectors, question, k, embedder)
    AskResult(hits, assembleOrEmpty(hits))
  }
}
