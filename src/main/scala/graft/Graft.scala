package graft

import graft.embed.{EmbedOps, Embedder, HashEmbedder}
import graft.index.{IndexManifest, VectorIndex}
import graft.ingest.{Chunker, Sources}
import graft.query.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}

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
      embedding_type = "hash",
      embedding_model = cfg.embedder.model,
      chunk_size = cfg.chunkSize,
      index_path = indexPath)
    VectorIndex.write(embedded, indexPath, manifest, cfg.numPartitions)
    manifest
  }

  case class AskResult(hits: DataFrame, context: String)

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
      val hits = Knn.topKWithFetch(
        vectors, EmbedOps.embedLiteral(question, embedder), k,
        idCol = "id", fetchCols = Seq("source", "chunk_index", "text"))
      val context =
        if (hits.isEmpty) "No relevant data found in the database."
        else Knn.assembleContext(hits).head().getString(0)
      AskResult(hits, context)
    }

    override def close(): Unit = vectors.unpersist()
  }

  /** Open an index for repeated questions. Fails fast with a clear
    * message when the index is absent (reference behavior,
    * `ask.py:66-82`). */
  def open(
      spark: SparkSession,
      indexPath: String,
      embedder: Embedder = HashEmbedder.default): AskSession = {
    val manifest =
      try VectorIndex.readManifest(spark, indexPath)
      catch {
        case e: Exception =>
          throw new IllegalStateException(
            s"No index found at $indexPath — run Graft.index first", e)
      }
    require(manifest.embedding_type == "hash",
      s"unsupported embedding_type ${manifest.embedding_type}")
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
    require(manifest.embedding_type == "hash",
      s"unsupported embedding_type ${manifest.embedding_type}")
    val vectors = VectorIndex.readVectors(spark, indexPath)
    val hits = Knn.topKWithFetch(
      vectors, EmbedOps.embedLiteral(question, embedder), k,
      idCol = "id", fetchCols = Seq("source", "chunk_index", "text"))
    val collected = hits.cache()
    val context =
      if (collected.isEmpty) "No relevant data found in the database."
      else Knn.assembleContext(collected).head().getString(0)
    collected.unpersist()
    AskResult(hits, context)
  }
}
