package graft

import graft.embed.{Embedder, HashEmbedder, OllamaEmbedder, RemoteEmbedder}
import org.apache.spark.sql.SparkSession

/** Batch indexing CLI — the engine's `python index.py <repo>`
  * (reference `index.py:481-584`): validate the corpus path, pick an
  * embedding backend from flags, run the index build, report chunk
  * counts. The per-file work is [[Graft.index]]'s lazy map-only plan;
  * this main is argument parsing + the availability gate + a summary.
  *
  * Flags mirror the reference's mutually-exclusive backend group:
  *   --hash-embeddings    deterministic offline featurizer (default)
  *   --ollama-embeddings  Ollama per-text HTTP client (zero-fallback)
  *   --remote-embeddings  batched remote server client (retry stack)
  *   --model NAME         backend model name
  *   --chunk-size N       chunk size (default 2000, reference default)
  *   --index-path PATH    index output (default ./graft_index)
  */
object IndexCli {

  case class Args(
      corpus: String = null,
      backend: String = "hash",
      model: Option[String] = None,
      chunkSize: Int = graft.ingest.Chunker.DefaultChunkSize,
      indexPath: String = "graft_index",
      dim: Int = 64,
      backends: Graft.Backends = Graft.Backends())

  private[graft] def parse(argv: Array[String]): Either[String, Args] = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--hash-embeddings" => a = a.copy(backend = "hash")
        case "--ollama-embeddings" => a = a.copy(backend = "ollama")
        case "--remote-embeddings" => a = a.copy(backend = "remote")
        case "--model" if i + 1 < argv.length =>
          a = a.copy(model = Some(argv(i + 1))); i += 1
        case "--chunk-size" if i + 1 < argv.length =>
          a = a.copy(chunkSize = argv(i + 1).toInt); i += 1
        case "--index-path" if i + 1 < argv.length =>
          a = a.copy(indexPath = argv(i + 1)); i += 1
        case "--dim" if i + 1 < argv.length =>
          a = a.copy(dim = argv(i + 1).toInt); i += 1
        case flag if flag.startsWith("--") =>
          return Left(s"unknown flag: $flag")
        case positional if a.corpus == null => a = a.copy(corpus = positional)
        case extra => return Left(s"unexpected argument: $extra")
      }
      i += 1
    }
    if (a.corpus == null) Left("usage: graft.IndexCli <corpusDir> [flags]")
    else Right(a)
  }

  /** Backend from flags; availability-gated like the reference's
    * `check_availability` abort (index.py:559-561). */
  private[graft] def embedderOf(a: Args): Either[String, Embedder] = a.backend match {
    case "hash" => Right(new HashEmbedder(a.dim))
    case "ollama" =>
      val model = a.model.getOrElse("nomic-embed-text")
      val raw = new OllamaEmbedder(a.backends.ollamaUrl, model, a.dim)
      if (!raw.checkAvailability())
        Left(s"Ollama not available at ${a.backends.ollamaUrl} (or model $model missing)")
      else Right(graft.embed.OllamaEmbedder.resilient(a.backends.ollamaUrl, model, a.dim))
    case "remote" =>
      val model = a.model.getOrElse("all-MiniLM-L6-v2")
      val raw = new RemoteEmbedder(a.backends.remoteUrl, model, a.dim)
      if (!raw.checkAvailability())
        Left(s"embedding server not available at ${a.backends.remoteUrl}")
      else Right(RemoteEmbedder.withRetry(a.backends.remoteUrl, model, a.dim))
  }

  /** Scriptable body (tests inject the session and read the result). */
  def run(spark: SparkSession, a: Args, out: java.io.PrintStream): Int = {
    if (!new java.io.File(a.corpus).exists()) {
      out.println(s"Error: corpus path does not exist: ${a.corpus}")
      return 1
    }
    embedderOf(a) match {
      case Left(err) =>
        out.println(s"Error: $err")
        1
      case Right(embedder) =>
        out.println("Log Indexer")
        out.println(s"Corpus: ${a.corpus}")
        out.println(s"Embedding: ${embedder.kind} (${embedder.model})")
        out.println(s"Chunk size: ${a.chunkSize}")
        val manifest = Graft.index(spark, a.corpus, a.indexPath,
          Graft.IndexConfig(chunkSize = a.chunkSize, embedder = embedder))
        val n = graft.index.VectorIndex.readVectors(spark, a.indexPath).count()
        out.println(s"Indexed $n chunks → ${a.indexPath}")
        out.println(s"Manifest: ${manifest.embedding_type}/${manifest.embedding_model}, " +
          s"chunk_size=${manifest.chunk_size}")
        0
    }
  }

  def main(argv: Array[String]): Unit = parse(argv) match {
    case Left(err) =>
      System.err.println(err)
      sys.exit(1)
    case Right(a) =>
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-index")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val code = try run(spark, a, System.out) finally spark.stop()
      if (code != 0) sys.exit(code)
  }
}
