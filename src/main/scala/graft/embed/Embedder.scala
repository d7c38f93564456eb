package graft.embed

/** Pluggable embedding backend — the engine-side counterpart of the
  * reference's `EmbeddingHandler` ABC (log-vector `index.py:56-69`:
  * `embed(texts) -> List[List[float]]` + availability gate). The
  * reference ships three remote backends (local SentenceTransformer,
  * Ollama HTTP, remote batch HTTP — `index.py:72-215`); all need a
  * network or model weights, so the engine's default is the
  * deterministic [[HashEmbedder]] (SURVEY §7.3) and real backends
  * plug in behind this trait.
  *
  * Implementations MUST be serializable and cheap to construct: one
  * instance is instantiated lazily per executor JVM inside
  * `mapPartitions` / UDF closures (the Spark analog of the
  * reference's per-process model cache, `embedding_server.py:103-120`).
  */
trait Embedder extends Serializable {
  def dim: Int
  def model: String

  /** Backend family tag persisted in the index manifest (reference
    * `embedding_type`, index.py:466) and validated at query time so
    * an index can never be silently searched with a mismatched
    * embedder. */
  def kind: String = "custom"

  /** Batch embed. Batch shape mirrors the reference's 200-text API
    * batches (`index.py:326,401-405`); in Spark the partition is the
    * natural batch and implementations may sub-batch internally. */
  def embed(texts: Seq[String]): Seq[Array[Float]]

  def embedOne(text: String): Array[Float] = embed(Seq(text)).head
}

/** Deterministic feature-hashing embedder: unigram + bigram tokens →
  * signed hash buckets → L2-normalized float vector (dim 64 matches
  * the driver fixture `embeddings.parquet`).
  *
  * Offline, seedable, and pure — replaces the reference's
  * network-bound encoders so the whole pipeline is testable with no
  * egress, while keeping identical dataflow shape (text in, unit
  * vector out). Hashing is the cross-engine 60-bit md5 primitive
  * (graft.functions.CrossHash) keyed `"{seed}|{token}"`, which makes
  * the WHOLE index dataflow DuckDB-recomputable: bucket sums are
  * exact ±1 integers, the norm is an exact integer in double, and
  * the final float truncation is IEEE round-to-nearest in both
  * engines — so `index_pipeline`'s embedding checksums hash-match
  * the oracle. Token hashes are memoized per executor (corpus
  * vocabulary ≪ token stream).
  */
final class HashEmbedder(val dim: Int = 64, seed: Long = 42L) extends Embedder {
  require(dim > 0)
  override def model: String = s"hash-ngram-$dim"
  override def kind: String = "hash"

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(embedOne)

  override def embedOne(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    val toks = HashEmbedder.tokenize(text)
    var i = 0
    while (i < toks.length) {
      add(v, HashEmbedder.cachedKeyHash(seed, toks(i)))
      if (i + 1 < toks.length)
        add(v, HashEmbedder.cachedKeyHash(seed, toks(i) + " " + toks(i + 1)))
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    val out = new Array[Float](dim)
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      j = 0
      while (j < dim) { out(j) = (v(j) * inv).toFloat; j += 1 }
    }
    // all-zero input (e.g., whitespace-only text) → zero vector, the
    // degenerate case the reference also produces on embed failure
    // (index.py:138); downstream kNN excludes it (quirk Q4 fix).
    out
  }

  /** h is the 60-bit md5 hash: bucket from the low bits mod dim,
    * sign from bit 32 — both plain positive arithmetic, mirrored
    * verbatim in the index_pipeline oracle SQL. */
  private def add(v: Array[Double], h: Long): Unit = {
    val bucket = (h % dim.toLong).toInt
    val sign = if (((h >> 32) & 1L) == 0L) 1.0 else -1.0
    v(bucket) += sign
  }
}

object HashEmbedder {
  val default: HashEmbedder = new HashEmbedder(64)

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private val keyHashCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized `CrossHash.md5Hash60("{seed}|{token}")`. */
  def cachedKeyHash(seed: Long, token: String): Long = {
    val key = seed.toString + "|" + token
    val c = keyHashCache.get(key)
    if (c != null) c.longValue()
    else {
      val h = graft.functions.CrossHash.md5Hash60(key)
      if (keyHashCache.size < (1 << 20)) keyHashCache.put(key, h)
      h
    }
  }

  /** splitmix64 finalizer — stable, well-mixed 64-bit hash. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Stable 64-bit string hash (FNV-1a over UTF-16 code units). */
  def stableHash64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }
}
