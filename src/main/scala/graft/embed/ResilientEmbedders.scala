package graft.embed

/** Failure-handling wrappers replicating the reference's remote
  * embedding semantics, decoupled from any network so they are
  * testable offline and reusable around a real HTTP/model backend.
  */

/** Retry with exponential backoff — reference
  * `RemoteEmbeddingHandler.embed` (log-vector `index.py:164-202`):
  * 3 attempts, sleep `base · 2^attempt` between failures, rethrow
  * after the last. `sleeper` injectable for tests. */
final class RetryEmbedder(
    inner: Embedder,
    maxAttempts: Int = 3,
    baseDelayMs: Long = 1000,
    sleeper: Long => Unit = Thread.sleep) extends Embedder {
  require(maxAttempts >= 1)
  override def dim: Int = inner.dim
  override def model: String = inner.model
  override def kind: String = inner.kind

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    while (true) {
      try return inner.embed(texts)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          sleeper(baseDelayMs * (1L << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Zero-vector fallback — reference `OllamaEmbeddingHandler.embed`
  * (log-vector `index.py:126-140`): a failed text gets a zero
  * vector and the batch continues. Deviation from quirk Q4: the
  * zero vector is `dim`-sized (the reference hardcodes 384
  * regardless of model dim); downstream kNN excludes zero vectors
  * via NULL cosine. Per-text isolation: one bad text doesn't fail
  * its batch. */
final class ZeroFallbackEmbedder(inner: Embedder) extends Embedder {
  override def dim: Int = inner.dim
  override def model: String = inner.model
  override def kind: String = inner.kind

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      try inner.embedOne(t)
      catch { case _: Exception => new Array[Float](dim) }
    }
}
