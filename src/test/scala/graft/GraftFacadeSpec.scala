package graft

import graft.embed.{Embedder, HashEmbedder, RetryEmbedder, ZeroFallbackEmbedder}
import graft.index.VectorIndex
import graft.query.MarkdownSink
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.{ZoneOffset, ZonedDateTime}

/** End-to-end facade (index → ask), manifest round-trip, markdown
  * sink format, and the E2/E3 failure-handling wrappers. */
class GraftFacadeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def writeCorpus(): Path = {
    val root = Files.createTempDirectory("graft-e2e")
    def put(rel: String, s: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s.getBytes(StandardCharsets.UTF_8))
    }
    put("app/db.log", "connection pool exhausted\ntimeout waiting for connection\nretry scheduled")
    put("app/web.log", "request served in 12ms\nstatic asset cached")
    put("notes.txt", "the database timeout needs tuning\npool size too small")
    root
  }

  test("index → ask: full reference workflow on a real corpus") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-idx").toString
    val manifest = Graft.index(spark, corpus.toString, idx,
      Graft.IndexConfig(chunkSize = 50))
    assert(manifest.embedding_model == "hash-ngram-64")

    // manifest round-trip (K2)
    val back = VectorIndex.readManifest(spark, idx)
    assert(back == manifest)

    // index content (K1): chunked, embedded, source-keyed
    val vectors = VectorIndex.readVectors(spark, idx)
    assert(vectors.count() > 0)
    assert(vectors.columns.toSet ==
      Set("source", "total_chunks", "chunk_index", "text", "id", "embedding"))

    val result = Graft.ask(spark, idx, "database connection timeout", k = 3)
    val hits = result.hits.collect()
    assert(hits.length == 3)
    assert(result.context.startsWith("File: "))
    // retrieval sanity: timeout-related chunks outrank the web log
    val topSource = hits.head.getAs[String]("source")
    assert(topSource == "app/db.log" || topSource == "notes.txt",
      s"unexpected top hit: $topSource\n${result.context}")
  }

  test("hybrid ask: exact rare tokens surface hits the embedder alone can miss") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-hyidx").toString
    Graft.index(spark, corpus.toString, idx, Graft.IndexConfig(chunkSize = 50))
    val session = Graft.open(spark, idx)
    try {
      val r = session.askHybrid("connection pool exhausted", k = 2)
      val hits = r.hits.collect()
      assert(hits.length == 2)
      assert(hits.head.getAs[String]("source") == "app/db.log",
        s"keyword-exact chunk must rank first:\n${r.context}")
      assert(r.context.startsWith("File: "))
      // question with no keyword overlap still answers from the
      // vector ranking (absent keyword list contributes nothing)
      val r2 = session.askHybrid("zzz qqq xyzzy", k = 1)
      assert(r2.hits.collect().length == 1)
    } finally session.close()
  }

  test("ask returns exactly k hits under basename id collisions (quirk Q1)") {
    // app/server.log.1 and db/server.log.1 share chunk id
    // "server.log.1:0"; retrieval must key on (source, chunk_index)
    val corpus = writeCorpus()
    Files.createDirectories(corpus.resolve("db"))
    Files.write(corpus.resolve("app/server.log.1"),
      "dup basename a\n".getBytes(StandardCharsets.UTF_8))
    Files.write(corpus.resolve("db/server.log.1"),
      "dup basename b\n".getBytes(StandardCharsets.UTF_8))
    val idx = Files.createTempDirectory("graft-coll").toString
    Graft.index(spark, corpus.toString, idx, Graft.IndexConfig(chunkSize = 50))
    val r = Graft.ask(spark, idx, "dup basename", k = 4)
    val hits = r.hits.collect()
    assert(hits.length == 4, s"expected exactly k hits, got ${hits.length}")
    val keys = hits.map(h => (h.getAs[String]("source"), h.getAs[Int]("chunk_index")))
    assert(keys.distinct.length == keys.length, s"duplicate fetch keys: ${keys.toSeq}")
    // both colliding-id chunks retrievable, each with its own text
    val dupSources = hits.filter(_.getAs[String]("id") == "server.log.1:0")
      .map(h => h.getAs[String]("source") -> h.getAs[String]("text")).toMap
    assert(dupSources.keySet == Set("app/server.log.1", "db/server.log.1"))
    assert(dupSources("app/server.log.1") == "dup basename a\n")
    assert(dupSources("db/server.log.1") == "dup basename b\n")
  }

  test("ask with mismatched embedder model fails fast instead of returning garbage") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-mismatch").toString
    Graft.index(spark, corpus.toString, idx)
    val other = new graft.embed.HashEmbedder(32)
    val e = intercept[IllegalArgumentException](
      Graft.ask(spark, idx, "anything", embedder = other))
    assert(e.getMessage.contains("model"))
  }

  test("ask on overwritten index sees only new data (quirk Q3: overwrite semantics)") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-idx2").toString
    Graft.index(spark, corpus.toString, idx)
    val corpus2 = Files.createTempDirectory("graft-e2e2")
    Files.write(corpus2.resolve("only.log"),
      "a completely fresh corpus".getBytes(StandardCharsets.UTF_8))
    Graft.index(spark, corpus2.toString, idx)
    val sources = VectorIndex.readVectors(spark, idx)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(sources == Set("only.log"))
  }

  test("ask session: cached index answers repeated questions; missing index fails fast") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-sess-idx").toString
    Graft.index(spark, corpus.toString, idx, Graft.IndexConfig(chunkSize = 50))
    val session = Graft.open(spark, idx)
    try {
      val r1 = session.ask("connection pool exhausted", k = 2)
      val r2 = session.ask("static asset cache", k = 2)
      assert(r1.hits.count() == 2 && r2.hits.count() == 2)
      assert(r1.context != r2.context)
    } finally session.close()

    val e = intercept[IllegalStateException](
      Graft.open(spark, "/tmp/definitely-not-an-index"))
    assert(e.getMessage.contains("No index found"))
  }

  test("markdown sink: header on create, append blocks (ask.py:258-273 format)") {
    val f = Files.createTempDirectory("graft-md").resolve("qa.md").toString
    val t = ZonedDateTime.of(2026, 1, 2, 3, 4, 5, 0, ZoneOffset.UTC)
    MarkdownSink.append("why is it slow?", "because of X", f, t)
    MarkdownSink.append("second q", "second a", f, t)
    val got = new String(Files.readAllBytes(java.nio.file.Paths.get(f)), StandardCharsets.UTF_8)
    assert(got.startsWith("# Q&A Log\n"))
    assert(got.contains("## Question [2026-01-02 03:04:05]\n\n**Q:** why is it slow?\n\n**A:** because of X\n\n---"))
    assert(got.linesIterator.count(_.startsWith("## Question")) == 2)
  }

  test("ask CLI: scripted REPL round-trip — banner, blank-skip, Q/A to markdown, quit") {
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-cli-idx").toString
    Graft.index(spark, corpus.toString, idx, Graft.IndexConfig(chunkSize = 50))
    val outFile = Files.createTempDirectory("graft-cli-md").resolve("qa.md").toString
    val script = "\n   \ndatabase connection timeout\nquit\n"
    val stdout = new java.io.ByteArrayOutputStream()
    AskCli.run(spark, idx, outFile,
      new java.io.BufferedReader(new java.io.StringReader(script)),
      new java.io.PrintStream(stdout, true, "UTF-8"))
    val console = stdout.toString("UTF-8")
    assert(console.contains("Log Query Tool"))
    assert(console.contains("Type 'exit' or 'quit' to stop."))
    assert(console.contains("Answer:"))
    assert(console.contains(s"All responses saved to $outFile"))
    // blank lines produced no Q/A blocks; the one real question did
    val md = new String(Files.readAllBytes(java.nio.file.Paths.get(outFile)), StandardCharsets.UTF_8)
    assert(md.linesIterator.count(_.startsWith("## Question")) == 1)
    assert(md.contains("**Q:** database connection timeout"))
    assert(md.contains("File: ")) // the assembled context is the answer
  }

  test("index CLI: flags parse, corpus indexes end-to-end, bad input fails fast") {
    // flag parsing mirrors the reference's mutually-exclusive group
    val parsed = IndexCli.parse(Array("/tmp/corpus", "--chunk-size", "50",
      "--index-path", "/tmp/idx", "--ollama-embeddings", "--model", "m"))
    assert(parsed.exists(a => a.corpus == "/tmp/corpus" && a.chunkSize == 50 &&
      a.backend == "ollama" && a.model.contains("m")))
    assert(IndexCli.parse(Array("--chunk-size", "50")).isLeft) // no corpus
    assert(IndexCli.parse(Array("/c", "--bogus")).isLeft)
    // value-taking flag abuse: missing value, flag-as-value, bad ints
    assert(IndexCli.parse(Array("/c", "--model")).left.exists(_.contains("requires a value")))
    assert(IndexCli.parse(Array("/c", "--model", "--remote-embeddings")).isLeft)
    assert(IndexCli.parse(Array("/c", "--chunk-size", "2k")).left.exists(_.contains("integer")))
    assert(IndexCli.parse(Array("/c", "--dim", "0")).left.exists(_.contains("≥ 1")))
    // backend URLs configurable from the command line
    assert(IndexCli.parse(Array("/c", "--ollama-url", "http://h:1234"))
      .exists(_.backends.ollamaUrl == "http://h:1234"))
    // unknown backend string surfaces as an error, not a MatchError
    assert(IndexCli.embedderOf(IndexCli.Args(corpus = "/c", backend = "olama")).isLeft)

    // end-to-end with the default hash backend
    val corpus = writeCorpus()
    val idx = Files.createTempDirectory("graft-cli-index").toString
    val out = new java.io.ByteArrayOutputStream()
    val code = IndexCli.run(spark,
      IndexCli.Args(corpus = corpus.toString, chunkSize = 50, indexPath = idx),
      new java.io.PrintStream(out, true, "UTF-8"))
    assert(code == 0, out.toString("UTF-8"))
    val console = out.toString("UTF-8")
    assert(console.contains("Log Indexer"))
    assert(console.contains("Indexed "))
    assert(Graft.ask(spark, idx, "database timeout", k = 2).hits.count() == 2)

    // missing corpus dir → error exit, nothing written
    val bad = IndexCli.run(spark,
      IndexCli.Args(corpus = "/definitely/not/here", indexPath = idx),
      new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
    assert(bad == 1)

    // unavailable ollama backend → availability gate aborts (the
    // reference's check_availability exit, index.py:559-561)
    val gated = IndexCli.run(spark,
      IndexCli.Args(corpus = corpus.toString, backend = "ollama",
        backends = Graft.Backends(ollamaUrl = "http://127.0.0.1:1")),
      new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
    assert(gated == 1)
  }

  private class FlakyEmbedder(failures: Int) extends Embedder {
    var calls = 0
    override def dim: Int = 4
    override def model: String = "flaky"
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      calls += 1
      if (calls <= failures) throw new RuntimeException(s"boom $calls")
      texts.map(_ => Array.fill(4)(1.0f))
    }
  }

  test("retry embedder: exponential backoff then success (index.py:164-202)") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new FlakyEmbedder(failures = 2)
    val r = new RetryEmbedder(flaky, maxAttempts = 3, baseDelayMs = 1000, sleeper = sleeps += _)
    assert(r.embed(Seq("a")).head.toSeq == Seq(1.0f, 1.0f, 1.0f, 1.0f))
    assert(sleeps.toSeq == Seq(1000L, 2000L))
    assert(flaky.calls == 3)
  }

  test("retry embedder: rethrows after final attempt") {
    val flaky = new FlakyEmbedder(failures = 99)
    val r = new RetryEmbedder(flaky, maxAttempts = 3, baseDelayMs = 1, sleeper = _ => ())
    val e = intercept[RuntimeException](r.embed(Seq("a")))
    assert(e.getMessage == "boom 3")
  }

  test("zero-fallback embedder: bad text → zero vector, batch survives (index.py:126-140)") {
    val inner = new Embedder {
      override def dim = 4
      override def model = "picky"
      override def embed(texts: Seq[String]) = texts.map { t =>
        if (t == "bad") throw new RuntimeException("no") else Array.fill(4)(0.5f)
      }
    }
    val z = new ZeroFallbackEmbedder(inner)
    val out = z.embed(Seq("ok", "bad", "ok"))
    assert(out(0).forall(_ == 0.5f))
    assert(out(1).forall(_ == 0.0f))
    assert(out(2).forall(_ == 0.5f))
  }
}
