package graft.ops

import graft.embed.HashEmbedder
import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for a training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard (shingle-inverted-index join),
  * MinHash+LSH banding, and SimHash Hamming banding. The
  * embedding-cosine near-dup lives in VectorQueries.embedNeardup.
  *
  * Scale architecture (the reason these shapes were chosen):
  *   - exact dedup: one hash shuffle on the text (or md5) key.
  *   - Jaccard: never all-pairs — an inverted index on shingles
  *     turns candidate generation into a co-grouped join keyed by
  *     shingle, linear in total postings.
  *   - MinHash LSH: candidates only within equal (band, band-hash)
  *     buckets — one explode (bands/doc) + one shuffle; the classic
  *     sub-quadratic near-dup plan for 100 TB corpora.
  *   - SimHash: 64-bit fingerprint, 4×16-bit bands; Hamming ≤ 3
  *     pairs must share a band (pigeonhole), so banding is exact
  *     candidate generation, then bit_count verifies.
  */
object Dedup {
  import Tables.t

  /** Exact duplicate groups keyed on full text; min(doc_id) is the
    * canonical survivor (deterministic `dropDuplicates`). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  val dedupExactSql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY text
      |ORDER BY doc_id""".stripMargin

  val ShingleK = 3

  /** text → DISTINCT word 3-gram shingles, in one pass. A UDF
    * rather than transform()-over-split(): the optimizer inlines the
    * split into every lambda element access (CollapseProject into
    * the Generate input), turning O(tokens) into O(tokens²) —
    * measured 13× slower than this UDF on the sf0.1 bench. */
  private val shingleUdf = udf { (text: String) =>
    val w = if (text == null) Array.empty[String] else text.split(" ")
    if (w.length < ShingleK) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + ShingleK <= w.length) {
        seen.add(w(i) + " " + w(i + 1) + " " + w(i + 2))
        i += 1
      }
      val out = new Array[String](seen.size)
      seen.toArray(out)
      out
    }
  }

  /** Per-doc distinct shingle array; doing the dedup inside the
    * array avoids the explode → global DISTINCT shuffle the naive
    * plan pays. */
  private def withShingleArray(d: DataFrame): DataFrame =
    d.select(col("doc_id"), shingleUdf(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Inverted-index form: one row per (doc, distinct shingle) —
    * map-only explode of the distinct array (no shuffle). Shared
    * with Curation.decontaminate (same 3-gram candidate stream). */
  private[ops] def shingles(d: DataFrame): DataFrame =
    withShingleArray(d)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** Posting lists longer than this are dropped before pair
    * generation — "stop-shingle" removal. Bounds the per-shingle
    * pair fan-out to MaxPosting²/2 (skew guard at corpus scale);
    * mirrored verbatim in the oracle SQL so semantics match. */
  val MaxPosting = 1000

  /** Word-shingle Jaccard near-dup pairs via inverted-index posting
    * lists: group by shingle, emit each posting list's pair
    * combinations map-side, count pair co-occurrences = |A∩B|;
    * |A∪B| from per-doc shingle-array sizes (map-only, broadcast).
    * Top-50 pairs by similarity.
    *
    * Two shuffles total (postings groupBy, pairs groupBy) and NO
    * self-join — the classic sub-quadratic near-dup plan; the
    * MaxPosting cap bounds fan-out under shingle skew. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val counts = withShingleArray(d)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"))
    val postings = shingles(d)
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, MaxPosting))
    // pairs packed into one BIGINT (doc_a << 32 | doc_b): halves the
    // shuffle width of the 1M+ candidate-pair aggregation
    val pairs = postings
      .select(explode(expr(
        "flatten(transform(docs, (x, i) -> " +
          "transform(slice(docs, i + 2, size(docs)), y -> shiftleft(x, 32) + y)))"))
        .as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("common"))
      .select(shiftright(col("pk"), 32).as("doc_a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"), col("common"))
    pairs
      .join(broadcast(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na")), "doc_a")
      .join(broadcast(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb")), "doc_b")
      .withColumn("jaccard",
        r6(col("common").cast("double") / (col("na") + col("nb") - col("common"))))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  val dedupJaccardSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= $ShingleK),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
       |  FROM tok, UNNEST(range(0, len(w) - ${ShingleK - 1})) AS u(i)),
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |good AS (SELECT shingle FROM sh GROUP BY shingle
       |         HAVING COUNT(*) BETWEEN 2 AND $MaxPosting),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  JOIN good g ON g.shingle = a.shingle
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b,
       |  round(CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common), 6) + 0 AS jaccard
       |FROM pairs
       |JOIN counts ca ON ca.doc_id = doc_a
       |JOIN counts cb ON cb.doc_id = doc_b
       |ORDER BY jaccard DESC, doc_a, doc_b
       |LIMIT 50""".stripMargin

  // ---- MinHash + LSH banding (rows-only gate; hash fns are engine-internal) ----

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  private val minhashUdf = udf { (shingles0: Seq[String]) =>
    val shingles = if (shingles0 == null) Seq.empty[String] else shingles0
    val sigs = Array.fill(NumHashes)(Long.MaxValue)
    shingles.foreach { sh =>
      val base = HashEmbedder.stableHash64(sh)
      var j = 0
      while (j < NumHashes) {
        val h = HashEmbedder.mix(base ^ (j.toLong * 0x9E3779B97F4A7C15L))
        if (h < sigs(j)) sigs(j) = h
        j += 1
      }
    }
    sigs
  }

  /** MinHash signatures → banded LSH buckets → candidate pairs →
    * signature-agreement estimate of Jaccard, est ≥ 0.35 kept.
    *
    * Plan shape: signatures are computed map-only from the per-doc
    * shingle array; one explode (16 band rows/doc); ONE groupBy on
    * (band, band_key) collecting bucket members; pairs expand
    * map-side from each bucket (buckets are near-dup clusters, so
    * tiny; a size cap guards degenerate buckets). No self-join —
    * sub-quadratic candidate generation that survives corpus scale. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sig = withShingleArray(d)
      .select(col("doc_id"), minhashUdf(col("shingles")).as("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> struct(b AS band, hash(slice(sig, b * $RowsPerBand + 1, $RowsPerBand)) AS bkey))"))
        .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id"), col("sig"))
    val buckets = banded
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("members"))
      .filter(size(col("members")).between(2, MaxPosting))
    val cand = buckets
      .select(explode(expr(
        "flatten(transform(members, (m, i) -> " +
          "transform(slice(members, i + 2, size(members)), n -> " +
          "struct(m.doc_id AS doc_a, n.doc_id AS doc_b, m.sig AS sig_a, n.sig AS sig_b))))"))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.sig_a").as("sig_a"), col("p.sig_b").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        r6(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / NumHashes))
      .filter(col("est_jaccard") >= 0.35)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
  }

  // ---- SimHash (rows-only gate) ----

  private val simhashUdf = udf { (tokens0: Seq[String]) =>
    val tokens = if (tokens0 == null) Seq.empty[String] else tokens0
    val acc = new Array[Int](64)
    tokens.foreach { tok =>
      val h = HashEmbedder.mix(HashEmbedder.stableHash64(tok))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** SimHash near-dups: 64-bit token-majority fingerprint, banded
    * into 4×16 bits; bucket-sharing pairs verified with
    * bit_count(xor) ≤ 3. Pigeonhole: Hamming ≤ 3 ⇒ at most 3 bands
    * touched ⇒ some band equal — banding is COMPLETE exactly up to
    * radius bands−1, so the output threshold matches that radius
    * (a looser threshold would silently drop qualifying pairs whose
    * differing bits spread across all four bands). */
  def simhashDedup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val fp = d.select(col("doc_id"), simhashUdf(split(col("text"), " ")).as("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, CAST(shiftright(fp, b * 16) & 65535 AS INT) AS bval))"))
        .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bval").as("bval"),
        col("doc_id"), col("fp"))
    // same bucket-collect shape as minhashLsh: one shuffle, pairs
    // expand map-side inside each (band, value) bucket
    val buckets = banded
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("fp")))).as("members"))
      .filter(size(col("members")).between(2, MaxPosting))
    buckets
      .select(explode(expr(
        "flatten(transform(members, (m, i) -> " +
          "transform(slice(members, i + 2, size(members)), n -> " +
          "struct(m.doc_id AS doc_a, n.doc_id AS doc_b, m.fp AS fp_a, n.fp AS fp_b))))"))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        bit_count(col("p.fp_a").bitwiseXOR(col("p.fp_b"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
  }

  /** Near-dup CLUSTERING — the step after pair generation that an
    * actual dedup pipeline needs: the Jaccard pair list is an
    * undirected graph, connected components collapse transitive
    * duplicates (a~b, b~c ⇒ one cluster), and min(doc_id) per
    * component is the canonical survivor.
    *
    * Components via iterative min-label propagation: each round
    * every node takes the min label among itself and its neighbors;
    * converges in ≤ diameter rounds (near-dup components are tiny,
    * so 2-3 rounds in practice; capped + early-stopped). Each round
    * is one join + one groupBy on the EDGE list only — the corpus is
    * never touched — and `localCheckpoint` cuts the growing lineage.
    * At 100 TB-corpus scale the same loop runs on the pair output of
    * the LSH candidate generators; the alternating small-star/
    * large-star variant bounds skew if a component is huge. */
  def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val edges = dedupJaccard(s, dir).select(col("doc_a"), col("doc_b"))
    val und = edges
      .union(edges.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // labels only ever decrease, so the label-sum strictly decreases
    // iff anything changed — one tiny agg per round instead of a
    // join-based diff; checkpoint every 3rd round (lineage stays
    // shallow, materialization jobs drop 3×). sum() over an empty
    // frame is NULL, so coalesce — an empty pair list must converge
    // immediately, not NPE.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < 60) {
      val prop = und.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      var next = labels.join(prop, col("node") === col("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      if (iter % 3 == 2) next = next.localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("component"))
      .withColumn("is_survivor",
        (col("doc_id") === col("component")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the Jaccard pipeline as CTEs (mirrors
    * [[dedupJaccardSql]] verbatim), then a recursive CTE computing
    * every label reachable from each node; MIN over the reachable
    * set = the component id (identical to converged min-label
    * propagation). */
  val dedupComponentsSql: String =
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= $ShingleK),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
       |  FROM tok, UNNEST(range(0, len(w) - ${ShingleK - 1})) AS u(i)),
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |good AS (SELECT shingle FROM sh GROUP BY shingle
       |         HAVING COUNT(*) BETWEEN 2 AND $MaxPosting),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  JOIN good g ON g.shingle = a.shingle
       |  GROUP BY a.doc_id, b.doc_id),
       |top AS (
       |  SELECT doc_a, doc_b
       |  FROM (SELECT doc_a, doc_b,
       |          round(CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common), 6) + 0 AS jaccard
       |        FROM pairs
       |        JOIN counts ca ON ca.doc_id = doc_a
       |        JOIN counts cb ON cb.doc_id = doc_b
       |        ORDER BY jaccard DESC, doc_a, doc_b
       |        LIMIT 50)),
       |und AS (SELECT doc_a AS src, doc_b AS dst FROM top
       |        UNION SELECT doc_b, doc_a FROM top),
       |reach(node, lab) AS (
       |  SELECT src, src FROM und
       |  UNION
       |  SELECT u.src, r.lab FROM und u JOIN reach r ON r.node = u.dst)
       |SELECT node AS doc_id, MIN(lab) AS component,
       |  CASE WHEN node = MIN(lab) THEN 1 ELSE 0 END AS is_survivor
       |FROM reach
       |GROUP BY node
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_components" -> (dedupComponents _),
    "minhash_lsh" -> (minhashLsh _),
    "simhash_dedup" -> (simhashDedup _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_components" -> dedupComponentsSql)
}
