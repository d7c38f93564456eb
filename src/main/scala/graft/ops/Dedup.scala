package graft.ops

import graft.embed.HashEmbedder
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

  /** Distinct word 3-gram shingles per doc. */
  private def shingles(d: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    d.filter(size(w) >= ShingleK)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(split(text, ' ')) - $ShingleK), " +
            "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))"))
          .as("shingle"))
      .distinct()
  }

  /** Word-shingle Jaccard near-dup pairs via inverted-index join:
    * |A∩B| from the per-shingle co-occurrence counts, |A∪B| from
    * per-doc shingle counts. Top-50 pairs by similarity. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(t(s, dir, "documents"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6) + lit(0.0))
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
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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

  private val minhashUdf = udf { (shingles: Seq[String]) =>
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
    * Shuffle cost: one explode (16 band rows/doc) + one groupBy on
    * (band, band_key) — sub-quadratic candidate generation. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sig = shingles(d)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("sh"))
      .withColumn("sig", minhashUdf(col("sh")))
      .select(col("doc_id"), col("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> struct(b AS band, hash(slice(sig, b * $RowsPerBand + 1, $RowsPerBand)) AS bkey))"))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / NumHashes, 6) + lit(0.0))
      .filter(col("est_jaccard") >= 0.35)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
  }

  // ---- SimHash (rows-only gate) ----

  private val simhashUdf = udf { (tokens: Seq[String]) =>
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
    * into 4×16 bits; pairs sharing a band verified with
    * bit_count(xor) ≤ 6. Pigeonhole: Hamming ≤ 3 ⇒ some band equal,
    * so the band join loses no pair at that radius. */
  def simhashDedup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val fp = d.select(col("doc_id"), simhashUdf(split(col("text"), " ")).as("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, CAST(shiftright(fp, b * 16) & 65535 AS INT) AS bval))"))
        .as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 6)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard" -> (dedupJaccard _),
    "minhash_lsh" -> (minhashLsh _),
    "simhash_dedup" -> (simhashDedup _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_jaccard" -> dedupJaccardSql)
}
