package graft.ops

import graft.functions.CrossHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination — the broadcast-bitset
  * scale path beside [[Curation.decontaminate]]'s exact broadcast
  * join (same benchmark convention: every 50th document, same word
  * 3-gram candidate stream from [[Dedup.shingles]]).
  *
  * The exact variant broadcasts the benchmark's DISTINCT GRAM SET —
  * fine while the benchmark is thousands of documents, but the
  * broadcast grows with the benchmark's token count (a string per
  * gram). The Bloom variant compresses the set to [[MBits]] BITS
  * ([[MBits]]/8 bytes — 2 KB here) with [[KHashes]] md5-derived bit
  * positions per gram: membership can overestimate (false positives,
  * never false negatives), so flagged counts are an UPPER bound on
  * the exact shared-gram counts — the right direction for
  * decontamination, where a false positive quarantines a clean doc
  * for the exact recheck and a false negative would leak benchmark
  * text into training data.
  *
  * Shape at 100 TB:
  *   - benchmark side: one gram aggregation over the (small)
  *     benchmark slice, reduced to ≤[[MBits]] distinct positions —
  *     PARAMETER-bounded driver state (the centroid rule; a real
  *     deployment sizes MBits to the benchmark, which is MBs when
  *     the corpus is TBs);
  *   - corpus side: MAP-ONLY — the bitset rides the task closure as
  *     a torrent broadcast and each document is scored against it in
  *     place; no join, no shuffle, no corpus-side aggregation (the
  *     exact variant pays a broadcast hash join + a doc_id
  *     aggregation);
  *   - this is the same build/probe split a streaming deployment
  *     needs: the bitset is frozen model state, scoring is stateless
  *     (the [[graft.streaming.StreamingIndex]] dsir/curation shape).
  *
  * The hash family is the cross-engine md5 ([[CrossHash]]), so the
  * whole filter — build positions, probe, per-doc flag counts —
  * replays bit-exactly in DuckDB and the query is fully
  * oracle-gated (the CMS precedent: sketches on the shared hash stay
  * hash-match instead of rows-only).
  */
object Bloom {
  import Tables.t

  /** Filter size in bits (2 KB). Sized so the fixture benchmark's
    * ~1–2k grams fill < 25% of the filter → per-probe false-positive
    * rate (fill)^K ≈ 1e-2; at a real benchmark size, scale MBits
    * with the benchmark gram count (it is independent of corpus
    * size). */
  val MBits = 16384

  /** Bit positions per gram. */
  val KHashes = 3

  /** The j-th bit position of gram `g`: md5Hash60(g ++ ":bf" ++ j)
    * mod [[MBits]] — one definition for the JVM probe side and the
    * Column build side (both reduce to [[CrossHash]]). */
  private def posOf(g: String, j: Int): Int =
    (CrossHash.md5Hash60(g + ":bf" + j) % MBits).toInt

  /** Build the benchmark bitset: distinct grams of the benchmark
    * slice → K positions each → distinct positions (≤ MBits rows)
    * collected into 2 KB of driver state. Public: the streaming twin
    * ([[graft.streaming.StreamingIndex.bloomScoreStream]]) freezes
    * this as its model state. */
  def benchBitset(s: SparkSession, dir: String): java.util.BitSet = {
    val d = t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
    val pos = Dedup.shingles(d)
      .select(col("shingle")).distinct()
      .select(explode(sequence(lit(0), lit(KHashes - 1))).as("j"), col("shingle"))
      .select((CrossHash.md5Hash60Col(
        concat(col("shingle"), lit(":bf"), col("j").cast("string"))) % MBits).as("pos"))
      .distinct()
      .collect()
    val bits = new java.util.BitSet(MBits)
    pos.foreach(r => bits.set(r.getLong(0).toInt))
    bits
  }

  /** Map-only scoring of ANY (doc_id, text) relation against a
    * frozen bitset: (doc_id, n_flagged). ONE definition shared by
    * the batch query and the streaming twin, so batch and stream
    * semantics cannot drift (the gopherScore convention). The 2 KB
    * bitset rides the UDF closure — no join, no shuffle, streams
    * without state. */
  def scoreDocs(docs: DataFrame, bits: java.util.BitSet): DataFrame = {
    val flagged = udf { (sh: Seq[String]) =>
      var n = 0L
      sh.foreach { g =>
        var all = true
        var j = 0
        while (all && j < KHashes) {
          if (!bits.get(posOf(g, j))) all = false
          j += 1
        }
        if (all) n += 1
      }
      n
    }
    Dedup.withShingleArray(docs)
      .select(col("doc_id"), flagged(col("shingles")).as("n_flagged"))
  }

  /** (doc_id, n_flagged) for every non-benchmark document with at
    * least one gram whose K positions are all set — a superset of
    * the exact decontamination hits, with n_flagged ≥ the exact
    * n_shared per doc (spec-asserted). */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "documents").filter(col("doc_id") % 50 =!= 0)
    scoreDocs(corpus, benchBitset(s, dir))
      .filter(col("n_flagged") > 0)
      .orderBy(col("doc_id"))
  }

  val bloomDecontaminateSql: String = {
    def h(expr: String) = CrossHash.sqlHash60(expr)
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= ${Dedup.ShingleK}),
       |sh AS (
       |  SELECT DISTINCT doc_id, ${Dedup.shingleSql} AS g
       |  FROM tok, UNNEST(range(0, len(w) - ${Dedup.ShingleK - 1})) AS u(i)),
       |bpos AS (
       |  SELECT DISTINCT ${h(s"g || ':bf' || CAST(j AS VARCHAR)")} % $MBits AS pos
       |  FROM sh, UNNEST(range(0, $KHashes)) AS r(j)
       |  WHERE doc_id % 50 = 0),
       |cand AS (
       |  SELECT doc_id, g,
       |    ${h(s"g || ':bf' || CAST(j AS VARCHAR)")} % $MBits AS pos
       |  FROM sh, UNNEST(range(0, $KHashes)) AS r(j)
       |  WHERE doc_id % 50 <> 0),
       |hits AS (
       |  SELECT doc_id, g FROM cand JOIN bpos USING (pos)
       |  GROUP BY doc_id, g HAVING COUNT(*) = $KHashes)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
       |FROM hits GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_decontaminate" -> (bloomDecontaminate _))

  val oracles: Map[String, String] = Map(
    "bloom_decontaminate" -> bloomDecontaminateSql)
}
