package graft.ops

import graft.functions.CrossHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) —
  * the deterministic counterpart to the HLL/KLL sketch family
  * already registered: a [[Depth]]×[[Width]] counter table where
  * `cnt[i][h_i(x) % Width]` accumulates every occurrence of `x`, and
  * the point estimate is `min_i cnt[i][h_i(x)]` — an OVERESTIMATE
  * bounded by collisions, never an undercount. Unlike HLL/KLL whose
  * binary sketch states are engine-specific (rows-only gates), CMS
  * is pure modular arithmetic on the cross-engine md5 hash, so the
  * whole sketch — build, merge, estimate, top-k — replays exactly in
  * DuckDB and gets a full hash-match oracle.
  *
  * Shape at 100 TB:
  *   - the SKETCH is a [[Depth]]×[[Width]] table — fixed model
  *     capacity like k-means centroids or the DSIR bucket models, so
  *     the broadcast hint is safe at any corpus size; counters sum
  *     per-partition map-side and merge by addition (the property
  *     that makes CMS the streaming/distributed counter of choice);
  *   - corpus passes: ONE (the token-count aggregation the engine
  *     already materializes for unigram models); the sketch reduces
  *     from the vocab relation (Depth rows per DISTINCT token, not
  *     per occurrence);
  *   - the candidate side here enumerates the vocab relation
  *     (hint-free join keyed on (i,b) — vocab-sized, the
  *     tfidf_top_terms rule); a true streaming deployment would pair
  *     the sketch with a bounded candidate heap instead, which is
  *     exactly [[graft.functions.TopKPairs]] — composition, not new
  *     machinery. Top-k is TakeOrderedAndProject — no global sort.
  *
  * All arithmetic is exact integers — no decimal bridge needed.
  */
object Cms {
  import Tables.t

  /** Independent hash rows. Pr[overestimate > ε·N] ≤ (1/2)^Depth. */
  val Depth = 4

  /** Counters per row. Expected overestimate ≤ N/Width per cell. */
  val Width = 256

  val TopK = 15

  /** (tok, exact_cnt, i, b): every distinct token crossed with the
    * [[Depth]] hash rows, carrying its exact corpus count — the one
    * relation both the sketch build and the estimate join reduce
    * from. */
  private def cells(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val vocab = d
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
    vocab
      .select(col("tok"), col("exact_cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("i"))
      .withColumn("b", CrossHash.md5Hash60Col(
        concat(col("tok"), lit(":cms"), col("i").cast("string"))) % Width)
  }

  /** Heavy hitters by CMS estimate: (tok, exact_cnt, est) with
    * est ≥ exact_cnt always (the CMS guarantee, spec-asserted);
    * ranked by the ESTIMATE — what a sketch-only deployment sees. */
  def cmsTopk(s: SparkSession, dir: String): DataFrame = {
    val c = cells(s, dir)
    // Depth×Width rows by construction — parameter-bounded, so the
    // broadcast hint is safe at any corpus size (the centroid rule)
    val sketch = c.groupBy(col("i"), col("b"))
      .agg(sum(col("exact_cnt")).as("cnt"))
    c.join(broadcast(sketch), Seq("i", "b"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est"))
      .select(col("tok"), col("exact_cnt"), col("est"))
      .orderBy(col("est").desc, col("tok"))
      .limit(TopK)
  }

  val cmsTopkSql: String = {
    val h = CrossHash.sqlHash60("tok || ':cms' || CAST(i AS VARCHAR)")
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |vocab AS (SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok),
       |cells AS (
       |  SELECT tok, exact_cnt, i, $h % $Width AS b
       |  FROM vocab, UNNEST(range(0, $Depth)) AS r(i)),
       |sketch AS (SELECT i, b, SUM(exact_cnt) AS cnt FROM cells GROUP BY i, b)
       |SELECT tok, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       |  CAST(MIN(cnt) AS BIGINT) AS est
       |FROM cells JOIN sketch USING (i, b)
       |GROUP BY tok, exact_cnt
       |ORDER BY est DESC, tok
       |LIMIT $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_topk" -> (cmsTopk _))

  val oracles: Map[String, String] = Map(
    "cms_topk" -> cmsTopkSql)
}
