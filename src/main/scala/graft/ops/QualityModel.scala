package graft.ops

import graft.functions.OracleMath.dsum
import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the "train a cheap classifier on a
  * weak label, score the whole corpus" step of LLM data curation
  * (the fastText-filter pattern), expressed as a distributed
  * CLOSED-FORM ridge regression:
  *
  *   w = (XᵀX + λI)⁻¹ Xᵀy
  *
  * with X = [1, ln(1+words), stopword-ratio] and the weak label
  * y = 1 iff the doc's mean word length is in the well-formed band
  * (the gopher mwl rule). The whole fit is ONE map-side-combined
  * aggregation producing the 3×3 Gram matrix and Xᵀy as nine
  * decimal-bridged sums (order-independent, DuckDB-recomputable),
  * then a Cramer solve on the driver — O(d²) data through the
  * driver, never the rows. At 100 TB the fit costs exactly one
  * aggregation pass; scoring is a map-only projection.
  *
  * Determinism bridge: features are r6-rounded before the Gram sums
  * (exact DECIMAL(38,6) accumulation), and the Cramer formulas are
  * written with IDENTICAL association order in Scala and SQL, so the
  * fitted weights are bit-identical across engines.
  */
object QualityModel {
  import Tables.t

  val Ridge = 0.1
  val ScoredK = 10

  /** Per-doc design matrix + weak label. f2/f3 are r6-rounded (the
    * §8.5 bridge rule); y compares UNROUNDED doubles — identical
    * integer-derived ratios on both engines (gopher precedent). */
  private[graft] def featureFrame(s: SparkSession, dir: String): DataFrame =
    featuresOf(t(s, dir, "documents"))

  /** The feature projection on ANY (doc_id, text) relation — ONE
    * definition shared by the batch fit/score and the streaming
    * scorer ([[graft.streaming.StreamingIndex.qualityScoreStream]]),
    * the gopherScore batch/stream convention. */
  private[graft] def featuresOf(d: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val nw = size(w)
    val mwl = (length(col("text")) - nw + 1).cast("double") / nw
    d.select(
      col("doc_id"),
      r6(log((nw + lit(1)).cast("double"))).as("f2"),
      r6(size(filter(w, x => x.isInCollection(TextOps.Stopwords))).cast("double") / nw)
        .as("f3"),
      (mwl >= 3.0 && mwl <= 10.0).cast("int").as("y"))
  }

  /** One aggregation pass → Gram sums → Cramer solve. Returns
    * (w_intercept, w_logwords, w_stopratio) as raw doubles. */
  def fitWeights(s: SparkSession, dir: String): (Double, Double, Double) = {
    val f = featureFrame(s, dir)
    val row = f.agg(
      count(lit(1)).as("n"),
      dsum(col("f2")).as("s2"),
      dsum(col("f3")).as("s3"),
      dsum(r6(col("f2") * col("f2"))).as("s22"),
      dsum(r6(col("f2") * col("f3"))).as("s23"),
      dsum(r6(col("f3") * col("f3"))).as("s33"),
      sum(col("y")).cast("double").as("b1"),
      dsum(r6(col("f2") * col("y").cast("double"))).as("b2"),
      dsum(r6(col("f3") * col("y").cast("double"))).as("b3")).collect()(0)
    val n = row.getLong(0).toDouble
    val (s2, s3, s22, s23, s33) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4),
        row.getDouble(5))
    val (b1, b2, b3) = (row.getDouble(6), row.getDouble(7), row.getDouble(8))
    // ridge-regularized normal equations; the formulas below are
    // mirrored CHARACTER-FOR-CHARACTER in the oracle CTEs (same
    // association order → same IEEE doubles)
    val a11 = n + Ridge; val a12 = s2; val a13 = s3
    val a22 = s22 + Ridge; val a23 = s23; val a33 = s33 + Ridge
    val det =
      a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
        a13 * (a12 * a23 - a22 * a13)
    val w1 =
      (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
        a13 * (b2 * a23 - a22 * b3)) / det
    val w2 =
      (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
        a13 * (a12 * b3 - b2 * a13)) / det
    val w3 =
      (a11 * (a22 * b3 - a23 * b2) - a12 * (a12 * b3 - b2 * a13) +
        b1 * (a12 * a23 - a22 * a13)) / det
    (w1, w2, w3)
  }

  /** The fitted coefficients, r6-rounded for the gate. */
  def qualityFit(s: SparkSession, dir: String): DataFrame = {
    val (w1, w2, w3) = fitWeights(s, dir)
    import s.implicits._
    Seq(("intercept", w1), ("log_words", w2), ("stop_ratio", w3))
      .toDF("feature", "w")
      .select(col("feature"), r6(col("w")).as("weight"))
      .orderBy(col("feature"))
  }

  /** Corpus scored by the fitted model: top-[[ScoredK]] docs by
    * predicted quality — the map-only projection pass (weights ride
    * along as literals; at scale this is scan → project → bounded
    * top-k, no shuffle beyond TakeOrdered's). */
  /** Map-only scoring of ANY (doc_id, text) relation under frozen
    * weights — the projection both [[qualityScored]] and the
    * streaming twin apply (shared definition, so batch and stream
    * arithmetic cannot drift). */
  private[graft] def scoreWith(
      d: DataFrame, w1: Double, w2: Double, w3: Double): DataFrame =
    featuresOf(d)
      .withColumn("quality",
        r6(lit(w1) + lit(w2) * col("f2") + lit(w3) * col("f3")))
      .select(col("doc_id"), col("quality"))

  def qualityScored(s: SparkSession, dir: String): DataFrame = {
    val (w1, w2, w3) = fitWeights(s, dir)
    scoreWith(t(s, dir, "documents"), w1, w2, w3)
      .orderBy(col("quality").desc, col("doc_id"))
      .limit(ScoredK)
  }

  // ---- oracle SQL ----

  private val stopList = TextOps.Stopwords.map("'" + _ + "'").mkString(", ")

  /** Features + the nine decimal-bridged sums + the Cramer solve as
    * CTEs — shared by both oracles. */
  private val fitCtes: String =
    s"""b AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    round(ln(len(w) + 1), 6) + 0 AS f2,
       |    round(CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) / len(w), 6) + 0 AS f3,
       |    CASE WHEN CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) >= 3.0
       |          AND CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) <= 10.0
       |         THEN 1 ELSE 0 END AS y
       |  FROM b),
       |sums AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(f2 AS DECIMAL(38,6))) AS DOUBLE) AS s2,
       |    CAST(SUM(CAST(f3 AS DECIMAL(38,6))) AS DOUBLE) AS s3,
       |    CAST(SUM(CAST(round(f2 * f2, 6) + 0 AS DECIMAL(38,6))) AS DOUBLE) AS s22,
       |    CAST(SUM(CAST(round(f2 * f3, 6) + 0 AS DECIMAL(38,6))) AS DOUBLE) AS s23,
       |    CAST(SUM(CAST(round(f3 * f3, 6) + 0 AS DECIMAL(38,6))) AS DOUBLE) AS s33,
       |    CAST(SUM(y) AS DOUBLE) AS b1,
       |    CAST(SUM(CAST(round(f2 * CAST(y AS DOUBLE), 6) + 0 AS DECIMAL(38,6))) AS DOUBLE) AS b2,
       |    CAST(SUM(CAST(round(f3 * CAST(y AS DOUBLE), 6) + 0 AS DECIMAL(38,6))) AS DOUBLE) AS b3
       |  FROM f),
       |aa AS (
       |  SELECT n + $Ridge AS a11, s2 AS a12, s3 AS a13,
       |    s22 + $Ridge AS a22, s23 AS a23, s33 + $Ridge AS a33,
       |    b1, b2, b3
       |  FROM sums),
       |dd AS (
       |  SELECT *,
       |    a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
       |      + a13 * (a12 * a23 - a22 * a13) AS det
       |  FROM aa),
       |qw AS (
       |  SELECT
       |    (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3)
       |      + a13 * (b2 * a23 - a22 * b3)) / det AS w1,
       |    (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13)
       |      + a13 * (a12 * b3 - b2 * a13)) / det AS w2,
       |    (a11 * (a22 * b3 - a23 * b2) - a12 * (a12 * b3 - b2 * a13)
       |      + b1 * (a12 * a23 - a22 * a13)) / det AS w3
       |  FROM dd)""".stripMargin

  val qualityFitSql: String =
    s"""WITH $fitCtes
       |SELECT feature, weight FROM (
       |  SELECT 'intercept' AS feature, round(w1, 6) + 0 AS weight FROM qw
       |  UNION ALL SELECT 'log_words', round(w2, 6) + 0 FROM qw
       |  UNION ALL SELECT 'stop_ratio', round(w3, 6) + 0 FROM qw)
       |ORDER BY feature""".stripMargin

  val qualityScoredSql: String =
    s"""WITH $fitCtes
       |SELECT doc_id, round(qw.w1 + qw.w2 * f.f2 + qw.w3 * f.f3, 6) + 0 AS quality
       |FROM f CROSS JOIN qw
       |ORDER BY quality DESC, doc_id
       |LIMIT $ScoredK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_fit" -> (qualityFit _),
    "quality_scored" -> (qualityScored _))

  val oracles: Map[String, String] = Map(
    "quality_fit" -> qualityFitSql,
    "quality_scored" -> qualityScoredSql)
}
