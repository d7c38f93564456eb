package graft.ops

import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN backend evaluation — the recall harness an index deployment
  * runs before switching backends or retuning (the reference pins its
  * store's HNSW defaults, `/root/reference/index.py:432-435`; this op
  * is the measurement that justifies such a choice): every
  * approximate backend's top-k against the exact-kNN ground truth for
  * the registered query, as one relation.
  *
  * Composition, not re-implementation: each backend row set IS the
  * corresponding registered query (`ann_graph_topk`, `ann_ivf_topk`,
  * `ann_ivfpq_topk`, `ann_lsh_topk`, `ann_pq_topk`, `ann_sq_topk`),
  * so the report inherits their individually-proven oracle parity;
  * the evaluation itself is a union + left join against the 5-row
  * exact set + one tiny aggregation. At scale the cost is the sum of
  * the backend searches — each already sub-linear by its own design —
  * and the ground-truth scan, which is exactly what a recall audit
  * must pay (run it on a sampled query set, not per query, in
  * production).
  */
object AnnEval {

  private val K = 5

  private[graft] val BackendNames = Seq("graph", "ivf", "ivfpq", "lsh", "pq", "sq")

  private def backends(s: SparkSession, dir: String): Seq[(String, DataFrame)] =
    BackendNames.zip(Seq(
      GraphAnn.annGraphTopk(s, dir),
      KMeansVec.ivfTopK(s, dir),
      Pq.annIvfPqTopk(s, dir),
      VectorQueries.annLshTopk(s, dir),
      Pq.annPqTopk(s, dir),
      Quantize.sqTopK(s, dir)))

  /** backend, returned, hits, recall@5 — ordered by backend name.
    * EVERY backend always has a row: the aggregation left-joins
    * against the literal backend list, so a degenerate backend that
    * returns zero rows reports recall 0.0 instead of silently
    * vanishing from its own audit (groupBy would drop the empty
    * group — the one failure mode a recall report exists to catch). */
  def annRecallReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = VectorQueries.knnTopkK(s, dir, K)
      .select(col("vec_id").as("evid"))
    val all = backends(s, dir)
      .map { case (n, df) => df.select(lit(n).as("backend"), col("vec_id")) }
      .reduce(_ union _)
    val agg = all.join(exact, col("vec_id") === col("evid"), "left")
      .groupBy(col("backend"))
      .agg(count(lit(1)).as("returned"), count(col("evid")).as("hits"))
    BackendNames.toDF("backend")
      .join(agg, Seq("backend"), "left")
      .select(col("backend"),
        coalesce(col("returned"), lit(0L)).as("returned"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        r6(coalesce(col("hits"), lit(0L)).cast("double") / lit(K.toDouble))
          .as("recall_at_5"))
      .orderBy(col("backend"))
  }

  /** The oracle composes each backend's own proven oracle SQL as a
    * subquery (graph ANN's declared oracle is exact kNN — recall 1.0
    * at the registered settings is its gate). */
  val annRecallReportSql: String = {
    def sub(name: String, sql: String) =
      s"SELECT '$name' AS backend, vec_id FROM (\n$sql\n)"
    val union = Seq(
      sub("graph", VectorQueries.knnTopkSql),
      sub("ivf", KMeansVec.ivfTopKSql),
      sub("ivfpq", Pq.annIvfPqTopkSql),
      sub("lsh", VectorQueries.annLshTopkSql),
      sub("pq", Pq.annPqTopkSql),
      sub("sq", Quantize.sqTopKSql)).mkString("\nUNION ALL\n")
    val nameList = BackendNames.map(n => s"'$n'").mkString(", ")
    s"""WITH exact AS (SELECT vec_id AS evid FROM (
       |${VectorQueries.knnTopkSql}
       |)),
       |allb AS (
       |$union
       |),
       |names AS (SELECT unnest([$nameList]) AS backend),
       |agg AS (
       |  SELECT backend, COUNT(*) AS returned, COUNT(e.evid) AS hits
       |  FROM allb a LEFT JOIN exact e ON a.vec_id = e.evid
       |  GROUP BY backend)
       |SELECT n.backend, CAST(coalesce(agg.returned, 0) AS BIGINT) AS returned,
       |  CAST(coalesce(agg.hits, 0) AS BIGINT) AS hits,
       |  round(CAST(coalesce(agg.hits, 0) AS DOUBLE) / $K.0, 6) + 0 AS recall_at_5
       |FROM names n LEFT JOIN agg ON agg.backend = n.backend
       |ORDER BY n.backend""".stripMargin
  }

  // ------------------------------------------------ batch recall

  private val BatchK = 3

  private[graft] val BatchBackendNames = Seq("graph", "ivf")

  /** Batch recall audit — the form a production audit actually runs:
    * recall of each BATCH backend ([[GraphAnn.annGraphBatchTopk]],
    * [[KMeansVec.ivfBatchTopK]]) against exact batch kNN, per
    * (backend, query) plus one mean row per backend (`query_id = -1`,
    * so the relation needs no NULL-ordering convention). The same
    * totality guarantee as [[annRecallReport]]: the (backend × query)
    * grid left-joins the results, so a backend that drops a query
    * reports recall 0.0 for it instead of vanishing. Cost at scale =
    * the two batch searches (each already sub-linear per query) + the
    * exact ground-truth batch over the SAMPLED query set — exactly
    * what a recall audit must pay, and why it runs on a sample. */
  def annRecallBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = VectorQueries.knnBatch(s, dir)
      .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
    val results = Seq(
      ("graph", GraphAnn.annGraphBatchTopk(s, dir)),
      ("ivf", KMeansVec.ivfBatchTopK(s, dir)))
      .map { case (n, df) =>
        df.select(lit(n).as("backend"), col("query_id"), col("vec_id")) }
      .reduce(_ union _)
    val grid = BatchBackendNames.toDF("backend")
      .crossJoin(exact.select(col("query_id")).distinct())
    val perPair = results
      .join(exact, Seq("query_id", "vec_id"), "left")
      .groupBy(col("backend"), col("query_id"))
      .agg(count(lit(1)).as("returned"), count(col("hit")).as("hits"))
    val per = grid.join(perPair, Seq("backend", "query_id"), "left")
      .select(col("backend"), col("query_id"),
        coalesce(col("returned"), lit(0L)).as("returned"),
        coalesce(col("hits"), lit(0L)).as("hits"))
    val perQuery = per
      .select(col("backend"), col("query_id"), col("returned"), col("hits"),
        r6(col("hits").cast("double") / lit(BatchK.toDouble)).as("recall_at_3"))
    val mean = per.groupBy(col("backend"))
      .agg(sum(col("returned")).as("returned"), sum(col("hits")).as("hits"),
        count(lit(1)).as("nq"))
      .select(col("backend"), lit(-1L).as("query_id"), col("returned"), col("hits"),
        r6(col("hits").cast("double") / (lit(BatchK.toDouble) * col("nq")))
          .as("recall_at_3"))
    perQuery.unionByName(mean)
      .orderBy(col("backend"), col("query_id"))
  }

  /** Oracle: composes the two batch backends' own proven oracles
    * (graph batch's declared oracle IS exact batch kNN — recall 1.0
    * at the registered settings is its gate; IVF batch replays its
    * probe plan), then the same grid + per-query + mean tail. */
  val annRecallBatchSql: String = {
    val nameList = BatchBackendNames.map(n => s"'$n'").mkString(", ")
    s"""WITH exact AS (SELECT query_id, vec_id FROM (
       |${VectorQueries.knnBatchSql}
       |)),
       |gb AS (SELECT 'graph' AS backend, query_id, vec_id FROM (
       |${VectorQueries.knnBatchSql}
       |)),
       |ib AS (SELECT 'ivf' AS backend, query_id, vec_id FROM (
       |${KMeansVec.ivfBatchTopKSql}
       |)),
       |allb AS (SELECT * FROM gb UNION ALL SELECT * FROM ib),
       |grid AS (
       |  SELECT n.backend, q.query_id
       |  FROM (SELECT unnest([$nameList]) AS backend) n
       |  CROSS JOIN (SELECT DISTINCT query_id FROM exact) q),
       |pp AS (
       |  SELECT a.backend, a.query_id, COUNT(*) AS returned,
       |    COUNT(e.vec_id) AS hits
       |  FROM allb a LEFT JOIN exact e
       |    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
       |  GROUP BY a.backend, a.query_id),
       |per AS (
       |  SELECT g.backend, g.query_id,
       |    coalesce(pp.returned, 0) AS returned, coalesce(pp.hits, 0) AS hits
       |  FROM grid g LEFT JOIN pp
       |    ON pp.backend = g.backend AND pp.query_id = g.query_id)
       |SELECT backend, query_id, returned, hits, recall_at_3 FROM (
       |  SELECT backend, query_id, CAST(returned AS BIGINT) AS returned,
       |    CAST(hits AS BIGINT) AS hits,
       |    round(CAST(hits AS DOUBLE) / $BatchK.0, 6) + 0 AS recall_at_3
       |  FROM per
       |  UNION ALL
       |  SELECT backend, CAST(-1 AS BIGINT) AS query_id,
       |    CAST(SUM(returned) AS BIGINT) AS returned,
       |    CAST(SUM(hits) AS BIGINT) AS hits,
       |    round(CAST(SUM(hits) AS DOUBLE) / ($BatchK.0 * COUNT(*)), 6) + 0 AS recall_at_3
       |  FROM per GROUP BY backend)
       |ORDER BY backend, query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_report" -> (annRecallReport _),
    "ann_recall_batch" -> (annRecallBatch _))

  val oracles: Map[String, String] = Map(
    "ann_recall_report" -> annRecallReportSql,
    "ann_recall_batch" -> annRecallBatchSql)
}
