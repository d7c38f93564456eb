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

  private def backends(s: SparkSession, dir: String): Seq[(String, DataFrame)] = Seq(
    ("graph", GraphAnn.annGraphTopk(s, dir)),
    ("ivf", KMeansVec.ivfTopK(s, dir)),
    ("ivfpq", Pq.annIvfPqTopk(s, dir)),
    ("lsh", VectorQueries.annLshTopk(s, dir)),
    ("pq", Pq.annPqTopk(s, dir)),
    ("sq", Quantize.sqTopK(s, dir)))

  /** backend, returned, hits, recall@5 — ordered by backend name. */
  def annRecallReport(s: SparkSession, dir: String): DataFrame = {
    val exact = VectorQueries.knnTopkK(s, dir, K)
      .select(col("vec_id").as("evid"))
    val all = backends(s, dir)
      .map { case (n, df) => df.select(lit(n).as("backend"), col("vec_id")) }
      .reduce(_ union _)
    all.join(exact, col("vec_id") === col("evid"), "left")
      .groupBy(col("backend"))
      .agg(count(lit(1)).as("returned"), count(col("evid")).as("hits"))
      .select(col("backend"), col("returned"), col("hits"),
        r6(col("hits").cast("double") / lit(K.toDouble)).as("recall_at_5"))
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
    s"""WITH exact AS (SELECT vec_id AS evid FROM (
       |${VectorQueries.knnTopkSql}
       |)),
       |allb AS (
       |$union
       |)
       |SELECT backend, CAST(COUNT(*) AS BIGINT) AS returned,
       |  CAST(COUNT(e.evid) AS BIGINT) AS hits,
       |  round(CAST(COUNT(e.evid) AS DOUBLE) / $K.0, 6) + 0 AS recall_at_5
       |FROM allb a LEFT JOIN exact e ON a.vec_id = e.evid
       |GROUP BY backend
       |ORDER BY backend""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_report" -> (annRecallReport _))

  val oracles: Map[String, String] = Map(
    "ann_recall_report" -> annRecallReportSql)
}
