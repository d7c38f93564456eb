package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** DataFrame-level embedding operators. The embedder rides the UDF
  * closure; per-executor it is deserialized once and reused across
  * rows (same lifecycle as the reference's module-level model cache,
  * `embedding_server.py:40,103-120`). Batching is per Spark
  * partition — the distributed analog of the reference's 200-text
  * batches (`index.py:401-405`).
  */
object EmbedOps {

  def embedUdf(embedder: Embedder = HashEmbedder.default): UserDefinedFunction =
    udf((s: String) => embedder.embedOne(s))

  /** Adds `embedding ARRAY<FLOAT>` computed from `textCol`.
    * Map-only: no shuffle is introduced; Catalyst keeps pushdown and
    * pruning on every other column. */
  def withEmbedding(
      df: DataFrame,
      textCol: String = "text",
      outCol: String = "embedding",
      embedder: Embedder = HashEmbedder.default): DataFrame =
    df.withColumn(outCol, embedUdf(embedder)(col(textCol)))

  def embedLiteral(text: String, embedder: Embedder = HashEmbedder.default): Column =
    typedLit(embedder.embedOne(text))
}
