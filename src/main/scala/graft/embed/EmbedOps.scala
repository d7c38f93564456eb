package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types.{ArrayType, FloatType}

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

  /** Batched embedding via `mapPartitions`: texts reach the backend
    * in groups of `batchSize` — the reference's 200-text API batches
    * (`index.py:326,401-405`) — which is what a real model/HTTP
    * backend needs to amortize per-call cost. `grouped` is lazy, so
    * a partition is never fully materialized. Same results as
    * [[withEmbedding]] (asserted in EmbedderSpec); the UDF form
    * stays the default for codegen-friendly plans. */
  def withEmbeddingBatched(
      df: DataFrame,
      textCol: String = "text",
      outCol: String = "embedding",
      embedder: Embedder = HashEmbedder.default,
      batchSize: Int = 200): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embed(batch.map(_.getString(textIdx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) => Row.fromSeq(r.toSeq :+ v) }
      }
    }(Encoders.row(schema))
  }
}
