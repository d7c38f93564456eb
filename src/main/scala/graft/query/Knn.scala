package graft.query

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact cosine top-k retrieval — the Spark-native form of the
  * reference's one real query operator (log-vector `ask.py:200-203`:
  * ChromaDB HNSW `collection.query(query_embeddings=[q], n_results=k)`
  * in the cosine space declared at `index.py:434`).
  *
  * Physical plan: `orderBy(dist).limit(k)` compiles to
  * `TakeOrderedAndProject` — per-partition bounded heaps merged at
  * the driver, O(n) scan with no global sort or shuffle. That is the
  * optimal exact plan at any scale; at 100 TB the ANN path
  * ([[graft.ops.AnnIvf]]) prunes candidates first and reuses this
  * on the surviving bucket.
  *
  * Zero-norm vectors score NaN and are excluded (SURVEY quirk Q4
  * fix: the reference inserts `[0.0]*384` on embed failure,
  * `index.py:138`, which degenerates under cosine).
  */
object Knn {

  /** Score every row against a constant query vector. `dist` is
    * cosine distance rounded to 6 decimals — rounding pre-sort makes
    * ranking reproducible across engines/partitionings, with `idCol`
    * as the unique tiebreak. */
  def scored(index: DataFrame, queryVec: Column, vecCol: String = "embedding"): DataFrame =
    index
      .withColumn("dist", r6(cosineDist(col(vecCol), queryVec)))
      .filter(!isnan(col("dist")) && col("dist").isNotNull)

  def topK(
      index: DataFrame,
      queryVec: Column,
      k: Int = 5,
      idCol: String = "id",
      vecCol: String = "embedding"): DataFrame =
    scored(index, queryVec, vecCol)
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Scan-pruned top-k: scores on (id, embedding) ONLY, takes the
    * top k, then joins back to fetch payload columns (text, source)
    * for just those k rows. At 100 TB the payload never travels
    * through the scan, the per-partition heaps, or the driver merge
    * — column pruning reaches the parquet reader (asserted in
    * PlanSpec). The rejoin is a broadcast of k ids. */
  def topKWithFetch(
      index: DataFrame,
      queryVec: Column,
      k: Int = 5,
      idCol: String = "id",
      fetchCols: Seq[String] = Seq("source", "chunk_index", "text"),
      vecCol: String = "embedding"): DataFrame = {
    val slim = index.select(col(idCol), col(vecCol))
    val top = topK(slim, queryVec, k, idCol, vecCol).select(col(idCol), col("dist"))
    index.select((col(idCol) +: fetchCols.map(col)): _*)
      .join(broadcast(top), Seq(idCol))
      .orderBy(col("dist"), col(idCol))
  }

  /** Top-k nearest per group (e.g. per label / per source file):
    * window row_number + filter. One hash-partition shuffle on the
    * group key; with the index pre-partitioned by that key (see
    * VectorIndex.write) the exchange is elided. */
  def topKPerGroup(
      index: DataFrame,
      queryVec: Column,
      groupCol: String,
      k: Int,
      idCol: String = "id",
      vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("dist"), col(idCol))
    scored(index, queryVec, vecCol)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Context assembly (reference `ask.py:207-217`): per-hit block
    * `"File: {source} (chunk {i})\n{text}\n\n"`, concatenated in
    * ascending-distance order. Returns a single-row DataFrame
    * `(context STRING)`; empty-hit handling (`ask.py:219-220`) is
    * the caller's driver-side branch. */
  def assembleContext(hits: DataFrame): DataFrame =
    hits
      .withColumn("piece",
        format_string("File: %s (chunk %d)\n%s\n\n",
          col("source"), col("chunk_index"), col("text")))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("dist"), col("id"), col("piece")))),
            h => h.getField("piece")),
          "").as("context"))
}
