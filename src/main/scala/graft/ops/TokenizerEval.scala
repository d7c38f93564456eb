package graft.ops

import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-tokenizer fertility comparison — the table a tokenizer
  * selection actually gets decided on: corpus-total words, pieces,
  * and pieces-per-word for the three trained subword tokenizers the
  * engine fits (BPE [[Bpe]], unigram-LM [[UnigramLm]], WordPiece
  * [[WordPiece]]), each under its own word regime (BPE trains on
  * `[a-z]+` word runs; unigram/WordPiece on whitespace words ≤ their
  * MaxWordLen — the comparison is of END-TO-END tokenizer stacks,
  * conventions included, which is what a pipeline swaps between).
  *
  * Pure composition: the three per-document encode queries are
  * already oracle-proven; this aggregates each to one corpus row —
  * integer sums (exact), one r6-rounded ratio. Shape at 100 TB: the
  * encodes are the cost (each one corpus pass over already-fitted
  * frozen vocabularies); the fold to three rows is a map-side
  * partial aggregation. The oracle nests the three proven encode
  * SQLs as MATERIALIZED derived tables, so each evaluates once.
  */
object TokenizerEval {

  private def corpusRow(df: DataFrame, name: String, wordsCol: String): DataFrame =
    df.agg(
        sum(col(wordsCol)).as("n_words"),
        sum(col("n_pieces")).as("np"))
      .select(lit(name).as("tokenizer"),
        col("n_words"), col("np").as("n_pieces"),
        r6(col("np").cast("double") / col("n_words")).as("fertility"))

  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    corpusRow(Bpe.bpeEncode(s, dir), "bpe", "n_tokens")
      .unionAll(corpusRow(UnigramLm.unigramEncode(s, dir), "unigram", "n_words"))
      .unionAll(corpusRow(WordPiece.wordpieceEncode(s, dir), "wordpiece", "n_words"))
      .orderBy(col("tokenizer"))

  val tokenizerFertilitySql: String = {
    def row(name: String, inner: String, wordsCol: String) =
      s"""SELECT '$name' AS tokenizer,
         |  CAST(SUM($wordsCol) AS BIGINT) AS n_words,
         |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
         |  round(CAST(SUM(n_pieces) AS DOUBLE) / SUM($wordsCol), 6) + 0 AS fertility
         |FROM (
         |$inner
         |) ${name}_enc""".stripMargin
    s"""SELECT * FROM (
       |${row("bpe", Bpe.bpeEncodeSql, "n_tokens")}
       |UNION ALL
       |${row("unigram", UnigramLm.unigramEncodeSql, "n_words")}
       |UNION ALL
       |${row("wordpiece", WordPiece.wordpieceEncodeSql, "n_words")}
       |)
       |ORDER BY tokenizer""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tokenizer_fertility" -> (tokenizerFertility _))

  val oracles: Map[String, String] = Map(
    "tokenizer_fertility" -> tokenizerFertilitySql)
}
