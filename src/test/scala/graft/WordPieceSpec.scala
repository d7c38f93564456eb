package graft

import graft.ops.WordPiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** WordPiece contract: greedy longest-match-first segmentation with
  * positional (## continuation) pieces, char-coverage encodability,
  * and determinism. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("graft-wp").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("greedy longest-match: a frequent 4-prefix + continuation segments as 2 pieces") {
    // "abcd" ×30 puts the initial piece `abcd` in the vocabulary;
    // "qzz" ×30 puts the continuation piece `##zz` in; the probe word
    // "abcdzz" must then segment abcd + ##zz — greedy takes the
    // LONGEST initial match (abcd, not a/ab/abc) and the longest
    // continuation match at position 4
    val docs = Seq(
      (0L, Seq.fill(30)("abcd").mkString(" ")),
      (1L, Seq.fill(30)("qzz").mkString(" ")),
      (2L, "abcdzz"))
    val d = writeDocs(docs)
    val rows = WordPiece.wordpieceEncode(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(0L) == ((30L, 30L, 1.0)), s"single-piece words: ${rows(0L)}")
    assert(rows(2L)._2 == 2L,
      s"abcdzz must split abcd + ##zz (2 pieces), got ${rows(2L)}")
    // the vocabulary audit must surface the planted pieces
    val vocab = WordPiece.wordpieceVocab(spark, d).collect().map(_.getString(0)).toSet
    assert(vocab.contains("abcd") && vocab.contains("##zz"), s"vocab: $vocab")
  }

  test("char coverage makes every word encodable — no token ever drops") {
    val docs = Seq(
      (0L, "zebra quixotic jumbles vex"),
      (1L, "pack my box with five dozen liquor jugs"))
    val d = writeDocs(docs)
    val rows = WordPiece.wordpieceEncode(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 4L && rows(1L) == 8L,
      s"every word must encode (coverage union): $rows")
  }

  test("fertility is 1.0 exactly when every word is a vocabulary piece") {
    val d = writeDocs(Seq((0L, Seq.fill(20)("ab cd").mkString(" "))))
    val r = WordPiece.wordpieceEncode(spark, d).collect().head
    assert(r.getDouble(3) == 1.0)
  }

  test("deterministic across runs") {
    val d = writeDocs(Seq(
      (0L, "interchangeable parts require interchangeable thinking"),
      (1L, "thinking parts think")))
    val a = WordPiece.wordpieceEncode(spark, d).collect().toSeq
    val b = WordPiece.wordpieceEncode(spark, d).collect().toSeq
    assert(a == b)
  }
}
