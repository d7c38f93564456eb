package graft

import graft.ops.{Retrieval, TextOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Gopher repetition signals (hand-computed goldens) and the
  * Jelinek–Mercer smoothing bounds. */
class TextSignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-textsig").toString
    val rows = Seq(
      Row(0L, "a b a b a b"),          // looping boilerplate
      Row(1L, "v w x y z"),            // all-distinct
      Row(2L, "a b"))                  // < 3 tokens → out of scope
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("rep_ngrams matches hand-computed repetition fractions") {
    val got = TextOps.repNgrams(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // doc 0: bigrams [ab, ba, ab, ba, ab] → top 'a b' 3/5; trigrams
    // [aba, bab, aba, bab] → all duplicated → 4/4
    // doc 1: 4 distinct bigrams → 1/4; 3 distinct trigrams → 0/3
    // doc 2: dropped (< 3 tokens)
    assert(got == Seq((0L, 0.6, 1.0), (1L, 0.25, 0.0)), s"got $got")
  }

  test("boilerplate scores strictly above organic text on both signals") {
    val m = TextOps.repNgrams(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(0L)._1 > m(1L)._1 && m(0L)._2 > m(1L)._2)
  }

  test("JM smoothing bounds: 0 ≤ nll_jm ≤ nll_bigram + ln(1/λ), and ≤ nll_unigram + ln(1/(1−λ))") {
    val sf = "/root/testdata/sf0.001"
    val jm = Retrieval.jmLogprob(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = Retrieval.bigramLogprob(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lnInvLambda = -math.log(0.75)   // ≈ 0.2877
    jm.foreach { case (id, nll) =>
      assert(nll >= 0.0, s"doc $id: p ≤ 1 ⇒ nll ≥ 0, got $nll")
      assert(nll <= bi(id) + lnInvLambda + 1e-6,
        s"doc $id: p_jm ≥ λ·p_bi bound violated: jm=$nll bi=${bi(id)}")
    }
    // mixing in the unigram prior can only help against the unigram
    // model by at most ln(1/(1−λ)) per position
    val uni = Retrieval.unigramLogprob(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lnInv1mLambda = -math.log(0.25) // ≈ 1.3863
    // unigram NLL averages over n_tokens, JM over n_bigrams = n−1;
    // compare only docs where the two denominators are close enough
    // for the per-position bound to transfer (≥ 50 tokens)
    val nTok = Retrieval.unigramLogprob(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    jm.filter { case (id, _) => nTok(id) >= 50 }.foreach { case (id, nll) =>
      val slack = lnInv1mLambda + uni(id) / (nTok(id) - 1) + 1e-6
      assert(nll <= uni(id) + slack,
        s"doc $id: jm=$nll uni=${uni(id)} exceeds unigram-prior bound")
    }
  }
}
