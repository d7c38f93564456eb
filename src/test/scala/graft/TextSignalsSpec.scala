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

  test("ngram_coverage matches hand-computed train→heldout coverage per n") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ngcov").toString
    Seq(
      (0L, "a b c d"), // even → train
      (2L, "c d e"),   // even → train
      (1L, "a b x"),   // odd → heldout
      (3L, "d e"))     // odd → heldout
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.ngramCoverage(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // unigrams: train types {a,b,c,d,e}; heldout a,b,x,d,e → 4/5 covered
    assert(got(1) == ((5L, 5L, 4L, 0.8)), s"$got")
    // bigrams: train {a b, b c, c d, d e}; heldout [a b, b x, d e] → 2/3
    assert(got(2) == ((4L, 3L, 2L, 0.666667)), s"$got")
    // trigrams: train {a b c, b c d, c d e}; heldout [a b x] → 0/1
    assert(got(3) == ((3L, 1L, 0L, 0.0)), s"$got")
  }

  test("heaps_fit recovers sublinear vocabulary growth and pins the degenerate cases to zero") {
    import spark.implicits._
    // 16 docs, two per octile bucket; each doc mints a shrinking
    // number of NEW types on top of a repeated closed set, so V(N)
    // grows sublinearly and the log-log fit should land in (0, 1)
    // with a tight R².
    val docs = (0 until 16).map { i =>
      val newTypes = (0 until math.max(1, 8 - i / 2)).map(j => s"n${i}_$j")
      val repeats = (0 until 12).map(j => s"base${j % 6}")
      (i.toLong, (newTypes ++ repeats).mkString(" "))
    }
    val d = Files.createTempDirectory("graft-heaps").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    val Array(row) = TextOps.heapsFit(spark, d).collect()
    val (n, beta, r2) = (row.getLong(0), row.getDouble(1), row.getDouble(3))
    assert(n == 8L, s"eight octile points: $row")
    assert(beta > 0.0 && beta < 1.0, s"sublinear growth: beta=$beta")
    assert(r2 > 0.8, s"log-log fit should be tight on a Heaps-like corpus: r2=$r2")
    // degenerate 1: constant vocabulary after the first bucket →
    // y-variance 0 → r2 pinned to 0, beta ~ 0 (flat line)
    val dc = Files.createTempDirectory("graft-heaps-const").toString
    (0 until 16).map(i => (i.toLong, "same words every time"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dc/documents.parquet")
    val Array(rc) = TextOps.heapsFit(spark, dc).collect()
    assert(math.abs(rc.getDouble(1)) < 1e-5 && rc.getDouble(3) == 0.0,
      s"flat vocabulary → zero slope, r2 pinned 0: $rc")
    // degenerate 2: a single doc puts ALL mass in bucket 0 → every
    // cumulative point identical → x-variance 0 → whole fit pinned 0
    val d1 = Files.createTempDirectory("graft-heaps-one").toString
    Seq((0L, "only one document here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d1/documents.parquet")
    val Array(r1) = TextOps.heapsFit(spark, d1).collect()
    assert(r1.getDouble(1) == 0.0 && r1.getDouble(2) == 0.0 && r1.getDouble(3) == 0.0,
      s"zero x-variance pins the whole fit: $r1")
  }
}
