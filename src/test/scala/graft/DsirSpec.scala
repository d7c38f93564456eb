package graft

import graft.ops.Dsir
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DSIR's selling point, planted: a doc whose CONTENT matches the
  * target domain must outscore docs that merely share its label.
  * Target model = lang='en'; the planted doc is lang='de' but written
  * in the en vocabulary — importance weighting has to rank it with
  * the en docs, above every true-de/zh doc. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val EnVocab = "alpha beta gamma delta epsilon"
  private val ZhVocab = "omega psi chi phi upsilon"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dsir").toString
    val rows =
      (0L to 5L).map(i => Row(i, s"$EnVocab alpha beta tok$i", "en", "src0", 40L)) ++
        (10L to 15L).map(i => Row(i, s"$ZhVocab omega psi tok$i", "zh", "src1", 40L)) ++
        // the plant: en-vocabulary content under a de label
        Seq(Row(20L, s"$EnVocab alpha beta planted", "de", "src2", 40L)) ++
        Seq(Row(21L, s"$ZhVocab omega psi andere", "de", "src2", 40L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("en-like content outscores target-unlike content regardless of label") {
    val w = Dsir.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(w.size == 14)
    val planted = w(20L)
    val zhMax = (Seq(21L) ++ (10L to 15L)).map(w).max
    val enMin = (0L to 5L).map(w).min
    assert(planted > zhMax,
      s"planted en-like doc must outscore all zh-vocab docs: $planted <= $zhMax")
    assert(enMin > zhMax, "target docs themselves must outscore the off-target pool")
  }

  test("n_feats counts unigrams plus bigrams (2n-1) and weights are deterministic") {
    val rows = Dsir.dsirWeights(spark, dir).collect()
    rows.foreach { r =>
      // every fixture doc is 8 tokens → 8 + 7 = 15 features
      assert(r.getLong(2) == 15L, s"doc ${r.getLong(0)}: ${r.getLong(2)} feats")
    }
    val again = Dsir.dsirWeights(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "weights must be bit-deterministic")
  }

  test("gumbel sample is a deterministic size-k draw favoring high weights") {
    val s1 = Dsir.dsirSample(spark, dir).collect().map(_.getLong(0)).toSeq
    val s2 = Dsir.dsirSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "hash-derived gumbel keys must replay identically")
    assert(s1.size == Dsir.SampleK)
    assert(s1.toSet.size == Dsir.SampleK, "sampling is without replacement")
  }
}
