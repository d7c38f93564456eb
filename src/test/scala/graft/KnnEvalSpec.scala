package graft

import graft.ops.VectorQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** kNN-classifier evaluation + Rocchio expansion on a planted corpus
  * of ten tight labeled clusters: every probe's 5-NN majority label
  * must equal its own, and the expanded query must stay inside its
  * cluster. */
class KnnEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dim = 16

  private def vec(axis: Int, jitter: Int): Seq[Float] =
    Seq.tabulate(dim)(j =>
      (if (j == axis) 1.0f else 0.0f) +
        (if (j == (jitter % dim)) 0.01f else 0.0f))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-knneval").toString
    // ids 0..19 are the probe slice (2 per label); ids 20..119 the
    // corpus (10 per label) — every probe has 10 same-label corpus
    // neighbors far closer than any cross-label vector
    val rows = (0 until 120).map { id =>
      val axis = id % 10
      Row(id.toLong, vec(axis, id), s"L$axis")
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted separable labels classify perfectly") {
    val got = VectorQueries.knnLabelEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 10, s"one row per label: ${got.toSeq}")
    assert(got.map(_._2).sum == 20L, "all 20 probes evaluated")
    got.foreach { case (l, nEval, nCorrect, acc) =>
      assert(nEval == 2L, s"two probes per label $l")
      assert(nCorrect == nEval, s"label $l must classify perfectly")
      assert(acc == 1.0)
    }
  }

  test("rocchio expansion stays inside the query's cluster") {
    val got = VectorQueries.rocchioTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.length == 5)
    // query vec 0 is axis 0 / label L0; PRF centroid reinforces it
    got.foreach { case (id, l, _) =>
      assert(l == "L0", s"expanded retrieval drifted out of cluster: ($id, $l)")
    }
    val dists = got.map(_._3).toSeq
    assert(dists == dists.sorted, "ascending distance")
  }

  test("label eval is deterministic under physical relayout") {
    val a = VectorQueries.knnLabelEval(spark, dir).collect().map(_.toSeq).toSeq
    val d2 = Files.createTempDirectory("graft-knneval2").toString
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(7)
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val b = VectorQueries.knnLabelEval(spark, d2).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("label_margin_report: separable labels carry positive margins and the -1 sentinel; a planted imposter flags with its confuser; zero-norm rows vanish") {
    val d = Files.createTempDirectory("graft-margin").toString
    // labels 0..3, ten on-axis vectors each; vec 1000 is the ZERO
    // vector (label 0, must be excluded everywhere); vec 1001 is
    // label 0 but sits ON label 1's axis (the mislabeled imposter)
    val rows = (0 until 40).map { id =>
      val label = id % 4
      Row(id.toLong, vec(label, id), label)
    } :+ Row(1000L, Seq.fill(dim)(0.0f), 0) :+ Row(1001L, vec(1, 7), 0)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = VectorQueries.labelMarginReport(spark, d).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    assert(got.keySet == Set(0, 1, 2, 3))
    // zero-norm excluded: label 0 counts 10 on-axis + the imposter
    assert(got(0)._1 == 11L, s"zero vector must not count: ${got(0)}")
    assert(got(0)._3 == 1L && got(0)._5 == 1,
      s"the imposter is label 0's one confusion, nearest = 1: ${got(0)}")
    for (l <- Seq(1, 2, 3)) {
      val (n, mean, conf, rate, top) = got(l)
      assert(n == 10L && conf == 0L && rate == 0.0 && top == -1,
        s"clean label $l: ${got(l)}")
      assert(mean > 0.5, s"separable label $l has a wide positive margin: ${got(l)}")
    }
    // determinism under relayout (window tie-breaks are total)
    val d2 = Files.createTempDirectory("graft-margin2").toString
    spark.read.parquet(s"$d/embeddings.parquet").repartition(5)
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val again = VectorQueries.labelMarginReport(spark, d2).collect().map(_.toSeq).toSeq
    assert(again == VectorQueries.labelMarginReport(spark, d).collect().map(_.toSeq).toSeq)
  }
}
