package graft

import graft.ops.QualityModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Distributed closed-form ridge regression: the Cramer solve is
  * cross-checked against an independent Gaussian-elimination solver
  * on the same collected design matrix, the fit is bit-stable under
  * physical relayout (the decimal-bridge guarantee), and scoring
  * respects the fitted model. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  /** Plain Gaussian elimination with partial pivoting — an
    * implementation with NOTHING in common with the Cramer path. */
  private def solve3(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = a.map(_.clone())
    val v = b.clone()
    for (col <- 0 until 3) {
      val p = (col until 3).maxBy(r => math.abs(m(r)(col)))
      val (mr, vv) = (m(p), v(p)); m(p) = m(col); v(p) = v(col); m(col) = mr; v(col) = vv
      for (r <- col + 1 until 3) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col until 3) m(r)(c) -= f * m(col)(c)
        v(r) -= f * v(col)
      }
    }
    val x = new Array[Double](3)
    for (r <- 2 to 0 by -1) {
      var s = v(r)
      for (c <- r + 1 until 3) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    x
  }

  test("cramer weights match an independent dense solver") {
    val feats = QualityModel.featureFrame(spark, dir)
      .select(col("f2"), col("f3"), col("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2).toDouble))
    val n = feats.length.toDouble
    var s2 = 0.0; var s3 = 0.0; var s22 = 0.0; var s23 = 0.0; var s33 = 0.0
    var b1 = 0.0; var b2 = 0.0; var b3 = 0.0
    feats.foreach { case (f2, f3, y) =>
      s2 += f2; s3 += f3; s22 += f2 * f2; s23 += f2 * f3; s33 += f3 * f3
      b1 += y; b2 += f2 * y; b3 += f3 * y
    }
    val l = QualityModel.Ridge
    val expected = solve3(
      Array(
        Array(n + l, s2, s3),
        Array(s2, s22 + l, s23),
        Array(s3, s23, s33 + l)),
      Array(b1, b2, b3))
    val (w1, w2, w3) = QualityModel.fitWeights(spark, dir)
    // r6-rounded Gram entries vs raw-double test sums → small drift;
    // the solve itself must agree far tighter than the feature noise
    assert(math.abs(w1 - expected(0)) < 1e-3, s"$w1 vs ${expected(0)}")
    assert(math.abs(w2 - expected(1)) < 1e-3, s"$w2 vs ${expected(1)}")
    assert(math.abs(w3 - expected(2)) < 1e-3, s"$w3 vs ${expected(2)}")
  }

  test("fit is bit-stable under physical relayout") {
    val a = QualityModel.fitWeights(spark, dir)
    val relaid = Files.createTempDirectory("graft-qm-relay").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .orderBy(col("lang"), col("doc_id").desc)
      .repartition(13)
      .write.mode("overwrite").parquet(s"$relaid/documents.parquet")
    val b = QualityModel.fitWeights(spark, relaid)
    assert(a == b, "decimal-bridged fit must not depend on layout")
  }

  test("scored: k rows, descending, model-consistent") {
    val rows = QualityModel.qualityScored(spark, dir).collect()
    assert(rows.length == QualityModel.ScoredK)
    val qs = rows.map(_.getDouble(1)).toSeq
    assert(qs == qs.sorted.reverse)
    // recompute the top row's score from the raw features + weights
    val (w1, w2, w3) = QualityModel.fitWeights(spark, dir)
    val top = rows.head
    val f = QualityModel.featureFrame(spark, dir)
      .filter(col("doc_id") === top.getLong(0)).collect().head
    val expect = w1 + w2 * f.getDouble(1) + w3 * f.getDouble(2)
    assert(math.abs(top.getDouble(1) - expect) < 1e-6)
  }

  test("logistic IRLS separates a linearly separable planted corpus; fit is run-stable") {
    import spark.implicits._
    // y = 1 docs (mwl in band) are stopword-rich; y = 0 docs (very
    // long words push mwl out of band) carry no stopwords — the
    // label is linearly separable in the stop-ratio feature
    val good = (1L to 30L).map(i =>
      (i, "the quick brown fox of the woods and the fields runs home"))
    val bad = (31L to 60L).map(i =>
      (i, "supercalifragilistic expialidocious incomprehensibilities " +
        "antidisestablishmentarianism floccinaucinihilipilification"))
    val dir = Files.createTempDirectory("graft-logit").toString
    (good ++ bad).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QualityModel.logisticFit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet ==
      Set("intercept", "log_words", "stop_ratio", "train_acc"))
    assert(rows("train_acc") == 1.0,
      s"separable corpus must classify perfectly: $rows")
    assert(rows("stop_ratio") > 0,
      s"stopword ratio must carry positive weight: $rows")
    // bit-stable across runs (the decimal-bridge guarantee)
    val again = QualityModel.logisticFit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == rows)
    // the sigmoid link separates where the linear probe's 0/1
    // ordering agrees: logistic decision must match labels on both
    // classes, not just on average
    val (w1, w2, w3) = QualityModel.logisticFitWeights(spark, dir)
    def z(f2: Double, f3: Double) = w1 + w2 * f2 + w3 * f3
    val goodWords = good.head._2.split(" ").length
    val badWords = bad.head._2.split(" ").length
    assert(z(math.log(goodWords + 1.0), 4.0 / goodWords) > 0)
    assert(z(math.log(badWords + 1.0), 0.0) <= 0)
  }

  test("hardness_prune_report: bins equal a local brute-force over the same features+fit; keep excludes the easy and noise bands") {
    import spark.implicits._
    // mixed corpus: 20 FEATURE-IDENTICAL doc pairs (same word count,
    // same stopword ratio) whose labels differ — medium words are
    // in the mwl band (y=1), long words are not (y=0) — so the model
    // CANNOT separate them (ŷ ≈ 0.5, residual ≈ 0.5 for both sides),
    // plus stopword-heavy docs the features DO explain (residual ≈ 0)
    val docs = (1 to 20).map(i =>
      (i.toLong, (1 to 10).map(j => s"abcd$j").mkString(" "))) ++         // y=1
      (21 to 40).map(i =>
        (i.toLong, (1 to 10).map(j => s"abcdefghijklm$j").mkString(" "))) ++ // y=0
      (41 to 50).map(i => (i.toLong, "the a of and to in is on for with"))   // easy
    val tmp = Files.createTempDirectory("graft-hp").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = QualityModel.hardnessPruneReport(spark, tmp).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // local recompute from the SAME fit and features — nothing shared
    // with the distributed binning expression
    val (w1, w2, w3) = QualityModel.fitWeights(spark, tmp)
    val feats = QualityModel.featureFrame(spark, tmp).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    val expect = feats.groupBy { case (f2, f3, y) =>
      math.min(math.floor(math.abs(y.toDouble - (w1 + w2 * f2 + w3 * f3)) * 10).toInt, 9)
    }.map { case (bin, rows) => bin -> ((rows.length.toLong, rows.map(_._3.toLong).sum)) }
    assert(got.keySet == expect.keySet, s"bins: ${got.keySet} vs ${expect.keySet}")
    expect.foreach { case (bin, (n, pos)) =>
      assert(got(bin)._2 == n && got(bin)._3 == pos, s"bin $bin: ${got(bin)} vs ($n, $pos)")
      assert(got(bin)._4 == (if (bin > QualityModel.EasyMaxBin &&
        bin < QualityModel.NoiseMinBin) 1 else 0))
      assert(got(bin)._1 == bin / 10.0)
    }
    assert(got.size >= 2, s"the mixed corpus must spread over bins: $got")
    assert(got.values.map(_._2).sum == docs.length.toLong, "bins partition the corpus")
  }
}
