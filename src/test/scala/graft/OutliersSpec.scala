package graft

import graft.ops.Outliers
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Planted-mislabel detection: a vector sitting in label B's region
  * but tagged label A must surface as that label's top outlier. */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-outliers").toString
    val dim = 8
    def vec(axis: Int, jitter: Int): Array[Float] =
      Array.tabulate(dim)(j =>
        (if (j == axis) 1.0f else 0.05f) + (if (j == (jitter % dim)) 0.02f else 0f))
    val rows =
      // label 0: ten vectors along axis 0 ... plus vec 99 along axis 4
      (0L to 9L).map(i => Row(i, vec(0, i.toInt).toSeq, 0)) ++
        Seq(Row(99L, vec(4, 0).toSeq, 0)) ++
        // label 1: ten tight vectors along axis 2
        (10L to 19L).map(i => Row(i, vec(2, i.toInt).toSeq, 1))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("a planted cross-cluster vector is its label's top outlier") {
    val got = Outliers.embedOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got.head._1 == 99L, s"planted outlier must rank first: ${got.toSeq}")
    assert(got.head._4 > 2.0, s"planted outlier z-score: ${got.head}")
    // ranking is by z desc with vec_id tiebreak, and z is standardized:
    // the in-cluster vectors sit near 0 (within ±2 sd)
    val zs = got.map(_._4).toSeq
    assert(zs == zs.sortBy(-_), "descending z")
    assert(got.tail.forall(r => r._4 < got.head._4), "planted dominates")
  }

  test("deterministic under physical relayout") {
    val a = Outliers.embedOutliers(spark, dir).collect().map(_.toSeq).toSeq
    val re = spark.read.parquet(s"$dir/embeddings.parquet").repartition(7)
    val d2 = Files.createTempDirectory("graft-outliers2").toString
    re.write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val b = Outliers.embedOutliers(spark, d2).collect().map(_.toSeq).toSeq
    assert(a == b, "outlier report must not depend on layout")
  }
}
