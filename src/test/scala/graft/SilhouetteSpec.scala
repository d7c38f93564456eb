package graft

import graft.ops.KMeansVec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Simplified-silhouette audit on a corpus planted with exactly K
  * tight, axis-aligned clusters whose seeds are the K lowest vec_ids
  * — Lloyd's converges to the true partition, so every cluster must
  * read as compact and well-separated. */
class SilhouetteSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dim = 16

  private def vec(axis: Int, jitter: Int): Seq[Float] =
    Seq.tabulate(dim)(j =>
      (if (j == axis) 1.0f else 0.0f) +
        (if (j == (jitter % dim)) 0.01f else 0.0f))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-silhouette").toString
    // vec 0..9: one seed per axis-cluster (K-means init = lowest ids);
    // vec 10..49: four more members per cluster with tiny jitter
    val rows =
      (0 until KMeansVec.K).map(i => Row(i.toLong, vec(i, 0), i)) ++
        (10 until 50).map { id =>
          val axis = (id - 10) % KMeansVec.K
          Row(id.toLong, vec(axis, id), axis)
        }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted tight clusters score high silhouette in every cell") {
    val got = KMeansVec.clusterSilhouette(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == KMeansVec.K, s"one row per cluster: ${got.toSeq}")
    assert(got.map(_._2).sum == 50L, "every vector is scored exactly once")
    got.foreach { case (c, _, s) =>
      assert(s >= -1.0 && s <= 1.0, s"silhouette bounds violated at cluster $c: $s")
      assert(s > 0.5, s"tight planted cluster $c must score high, got $s")
    }
  }

  test("deterministic under physical relayout") {
    val a = KMeansVec.clusterSilhouette(spark, dir).collect().map(_.toSeq).toSeq
    val d2 = Files.createTempDirectory("graft-silhouette2").toString
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(7)
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val b = KMeansVec.clusterSilhouette(spark, d2).collect().map(_.toSeq).toSeq
    assert(a == b, "silhouette must not depend on layout")
  }
}
