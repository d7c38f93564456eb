package graft

import graft.ops.{Bq, VectorQueries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Binary-quantization search contract: the sign fingerprint packs
  * correctly, Hamming ranking surfaces sign-identical copies and
  * buries antipodes, the measured recall against exact kNN holds at
  * bench density, and degenerate queries return empty. */
class BqSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getAs[Long]("vec_id")).toSeq

  test("packBits sets exactly the positive-dimension bits in both halves") {
    val v = new Array[Float](64)
    v(0) = 1f; v(5) = 0.25f; v(31) = 2f // lo half
    v(32) = 1f; v(63) = 0.5f            // hi half
    v(7) = -3f; v(40) = -0.1f           // negatives: bits stay clear
    val (lo, hi) = Bq.packBits(v.toSeq)
    assert(lo == ((1L << 0) | (1L << 5) | (1L << 31)))
    assert(hi == ((1L << 0) | (1L << 31)))
    // short vector: high bits zero
    assert(Bq.packBits(Seq(1f, -1f)) == ((1L, 0L)))
  }

  private lazy val plantedDir: String = {
    val d = Files.createTempDirectory("graft-bq").toString
    val dim = 64
    val rnd = new scala.util.Random(7)
    val q = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    val copy = q.map(x => x * 0.5f)        // same signs, hamming 0
    val anti = q.map(x => -x)              // all signs flipped, hamming 64
    val rows =
      Seq(Row(0L, q.toSeq, 0), Row(1L, copy.toSeq, 1), Row(2L, anti.toSeq, 2)) ++
        (3L to 12L).map(i => Row(i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq, 3))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("sign-identical copy ranks first; the antipode never enters the top-5") {
    val rows = Bq.bqTopK(spark, plantedDir).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("vec_id") == 1L,
      s"expected the sign-identical copy first, got ${rows.head}")
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(2L),
      "the antipode (cosine dist 2) must rescore out of the top-5")
  }

  test("recall@5 vs exact kNN at bench density") {
    val dir = "/root/testdata/sf0.1"
    val exact = ids(VectorQueries.knnTopkK(spark, dir, 5)).toSet
    val bq = ids(Bq.bqTopK(spark, dir)).toSet
    val recall = if (exact.isEmpty) 1.0
      else bq.intersect(exact).size.toDouble / exact.size
    info(f"bq recall@5 at sf0.1 = $recall%.2f (shortlist ${Bq.BqShortlist})")
    assert(recall >= 0.8, f"bq recall@5 $recall%.2f below the registered floor")
  }

  test("missing or all-zero query row returns an empty frame") {
    val d = Files.createTempDirectory("graft-bq-zero").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(0L, Seq.fill(64)(0f), 0), // query present but all-zero
      Row(1L, Seq.fill(64)(1f), 1))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    assert(Bq.bqTopK(spark, d).count() == 0L)
  }

  test("results are deterministic across runs") {
    val a = Bq.bqTopK(spark, plantedDir).collect().toSeq
    val b = Bq.bqTopK(spark, plantedDir).collect().toSeq
    assert(a == b)
  }
}
