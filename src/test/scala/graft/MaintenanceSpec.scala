package graft

import graft.ops.Maintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compaction folds a many-small-file dataset into the computed file count") {
    val root = Files.createTempDirectory("graft-compact")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    (1 to 5000).map(i => (i.toLong, s"row $i")).toDF("id", "payload")
      .repartition(40)
      .write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size === 40, "fixture must start fragmented")

    // target larger than the whole dataset → single output file
    val n = Maintenance.compactParquet(spark, in, out, targetBytes = 1L << 30)
    assert(n === 1)
    assert(parquetFiles(out).size === 1)
    assert(spark.read.parquet(out).count() === 5000)

    // tiny target → computed count matches what lands on disk
    val out2 = root.resolve("out2").toString
    val bytes = Maintenance.dirBytes(spark, in)
    val n2 = Maintenance.compactParquet(spark, in, out2, targetBytes = bytes / 4)
    assert(parquetFiles(out2).size === n2)
    assert(spark.read.parquet(out2).count() === 5000)
  }

  test("sorted compaction clusters rows so file-level min/max ranges are disjoint") {
    val root = Files.createTempDirectory("graft-csort")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    // write deliberately scrambled across files
    (1 to 4000).map(i => ((i * 2654435761L) % 4000, i.toLong))
      .toDF("key", "v").repartition(16)
      .write.mode("overwrite").parquet(in)
    val bytes = Maintenance.dirBytes(spark, in)
    val n = Maintenance.compactSorted(spark, in, out, Seq("key"), targetBytes = bytes / 4)
    assert(n >= 2, "need multiple output files to prove clustering")
    assert(spark.read.parquet(out).count() === 4000)
    // per-file key ranges must not overlap (range partition + sort)
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("key"))
      .groupBy("f").agg(min("key").as("lo"), max("key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.zip(ranges.drop(1)).foreach { case ((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlap: ${ranges.mkString(",")}")
    }
  }
}
