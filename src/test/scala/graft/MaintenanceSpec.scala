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

  test("z-order rewrite shrinks per-file min/max ranges on BOTH dimensions") {
    val root = Files.createTempDirectory("graft-zord")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    // two independent uniform dimensions, scrambled layout
    val rnd = new scala.util.Random(7)
    (1 to 8000).map { i => (rnd.nextInt(8192).toLong, rnd.nextInt(1024).toLong, i.toLong) }
      .toDF("a", "b", "v").repartition(16)
      .write.mode("overwrite").parquet(in)
    val bytes = Maintenance.dirBytes(spark, in)
    // 16 files over a 256×256 bucket grid: each file covers ~4096
    // curve cells ≈ a 64×64 tile → ~4x span shrink on each dim
    val n = Maintenance.zorderWrite(spark, in, out,
      "a", 32, "b", 4, targetBytes = bytes / 16)
    assert(n >= 8, "need several output files to measure skipping")
    assert(spark.read.parquet(out).count() === 8000)
    def avgFileSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col(c))
        .groupBy("f").agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length
    }
    // a scan filtering `a BETWEEN x AND y` (or b) skips files whose
    // min/max miss the band — narrower per-file spans = more skips.
    // Z-order must tighten BOTH dims vs the scrambled layout (a
    // plain sort would tighten only one).
    val aIn = avgFileSpan(in, "a"); val aOut = avgFileSpan(out, "a")
    val bIn = avgFileSpan(in, "b"); val bOut = avgFileSpan(out, "b")
    assert(aOut < aIn * 0.6, s"dim a not clustered: $aOut vs $aIn")
    assert(bOut < bIn * 0.6, s"dim b not clustered: $bOut vs $bIn")
  }
}
