package graft

import graft.ops.Cms
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The CMS contract on a planted-frequency corpus: estimates never
  * undercount, the true heavy hitter surfaces first, and the sketch
  * is deterministic. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-cms").toString
    // "hot" appears 40×; each "cold7..." exactly once; "warm" 12×
    val rows =
      (0L to 9L).map(i => Row(i, "hot hot hot hot warm cold" + i, "en", "src0", 30L)) ++
        Seq(Row(10L, "warm warm", "en", "src0", 10L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("estimates never undercount and the heavy hitter ranks first") {
    val rows = Cms.cmsTopk(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must overestimate: ${r.getString(0)} est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    assert(rows.head.getString(0) == "hot", s"expected hot first, got ${rows.head}")
    assert(rows.head.getLong(1) == 40L)
  }

  test("sketch estimates are deterministic") {
    val a = Cms.cmsTopk(spark, dir).collect().toSeq
    val b = Cms.cmsTopk(spark, dir).collect().toSeq
    assert(a == b)
  }
}
