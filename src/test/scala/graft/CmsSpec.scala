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

  test("width sweep: inflation falls and exact coverage rises monotonically with width; a CMS never undercounts") {
    // the REAL fixture corpus: its 31-token vocabulary crowds width
    // 16 (the planted 12-token corpus above happens to spread
    // collision-free there, which would make the movement assertion
    // vacuous)
    val rows = Cms.cmsWidthSweep(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(0)).toSeq == Cms.CmsSweepWidths.map(_.toLong))
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L,
        "est - exact is nonnegative per the CMS guarantee")
      assert(r.getLong(5) <= r.getLong(2), "exact tokens cannot exceed the vocabulary")
      assert(r.getLong(1) == Cms.Depth.toLong * r.getLong(0))
    }
    val tot = rows.map(_.getLong(3))
    val exact = rows.map(_.getLong(5))
    assert(tot.zip(tot.tail).forall { case (a, b) => a >= b },
      s"total inflation must fall as width grows: ${tot.toSeq}")
    assert(exact.zip(exact.tail).forall { case (a, b) => a <= b },
      s"exactly-counted tokens must rise with width: ${exact.toSeq}")
    assert(tot.head > tot.last,
      "the fixture vocabulary crowds the smallest width — the curve must actually move")
  }

  test("width sweep degeneracies: empty corpus emits the full grid with zero counts") {
    import spark.implicits._
    val rows = Cms.cmsWidthSweepOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
    assert(rows.length == Cms.CmsSweepWidths.size)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }
}
