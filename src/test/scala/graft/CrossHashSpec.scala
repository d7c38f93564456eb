package graft

import graft.functions.CrossHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-engine hash primitive is load-bearing for every
  * oracle-checked hash-bucketed operator — pin that the JVM
  * byte-level form, the Spark Column form, and the documented
  * DuckDB spelling can never drift. */
class CrossHashSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("JVM md5Hash60 == Spark conv(substring(md5)) column form") {
    val rnd = new scala.util.Random(7)
    val samples = (1 to 200).map { _ =>
      rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString
    } ++ Seq("", " ", "a b c", "42|the", "p0_63")
    val viaColumn = samples.toDF("s")
      .select(col("s"), CrossHash.md5Hash60Col(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(viaColumn(s) == CrossHash.md5Hash60(s), s"mismatch for '$s'")
    }
  }

  test("60-bit range: always non-negative, below 2^60") {
    (1 to 100).foreach { i =>
      val h = CrossHash.md5Hash60("x" + i)
      assert(h >= 0L && h < (1L << 60))
    }
  }

  test("string and UTF-8 byte forms agree") {
    Seq("hello", "a b", "").foreach { s =>
      assert(CrossHash.md5Hash60(s) ==
        CrossHash.md5Hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
  }
}
