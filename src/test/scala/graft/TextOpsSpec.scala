package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx percentiles track the exact ones within sketch tolerance") {
    val exact = TextOps.textPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val approx = TextOps.approxPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (lang, (a50, a90, a99)) =>
      val (e50, e90, e99) = exact(lang)
      // exact uses continuous interpolation, approx returns a real
      // datum — allow one interpolation step plus sketch slack
      assert(math.abs(a50 - e50) <= math.max(10.0, e50 * 0.05), s"$lang p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= math.max(10.0, e90 * 0.05), s"$lang p90: $a90 vs $e90")
      assert(math.abs(a99 - e99) <= math.max(15.0, e99 * 0.08), s"$lang p99: $a99 vs $e99")
    }
  }
}
