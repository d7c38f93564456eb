package graft

import graft.functions.OracleMath
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The decimal bridge's whole reason to exist: partition-order
  * independence. A plain double sum varies in final ulps with the
  * add order; dsum must be bit-stable under any partitioning. */
class OracleMathSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("dsum is bit-identical across partitionings; double sum is not guaranteed") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("v"))
    def run(parts: Int): Long = {
      val d = li.repartition(parts).agg(OracleMath.dsum(col("v"))).head.getDouble(0)
      java.lang.Double.doubleToLongBits(d)
    }
    val bits = Seq(1, 3, 7, 32).map(run)
    assert(bits.distinct.size == 1, s"dsum varied across partitionings: $bits")
  }

  test("davg equals oracle formulation sum/count exactly") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val row = li.agg(
      OracleMath.davg(col("l_quantity")).as("a"),
      (OracleMath.dsum(col("l_quantity")) / count(lit(1))).as("b")).head
    assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(row.getDouble(1)))
  }
}
