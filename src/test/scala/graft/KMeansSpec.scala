package graft

import graft.ops.KMeansVec
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.01"

  test("assignments are deterministic and partition-order independent") {
    val a1 = KMeansVec.assign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = KMeansVec.assign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
    assert(a1.size == 500)
    assert(a1.values.toSet.subsetOf((0L until KMeansVec.K.toLong).toSet))
  }

  test("clusters are non-degenerate: several populated, all vectors covered") {
    val prof = KMeansVec.clusterProfile(spark, sf).collect()
    val total = prof.map(_.getAs[Long]("n")).sum
    assert(total == 500)
    assert(prof.length >= 3, s"collapsed to ${prof.length} clusters")
  }
}
