package graft

import graft.ops.{Opq, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** OPQ-style rotated PQ: strict error improvement where rotation can
  * help (anisotropic corpus), parity where it cannot (isotropic
  * fixtures), and the identity fallback when pc1 is already axis 0. */
class OpqSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def totalErr(df: org.apache.spark.sql.DataFrame): Double =
    df.collect().map(r => r.getLong(1) * r.getDouble(2)).sum

  /** Deterministic anisotropic corpus: a dominant direction spread
    * across ALL 64 coordinates (so the storage-order subspace split
    * smears it), plus small LCG noise. */
  private def anisotropicDir(): String = {
    val d = Files.createTempDirectory("graft-opq-aniso").toString
    var seed = 12345L
    def lcg(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val dom = Array.tabulate(64)(k => math.sin(k * 0.7) + 0.3)
    val dn = math.sqrt(dom.map(x => x * x).sum)
    val domU = dom.map(_ / dn)
    import spark.implicits._
    val rows = (1 to 400).map { n =>
      val coef = lcg() * 6.0
      val v = Array.tabulate(64)(k => (coef * domU(k) + lcg() * 0.2).toFloat)
      (n.toLong, v.toSeq, n % 10)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("anisotropic corpus: rotation strictly lowers total reconstruction error") {
    val dir = anisotropicDir()
    val pq = totalErr(Pq.pqError(spark, dir))
    val opq = totalErr(Opq.opqError(spark, dir))
    assert(opq < pq, s"OPQ must win where a dominant direction exists: opq=$opq pq=$pq")
    // and the win is material, not ulp noise
    assert(opq < pq * 0.99, s"improvement under 1%: opq=$opq pq=$pq")
  }

  test("isotropic fixtures: parity — rotation neither helps nor meaningfully hurts") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val pq = totalErr(Pq.pqError(spark, dir))
      val opq = totalErr(Opq.opqError(spark, dir))
      assert(opq <= pq * 1.05, s"$dir: opq=$opq pq=$pq")
    }
  }

  test("deterministic: repeated runs return identical rows") {
    val dir = "/root/testdata/sf0.001"
    val a = Opq.opqError(spark, dir).collect().toSeq
    val b = Opq.opqError(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("pc1 already on axis 0: reflection degenerates to plain PQ") {
    val d = Files.createTempDirectory("graft-opq-axis").toString
    import spark.implicits._
    // all vectors along e0 → pc1 = e0 exactly after r6 rounding
    val rows = (1 to 40).map(n => (n.toLong, (Seq((n % 5 + 1).toFloat) ++ Seq.fill(63)(0f)), n % 3))
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val opq = Opq.opqError(spark, d).collect().toSeq
    val pq = Pq.pqError(spark, d).collect().toSeq
    assert(opq == pq, "identity rotation must reproduce plain PQ exactly")
  }
}
