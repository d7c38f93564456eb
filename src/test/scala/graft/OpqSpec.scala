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

  /** TWO dominant directions with distinct scales, both spread across
    * all 64 coordinates (d2 Gram-Schmidt-orthogonalized against d1 so
    * the spectrum genuinely has two planted eigenvalues): the single
    * reflection packs only d1's variance into subspace 0 — d2 stays
    * smeared across all eight — while the rank-2 allocation also
    * packs d2 into subspace 1. */
  private def anisotropic2Dir(): String = {
    val d = Files.createTempDirectory("graft-opq-aniso2").toString
    var seed = 98765L
    def lcg(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val d1 = Array.tabulate(64)(k => math.sin(k * 0.7) + 0.3)
    val n1 = math.sqrt(d1.map(x => x * x).sum)
    val u1 = d1.map(_ / n1)
    val raw2 = Array.tabulate(64)(k => math.cos(k * 1.3) - 0.2)
    val proj = raw2.zip(u1).map { case (a, b) => a * b }.sum
    val d2 = raw2.zip(u1).map { case (a, b) => a - proj * b }
    val n2 = math.sqrt(d2.map(x => x * x).sum)
    val u2 = d2.map(_ / n2)
    import spark.implicits._
    val rows = (1 to 400).map { n =>
      val c1 = lcg() * 6.0
      val c2 = lcg() * 3.0
      val v = Array.tabulate(64)(k => (c1 * u1(k) + c2 * u2(k) + lcg() * 0.2).toFloat)
      (n.toLong, v.toSeq, n % 10)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("two-direction anisotropy: rank-2 allocation strictly beats the single reflection") {
    val dir = anisotropic2Dir()
    val pq = totalErr(Pq.pqError(spark, dir))
    val opq1 = totalErr(Opq.opqError(spark, dir))
    val opq2 = totalErr(Opq.opqMError(spark, dir))
    assert(opq1 < pq, s"single reflection must already win here: opq1=$opq1 pq=$pq")
    assert(opq2 < opq1 * 0.99,
      s"rank-2 must materially beat the single reflection: opq2=$opq2 opq1=$opq1")
  }

  test("isotropic fixtures: parity — rotation neither helps nor meaningfully hurts") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val pq = totalErr(Pq.pqError(spark, dir))
      val opq = totalErr(Opq.opqError(spark, dir))
      assert(opq <= pq * 1.05, s"$dir: opq=$opq pq=$pq")
      val opqM = totalErr(Opq.opqMError(spark, dir))
      assert(opqM <= pq * 1.05, s"$dir: opq_m=$opqM pq=$pq")
    }
  }

  test("opq_m_error deterministic across repeated runs") {
    val dir = "/root/testdata/sf0.001"
    val a = Opq.opqMError(spark, dir).collect().toSeq
    val b = Opq.opqMError(spark, dir).collect().toSeq
    assert(a == b)
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
