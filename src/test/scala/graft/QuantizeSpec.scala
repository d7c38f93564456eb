package graft

import graft.ops.{Quantize, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 scalar quantization: code range, reconstruction error bound,
  * and the quantized-scan-exact-rescore search quality. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.01"

  test("codes stay in [-127, 127] and reconstruction error ≤ 0.5/scale per element") {
    val e = Quantize.withQuant(spark.read.parquet(s"$dir/embeddings.parquet"))
    val bad = e.filter(expr(
      "exists(qcodes, c -> c < -127 OR c > 127)")).count()
    assert(bad == 0, "code out of int8 symmetric range")
    // |x - c/scale| ≤ 0.5/scale by the rounding rule — check the
    // worst element of every vector against its own bound
    val viol = e.filter(expr(
      """array_max(zip_with(embedding, qcodes,
        |  (x, c) -> abs(CAST(x AS DOUBLE) - c / scale))) > 0.5 / scale + 1e-12""".stripMargin))
      .count()
    assert(viol == 0, "reconstruction error above the half-step bound")
  }

  test("sq error profile returns one sane row per label") {
    val rows = Quantize.sqError(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_mse") >= 0.0)
      assert(r.getAs[Double]("max_abs_err") >= 0.0)
      // unit-norm-ish embeddings quantized to int8: errors are tiny
      assert(r.getAs[Double]("max_abs_err") < 0.05, r.toString)
    }
  }

  test("materialized int8 index: same answer as inline search, floats out of phase 1") {
    val root = java.nio.file.Files.createTempDirectory("graft-sqidx").toString
    Quantize.writeSqIndex(spark, dir, root)
    // codes are physically TINYINT in parquet — the 4x storage claim
    val codesSchema = spark.read.parquet(s"$root/codes").schema("codes8").dataType.sql
    assert(codesSchema == "ARRAY<TINYINT>", codesSchema)
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0).toArray
    // the ACTUAL phase-1 plan the search runs (not a stand-in) reads
    // only the codes table: the float embedding column is absent and
    // the scan schema is the pruned vec_id/codes8 pair
    val phase1 = Quantize.sqPhase1Plan(spark, root, q, Some(0L))
    val plan = phase1.queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"), plan)
    assert(plan.contains("codes8"), plan)
    // sentinel excluded at WRITE time → a default search (no
    // excludeId) already equals the inline path
    val indexed = Quantize.sqSearchIndexed(spark, root, dir, q)
      .collect().map(_.toString).toSeq
    val inline = Quantize.sqTopK(spark, dir).collect().map(_.toString).toSeq
    assert(indexed == inline, s"indexed=$indexed inline=$inline")
    assert(spark.read.parquet(s"$root/codes")
      .filter(col("vec_id") === graft.ops.VectorQueries.QueryVecId).count() == 0L)
    // append has no trained state: build(half)+append(half) ≡ build(all)
    val half = java.nio.file.Files.createTempDirectory("graft-sqidx-h").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$half/embeddings.parquet")
    val inc = java.nio.file.Files.createTempDirectory("graft-sqidx-i").toString
    Quantize.writeSqIndex(spark, half, inc)
    Quantize.appendSqIndex(spark, inc,
      spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") % 2 === 1))
    def rows(p: String) = spark.read.parquet(s"$p/codes")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(rows(inc) == rows(root), "SQ append must equal one-pass build")
  }

  test("quantized shortlist + exact rescore recovers the exact top-5") {
    val exact = VectorQueries.knnTopkK(spark, dir, 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val sq = Quantize.sqTopK(spark, dir).collect().map(_.getAs[Long]("vec_id")).toSet
    // int8 preserves cosine order well past the top-5/shortlist-20
    // margin on real embeddings; equality is the expected outcome
    val recall = sq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"sq recall@5 = $recall (exact=$exact sq=$sq)")
  }

  test("sq4: nibble pack/unpack is the identity; codes in [-7, 7]") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val dim = 1 + rnd.nextInt(9)
      val codes = Array.fill(dim)(rnd.nextInt(15) - 7)
      val back = Quantize.unpackNibbles(Quantize.packNibbles(codes), dim)
      assert(back.toSeq == codes.toSeq, s"roundtrip failed at dim $dim")
    }
  }

  test("sq4: wider-shortlist 4-bit scan holds the recall floor; indexed ≡ inline") {
    val exact = VectorQueries.knnTopkK(spark, dir, 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val inline = Quantize.sq4TopK(spark, dir).collect()
    val recall = inline.map(_.getAs[Long]("vec_id")).toSet
      .intersect(exact).size.toDouble / exact.size
    // measured floor at the registered knobs (4-bit codes, 40-wide
    // shortlist) — stated honestly, not assumed perfect
    assert(recall >= 0.8, s"sq4 recall@5 = $recall")
    // materialized packed index: identical answers, half the stored
    // bytes of the int8 codes, floats absent from phase 1
    val tmp = java.nio.file.Files.createTempDirectory("graft-sq4").toString
    Quantize.writeSq4Index(spark, dir, tmp)
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === VectorQueries.QueryVecId)
      .head().getSeq[Float](1).toArray
    val indexed = Quantize.sq4SearchIndexed(spark, tmp, dir, q,
      excludeId = Some(VectorQueries.QueryVecId)).collect()
    assert(indexed.map(_.toString).toSeq == inline.map(_.toString).toSeq,
      "packed-index search must equal the inline scan")
    val row = spark.read.parquet(s"$tmp/codes").head()
    val dim = row.getAs[Int]("dim")
    val nBytes = row.getAs[Array[Byte]]("packed").length
    assert(nBytes == (dim + 1) / 2, s"packed bytes $nBytes for dim $dim")
  }
}
