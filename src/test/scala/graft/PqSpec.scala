package graft

import graft.ops.{Pq, VectorQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization + ADC search on the real fixtures: error
  * profile sanity, shortlist quality vs exact kNN, determinism, and
  * the degenerate-query edge. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("pq_error: one row per label, non-negative bounded errors") {
    dirs.foreach { dir =>
      val rows = Pq.pqError(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) > 0)
        val err = r.getDouble(2)
        assert(err >= 0.0 && !err.isNaN, s"err $err at $dir")
      }
    }
  }

  test("adc top-k: k sorted rows, deterministic across runs") {
    val dir = dirs.head
    val a = Pq.annPqTopk(spark, dir).collect()
    val b = Pq.annPqTopk(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 5)
    val dists = a.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted)
  }

  test("adc shortlist covers the true top-5: rescored output equals exact knn") {
    // the shortlist is sized so the true top-5 survive ADC on the
    // fixtures (measured peak rank 88 < Shortlist); exact rescoring
    // then makes the output identical to exact kNN
    dirs.foreach { dir =>
      val exact = VectorQueries.knnTopkK(spark, dir, 5).collect().map(_.getLong(0)).toSeq
      val approx = Pq.annPqTopk(spark, dir, 5).collect().map(_.getLong(0)).toSeq
      assert(approx == exact, s"ADC top-5 $approx != exact $exact at $dir")
    }
  }

  test("ivf-pq: probed-cell ADC is deterministic, k sorted rows, ranks consistent") {
    dirs.foreach { dir =>
      val a = Pq.annIvfPqTopk(spark, dir).collect()
      assert(a.toSeq == Pq.annIvfPqTopk(spark, dir).collect().toSeq)
      assert(a.length == 5)
      val dists = a.map(_.getDouble(2)).toSeq
      assert(dists == dists.sorted)
      // cell pruning can only SHRINK the candidate pool: every hit the
      // composed index returns must also rank inside plain ADC's view
      // of the probed cells — sanity: no distance below the exact best
      val exactBest = VectorQueries.knnTopkK(spark, dir, 1)
        .collect().head.getDouble(2)
      assert(dists.head >= exactBest, s"impossible dist ${dists.head} < $exactBest")
    }
  }

  test("materialized pq index: codes-only ADC phase, answer equals inline") {
    val dir = dirs(1) // sf0.01
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-idx").resolve("pqindex").toString
    Pq.writePqIndex(spark, dir, idx)
    // physical schema: ARRAY<TINYINT> codes, no float embedding column
    val codesSchema = spark.read.parquet(s"$idx/codes").schema
    assert(codesSchema("codes").dataType.simpleString == "array<tinyint>", codesSchema.treeString)
    assert(!codesSchema.fieldNames.contains("embedding"))
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") === VectorQueries.QueryVecId)
      .head().getSeq[Float](1).toArray
    // the ADC phase's actual plan reads only the codes table
    val qd = Array.fill(Pq.SubSpaces)(Array.fill(Pq.CodeK)(0.0))
    val phase1Plan = Pq.pqPhase1(spark, idx, qd, Some(0L))
      .queryExecution.executedPlan.toString
    assert(!phase1Plan.contains("embedding"), s"float column in ADC phase:\n$phase1Plan")
    // the query sentinel row is excluded at WRITE time (it is not
    // corpus), so a default search — no excludeId — must not return
    // the query row as its own top hit
    assert(spark.read.parquet(s"$idx/codes")
      .filter(org.apache.spark.sql.functions.col("vec_id") === VectorQueries.QueryVecId)
      .count() == 0L, "query sentinel row leaked into the persisted codes")
    val indexed = Pq.pqSearchIndexed(spark, idx, dir, q).collect().toSeq
    val inline = Pq.annPqTopk(spark, dir).collect().toSeq
    assert(indexed == inline, "indexed PQ search must equal the inline path")
  }

  test("materialized ivf-pq index: partition-pruned codes-only ADC, answer equals inline") {
    val dir = dirs(1) // sf0.01
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx")
      .resolve("ix").toString
    Pq.writeIvfPqIndex(spark, dir, idx)
    // sentinel excluded at write; codes partitioned by cell
    assert(spark.read.parquet(s"$idx/codes")
      .filter(org.apache.spark.sql.functions.col("vec_id") === VectorQueries.QueryVecId)
      .count() == 0L)
    // the ADC phase's ACTUAL plan composes BOTH skips: cluster IN (...)
    // resolves as PartitionFilters and no float column is read
    val qd = Array.fill(Pq.SubSpaces)(Array.fill(Pq.CodeK)(0.0))
    val p = Pq.pqPhase1(spark, idx, qd, None, probes = Some(Seq(0, 1, 2)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("embedding"), s"float column in IVF-PQ ADC phase:\n$p")
    assert(p.contains("PartitionFilters") && p.contains("cluster"),
      s"probe must prune cell partitions:\n$p")
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") === VectorQueries.QueryVecId)
      .head().getSeq[Float](1).toArray
    val indexed = Pq.ivfPqSearchIndexed(spark, idx, dir, q).collect().toSeq
    val inline = Pq.annIvfPqTopk(spark, dir).collect().toSeq
    assert(indexed == inline, "indexed IVF-PQ search must equal the inline path")
  }

  test("degenerate query: missing/zero query row yields empty") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pq").toString
    (1 to 20).map(n => (n.toLong, Seq.tabulate(64)(k => ((n + k) % 7) * 0.1f), n % 3))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    assert(Pq.annPqTopk(spark, d).count() == 0L)
  }

  test("pq_m_sweep: rate-distortion monotone — more subspaces, strictly less error") {
    val rows = Pq.pqMSweep(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Pq.PqMGrid.map(_.toLong))
    rows.foreach { case (m, sd, bytes, _, err) =>
      assert(m * sd == 64 && bytes == m / 2)
      assert(err > 0.0, "uniform soup cannot quantize losslessly")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 < a._5, s"error must fall as M rises: ${rows.toSeq}")
      case _ =>
    }
    // the registered M=8 point must agree with pq_error's corpus mean
    val m8 = rows.find(_._1 == 8L).get
    assert(m8._4 == 500L)
  }
}
