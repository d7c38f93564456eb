package graft

import graft.ops.{KMeansVec, VectorQueries}
import org.scalatest.funsuite.AnyFunSuite

/** ANN recall harness — substantiates the "same retrieval
  * capability" claim the reference's HNSW index makes
  * (index.py:434): recall@5 / recall@20 of the multi-band sign-LSH
  * and IVF approximate paths against exact brute-force kNN, swept
  * over their probe knobs (per-band Hamming radius for LSH, nProbe
  * for IVF) on the sf0.1 fixture — the bench density. Everything is
  * deterministic (md5 plane table, lowest-vec_id centroid init), so
  * the numbers are stable across runs and partitionings.
  */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  // the sweep runs at sf0.1 — the bench scale — so the recall numbers
  // describe the corpus density the registered queries are graded at
  private val dir = "/root/testdata/sf0.1"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getAs[Long]("vec_id")).toSeq

  private def recall(approx: Seq[Long], exact: Seq[Long]): Double =
    if (exact.isEmpty) 1.0
    else approx.toSet.intersect(exact.toSet).size.toDouble / exact.size

  test("recall@5 / recall@20 sweep: LSH probe radius and IVF nProbe") {
    val exact5 = ids(VectorQueries.knnTopkK(spark, dir, 5))
    val exact20 = ids(VectorQueries.knnTopkK(spark, dir, 20))

    // one Lloyd's fit shared across the whole nProbe sweep — the
    // materialized-index flow, where fitting happens at build time
    val fitted = KMeansVec.fit(spark, dir, KMeansVec.K, iters = 1)
    fitted._2.cache().count()

    info(f"${"path"}%-16s ${"knob"}%-10s recall@5  recall@20")
    val lsh = (0 to 4).map { r =>
      val r5 = recall(ids(VectorQueries.annLshTopkK(spark, dir, 5, r)), exact5)
      val r20 = recall(ids(VectorQueries.annLshTopkK(spark, dir, 20, r)), exact20)
      info(f"lsh              radius=$r%-3d  $r5%.2f      $r20%.2f")
      (r, r5, r20)
    }
    val ivf = (1 to 6).map { p =>
      val r5 = recall(ids(KMeansVec.ivfTopKFrom(fitted, spark, dir, 5, p)), exact5)
      val r20 = recall(ids(KMeansVec.ivfTopKFrom(fitted, spark, dir, 20, p)), exact20)
      info(f"ivf              nProbe=$p%-3d  $r5%.2f      $r20%.2f")
      (p, r5, r20)
    }

    // monotonicity: widening the probe never loses recall
    assert(lsh.map(_._2) == lsh.map(_._2).sorted, "LSH recall@5 not monotone in radius")
    assert(ivf.map(_._2) == ivf.map(_._2).sorted, "IVF recall@5 not monotone in nProbe")

    // the REGISTERED settings (ann_lsh_topk: per-band radius
    // VectorQueries.ProbeRadius; ann_ivf_topk: nProbe 3) must hold
    // ≥0.9 recall@5 — the quality bar that makes the approximate
    // paths usable stand-ins for exact kNN
    val lshAtRegistered = lsh.find(_._1 == VectorQueries.ProbeRadius).get
    assert(lshAtRegistered._2 >= 0.9,
      s"LSH recall@5 at registered radius: ${lshAtRegistered._2}")
    val ivfAtRegistered = ivf.find(_._1 == 3).get
    assert(ivfAtRegistered._2 >= 0.9,
      s"IVF recall@5 at registered nProbe: ${ivfAtRegistered._2}")

    // full-probe degenerates to exact: radius ≥ planes / nProbe = k
    assert(recall(ids(VectorQueries.annLshTopkK(spark, dir, 5, 6)), exact5) == 1.0)
    assert(recall(ids(KMeansVec.ivfTopKFrom(fitted, spark, dir, 5, KMeansVec.K)), exact5) == 1.0)
    fitted._2.unpersist()
  }

  test("neardup LSH recall in the regime the operator is for: true near-duplicates") {
    // The fixture's exact pairs all sit at sim 0.45-0.51 — near-random
    // soup, where ANY sub-quadratic family has partial recall by the
    // LSH collision math (p_band = (1 - θ/π)^6 ≈ 0.08 per band at
    // θ≈62°). Real near-duplicates live at sim ≥ 0.8, where the same
    // 8×6 banding recalls essentially everything. Inject perturbed
    // copies and measure both regimes against the exact twin.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val src = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val rng = new scala.util.Random(1234)
    // 20 near-copies: small additive noise → sim ≈ 0.97-0.995
    val copies = src.take(20).zipWithIndex.map { case ((id, v, lab), i) =>
      val w = v.map(x => x + (rng.nextFloat() - 0.5f) * 0.04f)
      (100000L + i, w, lab)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = (src ++ copies).map { case (id, v, lab) =>
      Row(id, v.toSeq, lab) }
    val root = java.nio.file.Files.createTempDirectory("graft-ndrecall")
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")

    val exact = VectorQueries.embedNeardupTriangle(spark, root.toString, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = VectorQueries.embedNeardupLsh(spark, root.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact.keySet), "exact verify keeps precision 1")
    val hi = exact.filter(_._2 >= 0.8).keySet
    val hiRecall = if (hi.isEmpty) 1.0 else lsh.intersect(hi).size.toDouble / hi.size
    info(f"neardup pairs: ${exact.size} exact (${hi.size} at sim≥0.8); " +
      f"LSH recall overall ${lsh.size.toDouble / exact.size}%.2f, sim≥0.8 $hiRecall%.2f")
    assert(hi.nonEmpty, "injected copies must create sim≥0.8 pairs")
    assert(hiRecall >= 0.95, s"high-sim recall $hiRecall")
  }

  test("ann_recall_report: every backend at its registered bar (sf0.01)") {
    // the report is the audit tool; at the REGISTERED knobs on the
    // fixture density the full-precision-rescore backends must agree
    // with exact kNN, while the coarse-code tiers (rq: 2×4-bit
    // additive, sq4: 4-bit scalar) hold their HONEST measured floors
    // — the same bars their own specs pin
    val rep = graft.ops.AnnEval.annRecallReport(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.map(_._1).toSeq == graft.ops.AnnEval.BackendNames,
      s"backends: ${rep.toSeq}")
    val floors = Map("rq" -> 0.8, "sq4" -> 0.8).withDefaultValue(1.0)
    rep.foreach { case (b, returned, _, rec) =>
      assert(returned == 5L, s"$b returned $returned")
      assert(rec >= floors(b), s"$b recall $rec below floor ${floors(b)}")
    }
  }

  test("ann_recall_batch: full grid, graph exact at registered knobs, mean rows consistent") {
    val rep = graft.ops.AnnEval.annRecallBatch(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // 2 backends × (3 queries + 1 mean row at query_id = -1)
    assert(rep.length == 8, s"rows: ${rep.toSeq}")
    assert(rep.map(_._1).distinct.toSeq == graft.ops.AnnEval.BatchBackendNames)
    // graph batch equals exact batch kNN at the registered settings
    // (its own oracle gate), so every graph row is recall 1.0
    rep.filter(_._1 == "graph").foreach { case (_, q, ret, hits, rec) =>
      val n = if (q == -1L) 9L else 3L
      assert(ret == n && hits == n && rec == 1.0, s"graph q=$q: ($ret, $hits, $rec)")
    }
    // each mean row aggregates its per-query rows exactly
    graft.ops.AnnEval.BatchBackendNames.foreach { b =>
      val per = rep.filter(r => r._1 == b && r._2 >= 0)
      val mean = rep.find(r => r._1 == b && r._2 == -1L).get
      assert(per.map(_._3).sum == mean._3 && per.map(_._4).sum == mean._4,
        s"$b mean row inconsistent with per-query rows")
    }
  }

  test("ann_recall_report: empty backends still report — recall 0.0, never a missing row") {
    // an all-zero query makes EVERY backend (and exact kNN) return
    // empty — the audit must show six explicit zero rows, not an
    // empty report (a groupBy would silently drop its worst case)
    val d = java.nio.file.Files.createTempDirectory("graft-recall-degq").toString
    import spark.implicits._
    val corpus = (1 to 40).map { n =>
      val v = Array.tabulate(64)(k => ((n * 31 + k * 17) % 13 - 6) * 0.01f)
      (n.toLong, v.toSeq, n % 3)
    }
    val rows = (graft.ops.VectorQueries.QueryVecId, Seq.fill(64)(0f), 0) +: corpus
    rows.toDF("vec_id", "embedding", "label")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"),
        org.apache.spark.sql.functions.col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rep = graft.ops.AnnEval.annRecallReport(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.map(_._1).toSeq == graft.ops.AnnEval.BackendNames, s"rows: ${rep.toSeq}")
    rep.foreach { case (b, returned, hits, rec) =>
      assert(returned == 0L && hits == 0L && rec == 0.0,
        s"$b must report an explicit zero row, got ($returned, $hits, $rec)")
    }
  }
}
