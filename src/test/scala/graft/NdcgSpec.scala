package graft

import graft.ops.AnnEval
import org.scalatest.funsuite.AnyFunSuite

/** Ranking-metric contract for retrieval_ndcg: the exact-cosine row
  * self-validates (its DCG fold is literally the IDCG fold), every
  * metric stays in range, and the relation is deterministic. */
class NdcgSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def report() = AnnEval.retrievalNdcg(spark, dir).collect()
    .map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    .toMap

  test("exact ranking scores ndcg = mrr = 1.0 — the self-validating row") {
    val got = report()
    assert(got.keySet == Set("bm25", "exact", "hybrid"))
    val (returned, hits, _, ndcg, mrr) = got("exact")
    assert(returned == 10L && hits == 10L)
    assert(ndcg == 1.0, s"exact ndcg must be exactly 1.0, got $ndcg")
    assert(mrr == 1.0)
  }

  test("all metrics bounded and internally consistent") {
    val got = report()
    got.foreach { case (sys, (returned, hits, dcg, ndcg, mrr)) =>
      assert(returned <= 10L && hits <= returned, s"$sys: $hits/$returned")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"$sys ndcg $ndcg")
      assert(mrr >= 0.0 && mrr <= 1.0, s"$sys mrr $mrr")
      assert(dcg >= 0.0)
      if (hits == 0) assert(ndcg == 0.0 && mrr == 0.0)
    }
    assert(report().toSeq.sortBy(_._1) == got.toSeq.sortBy(_._1))
  }
}
