package graft

import graft.ops.{Rerank, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** MMR diversification + hard-negative mining: determinism, the
  * rank-1 = pure-relevance invariant, the diversity property on a
  * synthetic clustered corpus (MMR swaps redundant near-dups for
  * diverse candidates; plain top-k does not), and band/ordering
  * invariants for the mined negatives. */
class RerankSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.01"

  test("mmr: k rows, distinct picks, rank 1 = exact top-1") {
    val rows = Rerank.mmrTopk(spark, dir).collect()
    assert(rows.length == Rerank.MmrK)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    assert(rows.map(_.getLong(0)).toSeq == (1L to Rerank.MmrK).toSeq)
    val exactTop1 = VectorQueries.knnTopkK(spark, dir, 1).collect().head.getLong(0)
    assert(rows.head.getLong(1) == exactTop1,
      "first MMR pick must be the pure-relevance top-1")
  }

  test("mmr: deterministic across runs") {
    val a = Rerank.mmrTopk(spark, dir).collect().toSeq
    val b = Rerank.mmrTopk(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("mmr: diversifies a clustered corpus where plain top-k does not") {
    // query = e0; ids 1..6 form a tight near-dup cluster hugging the
    // query; ids 7..9 are distinct directions, still close to the
    // query but far from the cluster. Plain top-5 takes only cluster
    // members; MMR must trade some redundancy for diversity.
    val dim = 8
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = new Array[Float](dim)
      parts.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    val rows =
      (VectorQueries.QueryVecId, vec(0 -> 1f), 0) +:
        (1L to 6L).map(i =>
          (i, vec(0 -> 1f, 1 -> (0.01f * i)), 0)) :+
        (7L, vec(0 -> 1f, 2 -> 0.6f), 1) :+
        (8L, vec(0 -> 1f, 3 -> 0.6f), 1) :+
        (9L, vec(0 -> 1f, 4 -> 0.6f), 1)
    val tmp = Files.createTempDirectory("graft-mmr").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val plain = VectorQueries.knnTopkK(spark, tmp, Rerank.MmrK)
      .collect().map(_.getLong(0)).toSet
    val mmr = Rerank.mmrTopk(spark, tmp).collect().map(_.getLong(1)).toSet
    val diverse = Set(7L, 8L, 9L)
    assert(plain.intersect(diverse).isEmpty,
      s"fixture broken: plain top-k already picked diverse ids ($plain)")
    assert(mmr.intersect(diverse).nonEmpty,
      s"MMR failed to diversify: picked $mmr")
  }

  test("mmr: empty on missing/zero query vector") {
    val tmp = Files.createTempDirectory("graft-mmr-deg").toString
    import spark.implicits._
    Seq((5L, Seq(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(Rerank.mmrTopk(spark, tmp).count() == 0)
  }

  test("hard negatives: banded, bounded, ordered per anchor") {
    val rows = Rerank.hardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val byAnchor = rows.groupBy(_.getLong(0))
    assert(byAnchor.keySet.subsetOf(Rerank.NegAnchors.toSet))
    byAnchor.foreach { case (_, rs) =>
      assert(rs.length <= Rerank.NegK)
      assert(rs.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq)
      val dists = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(dists == dists.sorted)
      dists.foreach(d =>
        assert(d >= Rerank.NegDistLo && d < Rerank.NegDistHi, s"out of band: $d"))
    }
    // anchors never mine themselves
    rows.foreach(r => assert(r.getLong(2) != r.getLong(0)))
  }

  test("hard negatives: invariant under physical layout") {
    val a = Rerank.hardNegatives(spark, dir).collect().toSeq
    val relaid = Files.createTempDirectory("graft-neg-relay").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy(col("label"), col("vec_id").desc)
      .repartition(13)
      .write.mode("overwrite").parquet(s"$relaid/embeddings.parquet")
    val b = Rerank.hardNegatives(spark, relaid).collect().toSeq
    assert(a == b)
  }
}
