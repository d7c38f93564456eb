package graft

import graft.ops.{KMeansVec, Quantize, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Degenerate query-vector edges for the ANN family: a MISSING query
  * row (no vec_id = QueryVecId) or an ALL-ZERO query embedding must
  * yield an EMPTY result — matching the oracle, whose q-side CTE is
  * empty / NaN-filtered in the same cases — never a driver exception. */
class DegenerateQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def fixture(includeQuery: Boolean, zeroQuery: Boolean): String = {
    val d = Files.createTempDirectory("graft-degq").toString
    val corpus = (1 to 40).map { n =>
      val v = Array.tabulate(64)(k => ((n * 31 + k * 17) % 13 - 6) * 0.01f)
      (n.toLong, v.toSeq, n % 3)
    }
    val rows =
      if (!includeQuery) corpus
      else {
        val q =
          if (zeroQuery) Array.fill(64)(0f)
          else Array.tabulate(64)(k => (k % 5) * 0.1f)
        (VectorQueries.QueryVecId, q.toSeq, 0) +: corpus
      }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  for ((label, mk) <- Seq(
      ("missing query row", () => fixture(includeQuery = false, zeroQuery = false)),
      ("all-zero query row", () => fixture(includeQuery = true, zeroQuery = true)))) {
    test(s"sq / lsh / ivf top-k return empty on $label") {
      val dir = mk()
      assert(Quantize.sqTopK(spark, dir).count() == 0L)
      assert(VectorQueries.annLshTopkK(spark, dir, 5, 1).count() == 0L)
      assert(KMeansVec.ivfTopK(spark, dir).count() == 0L)
    }
  }

  test("quirk Q4 on CORPUS rows: a zero-norm vector is excluded from knn, an exact query dup ranks first at dist 0, dup ties break by vec_id") {
    // The reference inserts [0.0]*384 on embed failure (SURVEY quirk
    // Q4) — under cosine that row scores NaN and must never surface.
    // This fixture actually CONTAINS the zero vector (the r15 hostile
    // fixture's recipe), plus two exact copies of the query vector.
    val d = Files.createTempDirectory("graft-q4corpus").toString
    val q = Array.tabulate(64)(k => (k % 5) * 0.1f + 0.01f)
    val corpus = (1 to 10).map { n =>
      val v = Array.tabulate(64)(k => ((n * 31 + k * 17) % 13 - 6) * 0.01f)
      (n.toLong, v.toSeq, n % 3)
    }
    val rows = Seq(
      (VectorQueries.QueryVecId, q.toSeq, 0),
      (90L, Array.fill(64)(0f).toSeq, 1),  // zero norm: excluded
      (91L, q.toSeq, 2),                   // exact dup of the query
      (92L, q.toSeq, 2)) ++ corpus         // second dup: tie on dist 0
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val top = VectorQueries.knnTopkK(spark, d, 13).collect()
    val ids = top.map(_.getLong(0)).toSeq
    assert(!ids.contains(90L), s"zero-norm row must be excluded: $ids")
    assert(top.length == 12, s"all 12 non-degenerate rows rank: $ids")
    assert(ids.take(2) == Seq(91L, 92L),
      s"dist-0 dups first, tie-broken by vec_id: $ids")
    assert(top(0).getDouble(2) == 0.0 && top(1).getDouble(2) == 0.0)
  }
}
