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
}
