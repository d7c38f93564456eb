package graft

import graft.ops.Coreset
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Greedy k-center (farthest-point sampling) invariants on a planted
  * geometry: the selection must jump to the farthest direction first,
  * the radius trace must be non-increasing (the Gonzalez proof
  * skeleton), and the selected set must certify its covering radius
  * (every unselected point lies within the last pick's mind). */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // four directions in R4; cosine geometry — cluster around +x, a
  // tight satellite around +y, one point at -x (cos dist 2 from the
  // +x seed), one at +z. vec_id 0 is the query sentinel (excluded);
  // vec_id 99 is zero-norm (excluded).
  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-coreset").toString
    val rows = Seq(
      Row(0L, v(9.0, 9.0, 9.0, 9.0), 0), // sentinel — must be ignored
      Row(1L, v(1.0, 0.01, 0.0, 0.0), 1), // seed (lowest vec_id)
      Row(2L, v(1.0, 0.02, 0.0, 0.0), 1),
      Row(3L, v(1.0, 0.0, 0.01, 0.0), 1),
      Row(4L, v(0.01, 1.0, 0.0, 0.0), 2),
      Row(5L, v(0.02, 1.0, 0.0, 0.0), 2),
      Row(6L, v(-1.0, 0.0, 0.0, 0.01), 3), // antipode of the seed
      Row(7L, v(0.0, 0.01, 1.0, 0.0), 4),
      Row(99L, v(0.0, 0.0, 0.0, 0.0), 9)) // zero norm — must be ignored
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def cosDist(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
    1.0 - dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("seed is the lowest vec_id; first jump is the antipode; sentinel and zero-norm excluded") {
    val rows = Coreset.kcenterSelect(spark, dir).collect()
    assert(rows.length == Coreset.K)
    assert(rows.map(_.getLong(1)).distinct.length == Coreset.K)
    assert(!rows.map(_.getLong(1)).contains(0L))
    assert(!rows.map(_.getLong(1)).contains(99L))
    val byRank = rows.sortBy(_.getLong(0))
    assert(byRank.head.getLong(1) == 1L) // seed
    assert(byRank.head.isNullAt(3)) // seed has no mind
    assert(byRank(1).getLong(1) == 6L) // farthest from +x ≈ antipode
    assert(byRank(1).getDouble(3) > 1.9) // cosine dist near 2
  }

  test("radius trace is non-increasing and the selected set certifies its covering radius") {
    val rows = Coreset.kcenterSelect(spark, dir).collect().sortBy(_.getLong(0))
    val minds = rows.drop(1).map(_.getDouble(3))
    minds.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"radius trace increased: $a -> $b")
      case _ => ()
    }
    // covering: every eligible unselected point is within the last
    // pick's mind of SOME center (the would-be next pick can't beat
    // the last accepted one)
    val all = Map(
      1L -> v(1.0, 0.01, 0.0, 0.0), 2L -> v(1.0, 0.02, 0.0, 0.0),
      3L -> v(1.0, 0.0, 0.01, 0.0), 4L -> v(0.01, 1.0, 0.0, 0.0),
      5L -> v(0.02, 1.0, 0.0, 0.0), 6L -> v(-1.0, 0.0, 0.0, 0.01),
      7L -> v(0.0, 0.01, 1.0, 0.0))
    val picked = rows.map(_.getLong(1)).toSet
    val centers = picked.toSeq.map(all)
    val radius = minds.last
    all.filterNot { case (id, _) => picked.contains(id) }.foreach { case (id, e) =>
      val d = centers.map(c => cosDist(e, c)).min
      assert(d <= radius + 1e-6, s"point $id at $d outside certified radius $radius")
    }
  }

  test("selection is deterministic across runs") {
    val a = Coreset.kcenterSelect(spark, dir).collect().map(_.toSeq)
    val b = Coreset.kcenterSelect(spark, dir).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
