package graft

import graft.ops.VectorQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAgg
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top-k aggregate: equivalence with the window form
  * and a head-to-head timing on the bench fixture. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def scoredPerLabel(sf: String) = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dist",
        graft.functions.VectorFunctions.r6(
          graft.functions.VectorFunctions.cosineDist(col("embedding"), col("qe"))))
      .filter(!isnan(col("dist")) && col("dist").isNotNull)
      .select(col("label"), col("vec_id"), col("dist"))
  }

  test("heap aggregate ≡ window row_number top-k, including tiebreaks") {
    val sf = "/root/testdata/sf0.01"
    val viaWindow = VectorQueries.knnPerLabel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val viaHeap = scoredPerLabel(sf)
      .groupBy(col("label"))
      .agg(TopKAgg.topkPairs(col("dist"), col("vec_id"), 3).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rn"),
        col("s.id").as("vec_id"), col("s.dist").as("dist"))
      .orderBy(col("label"), col("rn"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaHeap == viaWindow)
  }

  test("duplicate distances: heap keeps lowest ids, ascending order") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.5, 10L), ("a", 0.5, 3L), ("a", 0.5, 7L), ("a", 0.1, 99L),
      ("b", 0.2, 1L)).toDF("g", "dist", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topkPairs(col("dist"), col("id"), 2).as("top"))
      .orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getDouble(0), s.getLong(1))))
    assert(got(0)._2 == Seq((0.1, 99L), (0.5, 3L)))
    assert(got(1)._2 == Seq((0.2, 1L)))
  }

  test("timing: heap vs window at sf0.1 (informational)") {
    val sf = "/root/testdata/sf0.1"
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once
    VectorQueries.knnPerLabel(spark, sf).count()
    scoredPerLabel(sf).groupBy(col("label"))
      .agg(TopKAgg.topkPairs(col("dist"), col("vec_id"), 3)).count()
    val (_, tWin) = timed(VectorQueries.knnPerLabel(spark, sf).count())
    val (_, tHeap) = timed(scoredPerLabel(sf).groupBy(col("label"))
      .agg(TopKAgg.topkPairs(col("dist"), col("vec_id"), 3)).count())
    info(f"window: $tWin%.3fs  heap: $tHeap%.3fs")
  }
}
