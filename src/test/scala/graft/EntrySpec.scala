package graft

import graft.ops.VectorQueries
import org.scalatest.funsuite.AnyFunSuite

/** Flagship pipeline + ANN recall on the sf0.001 fixtures. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry: full RAG dataflow returns k hits with sane distances") {
    val hits = SparkEntry.entry(spark).collect()
    assert(hits.length == 5)
    val dists = hits.map(_.getAs[Double]("dist"))
    assert(dists.forall(d => d >= 0.0 && d <= 2.0))
    assert(dists.sorted.toSeq == dists.toSeq)
  }

  test("ann lsh: results are a subset of exact knn ranking universe") {
    val exact = VectorQueries.knnTopk(spark, dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val approx = VectorQueries.annLshTopk(spark, dir).collect()
    assert(approx.nonEmpty && approx.length <= 5)
    // recall@5 against exact top-5: LSH with multiprobe should
    // recover at least one true neighbor on the clustered fixture
    val approxIds = approx.map(_.getAs[Long]("vec_id")).toSet
    assert(approxIds.intersect(exact).nonEmpty,
      s"no overlap: exact=$exact approx=$approxIds")
  }

  test("blocked near-dup ≡ BNLJ near-dup (row-for-row, bit-exact sims)") {
    val sf01 = "/root/testdata/sf0.01"
    val bnlj = VectorQueries.embedNeardup(spark, sf01).collect().map(_.toString).toSeq
    val blocked = VectorQueries.embedNeardupBlocked(spark, sf01).collect().map(_.toString).toSeq
    assert(blocked == bnlj)
  }

  test("triangle near-dup ≡ blocked near-dup (the above-cap path, no driver copy)") {
    val sf01 = "/root/testdata/sf0.01"
    val blocked = VectorQueries.embedNeardupBlocked(spark, sf01).collect().map(_.toString).toSeq
    // several block counts, including ones that don't divide the row
    // count evenly — every unordered pair must meet exactly once
    Seq(2, 3, 16).foreach { b =>
      val tri = VectorQueries.embedNeardupTriangle(spark, sf01, blocks = b)
      // scale-safety is structural: the plan is explode-replicate +
      // one co-partitioned join — no collect(), and never a
      // broadcast/cartesian of the full table forced by the operator
      val plan = tri.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"blocks=$b plan degenerated to cartesian")
      assert(tri.collect().map(_.toString).toSeq == blocked, s"blocks=$b mismatch")
    }
  }

  test("gated near-dup dispatches by size: blocked below cap, triangle above") {
    val sf01 = "/root/testdata/sf0.01"
    val blocked = VectorQueries.embedNeardupBlocked(spark, sf01).collect().map(_.toString).toSeq
    // fixture is below the default cap → blocked path
    val below = VectorQueries.embedNeardupGated(spark, sf01).collect().map(_.toString).toSeq
    assert(below == blocked)
    // cap 0 forces the distributed path → identical pairs, same name
    val above = VectorQueries.embedNeardupGated(spark, sf01, cap = 0).collect().map(_.toString).toSeq
    assert(above == blocked)
  }

  test("lsh near-dup pairs are a subset of exact near-dup pairs (precision 1)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = VectorQueries.embedNeardup(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorQueries.embedNeardupLsh(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    info(s"lsh recall: ${lsh.size}/${exact.size}")
  }

  test("every registered oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
