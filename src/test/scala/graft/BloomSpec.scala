package graft

import graft.ops.{Bloom, Curation}
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom decontamination contract against its exact twin on the
  * real fixture corpus: no false negatives (every exact hit is
  * flagged, never under-counted) and a bounded false-positive tail.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val exact: Map[Long, Long] =
    Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val bloom: Map[Long, Long] =
    Bloom.bloomDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("no false negatives: every exact hit flagged with count >= exact") {
    assert(exact.nonEmpty, "fixture must plant benchmark overlap")
    exact.foreach { case (doc, nShared) =>
      val nFlagged = bloom.getOrElse(doc, 0L)
      assert(nFlagged >= nShared,
        s"doc $doc: bloom flagged $nFlagged < exact shared $nShared")
    }
  }

  test("false positives are a bounded tail, not the population") {
    val extraDocs = bloom.keySet -- exact.keySet
    val corpusDocs = graft.ops.Tables.t(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
      .count()
    assert(extraDocs.size <= corpusDocs / 10,
      s"${extraDocs.size} false-positive docs of $corpusDocs — filter undersized")
    // per-doc inflation stays small too: flagged counts on exact-hit
    // docs shouldn't explode past the exact counts
    val inflation = exact.keys.map(d => bloom(d) - exact(d)).sum.toDouble /
      math.max(1L, exact.values.sum)
    assert(inflation <= 0.5, s"flagged-gram inflation $inflation > 50%")
  }

  test("deterministic across runs") {
    val again = Bloom.bloomDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == bloom)
  }

  test("fp sweep: FP rate falls monotonically with filter size; flags always cover the exact truth") {
    val rows = Bloom.bloomFpSweep(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Bloom.BloomSweepBits.map(_.toLong))
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"m=${r.getLong(0)}: flagged ${r.getLong(2)} < exact ${r.getLong(3)} — a Bloom filter never under-flags")
      assert(r.getLong(1) <= r.getLong(0), "set bits cannot exceed the filter size")
      assert(r.getLong(3) == exact.size.toLong,
        "the exact-truth column is the decontaminate hit count on every grid row")
    }
    val fps = rows.map(_.getDouble(6))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b },
      s"fp_rate must fall as m grows: ${fps.toSeq}")
    assert(fps.head > fps.last,
      "the fixture benchmark saturates the smallest filter — the curve must actually move")
  }

  test("fp sweep degeneracies: empty benchmark flags nothing; an all-contaminated corpus guards the clean-doc denominator") {
    import spark.implicits._
    val none = Bloom.bloomFpSweepAgainst(
      Seq((1L, "some words entirely clean here")).toDF("doc_id", "text"),
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
    assert(none.length == Bloom.BloomSweepBits.size)
    assert(none.forall(r => r.getLong(2) == 0L && r.getDouble(6) == 0.0))
    val leak = "alpha beta gamma delta epsilon zeta"
    val all = Bloom.bloomFpSweepAgainst(
      Seq((1L, leak), (2L, leak)).toDF("doc_id", "text"),
      Seq((1000L, leak)).toDF("doc_id", "text")).collect()
    assert(all.forall(r => r.getLong(3) == 2L && r.getLong(5) == 2L),
      "every corpus doc is exact-contaminated")
    assert(all.forall(r => r.getDouble(6) == 0.0),
      "zero clean docs -> guarded 0.0 rate, not a division error")
  }
}
