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
}
