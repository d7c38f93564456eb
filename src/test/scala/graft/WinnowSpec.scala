package graft

import graft.ops.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Winnowing-fingerprint pairs + the LSH dedup audit, on a planted
  * corpus with one exact duplicate pair, one long-shared-run pair,
  * and unrelated noise. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // ShingleK = 3, WinnowWindow = 4 → the winnowing guarantee covers
  // any shared run of ≥ 4 + 3 − 1 = 6 words.
  private val sharedRun = "alpha beta gamma delta epsilon zeta eta theta"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-winnow").toString
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val rows = Seq(
      Row(0L, dup),
      Row(1L, dup), // exact duplicate of 0 (J = 1.0)
      Row(2L, s"intro words here $sharedRun closing remarks follow now"),
      Row(3L, s"completely different opening $sharedRun and another different tail"),
      Row(4L, "unrelated content about databases indexes and storage engines"),
      Row(5L, "weather report sunny tomorrow with light winds near the coast"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("winnowing guarantee: docs sharing a ≥(W+K−1)-word run share a fingerprint") {
    val pairs = Dedup.winnowPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((2L, 3L)),
      s"planted shared-run pair must be caught: ${pairs.keySet}")
    assert(pairs((2L, 3L)) >= 1L)
    assert(pairs.contains((0L, 1L)), "exact duplicates share every fingerprint")
    // identical docs select identical fingerprint sets
    val fpCounts = pairs((0L, 1L))
    assert(fpCounts >= pairs((2L, 3L)),
      "full duplicates share at least as many fingerprints as a partial overlap")
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b) == Set(4L, 5L) },
      "unrelated docs must not pair")
  }

  test("winnowed fingerprints are a strict subset of positional shingles (density)") {
    // a doc pairs with itself across relayouts deterministically
    val a = Dedup.winnowPairs(spark, dir).collect().map(_.toSeq).toSeq
    val d2 = Files.createTempDirectory("graft-winnow2").toString
    spark.read.parquet(s"$dir/documents.parquet").repartition(5)
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val b = Dedup.winnowPairs(spark, d2).collect().map(_.toSeq).toSeq
    assert(a == b, "winnow pairs must not depend on physical layout")
  }

  // --- weighted simhash --------------------------------------------------

  private val boiler = "nav home about contact copyright terms privacy cookie " +
    "policy footer header menu search login signup subscribe newsletter " +
    "share follow twitter facebook site page powered by engine view all more"

  private lazy val shwDir: String = {
    val d = Files.createTempDirectory("graft-shw").toString
    // boilerplate repeated 4x per doc: occurrence-weighted votes are
    // dominated by it (the unweighted failure mode); its idf weight
    // is ln(N/N) = 0 regardless of repetition
    val b4 = Seq.fill(4)(boiler).mkString(" ")
    val rows = Seq(
      // same boilerplate everywhere; 0/1 differ in ALL content
      Row(0L, s"$b4 quark lepton boson hadron meson gluon photon neutrino"),
      Row(1L, s"$b4 violin cello oboe clarinet trumpet timpani harp flute"),
      // 2/3: identical content → must pair under the weighted scheme
      Row(2L, s"$b4 kernel scheduler interrupt pagefault mutex semaphore thread stack"),
      Row(3L, s"$b4 kernel scheduler interrupt pagefault mutex semaphore thread stack"),
      Row(4L, s"$b4 glacier tundra fjord moraine crevasse permafrost iceberg floe"),
      Row(5L, s"$b4 sonnet stanza meter rhyme couplet caesura enjambment verse"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("weighted simhash ignores corpus-wide boilerplate; unweighted drowns in it") {
    val weighted = Dedup.simhashWeighted(spark, shwDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical content = identical weighted fingerprints
    assert(weighted.contains((2L, 3L)), s"true dup must pair: $weighted")
    // all-different content must NOT land in Hamming range once the
    // ubiquitous boilerplate votes ln(N/N) = 0
    assert(weighted == Set((2L, 3L)),
      s"boilerplate-only overlap must not pair: $weighted")
    // the unweighted fingerprint is majority-voted by the 28 shared
    // boilerplate tokens, so every doc pair collapses into Hamming
    // range — the exact failure mode the weighting removes
    val unweighted = Dedup.simhashDedup(spark, shwDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unweighted.size > 1,
      s"unweighted simhash should false-positive on shared boilerplate: $unweighted")
  }

  test("LSH audit: planted exact duplicate is found; measures are consistent") {
    val r = Dedup.dedupLshAudit(spark, dir).collect().head
    val (nTrue, nPred, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (prec, rec) = (r.getDouble(3), r.getDouble(4))
    assert(nTrue >= 1, "exact duplicate pair has J = 1.0 ≥ τ")
    assert(tp <= math.min(nTrue, nPred))
    assert(prec >= 0.0 && prec <= 1.0)
    assert(rec >= 0.0 && rec <= 1.0)
    // identical docs have identical minhash signatures → est = 1.0,
    // every band collides: the LSH detector cannot miss them
    assert(tp >= 1, "exact duplicate must be recovered by LSH")
    assert(rec > 0.0)
  }
}
