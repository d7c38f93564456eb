package graft

import graft.functions.CrossHash
import graft.ops.{AnnEval, Curation, Dedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The three pipeline audits: matryoshka truncation recall,
  * quality-aware survivor election, and cross-split leakage. */
class PipelineAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("matryoshka: full-width row self-validates at 1.0, all recalls in [0,1]") {
    val got = AnnEval.matryoshkaRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L), s"m grid total: ${got.toSeq}")
    got.foreach { case (m, hits, rec) =>
      assert(hits >= 0 && hits <= 5, s"m=$m hits=$hits")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    assert(got.last._3 == 1.0, "m = dim reproduces the exact ranking")
  }

  // --- survivor election -------------------------------------------------

  /** ~40 words of healthy prose (passes the gopher gates), plus a
    * truncated near-dup copy with the LOWER doc_id — min-id survival
    * would keep the truncation. */
  private val full = ("many distinct reasonable words compose this healthy document " +
    "about storage engines query planners and vectorized execution " +
    "with enough lexical variety that every quality gate passes " +
    "while remaining similar to its truncated sibling copy below here").trim
  private lazy val survivorDir: String = {
    val d = Files.createTempDirectory("graft-survivor").toString
    val truncated = full.split(" ").take(24).mkString(" ")
    val rows = Seq(
      Row(0L, truncated, "s0"),
      Row(1L, full, "s1"),
      Row(2L, "entirely unrelated filler content with no overlap at all whatsoever today", "s2"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("survivor election keeps the longer copy, not the lower id") {
    val got = Dedup.dedupSurvivorQuality(spark, survivorDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // component 0 = {0, 1}: min-id survival would keep doc 0 (the
    // truncation); quality election must keep doc 1
    val c0 = got.find(_._1 == 0L)
    assert(c0.isDefined, s"near-dup pair must form a component: ${got.toSeq}")
    assert(c0.get._2 == 1L, s"longer copy must survive: ${got.toSeq}")
    assert(c0.get._3 == 2L, "component has two members")
  }

  // --- split leakage ------------------------------------------------------

  private def splitOf(source: String): String = {
    val b = CrossHash.md5Hash60(s"split:$source") % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private lazy val leakDir: String = {
    val d = Files.createTempDirectory("graft-leak").toString
    // find two sources landing in different splits (deterministic scan)
    val srcs = (0 until 200).map(i => s"src$i")
    val trainSrc = srcs.find(splitOf(_) == "train").get
    val testSrc = srcs.find(splitOf(_) == "test").get
    val dup = "the very same long document text repeated across the split " +
      "boundary with identical shingles everywhere in both copies"
    val rows = Seq(
      Row(0L, dup, trainSrc),
      Row(1L, dup, testSrc),
      Row(2L, "harmless unique content in its own source partition today", trainSrc))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val ppDir: String = {
    val d = Files.createTempDirectory("graft-heldout").toString
    val srcs = (0 until 200).map(i => s"src$i")
    val trainSrc = srcs.find(splitOf(_) == "train").get
    val testSrc = srcs.find(splitOf(_) == "test").get
    val trainText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      Row(0L, trainText, "en", trainSrc),
      Row(1L, trainText + " alpha beta", "en", trainSrc),
      // test doc: every token unseen in training
      Row(2L, "nu xi omicron pi rho sigma tau upsilon", "de", testSrc))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("held-out scoring: train self-score has zero OOV; unseen test split scores worse") {
    val got = Curation.heldoutPpl(spark, ppDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got.contains("train") && got.contains("test"), s"splits present: $got")
    assert(got("train")._1 == 0.0, "every train token is in the model")
    assert(got("test")._1 == 1.0, "planted test doc is fully OOV")
    assert(got("test")._2 > got("train")._2,
      s"unseen vocabulary must score a higher NLL: $got")
  }

  test("split balance: total grid, shares sum to 1 within each split") {
    val rows = Curation.splitBalance(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val splits = rows.map(_._1).distinct.sorted
    val langs = rows.map(_._2).distinct.sorted
    assert(rows.length == splits.length * langs.length, "grid must be total")
    splits.foreach { sp =>
      val shareSum = rows.filter(_._1 == sp).map(_._4).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"$sp shares sum to $shareSum")
    }
    rows.foreach { r =>
      assert(r._6 >= 0.0 && r._6 <= 1.0, s"gap bounds: $r")
      assert(math.abs(r._6 - math.abs(r._4 - r._5)) < 2e-6, s"gap consistency: $r")
    }
  }

  // --- round-8 batch-4 audits -------------------------------------------

  test("funnel_report: stages chain (n_out feeds the next n_in), totals consistent") {
    val rows = Curation.funnelReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { case (_, _, nIn, nKilled, nOut) =>
      assert(nIn - nKilled == nOut && nKilled >= 0, s"stage arithmetic: ${rows.toSeq}")
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 == b._3, s"chain break: ${rows.toSeq}")
      case _ =>
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.head._3 == total, "stage 1 sees the whole corpus")
  }

  test("zipf_fit: one-row fit with finite slope/intercept and r2 in [0,1]") {
    val r = graft.ops.TextOps.zipfFit(spark, sf).collect()
    assert(r.length == 1)
    val (n, slope, r2) = (r(0).getLong(0), r(0).getDouble(1), r(0).getDouble(3))
    assert(n >= 2 && n <= graft.ops.TextOps.ZipfTopN)
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("vocab_coverage: fracs monotone nondecreasing in k, bounded by 1") {
    val rows = graft.ops.TextOps.vocabCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq ==
      graft.ops.TextOps.CoverageGrid.map(_.toLong), s"grid total: ${rows.toSeq}")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 <= b._3 && a._2 <= b._2, s"coverage monotone: ${rows.toSeq}")
      case _ =>
    }
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0))
    // geometric grid reaches saturation on the small-vocab fixture
    assert(rows.last._3 == 1.0, s"top-256 covers the soup vocab: ${rows.toSeq}")
  }

  test("ivf_probe_sweep: grid total, recall monotone in nprobe (superset candidates)") {
    val rows = AnnEval.ivfProbeSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == AnnEval.ProbeGrid.map(_.toLong))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4, s"recall monotone: ${rows.toSeq}")
      case _ =>
    }
    rows.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("excess_select: keep set is exactly the top tail (min kept >= max dropped)") {
    val rows = graft.ops.Retrieval.excessSelect(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    val kept = rows.filter(_._2 == 1).map(_._1)
    val dropped = rows.filter(_._2 == 0).map(_._1)
    assert(kept.nonEmpty && dropped.nonEmpty)
    assert(kept.min >= dropped.max, "percentile cut separates the sets")
    val frac = kept.length.toDouble / rows.length
    assert(frac >= 0.2 && frac <= 0.4, s"keep fraction ~30%: $frac")
  }

  test("token_budget_sample: per-source fill never exceeds its allocation") {
    val rows = Curation.tokenBudgetSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nTok, alloc, nKept, keptTok) =>
      assert(keptTok <= alloc, s"$src overfills: kept=$keptTok alloc=$alloc")
      assert(nKept <= nDocs && keptTok <= nTok)
      assert(nKept > 0, s"$src keeps nothing — allocation degenerate")
    }
    val budget = math.floor(Curation.BudgetFrac * rows.map(_._3).sum).toLong
    assert(rows.map(_._6).sum <= budget, "global fill within the global budget")
  }

  test("contrastive_triplets: positives share the anchor label, negatives do not") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = graft.ops.Rerank.contrastiveTriplets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == graft.ops.Rerank.NegAnchors)
    rows.foreach { case (a, pos, pd, neg, nd, margin) =>
      assert(e(pos) == e(a), s"positive label mismatch for anchor $a")
      assert(e(neg) != e(a), s"negative label collision for anchor $a")
      assert(math.abs(margin - graft.functions.OracleMath.r6d(nd - pd)) < 1e-9)
    }
  }

  test("a planted cross-split duplicate surfaces as a leak cell; grid is total") {
    val got = Curation.splitLeakage(spark, leakDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getInt(3)))).toMap
    assert(got.size == 6, s"6-cell grid must be total: $got")
    val (n, leak) = got(("test", "train"))
    assert(leak == 1)
    assert(n >= 1, s"planted cross-split duplicate must be counted: $got")
    // diagonal cells are flagged non-leaks
    Seq("test", "train", "val").foreach { sp =>
      assert(got((sp, sp))._2 == 0, s"diagonal is not leakage: $got")
    }
  }
}
