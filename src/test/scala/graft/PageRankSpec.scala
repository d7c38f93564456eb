package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source-graph PageRank on a planted topology: a hub source sharing
  * shingles with two leaves, plus an isolated source. The hub must
  * out-rank the leaves, the leaves must out-rank the isolated node,
  * and total rank mass is conserved (Σpr ≈ 1). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-pagerank").toString
    val phraseA = "alpha beta gamma delta epsilon"
    val phraseB = "one two three four five"
    // hub shares phraseA with leaf1 and phraseB with leaf2;
    // leaves share nothing with each other; loner shares nothing
    val docs = Seq(
      (0L, s"$phraseA $phraseB", "hub"),
      (1L, s"$phraseA sailing words here", "leaf1"),
      (2L, s"$phraseB walking words there", "leaf2"),
      (3L, "totally isolated original content forever", "loner"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("hub out-ranks leaves, leaves out-rank the isolated source, mass conserved") {
    val rows = PageRank.sourcePagerank(spark, dir).collect()
    val pr = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val nOut = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("hub") > pr("leaf1") && pr("hub") > pr("leaf2"),
      s"hub ${pr("hub")} must beat leaves ${pr("leaf1")}, ${pr("leaf2")}")
    assert(pr("leaf1") > pr("loner") && pr("leaf2") > pr("loner"))
    assert(nOut("loner") == 0L, "isolated source has no edges")
    assert(nOut("hub") > nOut("leaf1"), "hub carries the most edge weight")
    val mass = pr.values.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass drifted")
    // output ordering: descending rank
    val sorted = rows.map(_.getDouble(2))
    assert(sorted.sameElements(sorted.sortBy(-_)))
  }

  test("triangle counting: a planted 3-clique closes, a wedge stays open") {
    val d = Files.createTempDirectory("graft-tri").toString
    val pAB = "alpha beta gamma delta"
    val pBC = "one two three four"
    val pAC = "red green blue yellow"
    val pAD = "north south east west"
    // A-B-C pairwise connected (triangle); D touches only A (wedge
    // arms A-D vs A-B/A-C never close); E isolated
    val docs = Seq(
      (0L, s"$pAB $pAC $pAD", "srcA"),
      (1L, s"$pAB $pBC extra words here", "srcB"),
      (2L, s"$pBC $pAC other words there", "srcC"),
      (3L, s"$pAD unrelated tail words", "srcD"),
      (4L, "totally isolated content forever", "srcE"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = PageRank.sourceTriangles(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("srcA")._2 == 1L && rows("srcB")._2 == 1L && rows("srcC")._2 == 1L,
      s"triangle members must count 1: $rows")
    assert(rows("srcD")._2 == 0L, "wedge endpoint closes nothing")
    assert(rows("srcE") == ((0L, 0L, 0.0)), "isolated source all zeros")
    // clustering: B and C are fully closed (deg 2, tri 1 -> 1.0);
    // A has deg 3, tri 1 -> 2*1/(3*2) = 1/3
    assert(rows("srcB")._3 == 1.0 && rows("srcC")._3 == 1.0)
    assert(math.abs(rows("srcA")._3 - 0.333333) < 1e-6)
  }

  test("label propagation: planted clusters converge, a 2-node cluster does not oscillate") {
    val d = Files.createTempDirectory("graft-lpa").toString
    val pA = "alpha beta gamma delta epsilon"
    val pB = "one two three four five"
    // triangle cluster {srcA1,srcA2,srcA3} on phrase family A, pair
    // cluster {srcB1,srcB2} on family B (the synchronous-LPA
    // oscillation case), srcC isolated
    val docs = Seq(
      (0L, s"$pA first tail words", "srcA1"),
      (1L, s"$pA second tail words", "srcA2"),
      (2L, s"$pA third tail words", "srcA3"),
      (3L, s"$pB fourth tail words", "srcB1"),
      (4L, s"$pB fifth tail words", "srcB2"),
      (5L, "totally isolated original content forever", "srcC"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = PageRank.sourceCommunities(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows("srcA1") == rows("srcA2") && rows("srcA2") == rows("srcA3"),
      s"A-cluster must share one community: $rows")
    assert(rows("srcA1")._2 == 3L)
    assert(rows("srcB1") == rows("srcB2"),
      s"2-node cluster must converge, not oscillate: $rows")
    assert(rows("srcB1")._2 == 2L)
    assert(rows("srcA1")._1 != rows("srcB1")._1, "clusters must stay distinct")
    assert(rows("srcC") == (("srcC", 1L)), "isolated source is its own singleton")
  }

  test("deterministic across runs") {
    val a = PageRank.sourcePagerank(spark, dir).collect().map(_.toSeq)
    val b = PageRank.sourcePagerank(spark, dir).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val c = PageRank.sourceCommunities(spark, dir).collect().map(_.toSeq)
    val e = PageRank.sourceCommunities(spark, dir).collect().map(_.toSeq)
    assert(c.sameElements(e))
  }
}
