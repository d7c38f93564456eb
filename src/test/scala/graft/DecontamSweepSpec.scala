package graft

import graft.ops.Curation
import org.scalatest.funsuite.AnyFunSuite

/** The decontamination-grain operating curve
  * ([[Curation.decontamGrainSweepAgainst]]): flag rate per n-gram
  * length over one corpus/benchmark pair. Contract: (1) a verbatim
  * long leak flags at EVERY grain; a short shared idiom flags only
  * below its length — the over-flagging the long grains exist to
  * avoid; (2) flags are monotone non-increasing in grain (an n-gram
  * match contains an (n−1)-gram match); (3) the grid is total, even
  * against an empty benchmark. */
class DecontamSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val leak13 = (1 to 13).map(i => s"leak$i").mkString(" ")
  private val idiom4 = "just a shared idiom"
  private val bench = df(Seq(
    (1000L, s"benchmark question about $leak13 and the $idiom4 ending")))

  test("a 13-word verbatim leak flags at every grain; a 4-word idiom only below its length") {
    val corpus = df(Seq(
      (1L, s"prefix words then $leak13 trailing tail"), // verbatim long leak
      (2L, s"completely unrelated but contains my $idiom4 phrase"), // idiom only
      (3L, "nothing in common with the benchmark at all here")))
    val rows = Curation.decontamGrainSweepAgainst(corpus, bench).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 5L, 8L, 13L))
    val byN = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byN(13L) == 1L, "only the verbatim 13-word copy survives the longest grain")
    assert(byN(8L) == 1L && byN(5L) == 1L)
    assert(byN(3L) == 2L, "the 3-gram grain also flags the idiom doc (doc 2)")
    assert(rows.forall(_.getLong(2) == 3L), "n_docs is the corpus count on every grid row")
    val flags = rows.map(_.getLong(1))
    assert(flags.zip(flags.tail).forall { case (a, b) => a >= b },
      "flags are monotone non-increasing in grain")
  }

  test("plan: the benchmark set broadcasts and the corpus probe is a LeftSemi — the corpus never shuffles for the probe") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Curation.decontamGrainSweepAgainst(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), s"plan: $plan")
  }

  test("grid totality: an empty benchmark flags nothing but still emits all four grains") {
    val corpus = df(Seq((1L, "some words here"), (2L, "other words there")))
    val rows = Curation.decontamGrainSweepAgainst(corpus, df(Seq.empty)).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getDouble(3) == 0.0))
  }

  test("empty corpus: zero-division guarded, rates 0.0 on the full grid") {
    val rows = Curation.decontamGrainSweepAgainst(df(Seq.empty), bench).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }
}
