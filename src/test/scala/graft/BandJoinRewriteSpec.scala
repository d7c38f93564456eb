package graft

import org.apache.spark.sql.graft.BandJoinRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The band-join optimizer rule: a naive non-equi time-band join,
  * written the obvious way, silently becomes the bucketed hash join
  * — identical results, no BroadcastNestedLoopJoin. */
class BandJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    // session-scoped install (same effect as spark.sql.extensions)
    if (!s.experimental.extraOptimizations.contains(BandJoinRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ BandJoinRewrite
    s
  }
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(1704067200000L + sec * 1000)

  private lazy val purchases = (0 until 200)
    .map(i => (i.toLong, ts(i * 37 % 3600))).toDF("pid", "ts")
  private lazy val clicks = (0 until 500)
    .map(i => (1000L + i, ts(i * 13 % 3600))).toDF("cid", "cts")

  private def bandJoin = purchases.join(clicks,
    expr("cts >= ts - interval 60 seconds AND cts <= ts"))

  test("naive band join plans as a bucketed hash join, not a nested loop") {
    val plan = bandJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
    assert(plan.contains("Generate explode"), s"missing bucket explode:\n$plan")
  }

  test("rewritten results are identical to the nested-loop join") {
    val withRule = bandJoin.collect().map(_.toSeq).toSet
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == BandJoinRewrite)
    try {
      val naive = bandJoin.collect().map(_.toSeq).toSet
      assert(withRule === naive)
      assert(naive.nonEmpty, "fixture must actually produce matches")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("swapped conjuncts and strict upper bound also fire") {
    val swapped = purchases.join(clicks,
      expr("cts <= ts AND cts >= ts - interval 60 seconds"))
    assert(swapped.queryExecution.executedPlan.toString.contains("Generate explode"))
    val strict = purchases.join(clicks,
      expr("cts >= ts - interval 60 seconds AND cts < ts"))
    assert(strict.queryExecution.executedPlan.toString.contains("Generate explode"))
    // strict bound stays strict through the residual predicate
    val exact = purchases.join(clicks, expr("cts >= ts - interval 60 seconds AND cts <= ts")).count()
    val strictN = strict.count()
    assert(strictN <= exact)
  }

  test("rule leaves equi-joins and other conditions untouched") {
    val equi = purchases.join(clicks, col("pid") === col("cid") - 1000)
    assert(equi.count() === 200)
    // one-sided band (no upper bound) must NOT be rewritten
    val oneSided = purchases.join(clicks, expr("cts >= ts - interval 60 seconds"))
    val plan = oneSided.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"), "must not fire on partial shape")
  }
}
