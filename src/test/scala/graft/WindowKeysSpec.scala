package graft

import graft.functions.WindowKeys
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The constant-but-not-foldable bounded-window key: survives the
  * optimizer, and NULL inputs share the single partition. */
class WindowKeysSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("null keys share the single window partition (no duplicate rank 1s)") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val w = Window.partitionBy(WindowKeys.boundedRankKey(col("v")))
      .orderBy(col("v").asc_nulls_first)
    val ranks = df.withColumn("rn", row_number().over(w))
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(ranks == Seq(1, 2, 3, 4), s"nulls split the partition: $ranks")
  }

  test("key survives optimization: window keeps a partition spec") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val w = Window.partitionBy(WindowKeys.boundedRankKey(col("x"))).orderBy(col("x"))
    val plan = df.withColumn("rn", row_number().over(w))
      .queryExecution.optimizedPlan.toString
    // EliminateWindowPartitions would leave "windowspecdefinition(" with
    // no partition expressions before the order spec
    assert(!plan.contains("windowspecdefinition(x"),
      s"partition key was folded away:\n$plan")
  }
}
