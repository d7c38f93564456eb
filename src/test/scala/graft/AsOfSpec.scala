package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asof join: latest right ≤ left per key, inclusive at equal ts, null before first") {
    val left = Seq(
      (1L, ts(0), "e0"),  // before any right row → null
      (1L, ts(5), "e1"),  // right at :05 exactly → inclusive
      (1L, ts(20), "e2"), // latest right ≤ :20 is :10
      (2L, ts(9), "e3"))  // other key: right at :07
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(10), "r10"), (1L, ts(30), "r30"),
      (2L, ts(7), "x7"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "e0" -> None, "e1" -> Some("r5"), "e2" -> Some("r10"), "e3" -> Some("x7")))
  }

  test("asof join plans one shuffle on the key (window, not a join explosion)") {
    val left = spark.range(100).select(col("id").as("k"),
      lit(ts(10)).as("ts"), col("id").as("payload_left"))
    val right = spark.range(100).select(col("id").as("k"),
      lit(ts(5)).as("ts"), col("id").cast("string").as("v"))
    val plan = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"plan: $plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"plan: $plan")
  }
}
