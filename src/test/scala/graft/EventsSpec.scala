package graft

import graft.ops.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Events operators over a crafted nanosecond-timestamp fixture —
  * pins the banded range-join semantics (inclusive window bounds,
  * bucket-straddling candidates) and its physical plan (hash join on
  * the bucket, never a nested-loop). */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ns(sec: Long, micro: Long = 0L): Long = sec * 1000000000L + micro * 1000L

  // P1@1000s: clicks at 940s (window edge, IN), 970s (IN, latest),
  // 939.999999s (OUT by 1µs); the two in-window clicks sit in minute
  // bucket 15 while P1 is in bucket 16 → exercises the bucket
  // explode. P2@2000s has no clicks in range → absent (inner join).
  private val rows = Seq(
    (1L, ns(1000), "purchase"),
    (2L, ns(2000), "purchase"),
    (10L, ns(940), "click"),
    (11L, ns(970), "click"),
    (12L, ns(940) - 1000L, "click"),
    (13L, ns(1939), "click"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-events").toString
    rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q22 banded range join: inclusive window, bucket-straddling clicks") {
    val out = Events.rangeJoinBanded(spark, dir, bandUs = 60000000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === Set(1L), "P2 has no clicks in its window")
    assert(out(1L)._1 === 2L, "940s boundary click and 970s click are in; -1µs is out")
    assert(out(1L)._2 === 30000000L, "gap to the latest click (970s) is 30s")
  }

  test("hll sketches: per-type and merged-global estimates track exact distincts") {
    val sf = "/root/testdata/sf0.01"
    val approx = Events.hllSketchUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = Events.eventsTable(spark, sf)
    val exact = e.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = e.select("user_id").distinct().count()
    (exact + ("__all" -> exactAll)).foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(2.0, ex * 0.05),
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("q22 plans as a hash join on the bucket key, not a nested loop") {
    val plan = Events.rangeJoinBanded(spark, dir, bandUs = 60000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "banded rewrite must avoid the O(n*m) nested-loop join")
    assert(plan.contains("Join"), "bucket equi-join expected in the plan")
  }
}
