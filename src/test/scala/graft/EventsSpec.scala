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

  test("funnel: stage order is enforced — a click BEFORE the first view does not convert") {
    val d = Files.createTempDirectory("graft-funnel").toString
    // user 1: view@100 → click@200 → purchase@300 (full funnel)
    // user 2: click@50 BEFORE view@100 → stuck at view
    // user 3: view only
    val ev = Seq(
      (1L, ns(100), "view", 1L), (2L, ns(200), "click", 1L), (3L, ns(300), "purchase", 1L),
      (4L, ns(50), "click", 2L), (5L, ns(100), "view", 2L),
      (6L, ns(100), "view", 3L))
    ev.toDF("event_id", "ts", "event_type", "user_id")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Events.funnelSteps(spark, d).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("view") === ((3L, 0L)))
    assert(got("click") === ((1L, 100000000L)), "only user 1 clicks after viewing")
    assert(got("purchase") === ((1L, 200000000L)))
  }

  test("cohort retention: offsets measured from each user's own first day") {
    val d = Files.createTempDirectory("graft-cohort").toString
    val day = 86400L
    // user 1 starts day 0, returns day 1; user 2 starts day 1 only
    val ev = Seq(
      (1L, ns(10), "view", 1L), (2L, ns(day + 10), "view", 1L),
      (3L, ns(day + 20), "view", 2L))
    ev.toDF("event_id", "ts", "event_type", "user_id")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Events.cohortRetention(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("1970-01-01", 0L)) == 1L)
    assert(got(("1970-01-01", 1L)) == 1L)
    assert(got(("1970-01-02", 0L)) == 1L)
    assert(got.size == 3)
  }

  test("rate anomaly: a planted spike hour is flagged, steady hours are not") {
    val d = Files.createTempDirectory("graft-anomaly").toString
    val hour = 3600L
    // 11 hours of 2 events each + one hour with 40 → clear outlier
    val steady = (0 until 11).flatMap { h =>
      Seq.tabulate(2)(i => (h * 100L + i, ns(h * hour + i), "error", 1L))
    }
    val spike = Seq.tabulate(40)(i => (9000L + i, ns(11 * hour + i), "error", 1L))
    (steady ++ spike).toDF("event_id", "ts", "event_type", "user_id")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Events.rateAnomaly(spark, d).collect()
      .map(r => r.getLong(2) -> ((r.getDouble(3), r.getInt(4))))
    val (spikeRows, steadyRows) = got.partition(_._1 == 40L)
    assert(spikeRows.length == 1 && spikeRows.head._2._2 == 1,
      s"spike hour must flag: ${got.toSeq}")
    assert(steadyRows.forall(_._2._2 == 0), s"steady hours must not flag: ${got.toSeq}")
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

  test("session_window boundary: an exact-gap arrival MERGES (new session only when gap is STRICTLY greater)") {
    // events at 0, +30min exactly, +30min+1us: session_window(30m)
    // must read [0, 30m] as ONE session (windows [ts, ts+gap) merge
    // while next.start <= current.end) and break only at the +1us
    // gap — the same `>` boundary as the lag-based q11. The r15
    // hostile fixture disproved the old `>=` docstring claim; this
    // pins the semantics at unit scale.
    val d = Files.createTempDirectory("graft-sessb").toString
    val min30 = 1800000000L
    Seq((1L, 0L, "view"), (2L, min30, "view"),
      (3L, min30 + min30 + 1L, "view"))
      .toDF("event_id", "us", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(7L).as("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Events.sessionWindowAgg(spark, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L, s"expected 2 sessions: ${r.toSeq}")
    assert(r(0).getLong(3) == 2L,
      s"the exact-30m pair must be ONE session of 2 events: ${r.toSeq}")
    // and the lag-based q11 agrees on the same boundary
    val q11 = Events.sessionize(spark, d).collect()
    assert(q11(0).getLong(1) == 2L, s"q11 must agree: ${q11.toSeq}")
  }

  test("event_transitions: per-user consecutiveness, (ts, event_id) tie order, conditional rows sum to 1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Files.createTempDirectory("graft-etr").toString
    // user 1: view -> click -> click; user 2: view -> buy.
    // users NEVER chain across each other (no click->view from u1's
    // last event to u2's first). events 20/21 share ONE timestamp:
    // the event_id tie-break makes the pair (a -> b), never (b -> a).
    Seq(
      (10L, 1000L, 1L, "view"), (11L, 2000L, 1L, "click"), (12L, 3000L, 1L, "click"),
      (20L, 5000L, 2L, "a"), (21L, 5000L, 2L, "b"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Events.eventTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows == Map(
      ("view", "click") -> ((1L, 1.0)),
      ("click", "click") -> ((1L, 1.0)),
      ("a", "b") -> ((1L, 1.0))), s"got: $rows")
    // per-from_type probabilities sum to ~1 over a fuller matrix
    val full = Events.eventTransitions(spark, "/root/testdata/sf0.001").collect()
    full.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$ft row sums to $s")
    }
  }
}
