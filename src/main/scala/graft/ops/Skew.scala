package graft.ops

import graft.functions.OracleMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation for hot-key aggregation: two-phase salted
  * aggregation. A key receiving 10% of 100 TB melts whichever
  * reducer owns it; salting splits each key across `buckets`
  * partial groups (map-side spread), then merges the partials in a
  * second, now-uniform aggregation. Results are exact — counts and
  * decimal-bridged sums re-merge losslessly.
  *
  * (Join-side skew is handled by AQE's skew-join splitting, enabled
  * in the harness sessions; this utility covers the aggregation
  * side, which AQE does not rebalance.)
  */
object Skew {

  /** Exact count + sum per key via salted two-phase aggregation.
    * The salt spreads rows of one key uniformly (hash of a
    * per-partition monotonic id), so phase 1 has ≤ buckets groups
    * per key and no reducer hotspots; phase 2 merges `buckets`
    * tiny partials per key. */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      sumCol: String,
      buckets: Int = 16): DataFrame = {
    val salt = pmod(hash(monotonically_increasing_id()), lit(buckets)).as("_salt")
    val keys: Seq[Column] = keyCols.map(col)
    df.withColumn("_salt", salt)
      .groupBy((keys :+ col("_salt")): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col(sumCol).cast(DecimalType(38, 6))).as("_s"))
      .groupBy(keys: _*)
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("total"))
  }

  /** Reference (unsalted) form for equivalence testing. */
  def directCountSum(df: DataFrame, keyCols: Seq[String], sumCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), OracleMath.dsum(col(sumCol)).as("total"))
}
