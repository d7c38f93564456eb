package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation helpers whose results are bit-identical between Spark
  * (parallel partial aggregation, nondeterministic add order) and a
  * sequential engine like DuckDB.
  *
  * Double addition is non-associative, so `sum(double)` differs in
  * final ulps depending on partition order. The decimal bridge makes
  * the sum exact and therefore order-independent:
  * each per-row double is cast to DECIMAL(38,6) (deterministic — a
  * double essentially never lands exactly on a half-way decimal
  * boundary because 5·10^-11 is not dyadic), summed exactly, and the
  * exact decimal total is cast back to double (correctly rounded,
  * identical in both engines). Oracle SQL mirrors this as
  * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  */
object OracleMath {
  private val Bridge = DecimalType(38, 6)

  /** Order-independent exact sum of a double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(Bridge)).cast("double")

  /** Order-independent mean: exact decimal sum / count, as double.
    * Oracle mirror: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Driver-side twin of the column `r6`: Spark's `round(x, 6)` on
    * DoubleType is BigDecimal HALF_UP (= DuckDB's round-half-away),
    * and `+ 0.0` collapses −0.0 the same way. ONE definition for
    * every driver-side arithmetic mirror (Pca/Dsir/UnigramLm). */
  def r6d(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue() + 0.0
}
