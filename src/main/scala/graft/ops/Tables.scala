package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (TESTDATA.md). Plain parquet reads so
  * Catalyst retains full predicate pushdown and column pruning. */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")
}
