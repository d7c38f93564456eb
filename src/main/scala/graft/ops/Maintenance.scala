package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators a long-lived 100 TB dataset needs
  * (the reference rebuilds its index from scratch each run,
  * `index.py:426-429`; a corpus at scale is maintained in place):
  * small-file compaction and stats-clustered rewrites.
  *
  * Streaming appends (graft.streaming.StreamingIndex) and
  * per-partition writes accrete many small files; scan throughput
  * then dies on open/footer overhead and the driver on listing. The
  * fix is periodic rewrite into right-sized files — file count
  * derived from the dataset's REAL on-disk bytes, never guessed. */
object Maintenance {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Total on-disk bytes of a directory tree (driver-side listing —
    * metadata only, no data read). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    fs.getContentSummary(path).getLength
  }

  /** SaveMode.Overwrite deletes the output dir before the lazy read
    * of the input ever runs — compacting in place would destroy the
    * data. Refuse identical (fully-qualified) in/out paths. */
  private def requireDistinctDirs(
      spark: SparkSession, inDir: String, outDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"compaction output dir must differ from input dir: $inDir")
  }

  /** Compact a parquet dataset into ~targetBytes files: reads the
    * actual byte size, computes the output file count, and rewrites
    * with a round-robin repartition (even file sizes regardless of
    * input skew). Returns the output file count used. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = DefaultTargetBytes): Int = {
    requireDistinctDirs(spark, inDir, outDir)
    val n = math.max(1L, (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }

  /** Compact AND cluster: range-partition on `sortCols` and sort
    * within each output file, so parquet row-group min/max stats
    * make later filters on those columns skip whole files/groups
    * (poor-man's data clustering — the single biggest scan lever
    * after partition pruning). */
  def compactSorted(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      sortCols: Seq[String],
      targetBytes: Long = DefaultTargetBytes): Int = {
    requireDistinctDirs(spark, inDir, outDir)
    val n = math.max(1L, (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    val cols = sortCols.map(col)
    spark.read.parquet(inDir)
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
