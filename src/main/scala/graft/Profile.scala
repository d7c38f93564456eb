package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface):
  * times sub-stages of the heavy bench queries to find the cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    import org.apache.spark.sql.functions._
    val d = ops.Tables.t(spark, dir, "documents")
    time("documents count")(d.count())
    time("index_pipeline")(ops.TextOps.indexPipeline(spark, dir).count())
    time("index_pipeline 2nd")(ops.TextOps.indexPipeline(spark, dir).count())
    time("split only")(
      d.select(split(col("text"), " ").as("w")).select(size(col("w"))).agg(sum("size(w)")).count())
    // jaccard stages
    time("shingles explode")(ops.Dedup.shingles(d).count())
    time("postings")(ops.Dedup.shingles(d).groupBy(col("shingle"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count())
    time("jaccard full")(ops.Dedup.dedupJaccard(spark, dir).count())
    time("jaccard full 2nd")(ops.Dedup.dedupJaccard(spark, dir).count())
    time("simhash full")(ops.Dedup.simhashDedup(spark, dir).count())
    time("simhash full 2nd")(ops.Dedup.simhashDedup(spark, dir).count())
    time("minhash full")(ops.Dedup.minhashLsh(spark, dir).count())
    time("kmeans full")(ops.KMeansVec.clusterProfile(spark, dir).count())
    time("components full")(ops.Dedup.dedupComponents(spark, dir).count())
    Seq("funnel_steps" -> ops.Events.funnelSteps _,
        "rate_anomaly" -> ops.Events.rateAnomaly _,
        "bm25_topk" -> ops.Retrieval.bm25Topk _).foreach { case (n, f) =>
      val p = f(spark, dir).queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllMatchIn(p).size
      println(s"PLAN $n exchanges=$ex windows=${"Window".r.findAllMatchIn(p).size} reused=${"ReusedExchange".r.findAllMatchIn(p).size} scans=${"Scan parquet".r.findAllMatchIn(p).size}")
    }
    spark.stop()
  }
}
