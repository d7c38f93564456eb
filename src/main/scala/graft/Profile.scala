package graft
import org.apache.spark.sql.SparkSession
/** Scratch profiler for bench hotspots (dev only, not shipped). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val shUdf = udf { (text: String) =>
      val w = text.split(" ")
      if (w.length < 3) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + 3 <= w.length) { seen.add(w(i) + " " + w(i + 1) + " " + w(i + 2)); i += 1 }
        val out = new Array[String](seen.size); seen.toArray(out); out
      }
    }
    val sharr = d.select(col("doc_id"), shUdf(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingle array (udf)")(sharr.count())
    val exploded = sharr.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    time("explode")(exploded.count())
    val postings = exploded.groupBy("shingle")
      .agg(sort_array(collect_list("doc_id")).as("docs"))
      .filter(size(col("docs")).between(2, 1000))
    time("postings groupBy")(postings.count())
    val pairsEx = postings.select(explode(expr(
      "flatten(transform(docs, (x, i) -> transform(slice(docs, i + 2, size(docs)), y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
    time("pairs explode")(pairsEx.count())
    time("pairs groupBy")(pairsEx.groupBy("p.doc_a", "p.doc_b").agg(count(lit(1))).count())
    // minhash pieces
    import graft.ops.{Dedup, VectorQueries}
    time("minhash full")(Dedup.minhashLsh(spark, dir).count())
    time("jaccard full")(Dedup.dedupJaccard(spark, dir).count())
    time("minhash full 2nd")(Dedup.minhashLsh(spark, dir).count())
    time("neardup bnlj")(VectorQueries.embedNeardup(spark, dir).count())
    time("neardup blocked")(VectorQueries.embedNeardupBlocked(spark, dir).count())
    time("neardup bnlj 2nd")(VectorQueries.embedNeardup(spark, dir).count())
    time("neardup blocked 2nd")(VectorQueries.embedNeardupBlocked(spark, dir).count())
    // equality check
    val a = VectorQueries.embedNeardup(spark, dir).collect().map(_.toString).toSeq
    val b = VectorQueries.embedNeardupBlocked(spark, dir).collect().map(_.toString).toSeq
    println(s"blocked == bnlj: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
