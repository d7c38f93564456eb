package graft

import graft.ops.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The prefix-filter exactness contract: candidate pruning must lose
  * no pair at or above the threshold — verified against a brute-force
  * all-pairs computation on the real fixture, and on a planted corpus
  * with a pair sitting EXACTLY on the threshold boundary. */
class JaccardPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("sf0.001: prefix-filtered result equals brute-force threshold join") {
    val dir = "/root/testdata/sf0.001"
    val got = Dedup.dedupJaccardPrefix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute force: every doc pair, exact jaccard over distinct
    // word-3-gram shingle sets (125k pairs at this scale — fine here,
    // which is exactly why the prefix filter exists for real scale)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sh = d.select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, greatest(size(split(text,' ')) - 2, 0)), " +
          "i -> concat_ws(' ', element_at(split(text,' '), i), " +
          "element_at(split(text,' '), i+1), element_at(split(text,' '), i+2))))").as("hs"))
      .filter(size(col("hs")) > 0)
    val a = sh.select(col("doc_id").as("da"), col("hs").as("ha"))
    val b = sh.select(col("doc_id").as("db"), col("hs").as("hb"))
    val brute = a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("common", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .withColumn("j", col("common") / (size(col("ha")) + size(col("hb")) - col("common")))
      .filter(col("j") >= Dedup.PrefixTau)
      .select(col("da"), col("db"), round(col("j"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(brute.nonEmpty, "fixture must contain pairs above the threshold")
    assert(got == brute, s"prefix=${got.size} brute=${brute.size}; " +
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("seeded fuzz: prefix+positional filtering equals brute force on random corpora") {
    // the positional filter's losslessness proof is subtle (rank
    // bookkeeping across the prefix slice); guard it against any
    // future edit with deterministic random corpora engineered to be
    // shingle-heavy with overlapping blocks around the threshold
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      // small vocab => many shared shingles => dense candidate space
      def word() = "w" + rnd.nextInt(12)
      val rows = (1L to 24L).map { id =>
        val n = 6 + rnd.nextInt(18)
        Row(id, (1 to n).map(_ => word()).mkString(" "), "en", "s", 0L)
      }
      val dir = Files.createTempDirectory(s"graft-ppj-fuzz$seed").toString
      spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val got = Dedup.dedupJaccardPrefix(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val sh = d.select(col("doc_id"),
          expr("array_distinct(transform(sequence(1, greatest(size(split(text,' ')) - 2, 0)), " +
            "i -> concat_ws(' ', element_at(split(text,' '), i), " +
            "element_at(split(text,' '), i+1), element_at(split(text,' '), i+2))))").as("hs"))
        .filter(size(col("hs")) > 0)
      val a = sh.select(col("doc_id").as("da"), col("hs").as("ha"))
      val b = sh.select(col("doc_id").as("db"), col("hs").as("hb"))
      val brute = a.crossJoin(b).filter(col("da") < col("db"))
        .withColumn("common", size(array_intersect(col("ha"), col("hb"))).cast("double"))
        .withColumn("j", col("common") / (size(col("ha")) + size(col("hb")) - col("common")))
        .filter(col("j") >= Dedup.PrefixTau)
        .select(col("da"), col("db"), round(col("j"), 6).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"seed $seed: prefix=${got.size} brute=${brute.size}; " +
          s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    }
  }

  test("boundary: a pair at exactly tau survives, just below is cut") {
    val dir = Files.createTempDirectory("graft-ppj").toString
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    // block of 8 shared words -> 6 shared shingles; 3-word unique
    // tails -> 3 private shingles each: J = 6/(9+9-6) = 0.5 = tau
    val block8 = words("c", 8)
    // block of 7 -> 5 shared: J = 5/11 < tau
    val block7 = words("k", 7)
    val rows = Seq(
      Row(1L, s"$block8 ${words("a", 3)}", "en", "s", 0L),
      Row(2L, s"$block8 ${words("b", 3)}", "en", "s", 0L),
      Row(3L, s"$block7 ${words("d", 3)}", "en", "s", 0L),
      Row(4L, s"$block7 ${words("e", 3)}", "en", "s", 0L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Dedup.dedupJaccardPrefix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.5)),
      s"expected exactly the boundary pair at 0.5, got ${got.toSeq}")
  }
}
