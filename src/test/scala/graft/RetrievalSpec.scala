package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Retrieval family over a planted corpus: BM25 ordering, RRF
  * fusion, and unigram-NLL behavior the fixture soup can't pin
  * down (the driver oracle gate covers fixture agreement). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // doc 0: dense in query terms; doc 1: one term; doc 2: none;
  // doc 3: rare words (high NLL); doc 4: common words (low NLL)
  private val docs = Seq(
    (0L, "spark join shuffle slow query error spark join"),
    (1L, "the quick brown fox saw one spark yesterday evening"),
    (2L, "completely unrelated words about cats dogs birds fish"),
    (3L, "xylophone quixotic zephyr jabberwocky vex"),
    (4L, "the the the the spark spark join join"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-retrieval").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // aligned embeddings: doc 0's vector near the query vector (vec 0)
    val vecs = (0L to 4L).map { i =>
      val base = Array.tabulate(8)(j => if (j == (i % 3).toInt) 1.0f else 0.1f)
      (i, base, i.toInt)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("bm25: term-dense doc ranks first, no-term doc scores zero") {
    val got = Retrieval.bm25Topk(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.head._1 == 0L, s"expected doc 0 first, got ${got.toSeq}")
    val scores = got.toMap
    assert(scores(2L) == 0.0 && scores(3L) == 0.0)
    assert(scores(0L) > scores(1L))
  }

  test("rrf: fused ranking rewards presence in both rankings") {
    val got = Retrieval.hybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vec 0 is the query: excluded from the vector ranking, so the
    // fusion covers docs 1-4; fused must be monotone in the ranks
    assert(!got.exists(_._1 == 0L))
    got.foreach { case (_, rk, rv, f) =>
      val expect = BigDecimal(1.0 / (60.0 + rk) + 1.0 / (60.0 + rv))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(f - expect) < 2e-6)
    }
  }

  test("unigram nll: rare-word doc scores higher than common-word doc") {
    val got = Retrieval.unigramLogprob(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) > got(4L), s"rare words must have higher NLL: $got")
    assert(got.values.forall(_ > 0.0))
  }

  test("bigram nll: unique-bigram doc scores higher than repeated-bigram doc") {
    val got = Retrieval.bigramLogprob(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = got.map(r => r._1 -> r._3).toMap
    // doc 3's every bigram is its left token's ONLY continuation in
    // the corpus → p(w2|w1) = 1, NLL exactly 0 (the bigram model's
    // determinism credit, where the unigram model scored it worst)
    assert(byId(3L) == 0.0, s"deterministic continuations must score 0: $byId")
    // doc 4 branches its contexts (the→{the,spark}, spark→{spark,join},
    // join→{join,shuffle} corpus-wide) → strictly positive NLL
    assert(byId(4L) > 0.0, s"branching contexts must score > 0: $byId")
    // n_bigrams = token count − 1 for every doc
    got.foreach { case (id, n, _) =>
      val toks = docs.find(_._1 == id).get._2.split(" ").length
      assert(n == toks - 1, s"doc $id: $n bigrams for $toks tokens")
    }
    assert(byId.values.forall(_ >= 0.0))
  }

  test("doremi: a bigram-predictable source gains weight over its baseline share") {
    // "structured" docs alternate two tokens — every bigram is fully
    // determined by its left token (bigram NLL ≈ 0, excess ≈ unigram
    // NLL). "flat" docs enumerate distinct tokens in rotating orders —
    // bigram structure adds nothing (excess ≈ 0 or negative).
    val d = java.nio.file.Files.createTempDirectory("graft-doremi").toString
    val structured = (0 until 6).map(i => (100L + i, "ping pong ping pong ping pong ping", "structured"))
    val flat = (0 until 6).map { i =>
      // distinct stride per doc: each left token sees a DIFFERENT
      // successor in every doc, so the corpus bigram conditionals
      // are ~1/6 — bigram structure adds little over unigram
      val ws = (0 until 7).map(j => s"t${(j * (i + 1)) % 7}")
      (200L + i, ws.mkString(" "), "flat")
    }
    (structured ++ flat).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val w = graft.ops.Retrieval.doremiWeights(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (exS, shS, wS) = w("structured")
    val (exF, _, wF) = w("flat")
    assert(exS > exF + 0.3, s"structured excess $exS should beat flat $exF")
    assert(wS > shS, "learnable source is upweighted past its share")
    assert(math.abs(w.values.map(_._3).sum - 1.0) < 1e-4, "weights normalize")
    assert(wS > wF)
  }

  test("quality calibration keeps the best fraction of EVERY source") {
    // source "hard" is uniformly higher-NLL than "easy"; a global cut
    // would gut it, the per-source percentile keeps ~70% of each
    val d = java.nio.file.Files.createTempDirectory("graft-calib").toString
    val easy = (0 until 10).map(i => (300L + i, "common words common words common", "easy"))
    val hard = (0 until 10).map(i => (400L + i, s"rare$i unique$i obscure$i", "hard"))
    (easy ++ hard).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.ops.Retrieval.qualityCalibrated(spark, d).collect()
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val kept = rs.count(_.getInt(4) == 1)
      // percent_rank ≤ 0.7 over n=10 keeps floor(0.7·9)+1 = 7
      assert(kept == 7, s"source $src kept $kept of ${rs.length}")
    }
    // the within-source rank of the best hard doc beats a global cut:
    // every easy doc's NLL is below every hard doc's
    val easyMax = rows.filter(_.getString(1) == "easy").map(_.getDouble(2)).max
    val hardMin = rows.filter(_.getString(1) == "hard").map(_.getDouble(2)).min
    assert(easyMax < hardMin, "planted separation holds")
  }

  test("ppl buckets: tertile segments are disjoint, exhaustive, NLL-ordered") {
    val got = Retrieval.pplBuckets(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set("head", "middle", "tail"))
    assert(got.values.map(_._1).sum == docs.size.toLong)
    val tokenTotal = docs.map(_._2.split(" ").length.toLong).sum
    assert(got.values.map(_._2).sum == tokenTotal)
    // segments partition the NLL axis: head's max < middle's min, etc.
    assert(got("head")._5 <= got("middle")._4)
    assert(got("middle")._5 <= got("tail")._4)
    // the rare-word doc (highest NLL) defines tail's max
    val nll = Retrieval.unigramLogprob(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got("tail")._5 == nll.values.max)
  }

  test("best_passage: answer locality — one dense passage beats thin spread everywhere") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-passage").toString
    val filler = Seq.fill(60)("lorem ipsum dolor sit amet").mkString(" ")
    // doc 0: irrelevant filler, then ONE dense window of query terms
    val dense = Seq.fill(8)("spark join shuffle slow query error").mkString(" ")
    // doc 1: the same term mass diluted across the whole doc
    val thin = (1 to 8).map(_ => "spark " + Seq.fill(12)("unrelated words here").mkString(" "))
      .mkString(" ")
    val rows = Seq(Row(0L, filler + " " + dense), Row(1L, thin))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Retrieval.bestPassage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.head._1 == 0L, s"dense-passage doc must lead: ${got.toSeq}")
    assert(got.head._2 > 0L, "the winning passage is the dense one, not the filler head")
    val d0 = got.find(_._1 == 0L).get
    val d1 = got.find(_._1 == 1L)
    d1.foreach(x => assert(d0._3 > x._3, s"locality must win: ${got.toSeq}"))
  }

  test("kneser-ney beats jelinek-mercer on held-out text with unseen-context mass") {
    // the classic "Francisco" construction: 'francisco' is unigram-
    // frequent but follows exactly ONE context in train; 'common'
    // is modest-frequency but follows 20 distinct contexts. In a
    // NEW context (held-out OOV word), JM backs off to the raw
    // unigram prior and overpays for francisco; KN backs off to the
    // continuation prior and prefers common.
    val train = (
      (1L to 50L).map(i => (i, "san francisco")) ++
        (1 to 20).map(i => (100L + i, s"a$i common"))
      ).toDF("doc_id", "text")
    val evalCommon = Seq((1L, "b0 common")).toDF("doc_id", "text")
    val evalFrancisco = Seq((1L, "b0 francisco")).toDF("doc_id", "text")
    def nll(ev: org.apache.spark.sql.DataFrame, kn: Boolean): Double =
      Retrieval.heldoutBigramNll(train, ev, kn).head().getDouble(1)
    val (knCommon, jmCommon) = (nll(evalCommon, kn = true), nll(evalCommon, kn = false))
    val (knFran, jmFran) = (nll(evalFrancisco, kn = true), nll(evalFrancisco, kn = false))
    info(s"common: KN $knCommon vs JM $jmCommon; francisco: KN $knFran vs JM $jmFran")
    // KN scores the continuation-diverse word far better than JM does
    assert(knCommon < jmCommon,
      s"KN must beat JM on unseen-context + diverse word: $knCommon vs $jmCommon")
    // KN correctly prefers 'common' over 'francisco' in a new context;
    // JM gets the preference BACKWARD (the failure KN exists to fix)
    assert(knCommon < knFran, s"KN ordering: $knCommon vs $knFran")
    assert(jmFran < jmCommon, s"JM must exhibit the Francisco failure: $jmFran vs $jmCommon")
    // and on the train-on-self registered pair over a real corpus dir,
    // both are finite and KN stays a proper smoother (sanity)
    val dir = Files.createTempDirectory("graft-kn").toString
    train.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val knSelf = Retrieval.knLogprob(spark, dir).collect()
    assert(knSelf.nonEmpty && knSelf.forall(r => !r.getDouble(2).isNaN))
  }

  test("ppl_buckets_approx: bucket counts within the sketch's rank-error bound of the exact twin") {
    val sf = "/root/testdata/sf0.001"
    def byBucket(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = byBucket(Retrieval.pplBuckets(spark, sf))
    val approx = byBucket(Retrieval.pplBucketsApprox(spark, sf))
    assert(approx.keySet == exact.keySet, s"$approx vs $exact")
    val n = exact.values.sum
    assert(approx.values.sum == n, "bucketing must partition the corpus")
    // Greenwald–Khanna rank error ≤ 1/accuracy per cutoff; each
    // bucket is bounded by two cutoffs (+1 for interpolation vs
    // nearest-rank cutoff semantics at tiny N)
    val tol = math.max(1L, math.ceil(2.0 * n / Retrieval.PplApproxAccuracy).toLong)
    exact.foreach { case (b, ne) =>
      assert(math.abs(approx(b) - ne) <= tol,
        s"bucket $b: approx ${approx(b)} vs exact $ne (tol $tol)")
    }
  }

  test("ccnet_sample: head kept whole, rates honored within hash-uniform tolerance, deterministic") {
    val sf = "/root/testdata/sf0.01"
    def run() = Retrieval.ccnetSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val got = run()
    assert(got.toSeq.sorted == run().toSeq.sorted, "deterministic across invocations")
    assert(got.keySet == Retrieval.CcnetRates.map(_._1).toSet)
    val buckets = Retrieval.pplBuckets(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Retrieval.CcnetRates.foreach { case (b, rate) =>
      val (gotRate, n, kept, tokKept) = got(b)
      assert(gotRate == rate)
      assert(n == buckets(b), s"$b: sampler sees ${n} docs, bucketing says ${buckets(b)}")
      if (rate == 1.0) {
        assert(kept == n, s"head must be kept whole: $kept of $n")
      } else {
        // md5-uniform keeps concentrate near rate·n (±5σ binomial)
        val sd = math.sqrt(n * rate * (1 - rate))
        assert(math.abs(kept - rate * n) <= 5 * sd + 1,
          s"$b: kept $kept of $n at rate $rate")
        assert(kept > 0 && kept < n)
      }
      assert(tokKept >= 0 && (kept > 0) == (tokKept > 0))
    }
  }
  test("curriculum_order: phases agree with the exact NLL tertiles; shuffle keys are salted and stable") {
    val sf = "/root/testdata/sf0.01"
    val co = graft.ops.Retrieval.curriculumOrder(spark, sf).collect()
    // phase sizes must reproduce ppl_buckets' head/middle/tail split
    // (same cuts, same <= comparisons)
    val phases = co.groupBy(_.getInt(1)).map { case (p, rs) => p -> rs.length.toLong }
    val buckets = graft.ops.Retrieval.pplBuckets(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(phases(0) == buckets("head") && phases(1) == buckets("middle") &&
      phases(2) == buckets("tail"), s"$phases vs $buckets")
    // shuffle key: salted hash of doc_id alone — content-independent,
    // replayable
    co.foreach { r =>
      assert(r.getLong(2) ==
        graft.functions.CrossHash.md5Hash60("curriculum:" + r.getLong(0)), s"key: $r")
    }
    // the emitted order IS (phase, shuffle_key, doc_id)
    val keys = co.map(r => (r.getInt(1), r.getLong(2), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "curriculum order is the sort order")
    // re-run is bit-identical (auditable training order)
    val again = graft.ops.Retrieval.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(again == co.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
  }
}
