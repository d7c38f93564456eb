package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Curation operators over a small synthetic corpus with planted
  * cases — validates the mechanisms (contamination overlap, quality
  * thresholds, shard boundaries) the fixture word-soup can't pin
  * down; the driver's DuckDB gate covers fixture behavior. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // doc 0 (doc_id % 50 == 0) is the "benchmark" doc; doc 1 shares the
  // 3-gram "alpha beta gamma"; doc 2 shares no 3-gram; doc 3 is pure
  // repetition (fails quality); doc 4/5 pad the 'fr' stratum.
  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0"),
    (1L, "intro alpha beta gamma outro filler words here", "en", "src0"),
    (2L, "one two three four five six seven eight nine", "en", "src0"),
    (3L, "spam spam spam spam spam spam spam spam spam", "en", "src0"),
    (4L, "bonjour le monde ceci est un texte simple", "fr", "src1"),
    (5L, "encore un autre document pour la strate", "fr", "src1"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-curation").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("decontaminate flags only docs sharing a 3-gram with the benchmark set") {
    val out = Curation.decontaminate(spark, dir).collect()
    val flagged = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(1L), "doc 1 shares 'alpha beta gamma'")
    assert(flagged(1L) >= 1L)
    assert(!flagged.contains(2L), "doc 2 shares no 3-gram")
    assert(!flagged.contains(0L), "benchmark docs are not self-flagged")
  }

  test("semantic_decontaminate: catches a reordered benchmark leak that 3-gram decontamination misses") {
    // benchmark doc and its "paraphrase": the SAME 20-word vocabulary,
    // each doc five independent permutations — unigram hash mass is
    // identical (coherent, count 5 per word) while bigrams are
    // essentially disjoint, so the hash-ngram cosine sits near
    // 500/(500+99) ~ 0.83 with NOT ONE shared word 3-gram
    val words = (0 until 20).map(i => f"tok$i%02d")
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    // first seed whose two five-permutation docs share NO word 3-gram
    // (random perms collide ~1.4 grams in expectation, so search)
    val (benchText, leakText) = LazyList.from(1).map { seed =>
      val rnd = new scala.util.Random(seed)
      def doc() = (1 to 5).map(_ => rnd.shuffle(words).mkString(" ")).mkString(" ")
      (doc(), doc())
    }.find { case (b, l) => (grams(b) & grams(l)).isEmpty }.get
    val otherVocab = (0 until 20).map(i => f"zzz$i%02d")
    val rnd2 = new scala.util.Random(999)
    val unrelated = (1 to 5).map(_ => rnd2.shuffle(otherVocab).mkString(" ")).mkString(" ")
    val dir = Files.createTempDirectory("graft-semdecon").toString
    Seq((50L, benchText, "bench_src"), (1L, leakText, "web"), (2L, unrelated, "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the exact n-gram decontaminator misses the reorder
    val ngram = Curation.decontaminate(spark, dir).collect().map(_.getLong(0)).toSet
    assert(!ngram.contains(1L),
      "planted leak shares a word 3-gram by accident — regenerate the permutations")
    // the semantic decontaminator catches exactly it
    val sem = Curation.semanticDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sem.map(_._1).toSet == Set(1L), s"exactly the planted leak: ${sem.toSeq}")
    assert(sem.head._2 == 50L && sem.head._3 >= Curation.SemDecontamEps,
      s"must best-match the benchmark doc above eps: ${sem.head}")
    // the per-benchmark-source report counts it
    val rep = Curation.semanticDecontamReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("bench_src", 1L, 1L)), s"report: ${rep.toSeq}")
  }

  test("gopher_quality: repetition fails, diverse text passes") {
    val out = Curation.gopherQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getAs[Int]("keep") === 0, "all-spam doc must be dropped")
    assert(out(3L).getAs[Double]("top_word_frac") === 1.0)
    assert(out(2L).getAs[Int]("keep") === 1, "diverse doc must survive")
    // mean word length of doc 2: 9 words, 44 chars incl 8 spaces
    assert(out(2L).getAs[Double]("mean_word_len") === 4.0)
  }

  test("sample_hash is a deterministic subset with in-range buckets") {
    val a = Curation.sampleHash(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = Curation.sampleHash(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a === b, "same sample on every run")
    Curation.sampleHash(spark, dir).collect().foreach { r =>
      assert(r.getAs[String]("bucket") < "1a")
    }
  }

  test("stratified_sample balances every stratum to the min count") {
    val out = Curation.stratifiedSample(spark, dir).collect()
    val byLang = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byLang("en")._1 === 4L)
    assert(byLang("fr")._1 === 2L)
    // min stratum is fr with 2 docs → every lang sampled to exactly 2
    assert(byLang.values.map(_._2).toSet === Set(2L))
  }

  test("redact_mask counts long-run masks and reports the length delta") {
    val out = Curation.redactMask(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: alpha(5) beta(4) gamma(5) delta(5) epsilon(7) zeta(4) eta(3) theta(5)
    assert(out(0L).getAs[Long]("n_masked") === 1L, "only 'epsilon' is >= 7 chars")
    assert(out(0L).getAs[Long]("len_redacted") ===
      out(0L).getAs[Long]("len_raw") - 7 + 6, "'epsilon' -> '<MASK>'")
    assert(out(2L).getAs[Long]("n_masked") === 0L)
  }

  test("mixture_sample applies per-stratum rates deterministically") {
    val a = Curation.mixtureSample(spark, dir).collect()
    val b = Curation.mixtureSample(spark, dir).collect()
    assert(a.toSeq === b.toSeq, "same mix on every run")
    val byLang = a.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byLang("en")._1 === 4L && byLang("fr")._1 === 2L)
    byLang.values.foreach { case (total, kept) =>
      assert(kept >= 0L && kept <= total)
    }
  }

  test("fixture invariants: conservation, bounds, and flag domains hold at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // shard_pack conserves every token and every doc per source
    val packed = Curation.shardPack(spark, sf)
      .groupBy("source")
      .agg(sum("sum_tokens").as("tok"), sum("n_docs").as("docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val truth = docs
      .selectExpr("source", "size(split(text, ' ')) AS n")
      .groupBy("source").agg(sum("n").as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(packed === truth, "shard packing must neither drop nor duplicate docs/tokens")

    // gopher signals live in their domains
    Curation.gopherQuality(spark, sf).collect().foreach { r =>
      val twf = r.getAs[Double]("top_word_frac")
      val dup = r.getAs[Double]("dup_2gram_frac")
      assert(twf >= 0.0 && twf <= 1.0)
      assert(dup >= 0.0 && dup <= 1.0)
      assert(r.getAs[Double]("mean_word_len") > 0.0)
      assert(Set(0, 1).contains(r.getAs[Int]("keep")))
    }

    // decontamination never flags benchmark docs and counts are positive
    Curation.decontaminate(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 50 != 0L)
      assert(r.getLong(1) >= 1L)
    }
  }

  test("source_kl: on-mixture source scores near zero, divergent source higher") {
    // srcA/srcB share the corpus-dominant vocabulary; srcC is a small
    // divergent minority (its words exist elsewhere only rarely), so
    // KL(C ‖ corpus) must exceed KL(A ‖ corpus) and all KLs are ≥ 0
    // (Gibbs). srcC's words appear once in srcA so every ratio is
    // defined without smoothing.
    val d = Files.createTempDirectory("graft-kl").toString
    Seq(
      (0L, "alpha beta alpha beta alpha beta gamma delta", "en", "srcA"),
      (1L, "alpha beta alpha beta gamma delta alpha beta", "en", "srcA"),
      (2L, "alpha beta alpha beta alpha beta gamma delta", "en", "srcB"),
      (3L, "gamma delta gamma delta gamma delta gamma delta", "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Curation.sourceKl(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toList
    val kl = out.map(r => r._1 -> r._3).toMap
    assert(out.map(_._1) == List("srcA", "srcB", "srcC"))
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map("srcA" -> 16L, "srcB" -> 8L, "srcC" -> 8L), s"token totals: $out")
    assert(kl.values.forall(_ >= 0.0), s"KL is non-negative: $kl")
    assert(kl("srcC") > kl("srcA") && kl("srcC") > kl("srcB"),
      s"divergent source must dominate: $kl")
  }

  test("mixture_weights: α<1 flattens the mix — small sources boosted, weights sum to 1") {
    val d = Files.createTempDirectory("graft-mixw").toString
    Seq(
      (0L, "a b c d e f g h i j k l m n o p", "en", "big"),   // 16 tokens
      (1L, "a b c d e f g h i j k l m n o p", "en", "big"),   // big: 32 total
      (2L, "a b c d", "en", "small"))                          // small: 4
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Curation.mixtureWeights(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("big")._1 == 32L && out("small")._1 == 4L)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-5, s"weights sum to 1: $out")
    // α = 0.3 < 1: the 8x token imbalance compresses to 8^0.3 ≈ 1.87x
    // in sampling weight, so the small source's boost > 1 > big's
    assert(out("small")._4 > 1.0 && out("big")._4 < 1.0, s"boosts: $out")
    assert(out("small")._3 < out("big")._3, "α-sampling still orders by size")
  }

  test("seq_pack: capacity never exceeded, every doc packed exactly once") {
    val sf = "/root/testdata/sf0.001"
    val rows = Curation.seqPack(spark, sf).collect()
    // next-fit invariant: a packed sequence holds at most the capacity
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_tokens") <= Curation.SeqCapacity,
        s"overfull sequence: $r")
      assert(r.getAs[Double]("fill") > 0.0 && r.getAs[Double]("fill") <= 1.0)
    }
    // conservation: the pack is a partition of the corpus
    val packedDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(packedDocs ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("seq_pack crafted boundaries: truncation, exact fit, and overflow reset") {
    val d = Files.createTempDirectory("graft-seqpack").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // src0: a 900-token doc (truncates to 800 and fills one sequence),
    //       then 300 + 500 (exactly fills the next — running+n == cap
    //       must FIT, not reset), then 1 more (starts sequence 2)
    // src1: 400 + 500 (overflow → reset into its own sequence)
    Seq(
      (0L, doc(900), "en", "src0"),
      (1L, doc(300), "en", "src0"),
      (2L, doc(500), "en", "src0"),
      (3L, doc(1), "en", "src0"),
      (10L, doc(400), "en", "src1"),
      (11L, doc(500), "en", "src1"))
      .map { case (id, txt, lang, src) => (id, txt, lang, src, txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Curation.seqPack(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    assert(got(("src0", 0L)) == ((1L, 800L)), "900-token doc truncates to capacity")
    assert(got(("src0", 1L)) == ((2L, 800L)), "300+500 fills exactly — no premature reset")
    assert(got(("src0", 2L)) == ((1L, 1L)), "next doc starts a fresh sequence")
    assert(got(("src1", 0L)) == ((1L, 400L)), "overflowing doc does not join")
    assert(got(("src1", 1L)) == ((1L, 500L)), "it starts its own sequence")
  }

  test("shard_pack assigns docs by per-source running token budget") {
    // craft one source with 3 docs of 200 tokens each and a 500 budget:
    // prefix sums before each doc are 0, 200, 400 → all shard 0;
    // a 4th doc (prefix 600) must open shard 1
    val d = Files.createTempDirectory("graft-shard").toString
    val tok200 = (1 to 200).map(i => s"w$i").mkString(" ")
    (0 to 3).map(i => (i.toLong, tok200, "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Curation.shardPack(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("srcA", 0L)) === ((3L, 600L)), "docs 0-2 fill shard 0")
    assert(out(("srcA", 1L)) === ((1L, 200L)), "doc 3 opens shard 1")
  }

  test("dataset_card: TOTAL row aggregates the per-lang rows; planted dup rate exact") {
    val d = Files.createTempDirectory("graft-card").toString
    Seq(
      (0L, "one two three", "en", "sA"),
      (1L, "one two three", "en", "sB"), // exact dup of doc 0
      (2L, "vier funf", "de", "sA"),
      (3L, "sechs sieben acht", "de", "sC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Curation.datasetCard(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6)))).toMap
    val (enD, enS, enT, enC, enDup) = rows("en")
    assert((enD, enS, enT) == ((2L, 2L, 6L)))
    assert(enDup == 0.5, "one of two en docs is a dup")
    val (deD, _, deT, deC, deDup) = rows("de")
    assert((deD, deT, deDup) == ((2L, 5L, 0.0)))
    val (tD, tS, tT, tC, _) = rows("TOTAL")
    assert(tD == enD + deD && tT == enT + deT && tC == enC + deC)
    assert(tS == 3L, "three distinct sources overall")
  }

  test("data_split: every source in exactly one split, totals partition the corpus") {
    val sf = "/root/testdata/sf0.001"
    val rows = Curation.dataSplit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet == Set("train", "val", "test"), s"splits: ${rows.keySet}")
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val totalDocs = d.count()
    val totalSources = d.select("source").distinct().count()
    assert(rows.values.map(_._1).sum == totalDocs, "docs must partition")
    // source-granular assignment: per-split distinct sources sum to
    // the corpus total — no source straddles a split boundary
    assert(rows.values.map(_._2).sum == totalSources, "sources must partition")
    assert(math.abs(rows.values.map(_._4).sum - 1.0) < 1e-4)
    assert(rows("train")._1 > rows("val")._1 && rows("train")._1 > rows("test")._1)
  }

  test("boilerplate_report: same-source template blocks flag; cross-source and rare blocks do not") {
    val intro = (1 to Curation.BoilerBlockWords).map(i => s"nav$i").mkString(" ")
    def tail(seed: String) = (1 to Curation.BoilerBlockWords).map(i => s"$seed$i").mkString(" ")
    val docs = Seq(
      // site_a: 3 docs share the intro block (df = 3 = threshold) +
      // a unique tail block each → frac 0.5
      (1L, s"$intro ${tail("a")}", "site_a"),
      (2L, s"$intro ${tail("b")}", "site_a"),
      (3L, s"$intro ${tail("c")}", "site_a"),
      // site_b carries the SAME intro — but df is per-source, so its
      // single occurrence there is content, not boilerplate
      (4L, s"$intro ${tail("d")}", "site_b"),
      (5L, tail("e"), "site_b"),
      // too short for one block → total row with 0 blocks
      (6L, "tiny doc", "site_b"))
    val dir = Files.createTempDirectory("graft-boiler").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.boilerplateReport(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "report must be doc-total")
    Seq(1L, 2L, 3L).foreach(id =>
      assert(got(id) == ((2L, 1L, 0.5)), s"doc $id: ${got(id)}"))
    assert(got(4L) == ((2L, 0L, 0.0)), s"cross-source intro must not flag: ${got(4L)}")
    assert(got(5L) == ((1L, 0L, 0.0)), s"unique content must not flag: ${got(5L)}")
    assert(got(6L) == ((0L, 0L, 0.0)), s"short doc must still report: ${got(6L)}")
  }

  test("filter_agreement: grid-total cells, kappa re-derivable, degenerate full-agreement pins 1.0") {
    val got = Curation.filterAgreement(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((0, 0), (0, 1), (1, 0), (1, 1)),
      "2x2 grid totality, ordered")
    val nn = got.map(_._3).sum
    assert(nn == 500, "every doc lands in exactly one cell")
    assert(got.map(_._5).distinct.length == 1, "kappa is one corpus-level statistic")
    // independent re-derivation from the cells
    val agree = got.filter(r => r._1 == r._2).map(_._3).sum.toDouble
    val ga = got.filter(_._1 == 1).map(_._3).sum.toDouble
    val ca = got.filter(_._2 == 1).map(_._3).sum.toDouble
    val po = agree / nn
    val pe = (ga * ca + (nn - ga) * (nn - ca)) / (nn.toDouble * nn)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(got.head._5 - kappa) < 1e-6, s"kappa ${got.head._5} vs rederived $kappa")
    assert(kappa >= -1 && kappa <= 1)

    // degenerate: singleton sources make the calibrated filter keep
    // everything (percent_rank 0), and clean varied text passes the
    // gopher rules -> all mass in (1,1), pe = 1, kappa pinned 1.0
    val docs = (1L to 4L).map { id =>
      val words = (1 to 25).map(i => f"w$id%02d$i%02d").mkString(" ")
      (id, words, s"solo_$id")
    }
    val dir = Files.createTempDirectory("graft-fagree").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Curation.filterAgreement(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(planted((1, 1)) == ((4L, 1.0)), s"full agreement cell: ${planted((1, 1))}")
    assert(Seq((0, 0), (0, 1), (1, 0)).forall(c => planted(c)._1 == 0L),
      s"all other cells empty: $planted")

    // empty corpus: nn = 0 must stay total and defined — the grid's
    // four zero cells with frac = 0 and kappa pinned 1.0 (vacuous
    // agreement), never a 0/0 NaN/null (the dedupCapReport rule)
    val emptyDir = Files.createTempDirectory("graft-fagree-empty").toString
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$emptyDir/documents.parquet")
    val empty = Curation.filterAgreement(spark, emptyDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(empty.map(r => (r._1, r._2)).toSeq == Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(empty.forall(r => r._3 == 0L && r._4 == 0.0 && r._5 == 1.0),
      s"empty corpus must pin n=0, frac=0, kappa=1: ${empty.toSeq}")
  }

  test("length_bias_report: decile totality, lengths monotone, rates recover the filters' keeps") {
    val sf = "/root/testdata/sf0.01"
    val got = Curation.lengthBiasReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (1 to 10), "all ten deciles, ordered")
    assert(got.map(_._2).sum == 500, "every doc lands in exactly one decile")
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"mean_chars must not decrease across deciles: $a -> $b")
    }
    got.foreach { case (_, n, _, rg, rl) =>
      assert(rg >= 0 && rg <= 1 && rl >= 0 && rl <= 1 && n > 0)
    }
    // the micro-unit rates are lossless at these cell sizes: rate·n
    // rounds back to the exact kept count, so the report's total
    // keeps must equal the filters' own totals
    val gKept = Curation.gopherQuality(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("keep")).collect()(0).getLong(0)
    val reportKept = got.map { case (_, n, _, rg, _) => math.round(rg * n) }.sum
    assert(reportKept == gKept, s"report recovers $reportKept gopher keeps, filter says $gKept")
    // the fixture's known shape: the rule filter is length-biased
    // (short soup docs fail the mean-word-length band), the
    // calibrated filter is per-source flat — the report must show it
    assert(got.head._4 < got.last._4,
      s"gopher keep rate should rise with length: ${got.head._4} vs ${got.last._4}")
  }

  test("boilerplate_scrub: flagged blocks are cut exactly, everything else rebuilds verbatim") {
    val intro = (1 to Curation.BoilerBlockWords).map(i => s"nav$i").mkString(" ")
    def tl(seed: String) = (1 to Curation.BoilerBlockWords).map(i => s"$seed$i").mkString(" ")
    val docs = Seq(
      (1L, s"$intro ${tl("a")}", "site_a"),
      (2L, s"$intro ${tl("b")}", "site_a"),
      // intro appears MID-doc here: removal must excise the middle
      // block and stitch the outer blocks back together
      (3L, s"${tl("c")} $intro ${tl("d")} plus tail", "site_a"),
      (4L, s"$intro ${tl("e")}", "site_b"), // per-source df: kept
      (5L, "tiny doc", "site_b"))
    val dir = Files.createTempDirectory("graft-scrub").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.boilerplateScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "scrub must be doc-total")
    def h(s: String) = // expected fingerprint via the same cross-engine hash
      graft.functions.CrossHash.md5Hash60(s)
    // docs 1-2: intro cut, tail survives verbatim
    assert(got(1L) == ((20L, 10L, tl("a").length.toLong, h(tl("a")))), s"${got(1L)}")
    assert(got(2L) == ((20L, 10L, tl("b").length.toLong, h(tl("b")))), s"${got(2L)}")
    // doc 3: the MIDDLE block goes, outer blocks + tail words stitch
    val doc3Clean = s"${tl("c")} ${tl("d")} plus tail"
    assert(got(3L) == ((32L, 10L, doc3Clean.length.toLong, h(doc3Clean))), s"${got(3L)}")
    // doc 4 (other source) and doc 5 (no blocks) rebuild unchanged
    assert(got(4L) == ((20L, 0L, s"$intro ${tl("e")}".length.toLong, h(s"$intro ${tl("e")}"))))
    assert(got(5L) == ((2L, 0L, 8L, h("tiny doc"))))
  }

  test("quality_ensemble: fusion overrules the LM signal a spam doc games; bounds and keep hold") {
    // The spam doc's own tokens dominate the corpus unigram counts,
    // so the LM signal alone scores it FLUENT (low NLL) — exactly the
    // failure mode ensembling exists for: diversity and repetition
    // vote it down and fusion must rank it below the diverse doc.
    val docs = Seq(
      (0L, (1 to 30).map(i => s"uniq$i").mkString(" ")),           // diverse
      (1L, Seq.fill(30)("spam").mkString(" ")),                    // spam
      (2L, ((1 to 15).map(i => s"mid$i") ++ (1 to 15).map(_ => "mid1")).mkString(" ")))
    val dir = Files.createTempDirectory("graft-qens").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.qualityEnsemble(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))
      .toMap
    // premise: the LM signal ALONE prefers spam (its tokens dominate)
    assert(got(1L)._2 > got(0L)._2, s"spam must win the lone LM signal: $got")
    // fusion overrules: diverse doc ranks strictly above spam
    assert(got(0L)._4 > got(1L)._4, s"fusion must overrule the gamed signal: $got")
    // orientation + extrema: diverse doc is the corpus ttr max (1.0),
    // spam is the repetition max (inverts to 0.0)
    assert(got(0L)._1 == 1.0 && got(1L)._3 == 0.0, s"min-max orientation: $got")
    got.values.foreach { case (t, n, r, f, k) =>
      Seq(t, n, r, f).foreach(v => assert(v >= 0.0 && v <= 1.0, s"normalized range: $got"))
      assert((k == 1) == (f >= 0.5), s"keep threshold: $got")
    }
  }

  test("line_dedup: cross-source duplicate paragraphs dedup globally, first occurrence survives") {
    val para = (1 to Curation.BoilerBlockWords).map(i => s"dup$i").mkString(" ")
    def tl(seed: String) = (1 to Curation.BoilerBlockWords).map(i => s"$seed$i").mkString(" ")
    // the duplicate paragraph appears in TWO sources (df = 1 per
    // source, so boilerplateScrub leaves both) and twice inside doc 3
    val docs = Seq(
      (1L, s"$para ${tl("a")}", "site_a"),          // FIRST occurrence: kept
      (2L, s"${tl("b")} $para", "site_b"),          // cross-source dup: cut
      (3L, s"$para ${tl("c")} $para plus tail", "site_b"), // both dup: cut twice
      (4L, "tiny doc", "site_b"),
      (5L, para, "site_c")) // ENTIRELY duplicate: rebuilds to ""
    val dir = Files.createTempDirectory("graft-linededup").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // boilerplate (same-source df >= 3) provably misses this
    val scrub = Curation.boilerplateScrub(spark, dir).collect()
    assert(scrub.forall(_.getLong(2) == 0L), "boilerplate scrub must leave cross-source dups")
    def h(s: String) = graft.functions.CrossHash.md5Hash60(s)
    val got = Curation.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "dedup must be doc-total")
    // doc 1 holds the global first occurrence: untouched
    assert(got(1L) == ((20L, 0L, s"$para ${tl("a")}".length.toLong, h(s"$para ${tl("a")}"))))
    // doc 2's copy cut, its own block kept
    assert(got(2L) == ((20L, 10L, tl("b").length.toLong, h(tl("b")))), s"${got(2L)}")
    // doc 3: BOTH copies cut, middle block + tail words stitch back
    val doc3Clean = s"${tl("c")} plus tail"
    assert(got(3L) == ((32L, 20L, doc3Clean.length.toLong, h(doc3Clean))), s"${got(3L)}")
    assert(got(4L) == ((2L, 0L, 8L, h("tiny doc"))))
    // doc 5 is nothing but the duplicate: rebuilds to the empty string
    // (the DuckDB NULL-comprehension edge, pinned)
    assert(got(5L) == ((10L, 10L, 0L, h(""))), s"${got(5L)}")
    // corpus report: 8 paragraphs, 4 removed, bytes = the cut copies
    val rep = Curation.lineDedupReport(spark, dir).collect().head
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == ((5L, 8L, 4L)), s"$rep")
    val bytesSaved = docs.map(_._2.length).sum -
      Seq(s"$para ${tl("a")}", tl("b"), doc3Clean, "tiny doc", "").map(_.length).sum
    assert(rep.getLong(3) == bytesSaved.toLong, s"bytes_saved ${rep.getLong(3)} vs $bytesSaved")
  }

  test("quality_threshold_sweep: grid-total, monotone, and consistent with the ensemble's own keeps") {
    val sf = "/root/testdata/sf0.001"
    val sweep = Curation.qualityThresholdSweep(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(sweep.map(_._1).toSeq == Seq(0.3, 0.4, 0.5, 0.6, 0.7), s"${sweep.toSeq}")
    // tightening the threshold can only shrink the kept set
    assert(sweep.sliding(2).forall { case Array(a, b) => a._2 >= b._2 && a._4 >= b._4 },
      s"monotone: ${sweep.toSeq}")
    // the τ = 0.5 row must agree with quality_ensemble's keep column
    val kept05 = Curation.qualityEnsemble(spark, sf).collect()
      .count(_.getInt(5) == 1).toLong
    val row05 = sweep.find(_._1 == 0.5).get
    assert(row05._2 == kept05, s"τ=0.5 must recover the ensemble keeps: $row05 vs $kept05")
    assert(sweep.forall(r => r._3 >= 0.0 && r._3 <= 1.0), s"fractions bounded: ${sweep.toSeq}")
  }

  test("epoch_shuffle_report: salted epochs decorrelate; a degenerate corpus pins r to 0") {
    val sf = "/root/testdata/sf0.001"
    val got = Curation.epochShuffleReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("1-2", "2-3"), s"${got.toSeq}")
    // n = 500 ⇒ the null σ of Pearson r is ~1/√n ≈ 0.045; a working
    // salt keeps |r| well inside a few σ, a broken one sends it to ±1
    got.foreach { case (pair, n, r) =>
      assert(n == 500L, s"$pair: ${got.toSeq}")
      assert(math.abs(r) < 0.15, s"epoch keys must decorrelate ($pair r=$r)")
    }
    // guard: a single-doc corpus has no variance to correlate
    val d1 = Files.createTempDirectory("graft-epoch-one").toString
    Seq((0L, "only doc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    val one = Curation.epochShuffleReport(spark, d1).collect()
    assert(one.forall(_.getDouble(2) == 0.0), s"n<2 pins r=0: ${one.toSeq}")
  }

  test("pii_report: the leaking source surfaces with its exposure rate; clean sources read zero") {
    import spark.implicits._
    import java.nio.file.Files
    // src_leak: 2 of 3 docs carry maskable runs (>=7-letter words);
    // src_clean: short words only
    val docs = Seq(
      (1L, "alpha beta gamma", "src_clean"),
      (2L, "one two six", "src_clean"),
      (3L, "username fingerprint xy", "src_leak"),
      (4L, "ab cd ef", "src_leak"),
      (5L, "residential address here", "src_leak"))
    val dir = Files.createTempDirectory("graft-pii").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.piiReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got("src_clean") == ((2L, 0L, 0L, 0.0)), s"$got")
    // doc 3: username+fingerprint, doc 5: residential+address = 4 runs
    assert(got("src_leak") == ((3L, 2L, 4L, 0.666667)), s"$got")
  }

  test("decontam_union_report: cells recover both parent flag sets and sum to the corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.decontamUnionReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("both", "exact_only", "semantic_only", "neither"))
    val exact = Curation.decontaminate(spark, dir).collect().map(_.getLong(0)).toSet
    val sem = Curation.semanticDecontaminate(spark, dir).collect().map(_.getLong(0)).toSet
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 =!= 0).count()
    assert(got("both") == (exact intersect sem).size.toLong, s"$got")
    assert(got("exact_only") == (exact diff sem).size.toLong, s"$got")
    assert(got("semantic_only") == (sem diff exact).size.toLong, s"$got")
    assert(got.values.sum == corpus, s"cells must sum to the corpus: $got vs $corpus")
  }

  test("decontam_spans: a verbatim benchmark passage localizes as ONE long span; an idiom collision as a 3-word one") {
    import spark.implicits._
    import java.nio.file.Files
    // doc 0 is benchmark (% 50 = 0); doc 1 leaks a 10-word verbatim
    // passage AND one isolated 3-gram; doc 2 is clean
    val bench = (1 to 20).map(i => s"b$i")
    val d1 = (1 to 5).map(i => s"x$i") ++ bench.slice(2, 12) ++
      (6 to 10).map(i => s"x$i") ++ bench.slice(14, 17) ++ Seq("x11", "x12")
    val d2 = (1 to 25).map(i => s"u$i")
    val dir = Files.createTempDirectory("graft-dspan").toString
    Seq((0L, bench.mkString(" ")), (1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.decontamSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the count-based flag sees 9 shared grams but NOT their shape;
    // the spans report separates one 10-word passage (8 windows
    // merged) from one 3-word collision
    assert(got(1L) == ((2L, 8L, 10L)),
      s"two spans, longest = the verbatim 10-word passage: $got")
    assert(!got.contains(2L), s"clean docs emit no span row: $got")
    assert(!got.contains(0L), s"benchmark docs are never scored against themselves: $got")
  }

  test("url_filter: exact and pattern blocklist arms fire with attribution; clean sources keep") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-urlf").toString
    Seq((1L, "a b c", "src3"),    // exact blocklist entry
        (2L, "d e f", "src18"),   // pattern family src1[89]
        (3L, "g h i", "src19"),
        (4L, "j k l", "news_site"),
        (5L, "m n o", "news_site"),
        (6L, "p q r", "src1"))    // prefix of the family but NOT in it
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.urlFilter(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)), r.getInt(3))).toMap
    assert(got("src3") == ((1L, Some("exact"), 0)), s"$got")
    assert(got("src18") == ((1L, Some("pattern"), 0)) &&
      got("src19") == ((1L, Some("pattern"), 0)), s"$got")
    assert(got("news_site") == ((2L, None, 1)), s"kept source with its count: $got")
    assert(got("src1") == ((1L, None, 1)),
      s"the pattern is anchored — a prefix must not be swept in: $got")
  }

  test("license_report: every marker class fires where planted, stays zero where not") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lic").toString
    Seq(
      (1L, "vector of things and another vector", "cc_pool"),   // 2 permissive hits
      (2L, "nothing to see here", "cc_pool"),
      (3L, "the value of value is value", "rights_pool"),       // 3 restrictive hits
      (4L, "dup appears once", "robots_pool"),
      (5L, "devalued词 is not value-free", "rights_pool"))       // \bvalue\b must not match inside words... but value-free has boundary
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.licenseReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // 3 sources x 3 markers, total relation
    assert(got.size == 9, s"per-(source, marker) totality: ${got.keySet}")
    assert(got(("cc_pool", "cc_marker")) == ((2L, 1L, 2L)),
      s"one of two docs flagged, two hits: $got")
    assert(got(("cc_pool", "rights_marker")) == ((2L, 0L, 0L)))
    assert(got(("rights_pool", "rights_marker")) == ((2L, 2L, 4L)),
      s"word-boundary matching: 'value-free' has a boundary hit, 'devalued' none: $got")
    assert(got(("robots_pool", "noai_marker")) == ((1L, 1L, 1L)))
    assert(got(("robots_pool", "cc_marker")) == ((1L, 0L, 0L)))
  }

  test("urlFilterAgainst / licenseReportFor: operators take ARBITRARY config relations") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cfg").toString
    Seq((1L, "alpha beta", "blog.example"),
        (2L, "gamma delta", "spam.example"),
        (3L, "epsilon zeta", "mirror7.example"),
        (4L, "eta theta", "news.example"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // a blocklist the fixture constants know nothing about: one exact
    // entry, one anchored regex family; a source matching BOTH takes
    // the exact arm (min-kind precedence)
    val bl = Seq(("spam.example", "exact"), ("^mirror\\d+\\.example$", "pattern"),
        ("spam.example", "pattern"))
      .toDF("entry", "kind")
    val got = Curation.urlFilterAgainst(docs, bl).collect()
      .map(r => r.getString(0) -> (Option(r.getString(2)), r.getInt(3))).toMap
    assert(got("spam.example") == ((Some("exact"), 0)),
      s"exact beats pattern when both match: $got")
    assert(got("mirror7.example") == ((Some("pattern"), 0)), s"$got")
    assert(got("blog.example") == ((None, 1)) && got("news.example") == ((None, 1)), s"$got")
    // a custom marker table, disjoint from the fixture constants
    val markers = Seq(("greek_a", "\\balpha\\b", "classA"),
      ("greek_g", "\\bgamma\\b", "classB"))
    val lic = Curation.licenseReportFor(docs, markers).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getLong(4))).toMap
    assert(lic.size == 8, s"4 sources x 2 markers: ${lic.keySet}")
    assert(lic(("blog.example", "greek_a")) == (("classA", 1L)), s"$lic")
    assert(lic(("spam.example", "greek_g")) == (("classB", 1L)), s"$lic")
    assert(lic(("news.example", "greek_a")) == (("classA", 0L)), s"$lic")
  }

  test("semanticDecontaminateAgainst: an EXTERNAL benchmark relation, no fixture split involved") {
    import spark.implicits._
    // corpus and benchmark arrive as separate relations — the
    // production shape (the benchmark is its own dataset, not every
    // 50th corpus row); id spaces may even overlap. Same permuted-
    // vocabulary construction as the registered-query spec: unigram
    // hash mass identical, bigrams scrambled — a paraphrase leak
    val words = (0 until 20).map(i => f"ext$i%02d")
    val rnd = new scala.util.Random(7)
    def doc() = (1 to 5).map(_ => rnd.shuffle(words).mkString(" ")).mkString(" ")
    val benchText = doc()
    val leakText = doc()
    val corpus = Seq(
      (1L, leakText),
      (2L, "butter flour sugar yeast dough oven whisk pan tray rack"))
      .toDF("doc_id", "text")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val got = Curation.semanticDecontaminateAgainst(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L),
      s"only the reordered leak flags, against the external bench id: $got")
    // empty benchmark → nothing can flag (the broadcast side is empty)
    assert(Curation.semanticDecontaminateAgainst(
      corpus, Seq.empty[(Long, String)].toDF("doc_id", "text")).collect().isEmpty)
    // the exact-3-gram twin over the same external relations: the
    // permuted paraphrase shares (essentially) no 3-gram, while a
    // verbatim copy flags with its full gram count
    val verbatim = Seq((3L, benchText)).toDF("doc_id", "text").union(corpus)
    val exact = Curation.decontaminateAgainst(verbatim, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.contains(3L) && exact(3L) == (benchText.split(" ").length - 2).toLong,
      s"verbatim copy shares every distinct 3-gram: $exact")
    assert(!exact.contains(2L), s"unrelated doc never flags: $exact")
  }

  test("gopher_threshold_sweep: monotone yield curve, registered-cutoff row equals gopher_quality's keeps, empty-corpus grid is total") {
    val got = Curation.gopherThresholdSweep(spark, dir).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    assert(got.map(_._1).toSeq == Curation.GopherTwfGrid,
      "one row per grid cutoff, cutoff-ordered")
    // loosening the cutoff can only ADD kept docs/words
    assert(got.sliding(2).forall { case Array((_, a), (_, b)) =>
      a._1 <= b._1 && a._2 <= b._2 }, s"yield must be monotone in the cutoff: ${got.toSeq}")
    // the registered 0.12 row IS the registered filter's outcome —
    // the sweep and gopher_quality share one predicate, no drift
    val reg = got.find(_._1 == Curation.GopherTwfMax).get._2
    val gq = Curation.gopherQuality(spark, dir).collect()
    val kept = gq.filter(_.getAs[Int]("keep") == 1)
    assert(reg._1 == kept.length.toLong)
    assert(reg._2 == kept.map(_.getAs[Long]("n_words")).sum)
    assert(reg._3 == java.math.BigDecimal.valueOf(kept.length.toDouble / gq.length)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    // empty corpus: the full grid reports zeros, no division error
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val zeroed = Curation.gopherThresholdSweepOf(empty).collect()
    assert(zeroed.length == Curation.GopherTwfGrid.size)
    assert(zeroed.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("source_temperature_mix: T=1 reproduces the natural mix, higher T flattens toward uniform, micro-unit normalization sums to ~1") {
    import spark.implicits._
    // two sources with word counts 75 / 25 — hand-checkable
    val d = (Seq.fill(15)((1L, (1 to 5).map(i => s"a$i").mkString(" "), "big")) ++
      Seq.fill(5)((2L, (1 to 5).map(i => s"b$i").mkString(" "), "small")))
      .zipWithIndex.map { case ((_, t, src), i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceTemperatureMixOf(d).collect()
      .map(r => (r.getDouble(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == 6, "2 sources x 3 temperatures")
    // natural shares
    assert(got((1.0, "big"))._1 == 75L && got((1.0, "big"))._2 == 0.75)
    assert(got((1.0, "small"))._2 == 0.25)
    // T=1: the mix IS the natural share (exact micro-units of 0.75/0.25)
    assert(got((1.0, "big"))._3 == 0.75 && got((1.0, "small"))._3 == 0.25)
    // T=2: sqrt weights — 866025 / (866025 + 500000), replicated exactly
    val w75 = math.floor(math.sqrt(0.75) * 1e6).toLong
    val w25 = math.floor(math.sqrt(0.25) * 1e6).toLong
    def r6d(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got((2.0, "big"))._3 == r6d(w75.toDouble / (w75 + w25)))
    // flattening is monotone in T: the dominant source's share falls,
    // the small one's rises
    assert(got((1.0, "big"))._3 > got((2.0, "big"))._3)
    assert(got((2.0, "big"))._3 > got((4.0, "big"))._3)
    assert(got((1.0, "small"))._3 < got((2.0, "small"))._3)
    assert(got((2.0, "small"))._3 < got((4.0, "small"))._3)
    // each temperature's shares sum to 1 within micro-unit rounding
    Curation.MixTemperatures.foreach { t =>
      val sumT = got.collect { case ((tt, _), v) if tt == t => v._3 }.sum
      assert(math.abs(sumT - 1.0) < 1e-5, s"T=$t shares sum to $sumT")
    }
    // empty corpus: zero rows, no division error
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Curation.sourceTemperatureMixOf(empty).collect().isEmpty)
  }

  test("context_budget_report: fit/truncate/chunk arithmetic exact on hand-checkable lengths; empty corpus reports zeros") {
    import spark.implicits._
    // lengths 10, 40, 100 against the {32, 64, 128} grid
    val d = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 100).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curation.contextBudgetReportOf(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(32L, 64L, 128L))
    // L=32: doc1 fits; docs 2,3 truncate losing (40-32)+(100-32)=76;
    // windows ceil(10/32)+ceil(40/32)+ceil(100/32) = 1+2+4 = 7;
    // pad = 7*32 - 150 = 74; kept = 10+32+32 = 74 of 150
    val r32 = got(32L)
    assert(r32.getLong(1) == 1L && r32.getLong(2) == 2L)
    assert(r32.getLong(3) == 76L && r32.getLong(4) == 7L && r32.getLong(5) == 74L)
    assert(r32.getDouble(6) == java.math.BigDecimal.valueOf(74.0 / 150)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    // L=128: everything fits whole, one window per doc, zero loss
    val r128 = got(128L)
    assert(r128.getLong(1) == 3L && r128.getLong(2) == 0L && r128.getLong(3) == 0L)
    assert(r128.getLong(4) == 3L && r128.getDouble(6) == 1.0)
    // empty corpus: full grid present, all zeros, no division error
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val zeroed = Curation.contextBudgetReportOf(empty).collect()
    assert(zeroed.length == Curation.ContextGrid.size)
    assert(zeroed.forall(r => (1 to 5).forall(r.getLong(_) == 0L) && r.getDouble(6) == 0.0))
  }

  test("source_cap_sample: the cap binds per source, survivors are hash-deterministic and partition-independent") {
    import spark.implicits._
    val cap = Curation.CapDocsPerSource
    // "big" has 3x the cap, "small" stays under it
    val d = ((0 until cap * 3).map(i => (i.toLong, s"w$i a b", "big")) ++
      (0 until 5).map(i => (1000L + i, s"v$i c", "small")))
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceCapSampleOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("big").getLong(1) == cap * 3L && got("big").getLong(2) == cap.toLong)
    assert(got("small").getLong(1) == 5L && got("small").getLong(2) == 5L)
    assert(got("small").getDouble(5) == 0.0)
    val dropped = java.math.BigDecimal.valueOf((cap * 2.0) / (cap * 3))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got("big").getDouble(5) == dropped)
    // kept tokens are reproducible: same survivors under a different
    // partitioning (the no-RNG rule — hash order, not task order)
    val re = Curation.sourceCapSampleOf(d.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(re("big") == got("big").getLong(4) && re("small") == got("small").getLong(4))
  }

  test("lm_anomaly_spans: a planted rare-token run inside a normal doc flags ONE merged span; separated runs flag two") {
    import spark.implicits._
    // 60 docs of a tight common vocabulary + one doc with an 8-word
    // garbage run + one with two separated 8-word garbage runs
    def common(seed: Int) =
      (0 until 30).map(i => s"tok${(i * 7 + seed) % 10}").mkString(" ")
    val garbage1 = (1 to 8).map(i => s"zzq$i").mkString(" ")
    val garbage2 = (1 to 8).map(i => s"xxr$i").mkString(" ")
    val docs = (1 to 60).map(i => (i.toLong, common(i))) ++ Seq(
      (61L, s"${common(61)} $garbage1 ${common(161)}"),
      (62L, s"${common(62)} $garbage1 ${common(162)} $garbage2 ${common(262)}"))
    val got = Curation.lmAnomalySpansOf(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.contains(61L) && got.contains(62L), s"planted docs must flag: $got")
    assert(got.keySet == Set(61L, 62L), s"clean docs must not flag: $got")
    assert(got(61L)._1 == 1L, "overlapping flagged windows merge into ONE span")
    assert(got(62L)._1 == 2L, "separated runs stay TWO spans")
    // an 8-word run of singletons = every window containing it in
    // full is exactly one (the run itself): span = 1 + W - 1 = 8...
    // plus boundary windows that still clear the margin; the span is
    // at least the run length and bounded by run + 2(W-1)
    assert(got(61L)._2 >= 8L && got(61L)._2 <= 8L + 2 * (Curation.LmAnomalyWindow - 1))
    // the worst window (all 8 singletons) carries the highest NLL
    assert(got(61L)._3 > 4.0, s"singleton window NLL should be far above the ~2.3-nat common vocab: ${got(61L)._3}")
    // empty corpus: empty result, no division error
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.lmAnomalySpansOf(empty).collect().isEmpty)
  }

  test("markup_artifacts_report: each artifact kind counts independently; clean sources report zero with rate 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "see &amp; and &lt; two entities", "dirty"),
      (2L, "<div class and <span here", "dirty"),
      (3L, "go to https://a.example/x now", "dirty"),
      (4L, "a literal \\n and a \\t escape", "dirty"),
      (5L, "perfectly clean text here", "clean"),
      (6L, "also clean and plain", "clean"))
      .toDF("doc_id", "text", "source")
    val got = Curation.markupArtifactsReportOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val dirty = got("dirty")
    assert(dirty.getLong(1) == 4L && dirty.getLong(2) == 4L, "all four dirty docs flag")
    assert(dirty.getLong(3) == 2L, "two entities")
    assert(dirty.getLong(4) == 2L, "two tag openings")
    assert(dirty.getLong(5) == 1L, "one URL")
    assert(dirty.getLong(6) == 2L, "backslash-n and backslash-t both count")
    assert(dirty.getDouble(7) == 1.0)
    val clean = got("clean")
    assert(clean.getLong(2) == 0L && clean.getDouble(7) == 0.0)
    // an ampersand or angle bracket WITHOUT entity/tag shape stays clean
    val nearMiss = Seq((1L, "a & b < c and & again", "s")).toDF("doc_id", "text", "source")
    val nm = Curation.markupArtifactsReportOf(nearMiss).collect().head
    assert(nm.getLong(2) == 0L, "bare & and < are prose, not artifacts")
  }

  test("source_epochs_report: T=1 gives every source the budget-fraction epoch count; higher T pushes low-resource sources past it") {
    import spark.implicits._
    // 75/25 word split across two sources (the temperature-mix corpus)
    val d = (Seq.fill(15)((1 to 5).map(i => s"a$i").mkString(" ") -> "big") ++
      Seq.fill(5)((1 to 5).map(i => s"b$i").mkString(" ") -> "small"))
      .zipWithIndex.map { case ((t, src), i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceEpochsReportOf(d).collect()
      .map(r => (r.getDouble(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size == Curation.MixTemperatures.size * 2)
    val budget = math.floor(Curation.BudgetFrac * 100).toLong
    assert(got.values.forall(_._2 == budget), "one corpus-wide budget on every row")
    // T=1: allocation proportional to supply → epochs = BudgetFrac
    // for ALL sources, up to the alloc floor (loses < 1 token, so
    // the deficit is bounded by 1/n_words)
    Seq("big", "small").foreach { s =>
      val e = got((1.0, s))._4
      val slack = 1.0 / got((1.0, s))._1
      assert(e <= Curation.BudgetFrac + 1e-9 && e > Curation.BudgetFrac - slack - 1e-9,
        s"T=1 epochs for $s: $e (slack $slack)")
    }
    // flattening: the small source's epochs RISE with T (up-sampled
    // past its natural share — the repetition-harm signal this table
    // exists to show), the big source's fall
    assert(got((2.0, "small"))._4 > got((1.0, "small"))._4)
    assert(got((4.0, "small"))._4 > got((2.0, "small"))._4)
    assert(got((2.0, "big"))._4 < got((1.0, "big"))._4)
    // allocations never exceed the budget per temperature
    Curation.MixTemperatures.foreach { t =>
      val a = got.collect { case ((tt, _), v) if tt == t => v._3 }.sum
      assert(a <= budget, s"T=$t allocates $a > $budget")
    }
    // empty corpus: zero rows
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Curation.sourceEpochsReportOf(empty).collect().isEmpty)
  }

  test("source_temperature_mix: operator and oracle both derive from MixTemperatures — editing the grid cannot desync them") {
    // one UNION ALL arm per grid entry, each with its exact literal
    val sql = Curation.sourceTemperatureMixSql
    assert("UNION ALL".r.findAllIn(sql).size == Curation.MixTemperatures.size - 1)
    Curation.MixTemperatures.foreach { t =>
      assert(sql.contains(s"CAST($t AS DOUBLE) AS temperature"), s"missing arm for T=$t")
    }
    // sqrt-chain shapes: T=1 is the identity, T=2^k nests k sqrts
    assert(Curation.sqrtChain(1.0, "p") == "p")
    assert(Curation.sqrtChain(2.0, "p") == "sqrt(p)")
    assert(Curation.sqrtChain(4.0, "p") == "sqrt(sqrt(p))")
    assert(Curation.sqrtChain(8.0, "p") == "sqrt(sqrt(sqrt(p)))")
    // a non-power-of-2 temperature has no exact sqrt chain — refused
    // loudly instead of silently falling back to libm pow()
    intercept[IllegalArgumentException](Curation.sqrtChain(3.0, "p"))
    intercept[IllegalArgumentException](Curation.sqrtChain(0.5, "p"))
  }

  test("release_pipeline: stages compose (dedup -> gopher -> lang -> length -> cap), write round-trips with a consistent manifest") {
    import spark.implicits._
    val cap = Curation.CapDocsPerSource
    // a good doc: 12 distinct words incl the 'the' marker, >= 50 chars
    def good(i: Int) =
      s"the alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i " +
        s"hotel$i india$i juliet$i kilo$i"
    val rows =
      (0 until cap + 4).map(i => (i.toLong, good(i), "en", "big")) ++ Seq(
        (100L, good(900), "en", "small"),       // survives
        (101L, good(900), "en", "small"),       // exact dup: killed by stage 1
        (102L, "spam spam spam spam spam spam spam spam spam spam spam spam",
          "en", "small"),                        // gopher twf kill
        (103L, "zzaa zzbb zzcc zzdd zzee zzff zzgg zzhh zzii zzjj zzkk zzll",
          "en", "small"),                        // no lang marker
        (104L, "the cat sat", "en", "small"),    // length kill (< 50 chars)
        (105L, good(905), "en", "small"))        // survives
    val d = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Curation.releasePipelineOf(d).collect()
    val bySrc = got.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // big: cap+4 good docs -> exactly cap survive; small: only 100 and 105
    assert(bySrc("big").size == cap, s"cap must bind: $bySrc")
    assert(bySrc("small") == Set(100L, 105L), s"stage kills wrong: $bySrc")
    // deterministic under a different partitioning (no-RNG cap order)
    val re = Curation.releasePipelineOf(d.repartition(7)).collect()
      .map(_.getLong(0)).toSet
    assert(re == got.map(_.getLong(0)).toSet)
    // splits come from the salted source hash — every released row of
    // a source carries the same split, and it matches data_split's rule
    assert(got.groupBy(_.getString(1)).forall(_._2.map(_.getString(3)).distinct.size == 1))
    // write round-trip: corpus parquet carries the same rows WITH text,
    // manifest n_docs totals the release
    val out = Files.createTempDirectory("graft-release").toString
    Curation.releaseWriteOf(d, out)
    val corpus = spark.read.parquet(out + "/corpus")
    assert(corpus.columns.contains("text") && corpus.columns.contains("split"))
    assert(corpus.select("doc_id").as[Long].collect().toSet ==
      got.map(_.getLong(0)).toSet)
    val manifest = spark.read.json(out + "/_manifest")
    assert(manifest.agg(sum(col("n_docs"))).as[Long].head() == got.length.toLong)
  }

  test("mojibake_report: the four damage classes count independently; clean ASCII stays zero") {
    import spark.implicits._
    // planted with explicit code points: latin1 digraphs (C3/C2 lead +
    // continuation), punctuation trigraphs (E2 + 2 continuations),
    // U+FFFD, bare C1 controls (NEL, STS)
    val latin1 = "CafÃ© rÃ©sumÃ© andÂ nbsp"
    val punct3 = "donât âqâ"
    val fffd = "bad�byte here"
    val c1 = "xy and zw"
    val d = Seq(
      (1L, latin1, "dirty"),
      (2L, punct3, "dirty"),
      (3L, fffd, "dirty"),
      (4L, c1, "dirty"),
      (5L, "perfectly clean ascii text", "clean"))
      .toDF("doc_id", "text", "source")
    val got = Curation.mojibakeReportOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val dirty = got("dirty")
    assert(dirty.getLong(1) == 4L && dirty.getLong(2) == 4L, "all four dirty docs flag")
    assert(dirty.getLong(3) == 4L, s"latin1 digraphs: 3 C3-lead + 1 C2-lead: $dirty")
    // the punct3 doc contributes 3 trigraphs AND its 6 continuation
    // chars to n_c1; the c1 doc adds 2 bare controls
    assert(dirty.getLong(4) == 3L, s"punctuation trigraphs: $dirty")
    assert(dirty.getLong(5) == 1L, s"replacement char: $dirty")
    assert(dirty.getLong(6) == 8L, s"C1 controls (6 from trigraphs + 2 bare): $dirty")
    assert(dirty.getDouble(7) == 1.0)
    val clean = got("clean")
    assert(clean.getLong(2) == 0L && clean.getDouble(7) == 0.0)
    // genuine UTF-8 accented text (a healthy e-acute U+00E9, NOT a
    // damaged one) must NOT flag: the digraph needs the C2/C3 lead
    val fine = Seq((1L, "café résumé naïve", "s"))
      .toDF("doc_id", "text", "source")
    assert(Curation.mojibakeReportOf(fine).collect().head.getLong(2) == 0L,
      "healthy accents are not mojibake")
  }

  test("synthetic_text_report: dominant marker by count then marker order; clean source gets the '' sentinel") {
    import spark.implicits._
    val d = Seq(
      // three different markers, one hit each -> order tie-break
      (1L, "As an AI language model, I cannot assist with that. I hope this helps!", "tied"),
      // one marker twice beats a different single marker
      (2L, "It's important to note that x. it's important to note that y. Let's delve into z.", "counted"),
      (3L, "organic prose with no assistant boilerplate at all", "clean"))
      .toDF("doc_id", "text", "source")
    val got = Curation.syntheticTextReportOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val tied = got("tied")
    assert(tied.getLong(3) == 3L, s"three markers hit once each: $tied")
    assert(tied.getString(5) == "as an ai language model",
      s"ties resolve to the earlier marker in SyntheticMarkers: $tied")
    assert(tied.getLong(6) == 1L)
    val counted = got("counted")
    assert(counted.getString(5) == "it's important to note that",
      s"count dominance beats marker order: $counted")
    assert(counted.getLong(6) == 2L && counted.getLong(3) == 3L)
    val clean = got("clean")
    assert(clean.getLong(2) == 0L && clean.getString(5) == "" &&
      clean.getLong(6) == 0L && clean.getDouble(4) == 0.0)
    // adjacent repeats count as distinct non-overlapping hits
    val rep = Seq((1L, "regenerate responseregenerate response", "s"))
      .toDF("doc_id", "text", "source")
    assert(Curation.syntheticTextReportOf(rep).collect().head.getLong(3) == 2L)
  }

  test("code_ratio_report: keyword and punctuation signals flag independently; thresholds are exact floors") {
    import spark.implicits._
    val d = Seq(
      // 2 keywords, zero braces/semis -> flags via CodeKwMin
      (1L, "def load of x and return x plus prose", "s1"),
      // 4 punct hits, zero keywords -> flags via CodePunctMin
      (2L, "a = {1: 2}; b = {3}", "s1"),
      // 1 keyword + 3 punct: BOTH floors missed -> clean
      (3L, "import this; use {it} sometimes", "s1"),
      // capitalized prose words are not keywords
      (4L, "Class notes on Return values and Import duties", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Curation.codeRatioReportOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = got("s1")
    assert(s1.getLong(2) == 2L, s"docs 1 and 2 flag, doc 3 misses both floors: $s1")
    assert(s1.getLong(4) == 3L, s"keywords: def+return (doc 1) + import (doc 3): $s1")
    val s2 = got("s2")
    assert(s2.getLong(2) == 0L && s2.getLong(4) == 0L,
      s"capitalized prose never counts: $s2")
  }

  test("quality_length_confound kernel: r=+1 on exact linear data, -1 on inverted, 0 on zero variance; rollup adds the (all) row") {
    import spark.implicits._
    val xy = (1L to 5L).flatMap { i =>
      Seq(("pos", i * 10, i * 7 + 3), // y = 0.7x + 3 -> r = 1
        ("neg", i * 10, 1000 - i * 2), // r = -1
        ("flat", 42L, i)) // zero x-variance -> 0
    }.toDF("source", "x", "y")
    val got = Curation.confoundOf(xy).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("pos") == 1.0, s"exact positive linear: $got")
    assert(got("neg") == -1.0, s"exact negative linear: $got")
    assert(got("flat") == 0.0, s"zero variance pins 0: $got")
    assert(got.contains("(all)"), s"rollup total row present: $got")
    // the (all) row mixes the three regimes: strictly between -1 and 1
    assert(math.abs(got("(all)")) < 1.0)
  }
}
