package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.01"

  test("cdc chunking is shift-resistant: a front insertion moves boundaries, not remakes them") {
    import graft.functions.CrossHash
    val rnd = new scala.util.Random(11)
    val words = Array.fill(400)("w" + rnd.nextInt(5000))
    def cuts(w: Array[String]): Seq[Int] =
      (4 until w.length).filter { p =>
        CrossHash.md5Hash60(w.slice(p - 4, p).mkString(" ")) % 64L == 0L
      }
    val base = cuts(words)
    val shifted = cuts("inserted" +: words)
    assert(base.nonEmpty, "fixture must produce some boundaries")
    // every original boundary beyond the edited window survives,
    // shifted by exactly one — fixed-size chunking would lose all
    val expected = base.map(_ + 1).toSet
    val surviving = shifted.toSet.intersect(expected)
    assert(surviving.size >= base.size - 1,
      s"boundaries must shift, not vanish: base=$base shifted=$shifted")
  }

  test("bpe pair counts match a hand-rolled reference on synthetic docs") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the theme thesis", "en", "t", 16L),
      (2L, "aa ab AA b", "en", "t", 10L))
    val tmp = Files.createTempDirectory("graft-bpe").toString
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.ops.TextOps.bpePairs(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tokens (lowercase alpha runs, len>=2): the, theme, thesis, aa, ab
    // pairs: th,he | th,he,em,me | th,he,es,si,is | aa | ab
    val expect = Map("th" -> 3L, "he" -> 3L, "em" -> 1L, "me" -> 1L,
      "es" -> 1L, "si" -> 1L, "is" -> 1L, "aa" -> 1L, "ab" -> 1L)
    assert(got == expect, s"got $got")
    // ordering: count desc, then pair asc
    val ordered = graft.ops.TextOps.bpePairs(spark, tmp)
      .collect().map(_.getString(0)).toSeq
    assert(ordered.take(2) == Seq("he", "th"))
  }

  test("doc entropy: repetition scores near 0, diverse usage near 1, bounds hold") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Files.createTempDirectory("graft-entropy").toString
    Seq(
      (0L, "spam spam spam spam spam spam spam eggs"),  // heavy repetition
      (1L, "one two three four five six seven eight"),  // uniform: max entropy
      (2L, "word word word word word word word word"))  // single word: H = 0
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.docEntropy(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // per-term r6 rounding can shave the last ulp off exact 1.0
    assert(got(1L)._4 >= 0.999998 && got(1L)._4 <= 1.0,
      s"uniform usage is log-normalized ~1: $got")
    assert(got(2L)._3 == 0.0 && got(2L)._4 == 0.0, s"constant doc has zero entropy: $got")
    assert(got(0L)._4 > 0.0 && got(0L)._4 < got(1L)._4,
      s"repetitive doc sits strictly between: $got")
    got.values.foreach { case (n, nd, h, nh) =>
      assert(n == 8L && h >= 0.0 && nh >= 0.0 && nh <= 1.0, s"bounds: $got")
      assert(nd <= n)
    }
  }

  test("approx percentiles track the exact ones within sketch tolerance") {
    val exact = TextOps.textPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val approx = TextOps.approxPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (lang, (a50, a90, a99)) =>
      val (e50, e90, e99) = exact(lang)
      // exact uses continuous interpolation, approx returns a real
      // datum — allow one interpolation step plus sketch slack
      assert(math.abs(a50 - e50) <= math.max(10.0, e50 * 0.05), s"$lang p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= math.max(10.0, e90 * 0.05), s"$lang p90: $a90 vs $e90")
      assert(math.abs(a99 - e99) <= math.max(15.0, e99 * 0.08), s"$lang p99: $a99 vs $e99")
    }
  }

  test("doc_novelty: exact duplicates sink, unique content tops, range bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    val dup = words("boiler", 12)
    val rows = (0L to 4L).map(i =>
        org.apache.spark.sql.Row(i, dup, "en", "s", 0L)) :+
      org.apache.spark.sql.Row(5L, words("unique", 12), "en", "s", 0L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.docNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val n = 6.0
    // the 5 mutual duplicates share every gram: idf = ln(6/5); the
    // unique doc's grams appear once: idf = ln(6/1)
    (0L to 4L).foreach(i => assert(math.abs(got(i) - math.log(n / 5)) < 1e-5, s"doc $i ${got(i)}"))
    assert(math.abs(got(5L) - math.log(n)) < 1e-5, s"unique doc ${got(5L)}")
    got.values.foreach(v => assert(v >= 0.0 && v <= math.log(n) + 1e-9))
  }

  test("langid scorers: the map-only closure ≡ the broadcast-join form, per doc") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val m = TextOps.fitLangidModel(spark, dir).get
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val joinForm = TextOps.scoreLangid(spark, d.select(col("doc_id"), col("text")), m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val closure = d.select(col("doc_id"),
        TextOps.langidPredictUdf(m)(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the join form omits sub-gram docs; the closure predicts '' there
    val joined = closure.map { case (id, p) => id -> joinForm.getOrElse(id, "") }
    assert(closure == joined, "micro-unit closure sums must equal the DECIMAL join sums")
    assert(closure.values.exists(_.nonEmpty))
  }

  test("langid_ngram: charset signal classifies where the marker vote degenerates to its tie-break") {
    import java.nio.file.Files
    import spark.implicits._
    // training (even doc_ids): two languages with distinctive char
    // trigrams but NOT ONE of the 25 marker words; held-out test docs
    // (odd ids) share the charset, so the n-gram NB classifies them
    // while the marker vote sees zero hits everywhere and falls back
    // to its tie-break lang
    val docs = Seq(
      (2L, "esto espada estrella escala esfera espuma", "es"),
      (4L, "espejo estanque espiga esmalte estufa", "es"),
      (6L, "frais froid fruit frise frein franc", "fr"),
      (8L, "fraise frites frange fresque frisson", "fr"),
      (1L, "especial estatua espina estilo", "es"),
      (3L, "frio frontera frontal fresa", "fr"))
    val dir = Files.createTempDirectory("graft-langid").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val marker = TextOps.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(marker(1L) != "es" && marker(3L) != "fr",
      s"marker vote must degenerate on marker-free text: $marker")
    val ngram = TextOps.langidNgram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3)))
      .toMap
    assert(ngram(1L) == (("es", "es", 1)), s"held-out es doc: ${ngram(1L)}")
    assert(ngram(3L) == (("fr", "fr", 1)), s"held-out fr doc: ${ngram(3L)}")
    // training docs classify themselves too (sanity, not the claim)
    Seq(2L, 4L, 6L, 8L).foreach(id => assert(ngram(id)._3 == 1, s"train doc $id: ${ngram(id)}"))
    // the agreement report shows the n-gram model strictly ahead
    val rep = TextOps.langidAgreement(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("es") == ((3L, 0L, 3L)) && rep("fr") == ((3L, 0L, 3L)),
      s"ngram must win every doc the marker vote misses: $rep")
  }

  test("collocation_pmi: a true collocation outranks a frequent-but-independent pair; the count floor holds") {
    import java.nio.file.Files
    import spark.implicits._
    // "nova lima" always co-occur (6 times, never apart) — a true
    // collocation. "the cat" meet 6 times but each word also roams
    // freely (24 occurrences each) — high count, low PMI. "rare gem"
    // co-occur 4 times: under the floor, absent.
    val docs = Seq(
      (1L, "nova lima a b the cat c the d cat e rare gem f"),
      (2L, "nova lima g the cat h the i cat j rare gem k"),
      (3L, "nova lima l the cat m the n cat o rare gem p"),
      (4L, "nova lima q the cat r the s cat t rare gem u"),
      (5L, "nova lima v the cat w the x cat y"),
      (6L, "nova lima z the cat a2 the b2 cat c2"))
    val dir = Files.createTempDirectory("graft-pmi").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.collocationPmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.contains(("nova", "lima")) && got(("nova", "lima"))._1 == 6L)
    assert(got.contains(("the", "cat")) && got(("the", "cat"))._1 == 6L)
    assert(got(("nova", "lima"))._2 > got(("the", "cat"))._2,
      s"exclusive co-occurrence must outrank independent frequency: $got")
    assert(!got.contains(("rare", "gem")),
      s"a 4-count pair sits under the ${TextOps.PmiMinCount} floor: $got")
  }

  test("langid_confusion: error mass lands in the matrix cell, diagonals carry the agreements") {
    import java.nio.file.Files
    import spark.implicits._
    // training makes 'xa' and 'xb' separable; 'xc' has NO training
    // docs (odd ids only), so its held-out docs must land in some
    // OTHER language's column — the confusion cell the per-true-lang
    // totals cannot show
    val docs = Seq(
      (2L, "zapato zorro zumo zanahoria zumbido", "xa"),
      (4L, "zona zebra zinc zapallo zodiaco", "xa"),
      (6L, "kettle kipper kernel kindle keeper", "xb"),
      (8L, "kayak kazoo kelp kiosk knack", "xb"),
      (1L, "zumo zorro zapato", "xa"),
      (3L, "kernel kipper kettle", "xb"),
      (5L, "zzz kkk mixed", "xc"))
    val dir = Files.createTempDirectory("graft-confusion").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.langidConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("xa", "xa")) == 3L && got(("xb", "xb")) == 3L,
      s"diagonals carry the agreements: $got")
    val xcRow = got.collect { case ((t, p), n) if t == "xc" => p -> n }
    assert(xcRow.map(_._2).sum == 1L && xcRow.forall(_._1 != "xc"),
      s"an untrained language's docs must land in another column: $got")
    assert(got.values.sum == docs.size, s"cells sum to the corpus: $got")
  }

  test("langid grams count CODE POINTS: supplementary-plane text streams oracle-identical grams") {
    import java.nio.file.Files
    import spark.implicits._
    // "🙂" is U+1F642 — two UTF-16 units, ONE code point. DuckDB's
    // substring/length count code points, so char-indexed grams would
    // split the surrogate pair and diverge
    assert(TextOps.codePoints("a🙂b").length == 3)
    assert(TextOps.codePoints("").length == 0)
    // a 2-code-point doc (3 UTF-16 units) has NO gram: the closure
    // must return the '' sentinel, not a surrogate-split gram
    val docs = Seq(
      (2L, "🙂😀🙂😀 emoji run here", "xa"),
      (4L, "😀🙂😀🙂 more emoji text", "xa"),
      (6L, "plain ascii words only here", "xb"),
      (1L, "🙂😀🙂 held out", "xa"),
      (3L, "a🙂", "xa"))
    val dir = Files.createTempDirectory("graft-langid-cp").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextOps.fitLangidModel(spark, dir).get
    // doc 3: 2 code points → sub-gram sentinel even though
    // text.length (UTF-16) is 3
    val preds = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextOps.langidPredictUdf(m)(org.apache.spark.sql.functions.col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(3L) == "", s"2-code-point doc must hit the sub-gram sentinel: $preds")
    // the closure and join forms stay bit-equal on surrogate text
    val joinForm = TextOps.scoreLangid(spark,
        spark.read.parquet(s"$dir/documents.parquet")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")), m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    preds.foreach { case (id, p) =>
      assert(p == joinForm.getOrElse(id, ""), s"doc $id: closure '$p' vs join form")
    }
    assert(preds(1L) == "xa", s"held-out emoji doc classifies by charset: $preds")
  }

  test("source_distinctive_terms: an exclusive frequent term tops its source; shared terms and sub-floor terms don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two sources over a shared vocabulary; "medical" appears ONLY in
    // src_a (20 times, well above the floor), "rare" only once (below
    // the floor), the rest uniformly in both
    val shared = (1 to 50).map(i => s"common${i % 5}")
    val aDocs = (1 to 10).map(i =>
      (i.toLong, (shared :+ "medical" :+ "medical").mkString(" "), "src_a"))
    val bDocs = (1 to 10).map(i =>
      (100L + i, (shared :+ "rare").take(51).mkString(" "), "src_b"))
    val d = (aDocs ++ bDocs).toDF("doc_id", "text", "source")
    val rows = graft.ops.TextOps.sourceDistinctiveTermsOf(d).collect()
    val topA = rows.filter(_.getString(0) == "src_a").head
    assert(topA.getString(1) == "medical",
      s"the exclusive term must top src_a: ${rows.mkString("\n")}")
    assert(topA.getLong(2) == 20L && topA.getLong(3) == 0L)
    assert(topA.getDouble(4) > 0.0, "overrepresentation is a positive z")
    // the floor: "rare" (global count 10 >= 5) may appear for src_b,
    // but a term with global count < 5 never can
    assert(!rows.exists(r => r.getString(1).startsWith("common") &&
      math.abs(r.getDouble(4)) > 3.0),
      s"uniformly shared terms can't be strongly distinctive: ${rows.mkString("\n")}")
    // every source emits at most DistinctiveTopK rows
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= graft.ops.TextOps.DistinctiveTopK)
    }
  }

  test("burstiness_report: bursty content terms outrank spread function terms; the df floor holds; the ratio is HALF_UP-exact") {
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    // "the" spreads: once in each of 8 docs (cf=8, df=8, burst=1).
    // "topic" bursts: 5 occurrences in each of 5 docs (cf=25, df=5,
    // burst=5). "rare" appears in only 4 docs -> under the df floor.
    val docs = (1 to 8).map { i =>
      val burst = if (i <= 5) " topic topic topic topic topic" else ""
      val rare = if (i <= 4) " rare" else ""
      (i.toLong, "the filler" + burst + rare)
    }
    val dir = Files.createTempDirectory("graft-burst").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.burstinessReport(spark, dir).collect()
    val byTerm = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byTerm("topic") == ((25L, 5L, 5.0)), s"bursty term: ${rows.mkString(",")}")
    assert(byTerm("the") == ((8L, 8L, 1.0)))
    assert(!byTerm.contains("rare"), "df floor excludes 4-doc terms")
    // ranking: topic above the/filler; ties (burst=1) break on term
    assert(rows.head.getString(0) == "topic")
    val ones = rows.filter(_.getDouble(3) == 1.0).map(_.getString(0)).toSeq
    assert(ones == ones.sorted, s"tie-break is lexicographic: $ones")
    // fractional ratios stay exact through the micro-unit identity
    val frac5 = Seq(
      (1L, "x x y y"), (2L, "x x y y"), (3L, "x y"), (4L, "x y"), (5L, "x y y y"))
      .toDF("doc_id", "text")
    frac5.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f5 = TextOps.burstinessReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // x: cf=7, df=5 -> 1.4 exact; y: cf=9, df=5 -> 1.8 exact
    assert(f5("x") == 1.4 && f5("y") == 1.8, s"exact ratios: $f5")
  }
}
