package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Dedup family over a small synthetic corpus with planted
  * duplicates — validates the mechanisms the fixture word-soup can't
  * (the driver gate covers fixture behavior). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // planted: 0≡1 exact dup; 2≈3 near dup (one word changed); 4 unrelated
  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "one two three four five six seven eight nine ten eleven thirteen"),
    (4L, "completely different words about cats dogs birds fish mice"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dedup").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup groups identical texts under min doc_id") {
    val got = Dedup.dedupExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 2L) // docs 0 and 1 collapse to doc_id 0
    assert(got.keySet == Set(0L, 2L, 3L, 4L))
  }

  test("jaccard finds the planted near-dup pair with high similarity") {
    val got = Dedup.dedupJaccard(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 1L)) == 1.0)        // exact dup: jaccard 1
    assert(got((2L, 3L)) > 0.7)         // near dup: 9 of 11 shingles shared
    assert(!got.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("containment catches a near-subset quote that jaccard dilutes") {
    // doc 11 = a 12-word quote lifted verbatim from 100-word doc 10;
    // doc 12 unrelated. Jaccard(10,11) ≈ 10/98 — below any near-dup
    // bar — but containment of the quote side is 1.0.
    val big = (0 until 100).map(i => s"w$i").mkString(" ")
    val quote = (40 until 52).map(i => s"w$i").mkString(" ")
    val d = Files.createTempDirectory("graft-contain").toString
    Seq((10L, big), (11L, quote), (12L, "totally other content here now"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Dedup.containmentDedup(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (contA, contB, cmax) = rows((10L, 11L))
    assert(contB == 1.0, "every quote shingle is inside the big doc")
    assert(contA < 0.2, "the big doc is NOT contained in the quote")
    assert(cmax == 1.0)
    // jaccard on the same pair stays small — the signal containment adds
    val j = Dedup.dedupJaccard(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((10L, 11L)) < 0.2)
    assert(!rows.keySet.exists { case (a, b) => Set(a, b).contains(12L) })
  }

  test("components collapse transitive dup pairs under the min survivor") {
    val got = Dedup.dedupComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // pairs are (0,1) and (2,3): two components, min ids survive
    assert(got(0L) === ((0L, 1)))
    assert(got(1L) === ((0L, 0)))
    assert(got(2L) === ((2L, 1)))
    assert(got(3L) === ((2L, 0)))
    assert(!got.contains(4L), "unpaired docs are not graph nodes")
  }

  test("minhash LSH finds exact and near dups; estimate tracks true jaccard") {
    val got = Dedup.minhashLsh(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 1L)) == 1.0)
    assert(got.contains((2L, 3L)))
    val est = got((2L, 3L))
    val trueJ = 9.0 / 11.0
    assert(math.abs(est - trueJ) < 0.25, s"est=$est true=$trueJ")
  }

  test("simhash: exact dups hamming 0; near dups within radius") {
    val got = Dedup.simhashDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((0L, 1L)) == 0L)
    if (got.contains((2L, 3L))) assert(got((2L, 3L)) <= 6L)
  }

  test("driver union-find ≡ distributed label propagation") {
    // chain 10-11-12 plus pair 20-21: exercises transitivity
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val driver = Dedup.componentsOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dist = Dedup.componentsDistributed(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(driver.toSeq == dist.toSeq)
    assert(driver.toSeq == Seq(
      (10L, 10L, 1), (11L, 10L, 0), (12L, 10L, 0), (20L, 20L, 1), (21L, 20L, 0)))
  }

  test("components free superseded checkpoints: no block accumulation") {
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.size
    // chain of 13 nodes: ~12 propagation rounds → several mid-loop
    // checkpoints, each of which must be freed when superseded
    val edges = (0 until 12).map(i => (100L + i, 101L + i)).toDF("doc_a", "doc_b")
    val before = persisted
    val out = Dedup.componentsDistributed(edges)
    out.collect()
    // only the eagerly-materialized result frame may remain; und +
    // every superseded label round must already be unpersisted
    assert(persisted - before <= 1,
      s"leaked checkpoint blocks: before=$before after=$persisted")
    // the driver path (componentsOf under the cap) retains nothing
    val before2 = persisted
    Dedup.componentsOf(edges).collect()
    assert(persisted - before2 <= 0,
      s"driver path leaked: before=$before2 after=$persisted")
  }

  test("span dedup: planted duplicated paragraph found at its offsets") {
    val d = Files.createTempDirectory("graft-span").toString
    val boiler = (1 to 25).map(i => s"w$i").mkString(" ") // 25 shared words
    val docs = Seq(
      (0L, boiler + " unique tail zero extra padding words here now"),
      (1L, "lead one two three four five six seven eight nine " + boiler),
      (2L, "completely different content with no shared window at all " +
        (1 to 15).map(i => s"x$i").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.spanDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 0's window@0 (w1..w20) == doc 1's window@10 (after its
    // 10-word lead); no pair involves doc 2
    assert(got.contains((0L, 1L)), s"planted span pair missing: $got")
    val (n, pa, pb) = got((0L, 1L))
    assert(n >= 1L && pa == 0L && pb == 10L, s"got ($n, $pa, $pb)")
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("incremental dedup: incoming batch doc flagged against the corpus, corpus never self-pairs") {
    // incoming split = doc_id % 10 == 0 → only doc 0; corpus = 1..4.
    // doc 0 is an exact dup of corpus doc 1 → flagged with est 1.0;
    // corpus-internal pair (2,3) must NOT appear (not incoming).
    val got = Dedup.dedupIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L))
    val (dupOf, nDups, bestEst) = got(0L)
    assert(dupOf == 1L && nDups == 1L && bestEst == 1.0)
  }

  test("normalized dedup groups case/punctuation/whitespace variants") {
    val d = Files.createTempDirectory("graft-normdedup").toString
    Seq(
      (0L, "Hello, World!"),
      (1L, "hello world"),
      (2L, "  hello   world  "),
      (3L, "entirely different document"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.normDedup(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(got(0L) == ((0L, 3L, 0)), "canonical survivor of the variant group")
    assert(got(1L) == ((0L, 3L, 1)) && got(2L) == ((0L, 3L, 1)), "variants marked dup")
    assert(got(3L) == ((3L, 1L, 0)), "singleton untouched")
  }

  test("rolling hash: deterministic, shift-sensitive") {
    assert(TextOps.rollingHash64("abc") == TextOps.rollingHash64("abc"))
    assert(TextOps.rollingHash64("abc") != TextOps.rollingHash64("acb"))
  }

  test("source_overlap_report: cells account for every truth pair; planted cross/self dup attribute correctly") {
    val sf = "/root/testdata/sf0.01"
    val cells = Dedup.sourceOverlapReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val truthN = Dedup.dedupJaccardPrefix(spark, sf).count()
    assert(cells.map(_._3).sum == truthN, "matrix must account for every truth pair")
    cells.foreach { case (s1, s2, n, mj, mx) =>
      assert(s1 <= s2, "unordered attribution: source_1 <= source_2")
      assert(n > 0 && mj >= Dedup.PrefixTau && mx >= mj && mx <= 1.0, s"($s1,$s2,$n,$mj,$mx)")
    }

    // planted: one cross-source mirror pair + one within-source dup
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val txtA = (1 to 30).map(i => s"a$i").mkString(" ")
    val txtB = (1 to 30).map(i => s"b$i").mkString(" ")
    val rows = java.util.Arrays.asList(
      Row(1L, txtA, "en", "dump_x", 0L), Row(2L, txtA, "en", "dump_y", 0L),
      Row(3L, txtB, "en", "dump_x", 0L), Row(4L, txtB, "en", "dump_x", 0L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    spark.createDataFrame(new java.util.ArrayList[Row](rows), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Dedup.sourceOverlapReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(planted.keySet == Set(("dump_x", "dump_y"), ("dump_x", "dump_x")),
      s"got ${planted.keySet}")
    assert(planted(("dump_x", "dump_y")) == ((1L, 1.0)), "cross-source mirror cell")
    assert(planted(("dump_x", "dump_x")) == ((1L, 1.0)), "self-duplication cell")
  }

  test("minhash_perm_sweep: grid total, error shrinks with k, exact duplicates at zero error") {
    val got = Dedup.minhashPermSweep(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Dedup.PermGrid.map(_.toLong), "grid totality, ordered")
    assert(got.map(_._2).distinct.length == 1 && got.head._2 > 0,
      "every grid point scores the same truth pairs")
    got.foreach { case (_, _, mae, mx) =>
      assert(mae >= 0 && mae <= 1 && mx >= mae, s"bounds: mae=$mae max=$mx")
    }
    // E[|est−J|] ~ sqrt(J(1−J)/k): quadrupling k should halve MAE —
    // assert the weak form (non-increasing with slack) so a small
    // truth set can't flake the statistical claim
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 0.005, s"MAE must not grow with k: $a -> $b")
    }

    // planted exact duplicates: J = 1 and every signature prefix
    // matches fully, so the error is EXACTLY zero at every k
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-perm").toString
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val rows = java.util.Arrays.asList(
      Row(1L, txt, "en", "s", 0L), Row(2L, txt, "en", "s", 0L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(new java.util.ArrayList[Row](rows), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Dedup.minhashPermSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(planted.forall(r => r._2 == 1 && r._3 == 0.0 && r._4 == 0.0),
      s"identical docs must estimate at zero error: ${planted.toSeq}")
  }

  test("lsh_band_sweep: grid total, bounds hold, candidates grow with band count") {
    val rows = Dedup.lshBandSweep(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq == Dedup.SweepBandings.map(_.toLong))
    rows.foreach { case (b, rpb, nTrue, nPred, tp, prec, rec) =>
      assert(b * rpb == Dedup.NumHashes.toLong)
      assert(tp <= nPred && tp <= nTrue)
      assert(prec >= 0.0 && prec <= 1.0 && rec >= 0.0 && rec <= 1.0)
    }
    // aligned slicing: an r-row band agreement implies agreement on
    // its sub-bands, so more bands can only add candidates (no
    // fixture bucket reaches the skew cap)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4, s"candidate monotone: ${rows.toSeq}")
      case _ =>
    }
  }

  test("dedup_cap_report: quiet corpus reports zero capping; a planted mega-bucket counts in every family") {
    val quiet = Dedup.dedupCapReport(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(quiet.keySet ==
      Set("minhash_band", "shingle", "simhash_band", "span", "winnow"))
    quiet.foreach { case (f, (nb, nc, ric, frac)) =>
      // span/winnow need ≥20-word docs; their 0-bucket rows are the
      // totality guarantee at work, not an error
      if (Set("minhash_band", "shingle", "simhash_band")(f))
        assert(nb > 0, s"$f has buckets on the planted corpus")
      assert(nc == 0 && ric == 0 && frac == 0.0, s"$f spuriously capped: $nc/$ric")
    }
    // MaxPosting + 2 identical 20-word docs: one mega-bucket in every
    // family — the report must COUNT what the detectors silently drop
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val hotDir = Files.createTempDirectory("graft-capreport").toString
    (1L to (Dedup.MaxPosting + 2).toLong).map(i => (i, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$hotDir/documents.parquet")
    val hot = Dedup.dedupCapReport(spark, hotDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    hot.foreach { case (f, (nc, ric)) =>
      assert(nc >= 1, s"$f must count its capped bucket")
      assert(ric >= Dedup.MaxPosting + 2L, s"$f rows_in_capped = $ric")
    }
  }

  test("capBuckets: a planted mega-bucket is eliminated BEFORE any member list materializes") {
    val hot = (1 to Dedup.MaxPosting + 7).map(i => ("hot", i.toLong))
    val ok = Seq(("ok", 1L), ("ok", 2L), ("ok", 3L))
    val solo = Seq(("solo", 9L))
    val df = (hot ++ ok ++ solo).toDF("k", "v")
    val agged = Dedup.capBuckets(df, Seq("k"))
      .groupBy("k").agg(sort_array(collect_list(col("v"))).as("members"))
    val got = agged.collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    assert(got == Seq(("ok", Seq(1L, 2L, 3L))),
      s"mega-bucket and singleton must be dropped: $got")
    // order pin (the 100 TB OOM guard this shape exists for): the cap
    // filter is a DESCENDANT of the member aggregate in the plan tree
    // — children print after parents, so the bucket_n cap must appear
    // after collect_list — meaning no member list is ever built for a
    // bucket the cap rejects
    val full = agged.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    val aggIdx = plan.indexOf("collect_list")
    val capIdx = plan.indexOf("bucket_n")
    assert(aggIdx >= 0 && capIdx >= 0 && aggIdx < capIdx,
      s"cap must sit below the member aggregate: $plan")
    // the member aggregate reuses the cap window's hash exchange —
    // the pre-cap costs zero extra shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"groupBy must reuse the window exchange: $plan")
  }

  test("substr_dedup: an off-grid copied passage is cut where block dedup is blind; canonical copy survives") {
    // a 16-word passage at word offset 7 in doc 10 and offset 3 in
    // doc 11: the alignments differ and neither is a multiple of the
    // 10-word block grid, so line_dedup's fixed blocks all hash
    // uniquely — only the stride-1 sliding windows see the copy
    val passage = (1 to 16).map(i => s"p$i")
    val d10 = (1 to 7).map(i => s"a$i") ++ passage ++ (1 to 7).map(i => s"b$i")
    val d11 = (1 to 3).map(i => s"c$i") ++ passage ++ (1 to 11).map(i => s"d$i")
    val d12 = (1 to 30).map(i => s"e$i")
    // self-repetition: the same 15 words twice back-to-back — the
    // second copy must cut, the first must survive
    val rep = (1 to 15).map(i => s"r$i")
    val d13 = rep ++ rep
    val sdir = Files.createTempDirectory("graft-substr").toString
    Seq((10L, d10.mkString(" ")), (11L, d11.mkString(" ")),
        (12L, d12.mkString(" ")), (13L, d13.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val got = Dedup.substrDedup(spark, sdir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got(10L)._2 == 0L, s"canonical doc must survive untouched: ${got(10L)}")
    assert(got(12L)._2 == 0L, s"unrelated doc untouched: ${got(12L)}")
    assert(got(11L)._2 == 16L, s"the whole copied passage must cut as one merged run: ${got(11L)}")
    assert(got(13L)._2 == 15L, s"the second self-repeat must cut: ${got(13L)}")
    // byte-exact rebuilds
    val expect11 = ((1 to 3).map(i => s"c$i") ++ (1 to 11).map(i => s"d$i")).mkString(" ")
    val expect13 = rep.mkString(" ")
    assert(got(11L)._3 == graft.functions.CrossHash.md5Hash60(expect11), "doc 11 rebuild")
    assert(got(13L)._3 == graft.functions.CrossHash.md5Hash60(expect13), "doc 13 rebuild")
    // the blindness claim, asserted not assumed: block-grid dedup
    // removes NOTHING from this corpus
    val ld = graft.ops.Curation.lineDedup(spark, sdir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ld.values.forall(_ == 0L), s"line_dedup must be blind to off-grid copies: $ld")
  }

  test("repetition_scrub: a tail repeating the head is cut (tail only); cross-doc copies untouched; lone coincidence counted not cut") {
    import spark.implicits._
    val head = (1 to 10).map(i => s"h$i")
    // doc 1: tail repeats the head verbatim — the intra-doc case
    // cross-doc dedup is structurally blind to
    val d1 = head ++ (1 to 3).map(i => s"m$i") ++ head
    // docs 2 and 3: EXACT copies of each other, no internal repeats —
    // the intra-doc scrub must not touch either (that's the cross-doc
    // family's job)
    val d2 = (1 to 12).map(i => s"c$i")
    // doc 4: one isolated repeated trigram (span 3 < 4): repetition
    // SIGNAL without removal
    val d4 = Seq("q1", "q2", "q3") ++ (1 to 5).map(i => s"z$i") ++
      Seq("q1", "q2", "q3") ++ Seq("tail1", "tail2")
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")),
        (3L, d2.mkString(" ")), (4L, d4.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.repetitionScrub(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 23 words; the repeated head's windows are positions
    // 13..20 (8 repeated trigram windows), island spans 10 ≥ 4 →
    // exactly the 10-word tail copy is cut; the HEAD copy survives
    assert(got(1L)._1 == 23L && got(1L)._2 == 8L && got(1L)._3 == 10L,
      s"tail copy (only) must be cut keep-first: ${got(1L)}")
    // rebuilt text = head ++ m1..m3, byte-exact
    val expect1 = (head ++ (1 to 3).map(i => s"m$i")).mkString(" ")
    assert(got(1L)._4 == expect1.length.toLong, s"byte-exact rebuild: ${got(1L)}")
    // cross-doc duplicates: zero signal, zero removal, in BOTH copies
    Seq(2L, 3L).foreach { id =>
      assert(got(id) == ((12L, 0L, 0L, d2.mkString(" ").length.toLong)),
        s"cross-doc copies are out of scope for the intra-doc scrub: ${got(id)}")
    }
    // doc 4: 13 words, exactly one repeated trigram window, nothing cut
    assert(got(4L)._2 == 1L && got(4L)._3 == 0L,
      s"an isolated coincidence is signal, not removal: ${got(4L)}")
    // and the cross-doc maximal scrub is the complement: it pairs
    // docs 2/3 but cannot see doc 1's internal repeat (atom 8 > the
    // repeated run? no — it CAN see long internal repeats; what it
    // cannot do is fire when no other doc shares the text and the
    // run is under ITS atom grain: doc 4's trigram)
    val mx = Dedup.substrDedupMaximal(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(mx(4L) == 0L,
      s"the 8-word cross-doc grain is blind to a trigram repeat: $mx")
  }

  test("substr_dedup_maximal: a 14-word copy invisible to the fixed 15-word grid is cut exactly; sub-threshold runs survive") {
    // P is 14 words: no 15-word window fits inside it, so substr_dedup
    // is PROVABLY blind; the maximal variant detects with 8-word atoms
    // and removes the merged island (span 14 >= 12)
    val p = (1 to 14).map(i => s"p$i")
    val d20 = (1 to 5).map(i => s"a$i") ++ p ++ (1 to 5).map(i => s"b$i")
    val d21 = (1 to 4).map(i => s"c$i") ++ p ++ (1 to 8).map(i => s"d$i")
    // Q is 11 words (>= atom 8, < threshold 12): detected but NOT removed
    val q = (1 to 11).map(i => s"q$i")
    val d22 = (1 to 6).map(i => s"e$i") ++ q ++ (1 to 6).map(i => s"f$i")
    val d23 = (1 to 9).map(i => s"g$i") ++ q ++ (1 to 3).map(i => s"h$i")
    val sdir = Files.createTempDirectory("graft-substr-max").toString
    Seq((20L, d20.mkString(" ")), (21L, d21.mkString(" ")),
        (22L, d22.mkString(" ")), (23L, d23.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    // the blindness claim, asserted not assumed
    val fixed = Dedup.substrDedup(spark, sdir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed.values.forall(_ == 0L),
      s"the 15-word grid must be blind to a 14-word copy: $fixed")
    val got = Dedup.substrDedupMaximal(spark, sdir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got(20L)._1 == 0L, s"canonical copy survives untouched: ${got(20L)}")
    assert(got(21L)._1 == 14L, s"the whole 14-word copy cuts as one island: ${got(21L)}")
    assert(got(22L)._1 == 0L && got(23L)._1 == 0L,
      s"an 11-word run is below the 12-word removal threshold: $got")
    val expect21 = ((1 to 4).map(i => s"c$i") ++ (1 to 8).map(i => s"d$i")).mkString(" ")
    assert(got(21L)._2 == graft.functions.CrossHash.md5Hash60(expect21),
      "byte-exact rebuild of the scrubbed doc")
  }

  test("substr_dedup_maximal: seeded fuzz vs a naive reference (independent survivorship + islands + scrub)") {
    // corpora built from a small pool of shared passages interleaved
    // with doc-unique noise — duplicated runs of many lengths, at all
    // alignments, overlapping — checked against a from-scratch
    // reference that never touches the engine's window/hash/scrub code
    val rnd = new scala.util.Random(42)
    val passages = (1 to 8).map { p =>
      (1 to (5 + rnd.nextInt(20))).map(j => s"p${p}x$j")
    }
    val docs = (0L until 24L).map { id =>
      val parts = (1 to 4).map { k =>
        if (rnd.nextBoolean()) passages(rnd.nextInt(passages.length))
        else (1 to (3 + rnd.nextInt(6))).map(j => s"n${id}u${k}v$j")
      }
      (id, parts.flatten.mkString(" "))
    }
    val L0 = Dedup.MaximalAtomWords
    val T = Dedup.MaximalMinSpanWords
    // naive reference
    val words = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val byWin = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[(Long, Int)]]()
    for ((id, w) <- docs.map(d => d._1 -> words(d._1)); i <- 0 to w.length - L0)
      byWin.getOrElseUpdate(w.slice(i, i + L0).mkString(" "),
        scala.collection.mutable.ArrayBuffer()) += ((id, i))
    val bad = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    for ((_, occs) <- byWin if occs.length > 1) {
      val mn = occs.minBy(identity)
      for (o <- occs if o != mn)
        bad.getOrElseUpdate(o._1, scala.collection.mutable.Set()) += o._2
    }
    val expect = docs.map { case (id, _) =>
      val w = words(id)
      val ps = bad.getOrElse(id, Set.empty[Int]).toSeq.sorted
      // group consecutive positions into islands
      val islands = ps.foldLeft(List.empty[List[Int]]) {
        case (acc @ (cur :: rest), p) if p == cur.head + 1 => (p :: cur) :: rest
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      val ivs = islands.map(isl => (isl.head, isl.last + L0 - 1))
        .filter { case (s, e) => e - s + 1 >= T }
      val covered = Array.fill(w.length)(false)
      for ((s, e) <- ivs; i <- s to math.min(e, w.length - 1)) covered(i) = true
      val clean = w.indices.filterNot(covered).map(w).mkString(" ")
      val cleanWords = if (clean == "") 0 else clean.split(" ", -1).length
      id -> ((w.length.toLong, (w.length - cleanWords).toLong,
        graft.functions.CrossHash.md5Hash60(clean)))
    }.toMap
    val fdir = Files.createTempDirectory("graft-substr-fuzz").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val got = Dedup.substrDedupMaximal(spark, fdir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    for (id <- expect.keys.toSeq.sorted)
      assert(got(id) == expect(id), s"doc $id: engine ${got(id)} vs reference ${expect(id)}")
    assert(expect.values.exists(_._2 > 0), "fuzz corpus must exercise removals")
    assert(expect.values.exists(_._2 == 0), "fuzz corpus must keep some docs untouched")
  }

  test("substr_threshold_sweep: the span distribution makes the recall knob visible; grid-total when empty") {
    // one 14-word copy and one disjoint 8-word copy: thresholds at or
    // under each span count it, above it lose it — the cliff between
    // 12 and 15 is exactly what the fixed 15-word grid hides
    val p = (1 to 14).map(i => s"p$i")
    val q = (1 to 8).map(i => s"q$i")
    val d30 = (1 to 5).map(i => s"a$i") ++ p ++ (1 to 4).map(i => s"b$i") ++ q
    val d31 = (1 to 3).map(i => s"c$i") ++ p ++ (1 to 6).map(i => s"d$i")
    val d32 = (1 to 9).map(i => s"e$i") ++ q ++ (1 to 8).map(i => s"f$i")
    val sdir = Files.createTempDirectory("graft-substr-sweep").toString
    Seq((30L, d30.mkString(" ")), (31L, d31.mkString(" ")), (32L, d32.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val got = Dedup.substrThresholdSweep(spark, sdir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(8) == ((2L, 22L)), s"both copies clear 8: $got")
    assert(got(10) == ((1L, 14L)) && got(12) == ((1L, 14L)),
      s"only the 14-word copy clears 10/12: $got")
    assert(got(15) == ((0L, 0L)) && got(20) == ((0L, 0L)),
      s"nothing clears the 15-word grid — the silent recall loss, measured: $got")
    // cross-op consistency: the sweep's removable words at the
    // maximal op's own threshold ARE the words that op removes
    val removed = Dedup.substrDedupMaximal(spark, sdir).collect()
      .map(_.getLong(2)).sum
    assert(got(Dedup.MaximalMinSpanWords)._2 == removed,
      s"sweep@${Dedup.MaximalMinSpanWords} (${got(Dedup.MaximalMinSpanWords)._2}) " +
        s"must equal the maximal scrub's removals ($removed)")
    // grid totality on a duplicate-free corpus
    val clean = Files.createTempDirectory("graft-substr-sweep0").toString
    Seq((0L, (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$clean/documents.parquet")
    val zero = Dedup.substrThresholdSweep(spark, clean).collect()
    assert(zero.length == 5 && zero.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      s"grid-total zeros: ${zero.toSeq}")
  }

  test("substr scrub kernel: string_split parity on leading/trailing whitespace, byte-exact") {
    // splitWords must mirror DuckDB string_split exactly: Java's
    // default split drops trailing empties and the old sb.nonEmpty
    // separator rule swallowed a kept leading empty token
    assert(Dedup.splitWords(" a b").toSeq == Seq("", "a", "b"))
    assert(Dedup.splitWords("a b ").toSeq == Seq("a", "b", ""))
    assert(Dedup.splitWords("a  b").toSeq == Seq("a", "", "b"))
    assert(Dedup.splitWords("").toSeq == Seq(""))
    // no removals → the rebuild is the identity, byte for byte
    for (t <- Seq(" a b c", "a b c ", "  ", "a  b", " ")) {
      assert(Dedup.scrubWords(t, Nil, 2) == t, s"identity rebuild of '$t'")
    }
    // removing interior words of a leading-space doc keeps the
    // leading empty token AND its separator byte
    assert(Dedup.scrubWords(" a b c", Seq(1), 2) == " c",
      "kept leading empty token must still separate from the next survivor")
    // window streams must count string_split words: a trailing space
    // adds one (empty) word and so one more window
    assert(Dedup.windowHashes("a b ", 3).length == 1)
    assert(Dedup.windowHashes("a b", 3).length == 0)
  }

  test("memorization_report: verbatim-duplicated docs top the ranking at dup_frac 1; unique docs at 0") {
    val twin = (1 to 20).map(i => s"m$i").mkString(" ")
    val uniq = (1 to 20).map(i => s"u$i").mkString(" ")
    val mdir = Files.createTempDirectory("graft-memorization").toString
    Seq((0L, twin), (1L, twin), (2L, uniq)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$mdir/documents.parquet")
    val got = Dedup.memorizationReport(spark, mdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 20 words → 6 fifteen-word windows each; the twins' all dup
    assert(got.take(2).map(_._1).toSet == Set(0L, 1L), s"twins must rank first: ${got.toSeq}")
    got.take(2).foreach { case (_, nw, nd, f) =>
      assert(nw == 6L && nd == 6L && f == 1.0, s"full duplication: ${got.toSeq}")
    }
    assert(got(2) == ((2L, 6L, 0L, 0.0)), s"unique doc reports zero: ${got.toSeq}")
  }

  test("capBuckets: a 10^6-row mega-bucket SPILLS through the window buffer and completes") {
    // Converts the "spillable row buffer" claim from comment to test:
    // with the window buffer thresholds forced down to a few thousand
    // rows (stand-in for a memory-starved executor), the 10^6-row
    // bucket must route through ExternalAppendOnlyUnsafeRowArray's
    // disk-spill path — asserted via task spill metrics — and the cap
    // must still drop it exactly, with the quiet buckets untouched.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import java.util.concurrent.atomic.AtomicLong
    val spilled = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        ()
      }
    }
    val conf = spark.conf
    val keys = Seq("spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    spark.sparkContext.addSparkListener(listener)
    try {
      conf.set(keys(0), "1024")
      conf.set(keys(1), "4096")
      val df = spark.range(1000000L).select(lit("hot").as("k"), col("id").as("v"))
        .union(Seq(("ok", 1L), ("ok", 2L)).toDF("k", "v"))
      val t0 = System.nanoTime()
      val got = Dedup.capBuckets(df, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val secs = (System.nanoTime() - t0) / 1e9
      assert(got == Seq(("ok", 2L)), s"mega-bucket must be capped away: $got")
      // listener delivery is async — poll briefly before judging
      val deadline = System.currentTimeMillis() + 15000
      while (spilled.get() == 0L && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(spilled.get() > 0L,
        s"the 10^6-row bucket must exercise the disk-spill path " +
          s"(thresholds 1024/4096 rows); spilled=${spilled.get()}")
      info(f"mega-bucket spilled ${spilled.get()} bytes, completed in $secs%.2f s")
      assert(secs < 120.0, s"spill path must complete promptly: $secs s")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }

  test("homoglyph_dedup: catches a Cyrillic/zero-width spoof that norm_dedup provably misses") {
    // doc 1 spoofs doc 0 with Cyrillic а/е/о lookalikes and a
    // zero-width space hidden inside 'data'; doc 2 is unrelated.
    // norm_dedup's [^a-z0-9] rule turns each Cyrillic letter into a
    // SPACE, so the normal forms differ and it cannot group them.
    val plain = "clean data table scan merge order"
    val spoof = "cleаn da​tа tablе scan mеrge оrder"
    val hdir = Files.createTempDirectory("graft-homoglyph").toString
    Seq((0L, plain), (1L, spoof), (2L, "other words entirely here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$hdir/documents.parquet")
    val hg = Dedup.homoglyphDedup(spark, hdir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(hg(0L) == ((0L, 2L, 0)), s"canonical copy: $hg")
    assert(hg(1L) == ((0L, 2L, 1)), s"spoof must collapse onto doc 0: $hg")
    assert(hg(2L) == ((2L, 1L, 0)), s"unrelated doc untouched: $hg")
    val nd = Dedup.normDedup(spark, hdir).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(nd.values.forall(_ == 0), s"norm_dedup must be blind to the spoof: $nd")
  }

  test("soft_dedup_weights: near-dup components split unit weight; singletons keep 1.0") {
    // fixture components: {0,1} (exact pair) and {2,3} (near pair);
    // doc 4 is in no component
    val got = Dedup.softDedupWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L), "total: one row per doc")
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      val (_, nc, w, _) = got(id)
      assert(nc == 2L && w == 0.5, s"pair members weigh 1/2: $got")
    }
    val (nw4, nc4, w4, eff4) = got(4L)
    assert(nc4 == 1L && w4 == 1.0 && eff4 == nw4.toDouble, s"singleton keeps full weight: $got")
    // doc 0 has 10 words → contributes 5 effective words
    assert(got(0L)._1 == 10L && got(0L)._4 == 5.0, s"effective words halve: $got")
  }

  test("memorization_spans: consecutive duplicated windows merge to the passage length") {
    // pA (25 words) shared by docs 0, 1, 2; pB (15 words) shared by
    // docs 2, 3. Doc 2 carries BOTH → two islands, longest = pA's.
    val pA = (1 to 25).map(i => s"a$i").mkString(" ")
    val pB = (1 to 15).map(i => s"b$i").mkString(" ")
    def fill(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val mdir = Files.createTempDirectory("graft-memspan").toString
    Seq(
      (0L, s"${fill("f", 30)} $pA"),
      (1L, s"${fill("g", 7)} $pA"),
      (2L, s"$pA ${fill("h", 20)} $pB"),
      (3L, s"$pB ${fill("k", 16)}"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$mdir/documents.parquet")
    val got = Dedup.memorizationSpans(spark, mdir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a 25-word passage = 11 consecutive duplicated 15-word windows
    assert(got(0L) == ((1L, 11L, 25L)), s"doc 0: one 25-word span: $got")
    assert(got(1L) == ((1L, 11L, 25L)), s"doc 1: same span at a different offset: $got")
    assert(got(2L) == ((2L, 11L, 25L)), s"doc 2: two islands, longest 25: $got")
    assert(got(3L) == ((1L, 1L, 15L)), s"doc 3: the 15-word passage alone: $got")
  }

  test("dedup_funnel: tiers apply in sequence and components re-elect still-alive survivors") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val fdir = Files.createTempDirectory("graft-funnel").toString
    Seq(
      (0L, base),                       // exact pair with 1
      (1L, base),                       //   removed at the exact tier
      (2L, "Hello, World Friends"),     // case/punct variant of 3
      (3L, "hello world friends"),      //   removed at the norm tier
      (4L, base.replace("twelve", "thirteen")), // near-dup of 0/1 → component
      (5L, "completely different words about cats dogs birds fish mice"),
      (6L, "another unrelated document with its own content words here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val got = Dedup.dedupFunnel(spark, fdir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((0, "raw"), (1, "exact"), (2, "normalized"), (3, "neardup")), s"$got")
    val byTier = got.map(t => t._2 -> ((t._3, t._5))).toMap
    assert(byTier("raw") == ((7L, 0L)), s"raw counts all docs: $got")
    assert(byTier("exact") == ((6L, 1L)), s"exact removes doc 1: $got")
    assert(byTier("normalized") == ((5L, 1L)), s"norm removes doc 3: $got")
    // the near-dup component is {0,1,4}; its global min 0 is still
    // alive, so only doc 4 falls at the near-dup tier — doc 0 must
    // NOT be double-removed
    assert(byTier("neardup") == ((4L, 1L)), s"neardup removes doc 4 only: $got")
    // word accounting: every kept doc's words are counted
    val words = got.map(t => t._2 -> t._4).toMap
    assert(words("raw") > words("exact") && words("exact") > words("normalized")
      && words("normalized") > words("neardup"), s"word funnel monotone: $got")
  }

  test("repetition_scrub_coarse: the 8/12 grain cuts only long self-copies — fine and coarse provably disagree both ways") {
    import spark.implicits._
    val h10 = (1 to 10).map(i => s"h$i")
    val h14 = (1 to 14).map(i => s"g$i")
    val mid = (1 to 3).map(i => s"m$i")
    // doc 1: tail replays a 10-word head — coarse SIGNAL (3 repeated
    // 8-gram windows, run span 10 < 12) but NO cut; the fine grain
    // cuts the whole 10-word replay
    val d1 = h10 ++ mid ++ h10
    // doc 2: tail replays a 14-word head — span 14 >= 12, the coarse
    // grain cuts exactly the replay (both grains agree here)
    val d2 = h14 ++ mid ++ h14
    // doc 3: a scattered 4-word phrase repeat — fine cuts it (span 4),
    // coarse is structurally blind (no repeated 8-gram exists)
    val d3 = Seq("q1", "q2", "q3", "q4") ++ (1 to 5).map(i => s"z$i") ++
      Seq("q1", "q2", "q3", "q4") ++ Seq("t1", "t2")
    val dir = java.nio.file.Files.createTempDirectory("graft-repc").toString
    Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")), (3L, d3.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // (n_rep_windows, n_removed, clean_h)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    val coarse = rows(Dedup.repetitionScrubCoarse(spark, dir))
    val fine = rows(Dedup.repetitionScrub(spark, dir))
    // doc 1: coarse = signal without removal; fine removes 10 words
    assert(coarse(1L)._1 == 3L && coarse(1L)._2 == 0L,
      s"10-word replay is coarse signal, not a coarse cut: ${coarse(1L)}")
    assert(fine(1L)._2 == 10L, s"the fine grain cuts the replay: ${fine(1L)}")
    assert(coarse(1L)._3 != fine(1L)._3, "grains must provably disagree on doc 1")
    // doc 2: coarse cuts exactly the 14-word replay, byte-exact
    assert(coarse(2L)._1 == 7L && coarse(2L)._2 == 14L, s"${coarse(2L)}")
    val expect2 = (h14 ++ mid).mkString(" ")
    assert(coarse(2L)._3 == graft.functions.CrossHash.md5Hash60(expect2),
      "keep-first byte-exact rebuild at the coarse grain")
    // doc 3: coarse is blind to a short-period repeat the fine cuts
    assert(coarse(3L) == ((0L, 0L, graft.functions.CrossHash.md5Hash60(d3.mkString(" ")))),
      s"no repeated 8-gram exists in doc 3: ${coarse(3L)}")
    assert(fine(3L)._2 == 4L, s"fine cuts the scattered phrase: ${fine(3L)}")
  }

  test("substr_scrub_incremental takes EXPLICIT batch/corpus relations — ids chosen to BREAK the %10 fixture convention") {
    import spark.implicits._
    val passage = (1 to 16).map(i => s"s$i")
    // corpus doc 20 (%10 == 0: would be "batch" under the fixture
    // split) carries the passage; batch doc 7 (%10 != 0) embeds it
    // at a different offset plus its own 15-word window
    val corpus = Seq(
      (20L, (passage ++ (1 to 4).map(i => s"a$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val own = (1 to 15).map(i => s"own$i")
    val batch = Seq(
      (7L, ((1 to 3).map(i => s"b$i") ++ passage ++ own).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.substrScrubIncrementalOf(batch, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.keySet == Set(7L), "only batch docs are scrubbed/reported")
    assert(got(7L)._1 == 34L && got(7L)._2 == 16L,
      s"exactly the corpus passage is cut from the batch doc: ${got(7L)}")
    val expect = ((1 to 3).map(i => s"b$i") ++ own).mkString(" ")
    assert(got(7L)._3 == graft.functions.CrossHash.md5Hash60(expect),
      "byte-exact rebuild; the doc's OWN 15-word window survives")
  }

  test("dedup_incremental takes EXPLICIT batch/corpus relations — ids chosen to BREAK the %10 fixture convention") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"v$i").mkString(" ")
    val corpus = Seq((20L, text), (30L, other)).toDF("doc_id", "text")
    val batch = Seq((7L, text), (9L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.dedupIncrementalOf(batch, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((7L, 20L, 1L, 1.0)),
      s"batch doc 7 matches corpus doc 20 exactly; the unrelated batch doc reports nothing: ${got.toSeq}")
  }

  test("the registered incremental forms ARE the explicit forms under the %10 fixture split") {
    val sf = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val regScrub = Dedup.substrScrubIncremental(spark, sf).collect().toSeq
    val ofScrub = Dedup.substrScrubIncrementalOf(
      d.filter(col("doc_id") % 10 === 0), d.filter(col("doc_id") % 10 =!= 0))
      .collect().toSeq
    assert(regScrub == ofScrub)
    val regDedup = Dedup.dedupIncremental(spark, sf).collect().toSeq
    val ofDedup = Dedup.dedupIncrementalOf(
      d.filter(col("doc_id") % 10 === 0), d.filter(col("doc_id") % 10 =!= 0))
      .collect().toSeq
    assert(regDedup == ofDedup)
  }

  test("repetition_grain_sweep: explicit-grid totality on an empty corpus, monotone signal down the grid, and grid rows equal the registered scrubs' totals") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val zeroed = Dedup.repetitionGrainSweepOf(empty).collect()
    assert(zeroed.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Dedup.RepetitionSweepGrid.map { case (a, m) => (a, m) },
      "an empty corpus must still report the FULL grid")
    assert(zeroed.forall(r => (2 to 5).forall(r.getLong(_) == 0L)))
    // planted corpus with signal at every grain (a replayed 14-word
    // head) plus fine-only signal (a scattered 4-word phrase)
    val h14 = (1 to 14).map(i => s"g$i")
    val docs = Seq(
      (1L, (h14 ++ Seq("m1", "m2") ++ h14).mkString(" ")),
      (2L, ("e1 f2 e3 " + "echo foxtrot golf hotel zz1 zz2 echo foxtrot golf hotel")),
      (3L, (1 to 25).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.repetitionGrainSweepOf(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // signal is non-increasing in atom size (every repeated k-gram
    // contains a repeated shorter gram at the same position)
    val ordered = Dedup.RepetitionSweepGrid.map(got(_))
    assert(ordered.sliding(2).forall { case Seq(a, b) => a._1 >= b._1 && a._2 >= b._2 },
      s"n_docs_signal / n_rep_windows must be monotone down the grid: $ordered")
    // the (8,12) row IS repetition_scrub_coarse's totals; (3,4) IS
    // repetition_scrub's — the sweep and the registered scrubs can't drift
    val dir = java.nio.file.Files.createTempDirectory("graft-rgsw").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def totals(df: org.apache.spark.sql.DataFrame) = df.collect()
      .foldLeft((0L, 0L, 0L, 0L)) { (t, r) =>
        (t._1 + (if (r.getLong(2) > 0) 1L else 0L), t._2 + r.getLong(2),
         t._3 + (if (r.getLong(3) > 0) 1L else 0L), t._4 + r.getLong(3))
      }
    assert(got((8, 12)) == totals(Dedup.repetitionScrubCoarse(spark, dir)))
    assert(got((3, 4)) == totals(Dedup.repetitionScrub(spark, dir)))
  }

  test("maximal_scrub_residual: sub-span hits survive the scrub by design and are counted; cut passages leave none") {
    import spark.implicits._
    val p14 = (1 to 14).map(i => s"p$i")   // long copy: cut (span 14 >= 12)
    val s9 = (1 to 9).map(i => s"s$i")     // short copy: flagged, NOT cut
    val corpus = Seq(
      (20L, (p14 ++ Seq("x1", "x2", "x3", "x4", "x5") ++ s9).mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (7L, ((1 to 3).map(i => s"a$i") ++ p14 ++ (1 to 4).map(i => s"b$i") ++
        s9 ++ (1 to 3).map(i => s"c$i")).mkString(" ")),
      (9L, (1 to 10).map(i => s"z$i").mkString(" ")))   // clean control
      .toDF("doc_id", "text")
    val r = Dedup.maximalScrubResidualOf(batch, corpus).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 2L, "both batch docs counted")
    // doc 7: 33 words -> 26 windows; hits = 7 (inside p14) + 2 (inside
    // s9); control doc: 3 windows, 0 hits
    assert(row.getLong(1) == 29L && row.getLong(2) == 9L,
      s"before: ${row.toSeq}")
    // after the cut doc 7 is a3 ++ b4 ++ s9 ++ c3 = 19 words -> 12
    // windows; ONLY the sub-span s9 windows still hit (2); control
    // untouched (3 windows)
    assert(row.getLong(3) == 15L && row.getLong(4) == 2L,
      s"after: ${row.toSeq}")
    assert(row.getDouble(5) == 0.222222, s"residual_frac: ${row.toSeq}")
    // a corpus the batch never touches -> zero everywhere, no division error
    val clean = Dedup.maximalScrubResidualOf(
      batch.filter(col("doc_id") === 9L), corpus).collect()(0)
    assert(clean.getLong(2) == 0L && clean.getLong(4) == 0L
      && clean.getDouble(5) == 0.0)
    // the indexed form reads the persisted corpus index and must
    // equal the inline derivation — including after an append
    // re-inserts duplicate hashes (no double-counted hits)
    spark.sql("DROP TABLE IF EXISTS msr_idx")
    Dedup.writeMaximalIndexOf(corpus, "msr_idx")
    val viaIdx = Dedup.maximalScrubResidualIndexedOf(batch, "msr_idx").collect()(0)
    assert(viaIdx.toSeq == row.toSeq, s"indexed ≡ inline: $viaIdx vs $row")
    Dedup.appendMaximalIndex(corpus, "msr_idx")
    val afterAppend = Dedup.maximalScrubResidualIndexedOf(batch, "msr_idx").collect()(0)
    assert(afterAppend.toSeq == row.toSeq, "duplicate index hashes must not double-count")
  }
}
