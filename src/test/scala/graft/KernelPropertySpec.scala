package graft

import graft.ingest.Chunker
import graft.functions.CrossHash
import graft.ops.Dedup
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pins for the pure row-local kernels — the
  * functions every distributed operator ultimately folds over, so a
  * kernel edge case is a corpus-wide wrong answer. Fixed seed: the
  * suite is deterministic, failures replay. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(label: String, prop: Prop, n: Int = 300): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(0xC0FFEE42L)), prop)
    assert(res.passed, s"$label: $res")
  }

  private val wordGen: Gen[String] =
    Gen.oneOf(Gen.const(""), Gen.identifier.map(_.take(6)),
      Gen.oneOf("a", "b", "c", "dup"))
  private val textGen: Gen[String] =
    Gen.listOf(wordGen).map(_.mkString(" "))

  test("chunkLines: chunks rejoin to the exact input; only single-line chunks may overflow") {
    val contentGen = for {
      lines <- Gen.listOf(Gen.oneOf(
        Gen.const(""), Gen.identifier, Gen.identifier.map(s => s + " " + s)))
      text <- Gen.const(lines.mkString("\n"))
    } yield text
    check("rejoin", Prop.forAll(contentGen, Gen.choose(1, 40)) { (content, size) =>
      val chunks = Chunker.chunkLines(content, size)
      // no line lost, reordered, or split: the greedy packer only
      // moves SEPARATORS, so rejoining reproduces the input bytes
      chunks.mkString("\n") == content
    })
    check("overflow-is-single-line", Prop.forAll(contentGen, Gen.choose(1, 40)) {
      (content, size) =>
        val chunks = Chunker.chunkLines(content, size)
        // reference quirk Q5: a chunk can exceed the budget only when
        // ONE oversize line forced it — never by accumulation
        chunks.filter(c => c.length + 1 > size).forall(!_.contains("\n"))
    })
  }

  test("md5Hash60: equals the first-15-hex-chars law and stays in [0, 2^60)") {
    check("hex-prefix-law", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = CrossHash.md5Hash60(s)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      h == java.lang.Long.parseLong(hex, 16) && h >= 0L && h < (1L << 60)
    })
  }

  test("windowHashes: count law and per-window hash == hash of the joined slice") {
    check("window-law", Prop.forAll(textGen, Gen.choose(1, 6)) { (text, l) =>
      val w = Dedup.splitWords(text)
      val hs = Dedup.windowHashes(text, l)
      val countOk = hs.length == math.max(0, w.length - l + 1)
      val valsOk = hs.indices.forall(i =>
        hs(i) == CrossHash.md5Hash60(w.slice(i, i + l).mkString(" ")))
      countOk && valsOk
    })
  }

  test("scrubWords: equals the brute-force interval cover on every input") {
    val startsGen = Gen.listOf(Gen.choose(0, 30)).map(_.sorted)
    check("cover", Prop.forAll(textGen, startsGen, Gen.choose(1, 5)) {
      (text, starts, l) =>
        val w = Dedup.splitWords(text)
        val covered = starts.flatMap(s => s until (s + l)).toSet
        val expect = w.zipWithIndex.collect {
          case (word, i) if !covered.contains(i) => word
        }.mkString(" ")
        Dedup.scrubWords(text, starts, l) == expect
    })
  }

  test("cleanFromPositions: equals the brute-force islands + min-span cover on every input") {
    val posGen = Gen.listOf(Gen.choose(0, 25)).map(_.distinct.sorted)
    check("maximal-cover", Prop.forAll(textGen, posGen,
      Gen.choose(1, 6), Gen.choose(1, 10)) { (text, badPos, atom, minSpan) =>
      // brute force: consecutive flagged starts form an island; an
      // island [s..last] covers words s .. last+atom-1 and cuts only
      // when its covered length clears the min-span
      val w = Dedup.splitWords(text)
      val islands = badPos.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && p == acc.head.head + 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }
      val covered = islands.flatMap { isl =>
        val s = isl.last; val e = isl.head + atom - 1
        if (e - s + 1 >= minSpan) s to e else Nil
      }.toSet
      val expect = w.zipWithIndex.collect {
        case (word, i) if !covered.contains(i) => word
      }.mkString(" ")
      Dedup.cleanFromPositions(text, badPos, atom, minSpan) == expect
    })
  }

  test("tokenizeWord: pieces always concatenate back to the word; merges never add pieces") {
    val wordG = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val mergesG = Gen.listOf(for {
      a <- Gen.oneOf("a", "b", "c", "d", "ab", "cd", "bc")
      b <- Gen.oneOf("a", "b", "c", "d", "ab", "cd", "bc")
    } yield (a, b))
    check("round-trip", Prop.forAll(wordG, mergesG) { (word, merges) =>
      val pieces = graft.ops.Bpe.tokenizeWord(word, merges)
      pieces.mkString("") == word &&
        pieces.forall(_.nonEmpty) &&
        pieces.length <= word.length
    })
  }

  test("bandKeysOf: Bands keys above the shingle floor, none below; hash cache never changes a value") {
    check("band-law", Prop.forAll(textGen) { text =>
      val keys = Dedup.bandKeysOf(text)
      val n = Dedup.splitWords(text).length
      if (n < Dedup.ShingleK) keys.isEmpty
      else keys.length == Dedup.Bands &&
        keys.sameElements(Dedup.bandKeysOf(text))
    })
    check("cache-law", Prop.forAll(Gen.asciiPrintableStr) { s =>
      // cachedHash60 memoizes md5Hash60 — the cache must be
      // value-transparent or every minhash signature drifts
      graft.ops.Dedup.cachedHash60(s) == CrossHash.md5Hash60(s) &&
        graft.ops.Dedup.cachedHash60(s) == CrossHash.md5Hash60(s)
    })
  }

  test("maximalCleanOf: equals the brute-force cover at the registered 8/12 grain; duplicated positions are inert") {
    val posGen = Gen.listOf(Gen.choose(0, 45)).map(_.sorted)
    val atom = Dedup.MaximalAtomWords
    val minSpan = Dedup.MaximalMinSpanWords
    check("registered-grain-cover", Prop.forAll(textGen, posGen) { (text, badPosDup) =>
      val badPos = badPosDup.distinct
      val w = Dedup.splitWords(text)
      val islands = badPos.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && p == acc.head.head + 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }
      val covered = islands.flatMap { isl =>
        val s = isl.last; val e = isl.head + atom - 1
        if (e - s + 1 >= minSpan) s to e else Nil
      }.toSet
      val expect = w.zipWithIndex.collect {
        case (word, i) if !covered.contains(i) => word
      }.mkString(" ")
      // the registered-grain kernel matches brute force, AND feeding
      // the duplicated list unchanged gives the same answer (the
      // documented defense-in-depth tolerance)
      Dedup.maximalCleanOf(text, badPos) == expect &&
        Dedup.maximalCleanOf(text, badPosDup) == expect
    })
  }

  test("pack folds: per-bin capacity, token/order conservation, BFD never uses more bins than next-fit") {
    val capGen = Gen.choose(5L, 60L)
    val docsGen = Gen.listOf(Gen.choose(0L, 60L)).map(_.zipWithIndex
      .map { case (n, i) => (i.toLong, n) })
    check("next-fit-laws", Prop.forAll(docsGen, capGen) { (raw, cap) =>
      // the caller truncates to capacity before the fold — mirror it
      val docs = raw.map { case (id, n) => (id, math.min(n, cap)) }
      val out = graft.ops.Curation.nextFitPack(docs, cap)
      val conserve = out.map(t => (t._1, t._3)) == docs
      val seqs = out.map(_._2)
      val contiguous = seqs.isEmpty ||
        (seqs.head == 0L && seqs.zip(seqs.tail).forall {
          case (a, b) => b == a || b == a + 1 })
      val capacity = out.groupBy(_._2).values
        .forall(bin => bin.map(_._3).sum <= cap)
      conserve && contiguous && capacity
    })
    check("bfd-laws", Prop.forAll(docsGen, capGen) { (raw, cap) =>
      val docs = raw.map { case (id, n) => (id, math.min(n, cap)) }
      // the caller pre-sorts n DESC, id ASC
      val sorted = docs.sortBy { case (id, n) => (-n, id) }
      val out = graft.ops.Curation.bfdPack(sorted, cap)
      val conserve = out.map(t => (t._1, t._3)) == sorted
      val capacity = out.groupBy(_._2).values
        .forall(bin => bin.map(_._3).sum <= cap)
      val bfdBins = out.map(_._2).distinct.length
      val nfBins = graft.ops.Curation.nextFitPack(docs, cap)
        .map(_._2).distinct.length
      val lower = {
        val tot = docs.map(_._2).sum
        if (tot == 0) 0L else (tot + cap - 1) / cap
      }
      conserve && capacity && bfdBins <= nfBins &&
        (docs.forall(_._2 == 0) || bfdBins >= lower)
    })
  }

  test("bandKeysOf under hostile whitespace: keys are a set function of shingles — multiplicity and repeat count never move them") {
    // empty-string words (double/leading/trailing spaces after a
    // split(' ', -1)) are legal shingle atoms; a single repeated
    // word (incl. the empty word) yields ONE distinct shingle, so
    // ANY repeat count >= ShingleK must produce identical keys
    val wGen = Gen.oneOf("a", "bb", "ccc", "")
    val nGen = Gen.choose(Dedup.ShingleK, 40)
    check("multiplicity-invariance", Prop.forAll(wGen, nGen, nGen) { (w, n, m) =>
      val k1 = Dedup.bandKeysOf(Seq.fill(n)(w).mkString(" "))
      val k2 = Dedup.bandKeysOf(Seq.fill(m)(w).mkString(" "))
      k1.sameElements(k2) && k1.length == Dedup.Bands
    })
  }

  test("repetitionScanAt: deterministic; the cleaned text is a word-subsequence preserving first occurrences") {
    check("subsequence", Prop.forAll(textGen) { text =>
      val (n1, clean1) = Dedup.repetitionScan(text)
      val (n2, clean2) = Dedup.repetitionScan(text)
      val w = Dedup.splitWords(text)
      val cw = Dedup.splitWords(clean1)
      // subsequence check (multiset-order preserving)
      var i = 0
      var ok = true
      cw.foreach { word =>
        while (i < w.length && w(i) != word) i += 1
        if (i >= w.length) ok = false else i += 1
      }
      n1 == n2 && clean1 == clean2 && (clean1.isEmpty || ok)
    })
  }

  test("transitionFold: micro-batch boundary invariance — any in-order split of a user's events emits exactly the single-batch transitions") {
    import graft.streaming.StreamingIndex
    import graft.streaming.StreamingIndex.TransEvent
    // timestamps DRAWN WITH COLLISIONS (small range) so the
    // event_id tie-break is exercised; ids unique by construction
    val evGen = Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.oneOf("a", "b", "c")))
      .map(_.zipWithIndex.map { case ((ts, t), i) =>
        TransEvent(7L, t, ts, i.toLong)
      })
    val cutsGen = Gen.listOf(Gen.choose(0, 40))
    check("boundary-invariance", Prop.forAll(evGen, cutsGen) { (evs, rawCuts) =>
      // the stream source contract: batches arrive in (ts, id) order,
      // so splits cut the SORTED sequence
      val sorted = evs.sortBy(e => (e.ts_us, e.event_id))
      val cuts = rawCuts.map(c => if (sorted.isEmpty) 0 else c % (sorted.length + 1))
        .sorted.distinct
      val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => sorted.slice(a, b) }
      val (single, lastSingle) = StreamingIndex.transitionFold(7L, None, sorted)
      var st: Option[StreamingIndex.LastEvent] = None
      val split = batches.flatMap { b =>
        val (out, st2) = StreamingIndex.transitionFold(7L, st, b)
        st = st2
        out
      }
      // and the emitted pairs are exactly sorted-zip-tail
      val zipped = sorted.zip(sorted.drop(1)).map { case (f, t) =>
        (f.event_type, t.event_type, t.event_id)
      }
      split == single && st == lastSingle &&
        single.map(x => (x.from_type, x.to_type, x.event_id)) == zipped
    })
  }
}
