package graft

import graft.ops.{Bpe, TokenizerEval, UnigramLm, WordPiece}
import org.scalatest.funsuite.AnyFunSuite

/** The fertility table must be an exact fold of the three proven
  * per-document encodes — and every tokenizer's fertility is ≥ 1
  * (no word encodes to zero pieces). */
class TokenizerEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("three rows, fertility >= 1, totals match the per-doc encodes") {
    val rows = TokenizerEval.tokenizerFertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set("bpe", "unigram", "wordpiece"))
    rows.foreach { case (tok, (nw, np, fert)) =>
      assert(nw > 0 && np >= nw, s"$tok: $np pieces for $nw words")
      assert(fert >= 1.0, s"$tok fertility $fert < 1")
    }
    def tot(df: org.apache.spark.sql.DataFrame, wIdx: Int): (Long, Long) = {
      val rs = df.collect()
      (rs.map(_.getLong(wIdx)).sum, rs.map(_.getLong(wIdx + 1)).sum)
    }
    assert((rows("bpe")._1, rows("bpe")._2) == tot(Bpe.bpeEncode(spark, dir), 1))
    assert((rows("unigram")._1, rows("unigram")._2) == tot(UnigramLm.unigramEncode(spark, dir), 1))
    assert((rows("wordpiece")._1, rows("wordpiece")._2) == tot(WordPiece.wordpieceEncode(spark, dir), 1))
  }

  test("tokenizer_vocab_overlap: counts recover the parent vocabularies; jaccard re-derives from the cells") {
    val dir = "/root/testdata/sf0.001"
    val got = TokenizerEval.tokenizerVocabOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(("bpe", "unigram"), ("bpe", "wordpiece"),
      ("unigram", "wordpiece")), s"all unordered pairs once: ${got.keySet}")
    // sizes recover the parents' distinct SURFACE sets
    val nb = Bpe.bpeMerges(spark, dir).collect()
      .map(r => r.getString(1) + r.getString(2)).toSet.size.toLong
    val nu = UnigramLm.unigramVocab(spark, dir).collect()
      .map(_.getString(0)).toSet.size.toLong
    val nw = WordPiece.wordpieceVocab(spark, dir).collect()
      .map(_.getString(0).stripPrefix("##")).toSet.size.toLong
    assert(got(("bpe", "unigram"))._1 == nb && got(("bpe", "unigram"))._2 == nu)
    assert(got(("unigram", "wordpiece"))._1 == nu && got(("unigram", "wordpiece"))._2 == nw)
    got.foreach { case ((a, b), (na2, nb2, sh, jac)) =>
      assert(sh <= math.min(na2, nb2), s"$a/$b: shared $sh > min($na2, $nb2)")
      val expect = graft.functions.OracleMath.r6d(sh.toDouble / (na2 + nb2 - sh))
      assert(jac == expect, s"$a/$b: jaccard $jac must re-derive from cells ($expect)")
    }
    // the two whitespace-word tokenizers must share substantially
    // more surface units than either shares with BPE's merge regime
    assert(got(("unigram", "wordpiece"))._4 > got(("bpe", "unigram"))._4,
      s"same-regime families must overlap more: $got")
  }

  test("tokenizer_fertility_lang: per-language rows fold back to the corpus totals; byte ratios positive") {
    val dir = "/root/testdata/sf0.001"
    val lang = TokenizerEval.tokenizerFertilityLang(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val corpus = TokenizerEval.tokenizerFertility(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fams = lang.map(_._1._1).distinct.sorted
    assert(fams.toSeq == Seq("bpe", "unigram", "wordpiece"))
    // language-sliced counts must PARTITION each family's corpus
    // totals — nothing dropped, nothing double-counted
    fams.foreach { f =>
      val rows = lang.filter(_._1._1 == f).map(_._2)
      assert((rows.map(_._1).sum, rows.map(_._2).sum) == corpus(f),
        s"$f: per-lang words/pieces must sum to the corpus encode totals")
      rows.foreach { case (w, p, b, fert, bpp) =>
        assert(w > 0 && p >= w && b >= w,
          s"$f: a word is >= 1 piece and >= 1 byte: $rows")
        assert(fert >= 1.0 && bpp > 0.0, s"$f: ratios sane: $rows")
      }
    }
    // every fixture language appears in every family's slice
    val langs = lang.map(_._1._2).distinct.sorted
    fams.foreach { f =>
      assert(lang.filter(_._1._1 == f).map(_._1._2).sorted.toSeq == langs.toSeq,
        s"$f must report every language: $lang")
    }
  }
}
