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
}
