package graft

import graft.ops.Curation
import org.scalatest.funsuite.AnyFunSuite

/** Bin-packing invariants: BFD vs next-fit on the shared fixture. */
class PackSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def perSource(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> (rows.map(_.getLong(1)).max + 1, rows.map(_.getLong(3)).sum)
      }

  test("BFD never uses more bins than next-fit; both conserve tokens") {
    val nf = perSource(Curation.seqPack(spark, sf))
    val bfd = perSource(Curation.packBfd(spark, sf))
    assert(nf.keySet == bfd.keySet, "same sources packed")
    nf.foreach { case (src, (nfBins, nfToks)) =>
      val (bfdBins, bfdToks) = bfd(src)
      assert(bfdToks == nfToks, s"$src: packing must conserve tokens")
      assert(bfdBins <= nfBins, s"$src: BFD used $bfdBins bins vs next-fit $nfBins")
    }
    // and strictly better somewhere, or the fixture is degenerate —
    // accept equality corpus-wide but require no regression
    assert(bfd.values.map(_._1).sum <= nf.values.map(_._1).sum)
  }

  test("every bin respects capacity; efficiency bounds hold") {
    val bins = Curation.packBfd(spark, sf).collect()
    bins.foreach { r =>
      assert(r.getLong(3) <= Curation.SeqCapacity,
        s"bin over capacity: ${r.toSeq}")
      assert(r.getDouble(4) <= 1.0 + 1e-9)
    }
    val eff = Curation.packEfficiency(spark, sf).collect()
    eff.foreach { r =>
      val (used, lb, overhead) = (r.getLong(1), r.getLong(3), r.getDouble(5))
      assert(used >= lb, s"lower bound violated: ${r.toSeq}")
      assert(overhead >= 1.0 - 1e-9, s"overhead below 1: ${r.toSeq}")
    }
  }

  test("bpe_pack: capacity respected; piece packing needs at least as many windows as whitespace") {
    val bp = graft.ops.Curation.bpePack(spark, sf).collect()
    assert(bp.nonEmpty)
    bp.foreach { r =>
      val (sum, fill) = (r.getLong(3), r.getDouble(4))
      assert(sum <= graft.ops.Curation.SeqCapacity, s"overfull window: $r")
      assert(fill > 0.0 && fill <= 1.0)
    }
    // subword fertility ≥ 1 piece/word ⇒ the piece-metric corpus is
    // at least as large, so next-fit can only need MORE windows
    val bpSeqs = bp.groupBy(_.getString(0)).map { case (_, rs) => rs.length }.sum
    val wsSeqs = graft.ops.Curation.seqPack(spark, sf).collect()
      .groupBy(_.getString(0)).map { case (_, rs) => rs.length }.sum
    assert(bpSeqs >= wsSeqs, s"bpe windows $bpSeqs < whitespace windows $wsSeqs")
  }
}
