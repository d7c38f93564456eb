package graft

import graft.ingest.Chunker
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Reference chunker semantics (log-vector index.py:298-319) —
  * goldens for the edge cases SURVEY §5.2 calls out, plus seeded
  * randomized round-trip/shape properties. */
class ChunkerSpec extends AnyFunSuite {

  test("empty content → one empty chunk (pre strip-filter)") {
    assert(Chunker.chunkLines("", 100).toSeq == Seq(""))
  }

  test("single line fitting → one chunk") {
    assert(Chunker.chunkLines("hello", 100).toSeq == Seq("hello"))
  }

  test("greedy packing at exact boundary") {
    // +1 newline accounting per line (index.py:303):
    // chunk_size 10 fits "abcd\nefgh" (4+1 + 4+1 = 10)
    assert(Chunker.chunkLines("abcd\nefgh\nijkl", 10).toSeq ==
      Seq("abcd\nefgh", "ijkl"))
  }

  test("quirk Q5: single oversize line becomes its own oversized chunk") {
    val long = "x" * 500
    val got = Chunker.chunkLines(s"short\n$long\nend", 100)
    assert(got.toSeq == Seq("short", long, "end"))
    assert(got(1).length == 500)
  }

  test("trailing newline preserved in round-trip") {
    val content = "a\nb\n"
    assert(Chunker.chunkLines(content, 100).mkString("\n") == content)
  }

  private def randomContent(rnd: Random): String = {
    val lines = Seq.fill(rnd.nextInt(30)) {
      rnd.nextInt(4) match {
        case 0 => ""
        case 1 => rnd.alphanumeric.take(rnd.nextInt(30)).mkString
        case 2 => rnd.alphanumeric.take(150 + rnd.nextInt(100)).mkString
        case _ => " " * rnd.nextInt(5)
      }
    }
    lines.mkString("\n")
  }

  test("property: lossless round-trip — chunks.mkString(newline) == content") {
    val rnd = new Random(42)
    (1 to 300).foreach { _ =>
      val content = randomContent(rnd)
      val size = 5 + rnd.nextInt(120)
      assert(Chunker.chunkLines(content, size).mkString("\n") == content,
        s"round-trip failed for size=$size content=${content.take(80)}…")
    }
  }

  test("property: every chunk fits OR is a single oversize line") {
    val rnd = new Random(7)
    (1 to 300).foreach { _ =>
      val content = randomContent(rnd)
      val size = 5 + rnd.nextInt(120)
      Chunker.chunkLines(content, size).foreach { c =>
        assert(c.length <= size || !c.contains('\n'))
      }
    }
  }
}
