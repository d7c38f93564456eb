package graft

import graft.embed.HashEmbedder
import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private val e = HashEmbedder.default

  test("deterministic across instances") {
    val e2 = new HashEmbedder(64)
    val t = "spark shuffle join error timeout"
    assert(e.embedOne(t).toSeq == e2.embedOne(t).toSeq)
  }

  test("dimension and unit norm") {
    val v = e.embedOne("the quick brown fox jumps")
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("whitespace-only text → zero vector (quirk Q4 shape)") {
    assert(e.embedOne("   \n\t ").forall(_ == 0.0f))
    assert(e.embedOne("").forall(_ == 0.0f))
  }

  test("different texts → different vectors; similar texts closer than unrelated") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val base = e.embedOne("spark join shuffle partition executor memory")
    val near = e.embedOne("spark join shuffle partition executor disk")
    val far = e.embedOne("banana apple orange grape melon kiwi")
    assert(cos(base, near) > cos(base, far))
  }

  test("case and whitespace normalization") {
    assert(e.embedOne("Hello World").toSeq == e.embedOne("hello   world").toSeq)
  }

  test("batch embed matches single embed") {
    val texts = Seq("a b c", "d e f", "g h i")
    assert(e.embed(texts).map(_.toSeq) == texts.map(t => e.embedOne(t).toSeq))
  }
}
