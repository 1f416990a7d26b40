package graft.streaming

import java.util.regex.Pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the CEP streaming twin's core claim: for chain
  * patterns `s1+ s2+ ... s(n-1)+ sn` with distinct stage symbols, the
  * 2-int [[CepDfa]] emits EXACTLY the leftmost non-overlapping match
  * count of the equivalent regex — i.e. the batch operator's
  * `regexp_count`. Random event strings over pattern + noise symbols,
  * every pattern length 1..4, plus a split-point property: folding a
  * sequence in two halves through the carried state equals folding it
  * whole (the micro-batch boundary invariant).
  */
class CepDfaSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 500).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  /** Regex count the way java.util.regex scans: leftmost, non-overlap. */
  private def regexCount(nStages: Int, s: String): Long = {
    val pat = (0 until nStages).map { i =>
      val ch = ('a' + i).toChar
      if (i < nStages - 1) s"$ch+" else s"$ch"
    }.mkString
    val m = Pattern.compile(pat).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def dfaCount(nStages: Int, s: String): Long =
    CepDfa.count(nStages, s.iterator.map { c =>
      val q = c - 'a' + 1
      if (q >= 1 && q <= nStages) q else -1
    })

  test("DFA count equals leftmost non-overlapping regex count on random strings") {
    val gen = for {
      n <- Gen.choose(1, 4)
      len <- Gen.choose(0, 40)
      // alphabet: the n stage chars plus 'x'/'y' noise
      s <- Gen.listOfN(len,
        Gen.oneOf(((0 until n).map(i => ('a' + i).toChar) ++ Seq('x', 'y'))))
    } yield (n, s.mkString)
    forAll(gen) { case (n, s) =>
      assert(dfaCount(n, s) == regexCount(n, s),
        s"stages=$n seq=$s dfa=${dfaCount(n, s)} regex=${regexCount(n, s)}")
    }
  }

  test("carried state across a split equals one whole-sequence fold") {
    val gen = for {
      n <- Gen.choose(1, 4)
      len <- Gen.choose(0, 40)
      cut <- Gen.choose(0, len)
      s <- Gen.listOfN(len,
        Gen.oneOf(((0 until n).map(i => ('a' + i).toChar) ++ Seq('x'))))
    } yield (n, s.mkString, cut)
    def stages(nStages: Int, s: String) = s.map { c =>
      val q = c - 'a' + 1
      if (q >= 1 && q <= nStages) q else -1
    }
    forAll(gen) { case (n, s, cut) =>
      val (l, r) = s.splitAt(cut)
      val mid = stages(n, l).foldLeft((0, 0L))((st, q) => CepDfa.step(n, st, q))
      val fin = stages(n, r).foldLeft(mid)((st, q) => CepDfa.step(n, st, q))
      assert(fin._2 == dfaCount(n, s),
        s"split at $cut of $s: ${fin._2} vs ${dfaCount(n, s)}")
    }
  }
}
