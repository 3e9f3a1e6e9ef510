package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the Aho–Corasick automaton: counts equal the
  * brute-force all-start-positions scan for EVERY pattern on random
  * texts. A 2-letter alphabet on purpose — repetitive strings maximize
  * overlapping matches and fail-link traffic, exactly where a buggy
  * output-chain merge or fail computation miscounts.
  */
object AhoCorasickProps extends Properties("graft.ahocorasick") {

  private def bruteCount(t: String, p: String): Long =
    (0 to t.length - p.length)
      .count(i => t.regionMatches(i, p, 0, p.length)).toLong

  private val word = Gen.choose(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
  private val text = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
  private val dict = Gen.choose(1, 8)
    .flatMap(k => Gen.listOfN(k, word).map(_.distinct))

  property("automaton counts == brute-force all-positions scan") =
    Prop.forAll(dict, text) { (ps, t) =>
      val auto = new graft.functions.AhoCorasick.Automaton(ps)
      val got = auto.counts(t).toSeq
      val want = ps.map(p => bruteCount(t, p))
      got == want
    }

  property("counts are additive over concatenation up to boundary spans") =
    Prop.forAll(dict, text, text) { (ps, a, b) =>
      val auto = new graft.functions.AhoCorasick.Automaton(ps)
      val joined = auto.counts(a + b)
      val parts = auto.counts(a).zip(auto.counts(b)).map { case (x, y) => x + y }
      // matches in a+b = matches in a + matches in b + matches that
      // SPAN the boundary; spans are non-negative and bounded by the
      // pattern length minus one possible start positions each
      joined.zip(parts).zip(ps).forall { case ((j, s), p) =>
        j >= s && j <= s + math.max(0, p.length - 1)
      }
    }
}
