package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for q89's multiset q-gram count bound
  * (Gravano et al. 1999): if levenshtein(a, b) ≤ d, then the multiset
  * bigram intersection `Σ min(count_a(g), count_b(g))` is at least
  * `max(|a|, |b|) − 1 − q·d` — i.e. the inverted-index prefilter is
  * LOSSLESS. Generated over a 2-letter alphabet on purpose: repetitive
  * strings are exactly where a distinct-gram variant undercounts and
  * silently drops true matches.
  */
object FuzzyBoundProps extends Properties("graft.fuzzybound") {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bigramCounts(s: String): Map[String, Int] =
    s.sliding(2).toSeq.filter(_.length == 2).groupBy(identity).map { case (g, v) => g -> v.size }

  private def multisetShared(a: String, b: String): Int = {
    val ca = bigramCounts(a); val cb = bigramCounts(b)
    ca.keysIterator.map(g => math.min(ca(g), cb.getOrElse(g, 0))).sum
  }

  // short strings over {a, b}: maximally repetitive, dense edit space
  private val word = Gen.choose(2, 10).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  property("multiset bigram intersection respects the q-gram lemma for d<=2 pairs") =
    Prop.forAll(word, word) { (a, b) =>
      val d = lev(a, b)
      d > 2 || multisetShared(a, b) >= math.max(a.length, b.length) - 1 - 2 * d
    }

  property("the bound at d=2 (q89's filter threshold) never drops a true match") =
    Prop.forAll(word, word) { (a, b) =>
      lev(a, b) > 2 || multisetShared(a, b) >= math.max(a.length, b.length) - 5
    }

  // regression witness: the distinct-gram variant DOES violate the bound
  // (this is why q89 counts multisets)
  property("distinct-gram counting is provably not lossless") = Prop {
    val a = "aaaaaaaa"; val b = "aaaaaaab"
    val distinctShared =
      a.sliding(2).toSet.intersect(b.sliding(2).toSet).size
    lev(a, b) == 1 &&
      distinctShared < math.max(a.length, b.length) - 5 && // distinct fails
      multisetShared(a, b) >= math.max(a.length, b.length) - 5 // multiset holds
  }
}
