package graft

import graft.operators.Components

/** Connected-components label propagation: chains merge transitively,
  * disjoint groups stay apart, cliques collapse, convergence holds on
  * a path graph whose diameter forces multiple rounds.
  */
class ComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains merge transitively even when endpoints share no edge") {
    // 1-2, 2-3: pairwise d2-dropping keeps {1}, CC labels all three 1
    assert(cc(Seq((1L, 2L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep distinct min-id representatives") {
    val got = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long path converges to one label (multi-round propagation)") {
    // path 1-2-...-9: diameter 8 forces several propagation rounds
    val path = (1L to 8L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.keySet == (1L to 9L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("edge order and direction don't affect the labeling") {
    val a = cc(Seq((5L, 3L), (3L, 7L), (7L, 1L)))
    val b = cc(Seq((1L, 7L), (3L, 5L), (3L, 7L)))
    assert(a == b && a.values.toSet == Set(1L))
  }

  private def ccStar(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (labels, rounds) =
      Components.connectedComponentsStar(pairs.toDF("d1", "d2"))
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("star contraction labels random graphs identically to propagation") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 10
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong + 1
        val b = rnd.nextInt(n).toLong + 1
        (a, b)
      }.filter { case (a, b) => a != b }
      assert(ccStar(edges)._1 == cc(edges), s"trial $trial diverged")
    }
  }

  test("star contraction needs O(log d) rounds on a 1000-node path") {
    // diameter 999: min-propagation would need ~999 rounds; the
    // large-star/small-star alternation contracts in logarithmic rounds
    val path = (1L until 1000L).map(i => (i, i + 1))
    val (labels, rounds) = ccStar(path)
    assert(labels.keySet == (1L to 1000L).toSet)
    assert(labels.values.toSet == Set(1L))
    assert(rounds <= 15, s"expected logarithmic convergence, took $rounds")
  }
}
