package graft

/** Bench's shared-cache attribution is only as good as its
  * hand-maintained member lists: the round-9 q149 envelope drift
  * (0.95x → 1.49x) was a query that read the shingle kernel but was
  * missing from the group, so whenever it sorted before the payer it
  * silently paid a build the envelope attributed elsewhere. This spec
  * DERIVES membership instead of trusting it: every catalog entry is
  * constructed with cleared caches, the cache maps are snapshotted
  * (kernels register at construction time via getOrElseUpdate — no
  * execution needed), and the derived consumer set must equal
  * Bench.sharedGroups exactly, both directions, for every group.
  */
class BenchGroupsSpec extends SparkSpec {

  test("sharedGroups member lists equal the derived cache consumers") {
    val derived = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    queries.Catalog.all.toSeq.sortBy(_._1).foreach { case (name, spec) =>
      queries.Catalog.clearCaches(spark)
      // construction alone registers kernel caches; execution not needed.
      // Construction failures are CatalogSmokeSpec's job.
      scala.util.Try(spec.fn(spark, sf0001))
      queries.Catalog.cacheFamiliesFor(spark).foreach { fam =>
        derived(fam) = derived(fam) + name
      }
    }
    queries.Catalog.clearCaches(spark)

    val declared = Bench.sharedGroups.map { case (g, _, ms) => g -> ms.toSet }
    // every declared group must exist and match the derivation exactly
    declared.foreach { case (group, members) =>
      val got = derived(group)
      val missing = got -- members   // consumes the kernel, not declared
      val stale = members -- got     // declared, no longer consumes
      assert(missing.isEmpty,
        s"group '$group': consumers missing from Bench.sharedGroups " +
          s"(the q149 drift class): ${missing.toSeq.sorted.mkString(", ")}")
      assert(stale.isEmpty,
        s"group '$group': declared members that no longer read the " +
          s"kernel: ${stale.toSeq.sorted.mkString(", ")}")
    }
    // and no cache family may exist without a declared group
    val undeclared = derived.keySet -- declared.map(_._1).toSet
    assert(undeclared.isEmpty,
      s"cache families with no Bench.sharedGroups entry: $undeclared")
    // payers must be members of their own group (run-order contract)
    Bench.sharedGroups.foreach { case (g, payer, ms) =>
      assert(ms.contains(payer), s"group '$g': payer $payer not a member")
    }
  }
}
