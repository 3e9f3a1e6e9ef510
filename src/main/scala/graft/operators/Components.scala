package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by min-label propagation — the
  * dedup-clustering primitive (collapse transitive near-dup pairs to
  * one representative per group). Each round: push every node's label
  * across its edges, keep the per-node min; converged when no label
  * changes. Rounds = graph diameter; near-dup graphs are shallow
  * (cliques/short chains), so 2-4 rounds in practice. Per-round state
  * is persisted and the previous round unpersisted, so lineage stays
  * flat no matter how many rounds run. At 100 TB swap the round body
  * for the large-star/small-star alternation (same join shape,
  * logarithmic round count on adversarial diameters).
  */
object Components {

  /** @param pairs undirected edges as two columns `d1`, `d2`
    * @return (node, label) — label = min node id of the component
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val p = pairs.select(col("d1"), col("d2"))
    val edges = p.union(p.select(col("d2").as("d1"), col("d1").as("d2")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // localCheckpoint (not persist): an iterative DataFrame loop
      // grows the LOGICAL plan every round even when the physical
      // result is cached — analysis/optimization of the compounding
      // self-referencing tree OOMs the driver after a few rounds.
      // localCheckpoint truncates lineage to the materialized blocks,
      // so round k's plan is one join deep regardless of k.
      var labels = edges.select(col("d1").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .localCheckpoint(true)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val viaEdge = edges.as("e")
          .join(labels.as("l"), col("e.d2") === col("l.node"))
          .select(col("e.d1").as("node"), col("l.lbl"))
        val next = labels.unionByName(viaEdge)
          .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint(true)
        val changed = next.as("n")
          .join(labels.as("o"), col("n.node") === col("o.node"))
          .filter(col("n.lbl") =!= col("o.lbl")).count()
        labels.unpersist() // previous round's checkpoint blocks
        labels = next
        converged = changed == 0
        round += 1
      }
      require(converged, s"label propagation did not converge in $round rounds")
      labels
    } finally edges.unpersist()
  }
}
