package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame joins — no GraphX dependency,
  * same join-per-superstep structure (SURVEY.md §7.3: traversal =
  * iterative self-joins).
  */
object GraphAlgos {

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each superstep takes the min label among itself
    * and its neighbors; stops when no label changes (or maxIter).
    *
    * Scale notes: each superstep is one join of labels against the
    * symmetric edge view + a min-aggregation — both shuffle on node id,
    * so co-partitioning (bucketing by id) makes supersteps exchange-free.
    * The per-superstep label frame is `localCheckpoint`ed, NOT merely
    * persisted: persist caches data but keeps the compounded logical
    * plan, which grows exponentially across supersteps until plan
    * stringification alone OOMs (hit in testing at ~10 iterations) —
    * lineage truncation is mandatory for iterative DataFrame algorithms.
    * Convergence needs at most diameter supersteps — near-dup clusters
    * have tiny diameters, hence the low default maxIter.
    *
    * @param edges undirected (src, dst) pairs
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 10,
      checkConvergence: Boolean = true): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val neighborLabels = sym.as("e")
        .join(labels.as("l"), col("e.u") === col("l.id"))
        .select(col("e.v").as("id"), col("l.component"))
      val next = labels.unionByName(neighborLabels)
        .groupBy("id")
        .agg(min("component").as("component"))
        .localCheckpoint() // truncate lineage (see scaladoc)
      if (checkConvergence) {
        val changed = next.as("n")
          .join(labels.as("p"), col("n.id") === col("p.id"))
          .filter(col("n.component") =!= col("p.component"))
          .limit(1).count()
        converged = changed == 0
      }
      labels = next
      i += 1
    }
    labels
  }

  /** Dedup-cluster resolution: near-dup pairs (id_a, id_b) → one keeper
    * per connected component (min id — the reference's first-wins rule
    * generalized transitively). Returns (id, keeper, is_keeper).
    *
    * Oracle note (q48): the early-convergence stop is safe to mirror
    * with a FIXED unrolled superstep count — min-propagation is
    * idempotent once converged, so "stopped early at convergence" and
    * "ran all maxIter steps" produce identical labels whenever
    * convergence happens within maxIter, and byte-identical stepwise
    * labels otherwise. */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")), maxIter)
      .select(col("id"), col("component").as("keeper"),
        (col("id") === col("component")).as("is_keeper"))
}
