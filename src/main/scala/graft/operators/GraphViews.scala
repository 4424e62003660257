package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph materialization views — the reference's `/graph` and
  * `/graph-data` endpoints (main.py:128-204) as relational views over the
  * edge table (SURVEY.md §2.4 G3-G5).
  */
object GraphViews {

  /** Node enumeration (G3): distinct endpoints of the edge table. The
    * reference can hold degree-0 nodes (add_node at main.py:259); use the
    * two-argument overload for full parity. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id")).distinct()

  /** G3 with degree-0 parity: edge endpoints UNION the ingested-node
    * table — `add_node` (main.py:259) creates the source node even when
    * KNN returns no usable neighbor, so nodes can exist with no edges.
    * @param nodeIds one `id` per ingested doc (Pipelines.submit's docs) */
  def nodes(edges: DataFrame, nodeIds: DataFrame): DataFrame =
    nodes(edges).unionByName(nodeIds.select("id")).distinct()

  /** Degree + strength per node — the graph-shape invariants the golden
    * fixture checks (SURVEY.md §5: 77 nodes / 251 edges, degree 1..25). */
  def degrees(edges: DataFrame): DataFrame =
    GraphBuild.symmetric(edges)
      .groupBy(col("u").as("id"))
      .agg(count(lit(1)).as("degree"),
        sum(col("score")).as("strength"))

  /** [[degrees]] over the FULL node set (degree-0 parity): isolated
    * nodes surface with degree 0 / strength 0.0 instead of vanishing.
    * Left join against the metadata-light degree aggregate — the node
    * table never widens, so this scales like a key-key join. */
  def degreesAll(edges: DataFrame, nodeIds: DataFrame): DataFrame =
    nodeIds.select("id").distinct()
      .join(degrees(edges), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("strength"), lit(0.0)).as("strength"))

  /** Dangling-node filter (G5, main.py:183-203): keep nodes that resolve
    * in the doc store, then edges whose BOTH endpoints are valid. Inner
    * join drops dangling; double semi-join prunes edges. */
  def validGraph(edges: DataFrame, docs: DataFrame): (DataFrame, DataFrame) = {
    val valid = nodes(edges).join(docs, Seq("id"), "inner")
    val validIds = valid.select("id")
    val prunedEdges = edges
      .join(validIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(validIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    (valid, prunedEdges)
  }
}
