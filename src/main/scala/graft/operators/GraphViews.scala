package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph materialization views — the reference's `/graph` and
  * `/graph-data` endpoints (main.py:128-204) as relational views over the
  * edge table (SURVEY.md §2.4 G3-G5).
  */
object GraphViews {

  /** Node enumeration (G3): distinct endpoints of the edge table. The
    * reference can hold degree-0 nodes (add_node at main.py:259); callers
    * holding a separate nodes table can union it in. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id")).distinct()

  /** Degree + strength per node — the graph-shape invariants the golden
    * fixture checks (SURVEY.md §5: 77 nodes / 251 edges, degree 1..25). */
  def degrees(edges: DataFrame): DataFrame =
    GraphBuild.symmetric(edges)
      .groupBy(col("u").as("id"))
      .agg(count(lit(1)).as("degree"),
        sum(col("score")).as("strength"))

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
