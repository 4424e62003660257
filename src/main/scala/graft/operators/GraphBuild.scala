package graft.operators

import graft.GraftConf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic-graph construction — the reference's
  * `update_graph_connections` (main.py:258-279) as an edge-delta
  * derivation over KNN results.
  *
  * Reference semantics reproduced (SURVEY.md §2.4 G1):
  *  - for each KNN neighbor of an ingested doc, excluding self
  *    (main.py:266: `if node_id == doc_id: continue`), add edge
  *    (doc, neighbor) with the similarity score
  *  - cross-modal boost: endpoint modalities differ ⇒
  *    score = max(score, 0.8) (main.py:272-273, F6)
  *  - the graph is undirected (networkx.Graph) ⇒ canonical storage with
  *    src < dst
  *  - NetworkX `add_edge` on an existing edge OVERWRITES the score
  *    (main.py:276) ⇒ latest-wins upsert, decided by an ingest-sequence
  *    column (SURVEY.md §7.4 risk 4)
  *
  * Scale: edge deltas are tiny (k rows per ingested doc); the upsert is a
  * window-dedup on (src,dst) — shuffles only edges, never documents. The
  * reference re-pickles the whole graph per ingest (O(G) write
  * amplification, main.py:35-37); the relational form appends deltas and
  * compacts on read.
  */
object GraphBuild {

  /** Edge deltas from KNN output rows
    * (qid, qtype, id, mtype, sim, seq) — qid is the newly ingested doc. */
  def edgeDelta(knn: DataFrame, conf: GraftConf = GraftConf.default): DataFrame =
    knn
      .filter(col("id") =!= col("qid")) // self-edge guard (main.py:266)
      .withColumn(
        "score",
        when(col("mtype") =!= col("qtype"),
          greatest(col("sim"), lit(conf.crossModalBoost)))
          .otherwise(col("sim"))) // F6 (main.py:272-273)
      .select(
        least(col("qid"), col("id")).as("src"),
        greatest(col("qid"), col("id")).as("dst"),
        col("score"),
        col("seq"))

  /** Latest-wins upsert over canonical undirected edges: NetworkX
    * overwrite semantics via max-seq row per (src, dst). */
  def upsertEdges(existing: DataFrame, delta: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src", "dst").orderBy(col("seq").desc)
    existing.unionByName(delta)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Symmetric (both-orientations) view for traversal joins. */
  def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"), col("score"))
      .unionByName(
        edges.select(col("dst").as("u"), col("src").as("v"), col("score")))
}
