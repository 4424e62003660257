package graft.operators

import graft.GraftConf
import graft.functions.HashFunctions.docId
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest pipeline: the reference's `/submit` flow (main.py:48-87) as one
  * batch DataFrame transformation — embed → content-hash identity →
  * dedup-against-existing → append-only new docs.
  *
  * Reference semantics reproduced:
  *  - identity key "doc:" + sha256(content) (main.py:78)
  *  - insert-if-absent: `r.exists(key)` guard before HSET
  *    (main.py:80-81, db.py:9-19) == left-anti join against the existing
  *    corpus, PLUS first-wins dedup *within* the incoming batch (the
  *    reference ingests serially, so the first occurrence wins;
  *    min-sequence keeps that semantics in a parallel batch)
  *  - embedding failure → row dropped (main.py:74-75: null vector guard)
  *
  * Scale: left-anti join shuffles only the (id) pairs when the existing
  * side is large (Catalyst picks broadcast-anti when existing is small);
  * within-batch dedup is a single hash aggregation on the id. No driver
  * state anywhere.
  */
object Ingest {

  /** Prepare an incoming batch: derive id + embedding from raw
    * (mtype, data) rows. Input columns: mtype STRING, data STRING, and a
    * monotonic `seq` LONG (ingest order, used for first-wins tie-breaks —
    * the reference's serial arrival order). */
  def prepare(batch: DataFrame, conf: GraftConf = GraftConf.default): DataFrame =
    batch
      .withColumn("id", docId(col("data")))
      .withColumn("embedding", Embed.embedText(col("data"), conf.dim))
  // E3 failure guard (vec.py:29-44: embed RPC failure → drop row): the
  // deterministic stub embedder cannot return null, and a filter on the
  // computed column would clone the whole embed tree into the Filter
  // predicate (2x embed per row — projection collapse has no CSE). The
  // guard is IMPLEMENTED on the model path: Multimodal.extractFeatures
  // flatMaps embedOpt, so an undecodable row emits nothing
  // (MultimodalSpec proves poisoned rows drop).

  /** New-docs-only delta vs the existing corpus (both keyed by `id`):
    * within-batch first-wins, then anti-join against existing ids. */
  def dedupDelta(prepared: DataFrame, existing: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("seq"))
    val batchFirst = prepared
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    batchFirst.join(existing.select("id"), Seq("id"), "left_anti")
  }

  /** Full upsert: existing ∪ delta (the reference's append-only store —
    * an existing key is never overwritten, main.py:80-81). */
  def upsert(prepared: DataFrame, existing: DataFrame): DataFrame =
    existing.unionByName(dedupDelta(prepared, existing).select(existing.columns.map(col): _*))
}
