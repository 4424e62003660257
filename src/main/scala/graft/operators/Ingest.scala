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

  /** Within-batch first-wins dedup (lowest `seq` keeps the row — the
    * reference's serial-arrival order in a parallel batch). */
  private def batchFirstWins(prepared: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("seq"))
    prepared
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** New-docs-only delta vs the existing corpus (both keyed by `id`):
    * within-batch first-wins, then anti-join against existing ids. */
  def dedupDelta(prepared: DataFrame, existing: DataFrame): DataFrame =
    batchFirstWins(prepared)
      .join(existing.select("id"), Seq("id"), "left_anti")

  /** [[dedupDelta]] with a Bloom pre-filter in front of the store
    * anti-join — the 100 TB shape: when the incoming batch is small and
    * the store is enormous, the anti-join's store-side scan dominates
    * every micro-batch. A Bloom filter over the store's ids (built once,
    * maintained incrementally — it unions) routes rows the filter says
    * are DEFINITELY absent straight to the output, so only the
    * "maybe present" residue (true duplicates + the fpp sliver) pays the
    * store probe. Exactly equivalent to [[dedupDelta]] whenever `bloom`
    * contains at least every existing id (no false negatives by Bloom
    * construction; false positives only shift rows to the probed route,
    * where the exact anti-join settles them) — IngestBloomSpec pins the
    * equivalence, including under a near-1 fpp.
    *
    * Duplicate ids always land on the SAME side of the split (the
    * predicate is a pure function of id), so first-wins runs before the
    * split and stays exact. */
  def dedupDeltaBloom(
      prepared: DataFrame, existing: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    // codegen probe, not a Scala UDF: the expression stays inside the
    // whole-stage span and ships the filter via the task-binary
    // broadcast — see graft.expressions.BloomMightContain
    val first = batchFirstWins(prepared)
      // materialize the split predicate ONCE: both branches filter on
      // it, and projection collapse would otherwise clone the probe call
      .withColumn("_maybe",
        graft.functions.HashFunctions.bloomMightContain(col("id"), bloom))
    val definitelyNew = first.filter(!col("_maybe")).drop("_maybe")
    val probed = first.filter(col("_maybe")).drop("_maybe")
      .join(existing.select("id"), Seq("id"), "left_anti")
    definitelyNew.unionByName(probed)
  }

  /** Full upsert: existing ∪ delta (the reference's append-only store —
    * an existing key is never overwritten, main.py:80-81). */
  def upsert(prepared: DataFrame, existing: DataFrame): DataFrame =
    existing.unionByName(dedupDelta(prepared, existing).select(existing.columns.map(col): _*))
}
