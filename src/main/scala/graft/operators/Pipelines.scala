package graft.operators

import graft.GraftConf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's two end-to-end flows composed from the operator layer
  * (SURVEY.md §3.1, §3.2) — each is ONE logical plan: Catalyst sees the
  * whole embed → dedup → KNN → graph chain and optimizes across the
  * stages (column pruning drops embeddings from the dedup branch, the
  * query side broadcasts into the scan, etc).
  */
/** CACHE CONTRACT: methods here pin intermediates reused by the
  * returned lazy plan and cannot unpersist them eagerly; pins go
  * through [[graft.CacheScope.pin]], so callers release them with
  * `CacheScope.materializeAndRelease` (Bench/Verify do, per query);
  * without a scope they are plain persists the caller must drop. */
object Pipelines {

  /** `/submit` (main.py:48-87): ingest a batch, then KNN each *new* doc
    * against the post-ingest corpus (self-clamp active: the new doc is in
    * the store when searched, main.py:80-84), then derive edge deltas.
    *
    * Default retrieval is [[Retrieval.Auto]]: the reference's brute
    * contract below the size cap (so small-corpus behavior — including
    * the §2.3 quirks — is byte-identical to pinning [[Retrieval.Brute]]),
    * the sub-linear [[Retrieval.MultiTableLsh]] past it. Pin an arm
    * explicitly to opt out of the switch.
    *
    * @param existing (id, mtype, data, embedding)
    * @param batch    (mtype, data, seq)
    * @return (updated docs, knn neighbors with qtype, edge delta)
    */
  def submit(
      existing: DataFrame,
      batch: DataFrame,
      conf: GraftConf = GraftConf.default,
      retrieval: Retrieval = Retrieval.Auto()
  ): (DataFrame, DataFrame, DataFrame) = {
    val delta = Ingest.dedupDelta(Ingest.prepare(batch, conf), existing)
      .select("id", "mtype", "data", "embedding", "seq")
    // materialize the post-ingest store: embeddings are STORED state in
    // the reference (Redis hashes, db.py:11-15) — every downstream
    // consumer (KNN docs side, edge building, later searches) reads the
    // store rather than re-running the embedder
    val docs = existing.select("id", "mtype", "data", "embedding")
      .unionByName(delta.drop("seq"))
      .transform(graft.CacheScope.pin)
    val queries = delta.select(
      col("id").as("qid"), col("mtype").as("qtype"),
      col("embedding").as("qvec"), col("seq"))
    // neighbors carry the stored payload (`data`), like the reference's
    // /submit response rows {id, data, type, score} (main.py:230-242 via
    // search.py:33-38) — the hit is useless to a caller without it
    val knn = retrieval.topK(docs, queries.drop("seq"), conf.submitK, conf)
      .join(queries.select("qid", "qtype", "seq"), Seq("qid"))
      .join(docs.select(col("id"), col("data")), Seq("id"), "left")
    val edges = GraphBuild.edgeDelta(knn, conf)
    (docs, knn, edges)
  }

  /** `/search` (main.py:90-125): embed the query, KNN WITHOUT self-clamp
    * (no query_id, main.py:118), then faithful graph expansion
    * (search.py:5-43) over the supplied edge table. Default retrieval =
    * [[Retrieval.Auto]] (see [[submit]]). */
  def search(
      docs: DataFrame,
      queries: DataFrame, // (qid, qtype, qvec) with qid not a doc id
      edges: DataFrame,
      conf: GraftConf = GraftConf.default,
      retrieval: Retrieval = Retrieval.Auto()
  ): DataFrame = {
    val knn = retrieval.topK(docs, queries, conf.searchK, conf)
    // hits carry the stored payload + modality like the reference's
    // /search response {id, data, type, score} (main.py:230-242): one
    // broadcast-able join against the store at the pipeline tail. Left
    // join: an expanded node missing from the store still surfaces (the
    // reference returns empty fields for it rather than dropping the hit).
    GraphExpand.expandFaithful(
        knn.select("qid", "id", "sim", "rank"), edges, conf.searchK, conf)
      .join(docs.select(col("id"), col("mtype"), col("data")), Seq("id"), "left")
  }
}
