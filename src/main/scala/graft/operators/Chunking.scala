package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Passage chunking — the retrieval/pretraining prep step that cuts each
  * document into fixed-size token windows with overlap (stride <
  * window), the unit a RAG index or a packed training sequence actually
  * stores. The reference ingests whole submissions (reference
  * main.py:84-110 embeds the full text as one vector); chunking is the
  * corpus-scale generalization every production pipeline inserts before
  * embedding, because model context is bounded and retrieval granularity
  * beats whole-document granularity.
  *
  * Scale shape (100 TB): pure per-row higher-order functions — tokenize,
  * one `transform` over the stride-aligned start offsets, `posexplode`.
  * No shuffle, no state, no UDF; output rows ≈ input tokens / stride,
  * produced streaming inside whole-stage codegen. Downstream embed/index
  * stages see only the chunk grain.
  *
  * Window semantics: starts at 0, stride, 2·stride, …; the LAST start is
  * the first multiple of stride covering the tail, so every token lands
  * in ≥1 chunk and a document of ≤ window tokens yields exactly one
  * chunk. Requires 0 < stride ≤ window (enforced).
  */
object Chunking {

  /** Cut `textCol` into (chunk_idx, chunk_text, n_tokens) windows of
    * `window` tokens every `stride`. Zero-token documents yield no rows
    * (there is nothing to retrieve). */
  def chunkWindows(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= window,
      s"need 0 < stride <= window, got stride=$stride window=$window")
    val nChunks = // 1 + ceil(max(n - window, 0) / stride), n > 0
      (lit(1) + ceil(
        greatest(size(col("toks")) - window, lit(0)).cast("double") /
          lit(stride.toDouble)).cast("int"))
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("toks"), i * stride + 1, lit(window)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** Chunk-pooled document embeddings — the long-document embedding
    * path: embed at the chunk grain, mean-pool per document,
    * re-normalize. The doc vector is the centroid of its chunk
    * vectors, which is how a production pipeline embeds text longer
    * than the encoder context (and what a doc-grain ANN index stores).
    *
    * Exactness: chunk components quantize to the exact 1e-6 grid
    * (floor(x·1e6 + 0.5) on bit-identical floats), so the per-element
    * pooling sum is an association-free Int64; the mean
    * (s / (n·1e6)), the strict-left-fold norm, the per-element
    * normalize, and the final float cast are fixed IEEE associations
    * the DuckDB oracle mirrors verbatim.
    *
    * Scale shape: one (doc, element) partial-aggregated shuffle at
    * dim fan-out, one per-doc assembly; no vector crosses the wire
    * as text.
    *
    * @return (idCol, n_chunks, embedding ARRAY<FLOAT> unit-norm) */
  def pooledEmbeddings(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, dim: Int): DataFrame = {
    val chunks = chunkWindows(docs, idCol, textCol, window, stride)
      .select(col(idCol),
        graft.operators.Embed.embedText(col("chunk_text"), dim).as("emb"))
    val els = chunks
      .select(col(idCol), posexplode(transform(col("emb"),
        x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)))))
      .groupBy(col(idCol), col("pos"))
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
    els
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("n"))))
        .as("e"))
      .select(col(idCol),
        element_at(col("e"), 1).getField("n").as("n_chunks"),
        transform(col("e"), t => t.getField("s").cast("double") /
          (t.getField("n").cast("double") * lit(1000000.0))).as("m"))
      .withColumn("_nrm",
        sqrt(aggregate(col("m"), lit(0.0), (a, x) => a + x * x)))
      .select(col(idCol), col("n_chunks"),
        transform(col("m"),
          x => when(col("_nrm") === 0.0, lit(0.0f))
            .otherwise((x / col("_nrm")).cast("float"))).as("embedding"))
  }
}
