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
}
