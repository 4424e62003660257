package graft.operators

import graft.functions.HashFunctions.hash60
import graft.functions.VectorFunctions.l2Normalize
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic stub embedder — the offline stand-in for the reference's
  * CLIP embedding service (reference app.py:22-40: text/image → 512-d
  * L2-normalized float32). No model weights exist in this environment
  * (SURVEY.md §7.4 risk 3), so the embedder is a seeded hash projection
  * with the *identical operator contract*: fixed-dim `ARRAY<FLOAT>`,
  * unit L2 norm, pure function of content.
  *
  * Construction: component i = (hash60(content || '#' || i) mod 2000001
  * - 1000000) / 1e6 ∈ [-1, 1], then L2-normalized. Everything is integer
  * hashing + exact Double steps, so the DuckDB oracle reproduces the
  * vectors bit-for-bit — which makes the WHOLE ingest+KNN pipeline
  * oracle-checkable end-to-end, not just its relational tail.
  *
  * Scale: pure per-row projection — no shuffle, no state, embarrassingly
  * parallel, exactly how a real model UDF (mapPartitions with a
  * per-partition model handle, reference E1/E2 in SURVEY.md §2.6) slots in.
  */
object Embed {

  /** Embed a string column into a dim-dimensional unit vector.
    *
    * ONE md5 per row: component i is an affine mix
    * (key·(2i+1) + b_i) mod p of a single base hash (the same
    * (a·h+b) mod p family as MinHash). The base key rides in via
    * `array_repeat` — putting `hash60(content)` inside the transform
    * lambda would re-run the md5 once per component (projection collapse
    * has no CSE; the same hazard fixed in MinHash/SimHash/shingles). */
  def embedText(content: Column, dim: Int): Column = {
    val M = 2147483647L // 2^31-1; keeps every intermediate < 2^41
    val keyArr = array_repeat(hash60(content) % M, dim)
    l2Normalize(
      transform(keyArr, (k, i) => {
        val mix = (k * (i * 2 + 1) + (i * lit(1013904223L)) % M) % M
        ((mix % 2000001L - lit(1000000L)).cast("double") / lit(1000000.0))
          .cast("float")
      }))
  }

  /** Binary content path (reference E2/E4: images and audio both go
    * through the byte branch, vec.py:16-22): embed the hex digest of the
    * bytes. Audio's degenerate treat-as-image behavior is preserved by
    * tagging modality separately from the embedding path. */
  def embedBinary(content: Column, dim: Int): Column =
    embedText(sha2(content, 256), dim)

  /** DuckDB mirror of the pre-normalization hash projection (compose with
    * [[sqlNormalize]] in a CTE for the full [[embedText]]). */
  def sqlEmbedRaw(content: String, dim: Int): String = {
    // same base key + affine mix + range mapping as embedText, identical
    // integer arithmetic order
    val key = s"(CAST(concat('0x', substr(md5($content), 1, 15)) AS BIGINT) % 2147483647)"
    s"list_transform(range(0, $dim), i -> " +
      s"CAST(CAST((($key * (i * 2 + 1) + (i * 1013904223) % 2147483647) % 2147483647) " +
      s"% 2000001 - 1000000 AS DOUBLE) / 1000000.0 AS FLOAT))"
  }

  /** DuckDB mirror of VectorFunctions.l2Norm on a list column name. */
  def sqlL2Norm(v: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))"

  /** DuckDB mirror of VectorFunctions.l2Normalize given a precomputed
    * norm column name (guard mirrors the zero-vector passthrough). */
  def sqlNormalize(v: String, nrm: String): String =
    s"CASE WHEN $nrm = 0.0 THEN $v " +
      s"ELSE list_transform($v, x -> CAST(CAST(x AS DOUBLE) / $nrm AS FLOAT)) END"
}
