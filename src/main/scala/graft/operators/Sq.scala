package graft.operators

import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the third standard vector-compression
  * family next to the hyperplane/IVF buckets ([[Ann]]) and product
  * quantization ([[Pq]]): each float component is mapped to a signed
  * byte against a per-vector scale, shrinking an embedding column 4×
  * at rest. Where PQ trades geometry for 32× compression via trained
  * codebooks, SQ8 is training-free and nearly lossless for ranking
  * (error ≤ scale/2 per component), which is why it is the default
  * "cheap mode" of the mainstream ANN stacks. At 100 TB the point is
  * IO: a first-pass scan over stored `sq_codes` reads a quarter of the
  * float bytes; survivors re-score exactly at full precision — the
  * [[Ann.topKPrefixRerank]] two-stage shape with compression instead
  * of truncation as the cheap pass.
  *
  * Determinism (oracle contract): the scale is `max(|v_i|)/127` — a
  * max, not a sum, so no float-association hazard; codes are
  * `floor(v/s + 0.5)` (integral, |code| ≤ 128 by construction); the
  * approximate score is the same strict left-fold Double dot product
  * as the exact path over `code · s`. Every step is a fixed expression
  * tree both engines evaluate bit-identically, so the SQ8 SHORTLIST —
  * not just the exact re-score — is oracle-exact (q189).
  */
object Sq {

  /** Add `sq_scale` (DOUBLE) and `sq_codes` (ARRAY<TINYINT>) for
    * `vecCol`. The scale is materialized as its own column FIRST: a
    * per-element lambda referencing the array-max expression would
    * re-embed the O(dim) max into every element slot (the Dedup CSE
    * hazard — O(dim²) expression growth). The zero vector (scale 0)
    * encodes to all-zero codes rather than a division by zero. */
  def encode(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("sq_scale",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))) / 127.0)
      .withColumn("sq_codes",
        when(col("sq_scale") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(vecCol), x =>
            floor(x.cast("double") / col("sq_scale") + 0.5).cast("byte"))))

  /** Approximate similarity of a float query against SQ8 codes:
    * dot(qvec, float(code·scale)) — same left fold as the exact scorer,
    * so ordering ties break identically across engines. The dequantized
    * component is rounded to FLOAT (the codegen dot product's input
    * type — and the width a real decoded column would carry anyway);
    * double→float is exact IEEE round-to-nearest in both engines, so
    * the mirror stays bit-faithful. */
  def approxSim(qvec: Column, codes: Column, scale: Column): Column =
    dotProduct(qvec,
      transform(codes, c => (c.cast("double") * scale).cast("float")))

  /** Two-stage SQ8 retrieval: shortlist per query on the approximate
    * (byte-width) score, re-score the shortlist exactly at full float
    * precision, return the exact top-k. With `shortlist` ≥ corpus size
    * this IS brute-force top-k (spec-pinned); the production setting is
    * a small multiple of k, making the full-precision reads per query
    * O(shortlist) while the scan-side bytes are the 4×-smaller codes.
    * @return (qid, id, sim, rank) — sim is the EXACT score */
  def topKSqRerank(
      docs: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      shortlist: Int,
      conf: graft.GraftConf = graft.GraftConf.default): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val wPre = Window.partitionBy("qid").orderBy(col("asim").desc, col("id"))
    val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    encode(Knn.spreadForScoring(docs, conf), "embedding")
      .crossJoin(Knn.maybeBroadcast(queries, conf))
      .withColumn("asim",
        approxSim(col("qvec"), col("sq_codes"), col("sq_scale")))
      .withColumn("_pr", row_number().over(wPre))
      .filter(col("_pr") <= shortlist)
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("qid", "id", "sim", "rank")
  }

  /** SQL mirror of [[encode]]'s scale for a vector expression. */
  def sqlScale(vec: String): String =
    s"list_aggregate(list_transform($vec, x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0"

  /** SQL mirror of [[encode]]'s codes given a scale expression. */
  def sqlCodes(vec: String, scale: String): String =
    s"CASE WHEN $scale = 0.0 THEN list_transform($vec, x -> CAST(0 AS TINYINT)) " +
      s"ELSE list_transform($vec, x -> CAST(floor(CAST(x AS DOUBLE) / $scale + 0.5) AS TINYINT)) END"

  /** SQL mirror of [[approxSim]] (FLOAT rounding included). */
  def sqlApproxSim(qvec: String, codes: String, scale: String): String =
    graft.OracleSql.dot(qvec,
      s"list_transform($codes, c -> CAST(CAST(c AS DOUBLE) * $scale AS FLOAT))")
}
