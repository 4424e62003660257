package graft.operators

import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor over embedding columns — the 100 TB
  * replacement for brute-force KNN (SURVEY.md §4 O2: the reference scans
  * every vector per query; at scale the corpus must be BLOCKED so a query
  * only scores its candidate bucket).
  *
  * Method: sign-bit hyperplane LSH (the classic random-projection scheme
  * for cosine similarity). `nPlanes` pseudo-random unit-free hyperplanes
  * are derived deterministically from md5 (same constants on any engine
  * or executor — no RNG state, no broadcast of planes needed); bucket id
  * = the nPlanes-bit sign pattern. Cosine-similar vectors agree on most
  * sign bits, so bucket-equality joins find near neighbors with
  * cross-join cost 1/2^nPlanes of brute force (multi-probe = also join on
  * single-bit-flipped buckets, `probes` > 1).
  *
  * Scale: docs carry an 8-byte bucket id; the query-candidate join is a
  * plain shuffled/broadcast hash join on that id — no cross join
  * anywhere. Recall/cost is tuned by nPlanes and probes.
  */
object Ann {

  /** Hyperplane component (plane j, dim i) in [-1, 1] — deterministic,
    * engine-portable (derived from md5 like HashFunctions.hash60, but
    * computed once here and inlined as plan literals). */
  def planeComponent(j: Int, i: Int): Double = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val hex = md5.digest(s"plane:$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    (h % 2001L - 1000L).toDouble / 1000.0
  }

  /** Plane j as a float vector (float so the projection can ride the
    * codegen DotProductF fast path; the float rounding is mirrored in the
    * oracle via CAST(... AS FLOAT)). */
  def planeVector(j: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(i => planeComponent(j, i).toFloat)

  /** Bucket id: sign bit per plane, packed into a LONG. Each projection
    * is a codegen dot product against a literal plane array — a tight
    * loop per row, not a dim-wide unrolled expression tree. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val proj = dotProduct(vec, typedLit(planeVector(j, dim)))
      when(proj >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed top-k: score ONLY candidates sharing one of the query's
    * probe buckets. probes=1 is the plain LSH join; probes=p>1 also
    * probes the p-1 single-bit-flipped buckets (multi-probe LSH — the
    * recall knob; each extra probe adds one bucket's worth of candidates,
    * still never a cross join). A doc matches at most one probe (probe
    * bucket ids are distinct), so no dedup is needed.
    * @return (qid, id, sim, rank) — queries whose probe buckets hold no
    *         candidate return no rows (the ANN recall trade-off). */
  def topKBucketed(
      docs: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      dim: Int,
      nPlanes: Int,
      probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= nPlanes + 1)
    val d = docs.withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes))
    val probeCols = (0 until probes).map { p =>
      val mask = if (p == 0) 0L else 1L << (p - 1)
      col("_b").bitwiseXOR(lit(mask))
    }
    val q = queries
      .withColumn("_b", lshBucket(col("qvec"), dim, nPlanes))
      .withColumn("bucket", explode(array(probeCols: _*)))
      .drop("_b")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    d.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "sim", "rank")
  }

  /** SQL mirror of [[lshBucket]]: dot against the same float plane
    * literals with the same left fold. */
  def sqlLshBucket(vec: String, dim: Int, nPlanes: Int): String =
    (0 until nPlanes).map { j =>
      val lits = planeVector(j, dim).map(_.toString).mkString("[", ", ", "]")
      val proj = graft.OracleSql.dot(vec, s"CAST($lits AS FLOAT[])")
      s"(CASE WHEN ($proj) >= 0.0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
}
