package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points (key, t) against intervals
  * (key, lo, hi), inclusive on both ends.
  *
  * A plain `p.key = i.key AND p.t BETWEEN i.lo AND i.hi` join gives
  * Catalyst only one equi-key and an inequality — fine until one key
  * holds many intervals, at which point every point meets every
  * interval of its key. The bucketized form restores a full equi-join:
  * intervals explode to one row per covered time bucket of width `w`,
  * points map to their single bucket, and the join key is
  * (key, bucket); the exact BETWEEN filters the candidates. A point has
  * exactly ONE bucket, so no pair is produced twice and no dedup is
  * needed. Shuffle volume: |P| + |I|·(avg_len/w + 1); pick `w` near the
  * typical interval length so intervals explode to O(1) buckets.
  */
object RangeJoin {

  /** @return one row per (point, covering interval) match: all point
    *         columns + `iPayload` columns from the interval side. */
  def pointInInterval(
      points: DataFrame, pKey: String, pTime: String,
      intervals: DataFrame, iKey: String, iLo: String, iHi: String,
      iPayload: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_bkt", floor(col(pTime) / bucketWidth))
    val i = intervals
      .withColumn("_bkt",
        explode(sequence(
          floor(col(iLo) / bucketWidth), floor(col(iHi) / bucketWidth))))
      .select((Seq(col(iKey).as("_ik"), col(iLo).as("_lo"),
        col(iHi).as("_hi"), col("_bkt")) ++ iPayload.map(col)): _*)
    p.join(i, p(pKey) === i("_ik") && p("_bkt") === i("_bkt"))
      .filter(col(pTime) >= col("_lo") && col(pTime) <= col("_hi"))
      .drop("_ik", "_lo", "_hi", "_bkt")
  }
}
