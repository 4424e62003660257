package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: salt the skewed (large) side's key into
  * `saltFactor` sub-keys and replicate the other side across all salts, so
  * one hot key fans out over `saltFactor` tasks instead of melting a
  * single reducer. This is the manual fallback for when AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by default)
  * can't help — e.g. aggregations keyed on the joined key downstream, or
  * a deliberately partitioned sink.
  *
  * Cost model: replicates the SMALL side saltFactor× (keep it the
  * dimension side) in exchange for even task sizing on the fact side —
  * the standard trade at 100 TB where one hot user/url/document otherwise
  * dominates a stage.
  *
  * Salt = deterministic hash of the row's OTHER columns mod saltFactor
  * (pmod(hash(...))), not rand(): reruns and retried tasks get identical
  * assignments, so the operator stays idempotent under task retry.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltSrc = large.columns.filter(_ != key).map(col).toSeq
    val salted = large.withColumn(
      "_salt",
      if (saltSrc.isEmpty) lit(0)
      else pmod(hash(saltSrc: _*), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
