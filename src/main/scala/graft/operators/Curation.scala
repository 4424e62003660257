package graft.operators

import graft.functions.HashFunctions.hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation primitives for training-data pipelines: reproducible
  * sampling and per-group quotas.
  *
  * Both are HASH-based, not RNG-based, on purpose: `df.sample()` (and
  * `sampleBy`) draw from per-partition RNG streams, so the selected set
  * changes with partitioning, retries, and engine — unacceptable for a
  * dataset that must be reproducible and auditable. Hashing the row's
  * identity gives the same sample on any engine (exactly mirrorable in
  * the oracle), stable under repartition, and trivially invertible for
  * holdout splits (the complement predicate).
  */
object Curation {

  /** Deterministic membership score in [0, 1000): uniform md5-derived
    * per-id value — the basis for rate and split predicates. */
  def hashScore(id: Column): Column = hash60(id.cast("string")) % 1000L

  /** Keep ~`permille`/1000 of rows, selected by id hash. */
  def sampleByHash(docs: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    docs.filter(hashScore(col(idCol)) < permille)
  }

  /** Stratified deterministic sampling: per-stratum keep rates
    * (permille), unlisted strata dropped. Rates ride a CASE expression —
    * no join, no shuffle, pure map stage. */
  def sampleStratified(
      docs: DataFrame, idCol: String, stratumCol: String,
      permilleByStratum: Map[String, Int]): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(hashScore(col(idCol)) < rate)
  }

  /** Per-group quota: keep at most `quota` rows per group, chosen in
    * hash order (deterministic, unbiased by any payload column) with the
    * id as tiebreak. One shuffle on the group key; Spark plans the
    * row_number filter as WindowGroupLimit, pruning to `quota` rows per
    * group MAP-SIDE before the exchange. */
  def capPerGroup(
      docs: DataFrame, idCol: String, groupCol: String, quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(hashScore(col(idCol)), col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }
}
