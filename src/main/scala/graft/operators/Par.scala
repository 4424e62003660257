package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound map stages (tokenization, shingling,
  * per-token hashing, vector math).
  *
  * Parquet splits by row group, so a small input (one file, one row
  * group) scans as ONE task — and every expensive per-row expression
  * downstream then runs on one core no matter how many the cluster has.
  * At 100 TB the scan has orders of magnitude more splits than cores and
  * this helper is a no-op; at small scale it redistributes the (tiny)
  * input once so the heavy map work uses the whole machine.
  */
object Par {

  /** Repartition `df` to the session's default parallelism IFF its scan
    * currently yields fewer partitions than that. The explicit partition
    * count survives AQE (user-specified repartition is never coalesced),
    * unlike leaving it to ENSURE_REQUIREMENTS shuffles. */
  def ensureMapParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // metadata-only: number of planned input splits, no job runs
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
