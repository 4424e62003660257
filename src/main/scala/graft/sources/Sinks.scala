package graft.sources

import graft.operators.GraphBuild
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sinks with the layouts that matter at 100 TB:
  *  - modality/date partitioning so downstream queries prune whole
  *    directories (PartitionFilters in the scan, not row filters);
  *  - append-only edge-delta logs with explicit compaction (the
  *    relational replacement for the reference's whole-graph re-pickle,
  *    main.py:35-37).
  */
object Sinks {

  /** Partitioned write: one directory per value of `partitionCol`.
    * Readers filtering on that column scan only matching directories. */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)

  /** Append an edge delta to the log dir. */
  def appendEdgeDelta(delta: DataFrame, dir: String): Unit =
    delta.write.mode("append").parquet(dir)

  /** Compact the append-only edge log: latest-wins per (src, dst) —
    * run periodically (or when the log's file count crosses a threshold)
    * and swap directories; readers between compactions apply the same
    * upsert on read. */
  def compactEdges(spark: SparkSession, logDir: String, outDir: String): Unit = {
    val log = spark.read.parquet(logDir)
    GraphBuild.upsertEdges(log.limit(0), log)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Crash-safe in-place REWRITE of a parquet directory: `write(read(dir),
    * tmp)` materializes the new contents into a sibling tmp dir, then the
    * live dir swaps via RENAME-ASIDE with every boolean result checked —
    * no code path deletes the only copy. Crash windows: live missing +
    * aside present is healed by [[recoverSwap]] (run here on entry); a
    * leftover aside NEXT TO a live dir means the previous swap completed
    * and only its cleanup failed, so it is superseded and dropped.
    * (Unlike GraphBuild.compactEdges, a generic rewrite has no merge
    * rule for concurrently re-created live dirs — callers that APPEND to
    * a swap-managed dir must run [[recoverSwap]] before appending.)
    * Not atomic for concurrent readers; call from a sequential
    * maintenance context. */
  private[graft] def swapInPlace(
      spark: SparkSession, dir: String,
      write: (DataFrame, String) => Unit): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(spark, dir)
    require(fs.exists(path), s"swapInPlace: $dir does not exist")
    val tmp = new org.apache.hadoop.fs.Path(dir + ".swap.tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".swap.old")
    if (fs.exists(old))
      require(fs.delete(old, true), s"swapInPlace: delete of superseded $old failed")
    // a leftover tmp is debris from a CRASHED prior attempt (crash after
    // some of write()'s output landed, before the swap) — clear it
    // before this attempt's write: callers whose write() targets only a
    // SUBSET of tmp's layout (e.g. a single partition directory under
    // it, like the all-retired sentinel partition) would otherwise swap
    // the stale partitions in as live, resurrecting rewritten data
    if (fs.exists(tmp))
      require(fs.delete(tmp, true), s"swapInPlace: delete of stale $tmp failed")
    write(spark.read.parquet(dir), tmp.toString)
    require(fs.rename(path, old), s"swapInPlace: rename $path -> $old failed")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore: old is the complete previous store
      throw new IllegalStateException(
        s"swapInPlace: rename $tmp -> $path failed (store restored from $old)")
    }
    require(fs.delete(old, true) || !fs.exists(old),
      s"swapInPlace: delete of superseded $old failed")
    spark.catalog.refreshByPath(dir)
  }

  /** Heal a crash-interrupted [[swapInPlace]]: live dir missing + aside
    * present → rename the aside (the complete previous store) back in. */
  private[graft] def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + ".swap.old")
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"recoverSwap: rename $old -> $path failed")
  }
}
