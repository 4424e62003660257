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
}
