package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash-resilient by construction (round-9 lesson: one query OOMed the
  * JVM via System.exit(52), which bypasses per-query catches, and the
  * END-of-run oracle_sql.json write meant the whole round's correctness
  * file came out empty despite 155 green dumps on disk):
  *  - oracle_sql.json is written FIRST, before any query runs;
  *  - queries run in sorted-name order, so a fatal crash kills a
  *    deterministic suffix and every already-written dump survives;
  *  - each query's leaked persistent RDDs (localCheckpoint blocks the
  *    iterative operators leave behind) are dropped before the next
  *    query, so storage pressure cannot accumulate across 150+ dumps.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // scan parallelism = file splits; the broadcast-KNN fan-out rule
      // is |queries|·rows-per-split, so a big-sf run over few small
      // parquet files must shrink splits or one task sorts the whole
      // scored stream (sf1 finding: 20 MB × 20k queries = 400M rows in
      // ONE task, spilling for minutes). At 100 TB the default 128 MB
      // is right — splits are plentiful; this env knob is the local
      // small-file analog of cluster split tuning.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the two memoized graph builds are the only DELIBERATE cross-query
    // state (one build, read by the whole analytics family). Materialize
    // them before the first per-query RDD snapshot, or the leak-diff
    // below would see them as that query's leak and unpersist blocks the
    // rest of the family still needs (lineage-truncated — unrecoverable).
    // a swallowed prewarm failure would surface later as baffling
    // missing-block errors across the whole graph family (the first
    // family query rebuilds the memoized checkpoint inside its
    // leak-sweep scope, which then unpersists it) — so say WHY up front
    try SparkEntry.prewarmSharedGraphs(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(
        s"[verify] prewarmSharedGraphs FAILED (graph-family queries may " +
          s"cascade-fail on missing blocks): ${e.getMessage}")
    }
    // optional comma-separated filter for local iteration (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      // scoped release, not clearCache: each query's operator pins are
      // dropped after its terminal write — per-query isolation without
      // evicting blocks a composing caller would still own
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      try CacheScope.materializeAndRelease(fn(spark, sfDir)) { df =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        // anything newly registered that survived the scoped release is
        // a leak (localCheckpoint blocks are invisible to CacheScope)
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id)) rdd.unpersist(blocking = false)
        }
      }
    }
    spark.stop()
  }
}
