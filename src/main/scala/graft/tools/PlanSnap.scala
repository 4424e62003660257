package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for a set of declared queries into
  * per-query files — the before/after plan evidence of an optimization
  * round (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <tag> <q1,q2,...|all> [sfDir]
  *
  * Runs under the bench session shape (shuffle.partitions = cpus, UTC,
  * 128 MB splits) so the captured plans are the ones the bench times.
  * Formatted explain is PLAN-ONLY — but lifecycle queries run their
  * store mutations eagerly while the DataFrame is being BUILT, so this
  * defaults to sf0.01 to keep those side effects cheap; plan shape is
  * scale-invariant (same operators, same exchanges).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <q1,q2,..|all> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    // session shape mirrors Bench.scala exactly (same cpus default, same
    // split size) so captured plans are the ones the bench times (ADVICE
    // r18: a diverging default can change scan split counts / exchange
    // partitioning in the dump)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)
    val names =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = graft.CacheScope.materializeAndRelease(fn(spark, sfDir)) {
        // no job: formatted explain is plan-only (pre-AQE)
        _.queryExecution.explainString(ExplainMode.fromString("formatted"))
      }
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
      println(s"[plansnap] $name -> ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
