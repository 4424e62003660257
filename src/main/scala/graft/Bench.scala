package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * A warmup pass (tiny sf0.001 flagship + a shuffle) runs before any
  * timing so JVM/codegen/parquet-reader startup cost is not attributed to
  * whichever query happens to run first; queries then run in sorted name
  * order for stable attribution across rounds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: codegen + shuffle + parquet reader + the vector hot path
    try {
      spark.range(0, 1000000L).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // optional comma-separated query-name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // isolate queries: operators pin intermediates they reuse within
      // one query; the release scope drops exactly those pins after the
      // terminal write, keeping timings independent of execution order
      // without the blanket clearCache hammer
      val t0 = System.nanoTime()
      // noop sink, not count(): a count() lets Catalyst prune every
      // unreferenced projection (map-shaped queries measured near-zero)
      // and drop final sorts; the noop sink consumes all columns.
      val ok = try {
        CacheScope.materializeAndRelease(fn(spark, sfDir)) { df =>
          df.write.format("noop").mode("overwrite").save()
        }
        true
      } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // failed queries report null timing and are EXCLUDED from the total:
    // a fast-failing query must not deflate the headline metric, and
    // totals stay comparable across runs even when `errors` is non-empty
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v.toString else "null")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
