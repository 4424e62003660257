package graft.tools

import graft.operators.Dedup
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q174 slowdown: times the two-round admission
  * with stage-level job counts, isolating the hot-band-cap structure. */
object AdmitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var jobs = 0
    val jobStart = scala.collection.mutable.Map[Int, (Long, String)]()
    val jobTimes = scala.collection.mutable.ArrayBuffer[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1
          jobStart(j.jobId) = (System.nanoTime(),
            j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
              .mkString(" | ").take(200))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobStart.remove(j.jobId).foreach { case (t0, d) =>
            jobTimes += (((System.nanoTime() - t0) / 1e9, d))
          }
      })
    // warmup
    spark.range(0, 1000000L).selectExpr("sum(id)").collect()

    def time(tag: String)(f: => Unit): Unit = {
      val j0 = jobs
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs - j0}")
    }

    for (rep <- 1 to 2) {
      time(s"q172 rep$rep") {
        graft.CacheScope.materializeAndRelease(
          SparkEntry.queries("q172_incremental_admission")(spark, sfDir)) { df =>
          df.write.format("noop").mode("overwrite").save()
        }
      }
      time(s"q174 rep$rep") {
        jobTimes.clear()
        graft.CacheScope.materializeAndRelease(
          SparkEntry.queries("q174_admission_two_round")(spark, sfDir)) { df =>
          df.write.format("noop").mode("overwrite").save()
        }
        jobTimes.sortBy(-_._1).take(10).foreach { case (s, d) =>
          println(f"[probe]   $s%6.2f s  $d")
        }
      }
    }
    spark.stop()
  }
}
