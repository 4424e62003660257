package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's t1 check: run SparkEntry.entry and print
  * the row count (driver requires rows > 0) plus a few rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.show(10, truncate = false)
    spark.stop()
  }
}
