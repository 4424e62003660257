package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark for the CdcCuts O(L·w) claim (VERDICT r7 Wrong #2):
  * chunk corpora of 300 / 3k / 30k / 300k-char documents holding TOTAL
  * character mass constant, and report seconds per million chars. A
  * linear-in-L kernel holds the per-char rate flat across the 1000×
  * doc-length sweep; the replaced HOF form was O(L²·w) — its rate grew
  * ~10× per decade and timed out past 30k. Run:
  * `sbt "runMain graft.tools.CdcScalingProbe"` — numbers recorded in
  * SCALE.md. */
object CdcScalingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val totalChars = 48L * 1000 * 1000 // constant mass per arm
    val unit = "the quick brown fox jumps over the lazy dog 0123456789 "
    for (docLen <- Seq(300, 3000, 30000, 300000)) {
      val reps = docLen / unit.length + 1
      val text = (unit * reps).take(docLen)
      val nDocs = (totalChars / docLen).toInt
      val docs = spark.range(nDocs)
        .select(col("id"), concat(col("id").cast("string"), lit(text)).as("text"))
      // time the chunk map stage alone (count of emitted chunks forces it)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.cdcChunks(docs, "id", "text").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cdcprobe] docLen=$docLen%7d nDocs=$nDocs%7d chunks=$n%9d " +
        f"sec=$sec%6.2f sec/Mchar=${sec / (totalChars / 1e6)}%.4f")
    }
    spark.stop()
  }
}
