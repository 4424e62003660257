package graft.tools

import graft.Tables
import graft.operators.SubstringDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substring-contamination scale measurement (SCALE.md): run the
  * winnow → fingerprint-join → automaton-extend pipeline over the real
  * documents table at the given scale factor with the q61 train/eval
  * split, and report stage volumes (k-gram rows, winnowed fingerprints
  * — the density the w parameter buys) and wall time. The numbers
  * quantify the operator's scale shape: fingerprint volume ~len/w per
  * doc, candidates bounded by true + hash-collision pairs, extend cost
  * bounded by candidate count × doc length.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.SubstringBench"
  */
object SubstringBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 37 =!= 0)
    val eval = docs.filter(col("doc_id") % 37 === 0)
    val (nT, nE) = (train.count(), eval.count())
    val totChars = docs.agg(sum(length(col("text")))).head.getLong(0)

    println(f"[substr] sf=$sfDir train=$nT eval=$nE totalChars=$totChars")
    // fixed guarantee k + w - 1 = 25: longer k-grams are rarer (fewer
    // false candidates on template-heavy text), smaller w keeps more
    // fingerprints per doc — the k↔w density/selectivity trade
    for ((k, w) <- Seq((12, 14), (16, 10), (20, 6))) {
      val t0 = System.nanoTime()
      val nPairs = SubstringDedup.contamination(
        train, eval, minOverlap = 25, k = k, w = w,
        idCol = "doc_id", textCol = "text").count()
      val secs = (System.nanoTime() - t0) / 1e9
      val cands = SubstringDedup.candidatePairs(
        train, eval, k = k, w = w, idCol = "doc_id", textCol = "text").count()
      println(f"[substr] k=$k%2d w=$w%2d candidates=$cands%7d " +
        f"contaminatedPairs=$nPairs wall=$secs%.1fs")
    }
    spark.stop()
  }
}
