package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codebook exporter: trains the fixed-seed k-means coarse quantizer
  * ([[graft.operators.Ann.trainedCentroids]]) over an embeddings corpus
  * and prints the centroid matrix as Scala source literals for
  * [[graft.operators.Codebooks]].
  *
  * Why literals instead of training at query time: the correctness gate
  * hash-compares against a DuckDB oracle whose SQL text is generated
  * WITHOUT a SparkSession, and distributed k-means centroid values
  * depend on float-summation order (partitioning), so a query-time
  * training step could never be quoted exactly on the oracle side. A
  * frozen codebook is also the production shape — codebooks are
  * training ARTIFACTS, versioned and shipped to the query layer, not
  * refit per query.
  *
  * Usage: sbt "runMain graft.tools.TrainCodebook /root/testdata/sf0.01"
  */
object TrainCodebook {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val cents = graft.operators.Ann.trainedCentroids(docs, nCentroids = k)
    val body = cents.map(c =>
      c.map(f => s"${f}f").mkString("    Array(", ", ", ")"))
      .mkString(",\n")
    println(s"  val ivf${k}dim${cents.head.length}: Array[Array[Float]] = Array(\n$body)")
    spark.stop()
  }
}
