package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch study: recall@5 (nprobe=2) of in-engine grid Lloyd's vs the
  * frozen MLlib codebook across iteration counts — run with
  * `sbt "runMain graft.tools.KMeansStudy"`. Informs the q170/q171
  * configuration; not part of any gate. */
object KMeansStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Codebooks, KMeansTrain, Knn}
    import graft.Tables

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.001")) {
      val docs = Tables.embeddings(spark, sf)
        .select(col("vec_id").cast("string").as("id"), col("embedding"))
        .localCheckpoint()
      def qset(m: Long): org.apache.spark.sql.DataFrame =
        Tables.embeddings(spark, sf)
          .filter(col("vec_id") % 20 === m)
          .select(col("vec_id").cast("string").as("qid"),
            col("embedding").as("qvec"))
          .localCheckpoint()
      val tuneQ = qset(0L)
      val evalQ = qset(10L)
      def resultSet(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
        df.collect().groupBy(_.getAs[String]("qid")).view
          .mapValues(_.map(_.getAs[String]("id")).toSet).toMap
      def hits(queries: org.apache.spark.sql.DataFrame,
               truth: Map[String, Set[String]],
               cents: Array[Array[Float]]): Int =
        resultSet(Ann.topKIvfWith(docs, queries, 5, cents, nprobe = 2))
          .map { case (q, s) => truth.getOrElse(q, Set.empty).intersect(s).size }
          .sum
      val tuneT = resultSet(Knn.topK(docs, tuneQ, k = 5))
      val evalT = resultSet(Knn.topK(docs, evalQ, k = 5))
      val embSrc = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val fz = Codebooks.ivf16dim64
      println(s"$sf frozen tune=" + hits(tuneQ, tuneT, fz) + " eval=" + hits(evalQ, evalT, fz))
      for (salt <- 0 to 3) {
        val grid = KMeansTrain.lloydGrid(embSrc,
          "vec_id", "embedding", k = 16, iters = 10, assignByDot = true,
          saltPrefix = s"km$salt:", initFarthest = true)
        val cf = KMeansTrain.centroidsFloat(grid)
        println(s"$sf salt=$salt tune=" + hits(tuneQ, tuneT, cf) + " eval=" + hits(evalQ, evalT, cf))
      }
    }
    spark.stop()
  }
}
