package graft.tools

import graft.GraftConf
import graft.operators.{Embed, Knn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the §2.6 idle-capacity hypothesis on the brute-KNN scoring
  * stage (q17/q67's sf1 flatness in SCALING_r19): the docs side of the
  * scored cross join comes straight from a (small, bruteGuard-proven)
  * scan or cache, so its partition count — NOT the core count — bounds
  * the parallelism of the O(queries x docs) dot-product stage. Times the
  * q17-shaped search KNN (dim 16, queries = doc_id % 97) as-is vs with
  * the docs side repartitioned to defaultParallelism, and prints the
  * partition counts plus a result-hash equality check.
  *
  * Usage: runMain graft.tools.KnnParProbe [sfDir] [reps]
  */
object KnnParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = GraftConf(dim = 16)

    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = base.select(
      sha2(col("text").cast("binary"), 256).as("id"),
      when(col("lang") === "en", lit("text")).otherwise(lit("image")).as("mtype"),
      col("text").as("data"),
      Embed.embedText(col("text"), conf.dim).as("embedding"))
      .transform(graft.CacheScope.pin)
    val queries = base.filter(col("doc_id") % 97 === 0).select(
      concat(lit("q"), col("doc_id").cast("string")).as("qid"),
      when(col("lang") === "en", lit("text")).otherwise(lit("image")).as("qtype"),
      Embed.embedText(
        concat(lit("find "), substring(col("text"), 1, 40)), conf.dim).as("qvec"))
      .transform(graft.CacheScope.pin)
    val nDocs = docs.count()
    val nQ = queries.count()
    val par = spark.sparkContext.defaultParallelism
    println(s"[knnpar] docs=$nDocs queries=$nQ defaultParallelism=$par " +
      s"docsPartitions=${docs.rdd.getNumPartitions} " +
      s"docsEstimate=${graft.operators.Retrieval.knownSizeEstimate(docs)} " +
      s"embScanEstimate=${graft.operators.Retrieval.knownSizeEstimate(
        graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id").cast("string").as("id"), col("embedding")))}")

    def time(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val hashes = scala.collection.mutable.Set[Long]()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val out = Knn.search(d, queries, k = 10, conf)
        val h = out.select(bit_xor(xxhash64(col("qid"), col("id"),
          round(col("sim"), 6), col("rank"))).as("h")).head.getLong(0)
        hashes += h
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[knnpar] $tag secs=${ts.map(t => f"$t%.2f").mkString(",")} " +
        s"hash=${hashes.mkString(",")} (must be a single value per arm)")
    }
    time("asis      ", docs)
    time("repart    ", docs.repartition(par))
    spark.stop()
  }
}
