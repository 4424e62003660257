package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 measurement probe (guide §1): where does q170's wall-clock go —
  * the ue checkpoint, the k−1 farthest-point init passes, or the Lloyd
  * iterations? Also times the candidate replacement for the assignment
  * expression (typed mapPartitions over primitive arrays) against the
  * current higher-order-function expression, on identical inputs, and
  * asserts identical assignments. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.KMeansPhaseProbe [sfDir]"
  * Not part of any gate. */
object KMeansPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.KMeansTrain

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kmphase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup (JIT + parquet reader)
    spark.range(0, 1000000L).selectExpr("sum(id)").collect()
    graft.Tables.embeddings(spark, sfDir).limit(10).collect()

    val docs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    println(s"[kmphase] rows = ${docs.count()}")

    val ue = timed("ue checkpoint") {
      docs.select(
          col("vec_id").as("_kid"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1000000.0) + lit(0.5))
              .cast("long")).as("ue"))
        .localCheckpoint()
    }

    import graft.functions.HashFunctions.hash60
    val seeds = scala.collection.mutable.ArrayBuffer[Array[Long]]()
    timed("init: hash anchor") {
      seeds += ue
        .orderBy(hash60(concat(lit("km0:"), col("_kid").cast("string"))),
          col("_kid"))
        .limit(1).select("ue").collect().head.getSeq[Long](0).toArray
    }
    timed("init: 15 farthest passes") {
      while (seeds.length < 16) {
        val minDist = array_min(array(seeds.toSeq.map { c =>
          aggregate(
            zip_with(col("ue"), typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, v) => acc + v)
        }: _*))
        seeds += ue.select(col("_kid"), col("ue"), minDist.as("mind"))
          .orderBy(col("mind").desc, col("_kid"))
          .limit(1)
          .select("ue").collect().head.getSeq[Long](0).toArray
      }
    }
    var cents: Array[Array[Long]] = seeds.toArray

    timed("lloyd: 10 iterations (HOF)") {
      var it = 0
      while (it < 10) {
        val assigned = KMeansTrain.assignGrid(ue, cents, byDot = true)
        val sums = assigned
          .select(col("cid"), posexplode(col("ue")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum("col").as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          val (cid, j) = (r.getInt(0), r.getInt(1))
          next(cid - 1)(j) = math.floor(
            r.getLong(2).toDouble / r.getLong(3).toDouble).toLong
        }
        cents = next
        it += 1
      }
    }

    // single-job decompositions
    timed("one assignGrid noop (HOF)") {
      KMeansTrain.assignGrid(ue, cents, byDot = true)
        .write.format("noop").mode("overwrite").save()
    }
    timed("one update agg (HOF assign)") {
      KMeansTrain.assignGrid(ue, cents, byDot = true)
        .select(col("cid"), posexplode(col("ue")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .collect()
    }
    timed("one init-pass-15 job (HOF)") {
      val minDist = array_min(array(cents.toSeq.take(15).map { c =>
        aggregate(
          zip_with(col("ue"), typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v)
      }: _*))
      ue.select(col("_kid"), col("ue"), minDist.as("mind"))
        .orderBy(col("mind").desc, col("_kid"))
        .limit(1).select("ue").collect()
    }
    timed("one ue scan noop") {
      ue.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
