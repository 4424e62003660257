package graft.streaming

import graft.GraftConf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming demo: a rate source synthesizes documents
  * (deterministic content keyed on the tick value, ~20% duplicates to
  * exercise the dedup guard), the ingest loop embeds/dedups/appends and
  * builds edge deltas per micro-batch. Runs for a bounded wall-clock
  * window, then reports store + graph state.
  *
  * Usage: sbt "runMain graft.streaming.StreamDemo [seconds]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSecs = args.headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft_demo").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")

    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "20").load()
      .select(
        when(col("value") % 3 === 0, "image").otherwise("text").as("mtype"),
        // value div 5 => every 5 ticks repeat a content (dedup exercised)
        concat(lit("streamed document number "), expr("value div 5")).as("data"),
        col("value").as("seq"))

    val q = StreamingIngest
      .ingestWriter(stream, docsDir, edgesDir, GraftConf(dim = 16))
      .option("checkpointLocation", ckpt)
      .start()
    Thread.sleep(runSecs * 1000L)
    // stop() cancels the in-flight micro-batch: Spark logs a
    // SPARK_JOB_CANCELLED for it — expected shutdown noise, not a failure
    // (completed batches are checkpointed and durable).
    q.stop()

    val docs = spark.read.parquet(docsDir)
    val edges = spark.read.parquet(edgesDir)
    val compacted = graft.operators.GraphBuild.upsertEdges(edges.limit(0), edges)
    println(s"[demo] ingested docs: ${docs.count()} (distinct ids: " +
      s"${docs.select("id").distinct().count()}), " +
      s"edge deltas: ${edges.count()}, compacted edges: ${compacted.count()}")
    val degrees = graft.operators.GraphViews.degrees(compacted)
      .agg(min("degree"), max("degree")).collect().head
    println(s"[demo] degree range: ${degrees.getLong(0)}..${degrees.getLong(1)}")
    spark.stop()
  }
}
