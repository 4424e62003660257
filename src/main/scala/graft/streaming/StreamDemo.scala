package graft.streaming

import graft.GraftConf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end streaming demo: rate source → ingest loop
  * (embed, dedup-against-store, append, KNN, edge deltas) → kill →
  * recover from checkpoint → continue.
  *
  * `sbt "runMain graft.streaming.StreamDemo"`
  *
  * The rate source checkpoints its offsets, so the restarted query
  * resumes exactly where the killed one committed; any in-flight batch
  * replays, and the store-level dedup guard (Ingest.dedupDelta) keeps
  * the doc store id-unique regardless. Every payload appears TWICE in
  * the source (value div 2), so content-dedup runs live alongside
  * replay-dedup. Prints pre-kill / post-recovery counts and a final
  * PASS/FAIL on the invariants:
  *  - the recovered query really processed new batches (strict growth);
  *  - ids stay unique (neither the replayed in-flight batch nor the
  *    duplicated payloads create a second copy);
  *  - edge endpoints all reference stored docs (no dangling edges).
  */
object StreamDemo {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_streamdemo").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    println(s"[demo] work dir: $dir")

    def startIngest() = {
      val stream = spark.readStream.format("rate")
        .option("rowsPerSecond", 20).load()
        .select(
          when(col("value") % 3 === 0, "image").otherwise("text").as("mtype"),
          concat(lit("streamed payload number "),
            (col("value") / 2).cast("long").cast("string")).as("data"),
          col("value").as("seq"))
      StreamingIngest.ingestWriter(stream, docsDir, edgesDir, GraftConf(dim = 8))
        .option("checkpointLocation", ckpt)
        .start()
    }

    def docCount: Long =
      try spark.read.parquet(docsDir).count() catch { case _: Throwable => 0L }
    def edgeCount: Long =
      try spark.read.parquet(edgesDir).count() catch { case _: Throwable => 0L }

    // phase 1: run until at least one batch has committed END TO END
    // (docs AND its edge delta — the doc store fills mid-batch, so a
    // docs-only wait would always kill inside the docs→edges gap), then
    // KILL mid-stream
    val q1 = startIngest()
    while (docCount < 10 || edgeCount == 0) Thread.sleep(200)
    q1.stop()
    val preKill = docCount
    val preKillEdges = edgeCount
    val preKillDistinct = spark.read.parquet(docsDir).select("id").distinct().count()
    println(s"[demo] pre-kill:      docs = $preKill (distinct ids = " +
      s"$preKillDistinct), edges = $preKillEdges")

    // phase 2: recover from the SAME checkpoint, process more batches
    // (no processAllAvailable: a rate source always has more data coming,
    // so that call would block indefinitely — stop on observed growth)
    val q2 = startIngest()
    val t0 = System.nanoTime()
    while ((docCount < preKill + 5 || edgeCount <= preKillEdges) &&
        (System.nanoTime() - t0) < 60e9)
      Thread.sleep(200)
    q2.stop()

    val docs = spark.read.parquet(docsDir)
    val post = docs.count()
    val postDistinct = docs.select("id").distinct().count()
    // the kill can land BETWEEN a batch's docs-append and edges-append
    // (at-least-once foreachBatch): the dir may not exist yet — that is
    // part of what the demo demonstrates, not an error
    val edges =
      try spark.read.parquet(edgesDir)
      catch {
        case _: Throwable => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "src STRING, dst STRING, score DOUBLE, seq BIGINT"))
      }
    val danglingEdges = edges
      .join(docs.select(col("id").as("src")), Seq("src"), "left_anti").count() +
      edges.join(docs.select(col("id").as("dst")), Seq("dst"), "left_anti").count()
    println(s"[demo] post-recovery: docs = $post (distinct ids = $postDistinct), " +
      s"edges = ${edges.count()} (dangling = $danglingEdges)")

    val ok = post > preKill && post == postDistinct &&
      edges.count() > preKillEdges && danglingEdges == 0
    println(s"[demo] recovered query grew the store: ${post > preKill}; " +
      s"unique ids: ${post == postDistinct}; " +
      s"new edges after recovery: ${edges.count() > preKillEdges}; " +
      s"no dangling edges: ${danglingEdges == 0}")
    println(s"[demo] ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
