package graft.streaming

import graft.GraftConf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-ingest throughput measurement (the number SCALE.md cites).
  *
  * [[StreamDemo]] proves the kill/recover semantics but its rate source
  * runs at 20 rows/s — it measures the harness, not the engine. This
  * main drives [[StreamingIngest.processBatch]] DIRECTLY with synthetic
  * micro-batches sized like a real ingest firehose, so the measured
  * rows/sec is the per-batch pipeline itself: sha256 identity → embed →
  * within-batch dedup → store anti-join → append → KNN vs the
  * post-ingest corpus → edge-delta append. That is the exact function
  * `foreachBatch` calls in production; driving it as a batch removes
  * only the trigger scheduling around it (measured separately by the
  * demo's wall clock).
  *
  * Duplicate pressure: 20% of each batch's payloads repeat earlier rows,
  * so the dedup path does real work and the store stays id-unique
  * (asserted at the end).
  *
  * The dominant per-batch cost is the brute KNN of the batch against
  * the ENTIRE accumulated store (the reference's own /submit shape,
  * main.py:83-85) — so per-batch time GROWS with store size and the
  * printed per-batch series makes that visible. The scale fix is the
  * one-argument ANN swap (Retrieval.MultiTableLsh, q67); here we
  * measure the contract shape.
  *
  * Env knobs: STREAM_BENCH_ROWS (default 5000 rows/batch),
  * STREAM_BENCH_BATCHES (default 5), STREAM_BENCH_DIM (default 64).
  * Prints ONE JSON line: {"metric":"stream_ingest_rows_per_sec",...}.
  *
  * Usage: sbt "runMain graft.streaming.StreamBench"
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val rowsPerBatch = sys.env.getOrElse("STREAM_BENCH_ROWS", "5000").toInt
    val nBatches = sys.env.getOrElse("STREAM_BENCH_BATCHES", "5").toInt
    val dim = sys.env.getOrElse("STREAM_BENCH_DIM", "64").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = GraftConf(dim = dim)

    val dir = java.nio.file.Files.createTempDirectory("graft_streambench").toString
    val (docsDir, edgesDir) = (s"$dir/docs", s"$dir/edges")

    // synthetic batch b: 80% fresh payloads (numbered b*rpb + pos, so
    // fresh ranges never collide across batches), 20% repeats of batch
    // b-1's payloads — cross-batch duplicates exercise the store
    // anti-join, not just the within-batch window. Batch 0 is all fresh.
    def batchDf(b: Int) = {
      val f = (rowsPerBatch * 4) / 5
      spark.range(0, rowsPerBatch.toLong) // distributed source, not a driver Seq
        .select(col("id").as("pos"))
        .select(
          when(lit(b) === 0, col("pos"))
            .when(col("pos") < f, lit(b.toLong * rowsPerBatch) + col("pos"))
            .otherwise(lit((b - 1).toLong * rowsPerBatch) + (col("pos") - f))
            .as("n"),
          col("pos"))
        .select(
          when(col("n") % 3 === 0, "image").otherwise("text").as("mtype"),
          concat(lit("streamed payload number "), col("n").cast("string")).as("data"),
          (lit(b.toLong * rowsPerBatch) + col("pos")).as("seq"))
    }

    // warmup: one small batch end-to-end into a throwaway dir so JVM /
    // codegen / parquet-writer startup isn't billed to batch 0
    StreamingIngest.processBatch(spark, batchDf(0).limit(200), -1L,
      s"$dir/warm_docs", s"$dir/warm_edges", conf)

    // both retrieval modes over identical batch streams into separate
    // stores: brute (the reference contract — per-batch cost grows with
    // store size) and multi-table LSH (the scale path — bucket-keyed)
    def run(tag: String, retrieval: graft.operators.Retrieval): (Seq[Double], Long, Long) = {
      val (dDir, eDir) = (s"$dir/docs_$tag", s"$dir/edges_$tag")
      val times = (0 until nBatches).map { b =>
        val df = batchDf(b).localCheckpoint() // exclude synthesis from timing
        val t0 = System.nanoTime()
        StreamingIngest.processBatch(spark, df, b.toLong, dDir, eDir, conf, retrieval)
        (System.nanoTime() - t0) / 1e9
      }
      val docs = spark.read.parquet(dDir)
      val stored = docs.count()
      val distinct = docs.select("id").distinct().count()
      val edges = spark.read.parquet(eDir).count()
      require(stored == distinct, s"[$tag] store not id-unique: $stored vs $distinct")
      // every duplicate row must have been dropped: batch 0 lands whole,
      // later batches land only their fresh 80%
      val expect = rowsPerBatch + (nBatches - 1).toLong * ((rowsPerBatch * 4) / 5)
      require(stored == expect, s"[$tag] dedup miscount: stored $stored, expected $expect")
      (times, stored, edges)
    }

    val (bruteT, stored, bruteEdges) = run("brute", graft.operators.Retrieval.Brute)
    val (annT, _, annEdges) =
      run("ann", graft.operators.Retrieval.MultiTableLsh(dim, nPlanes = 4, nTables = 8))

    // auto-escalation arm: cap = the store's Catalyst estimate midway
    // through the run (measured off the brute arm's store after it held
    // ceil(nBatches/2) batches of rows — here, its final size scaled),
    // so Retrieval.Auto provably runs brute for the early batches and
    // flips to ANN when the growing store crosses the cap mid-stream.
    // The flip batch is reported; the dedup/store invariants are
    // asserted by run() exactly as for the pure arms.
    val (autoT, autoFlip, autoEdges) = {
      val fullEst = spark.read.parquet(s"$dir/docs_brute")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val capConf = conf.copy(bruteCorpusWarnBytes = (fullEst / 2).toLong)
      val auto = graft.operators.Retrieval.Auto(dim, nPlanes = 4, nTables = 8)
      val (dDir, eDir) = (s"$dir/docs_auto", s"$dir/edges_auto")
      var flip = -1
      val times = (0 until nBatches).map { b =>
        val df = batchDf(b).localCheckpoint()
        val t0 = System.nanoTime()
        StreamingIngest.processBatch(spark, df, b.toLong, dDir, eDir, capConf, auto)
        val t = (System.nanoTime() - t0) / 1e9
        if (flip < 0 && auto.escalates(spark.read.parquet(dDir), capConf)) flip = b + 1
        t
      }
      val docs = spark.read.parquet(dDir)
      require(docs.count() == docs.select("id").distinct().count(),
        "[auto] store not id-unique")
      require(docs.count() == stored, "[auto] store mismatch vs pure arms")
      require(flip > 0 && flip < nBatches,
        s"[auto] escalation must fire mid-run, fired after batch $flip")
      (times, flip, spark.read.parquet(eDir).count())
    }

    // third mode: the FULL streaming query (MemoryStream →
    // dedupStreamFirstSeen state store → foreachBatch), ANN retrieval —
    // measures the whole machinery per committed batch: state-store
    // lookups/updates, offset/commit checkpointing, trigger scheduling.
    // The state-store dedup drops duplicates BEFORE the embed stage, so
    // vs the "ann" mode above this trades per-batch store anti-join work
    // for state-store maintenance.
    val (streamT, streamStored, streamEdges) = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Long)]
      val (dDir, eDir, ckpt) = (s"$dir/docs_stream", s"$dir/edges_stream", s"$dir/ckpt_stream")
      val q = StreamingIngest.ingestWriterCached(
          mem.toDF.toDF("mtype", "data", "seq"), dDir, eDir, conf,
          graft.operators.Retrieval.MultiTableLsh(dim, nPlanes = 4, nTables = 8))
        .option("checkpointLocation", ckpt).start()
      val times = (0 until nBatches).map { b =>
        val rows = batchDf(b).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        val t0 = System.nanoTime()
        mem.addData(rows)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      q.stop()
      // the speed claim is only valid if the stream did ALL the work:
      // same store contents as the direct modes, edges written
      val sDocs = spark.read.parquet(dDir)
      val (sCount, sDistinct) = (sDocs.count(), sDocs.select("id").distinct().count())
      require(sCount == sDistinct, "[stream] store not id-unique")
      require(sCount == stored,
        s"[stream] store mismatch vs direct modes: $sCount vs $stored")
      val sEdges = spark.read.parquet(eDir).count()
      require(sEdges > 0, "[stream] no edges written")
      (times, sCount, sEdges)
    }

    val totalRows = rowsPerBatch.toLong * nBatches
    def fmt(ts: Seq[Double]) = ts.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(
      s"""{"metric":"stream_ingest_rows_per_sec","value":${(totalRows / bruteT.sum).round},""" +
      s""""value_ann":${(totalRows / annT.sum).round},""" +
      s""""value_auto":${(totalRows / autoT.sum).round},""" +
      s""""value_stream_ann":${(totalRows / streamT.sum).round},"unit":"rows/sec",""" +
      s""""rows_per_batch":$rowsPerBatch,"batches":$nBatches,"dim":$dim,""" +
      s""""batch_sec_brute":${fmt(bruteT)},"batch_sec_ann":${fmt(annT)},""" +
      s""""batch_sec_auto":${fmt(autoT)},"auto_flip_after_batch":$autoFlip,""" +
      s""""batch_sec_stream_ann":${fmt(streamT)},""" +
      s""""stored_docs":$stored,"stored_docs_stream":$streamStored,""" +
      s""""edges_brute":$bruteEdges,"edges_ann":$annEdges,"edges_auto":$autoEdges,""" +
      s""""edges_stream":$streamEdges,"cores":32}""")
    spark.stop()
  }
}
