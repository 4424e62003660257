package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming pipeline semantics driven through real micro-batch execution
  * (MemoryStream + processAllAvailable). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: dedup across batches, docs + edges accumulate") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    val stream = src.toDF.toDF("mtype", "data", "seq")
    val q = StreamingIngest
      .ingestWriter(stream, docsDir, edgesDir, GraftConf(dim = 8))
      .option("checkpointLocation", ckpt)
      .start()
    try {
      src.addData(("text", "alpha doc", 1L), ("text", "beta doc", 2L))
      q.processAllAvailable()
      assert(spark.read.parquet(docsDir).count() == 2)
      val edgesAfterB1 = spark.read.parquet(edgesDir).count()
      assert(edgesAfterB1 > 0)
      // second batch: one duplicate (dropped), one new
      src.addData(("text", "alpha doc", 3L), ("image", "gamma doc", 4L))
      q.processAllAvailable()
      val docs = spark.read.parquet(docsDir)
      assert(docs.count() == 3)
      assert(docs.select("id").distinct().count() == 3)
      val edges = spark.read.parquet(edgesDir)
      // batches AFTER the first must also land their edge deltas: a
      // plain "edges > 0" was satisfied by batch 1 alone and masked the
      // recacheByPath empty-delta bug StreamDemo caught
      assert(edges.count() > edgesAfterB1,
        s"batch 2 wrote no edges (still $edgesAfterB1)")
      // canonical form holds on appended deltas
      assert(edges.filter(col("src") >= col("dst")).count() == 0)
    } finally q.stop()
  }

  test("windowed event counts: watermarked aggregation emits per-window totals") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingIngest.windowedEventCounts(
      src.toDF.toDF("ts", "event_type", "value"), "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("wincounts").start()
    try {
      src.addData(
        (Timestamp.valueOf("2026-01-01 10:10:00"), "click", 1.0),
        (Timestamp.valueOf("2026-01-01 10:40:00"), "click", 2.0),
        (Timestamp.valueOf("2026-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, n_events, sum_value FROM wincounts ORDER BY win_start, event_type")
        .collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState: running totals persist across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Double)]
    val totals = StreamingIngest.runningUserTotals(
      src.toDF.toDF("user_id", "value"))
    val q = totals.writeStream.outputMode("update").format("memory")
      .queryName("running").start()
    try {
      src.addData((1L, 10.0), (2L, 5.0))
      q.processAllAvailable()
      src.addData((1L, 7.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT user_id, running_total FROM running").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).max).toMap
      assert(last == Map(1L -> 17.0, 2L -> 5.0))
    } finally q.stop()
  }

  test("stateful dedup cache: first seen wins within AND across batches; state survives restart") {
    val dir = Files.createTempDirectory("graft_dedupstate").toString
    val (outDir, ckpt) = (s"$dir/out", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    // parquet via foreachBatch, not the memory sink: memory-sink queries
    // refuse checkpoint RECOVERY, and the restart leg is the point here
    def startQuery() = StreamingIngest
      .dedupStreamFirstSeen(src.toDF.toDF("mtype", "data", "seq"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).start()
    def out: Map[String, Long] = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[String]("data") -> r.getAs[Long]("seq")).toMap
    val q = startQuery()
    try {
      // batch 1: duplicate INSIDE the batch — lowest seq wins
      src.addData(("text", "doc one", 5L), ("text", "doc one", 2L), ("text", "doc two", 3L))
      q.processAllAvailable()
      // batch 2: duplicate ACROSS batches — dropped by state, no store probe
      src.addData(("text", "doc one", 9L), ("image", "doc three", 4L))
      q.processAllAvailable()
      assert(out == Map("doc one" -> 2L, "doc two" -> 3L, "doc three" -> 4L), out.toString)
    } finally q.stop()
    // restart from the SAME checkpoint: the id cache is state-store
    // backed, so a duplicate arriving after recovery still drops
    val q2 = startQuery()
    try {
      src.addData(("text", "doc two", 11L), ("text", "doc four", 12L))
      q2.processAllAvailable()
      assert(out.get("doc two").contains(3L), s"state lost on restart: $out")
      assert(out.get("doc four").contains(12L), out.toString)
    } finally q2.stop()
  }

  test("cached ingest writer: state-store dedup upstream, store stays unique, edges accumulate") {
    val dir = Files.createTempDirectory("graft_cachedingest").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    val q = StreamingIngest
      .ingestWriterCached(src.toDF.toDF("mtype", "data", "seq"), docsDir, edgesDir,
        GraftConf(dim = 8))
      .option("checkpointLocation", ckpt)
      .start()
    try {
      src.addData(("text", "cached alpha", 1L), ("text", "cached alpha", 2L),
        ("text", "cached beta", 3L))
      q.processAllAvailable()
      assert(spark.read.parquet(docsDir).count() == 2)
      val edgesAfterB1 = spark.read.parquet(edgesDir).count()
      assert(edgesAfterB1 > 0)
      // cross-batch duplicate dropped by STATE (before embed + probe);
      // the genuinely new doc still lands with its edges
      src.addData(("text", "cached beta", 4L), ("image", "cached gamma", 5L))
      q.processAllAvailable()
      val docs = spark.read.parquet(docsDir)
      assert(docs.count() == 3)
      assert(docs.select("id").distinct().count() == 3)
      assert(spark.read.parquet(edgesDir).count() > edgesAfterB1)
    } finally q.stop()
  }

  test("ingest recovers from checkpoint across restarts without duplicating docs") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val (srcDir, docsDir, edgesDir, ckpt) =
      (s"$dir/src", s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, String, Long)]): Unit = {
      val tmp = java.nio.file.Paths.get(dir, name + ".tmp")
      java.nio.file.Files.write(tmp, rows.map { case (m, d, s) =>
        s"""{"mtype":"$m","data":"$d","seq":$s}"""
      }.mkString("\n").getBytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(srcDir, name))
    }
    def startQuery() = StreamingIngest.ingestWriter(
        spark.readStream.schema(graft.sources.Sources.batchSchema).json(srcDir),
        docsDir, edgesDir, GraftConf(dim = 8))
      .option("checkpointLocation", ckpt)
      .start()

    writeBatch("b1.json", Seq(("text", "first doc", 1L), ("text", "second doc", 2L)))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(docsDir).count() == 2)

    // new file: one duplicate of batch 1 + one genuinely new doc
    writeBatch("b2.json", Seq(("text", "first doc", 3L), ("image", "third doc", 4L)))
    val q2 = startQuery() // fresh query object, SAME checkpoint
    q2.processAllAvailable(); q2.stop()
    val docs = spark.read.parquet(docsDir)
    assert(docs.count() == 3) // b1 not reprocessed, duplicate dropped
    assert(docs.select("id").distinct().count() == 3)
  }
}
