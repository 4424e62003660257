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

  test("compacting ingest: edge store shrinks to live edges; latest-wins view identical to batch replay across the compaction boundary") {
    import graft.operators.GraphBuild
    val dir = Files.createTempDirectory("graft_compact").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    val conf = GraftConf(dim = 8)
    // compactEvery = 2: batches 2 and 4 trigger compaction, batch 3's
    // deltas land ON TOP of a compacted store — the boundary case
    val q = StreamingIngest
      .ingestWriterCompacting(src.toDF.toDF("mtype", "data", "seq"),
        docsDir, edgesDir, conf, compactEvery = 2)
      .option("checkpointLocation", ckpt)
      .start()
    val batches = Seq(
      Seq(("text", "alpha stream doc", 1L), ("text", "beta stream doc", 2L)),
      Seq(("text", "gamma stream doc", 3L), ("image", "delta stream doc", 4L)),
      Seq(("text", "epsilon stream doc", 5L)),
      Seq(("image", "zeta stream doc", 6L), ("text", "eta stream doc", 7L)))
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val raw = spark.read.parquet(edgesDir)
      // after the batch-4 compaction the store IS its latest-wins view:
      // row count == live (src, dst) count, no superseded rows retained
      assert(raw.count() == raw.select("src", "dst").distinct().count(),
        "compaction left superseded delta rows in the store")
      assert(raw.filter(col("src") >= col("dst")).count() == 0)
      // stream ≡ batch: replaying the same trace through the batch-mode
      // ingest loop and compacting on read yields the identical edge set
      val bdir = Files.createTempDirectory("graft_compact_batch").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingIngest.processBatch(spark, b.toDF("mtype", "data", "seq"),
          i.toLong, s"$bdir/docs", s"$bdir/edges", conf,
          graft.operators.Retrieval.Brute)
      }
      val want = GraphBuild.latestWins(spark.read.parquet(s"$bdir/edges"))
        .select("src", "dst", "score", "seq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val got = GraphBuild.latestWins(raw)
        .select("src", "dst", "score", "seq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(got == want, s"stream/batch divergence over compacted store:\n$got\nvs\n$want")
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

  test("spike monitor: ledger-derived spikes equal the batch report on out-of-order replay") {
    val dir = Files.createTempDirectory("graft_spikeledger").toString
    val (ledger, ckpt) = (s"$dir/ledger", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val q = StreamingIngest
      .hourlyCountsWriter(src.toDF.toDF("ts", "event_type"), "2 hours")
      .format("parquet").option("path", ledger)
      .option("checkpointLocation", ckpt).start()
    // planted shape: 'click' runs 7 quiet hours (1/hour) then an
    // 8-event burst hour — mean 1.875, std ~2.31, burst z ~2.65 ≥ 2;
    // arrivals are OUT OF ORDER inside the watermark and split across
    // batches — the finalized hourly counts must not care
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val quiet = (8 to 14).map(h => t(h, 7 + h) -> "click")
    // the burst's LATEST event leads the list: batch 1 advances the
    // max event time to 15:08, batch 2 then delivers event-time-EARLIER
    // burst rows (15:01..15:07) — out of order, but above the 13:08
    // watermark, so the aggregation must fold them in, not drop them
    val burst = (t(15, 8) -> "click") +: (1 to 7).map(m => t(15, m) -> "click")
    val views = Seq(t(8, 15) -> "view", t(12, 45) -> "view")
    val events = quiet ++ views ++ burst
    try {
      src.addData(events.take(10): _*) // quiet + views + the 15:08 row
      q.processAllAvailable()
      src.addData(events.drop(10): _*) // 15:01..15:07, within watermark
      q.processAllAvailable()
      // watermark sentinel: a far-future event closes every real
      // window; its own window never finalizes, so it stays out of the
      // ledger and out of the batch comparison set
      src.addData(Timestamp.valueOf("2026-01-02 12:00:00") -> "sentinel")
      q.processAllAvailable()
      src.addData(Timestamp.valueOf("2026-01-02 13:00:00") -> "sentinel")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.operators.Relational
      .spikesFromLedger(spark, ledger, zFlag = 2.0)
    val batch = graft.operators.Relational.eventSpikes(
      events.toDF("ts", "event_type")
        .select(col("event_type"), expr("unix_micros(ts)").as("tus")),
      zFlag = 2.0)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour"),
        r.getAs[Long]("n"), r.getAs[Double]("z"), r.getAs[Boolean]("spike")))
      .toSet
    assert(key(streamed) == key(batch),
      s"stream=${key(streamed)} batch=${key(batch)}")
    // the planted burst is the one flagged spike
    assert(key(streamed).count(_._5) == 1)
    assert(key(streamed).find(_._5).get._3 == 8L, "burst hour count")
  }

  test("retention monitor: ledger-derived cohorts equal the batch report on replay") {
    val dir = Files.createTempDirectory("graft_retledger").toString
    val (ledger, ckpt) = (s"$dir/ledger", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val q = StreamingIngest
      .weeklyActiveWriter(src.toDF.toDF("ts", "user_id"), "2 hours")
      .format("parquet").option("path", ledger)
      .option("checkpointLocation", ckpt).start()
    // two cohorts: users 1-3 start week A (2026-01-05..), user 4
    // starts week B; user 1 active all three weeks, user 2 churns
    // after A, user 3 skips B but returns in C, user 4 active B+C
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2026-01-$d%02d $h%02d:00:00")
    // epoch weeks break on Thursdays; 2026-01-01 is a Thursday, so
    // week A = Jan 1-7, B = Jan 8-14, C = Jan 15-21
    val events = Seq(
      t(5, 10) -> 1L, t(6, 11) -> 2L, t(7, 9) -> 3L, // week A
      t(5, 23) -> 1L,                                // in-batch duplicate
      t(13, 8) -> 4L,                                // week B, advances time
      t(12, 10) -> 1L, // week B but EARLIER than the max seen: delivered
      // in batch 2, after the watermark reached Jan 13 06:00 — the
      // still-open B window (ends Jan 15) must fold it in, and the
      // offset-1 retention row below DEPENDS on it
      t(19, 10) -> 1L, t(20, 12) -> 3L, t(21, 7) -> 4L) // week C
    try {
      src.addData(events.take(5): _*)
      q.processAllAvailable()
      src.addData(events.drop(5): _*)
      q.processAllAvailable()
      src.addData(Timestamp.valueOf("2026-02-15 12:00:00") -> 999L)
      q.processAllAvailable()
      src.addData(Timestamp.valueOf("2026-02-16 12:00:00") -> 999L)
      q.processAllAvailable()
    } finally q.stop()
    val weekUs = 7L * 86400L * 1000000L
    val streamed = graft.operators.Relational.retentionFromLedger(spark, ledger)
    val batch = graft.operators.Relational.retentionFromActivity(
      events.toDF("ts", "user_id")
        .select(col("user_id"),
          graft.functions.PortableMath.floorDiv(
            expr("unix_micros(ts)"), weekUs).as("week")))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_cohort"), r.getAs[Long]("n_active"),
        r.getAs[Double]("retention"))).toSet
    assert(key(streamed) == key(batch),
      s"stream=${key(streamed)} batch=${key(batch)}")
    // cohort A: 3 users, offset-1 retention 1/3 (only user 1), offset-2
    // 2/3 (users 1 and 3 — the returner)
    val a = key(streamed).filter(t => t._3 == 3L)
    assert(a.exists(t => t._2 == 1L && t._4 == 1L))
    assert(a.exists(t => t._2 == 2L && t._4 == 2L))
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

  test("sessionizeStream: in-batch gap close + event-time-timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val sess = StreamingIngest.sessionizeStream(
      src.toDF.toDF("ts", "user_id"), gapMinutes = 30, watermark = "1 minute")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    def rows() = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    try {
      // user 1: 10:00, 10:10, then 11:30 — the 80-min jump closes the
      // first session WITHIN the batch (no watermark needed)
      src.addData(
        (Timestamp.valueOf("2026-01-01 10:00:00"), 1L),
        (Timestamp.valueOf("2026-01-01 10:10:00"), 1L),
        (Timestamp.valueOf("2026-01-01 11:30:00"), 1L))
      q.processAllAvailable()
      assert(rows() == Set(
        (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:10:00.0", 2L)), rows())
      // a far-future sentinel (user 999) advances the global watermark;
      // the following trigger fires user 1's timer and flushes 11:30
      src.addData((Timestamp.valueOf("2026-01-02 09:00:00"), 999L))
      q.processAllAvailable()
      src.addData((Timestamp.valueOf("2026-01-02 09:00:01"), 999L))
      q.processAllAvailable()
      assert(rows().contains(
        (1L, "2026-01-01 11:30:00.0", "2026-01-01 11:30:00.0", 1L)),
        s"timeout must flush the open session: ${rows()}")
    } finally q.stop()
  }

  test("sessionizeStream ≡ batch lag-gap sessionizer on identical input") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic synthetic trace: 5 users x 40 events with gaps that
    // straddle the 30-min boundary both ways
    val base = Timestamp.valueOf("2026-03-01 00:00:00").getTime
    val events = for {
      u <- 1L to 5L; i <- 0 until 40
    } yield {
      val step = ((u * 7919 + i * 104729) % 50) * 60000L + 1000L // 1s..49min
      (u, i, step)
    }
    // cumulative per-user times
    val times = events.groupBy(_._1).view.mapValues { es =>
      es.sortBy(_._2).scanLeft(base) { case (acc, (_, _, s)) => acc + s }.tail
    }.toMap
    val flat = times.toSeq.flatMap { case (u, ts) => ts.map(t => (new Timestamp(t), u)) }
    val src = MemoryStream[(Timestamp, Long)]
    val sess = StreamingIngest.sessionizeStream(
      src.toDF.toDF("ts", "user_id"), gapMinutes = 30, watermark = "1 minute")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sessions_eq").start()
    try {
      // feed in three event-time-ordered chunks (realistic progression)
      val ordered = flat.sortBy(_._1.getTime)
      ordered.grouped((ordered.size + 2) / 3).foreach { chunk =>
        src.addData(chunk); q.processAllAvailable()
      }
      // sentinel advances the watermark past every open session's timer
      src.addData((new Timestamp(base + 365L * 86400000L), 999L))
      q.processAllAvailable()
      src.addData((new Timestamp(base + 365L * 86400000L + 1000L), 999L))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions_eq")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
        .filter(_._1 != 999L).toSet
      val batch = graft.operators.Relational.sessionSpans(
        flat.toDF("ts", "user_id")
          .select(col("user_id"), lit(0L).as("event_id"),
            (unix_micros(col("ts")) / 1000L).cast("long").as("tus")),
        gapUs = 1800000L) // gap in MILLIS to match the ms-grain tus
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
      assert(streamed == batch,
        s"stream/batch mismatch:\nonly-stream=${streamed -- batch}\nonly-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("funnelStream ≡ batch funnel on identical input (incl. out-of-order late view)") {
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2026-04-01 00:00:00").getTime
    def t(min: Long) = new Timestamp(base + min * 60000L)
    // deterministic trace covering every funnel edge: full completion,
    // window expiry, click-before-view, anchor-not-latest, no-view user,
    // and — the streaming-specific hazard — a LATE view that arrives
    // after the clicks it re-qualifies (user 6: clicks at 10..15 arrive
    // first, the view at 5 arrives in a later batch, still in-watermark)
    val trace: Seq[(Timestamp, Long, String)] = Seq(
      (t(0), 1L, "view"), (t(5), 1L, "click"), (t(12), 1L, "purchase"),
      (t(0), 2L, "view"), (t(40), 2L, "click"),
      (t(0), 3L, "click"), (t(10), 3L, "view"),
      (t(0), 4L, "view"), (t(2), 4L, "view"),
      (t(8), 4L, "click"), (t(9), 4L, "click"), (t(17), 4L, "purchase"),
      (t(1), 5L, "purchase"),
      (t(10), 6L, "click"), (t(15), 6L, "click"), (t(20), 6L, "purchase"))
    val lateView = (t(5), 6L, "view")
    val src = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingIngest.funnelStream(
      src.toDF.toDF("ts", "user_id", "event_type"),
      windowMs = 30 * 60000L, idleMinutes = 60, watermark = "3 hours")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_eq").start()
    try {
      src.addData(trace); q.processAllAvailable()
      src.addData(lateView); q.processAllAvailable() // out-of-order, in-watermark
      // sentinel advances the watermark far past every idle timer
      src.addData((new Timestamp(base + 30L * 86400000L), 999L, "view"))
      q.processAllAvailable()
      src.addData((new Timestamp(base + 30L * 86400000L + 1000L), 999L, "view"))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, s1_us, s2_us, s3_us, stage FROM funnel_eq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))
        .filter(_._1 != 999L).toSet
      val batch = graft.operators.Relational.funnel(
        (trace :+ lateView).toDF("ts", "user_id", "event_type")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus")),
        "view", "click", "purchase", windowUs = 30L * 60000000L)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s1_us"),
          Option(r.get(2)), Option(r.get(3)), r.getAs[Long]("stage"))).toSet
      assert(streamed == batch,
        s"stream/batch mismatch:\nonly-stream=${streamed -- batch}\nonly-batch=${batch -- streamed}")
      // the late-view user must have completed the funnel THROUGH the
      // re-qualified clicks — the exact case a running-min design loses
      assert(streamed.exists(r => r._1 == 6L && r._5 == 3L),
        s"late view must re-open the funnel chain: $streamed")
    } finally q.stop()
  }

  test("funnelStream: open funnel state survives a checkpoint restart") {
    val dir = Files.createTempDirectory("graft_funnelstate").toString
    val (outDir, ckpt) = (s"$dir/out", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2026-05-01 00:00:00").getTime
    def t(min: Long) = new Timestamp(base + min * 60000L)
    val src = MemoryStream[(Timestamp, Long, String)]
    // parquet via foreachBatch, not the memory sink: memory-sink queries
    // refuse checkpoint RECOVERY (the dedup-cache test precedent)
    def startQuery() = StreamingIngest.funnelStream(
      src.toDF.toDF("ts", "user_id", "event_type"),
      windowMs = 30 * 60000L, idleMinutes = 60, watermark = "2 hours")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).start()
    val q = startQuery()
    try {
      // view + click land, funnel still OPEN (no idle timeout yet)
      src.addData((t(0), 1L, "view"), (t(5), 1L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    // restart: the purchase arrives AFTER recovery; the buffered
    // anchors must still be there for the stage-3 completion
    val q2 = startQuery()
    try {
      src.addData((t(20), 1L, "purchase"))
      q2.processAllAvailable()
      // sentinel advances the watermark past user 1's idle timer
      src.addData((new Timestamp(base + 30L * 86400000L), 999L, "view"))
      q2.processAllAvailable()
      src.addData((new Timestamp(base + 30L * 86400000L + 1000L), 999L, "view"))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3), r.getLong(4)))
        .filter(_._1 == 1L)
      assert(rows.length == 1, s"exactly one funnel row for user 1: ${rows.toSeq}")
      val (_, s1, s2, s3, stage) = rows.head
      assert(stage == 3L && s1 == t(0).getTime * 1000L &&
        s2 == t(5).getTime * 1000L && s3 == t(20).getTime * 1000L,
        s"pre-restart anchors must survive: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("indexed ingest: escalated stream ≡ Auto batch replay; ann store maintained incrementally across compaction") {
    import graft.operators.GraphBuild
    val dir = Files.createTempDirectory("graft_indexed").toString
    val (docsDir, edgesDir, annDir, ckpt) =
      (s"$dir/docs", s"$dir/edges", s"$dir/ann", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    // cap = 1 byte: batch 0 runs brute (no store yet — unknown counts 0
    // under the loop's micro-batch contract), every later batch sees a
    // parquet store estimated over the cap and takes the STORED
    // partition-pruned probe — the r13 verdict #1 arm. compactEvery = 3:
    // batch 3 folds the ann slices into the sentinel, batch 4 lands on
    // top of the compacted store (the boundary case).
    val conf = GraftConf(dim = 8, bruteCorpusWarnBytes = 1L)
    val q = StreamingIngest
      .ingestWriterIndexed(src.toDF.toDF("mtype", "data", "seq"),
        docsDir, edgesDir, annDir, conf, compactEvery = 3)
      .option("checkpointLocation", ckpt)
      .start()
    val batches = Seq(
      Seq(("text", "indexed alpha doc", 1L), ("text", "indexed beta doc", 2L)),
      Seq(("text", "indexed gamma doc", 3L), ("image", "indexed delta doc", 4L)),
      Seq(("text", "indexed epsilon doc", 5L), ("text", "indexed alpha doc", 6L)),
      Seq(("image", "indexed zeta doc", 7L), ("text", "indexed eta doc", 8L)))
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      // the ann store holds every stored doc once per table, behind the
      // flat tb=<id> partition layout (directory count fixed by the
      // geometry forever — no per-batch level)
      val ann = spark.read.parquet(annDir)
      val docs = spark.read.parquet(docsDir)
      assert(ann.select("id", "tb").distinct().count() == 8 * docs.count(),
        "ann store must carry each stored doc once per table")
      val names = new java.io.File(annDir).listFiles().map(_.getName)
      assert(names.count(_.startsWith("tb=")) > 1,
        s"expected flat tb= partition dirs, got ${names.take(6).mkString(", ")}")
      assert(!names.exists(_.startsWith("batch=")),
        "no per-batch directory level may exist (listing cost grows per batch)")
      // post-compaction (batch 3 triggered it) the store holds no
      // replay/batch duplicates: physical rows == distinct (id, tb)
      assert(ann.count() == ann.select("id", "tb").distinct().count(),
        "compaction left duplicate (id, tb) rows")
      // stream ≡ batch: the same trace through processBatch with
      // Retrieval.Auto (same cap, same default LSH geometry) makes the
      // SAME per-batch arm choice (brute batch 0, MultiTableLsh after) —
      // the stored probe must be candidate-identical to re-bucketing
      // existing ∪ delta from scratch (r13 verdict #1 "done" criterion)
      val bdir = Files.createTempDirectory("graft_indexed_batch").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingIngest.processBatch(spark, b.toDF("mtype", "data", "seq"),
          i.toLong, s"$bdir/docs", s"$bdir/edges", conf,
          graft.operators.Retrieval.Auto())
      }
      def edgeSet(d: String) = GraphBuild
        .latestWins(spark.read.parquet(d))
        .select("src", "dst", "score", "seq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(spark.read.parquet(docsDir).select("id").collect().map(_.getString(0)).toSet ==
        spark.read.parquet(s"$bdir/docs").select("id").collect().map(_.getString(0)).toSet,
        "doc stores diverged")
      assert(edgeSet(edgesDir) == edgeSet(s"$bdir/edges"),
        "escalated stream ≡ batch replay broken: stored probe diverged " +
          "from in-memory MultiTableLsh over existing ∪ delta")
    } finally q.stop()
  }

  test("indexed ingest replay convergence: crash between the ann slice and the doc append") {
    import graft.operators.GraphBuild
    val dir = Files.createTempDirectory("graft_indexed_replay").toString
    val conf = GraftConf(dim = 8, bruteCorpusWarnBytes = 1L)
    def run(base: String, crashBatch2: Boolean): Unit = {
      val (docsDir, edgesDir, annDir) = (s"$base/docs", s"$base/edges", s"$base/ann")
      val b1 = Seq(("text", "ix replay alpha doc", 1L), ("text", "ix replay beta doc", 2L))
        .toDF("mtype", "data", "seq")
      val b2 = Seq(("text", "ix replay gamma doc", 3L), ("image", "ix replay delta doc", 4L))
        .toDF("mtype", "data", "seq")
      StreamingIngest.processBatchIndexed(spark, b1, 0L, docsDir, edgesDir,
        annDir, conf).unpersist()
      val before = new java.io.File(docsDir).listFiles().map(_.getName).toSet
      StreamingIngest.processBatchIndexed(spark, b2, 1L, docsDir, edgesDir,
        annDir, conf).unpersist()
      if (crashBatch2) {
        // the crash window: edges + the ann append landed, the doc
        // append did not — the redelivered batch recomputes a non-empty
        // delta and re-appends its ann rows (duplicates absorbed by the
        // probe's pair dedup; storage converges at compaction)
        new java.io.File(docsDir).listFiles()
          .filterNot(f => before(f.getName)).foreach(_.delete())
        spark.catalog.refreshByPath(docsDir)
        StreamingIngest.processBatchIndexed(spark, b2, 1L, docsDir, edgesDir,
          annDir, conf).unpersist()
        // compaction dedups the replay-duplicated rows (the edge store's
        // latest-wins convergence, applied to the index)
        graft.operators.Ann.compactMultiTableCorpus(spark, annDir)
        val ann = spark.read.parquet(annDir)
        assert(ann.count() == ann.select("id", "tb").distinct().count(),
          "compaction must fold replay-duplicated ann rows")
      }
    }
    run(s"$dir/clean", crashBatch2 = false)
    run(s"$dir/crashed", crashBatch2 = true)
    def state(base: String) = {
      val docs = spark.read.parquet(s"$base/docs")
        .select("id").collect().map(_.getString(0)).toSet
      val edges = GraphBuild.latestWins(spark.read.parquet(s"$base/edges"))
        .select("src", "dst", "score")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val ann = spark.read.parquet(s"$base/ann")
        .select("id", "tb").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      (docs, edges, ann)
    }
    val clean = state(s"$dir/clean")
    val crashed = state(s"$dir/crashed")
    assert(crashed._1 == clean._1, "doc store diverged after replay")
    assert(crashed._2 == clean._2, "edge store diverged after replay")
    assert(crashed._3 == clean._3,
      "ann store diverged after replay — the batch-scoped overwrite did not converge")
    assert(clean._1.size == 4)
  }

  test("ingest replay convergence: the edge delta survives a crash between the edge and doc appends") {
    import graft.operators.GraphBuild
    val dir = Files.createTempDirectory("graft_replay_conv").toString
    val conf = GraftConf(dim = 8)
    def run(base: String, crashBatch2: Boolean): Unit = {
      val (docsDir, edgesDir) = (s"$base/docs", s"$base/edges")
      val b1 = Seq(("text", "replay alpha doc", 1L), ("text", "replay beta doc", 2L))
        .toDF("mtype", "data", "seq")
      val b2 = Seq(("text", "replay gamma doc", 3L), ("image", "replay delta doc", 4L))
        .toDF("mtype", "data", "seq")
      StreamingIngest.processBatch(spark, b1, 0L, docsDir, edgesDir, conf,
        graft.operators.Retrieval.Brute)
      val before = new java.io.File(docsDir).listFiles().map(_.getName).toSet
      StreamingIngest.processBatch(spark, b2, 1L, docsDir, edgesDir, conf,
        graft.operators.Retrieval.Brute)
      if (crashBatch2) {
        // simulate the at-least-once crash window: batch 2's DOC append
        // is rolled back (the edge append, which runs FIRST, survived) —
        // then the batch is redelivered
        new java.io.File(docsDir).listFiles()
          .filterNot(f => before(f.getName)).foreach(_.delete())
        StreamingIngest.processBatch(spark, b2, 1L, docsDir, edgesDir, conf,
          graft.operators.Retrieval.Brute)
      }
    }
    run(s"$dir/clean", crashBatch2 = false)
    run(s"$dir/crashed", crashBatch2 = true)
    def state(base: String) = {
      val docs = spark.read.parquet(s"$base/docs")
        .select("id").collect().map(_.getString(0)).toSet
      val edges = GraphBuild.latestWins(spark.read.parquet(s"$base/edges"))
        .select("src", "dst", "score")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      (docs, edges)
    }
    val (cleanDocs, cleanEdges) = state(s"$dir/clean")
    val (crashDocs, crashEdges) = state(s"$dir/crashed")
    assert(crashDocs == cleanDocs, "doc store diverged after replay")
    assert(crashEdges == cleanEdges,
      "edge store (latest-wins view) diverged after replay — the crash window lost or corrupted a delta")
    assert(cleanDocs.size == 4)
  }

  test("decontaminating ingest: stream equals the batch operator across batch splits") {
    val dir = Files.createTempDirectory("graft_decontam").toString
    val (cleanDir, ckpt) = (s"$dir/clean", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val s1 = "abcdefghijklmnopqrstuvwxyz"
    val eval = Seq((100L, "EV#" + s1 + "#tail-x")).toDF("id", "text")
    val docs = Seq(
      (1L, "0000" + s1 + "1111"),                   // embedded eval span
      (2L, "9876543210" * 5),                       // clean passthrough
      (3L, "EV#" + s1 + "#tail-x"),                 // exact eval copy
      (4L, "pref" + s1.substring(0, 15) + "suff"))  // 15-char overlap
    val src = MemoryStream[(Long, String)]
    val q = StreamingIngest.decontaminatingWriter(
        src.toDF.toDF("id", "text"), eval, cleanDir,
        minLen = 12, k = 4, w = 5)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(docs.take(2): _*)
      q.processAllAvailable()
      src.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val read = (df: org.apache.spark.sql.DataFrame) => df
      .select("id", "text", "n_cut").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val streamed = read(spark.read.parquet(cleanDir))
    val batch = read(graft.operators.SubstringDedup.removeContaminatedSpans(
      docs.toDF("id", "text"), eval, minLen = 12, k = 4, w = 5))
    // per-doc gate against fixed eval state = no cross-batch coupling:
    // the union of per-batch outputs IS the batch result
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed.find(_._1 == 1L).get._2 == "0000" + "1111")
    assert(streamed.find(_._1 == 3L).get._2 == "", "eval copy scrubbed empty")
    assert(streamed.find(_._1 == 2L).get._3 == 0)
    // arrival batch recorded per row — now a PARTITION directory
    // (batch-scoped overwrite = replay idempotence), still a column
    val bids = spark.read.parquet(cleanDir)
      .select(col("id"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bids(1L) == 0L && bids(4L) == 1L, s"batch ids: $bids")
    // replay idempotence: a poisoned partial attempt of batch 1 is
    // REWRITTEN, not appended to, when the batch lands again
    Seq((99L, "garbage", 0)).toDF("id", "text", "n_cut")
      .write.mode("overwrite").parquet(s"$cleanDir/batch_id=1")
    graft.operators.SubstringDedup.removeContaminatedSpans(
        docs.drop(2).toDF("id", "text"), eval, minLen = 12, k = 4, w = 5)
      .write.mode("overwrite").parquet(s"$cleanDir/batch_id=1")
    assert(read(spark.read.parquet(cleanDir)) == batch,
      "batch-scoped rewrite must restore the exact batch result")
  }

  test("streaming chunk index ≡ batch chunk+embed on replay across batches") {
    val dir = Files.createTempDirectory("graft_chunk_stream").toString
    val (idxDir, ckpt) = (s"$dir/index", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val stream = src.toDF.toDF("doc_id", "text")
    val q = StreamingIngest.chunkIndexWriter(stream, window = 4, stride = 3)
      .option("checkpointLocation", ckpt)
      .option("path", idxDir)
      .start()
    val docs = Seq(
      1L -> "one two three four five six seven",      // 2 chunks + tail
      2L -> "tiny",                                    // sub-window
      3L -> "",                                        // no tokens -> no rows
      4L -> (1 to 11).map(i => s"w$i").mkString(" "))  // multi-window
    try {
      src.addData(docs(0), docs(1))
      q.processAllAvailable()
      src.addData(docs(2), docs(3))
      q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("chunk_id", "doc_id", "chunk_idx", "n_tokens", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Seq[Float]](4).toList))
      .toSet
    val streamed = canon(spark.read.parquet(idxDir))
    val batch = canon(StreamingIngest.chunkEmbed(
      docs.toDF("doc_id", "text"), window = 4, stride = 3))
    // chunk+embed is stateless per-row: the union of per-batch outputs
    // IS the batch result, bit-for-bit including the embeddings
    assert(streamed == batch)
    assert(streamed.exists(_._1 == "4:2"), "doc 4 reaches chunk_idx 2")
    assert(!streamed.exists(_._2 == 3L), "tokenless doc emits no chunks")
    streamed.foreach { case (_, _, _, n, emb) =>
      assert(emb.length == 16 && n >= 1)
      val nrm = math.sqrt(emb.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-6, s"unit norm, got $nrm")
    }
  }

  test("streaming bucketed chunk index: batch-identical buckets, pruned probe scans") {
    val dir = Files.createTempDirectory("graft_bucket_stream").toString
    val (idxDir, ckpt) = (s"$dir/index", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = StreamingIngest
      .chunkIndexBucketedWriterTo(src.toDF.toDF("doc_id", "text"), idxDir,
        window = 4, stride = 3)
      .option("checkpointLocation", ckpt)
      .start()
    val docs = Seq(
      1L -> "one two three four five six seven",
      2L -> (1 to 9).map(i => s"w$i").mkString(" "),
      3L -> "alpha beta gamma delta epsilon zeta")
    try {
      src.addData(docs(0), docs(1))
      q.processAllAvailable()
      // batch 2 re-sends doc 1's text under a NEW doc_id: same chunks →
      // same buckets → those bucket dirs now hold files from TWO batches
      // (the small-files accumulation the compaction below collapses)
      src.addData(docs(2), 4L -> docs(0)._2)
      q.processAllAvailable()
    } finally q.stop()
    // bucket assignment identical to the batch construction
    val streamed = spark.read.parquet(idxDir)
      .select(col("chunk_id"), col("bucket").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = StreamingIngest.chunkEmbed(
        (docs :+ (4L -> docs(0)._2)).toDF("doc_id", "text"),
        window = 4, stride = 3)
      .select(col("chunk_id"),
        graft.operators.Ann.lshBucket(col("embedding"), 16, 4).cast("long")
          .as("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
    // a probe-side bucket filter reaches the scan as a partition filter
    val someBucket = streamed.head._2
    val plan = spark.read.parquet(idxDir)
      .filter(col("bucket") === someBucket)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket filter must prune partitions:\n$plan")

    // COMPACTION (r12): per-batch appends leave multiple file sets per
    // bucket dir; compactBucketedCorpus must collapse each to one file
    // with identical content and intact pruning
    def bucketFiles: Map[String, Int] =
      new java.io.File(idxDir).listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(bucketFiles.values.exists(_ > 1),
      s"fixture must produce multi-file buckets first: $bucketFiles")
    graft.operators.Ann.compactBucketedCorpus(spark, idxDir)
    val after = bucketFiles
    assert(after.values.forall(_ == 1), s"buckets not compacted: $after")
    val compacted = spark.read.parquet(idxDir)
      .select(col("chunk_id"), col("bucket").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(compacted == streamed, "compaction changed the index content")
    val plan2 = spark.read.parquet(idxDir)
      .filter(col("bucket") === someBucket)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("PartitionFilters") && plan2.contains("bucket"),
      s"pruning lost after compaction:\n$plan2")
    assert(!new java.io.File(idxDir + ".swap.tmp").exists &&
      !new java.io.File(idxDir + ".swap.old").exists, "swap left debris")

    // GEOMETRY manifest (r15 verdict #2): the path-bound writer stamped
    // it before the query started, compaction carried it through the
    // swap, a mismatched probe fails LOUDLY, and the auto probe takes
    // the geometry from the store
    import graft.operators.Ann
    assert(Ann.readGeometry(spark, idxDir) == Some(Ann.StoreGeometry(16, 4, 1)),
      "bucketed chunk index lost its _GEOMETRY through compaction")
    val qvec = StreamingIngest.chunkEmbed(
        Seq(1L -> docs(0)._2).toDF("doc_id", "text"), window = 4, stride = 3)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    intercept[IllegalArgumentException] {
      Ann.topKFromBucketedCorpus(spark, idxDir, qvec, k = 3, dim = 16,
        nPlanes = 6)
    }
    // a RESTART under a changed nPlanes fails at stamp time, before any
    // wrongly-bucketed row can land
    intercept[IllegalArgumentException] {
      StreamingIngest.chunkIndexBucketedWriterTo(
        src.toDF.toDF("doc_id", "text"), idxDir,
        window = 4, stride = 3, nPlanes = 6)
    }
  }
}
