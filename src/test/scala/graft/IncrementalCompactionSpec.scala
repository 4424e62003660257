package graft

import java.nio.file.Files

import graft.operators.{Ann, GraphBuild, Ingest}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental (touched-directory) store maintenance — r14 verdict #2:
  * per-cycle compaction cost must track recent appends, not store size.
  *
  *  - the ann store's hot-bucket fold ([[Ann
  *    .compactMultiTableCorpusIncremental]]) rewrites ONLY directories
  *    whose file count crossed the threshold, leaves cold directories
  *    untouched, and is probe-result-invisible;
  *  - crash windows of the per-directory swap heal ([[graft.sources
  *    .Sinks.recoverPartitionDirSwaps]]), including THROUGH the probe
  *    (a stranded aside must never silently drop candidates);
  *  - the hash-bucketed edge log ([[GraphBuild.appendEdgeDeltaBucketed]])
  *    reads identically to the flat log and compacts incrementally;
  *  - geometry migration ([[Ann.regeometryMultiTableCorpus]]) is
  *    byte-equivalent to a fresh backfill at the new geometry;
  *  - the COMPOSED writer ([[StreamingIngest.ingestWriterIndexedBloom]],
  *    r14 verdict #1) = indexed KNN loop + Bloom-fronted dedup +
  *    incremental compaction ≡ the plain indexed writer on a
  *    duplicate-bearing stream, across a restart.
  */
class IncrementalCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(dim = 8)

  private def docsFrame(rows: Seq[(String, Long)]): DataFrame =
    Ingest.prepare(
        rows.map { case (d, s) => ("text", d, s) }.toDF("mtype", "data", "seq"),
        conf)
      .select("id", "mtype", "embedding")

  private def dataFiles(dir: String): Map[String, Set[String]] = {
    val root = new java.io.File(dir)
    val kids = Option(root.listFiles()).getOrElse(Array.empty)
    kids.filter(f => f.isDirectory && !f.getName.startsWith("_"))
      .map { d =>
        d.getName -> d.listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(_.getName).toSet
      }.toMap
  }

  private def probe(dir: String, queries: DataFrame,
      nPlanes: Int, nTables: Int): Set[(String, String, Double)] =
    Ann.multiTableStoreCandidates(spark, dir, queries, 8, nPlanes, nTables, conf)
      .select("qid", "id", "sim").collect()
      .map(r => (r.getString(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  test("incremental ann compaction: probe-identical, only hot buckets rewritten, replay rows folded") {
    val dir = Files.createTempDirectory("graft_inccomp").toString + "/ann"
    val (np, nt) = (3, 2)
    val base = docsFrame((0 until 40).map(i => (s"inc base doc $i", i.toLong)))
    Ann.backfillMultiTableCorpus(base, dir, 8, np, nt)
    val hot = docsFrame(Seq(("inc hot doc A", 100L), ("inc hot doc B", 101L)))
    // three replayed appends of the same batch: its buckets go hot AND
    // accumulate duplicate rows (the at-least-once crash shape)
    (1 to 3).foreach(_ => Ann.appendMultiTableBatch(hot, dir, 8, np, nt))
    val cold = docsFrame(Seq(("inc cold doc C", 102L), ("inc cold doc D", 103L)))
    Ann.appendMultiTableBatch(cold, dir, 8, np, nt)
    spark.catalog.refreshByPath(dir)

    val queries = base.limit(3).unionByName(hot.limit(1))
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val before = probe(dir, queries, np, nt)
    val filesBefore = dataFiles(dir)

    val compacted = Ann.compactMultiTableCorpusIncremental(
      spark, dir, maxFilesPerBucket = 2).toSet
    val filesAfter = dataFiles(dir)

    // exactly the above-threshold dirs were rewritten...
    val overThreshold = filesBefore.collect {
      case (d, fs) if fs.size > 2 => d
    }.toSet
    assert(compacted == overThreshold,
      s"compacted $compacted vs over-threshold $overThreshold")
    assert(compacted.nonEmpty, "test must exercise a real compaction")
    // ...cold dirs untouched byte-for-byte (same file names)...
    filesBefore.foreach { case (d, fs) =>
      if (!compacted(d))
        assert(filesAfter(d) == fs, s"cold dir $d was rewritten")
    }
    // ...hot dirs folded to fewer files with replay duplicates gone
    compacted.foreach { d =>
      assert(filesAfter(d).size <= 2, s"hot dir $d not folded: ${filesAfter(d)}")
      val rows = spark.read.parquet(s"$dir/$d")
      assert(rows.count() == rows.select("id").distinct().count(),
        s"replay duplicates survive in compacted $d")
    }
    // ...and the probe result is identical
    assert(probe(dir, queries, np, nt) == before,
      "incremental compaction changed probe results")

    // steady state: a second pass is a metadata-only no-op
    assert(Ann.compactMultiTableCorpusIncremental(spark, dir, 2).isEmpty)
  }

  test("writer-fed explicit compaction ≡ listing-form: tracked appends name exactly the touched dirs; results identical (r15 verdict #4)") {
    val root = Files.createTempDirectory("graft_explcomp").toString
    val (np, nt) = (3, 2)
    val (byList, byFed) = (s"$root/list/ann", s"$root/fed/ann")
    val base = docsFrame((0 until 40).map(i => (s"expl base doc $i", i.toLong)))
      .localCheckpoint()
    val hot = docsFrame(Seq(("expl hot doc A", 100L), ("expl hot doc B", 101L)))
      .localCheckpoint()
    val fed = scala.collection.mutable.Set[Int]()
    Seq(byList, byFed).foreach(d => Ann.backfillMultiTableCorpus(base, d, 8, np, nt))
    (1 to 3).foreach { _ =>
      Ann.appendMultiTableBatch(hot, byList, 8, np, nt)
      fed ++= Ann.appendMultiTableBatchTracked(hot, byFed, 8, np, nt)
    }
    // the tracked append reports exactly the dirs the batch wrote: its
    // vectors explode to one tb per table
    val expectTbs = spark.read.parquet(byFed)
      .join(hot.select("id"), Seq("id"), "left_semi")
      .select("tb").distinct().collect().map(_.getInt(0)).toSet
    assert(fed.toSet == expectTbs, s"tracked $fed vs actual $expectTbs")

    val queries = base.limit(3).unionByName(hot.limit(1))
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val wantProbe = probe(byList, queries, np, nt)
    val cList = Ann.compactMultiTableCorpusIncremental(
      spark, byList, maxFilesPerBucket = 2).toSet
    val cFed = Ann.compactMultiTableCorpusIncrementalExplicit(
      spark, byFed, fed.toSeq, maxFilesPerBucket = 2).toSet
    // identical hot set found without any root listing, identical
    // folded layout, identical probe results
    assert(cFed == cList && cFed.nonEmpty, s"explicit $cFed vs listing $cList")
    assert(dataFiles(byFed).view.mapValues(_.size).toMap ==
      dataFiles(byList).view.mapValues(_.size).toMap)
    assert(probe(byFed, queries, np, nt) == wantProbe)
    assert(probe(byList, queries, np, nt) == wantProbe)
    // absent / never-touched candidates are skipped, not an error
    assert(Ann.compactMultiTableCorpusIncrementalExplicit(
      spark, byFed, Seq(999999), maxFilesPerBucket = 2).isEmpty)
  }

  test("crash windows of the per-directory swap heal, including through the probe") {
    val dir = Files.createTempDirectory("graft_inccrash").toString + "/ann"
    val (np, nt) = (3, 2)
    val docs = docsFrame((0 until 20).map(i => (s"crash doc $i", i.toLong)))
    Ann.backfillMultiTableCorpus(docs, dir, 8, np, nt)
    val queries = docs.limit(4)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val healthy = probe(dir, queries, np, nt)

    // crash between the two renames: live dir missing, aside present
    val victim = dataFiles(dir).keys.head
    val fs = new java.io.File(dir)
    val oldRoot = new java.io.File(fs, "_graft_compact_old")
    assert(oldRoot.mkdirs())
    assert(new java.io.File(fs, victim).renameTo(new java.io.File(oldRoot, victim)))
    // plus stale tmp debris from the interrupted write
    val tmpRoot = new java.io.File(fs, "_graft_compact_tmp/" + victim)
    assert(tmpRoot.mkdirs())
    Files.writeString(tmpRoot.toPath.resolve("part-stale.parquet"), "debris")
    spark.catalog.refreshByPath(dir)

    // the probe self-heals: candidates from the stranded bucket are back
    assert(probe(dir, queries, np, nt) == healthy,
      "probe after crash-window heal diverged")
    assert(new java.io.File(fs, victim).exists(), "aside not renamed back")
    assert(!new java.io.File(fs, "_graft_compact_tmp").exists(), "stale tmp survives")
    assert(!oldRoot.exists(), "empty aside root survives")

    // completed-swap-but-cleanup-died window: live present + aside copy
    assert(oldRoot.mkdirs())
    val superseded = new java.io.File(oldRoot, victim)
    assert(superseded.mkdirs())
    Files.writeString(superseded.toPath.resolve("part-old.parquet"), "superseded")
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, dir)
    assert(!superseded.exists(), "superseded aside must be dropped")
    assert(probe(dir, queries, np, nt) == healthy)
  }

  test("bucketed edge log reads like the flat log and compacts incrementally") {
    val dir = Files.createTempDirectory("graft_ebedges").toString
    val (flatDir, ebDir) = (s"$dir/flat", s"$dir/eb")
    def delta(seqBase: Long, score: Double) =
      (0 until 12).map(i =>
        (s"doc:${i % 4}", s"doc:${4 + i % 6}", score + i, seqBase + i))
        .toDF("src", "dst", "score", "seq")
    // three delta waves re-writing the same pairs: latest-wins has work
    (0 until 3).foreach { w =>
      val d = delta(w * 100L, w * 10.0)
      d.write.mode("append").parquet(flatDir)
      GraphBuild.appendEdgeDeltaBucketed(d, ebDir, nBuckets = 4)
    }
    def view(d: String) = GraphBuild.latestWins(spark.read.parquet(d))
      .select("src", "dst", "score", "seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val flat = view(flatDir)
    assert(view(ebDir) == flat, "bucketed log diverged from flat log")

    val compacted = GraphBuild.compactEdgesIncremental(
      spark, ebDir, maxFilesPerBucket = 1)
    assert(compacted.nonEmpty, "must compact the multi-wave buckets")
    assert(view(ebDir) == flat, "incremental edge compaction changed the view")
    // compacted buckets hold exactly their latest-wins rows
    compacted.foreach { d =>
      val rows = spark.read.parquet(s"$ebDir/$d")
      assert(rows.count() ==
        rows.select("src", "dst").distinct().count(),
        s"superseded deltas survive in compacted $d")
    }
    // a later delta still wins over the compacted rows (seq retained)
    val late = Seq(("doc:0", "doc:4", 999.0, 900L)).toDF("src", "dst", "score", "seq")
    GraphBuild.appendEdgeDeltaBucketed(late, ebDir, nBuckets = 4)
    spark.catalog.refreshByPath(ebDir)
    assert(view(ebDir).contains(("doc:0", "doc:4", 999.0, 900L)))
  }

  test("regeometry migration ≡ fresh backfill at the new geometry") {
    val dir = Files.createTempDirectory("graft_regeo").toString
    val (oldDir, freshDir) = (s"$dir/store", s"$dir/fresh")
    val wave1 = docsFrame((0 until 15).map(i => (s"regeo doc $i", i.toLong)))
    val wave2 = docsFrame((15 until 25).map(i => (s"regeo doc $i", i.toLong)))
    Ann.backfillMultiTableCorpus(wave1, oldDir, 8, nPlanes = 3, nTables = 2)
    Ann.appendMultiTableBatch(wave2, oldDir, 8, 3, 2)
    // a replayed append: migration must not resurrect duplicates
    Ann.appendMultiTableBatch(wave2, oldDir, 8, 3, 2)
    spark.catalog.refreshByPath(oldDir)

    Ann.regeometryMultiTableCorpus(spark, oldDir, 8, newPlanes = 4, newTables = 3)
    Ann.backfillMultiTableCorpus(
      wave1.unionByName(wave2), freshDir, 8, nPlanes = 4, nTables = 3)

    def store(d: String) = spark.read.parquet(d)
      .select("id", "mtype", "tb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(store(oldDir) == store(freshDir),
      "migrated store diverged from fresh backfill at the new geometry")
    assert(spark.read.parquet(oldDir).count() == store(oldDir).size.toLong,
      "migration must fold replay duplicates")
    // probes at the NEW geometry agree between migrated and fresh
    val queries = wave1.limit(3)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    assert(probe(oldDir, queries, 4, 3) == probe(freshDir, queries, 4, 3))
  }

  test("composed writer (indexed + bloom + incremental compaction) ≡ plain indexed writer, across a restart") {
    val dir = Files.createTempDirectory("graft_composed").toString
    implicit val sqlCtx = spark.sqlContext
    // cap 1 byte: every post-empty batch takes the stored probe arm
    val cconf = GraftConf(dim = 8, bruteCorpusWarnBytes = 1L)
    val batches = Seq(
      Seq(("text", "composed alpha doc", 1L), ("text", "composed beta doc", 2L)),
      Seq(("text", "composed gamma doc", 3L), ("text", "composed alpha doc", 4L)),
      Seq(("image", "composed delta doc", 5L), ("text", "composed beta doc", 6L)),
      Seq(("text", "composed epsilon doc", 7L), ("image", "composed zeta doc", 8L)))

    // composed arm — bloom dedup + bucketed edges + tight compaction
    // cadence so the incremental fold runs mid-stream
    val src = MemoryStream[(String, String, Long)]
    def startComposed() = StreamingIngest.ingestWriterIndexedBloom(
        src.toDF.toDF("mtype", "data", "seq"),
        s"$dir/c_docs", s"$dir/c_edges", s"$dir/c_ann", cconf,
        nPlanes = 3, nTables = 2, compactEvery = 2, maxFilesPerBucket = 1,
        edgeBuckets = 4, expectedItems = 1000L)
      .option("checkpointLocation", s"$dir/c_ckpt").start()
    val q = startComposed()
    try {
      batches.take(3).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // restart: bloom rebuilds from the store; pre-restart dups still drop
    val q2 = startComposed()
    try {
      src.addData(batches(3): _*); q2.processAllAvailable()
      src.addData(("text", "composed alpha doc", 9L),
        ("text", "composed eta doc", 10L))
      q2.processAllAvailable()
    } finally q2.stop()

    // plain indexed arm over the identical trace (flat edges, plain dedup)
    val src2 = MemoryStream[(String, String, Long)]
    val q3 = StreamingIngest.ingestWriterIndexed(
        src2.toDF.toDF("mtype", "data", "seq"),
        s"$dir/p_docs", s"$dir/p_edges", s"$dir/p_ann", cconf,
        nPlanes = 3, nTables = 2)
      .option("checkpointLocation", s"$dir/p_ckpt").start()
    try {
      (batches :+ Seq(("text", "composed alpha doc", 9L),
        ("text", "composed eta doc", 10L)))
        .foreach { b => src2.addData(b: _*); q3.processAllAvailable() }
    } finally q3.stop()

    def docIds(d: String) = spark.read.parquet(d)
      .select("id").collect().map(_.getString(0)).toSet
    def edges(d: String) = GraphBuild.latestWins(spark.read.parquet(d))
      .select("src", "dst", "score", "seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val cDocs = docIds(s"$dir/c_docs")
    assert(cDocs == docIds(s"$dir/p_docs"), "composed/plain doc stores diverged")
    assert(cDocs.size == 7, s"dedup miscount: $cDocs")
    assert(edges(s"$dir/c_edges") == edges(s"$dir/p_edges"),
      "composed/plain edge stores diverged (bloom or bucketed layout broke the loop)")
    // the composed ann store converged (incremental compaction ran) and
    // carries each doc once per table in live buckets
    val ann = spark.read.parquet(s"$dir/c_ann")
    assert(ann.select("id").distinct().count() == 7)
  }
}
