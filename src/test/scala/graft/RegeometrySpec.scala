package graft

import java.nio.file.Files

import graft.operators.{Ann, GraphBuild, Ingest}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The at-rest multi-table store's GEOMETRY lifecycle (r14 verdict #3,
  * made self-driving this round):
  *
  *  - the store carries its own LSH geometry in a `_GEOMETRY` manifest
  *    — stamped on first write, enforced on every append/probe (a
  *    mismatched geometry reads the WRONG bucket directories and is
  *    silently incorrect; the requires turn that class into a loud
  *    failure), preserved through whole-store compaction, and rewritten
  *    ATOMICALLY with the data by the migration swap;
  *  - [[StreamingIngest.ingestWriterIndexedBloom]]'s auto-regeometry
  *    (`targetRowsPerBucket`) pulls the migration lever at the measured
  *    occupancy threshold: results equal a MANUAL migration at the same
  *    batch, and a checkpoint-recovered restart adopts the migrated
  *    geometry from the manifest instead of the configured one.
  */
class RegeometrySpec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(dim = 8)

  private def docsFrame(rows: Seq[(String, Long)]): DataFrame =
    Ingest.prepare(
        rows.map { case (d, s) => ("text", d, s) }.toDF("mtype", "data", "seq"),
        conf)
      .select("id", "mtype", "embedding")

  private def probe(dir: String, queries: DataFrame,
      nPlanes: Int, nTables: Int): Set[(String, String, Double)] =
    Ann.multiTableStoreCandidates(spark, dir, queries, 8, nPlanes, nTables, conf)
      .select("qid", "id", "sim").collect()
      .map(r => (r.getString(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  test("geometry manifest: stamped on first write, enforced on append/probe, " +
      "carried through compaction, republished atomically by migration") {
    val dir = Files.createTempDirectory("graft_geom").toString + "/ann"
    val docs = docsFrame((0 until 12).map(i => (s"manifest doc $i", i.toLong)))
      .localCheckpoint()
    val queries = docs.limit(2)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()

    Ann.backfillMultiTableCorpus(docs, dir, 8, nPlanes = 3, nTables = 2)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 3, 2)))

    // mismatched geometry is a LOUD failure, not wrong candidates
    intercept[IllegalArgumentException] {
      Ann.appendMultiTableBatch(docs, dir, 8, nPlanes = 4, nTables = 2)
    }
    intercept[IllegalArgumentException] {
      Ann.multiTableStoreCandidates(spark, dir, queries, 8, 3, 3, conf)
    }

    // maintenance preserves the manifest: the whole-store swap carries
    // it into the rewritten dir; the per-bucket incremental fold never
    // touches root files
    val before = probe(dir, queries, 3, 2)
    Ann.compactMultiTableCorpus(spark, dir)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 3, 2)))
    Ann.compactMultiTableCorpusIncremental(spark, dir, maxFilesPerBucket = 1)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 3, 2)))
    assert(probe(dir, queries, 3, 2) == before,
      "manifest maintenance must be probe-invisible")

    // migration republishes data + manifest in one rename: afterwards
    // the OLD geometry is rejected and the manifest says the new one
    Ann.regeometryMultiTableCorpus(spark, dir, 8, newPlanes = 4, newTables = 3)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 4, 3)))
    intercept[IllegalArgumentException] { probe(dir, queries, 3, 2) }
    assert(probe(dir, queries, 4, 3).nonEmpty)
  }

  test("mid-migration crash window heals: the aside store (data + manifest) " +
      "swaps back before any probe, backfill decision, or geometry adoption") {
    val root = Files.createTempDirectory("graft_migcrash").toString
    val dir = s"$root/ann"
    val docs = docsFrame((0 until 10).map(i => (s"migcrash doc $i", i.toLong)))
      .localCheckpoint()
    val queries = docs.limit(2)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    Ann.backfillMultiTableCorpus(docs, dir, 8, nPlanes = 3, nTables = 2)
    Ann.regeometryMultiTableCorpus(spark, dir, 8, newPlanes = 4, newTables = 3)
    val before = probe(dir, queries, 4, 3)

    // the EXACT whole-dir swap crash window: live dir renamed aside,
    // nothing renamed back in — the store (and its _GEOMETRY) exists
    // only in the aside slot
    def crashWindow(): Unit = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
        new org.apache.hadoop.fs.Path(dir + ".swap.old")))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    }
    crashWindow()
    // the probe heals the window and serves the MIGRATED store intact
    assert(probe(dir, queries, 4, 3) == before,
      "probe through the crash window lost the migrated store")
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 4, 3)))

    // an APPEND as the first post-crash operation must heal first too
    // (r15 ADVICE #2): without it the append re-creates the live dir
    // holding only the delta at the CONFIGURED geometry, and the next
    // swap deletes the aside — the entire prior store — as superseded
    crashWindow()
    val extra = docsFrame(Seq(("migcrash append-window doc", 50L)))
      .localCheckpoint()
    Ann.appendMultiTableBatch(extra, dir, 8, nPlanes = 4, nTables = 3)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 4, 3)))
    assert(before.subsetOf(probe(dir, queries, 4, 3)),
      "append through the crash window lost prior-store candidates")
    // and the append itself LANDED: probing with the appended doc's own
    // vector must surface the appended doc (same bucket in every table)
    val extraId = extra.select("id").collect().head.getString(0)
    val extraQ = extra.select(col("id").as("qid"),
      col("embedding").as("qvec")).localCheckpoint()
    assert(probe(dir, extraQ, 4, 3).exists(_._2 == extraId),
      "append through the crash window failed to land the appended doc")

    // a WHOLE-STORE compaction as the first post-crash operation must
    // heal before its manifest read (r15 ADVICE #1): otherwise the
    // recovered store republishes WITHOUT its _GEOMETRY and silently
    // regresses to configured-geometry fallback on later probes
    crashWindow()
    Ann.compactMultiTableCorpus(spark, dir)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 4, 3)),
      "compaction through the crash window dropped the manifest")
    assert(before.subsetOf(probe(dir, queries, 4, 3)))

    // a restarting writer configured at the ORIGINAL geometry must heal
    // first and adopt the migrated manifest — not decide "no ann store",
    // re-backfill at p3t2, and discard the migration
    crashWindow()
    val docsDir = s"$root/docs"
    // a populated docs store so the backfill-if-absent branch is LIVE
    // bait: without the heal-first ordering the writer would see
    // docs-present + ann-missing and rebuild at p3t2
    docsFrame((0 until 10).map(i => (s"migcrash doc $i", i.toLong)))
      .withColumn("data", lit("d")).select("id", "mtype", "data", "embedding")
      .write.mode("overwrite").parquet(docsDir)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    val q = StreamingIngest.ingestWriterIndexedBloom(
        src.toDF.toDF("mtype", "data", "seq"),
        docsDir, s"$root/edges", dir,
        GraftConf(dim = 8, bruteCorpusWarnBytes = 1L),
        nPlanes = 3, nTables = 2, expectedItems = 1000L)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      src.addData(("text", "migcrash fresh doc", 99L))
      q.processAllAvailable()
    } finally q.stop()
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(8, 4, 3)),
      "writer restart through the crash window regressed the migrated geometry")
    assert(probe(dir, queries, 4, 3).nonEmpty)
  }

  test("composed writer auto-migrates at the occupancy threshold; " +
      "≡ manual migration at the same batches, across a restart") {
    val dir = Files.createTempDirectory("graft_autoregeo").toString
    implicit val sqlCtx = spark.sqlContext
    // cap 1 byte: every post-empty batch takes the stored probe arm
    val cconf = GraftConf(dim = 8, bruteCorpusWarnBytes = 1L)
    // 3 fresh docs per batch; target 1 row/bucket from p2 (threshold
    // 1<<2 = 4 rows): batch1 ends at 6 > 4 -> migrate to p3 ON the
    // compaction cadence (covers the skip-ann-fold branch); batch2 ends
    // at 9 > 1<<3 -> migrate to p4; batch3/4 stay under 1<<4 = 16
    def mkBatch(b: Int): Seq[(String, String, Long)] =
      (0 until 3).map(i =>
        ("text", s"autoregeo doc ${b * 3 + i}", (b * 10 + i).toLong))
    val batches = (0 until 5).map(mkBatch)

    val src = MemoryStream[(String, String, Long)]
    def startAuto() = StreamingIngest.ingestWriterIndexedBloom(
        src.toDF.toDF("mtype", "data", "seq"),
        s"$dir/a_docs", s"$dir/a_edges", s"$dir/a_ann", cconf,
        nPlanes = 2, nTables = 2, compactEvery = 2, maxFilesPerBucket = 1,
        edgeBuckets = 4, expectedItems = 1000L,
        targetRowsPerBucket = 1L, maxPlanes = 8)
      .option("checkpointLocation", s"$dir/a_ckpt").start()
    val q = startAuto()
    try {
      batches.take(4).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(Ann.readGeometry(spark, s"$dir/a_ann") ==
      Some(Ann.StoreGeometry(8, 4, 2)),
      "two occupancy crossings must have migrated p2 -> p3 -> p4")

    // restart with the ORIGINAL configured geometry: the writer must
    // adopt p4 from the manifest, not regress to p2
    val q2 = startAuto()
    try {
      src.addData(batches(4): _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(Ann.readGeometry(spark, s"$dir/a_ann") ==
      Some(Ann.StoreGeometry(8, 4, 2)))

    // manual replay: the same batches through processBatchIndexed with
    // the migration lever pulled BY HAND after batches 1 and 2
    def manualBatch(b: Int, p: Int): Unit =
      StreamingIngest.processBatchIndexed(spark,
        batches(b).toDF("mtype", "data", "seq"), b.toLong,
        s"$dir/m_docs", s"$dir/m_edges", s"$dir/m_ann", cconf,
        nPlanes = p, nTables = 2, edgeBuckets = 4).unpersist()
    manualBatch(0, 2); manualBatch(1, 2)
    Ann.regeometryMultiTableCorpus(spark, s"$dir/m_ann", 8, 3, 2)
    manualBatch(2, 3)
    Ann.regeometryMultiTableCorpus(spark, s"$dir/m_ann", 8, 4, 2)
    manualBatch(3, 4); manualBatch(4, 4)

    def docIds(d: String) = spark.read.parquet(d)
      .select("id").collect().map(_.getString(0)).toSet
    def edges(d: String) = GraphBuild.latestWins(spark.read.parquet(d))
      .select("src", "dst", "score", "seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    def annRows(d: String) = spark.read.parquet(d)
      .select("id", "mtype", "tb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(docIds(s"$dir/a_docs") == docIds(s"$dir/m_docs"))
    assert(edges(s"$dir/a_edges") == edges(s"$dir/m_edges"),
      "auto-migration changed the KNN results vs a manual migration at " +
        "the same batches")
    assert(annRows(s"$dir/a_ann") == annRows(s"$dir/m_ann"),
      "auto-migrated store diverged from the manually migrated one")
  }
  test("stampBucketedGeometry refuses pre-manifest bucket= data; fresh dirs and matching manifests stamp fine (r16 ADVICE #3)") {
    val root = Files.createTempDirectory("graft_stamp").toString
    import spark.implicits._
    // a pre-manifest bucketed layout: data exists, no _GEOMETRY — the
    // caller's geometry is UNVERIFIED against it, and stamping it would
    // make a possibly-wrong layout authoritative for the Auto probe
    val dir = s"$root/premanifest"
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .withColumn("bucket", lit(3L))
      .write.partitionBy("bucket").parquet(dir)
    intercept[IllegalArgumentException] {
      Ann.stampBucketedGeometry(spark, dir, 8, 4)
    }
    assert(Ann.readGeometry(spark, dir).isEmpty,
      "refused stamp must not leave a manifest behind")
    // a FRESH (empty) target stamps; a restart at the same geometry
    // re-stamps idempotently; a changed geometry fails loudly
    val fresh = s"$root/fresh"
    Ann.stampBucketedGeometry(spark, fresh, 8, 4)
    Ann.stampBucketedGeometry(spark, fresh, 8, 4)
    assert(Ann.readGeometry(spark, fresh) == Some(Ann.StoreGeometry(8, 4, 1)))
    intercept[IllegalArgumentException] {
      Ann.stampBucketedGeometry(spark, fresh, 8, 5)
    }
  }
}
