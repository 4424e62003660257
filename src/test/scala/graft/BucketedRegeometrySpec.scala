package graft

import java.nio.file.Files

import graft.operators.Ann
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The SINGLE-TABLE bucketed ANN corpus's geometry lifecycle (r17
  * verdict #1 — the round's one `weak`): the layout that serves the
  * streamed chunk index gets the same self-managing discipline the
  * multi-table store (RegeometrySpec) and the signature stores
  * (IncrementalAdmissionSpec) already carry —
  *
  *  - [[Ann.appendBucketedBatch]] grows the store at the MANIFEST
  *    geometry (never the caller's guess);
  *  - [[Ann.rebucketBucketedCorpus]] migrates the whole store to a new
  *    plane count behind the crash-safe swap, `_GEOMETRY` re-stamped
  *    atomically with the data, and the migrated store is
  *    probe-identical to a fresh index at the new geometry;
  *  - [[StreamingIngest.chunkIndexBucketedWriterAuto]] pulls the lever
  *    itself at the occupancy threshold and a restart adopts the
  *    migrated manifest.
  */
class BucketedRegeometrySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic unit vectors keyed by id (the Embed stub). */
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map(i => (i.toString, s"bucketed regeom doc $i"))
      .toDF("id", "text")
      .select(col("id"),
        graft.operators.Embed.embedText(col("text"), 16).as("embedding"))

  private def batchProbe(dir: String, queries: DataFrame, probes: Int = 2)
      : Set[(String, String, Double, Int)] =
    Ann.topKFromBucketedCorpusBatch(spark, dir, queries, k = 3,
        probes = probes)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSet

  test("rebucketBucketedCorpus: probe-invariant vs a fresh index at the new " +
      "geometry, manifest republished atomically, appends continue, replay " +
      "duplicates fold away, pre-manifest refuses (r17 verdict #1)") {
    val root = Files.createTempDirectory("graft_bregeo").toString
    val dir = s"$root/corpus"
    val wave1 = vecs(0L until 12L).localCheckpoint()
    val wave2 = vecs(12L until 20L).localCheckpoint()
    val queries = vecs(Seq(2L, 7L, 15L))
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()

    Ann.writeBucketedCorpus(wave1, dir, dim = 16, nPlanes = 2)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(16, 2, 1)))
    Ann.appendBucketedBatch(wave2, dir)
    // a replayed append (at-least-once foreachBatch): bit-identical rows
    Ann.appendBucketedBatch(wave2, dir)

    // migrate 2 -> 4 planes; the manifest travels with the data
    Ann.rebucketBucketedCorpus(spark, dir, newPlanes = 4)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(16, 4, 1)))
    // the replay duplicates folded away in passing (full-row dedup)
    assert(spark.read.parquet(dir).count() == 20L,
      "migration must converge replay-duplicated rows")

    // probe-invariance: the migrated store equals a FRESH nPlanes=4 index
    val fresh = s"$root/fresh"
    Ann.writeBucketedCorpus(wave1.unionByName(wave2), fresh,
      dim = 16, nPlanes = 4)
    assert(batchProbe(dir, queries) == batchProbe(fresh, queries),
      "migrated store's probe diverged from a fresh index at nPlanes=4")
    // every stored row landed in the directory its embedding buckets to
    val misplaced = spark.read.parquet(dir)
      .filter(col("bucket") =!=
        Ann.lshBucket(col("embedding"), 16, 4).cast("int"))
      .count()
    assert(misplaced == 0L, s"$misplaced rows in the wrong bucket dir")

    // the store keeps WORKING at the new geometry: an append computes
    // nPlanes=4 buckets from the manifest, and the appended doc is its
    // own top-1 under the pruned probe
    val extra = vecs(Seq(99L)).localCheckpoint()
    Ann.appendBucketedBatch(extra, dir)
    val extraQ = extra.select(col("id").as("qid"),
      col("embedding").as("qvec")).localCheckpoint()
    assert(batchProbe(dir, extraQ).exists(t => t._2 == "99" && t._4 == 1),
      "post-migration append did not land probe-visible")

    // incremental compaction preserves content + manifest + probes
    val before = batchProbe(dir, queries)
    Ann.compactBucketedCorpusIncremental(spark, dir, maxFilesPerBucket = 1)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(16, 4, 1)))
    assert(batchProbe(dir, queries) == before,
      "incremental compaction must be probe-invisible")

    // pre-manifest stores refuse loudly everywhere
    val bare = s"$root/bare"
    vecs(0L until 4L).withColumn("bucket", lit(0L))
      .write.partitionBy("bucket").parquet(bare)
    intercept[IllegalArgumentException] {
      Ann.rebucketBucketedCorpus(spark, bare, 4)
    }
    intercept[IllegalArgumentException] { Ann.appendBucketedBatch(wave2, bare) }
    intercept[IllegalArgumentException] { batchProbe(bare, queries) }
    // and the multi-table layout refuses the single-table levers
    val mt = s"$root/mt"
    Ann.backfillMultiTableCorpus(
      wave1.withColumn("mtype", lit("text")), mt, 16, 2, 2)
    intercept[IllegalArgumentException] {
      Ann.rebucketBucketedCorpus(spark, mt, 4)
    }
  }

  test("mid-migration crash window heals: the aside store (data + manifest) " +
      "swaps back before any probe or append") {
    val root = Files.createTempDirectory("graft_bregeocrash").toString
    val dir = s"$root/corpus"
    val docs = vecs(0L until 10L).localCheckpoint()
    val queries = docs.limit(2)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    Ann.writeBucketedCorpus(docs, dir, dim = 16, nPlanes = 2)
    Ann.rebucketBucketedCorpus(spark, dir, newPlanes = 3)
    val before = batchProbe(dir, queries)

    def crashWindow(): Unit = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
        new org.apache.hadoop.fs.Path(dir + ".swap.old")))
    }
    crashWindow()
    assert(batchProbe(dir, queries) == before,
      "probe through the crash window lost the migrated store")
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(16, 3, 1)))
    crashWindow()
    Ann.appendBucketedBatch(vecs(Seq(77L)), dir)
    assert(Ann.readGeometry(spark, dir) == Some(Ann.StoreGeometry(16, 3, 1)))
    // nothing lost (the un-healed failure mode: the append re-creates
    // the live dir holding ONLY the delta) and the append itself landed
    assert(spark.read.parquet(dir).count() == 11L,
      "append through the crash window lost prior-store rows")
    val q77 = vecs(Seq(77L)).select(col("id").as("qid"),
      col("embedding").as("qvec")).localCheckpoint()
    assert(batchProbe(dir, q77).exists(t => t._2 == "77" && t._4 == 1),
      "append through the crash window failed to land the appended doc")
  }

  test("chunkIndexBucketedWriterAuto migrates at the occupancy threshold; " +
      "index ≡ the batch construction at the final geometry; restart adopts " +
      "the migrated manifest; probes prune the scan") {
    val root = Files.createTempDirectory("graft_bautoregeo").toString
    val dir = s"$root/index"
    implicit val sqlCtx = spark.sqlContext
    // window 4 / stride 3 over 7-token docs -> 2 chunks per doc; start
    // at nPlanes=2 (4 dirs) with target 2 rows/bucket: threshold 8 rows
    // crosses inside wave 2 (16 chunks by then) -> migrate; maxPlanes 5
    def wave(w: Int): Seq[(Long, String)] =
      (0 until 4).map(i => (w * 10L + i,
        (1 to 7).map(t => s"w${w}d${i}t$t").mkString(" ")))
    val waves = (0 until 3).map(wave)

    val src = MemoryStream[(Long, String)]
    def start() = StreamingIngest.chunkIndexBucketedWriterAuto(
        src.toDF.toDF("doc_id", "text"), dir,
        window = 4, stride = 3, dim = 16, nPlanes = 2,
        targetRowsPerBucket = 2L, maxPlanes = 5, compactEvery = 2)
      .option("checkpointLocation", s"$root/ckpt").start()
    val q = start()
    try {
      waves.take(2).foreach { w => src.addData(w: _*); q.processAllAvailable() }
    } finally q.stop()
    val g1 = Ann.readGeometry(spark, dir).get
    assert(g1.nPlanes > 2 && g1.nTables == 1,
      s"occupancy threshold never migrated: $g1")

    // restart with the ORIGINAL configured geometry: adopts the manifest
    val q2 = start()
    try { src.addData(waves(2): _*); q2.processAllAvailable() }
    finally q2.stop()
    val g2 = Ann.readGeometry(spark, dir).get
    assert(g2.nPlanes >= g1.nPlanes,
      s"restart regressed the migrated geometry: $g1 -> $g2")

    // the streamed+migrated index IS the batch construction at the
    // final geometry: same chunks, same buckets, bit-identical vectors
    val streamed = spark.read.parquet(dir)
      .select(col("chunk_id"), col("bucket").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = StreamingIngest.chunkEmbed(
        waves.flatten.toDF("doc_id", "text"), window = 4, stride = 3)
      .select(col("chunk_id"),
        Ann.lshBucket(col("embedding"), 16, g2.nPlanes).cast("long")
          .as("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch,
      "streamed auto-migrated index diverged from the batch construction")

    // the batch probe prunes the SCAN over the migrated layout
    val queries = StreamingIngest.chunkEmbed(
        Seq(waves(0).head).toDF("doc_id", "text"), window = 4, stride = 3)
      .limit(1)
      .select(col("chunk_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val probe = Ann.topKFromBucketedCorpusBatch(spark, dir, queries,
      k = 3, probes = 2, idCol = "chunk_id")
    val rows = probe.collect()
    assert(rows.nonEmpty && rows.exists(_.getInt(3) == 1))
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("bucket") && !pf.matches(".*PartitionFilters: \\[\\].*"),
      s"probe must prune bucket partitions:\n$plan")
  }

  test("admission writers reseed the occupancy counter after retirement: " +
      "admit/retire churn at constant live size never migrates (r17 verdict #2)") {
    val root = Files.createTempDirectory("graft_reseed").toString
    implicit val sqlCtx = spark.sqlContext
    def distinctText(i: Long): String =
      (1 to 40).map(w => s"r${i}w$w").mkString(" ")
    // 4 docs per wave × 4 bands = 16 index rows live at any time (each
    // wave's retirement drops the previous wave before the counter is
    // re-checked); threshold = 4 buckets × 16 target = 64 CUMULATIVE
    // rows — crossed by wave 5 if the counter never decrements, never
    // crossed by the ~16–32-row live store
    val (corpus, index, tomb) =
      (s"$root/corpus", s"$root/index", s"$root/tomb")
    val src = MemoryStream[(Long, String)]
    val q = StreamingIngest.admissionWriterBucketed(
        src.toDF.toDF("id", "text"), corpus, index,
        tombstonesDir = tomb, compactEvery = 1,
        nBuckets = 4, targetRowsPerBucket = 16L, maxBuckets = 256)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      (0 until 6).foreach { w =>
        if (w > 0) {
          // cumulative (id, text) tombstones for every PREVIOUS wave —
          // the byText fold reads them each cycle and converges
          (0 until w).flatMap(pw => (0 until 4).map(i =>
              (pw * 10L + i) -> distinctText(pw * 10L + i)))
            .toDF("id", "text")
            .write.mode("overwrite").parquet(tomb)
        }
        src.addData((0 until 4).map(i =>
          (w * 10L + i) -> distinctText(w * 10L + i)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val p = graft.operators.Dedup.readSigParams(spark, index).get
    assert(p.nBuckets == 4,
      s"constant-live-size churn must not migrate, but nBuckets=${p.nBuckets}")
    // sanity: the stream really did admit and retire (live index holds
    // only the LAST wave's rows — 4 docs × 4 bands)
    assert(spark.read.parquet(index).count() == 16L)
  }
}
