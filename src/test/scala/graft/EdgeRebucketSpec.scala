package graft

import java.nio.file.Files

import graft.operators.GraphBuild
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Edge-log occupancy parity (r17 verdict #7): the hash-bucketed `eb=`
  * edge log gets the same self-managing discipline as the ann corpus
  * and the signature stores —
  *
  *  - the bucket count is LAYOUT and travels with the data
  *    (`_EDGEBUCKETS`, stamped on first append, loud on disagreement);
  *  - [[GraphBuild.rebucketEdgeLog]] migrates the store to a new count
  *    behind the crash-safe swap, folding latest-wins in passing, and
  *    is invisible to every reader (q203 oracle-gates the lifecycle);
  *  - writers adopt the manifest at (re)start and pull the lever
  *    themselves on an occupancy cadence
  *    (`targetRowsPerEdgeBucket` on the indexed writers).
  */
class EdgeRebucketSpec extends SparkSpec {
  import spark.implicits._

  private def delta(seqBase: Long, score: Double) =
    (0 until 12).map(i =>
      (s"doc:${i % 4}", s"doc:${4 + i % 6}", score + i, seqBase + i))
      .toDF("src", "dst", "score", "seq")

  private def view(d: String) = {
    spark.catalog.refreshByPath(d)
    GraphBuild.latestWins(spark.read.parquet(d))
      .select("src", "dst", "score", "seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
  }

  test("manifest: stamped on first append, loud on disagreement, " +
      "adopted over a stale configured count") {
    val dir = Files.createTempDirectory("graft_ebmanifest").toString + "/eb"
    GraphBuild.appendEdgeDeltaBucketed(delta(0L, 0.0), dir, nBuckets = 4)
    assert(GraphBuild.readEdgeBuckets(spark, dir) == Some(4),
      "first append must stamp _EDGEBUCKETS")
    val ex = intercept[IllegalArgumentException] {
      GraphBuild.appendEdgeDeltaBucketed(delta(100L, 1.0), dir, nBuckets = 8)
    }
    assert(ex.getMessage.contains("_EDGEBUCKETS"))
    assert(GraphBuild.adoptEdgeBuckets(spark, dir, configured = 8) == 4,
      "a restarting writer must adopt the store's count, not its config")
  }

  test("rebucketEdgeLog: latest-wins view unchanged, superseded rows " +
      "folded away, appends continue at the adopted count") {
    val dir = Files.createTempDirectory("graft_ebrebucket").toString
    val (flatDir, ebDir) = (s"$dir/flat", s"$dir/eb")
    (0 until 3).foreach { w =>
      val d = delta(w * 100L, w * 10.0)
      d.write.mode("append").parquet(flatDir)
      GraphBuild.appendEdgeDeltaBucketed(d, ebDir, nBuckets = 2)
    }
    val before = view(ebDir)
    assert(before == view(flatDir))

    GraphBuild.rebucketEdgeLog(spark, ebDir, newBuckets = 8)
    assert(GraphBuild.readEdgeBuckets(spark, ebDir) == Some(8),
      "migration must re-stamp the manifest with the data")
    assert(view(ebDir) == before, "migration changed the latest-wins view")
    // the migration folded the raw log to its latest-wins rows
    val raw = spark.read.parquet(ebDir)
    assert(raw.count() == raw.select("src", "dst").distinct().count(),
      "superseded rows must fold away during the migration")
    // eb= dirs reflect the NEW count (values in [0, 8); more than the
    // old count's 2 distinct values proves a real re-partition)
    val ebs = raw.select("eb").distinct().as[Int].collect().toSet
    assert(ebs.forall(b => b >= 0 && b < 8) && ebs.size > 2)

    // a later delta appends at the ADOPTED count and still wins
    val nb = GraphBuild.adoptEdgeBuckets(spark, ebDir, configured = 2)
    assert(nb == 8)
    val late = Seq(("doc:0", "doc:4", 999.0, 900L))
      .toDF("src", "dst", "score", "seq")
    GraphBuild.appendEdgeDeltaBucketed(late, ebDir, nb)
    late.write.mode("append").parquet(flatDir)
    assert(view(ebDir) == view(flatDir),
      "post-migration append diverged from the flat log")
  }

  test("indexed writer auto-rebuckets the edge log at the occupancy " +
      "threshold; view ≡ the fixed-bucket run; restart adopts") {
    val root = Files.createTempDirectory("graft_ebauto").toString
    implicit val sqlCtx = spark.sqlContext
    val conf = GraftConf(dim = 8)
    def mkBatch(b: Int): Seq[(String, String, Long)] =
      (0 until 3).map(i =>
        ("text", s"ebauto doc ${b * 3 + i}", (b * 10 + i).toLong))
    val batches = (0 until 4).map(mkBatch)

    // auto arm: 2 initial buckets, tiny per-bucket target — the raw
    // edge log (k·batch rows per batch) crosses it within two batches
    val src = MemoryStream[(String, String, Long)]
    def startAuto() = StreamingIngest.ingestWriterIndexed(
        src.toDF.toDF("mtype", "data", "seq"),
        s"$root/a_docs", s"$root/a_edges", s"$root/a_ann", conf,
        nPlanes = 3, nTables = 2, compactEvery = 2,
        edgeBuckets = 2, targetRowsPerEdgeBucket = 4L, maxEdgeBuckets = 64)
      .option("checkpointLocation", s"$root/a_ckpt").start()
    val q = startAuto()
    try {
      batches.take(3).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val migrated = GraphBuild.readEdgeBuckets(spark, s"$root/a_edges")
    assert(migrated.exists(_ > 2),
      s"occupancy crossing must have re-bucketed past 2, got $migrated")

    // fixed arm: same batches, fixed count — views must agree
    val src2 = MemoryStream[(String, String, Long)]
    val q2 = StreamingIngest.ingestWriterIndexed(
        src2.toDF.toDF("mtype", "data", "seq"),
        s"$root/f_docs", s"$root/f_edges", s"$root/f_ann", conf,
        nPlanes = 3, nTables = 2, compactEvery = 2, edgeBuckets = 2)
      .option("checkpointLocation", s"$root/f_ckpt").start()
    try {
      batches.take(3).foreach { b => src2.addData(b: _*); q2.processAllAvailable() }
    } finally q2.stop()
    assert(view(s"$root/a_edges") == view(s"$root/f_edges"),
      "auto-rebucketed edge log diverged from the fixed-bucket run")

    // restart with the stale configured count: the writer must adopt
    // the migrated count (appending at 2 would fail loudly — and the
    // manifest guard is exactly what turns silent mixed-count co-
    // location loss into this adoption)
    val q3 = startAuto()
    try {
      src.addData(batches(3): _*); q3.processAllAvailable()
    } finally q3.stop()
    // adoption held (appending at the stale configured 2 would have
    // failed loudly); the extra batch may legitimately migrate FURTHER
    val after = GraphBuild.readEdgeBuckets(spark, s"$root/a_edges")
    assert(after.exists(_ >= migrated.get),
      s"restart regressed the migrated bucket count: $after < $migrated")
  }
}
