package graft

import java.nio.file.Files

import graft.operators.Ingest
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bloom-fronted ingest dedup: the batch split ([[Ingest
  * .dedupDeltaBloom]]) must be EXACTLY [[Ingest.dedupDelta]] whenever
  * the filter covers the store's ids — including under a saturated
  * filter where nearly every row routes through the probe — and the
  * streaming writer ([[StreamingIngest.ingestWriterBloom]]) must keep
  * the store unique across batches, restarts, and the filter rebuild. */
class IngestBloomSpec extends SparkSpec {
  import spark.implicits._

  private def prepared(rows: Seq[(String, String, Long)]) =
    Ingest.prepare(rows.toDF("mtype", "data", "seq"), GraftConf(dim = 8))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  test("dedupDeltaBloom == dedupDelta when the filter covers the store") {
    val store = prepared(Seq(
      ("text", "alpha doc", 1L), ("text", "beta doc", 2L)))
      .select("id", "mtype", "data", "embedding")
    val batch = prepared(Seq(
      ("text", "alpha doc", 10L),  // store duplicate -> probed, dropped
      ("text", "gamma doc", 11L),  // new
      ("text", "gamma doc", 12L),  // in-batch duplicate -> first wins
      ("text", "delta doc", 13L))) // new
    val bloom = store.stat.bloomFilter("id", 1000L, 0.01)
    val plain = Ingest.dedupDelta(batch, store)
    val bloomed = Ingest.dedupDeltaBloom(batch, store, bloom)
    val expect = plain.select("id", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = bloomed.select("id", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect, s"$got vs $expect")
    assert(got.map(_._2) == Set(11L, 13L), "first-wins + store-dup drop")
  }

  test("saturated filter (near-1 fpp): everything probes, result unchanged") {
    val store = prepared(Seq(("text", "alpha doc", 1L)))
      .select("id", "mtype", "data", "embedding")
    // geometry sized for ONE item, then fed the store + noise: almost
    // every membership test answers "maybe" — the split must degrade to
    // performance, never to wrong rows
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1, 0.5)
    ids(store).foreach(bloom.putString)
    (1 to 64).foreach(i => bloom.putString(s"noise-$i"))
    val batch = prepared(Seq(
      ("text", "alpha doc", 5L), ("text", "fresh doc", 6L)))
    val got = Ingest.dedupDeltaBloom(batch, store, bloom)
    val plain = Ingest.dedupDelta(batch, store)
    assert(ids(got) == ids(plain))
    assert(got.count() == 1 && got.select("seq").head().getLong(0) == 6L)
  }

  test("codegen bloom probe: no UDF node in the plan; semantics == mightContainString; codegen and interpreted paths agree") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000L, 0.01)
    val members = (1 to 200).map(i => s"doc:member-$i")
    members.foreach(bloom.putString)
    // repartition forces a real physical stage — a bare local Seq
    // collapses to LocalTableScan (evaluated driver-side, no codegen)
    val probe = (members.take(50) ++ (1 to 50).map(i => s"doc:other-$i"))
      .toDF("id").repartition(2)
    val probed = probe.withColumn("hit",
      graft.functions.HashFunctions.bloomMightContain(col("id"), bloom))
    val got = probed.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // the r10 "minor #3": the probe must be a native expression, not a
    // black-box ScalaUDF breaking the whole-stage span (plan read AFTER
    // collect so AQE has finalized the physical plan)
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"probe compiled to a UDF node:\n$plan")
    // the AQE plan string renders whole-stage spans as `*(n)` prefixes
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      s"probe fell out of codegen:\n$plan")
    members.take(50).foreach(m => assert(got(m), s"false negative on $m"))
    got.foreach { case (id, hit) =>
      assert(hit == bloom.mightContainString(id), s"mismatch vs driver probe on $id")
    }
    // interpreted eval (the non-codegen fallback) must agree bit-for-bit
    val expr = graft.expressions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(members.head),
        org.apache.spark.sql.types.StringType), bloom)
    assert(expr.eval(null) == true)
    // null id -> null hit (same as the old null-in/null-out UDF)
    val withNull = Seq[Option[String]](Some(members.head), None).toDF("id")
      .withColumn("hit",
        graft.functions.HashFunctions.bloomMightContain(col("id"), bloom))
      .collect().map(r => Option(r.get(1))).toSeq
    assert(withNull == Seq(Some(true), None))
  }

  test("streaming bloom writer: unique store across batches + restart rebuild") {
    val dir = Files.createTempDirectory("graft_bloomingest").toString
    val (docsDir, edgesDir, ckpt) = (s"$dir/docs", s"$dir/edges", s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    def startQuery() = StreamingIngest
      .ingestWriterBloom(src.toDF.toDF("mtype", "data", "seq"),
        docsDir, edgesDir, GraftConf(dim = 8),
        expectedItems = 1000L)
      .option("checkpointLocation", ckpt).start()
    val q = startQuery()
    try {
      src.addData(("text", "bloom one", 1L), ("text", "bloom one", 2L),
        ("text", "bloom two", 3L))
      q.processAllAvailable()
      // cross-batch duplicate + a new doc: the dup is a true "maybe"
      // (its id was merged into the filter after batch 1), the new doc
      // skips the store probe entirely
      src.addData(("text", "bloom one", 4L), ("text", "bloom three", 5L))
      q.processAllAvailable()
      val store = spark.read.parquet(docsDir)
      assert(store.count() == 3, "store must stay id-unique")
      assert(store.select("id").distinct().count() == 3)
    } finally q.stop()
    // restart: a fresh writer instance rebuilds the filter from the
    // store scan, so pre-restart docs still dedup
    val q2 = startQuery()
    try {
      src.addData(("text", "bloom two", 7L), ("text", "bloom four", 8L))
      q2.processAllAvailable()
      val store = spark.read.parquet(docsDir)
      assert(store.count() == 4, s"expected 4 unique docs, got ${store.count()}")
      // stream result == batch upsert of the whole trace onto an empty
      // store (the stream≡batch equivalence, id grain)
      val trace = Seq(
        ("text", "bloom one", 1L), ("text", "bloom one", 2L),
        ("text", "bloom two", 3L), ("text", "bloom one", 4L),
        ("text", "bloom three", 5L), ("text", "bloom two", 7L),
        ("text", "bloom four", 8L))
      assert(ids(store) == ids(prepared(trace).select("id").distinct()))
    } finally q2.stop()
  }
}
