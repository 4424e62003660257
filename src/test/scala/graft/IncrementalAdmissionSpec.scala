package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental near-dup admission (q172): an incoming batch is decided
  * against the PERSISTED signature index of the standing corpus (never
  * its text), then survivors dedup among themselves. Planted fixtures
  * pin every status transition and the index-only scale contract. */
class IncrementalAdmissionSpec extends SparkSpec {
  import spark.implicits._

  // long enough that a short appended tail keeps signature agreement
  // high (J ≈ 0.95 ⇒ expect ~11.5/12 components agreeing)
  private val baseText: String =
    ("the quick brown fox jumps over the lazy dog while seventy " +
      "distinct tokens of filler text keep the shingle set large " +
      "enough for stable minhash signatures across small edits " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")

  private def admit(existing: Seq[(Long, String)], incoming: Seq[(Long, String)]) = {
    val ex = existing.toDF("doc_id", "text")
    val inc = incoming.toDF("doc_id", "text")
    val index = Dedup.signatureIndex(ex, "doc_id", "text")
    Dedup.admitIncremental(inc, "doc_id", "text", index)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
  }

  test("statuses: re-ingest → dup_existing(min existing id); identical batch twins → keeper + dup_batch; fresh text → admitted") {
    val existing = Seq(
      10L -> baseText,
      11L -> (baseText + " with one extra clause about storage"),
      12L -> "completely unrelated short corpus entry about graphs")
    val incoming = Seq(
      // near-dup of BOTH 10 and 11 → dup_of = min matching id = 10
      100L -> (baseText + " re-ingested tail"),
      // two identical genuinely-new docs → min id keeps, other folds
      101L -> ("fresh submission with its own vocabulary entirely " +
        "disjoint from anything stored moon river ocean cliff meadow " +
        "stone ember willow harbor lantern drift crystal canyon"),
      102L -> ("fresh submission with its own vocabulary entirely " +
        "disjoint from anything stored moon river ocean cliff meadow " +
        "stone ember willow harbor lantern drift crystal canyon"),
      // fresh singleton → admitted
      103L -> "another novel document mentioning turbines and estuaries and gradient descent optimizers")
    val got = admit(existing, incoming)
    assert(got(100L) == ("dup_existing", 10L), s"got $got")
    assert(got(101L) == ("admitted", 101L), s"got $got")
    assert(got(102L) == ("dup_batch", 101L), s"got $got")
    assert(got(103L) == ("admitted", 103L), s"got $got")
  }

  test("transitive batch chains fold to one keeper; sub-shingle-width docs are admitted untouched") {
    val freshA = "brand new canticle of disjoint words pylon quasar " +
      "bramble sextant oboe zephyr cairn fjord plinth vellum"
    val incoming = Seq(
      200L -> (freshA + " variant one tail"),
      201L -> (freshA + " variant one tail extended"),
      202L -> (freshA + " variant one tail extended further"),
      203L -> "two tokens") // 2 tokens < shingleWidth 3: no signature
    val got = admit(Seq(10L -> baseText), incoming)
    assert(got(200L) == ("admitted", 200L), s"got $got")
    assert(got(201L) == ("dup_batch", 200L), s"got $got")
    assert(got(202L) == ("dup_batch", 200L), s"got $got")
    assert(got(203L) == ("admitted", 203L), s"got $got")
  }

  test("every incoming doc gets exactly one decision row; statuses partition the batch") {
    val incoming = (0 until 30).map { i =>
      (300L + i) -> (if (i % 3 == 0) baseText + s" tail"
                     else s"unique doc $i about topic ${i * 7} with words " + ("w" + i) * 3)
    }
    val ex = Seq(10L -> baseText).toDF("doc_id", "text")
    val inc = incoming.toDF("doc_id", "text")
    val res = Dedup.admitIncremental(inc, "doc_id", "text",
      Dedup.signatureIndex(ex, "doc_id", "text"))
    assert(res.count() == 30)
    assert(res.select("id").distinct().count() == 30)
    val statuses = res.select("status").distinct().as[String].collect().toSet
    assert(statuses.subsetOf(Set("dup_existing", "dup_batch", "admitted")))
  }

  test("streaming admission: index grows by admitted docs only; stream ≡ sequential batch replay") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_admission").toString
    val freshB = "second wave document with its own register skylark " +
      "bastion copse runnel gorse heather tarn scree fell beck"
    val freshC = "third wave document in yet another register anvil " +
      "forge bellows quench temper ingot flux crucible mandrel"
    val batches = Seq(
      Seq(1L -> baseText),
      // near-dup of batch-1's doc (cross-BATCH rejection via the index)
      // + a genuinely new doc
      Seq(2L -> (baseText + " streamed again tail"), 3L -> freshB),
      // near-dup of batch-2's admitted doc + twin pair within the batch
      Seq(4L -> (freshB + " replayed"), 5L -> freshC, 6L -> freshC))
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest
      .admissionWriter(src.toDF.toDF("id", "text"),
        s"$dir/corpus", s"$dir/index")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val corpus = spark.read.parquet(s"$dir/corpus")
      val gotIds = corpus.select("id").as[Long].collect().toSet
      assert(gotIds == Set(1L, 3L, 5L), s"corpus ids: $gotIds")
      // index rows exactly mirror the admitted corpus
      val idx = spark.read.parquet(s"$dir/index")
      assert(idx.select("id").as[Long].collect().toSet == gotIds)
      // sequential batch-mode replay lands on the identical corpus
      val bdir = Files.createTempDirectory("graft_admission_b").toString
      batches.foreach { b =>
        graft.streaming.StreamingIngest.admitBatch(
          spark, b.toDF("id", "text"), s"$bdir/corpus", s"$bdir/index")
      }
      val bIds = spark.read.parquet(s"$bdir/corpus")
        .select("id").as[Long].collect().toSet
      assert(bIds == gotIds, s"stream $gotIds vs batch $bIds")
    } finally q.stop()
  }

  test("stored index: probe prunes the SCAN (PartitionFilters non-empty) and pruning is decision-invariant") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_sigstore").toString + "/index"
    // per-doc word suffix → zero shared shingles BETWEEN existing docs
    // (so the re-ingest matches exactly one of them, not the min id of
    // a 200-doc near-dup family)
    def docText(i: Int): String =
      baseText.split(" ").map(w => w + i).mkString(" ")
    val ex = (0 until 200).map(i => i.toLong -> docText(i))
      .toDF("doc_id", "text")
    val incoming = Seq(
      1000L -> (docText(42) + " resubmitted"),
      1001L -> ("wholly new submission pergola sundial gnomon " +
        "astrolabe sextant theodolite barometer hygrometer anemometer"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir)
    // physical layout really is one directory per band bucket
    val bucketDirs = new java.io.File(dir).listFiles()
      .map(_.getName).count(_.startsWith("bucket="))
    assert(bucketDirs > 1, s"expected multiple bucket dirs, got $bucketDirs")
    val stored = Dedup.admitIncrementalStored(
      incoming, "doc_id", "text", spark, dir)
    val rows = stored.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(1000L) == ("dup_existing", 42L), s"got $rows")
    assert(rows(1001L) == ("admitted", 1001L), s"got $rows")
    // the scan is pruned by partition filters, not row-filtered post-read
    val p = stored.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("bucket"), s"no bucket partition filter in scan:\n$p")
    assert(!pf.matches(".*PartitionFilters: \\[\\].*"),
      s"PartitionFilters is empty:\n$pf")
    // pruning is decision-invariant: identical statuses from the
    // in-memory (unpruned) form over the same corpus
    val mem = Dedup.admitIncremental(incoming, "doc_id", "text",
      Dedup.signatureIndex(ex, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(mem == rows, s"pruned $rows vs unpruned $mem")
  }

  test("deduped chunk index stream: re-ingested content adds ZERO index rows; stream ≡ sequential batch replay") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_chunkidx").toString
    // ~60 tokens → 3 chunks at window=32/stride=24; words indexed so
    // chunk shingle sets are distinct ACROSS texts
    def longText(tag: String): String =
      (1 to 60).map(i => s"$tag$i").mkString(" ")
    val textA = longText("alpha")
    val textB = longText("beta")
    val batches = Seq(
      Seq(1L -> textA),
      // doc 2 = textA VERBATIM under a new doc_id (a re-crawl): every
      // chunk is an exact dup of doc 1's — zero index growth. doc 3 is
      // fresh.
      Seq(2L -> textA, 3L -> textB),
      // doc 4 re-ingests textB — again zero growth
      Seq(4L -> textB))
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest
      .dedupedChunkIndexWriter(src.toDF.toDF("doc_id", "text"),
        s"$dir/index", s"$dir/sig")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      val counts = batches.map { b =>
        src.addData(b: _*); q.processAllAvailable()
        spark.read.parquet(s"$dir/index").count()
      }
      assert(counts(0) == 3, s"doc 1 should index 3 chunks: $counts")
      assert(counts(1) == 6, s"doc 2 must add ZERO (dup), doc 3 adds 3: $counts")
      assert(counts(2) == 6, s"doc 4 must add ZERO (dup of doc 3): $counts")
      val gotDocs = spark.read.parquet(s"$dir/index")
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(gotDocs == Set(1L, 3L), s"indexed docs: $gotDocs")
      // sequential batch-mode replay lands on the identical chunk set
      val bdir = Files.createTempDirectory("graft_chunkidx_b").toString
      batches.foreach { b =>
        graft.streaming.StreamingIngest.dedupedChunkIndexBatch(
          spark, b.toDF("doc_id", "text"), s"$bdir/index", s"$bdir/sig",
          32, 24, 16, 3, 12, 4, 9, 0.5)
      }
      val sIds = spark.read.parquet(s"$dir/index")
        .select("chunk_id").as[String].collect().toSet
      val bIds = spark.read.parquet(s"$bdir/index")
        .select("chunk_id").as[String].collect().toSet
      assert(sIds == bIds, s"stream $sIds vs batch $bIds")
    } finally q.stop()
  }

  test("idempotence: re-admitting a batch after its keepers joined the index folds EVERY doc onto a prior admission") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_admission_idem").toString
    val freshA = "charter document alpha with disjoint words quill " +
      "inkwell parchment sealing wax ribbon folio quire vellum codex"
    val freshB = "charter document beta entirely different register " +
      "sprocket flywheel camshaft piston gasket manifold throttle"
    val batch = Seq(
      500L -> freshA, 501L -> (freshA + " appended"), 502L -> freshB)
    // round 1: empty index — 500 keeps (501 folds into it), 502 keeps
    graft.streaming.StreamingIngest.admitBatch(
      spark, batch.toDF("doc_id", "text").withColumnRenamed("doc_id", "id"),
      s"$dir/corpus", s"$dir/index")
    // round 2: the SAME content re-arrives under new ids — everything
    // must now be dup_existing against the round-1 keepers; nothing is
    // admitted twice (the exactly-once property of the control loop
    // under at-least-once upstream delivery)
    val replay = Seq(
      600L -> freshA, 601L -> (freshA + " appended"), 602L -> freshB)
    val decisions = graft.operators.Dedup.admitIncremental(
      replay.toDF("id", "text"), "id", "text",
      spark.read.parquet(s"$dir/index"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(decisions(600L) == ("dup_existing", 500L), s"got $decisions")
    assert(decisions(601L) == ("dup_existing", 500L), s"got $decisions")
    assert(decisions(602L) == ("dup_existing", 502L), s"got $decisions")
  }

  test("hot-band cap: a band key shared by 10^4 index docs never goes quadratic; multi-band dups still found through the reroute") {
    // signatures planted directly (bands = 4, rowsPerBand = 3): band 0
    // (components 1-3) is IDENTICAL across all 10^4 index docs — the
    // boilerplate band. Docs 0..199 ALSO share band 1 (so that band key
    // is hot too), bands 2-3 are unique per doc everywhere.
    val n = 10000
    val idx = spark.range(0, n.toLong).select(
      col("id").as("xid"),
      array(Seq(lit(7L), lit(8L), lit(9L)) ++
        (0 until 3).map(c =>
          when(col("id") < 200, lit(777L + c))
            .otherwise(col("id") * 16L + lit(c + 1000000L))) ++
        (3 until 9).map(c => col("id") * 16L + lit(c + 1000000L)): _*).as("xsig"))
    val idxBand = idx.select(col("xid"), col("xsig"),
      explode(graft.operators.Dedup.bandKeysFromSig(col("xsig"), 4, 3)).as("bkey"))
    // 5 incoming docs share ONLY the hot band 0 with the index (their
    // bands 1-3 are junk no index doc has) + 1 incoming doc agreeing on
    // bands 0 AND 1 — BOTH hot, so its candidacy must survive purely
    // through the band-PAIR reroute (no cold band available)
    val junk = spark.range(0, 5).select(
      (col("id") + 500000L).as("id"),
      array(Seq(lit(7L), lit(8L), lit(9L)) ++
        (0 until 9).map(c => -(col("id") * 16L + lit(c + 1L))): _*).as("sig"))
    val dup = spark.range(0, 1).select(
      lit(999999L).as("id"),
      array(Seq(lit(7L), lit(8L), lit(9L)) ++
        (0 until 3).map(c => lit(777L + c)) ++
        (0 until 6).map(c => -lit(900000L + c)): _*).as("sig"))
    val cands = graft.operators.Dedup.admissionCandidates(
      junk.unionByName(dup), idxBand, bands = 4, rowsPerBand = 3, maxBand = 100)
      .select("id", "xid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // uncapped this would be 6 × 10^4 = 60k pairs; the cap reroutes hot
    // bands through band-pair keys (≤ maxBand smallest xids per key)
    assert(cands.length <= 100,
      s"candidate join went quadratic: ${cands.length} pairs")
    val dupCands = cands.filter(_._1 == 999999L)
    assert(dupCands.nonEmpty && dupCands.contains((999999L, 0L)),
      s"two-hot-band dup lost by the reroute: ${dupCands.take(10).toSeq}")
    // the backstop truncation keeps the SMALLEST xids — the ones the
    // decision would report as dup_of
    assert(dupCands.map(_._2).forall(_ < 200L), s"${dupCands.take(10).toSeq}")
    assert(!cands.exists(_._1 < 999999L), // junk pairs with nothing
      s"junk docs paired: ${cands.filter(_._1 < 999999L).take(10).toSeq}")
  }

  test("hot-band cap is decision-invariant when no band is hot: capped vs effectively-uncapped statuses identical") {
    val existing = (0 until 40).map(i =>
      i.toLong -> (baseText.split(" ").map(w => w + i).mkString(" ")))
    val incoming = Seq(
      2000L -> (baseText.split(" ").map(w => w + 17).mkString(" ") + " tail"),
      2001L -> "entirely fresh submission windmill aqueduct causeway viaduct")
    val ex = existing.toDF("doc_id", "text")
    val inc = incoming.toDF("doc_id", "text")
    val index = Dedup.signatureIndex(ex, "doc_id", "text")
    def run(mb: Int) = Dedup.admitIncremental(
      inc, "doc_id", "text", index, maxBand = mb)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(run(1024) == run(1000000), "cap changed a no-hot-band decision")
  }

  test("swapInPlace clears a stale .swap.tmp from a crashed prior attempt: retired signatures cannot resurrect (r12 ADVICE)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_swap_stale").toString + "/index"
    val ex = Seq(1L -> baseText, 2L -> (baseText + " second body"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir)
    // simulate a CRASHED earlier compaction attempt: some of its
    // write() output (live bucket partitions) landed in tmp before the
    // crash — debris the next attempt must not inherit
    val staleTmp = dir + ".swap.tmp"
    spark.read.parquet(dir).write.partitionBy("bucket").parquet(staleTmp)
    // retire EVERYTHING: the all-retired sentinel path writes ONLY
    // $tmp/bucket=-1, so without the entry cleanup the stale bucket=N
    // dirs inside tmp would swap in as live, resurrecting every
    // signature just retired
    Dedup.compactSignatureIndexStore(spark, dir, Seq(1L, 2L).toDF("id"))
    assert(spark.read.parquet(dir).count() == 0,
      "stale tmp partitions resurrected retired signatures")
    assert(!new java.io.File(staleTmp).exists, "swap left tmp debris")
    assert(!new java.io.File(dir + ".swap.old").exists, "swap left old debris")
  }

  test("calibration cap (r12 verdict #4): maxBand bounds a boilerplate-heavy audit; default measures every pair") {
    // 2000 IDENTICAL existing docs: every band key is shared by all of
    // them — the boilerplate-flood shape. The default (uncapped) audit
    // measures every band-colliding pair (that is its contract); with
    // maxBand set, the candidate join routes through the same hot-band
    // reroute the serving path uses, so the audit stays bounded on a
    // corpus where the uncapped form would go |incoming|×|bucket|.
    val ex = spark.range(0, 2000)
      .select(col("id").as("doc_id"), lit(baseText).as("text"))
    val inc = Seq(999999L -> baseText).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_pairs")).collect()(0).getLong(0)
    val uncapped = Dedup.admissionCalibration(inc, ex, "doc_id", "text")
    assert(pairs(uncapped) == 2000L,
      "default must keep the exact audit semantics: every colliding pair")
    val capped = Dedup.admissionCalibration(
      inc, ex, "doc_id", "text", maxBand = 100)
    val cp = pairs(capped)
    // 4 bands -> 6 band-PAIR keys, each truncated to the 100 smallest
    // xids; identical signatures make those the SAME 100 docs, so the
    // deduped candidate set is exactly the 100 smallest
    assert(cp == 100L, s"capped audit measured $cp pairs")
    // identical docs agree on all 12 components in both forms
    assert(capped.select("agree").collect().map(_.getLong(0)).toSet == Set(12L))
    assert(uncapped.select("agree").collect().map(_.getLong(0)).toSet == Set(12L))
  }

  test("replay idempotence: redelivering a batch under the same batchId rewrites its slice — even over a partial previous attempt") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_admission_replay").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    val textB = "bravo document with its own register sprocket flywheel " +
      "camshaft piston gasket manifold throttle venturi carburetor"
    val textC = "charlie document disjoint again lighthouse breakwater " +
      "quay bollard mooring fathom spindrift gunwale transom keelson"
    val b0 = Seq(1L -> baseText).toDF("id", "text")
    val b1 = Seq(2L -> textB, 3L -> textC).toDF("id", "text")
    graft.streaming.StreamingIngest.admitBatch(
      spark, b0, corpus, index, batchId = Some(0L))
    // simulate the WORST partial attempt of batch 1: its own signatures
    // already landed in the index (so a naive replay would fold docs 2/3
    // onto themselves as dup_existing) plus a poisoned corpus slice
    Dedup.signatureIndex(b1, "id", "text")
      .write.mode("overwrite").parquet(s"$index/batch=1")
    Seq(99L -> "garbage from the failed attempt").toDF("id", "text")
      .write.mode("overwrite").parquet(s"$corpus/batch=1")
    // redelivery: decisions must exclude the batch's own partition and
    // both slices must be REWRITTEN, not appended
    graft.streaming.StreamingIngest.admitBatch(
      spark, b1, corpus, index, batchId = Some(1L))
    val ids = spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L), s"corpus after replay: $ids")
    val idxIds = spark.read.parquet(index).select("id").as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 3L), s"index after replay: $idxIds")
    // a SECOND full redelivery is a no-op (exactly-once downstream view)
    graft.streaming.StreamingIngest.admitBatch(
      spark, b1, corpus, index, batchId = Some(1L))
    assert(spark.read.parquet(corpus).count() == 3)
    assert(spark.read.parquet(index).count() == 3)
  }

  test("signature-store compaction: decisions invariant under a no-hit rewrite; a retired doc RE-ADMITS on re-ingest; layout preserved") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_sigcompact").toString + "/index"
    def docText(i: Int): String =
      baseText.split(" ").map(w => w + i).mkString(" ")
    val ex = (0 until 200).map(i => i.toLong -> docText(i)).toDF("doc_id", "text")
    val incoming = Seq(
      1000L -> (docText(42) + " resubmitted"),
      1001L -> ("wholly new submission pergola sundial gnomon " +
        "astrolabe sextant theodolite barometer hygrometer"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir)
    def decide() = Dedup.admitIncrementalStored(
      incoming, "doc_id", "text", spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val before = decide()
    assert(before(1000L) == ("dup_existing", 42L), s"$before")
    // compaction with tombstones touching no candidate: decisions and
    // bucket layout (partition pruning) unchanged
    Dedup.compactSignatureIndexStore(spark, dir, Seq(199L).toDF("id"))
    assert(decide() == before, "no-hit compaction changed a decision")
    assert(new java.io.File(dir).listFiles()
      .map(_.getName).count(_.startsWith("bucket=")) > 1,
      "compaction lost the bucket partitioning")
    assert(!new java.io.File(dir + ".swap.tmp").exists &&
      !new java.io.File(dir + ".swap.old").exists, "swap left debris")
    // retire doc 42: the same resubmission must now be ADMITTED — the
    // index no longer rejects content the corpus dropped
    Dedup.compactSignatureIndexStore(spark, dir, Seq(42L).toDF("id"))
    val after = decide()
    assert(after(1000L) == ("admitted", 1000L), s"$after")
    assert(after(1001L) == ("admitted", 1001L), s"$after")
  }

  test("flat streaming-store compaction: retire-then-reingest re-admits through admitBatch; batch layout survives") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_flatcompact").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    graft.streaming.StreamingIngest.admitBatch(
      spark, Seq(1L -> baseText).toDF("id", "text"), corpus, index,
      batchId = Some(0L))
    // re-ingest while indexed → rejected
    graft.streaming.StreamingIngest.admitBatch(
      spark, Seq(10L -> (baseText + " tail")).toDF("id", "text"),
      corpus, index, batchId = Some(1L))
    assert(spark.read.parquet(corpus).select("id").as[Long].collect().toSet
      == Set(1L), "near-dup re-ingest must be rejected while indexed")
    // curation drops doc 1 → retire its signatures → same content
    // re-arrives and must be RE-ADMITTED
    Dedup.compactSignatureIndexStore(spark, index, Seq(1L).toDF("id"))
    graft.streaming.StreamingIngest.admitBatch(
      spark, Seq(20L -> (baseText + " tail")).toDF("id", "text"),
      corpus, index, batchId = Some(2L))
    val ids = spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 20L), s"retired content did not re-admit: $ids")
    val idxIds = spark.read.parquet(index).select("id").as[Long].collect().toSet
    assert(idxIds == Set(20L), s"index after retire+readmit: $idxIds")
  }

  test("selectMinAgree: smallest level whose cumulative precision meets the target; None when unreachable") {
    // planted table: level 12 is pure, 11 nearly, 10 muddy, 9 noise
    val cal = Seq(
      (12L, 10L, 10L), (11L, 10L, 9L), (10L, 10L, 5L), (9L, 40L, 1L))
      .toDF("agree", "n_pairs", "n_exact_dup")
    def pick(t: Double) = Dedup.selectMinAgree(cal, t)
    // cum precision: ≥12 → 1.0; ≥11 → 19/20 = .95; ≥10 → 24/30 = .8;
    // ≥9 → 25/70 ≈ .357
    assert(pick(1.0).map(_.minAgree).contains(12))
    assert(pick(0.9).map(_.minAgree).contains(11))
    val c9 = pick(0.7).get
    assert(c9.minAgree == 10 && math.abs(c9.precision - 0.8) < 1e-9 &&
      math.abs(c9.recall - 24.0 / 25.0) < 1e-9, s"$c9")
    assert(pick(0.3).map(_.minAgree).contains(9)) // everything qualifies
    assert(Dedup.selectMinAgree(
      Seq((9L, 10L, 0L)).toDF("agree", "n_pairs", "n_exact_dup"), 0.5).isEmpty)
    // end-to-end: a REAL calibration table over the planted corpus
    // yields a level that the admission rule can consume
    val ex = Seq(10L -> baseText, 11L -> (baseText + " with one clause")).toDF("doc_id", "text")
    val inc = Seq(
      100L -> (baseText + " re-ingested tail"),
      101L -> "wholly disjoint fresh text about estuaries and turbines")
      .toDF("doc_id", "text")
    val table = Dedup.admissionCalibration(inc, ex, "doc_id", "text")
    Dedup.selectMinAgree(table, 0.9).foreach { c =>
      assert(c.minAgree >= 1 && c.minAgree <= 12 && c.precision >= 0.9, s"$c")
      // the chosen level is directly consumable by the serving rule
      val dec = Dedup.admitIncremental(inc, "doc_id", "text",
        Dedup.signatureIndex(ex, "doc_id", "text"), minAgree = c.minAgree)
      assert(dec.count() == 2)
    }
  }

  test("retiring admission stream: in-stream tombstone compaction re-admits retired content") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_admission_retire").toString
    val (corpus, index, tomb) = (s"$dir/corpus", s"$dir/index", s"$dir/tombstones")
    val freshB = "unrelated interlude document quern millrace sluice " +
      "weir leat penstock tailrace flume headgate"
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest
      .admissionWriterRetiring(src.toDF.toDF("id", "text"),
        corpus, index, tomb, compactEvery = 3)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def push(b: (Long, String)*): Unit = { src.addData(b: _*); q.processAllAvailable() }
      push(1L -> baseText) // batch 0: admitted
      push(2L -> (baseText + " retire tail")) // batch 1: dup_existing of 1
      def corpusIds = spark.read.parquet(corpus)
        .select("id").as[Long].collect().toSet
      assert(corpusIds == Set(1L), s"pre-retirement: $corpusIds")
      // curation drops doc 1 → tombstone lands; batch 2 triggers the
      // periodic compaction ((2+1) % 3 == 0) AFTER its own admission
      Seq(1L).toDF("id").write.mode("overwrite").parquet(tomb)
      push(3L -> freshB) // batch 2: fresh + compaction
      val idxAfter = spark.read.parquet(index)
        .select("id").as[Long].collect().toSet
      assert(idxAfter == Set(3L), s"index after retirement: $idxAfter")
      // the same content re-arrives: must now be ADMITTED
      push(4L -> (baseText + " retire tail")) // batch 3
      assert(corpusIds == Set(1L, 3L, 4L), s"post-retirement: $corpusIds")
      val idxFinal = spark.read.parquet(index)
        .select("id").as[Long].collect().toSet
      assert(idxFinal == Set(3L, 4L), s"final index: $idxFinal")
    } finally q.stop()
  }

  test("signature-store parameter manifest: stamped at write, mismatched probe fails loudly, auto-probe uses the manifest, retirement preserves it") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_sigparams").toString + "/index"
    def docText(i: Int): String =
      baseText.split(" ").map(w => w + i).mkString(" ")
    val ex = (0 until 120).map(i => i.toLong -> docText(i)).toDF("doc_id", "text")
    val incoming = Seq(
      1000L -> (docText(42) + " resubmitted"),
      1001L -> ("wholly new submission pergola sundial gnomon " +
        "astrolabe sextant theodolite barometer hygrometer"))
      .toDF("doc_id", "text")
    // NON-default layout parameters — the manifest must carry them
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir,
      shingleWidth = 2, numHashes = 16, bands = 8, nBuckets = 16)
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(2, 16, 8, 16)))
    // probing at OTHER parameters (the caller-trusts-config bug class)
    // is a loud failure, not silently-wrong pruning
    intercept[IllegalArgumentException] {
      Dedup.admitIncrementalStored(incoming, "doc_id", "text", spark, dir)
    }
    // the auto probe takes layout parameters FROM the manifest and
    // equals the explicit probe at those parameters
    def decisions(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val auto = decisions(Dedup.admitIncrementalStoredAuto(
      incoming, "doc_id", "text", spark, dir, minAgree = 12))
    val explicit = decisions(Dedup.admitIncrementalStored(
      incoming, "doc_id", "text", spark, dir,
      shingleWidth = 2, numHashes = 16, bands = 8,
      minAgree = 12, threshold = 0.5, nBuckets = 16))
    assert(auto == explicit && auto(1000L)._1 == "dup_existing" &&
      auto(1001L) == ("admitted", 1001L), s"auto=$auto explicit=$explicit")
    // retirement (the whole-store swap) carries the manifest through
    Dedup.compactSignatureIndexStore(spark, dir, Seq(119L).toDF("id"))
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(2, 16, 8, 16)),
      "retirement compaction dropped the parameter manifest")
    assert(decisions(Dedup.admitIncrementalStoredAuto(
      incoming, "doc_id", "text", spark, dir, minAgree = 12)) == auto)
    // a PRE-manifest store cannot drive the auto probe — that would be
    // a guess, the exact class the manifest kills
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_SIGPARAMS"), false))
    intercept[IllegalArgumentException] {
      Dedup.admitIncrementalStoredAuto(incoming, "doc_id", "text", spark, dir)
    }
  }

  test("incremental retirement ≡ full-form: same decisions, cold buckets byte-untouched, fully-retired dirs drop, all-retired store stays readable") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_increretire").toString
    def docText(i: Int): String =
      baseText.split(" ").map(w => w + i).mkString(" ")
    val ex = (0 until 200).map(i => i.toLong -> docText(i)).toDF("doc_id", "text")
    val incoming = Seq(
      1000L -> (docText(42) + " resubmitted"),
      1001L -> ("wholly new submission pergola sundial gnomon " +
        "astrolabe sextant theodolite barometer hygrometer"))
      .toDF("doc_id", "text")
    val (full, incr) = (s"$root/full", s"$root/incr")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", full)
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", incr)
    def decide(d: String) = Dedup.admitIncrementalStored(
        incoming, "doc_id", "text", spark, d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // record every data file under every bucket dir of the incremental
    // store: cold buckets must be BYTE-untouched by the fold
    def fileState(d: String): Map[String, (Long, Long)] =
      new java.io.File(d).listFiles.filter(_.getName.startsWith("bucket="))
        .flatMap(b => b.listFiles.filter(f => f.isFile &&
          !f.getName.startsWith("_") && !f.getName.startsWith(".")))
        .map(f => f.getPath.stripPrefix(d) -> (f.length, f.lastModified))
        .toMap
    val before = fileState(incr)
    val tombs = Seq(42L).toDF("id")
    Dedup.compactSignatureIndexStore(spark, full, tombs)
    val rewritten = Dedup.compactSignatureIndexStoreIncremental(
      spark, incr, tombs)
    assert(rewritten.nonEmpty && rewritten.forall(_.startsWith("bucket=")))
    // decisions equal the full form's: doc 42's resubmission re-admits
    val (df, di) = (decide(full), decide(incr))
    assert(df == di, s"full=$df incr=$di")
    assert(di(1000L) == ("admitted", 1000L), s"$di")
    // untouched buckets: identical file set, lengths, mtimes
    val after = fileState(incr)
    val cold = before.keySet.filterNot(p =>
      rewritten.exists(b => p.startsWith(s"/$b/")))
    assert(cold.nonEmpty, "fixture too small: every bucket was touched")
    cold.foreach { p =>
      assert(after.get(p).contains(before(p)),
        s"cold-bucket file $p changed: ${before(p)} -> ${after.get(p)}")
    }
    assert(Dedup.readSigParams(spark, incr).isDefined,
      "incremental retirement lost the root manifest")
    // no-hit tombstones: zero directories rewritten (pure metadata pass)
    assert(Dedup.compactSignatureIndexStoreIncremental(
      spark, incr, Seq(999999L).toDF("id")).isEmpty)
    // retire EVERYTHING: emptied dirs drop, the sentinel keeps the
    // store readable, and re-ingest of retired content admits
    Dedup.compactSignatureIndexStoreIncremental(
      spark, incr, (0 until 200).map(_.toLong).toDF("id"))
    assert(spark.read.parquet(incr).count() == 0,
      "all-retired store still serves rows")
    val again = decide(incr)
    assert(again(1000L) == ("admitted", 1000L) &&
      again(1001L) == ("admitted", 1001L), s"$again")
  }

  test("bucketed signature append: backfill+append ≡ one-shot write (decisions), manifest enforced on append") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_sigappend").toString
    def docText(i: Int): String =
      baseText.split(" ").map(w => w + i).mkString(" ")
    val wave1 = (0 until 100).map(i => i.toLong -> docText(i))
    val wave2 = (100 until 160).map(i => i.toLong -> docText(i))
    val incoming = Seq(
      1000L -> (docText(42) + " resubmitted"),   // in wave 1
      1001L -> (docText(150) + " resubmitted"),  // in wave 2 (appended)
      1002L -> ("wholly new submission pergola sundial gnomon " +
        "astrolabe sextant theodolite barometer hygrometer"))
      .toDF("doc_id", "text")
    val (oneShot, grown) = (s"$root/oneshot", s"$root/grown")
    Dedup.writeSignatureIndexStore(
      (wave1 ++ wave2).toDF("doc_id", "text"), "doc_id", "text", oneShot)
    Dedup.appendSignatureIndexStore(wave1.toDF("doc_id", "text"),
      "doc_id", "text", grown) // first write stamps the manifest
    assert(Dedup.readSigParams(spark, grown)
      == Some(Dedup.SigParams(3, 12, 4, 64)))
    Dedup.appendSignatureIndexStore(wave2.toDF("doc_id", "text"),
      "doc_id", "text", grown)
    def decide(d: String) = Dedup.admitIncrementalStoredAuto(
        incoming, "doc_id", "text", spark, d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val (a, b) = (decide(oneShot), decide(grown))
    assert(a == b, s"oneShot=$a grown=$b")
    assert(a(1000L) == ("dup_existing", 42L) &&
      a(1001L) == ("dup_existing", 150L) &&
      a(1002L) == ("admitted", 1002L), s"$a")
    // appending at OTHER parameters against the stamped layout is loud
    intercept[IllegalArgumentException] {
      Dedup.appendSignatureIndexStore(wave2.toDF("doc_id", "text"),
        "doc_id", "text", grown, bands = 6)
    }
  }

  test("streaming admission adopts the store's parameters at (re)start; a mismatched direct batch call fails loudly") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sigadopt").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    val src1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingIngest
      .admissionWriter(src1.toDF.toDF("id", "text"), corpus, index)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      src1.addData(1L -> baseText); q1.processAllAvailable()
    } finally q1.stop()
    assert(Dedup.readSigParams(spark, index)
      == Some(Dedup.SigParams(3, 12, 4, 0)),
      "first admission batch did not stamp the manifest")
    // restart under a CHANGED config (shingleWidth 6): without adoption
    // the incoming batch's signatures would be computed over 6-shingles
    // against an index built over 3-shingles — zero agreement, and the
    // near-dup below would be silently ADMITTED
    val src2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingIngest
      .admissionWriter(src2.toDF.toDF("id", "text"), corpus, index,
        shingleWidth = 6)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      src2.addData(2L -> (baseText + " adopted tail")); q2.processAllAvailable()
    } finally q2.stop()
    val ids = spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    assert(ids == Set(1L),
      s"restarted writer did not adopt the store's parameters: $ids")
    // a direct batch call at mismatched parameters cannot corrupt the
    // store silently either — admitBatch self-protects
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingIngest.admitBatch(
        spark, Seq(9L -> baseText).toDF("id", "text"), corpus, index,
        shingleWidth = 6, batchId = Some(7L))
    }
  }

  test("bucketed streaming admission: decisions ≡ batch=-layout writer; redelivery idempotent even over landed signatures; retirement re-admits") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_admbucketed").toString
    val textB = "bravo document with its own register sprocket flywheel " +
      "camshaft piston gasket manifold throttle venturi carburetor"
    val textC = "charlie document disjoint again lighthouse breakwater " +
      "quay bollard mooring fathom spindrift gunwale transom keelson"
    val waves: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> baseText, 2L -> textB),
      Seq(10L -> (baseText + " echo tail"), // dup_existing of 1 (cross-batch)
        11L -> textC, 12L -> textC),        // twins: keeper + dup_batch
      Seq(20L -> (textB + " second echo"))) // dup_existing of 2
    def drive(writer: (org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
        tag: String): Set[Long] = {
      val (corpus, index) = (s"$dir/$tag/corpus", s"$dir/$tag/index")
      val src = MemoryStream[(Long, String)]
      val q = writer(src.toDF.toDF("id", "text"), corpus, index)
        .option("checkpointLocation", s"$dir/$tag/ckpt").start()
      try waves.foreach { w => src.addData(w: _*); q.processAllAvailable() }
      finally q.stop()
      spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    }
    val batchLayout = drive((s, c, i) =>
      graft.streaming.StreamingIngest.admissionWriter(s, c, i), "flat")
    val bucketed = drive((s, c, i) =>
      graft.streaming.StreamingIngest.admissionWriterBucketed(s, c, i,
        nBuckets = 16), "bkt")
    assert(bucketed == batchLayout && bucketed == Set(1L, 2L, 11L),
      s"bucketed=$bucketed batch-layout=$batchLayout")
    val index = s"$dir/bkt/index"
    assert(Dedup.readSigParams(spark, index)
      == Some(Dedup.SigParams(3, 12, 4, 16)),
      "bucketed admission index missing its manifest")
    assert(new java.io.File(index).listFiles()
      .map(_.getName).count(_.startsWith("bucket=")) > 1,
      "index is not bucket-partitioned")

    // WORST-CASE redelivery: the crashed attempt already appended the
    // batch's own signatures; the re-decision must exclude them (docs
    // would otherwise fold onto themselves as dup_existing) and the
    // corpus slice must REWRITE, not duplicate
    val corpus = s"$dir/bkt/corpus"
    val params = Dedup.readSigParams(spark, index).get
    val freshD = "delta document on its own footing astrolabe quadrant " +
      "nocturnal almucantar alidade torquetum armilla dioptra"
    val b3 = Seq(30L -> freshD).toDF("id", "text")
    Dedup.appendSignatureIndexStore(b3, "id", "text", index,
      params.shingleWidth, params.numHashes, params.bands, params.nBuckets)
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, b3, corpus, index, params, 9, 0.5, batchId = 3L)
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, b3, corpus, index, params, 9, 0.5, batchId = 3L)
    val ids = spark.read.parquet(corpus).select("id").as[Long].collect()
    assert(ids.count(_ == 30L) == 1 && ids.toSet == Set(1L, 2L, 11L, 30L),
      s"redelivery broke the corpus: ${ids.toSeq.sorted}")

    // retirement through the INCREMENTAL compactor: retired content
    // re-admits; the replay-duplicated rows of bucket(s) holding doc 30
    // fold away when touched
    Dedup.compactSignatureIndexStoreIncremental(spark, index,
      Seq(1L).toDF("id"))
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, Seq(40L -> (baseText + " echo tail")).toDF("id", "text"),
      corpus, index, params, 9, 0.5, batchId = 4L)
    val after = spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    assert(after == Set(1L, 2L, 11L, 30L, 40L),
      s"retired content did not re-admit through the bucketed loop: $after")
  }

  // ~40 distinct indexed tokens per doc — docs are pairwise far apart,
  // so retirement/rebucket fixtures control exactly who collides
  private def distinctText(i: Long): String =
    (1 to 40).map(w => s"t${i}w$w").mkString(" ")

  test("rebucketSignatureIndexStore: decisions invariant, manifest republished atomically, appends continue at the new count, sentinel store survives (r16 verdict #1)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_rebucket").toString + "/index"
    val ex = (0L until 8L).map(i => i -> distinctText(i)).toDF("doc_id", "text")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir, nBuckets = 8)
    val inc = Seq(
      100L -> (distinctText(3) + " echo"), // dup_existing of 3
      101L -> distinctText(900L))          // fresh
      .toDF("doc_id", "text")
    def decide(frame: org.apache.spark.sql.DataFrame) =
      Dedup.admitIncrementalStoredAuto(frame, "doc_id", "text", spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
    val before = decide(inc)
    assert(before(100L) == ("dup_existing", 3L) &&
      before(101L)._1 == "admitted", s"fixture broken: $before")
    Dedup.rebucketSignatureIndexStore(spark, dir, 64)
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(3, 12, 4, 64)),
      "rebucket did not republish the manifest")
    assert(decide(inc) == before,
      "re-bucketing changed admission decisions")
    // the store keeps WORKING at the new count: append at the adopted
    // parameters, then a near-dup of the appended doc folds onto it
    val p = Dedup.readSigParams(spark, dir).get
    Dedup.appendSignatureIndexStore(
      Seq(200L -> distinctText(901L)).toDF("doc_id", "text"),
      "doc_id", "text", dir, p.shingleWidth, p.numHashes, p.bands,
      p.nBuckets)
    val d2 = decide(Seq(300L -> (distinctText(901L) + " tail"))
      .toDF("doc_id", "text"))
    assert(d2(300L) == ("dup_existing", 200L), s"post-rebucket append: $d2")
    // a pre-manifest / missing store refuses loudly
    intercept[IllegalArgumentException] {
      Dedup.rebucketSignatureIndexStore(spark, dir + "_absent", 16)
    }
    // an all-retired (sentinel-only) store re-buckets to a READABLE one
    Dedup.compactSignatureIndexStore(spark, dir,
      (Seq(200L) ++ (0L until 8L)).toDF("id"))
    Dedup.rebucketSignatureIndexStore(spark, dir, 16)
    assert(spark.read.parquet(dir).count() == 0L,
      "all-retired store must stay readable through a rebucket")
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(3, 12, 4, 16)))
  }

  test("auto-rebucket: the bucketed admission writer grows nBuckets at the occupancy threshold; decisions ≡ a fixed-bucket run; restart adopts the migrated count") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_autorebucket").toString
    val waves: Seq[Seq[(Long, String)]] =
      (0 until 4).map(w => (0 until 4).map(i =>
        (w * 10L + i) -> distinctText(w * 10L + i)).toSeq)
    def drive(tag: String, target: Long): Set[Long] = {
      val (corpus, index) = (s"$dir/$tag/corpus", s"$dir/$tag/index")
      val src = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingIngest.admissionWriterBucketed(
          src.toDF.toDF("id", "text"), corpus, index,
          nBuckets = 4, targetRowsPerBucket = target, maxBuckets = 256)
        .option("checkpointLocation", s"$dir/$tag/ckpt").start()
      try waves.foreach { w => src.addData(w: _*); q.processAllAvailable() }
      finally q.stop()
      spark.read.parquet(corpus).select("id").as[Long].collect().toSet
    }
    // 16 admitted docs × 4 bands = 64 index rows; target 4 rows/bucket
    // forces growth past the initial 4 buckets
    val auto = drive("auto", target = 4L)
    val fixed = drive("fixed", target = 0L)
    assert(auto == fixed && auto.size == 16,
      s"auto=$auto fixed=$fixed")
    val migrated = Dedup.readSigParams(spark, s"$dir/auto/index").get
    assert(migrated.nBuckets > 4,
      s"occupancy threshold never pulled the lever: $migrated")
    assert(Dedup.readSigParams(spark, s"$dir/fixed/index").get.nBuckets == 4)
    // the migrated store keeps deciding correctly at its MANIFEST
    // count (what a restarted writer adopts — the adoptSigParams path
    // is pinned by the flat-writer adoption test; here we pin that the
    // manifest now carries the migrated count and decisions at it fold
    // near-dups of pre-migration docs)
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, Seq(500L -> (distinctText(0L) + " echo"),
        501L -> distinctText(777L)).toDF("id", "text"),
      s"$dir/auto/corpus", s"$dir/auto/index", migrated,
      9, 0.5, batchId = 100L)
    val after = spark.read.parquet(s"$dir/auto/corpus")
      .select("id").as[Long].collect().toSet
    assert(after == fixed + 501L,
      s"post-migration batch at the manifest count mis-decided: $after")
    // a writer that did NOT adopt (configured nBuckets=4) fails loudly
    // instead of pruning to the wrong directories
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingIngest.admitBatchBucketed(
        spark, Seq(600L -> distinctText(888L)).toDF("id", "text"),
        s"$dir/auto/corpus", s"$dir/auto/index",
        Dedup.SigParams(3, 12, 4, 4), 9, 0.5, batchId = 101L)
    }
  }

  test("byText retirement ≡ scan discovery; cumulative tombstones converge to zero-rewrite cycles; retired content re-admits (r16 verdict #2)") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_bytext").toString
    val docs = (0L until 12L).map(i => i -> distinctText(i))
    val ex = docs.toDF("doc_id", "text")
    val (scanDir, textDir) = (s"$root/scan", s"$root/bytext")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", scanDir, nBuckets = 16)
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", textDir, nBuckets = 16)
    val tomb = Seq(2L -> distinctText(2L), 5L -> distinctText(5L))
      .toDF("id", "text")
    val scanTouched = Dedup.compactSignatureIndexStoreIncremental(
      spark, scanDir, tomb.select("id"))
    val textTouched = Dedup.compactSignatureIndexStoreIncrementalByText(
      spark, textDir, tomb)
    assert(textTouched.toSet == scanTouched.toSet,
      s"byText touched $textTouched, scan touched $scanTouched")
    def rows(d: String) = spark.read.parquet(d)
      .select("id", "bkey", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2).toString)).toSet
    assert(rows(textDir) == rows(scanDir),
      "byText and scan folds left different stores")
    // CONVERGENCE: re-folding the same (cumulative) tombstone set reads
    // only candidate dirs, verifies they hold nothing, rewrites nothing
    assert(Dedup.compactSignatureIndexStoreIncrementalByText(
      spark, textDir, tomb).isEmpty,
      "already-folded tombstones must not rewrite")
    // retired content re-admits identically on both stores
    val inc = Seq(1000L -> (distinctText(2L) + " returning"))
      .toDF("doc_id", "text")
    def decide(d: String) =
      Dedup.admitIncrementalStoredAuto(inc, "doc_id", "text", spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(decide(textDir) == decide(scanDir)
      && decide(textDir) == Seq((1000L, "admitted")),
      "retired content must re-admit")
    // contract edges: pre-manifest and flat layouts refuse loudly
    intercept[IllegalArgumentException] {
      Dedup.compactSignatureIndexStoreIncrementalByText(
        spark, s"$root/absent", tomb)
    }
    // an ALL-retired store stays readable through the byText fold
    Dedup.compactSignatureIndexStoreIncrementalByText(spark, textDir,
      docs.toDF("id", "text"))
    assert(spark.read.parquet(textDir).count() == 0L,
      "all-retired store must stay readable")
  }

  test("bucketed chunk admission: zero-growth re-ingest, stream ≡ batch replay, decisions ≡ the batch=-layout chunk writer, redelivery idempotent (r16 verdict #3)") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_chunkbkt").toString
    def longText(tag: String): String =
      (1 to 60).map(i => s"$tag$i").mkString(" ")
    val textA = longText("alpha")
    val textB = longText("beta")
    val batches = Seq(
      Seq(1L -> textA),
      Seq(2L -> textA, 3L -> textB), // doc 2: every chunk dups doc 1's
      Seq(4L -> textB))              // doc 4 dups doc 3
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest
      .dedupedChunkIndexWriterBucketed(src.toDF.toDF("doc_id", "text"),
        s"$dir/index", s"$dir/sig", nBuckets = 16)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      val counts = batches.map { b =>
        src.addData(b: _*); q.processAllAvailable()
        spark.read.parquet(s"$dir/index").count()
      }
      assert(counts == Seq(3, 6, 6), s"index growth: $counts")
    } finally q.stop()
    // the signature store is the BUCKETED layout with its manifest
    assert(Dedup.readSigParams(spark, s"$dir/sig")
      == Some(Dedup.SigParams(3, 12, 4, 16)),
      "chunk sig store missing its bucketed manifest")
    assert(new java.io.File(s"$dir/sig").listFiles()
      .map(_.getName).count(_.startsWith("bucket=")) > 1,
      "chunk sig store is not bucket-partitioned")
    def chunkIds(d: String) = spark.read.parquet(d)
      .select("chunk_id").as[String].collect().toSet
    val streamed = chunkIds(s"$dir/index")
    // ≡ the batch= chunk writer's decisions on the same stream
    val bdir = Files.createTempDirectory("graft_chunkbkt_b").toString
    batches.foreach { b =>
      graft.streaming.StreamingIngest.dedupedChunkIndexBatch(
        spark, b.toDF("doc_id", "text"), s"$bdir/index", s"$bdir/sig",
        32, 24, 16, 3, 12, 4, 9, 0.5)
    }
    assert(streamed == chunkIds(s"$bdir/index"),
      "bucketed chunk decisions diverged from the batch= writer's")
    // ≡ sequential bucketed batch replay, and WORST-CASE redelivery
    // (own signatures already landed) rewrites rather than duplicates
    val rdir = Files.createTempDirectory("graft_chunkbkt_r").toString
    val params = Dedup.SigParams(3, 12, 4, 16)
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingIngest.dedupedChunkIndexBatchBucketed(
        spark, b.toDF("doc_id", "text"), s"$rdir/index", s"$rdir/sig",
        32, 24, 16, params, 9, 0.5, batchId = i.toLong)
    }
    assert(chunkIds(s"$rdir/index") == streamed)
    graft.streaming.StreamingIngest.dedupedChunkIndexBatchBucketed(
      spark, batches.last.toDF("doc_id", "text"), s"$rdir/index",
      s"$rdir/sig", 32, 24, 16, params, 9, 0.5, batchId = 2L)
    val ids = spark.read.parquet(s"$rdir/index")
      .select("chunk_id").as[String].collect()
    assert(ids.length == ids.distinct.length
      && ids.toSet == streamed,
      s"redelivery duplicated or re-decided chunks: ${ids.toSeq.sorted}")
  }

  test("chunkTombstones: a doc-grain drop retires its chunks via byText; re-ingested content re-admits; (id,text) tombstones also feed the scan compactor") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_chunktomb").toString
    def longText(tag: String): String =
      (1 to 60).map(i => s"$tag$i").mkString(" ")
    val params = Dedup.SigParams(3, 12, 4, 16)
    val docs = Seq(1L -> longText("alpha"), 3L -> longText("beta"))
      .toDF("doc_id", "text")
    graft.streaming.StreamingIngest.dedupedChunkIndexBatchBucketed(
      spark, docs, s"$dir/index", s"$dir/sig",
      32, 24, 16, params, 9, 0.5, batchId = 0L)
    // a re-crawl of doc 3's content under a new doc_id folds (dup)
    def reingest(batchId: Long): Set[String] = {
      graft.streaming.StreamingIngest.dedupedChunkIndexBatchBucketed(
        spark, Seq((100L + batchId) -> longText("beta")).toDF("doc_id", "text"),
        s"$dir/index", s"$dir/sig", 32, 24, 16, params, 9, 0.5, batchId)
      spark.read.parquet(s"$dir/index")
        .select("doc_id").distinct().as[Long].collect().toSet
        .map((d: Long) => d.toString)
    }
    assert(reingest(1L) == Set("1", "3"),
      "pre-retirement re-crawl must fold onto the standing chunks")
    // curation drops doc 3: its chunk tombstones retire the chunk sigs
    // through the TEXT-DERIVED fold (the grain matches the writer's)
    val tomb = graft.streaming.StreamingIngest.chunkTombstones(
      docs.filter(col("doc_id") === 3L))
    assert(tomb.select("id").as[String].collect().forall(_.startsWith("3:")))
    val touched = Dedup.compactSignatureIndexStoreIncrementalByText(
      spark, s"$dir/sig", tomb)
    assert(touched.nonEmpty, "chunk tombstones touched no buckets")
    // the same content now re-ADMITS (content genuinely gone from the
    // decision state), indexed under the new doc id
    assert(reingest(2L) == Set("1", "3", "102"),
      "retired chunk content did not re-admit")
    // and an (id, text) tombstone frame ALSO feeds the scan compactor
    // (extra columns ignored — one tombstonesDir serves both forms)
    Dedup.compactSignatureIndexStoreIncremental(spark, s"$dir/sig",
      graft.streaming.StreamingIngest.chunkTombstones(
        Seq(102L -> longText("beta")).toDF("doc_id", "text")))
    assert(reingest(3L) == Set("1", "3", "102", "103"),
      "scan compactor with (id,text) tombstones did not retire")
  }

  test("foldBatchSlices: per-batch corpus dirs fold to {batch=-1, max}; content invariant; manifest carried; replay of the kept slice still rewrites (r16 verdict #4)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_fold").toString
    val texts = (0L until 6L).map(i => i -> distinctText(i))
    // three flat-layout admission batches: corpus AND index get batch=
    // slices, and the index carries a root _SIGPARAMS manifest
    texts.grouped(2).zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingIngest.admitBatch(
        spark, b.toDF("id", "text"), s"$dir/corpus", s"$dir/index",
        batchId = Some(i.toLong))
    }
    def corpusIds() = spark.read.parquet(s"$dir/corpus")
      .select("id").as[Long].collect().toSet
    val beforeIds = corpusIds()
    def slices(d: String) = new java.io.File(d).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(slices(s"$dir/corpus") == Set("batch=0", "batch=1", "batch=2"))
    assert(graft.sources.Sinks.foldBatchSlices(spark, s"$dir/corpus"))
    assert(graft.sources.Sinks.foldBatchSlices(spark, s"$dir/index"))
    assert(slices(s"$dir/corpus") == Set("batch=-1", "batch=2"),
      s"fold kept ${slices(s"$dir/corpus")}")
    assert(corpusIds() == beforeIds, "fold changed the corpus content")
    assert(Dedup.readSigParams(spark, s"$dir/index")
      == Some(Dedup.SigParams(3, 12, 4, 0)),
      "fold dropped the index manifest")
    // below the threshold: a second fold is a no-op
    assert(!graft.sources.Sinks.foldBatchSlices(spark, s"$dir/corpus"))
    // the kept slice is the only replayable one — redelivering it
    // rewrites (batch-scoped overwrite), never duplicates, and its
    // decision still excludes its own partition
    graft.streaming.StreamingIngest.admitBatch(
      spark, texts.grouped(2).toSeq(2).toDF("id", "text"),
      s"$dir/corpus", s"$dir/index", batchId = Some(2L))
    val ids = spark.read.parquet(s"$dir/corpus").select("id").as[Long].collect()
    assert(ids.length == ids.distinct.length && ids.toSet == beforeIds,
      s"replay after fold duplicated: ${ids.toSeq.sorted}")
    // decisions against the folded index are unchanged: a near-dup of a
    // FOLDED doc still folds onto it
    val dec = Dedup.admitIncremental(
      Seq(100L -> (distinctText(0L) + " tail")).toDF("id", "text"),
      "id", "text",
      spark.read.parquet(s"$dir/index").select("id", "sig"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(dec.toSeq == Seq((100L, "dup_existing", 0L)), s"got ${dec.toSeq}")
  }

  test("fold write is shuffle-free: no Exchange in the fold transform, " +
      "so writer parallelism tracks the scan (r18 verdict #5 skew fix)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_foldplan").toString
    (0L until 6L).map(j => (j, distinctText(j), j / 2))
      .toDF("id", "text", "batch")
      .write.mode("overwrite").partitionBy("batch").parquet(dir)
    // sanity reuse of the real entry point: content-invariant fold
    val before = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    // plan assertion on the transform the fold writes: zero shuffle
    // exchanges between the scan and the partitioned write — the old
    // repartition(col("batch")) funnelled ~every row into the one
    // batch=-1 hash partition (single writer task at any store size)
    val folded = graft.sources.Sinks.foldedSlices(spark.read.parquet(dir), 2L)
    val exchanges = folded.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"fold transform must stay shuffle-free, found: $exchanges")
    assert(graft.sources.Sinks.foldBatchSlices(spark, dir, minDirs = 2))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet
      == before, "fold changed logical content")
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(names == Set("batch=-1", "batch=2"), s"got $names")
  }

  test("slice-count fold lever: the bucketed writer folds when batch= " +
      "slices cross maxCorpusSlices; content invariant; cadence-off") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_slicefold").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    val waves: Seq[Seq[(Long, String)]] =
      (0 until 6).map(w => Seq((w.toLong, distinctText(w.toLong))))
    val src = MemoryStream[(Long, String)]
    // foldCorpusEvery = 0: the ONLY fold trigger is the slice count
    val q = graft.streaming.StreamingIngest.admissionWriterBucketed(
        src.toDF.toDF("id", "text"), corpus, index,
        nBuckets = 16, maxCorpusSlices = 3)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try waves.foreach { w => src.addData(w: _*); q.processAllAvailable() }
    finally q.stop()
    def slices() = new java.io.File(corpus).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    // 6 batches, lever at 3: folds fired at batch 3 (4 slices) and
    // batch 5 (4 again) — the listing is BOUNDED at maxSlices + 1
    // where the cadence-off writer would have accumulated 6 dirs
    assert(slices() == Set("batch=-1", "batch=5"),
      s"slice lever left ${slices()}")
    val ids = spark.read.parquet(corpus).select("id").as[Long].collect()
    assert(ids.sorted.toSeq == (0L until 6L) && ids.length == 6,
      s"folds changed the corpus content: ${ids.toSeq.sorted}")
    // restart: the counter reseeds from ONE listing and keeps folding
    val q2 = graft.streaming.StreamingIngest.admissionWriterBucketed(
        src.toDF.toDF("id", "text"), corpus, index,
        nBuckets = 16, maxCorpusSlices = 3)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      (6 until 9).foreach { w =>
        src.addData(Seq((w.toLong, distinctText(w.toLong))): _*)
        q2.processAllAvailable()
      }
    } finally q2.stop()
    assert(slices().size <= 4,
      s"restarted writer lost the slice lever: ${slices()}")
    assert(spark.read.parquet(corpus).select("id").as[Long].collect()
      .sorted.toSeq == (0L until 9L))
  }

  test("empty micro-batches: no schema-less index dir is ever created and later batches decide normally (r16 ADVICE #2)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_admempty").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    val params = Dedup.SigParams(3, 12, 4, 16)
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    // an empty FIRST batch used to create indexDir holding only
    // _SIGPARAMS/_SUCCESS (a partitioned write of zero rows emits no
    // schema-bearing part files) — the next batch's existence-based
    // hasIndex then passed and the parquet read crashed the stream
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, empty, corpus, index, params, 9, 0.5, batchId = 0L)
    assert(!new java.io.File(index).exists(),
      "an empty first batch must not create a schema-less index dir")
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, Seq(1L -> baseText).toDF("id", "text"),
      corpus, index, params, 9, 0.5, batchId = 1L)
    // an empty LATER batch against a standing index is a no-op append
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, empty, corpus, index, params, 9, 0.5, batchId = 2L)
    // and the standing index still DECIDES: a near-dup of doc 1 folds
    graft.streaming.StreamingIngest.admitBatchBucketed(
      spark, Seq(10L -> (baseText + " echo tail")).toDF("id", "text"),
      corpus, index, params, 9, 0.5, batchId = 3L)
    val admitted = spark.read.parquet(corpus)
      .select("id").as[Long].collect().toSet
    assert(admitted == Set(1L),
      s"decisions after empty batches wrong: $admitted")
  }

  test("store rebuild publishes data + _SIGPARAMS in one rename: heals a crash-aside store, republishes at NEW parameters, leaves no swap debris (r16 ADVICE #1)") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_sigpub").toString
    val dir = s"$root/index"
    val ex = (0 until 6)
      .map(i => i.toLong -> (s"publish doc $i " + baseText))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir)
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(3, 12, 4, 64)))
    // the swapInPlace crash window: live dir renamed aside, nothing
    // renamed back — data AND manifest sit only in the aside slot
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".swap.old")))
    // a REBUILD at new parameters as the first post-crash operation
    // must heal, then publish new data + new manifest in one rename
    Dedup.writeSignatureIndexStore(ex, "doc_id", "text", dir,
      shingleWidth = 2, numHashes = 16, bands = 8, nBuckets = 16)
    assert(Dedup.readSigParams(spark, dir)
      == Some(Dedup.SigParams(2, 16, 8, 16)),
      "rebuild did not republish the manifest with the data")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".swap.tmp"))
      && !fs.exists(new org.apache.hadoop.fs.Path(dir + ".swap.old")),
      "rebuild left swap debris")
    // the Auto probe decides at the REBUILT parameters
    val dec = Dedup.admitIncrementalStoredAuto(
        Seq(100L -> (s"publish doc 0 " + baseText)).toDF("doc_id", "text"),
        "doc_id", "text", spark, dir, minAgree = 12)
      .collect().map(r => r.getString(1)).toSeq
    assert(dec == Seq("dup_existing"), s"probe after rebuild: $dec")
  }

  test("plan audit: admission joins are equi-joins on band keys / ids — no cartesian, no all-pairs BNLJ") {
    val ex = (0 until 50).map(i => i.toLong -> (s"existing doc $i " + baseText.take(120))).toDF("doc_id", "text")
    val inc = (0 until 10).map(i => (1000L + i) -> (s"incoming doc $i " + baseText.take(120))).toDF("doc_id", "text")
    val df = Dedup.admitIncremental(inc, "doc_id", "text",
      Dedup.signatureIndex(ex, "doc_id", "text"))
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
