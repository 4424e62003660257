package graft

import graft.operators.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval.Auto — the cost-based brute↔ANN switch (r6 verdict
  * Missing #2): below the size cap Auto must be byte-identical to the
  * Brute arm (reference contract preserved), past it byte-identical to
  * the MultiTableLsh arm (the sub-linear plan). The two arms provably
  * differ on this corpus (ANN recall < 1), so arm-equality also proves
  * the switch actually fired rather than both arms coinciding. */
class RetrievalAutoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val k = 5

  private def corpus: DataFrame = Tables.embeddings(spark, sf)
    .select(col("vec_id").cast("string").as("id"),
      lit("text").as("mtype"), col("embedding"))

  private def queries: DataFrame = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").cast("string").as("qid"),
      lit("text").as("qtype"), col("embedding").as("qvec"))

  private def rows(df: DataFrame): Set[(String, String, Double, Int)] =
    df.collect().map(r => (r.getAs[String]("qid"), r.getAs[String]("id"),
      r.getAs[Double]("sim"), r.getAs[Int]("rank"))).toSet

  test("below the cap Auto IS Brute; past it Auto IS MultiTableLsh; the arms differ") {
    val conf = GraftConf.default.copy(dim = 64)
    val brute = rows(Retrieval.Brute.topK(corpus, queries, k, conf))
    val ann = rows(
      Retrieval.MultiTableLsh(dim = 64).topK(corpus, queries, k, conf))
    // precondition: the switch is observable (recall < 1 on 50 queries)
    assert(brute != ann, "arms coincide - switch would be unobservable")

    // huge cap -> Auto resolves to the brute arm
    val under = conf.copy(bruteCorpusWarnBytes = Long.MaxValue)
    assert(rows(Retrieval.Auto().topK(corpus, queries, k, under)) == brute)

    // 1-byte cap -> any corpus estimate exceeds it -> ANN arm, with
    // dim resolved from conf.dim (Auto's dim=0 default)
    val over = conf.copy(bruteCorpusWarnBytes = 1L)
    assert(rows(Retrieval.Auto().topK(corpus, queries, k, over)) == ann)
  }

  test("a growing parquet store flips the escalation decision (the streaming story)") {
    // StreamingIngest re-reads the parquet store every batch and its
    // Catalyst estimate tracks on-disk size — so with a cap set between
    // "small store" and "grown store", Auto's decision flips mid-stream
    // with no caller code. Modeled here with two store snapshots.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_autogrow").toString
    corpus.limit(50).write.parquet(s"$dir/small")
    (1 to 3).foreach(_ => corpus.write.mode("append").parquet(s"$dir/grown"))
    val small = spark.read.parquet(s"$dir/small")
    val grown = spark.read.parquet(s"$dir/grown")
    val sSmall = small.queryExecution.optimizedPlan.stats.sizeInBytes
    val sGrown = grown.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sGrown > sSmall, s"grown store must estimate larger: $sGrown vs $sSmall")
    val cap = GraftConf.default.copy(dim = 64,
      bruteCorpusWarnBytes = ((sSmall + sGrown) / 2).toLong)
    val auto = Retrieval.Auto()
    assert(!auto.escalates(small, cap), "small store must stay on the brute arm")
    assert(auto.escalates(grown, cap), "grown store must take the ANN arm")
  }

  test("RDD-backed plans (localCheckpoint / emptyRDD) never escalate: unknown ≠ huge") {
    // the r12 HEAD regression: StreamingIngest's corpus is
    // existing ∪ localCheckpoint(delta); both an emptyRDD-backed
    // `existing` and the checkpointed delta are LogicalRDD leaves whose
    // stats default to spark.sql.defaultSizeInBytes (≈ Long.MaxValue),
    // so the raw union estimate blew past any cap on a THREE-document
    // corpus and Auto silently took the ANN arm (no self-clamp, bucket
    // misses → empty edge deltas). Pin the fix: unknown-size leaves
    // count 0 toward the escalation decision.
    val conf = GraftConf.default.copy(dim = 64)
    val auto = Retrieval.Auto()

    val emptyStore = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "id STRING, mtype STRING, embedding ARRAY<FLOAT>"))
    val delta = corpus.limit(3).localCheckpoint()
    val union = emptyStore.unionByName(delta)
    val raw = union.queryExecution.optimizedPlan.stats.sizeInBytes
    // precondition: the raw estimate really is poisoned (else this test
    // proves nothing — Spark could start propagating checkpoint stats)
    assert(raw >= BigInt(Long.MaxValue),
      s"raw union estimate $raw no longer hits the unknown sentinel; " +
        "re-examine whether knownSizeEstimate still has a job")
    assert(!auto.escalates(union, conf),
      "a 3-doc RDD-backed union must NOT escalate to the ANN arm")
    // and the full-contract brute arm actually runs on it via Auto, even
    // with the throwing guard armed (the exact processBatch shape)
    val strict = conf.copy(failOnOversizeBruteKnn = true)
    val out = auto.topK(union, queries.limit(2), 2, strict)
    assert(out.count() > 0)

    // the parquet side still drives escalation: big store ∪ tiny
    // checkpointed delta carries a non-zero (trusted-leaf) estimate and
    // the decision flips exactly around it — RDD leaves (whatever their
    // checkpoint-preserved stats claim) contribute nothing either way
    val mixed = corpus.unionByName(delta.select("id", "mtype", "embedding"))
    val mixedEst = Retrieval.knownSizeEstimate(mixed)
    assert(mixedEst > 0, "parquet side must stay visible through the RDD leaf")
    val capUnder = conf.copy(bruteCorpusWarnBytes = (mixedEst - 1).toLong)
    val capOver = conf.copy(bruteCorpusWarnBytes = (mixedEst * 2).toLong)
    assert(auto.escalates(mixed, capUnder),
      "parquet side over cap must still escalate despite the RDD leaf")
    assert(!auto.escalates(mixed, capOver))
    delta.unpersist()
  }

  test("RDD-backed leaves are classified untrusted by TYPE (r13 verdict #2)") {
    import org.apache.spark.sql.graftbridge.Bridge
    // a localCheckpointed frame and an emptyRDD frame are LogicalRDD
    // leaves; a parquet scan is not. The typed check means a Spark
    // rename breaks compilation instead of silently re-trusting
    // sentinel stats (the r12 regression family).
    val ckpt = corpus.limit(3).localCheckpoint()
    assert(ckpt.queryExecution.optimizedPlan.collectLeaves().forall(Bridge.isRddLeaf),
      "localCheckpoint leaf must be recognized as RDD-backed")
    val emptyStore = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("id STRING"))
    assert(emptyStore.queryExecution.optimizedPlan.collectLeaves()
      .forall(Bridge.isRddLeaf), "emptyRDD leaf must be recognized as RDD-backed")
    assert(!corpus.queryExecution.optimizedPlan.collectLeaves()
      .exists(Bridge.isRddLeaf), "a parquet scan must stay trusted")
    // and knownSizeEstimate therefore never trusts the checkpointed frame
    assert(Retrieval.knownSizeEstimate(ckpt) == BigInt(0))
    ckpt.unpersist()
  }

  test("public path: a large RDD-backed corpus is OVER-cap via the bounded row probe (r13 ADVICE #1)") {
    val conf = GraftConf.default.copy(dim = 64)
    // rowBytes = 4*dim + 64 = 320; cap 3200 bytes → maxRows = 10. A
    // 50-row checkpointed frame must be classified over-cap on the
    // public path (the probe counts 11 > 10) even though its Catalyst
    // stats are the unusable sentinel...
    val big = corpus.limit(50).localCheckpoint()
    val cap = conf.copy(bruteCorpusWarnBytes = 3200L)
    assert(Retrieval.Auto().escalates(big, cap),
      "50-row RDD corpus must escalate past a 10-row cap on the public path")
    // ...so failOnOversizeBruteKnn actually FIRES on RDD-backed corpora
    intercept[IllegalArgumentException] {
      operators.Knn.search(big, queries.limit(1), 2,
        cap.copy(failOnOversizeBruteKnn = true))
    }
    // the streaming micro-batch contract restores the count-as-0 bias:
    // no escalation, guard silent, the r12-safe shape
    val mb = cap.copy(rddFramesAreMicroBatches = true)
    assert(!Retrieval.Auto().escalates(big, mb))
    assert(operators.Knn.search(big, queries.limit(1).localCheckpoint(), 2,
      mb.copy(failOnOversizeBruteKnn = true)).count() > 0)
    // broadcast-hint gate, same geometry: an over-cap RDD query batch is
    // returned UNHINTED (same reference), a small one comes back hinted
    // (new plan object wrapping the hint)
    val q50 = queries.limit(50).localCheckpoint()
    val qcap = conf.copy(broadcastQueryCapBytes = 3200L)
    assert(operators.Knn.maybeBroadcast(q50, qcap) eq q50,
      "over-cap RDD query batch must not receive the broadcast hint")
    assert(!(operators.Knn.maybeBroadcast(q50.limit(3), qcap) eq q50),
      "an under-cap batch is hinted")
    big.unpersist(); q50.unpersist()
  }

  test("Auto never trips the brute-size guard on the ANN side of the cap") {
    // failOnOversizeBruteKnn would make Knn.search THROW past the cap;
    // Auto must have already switched to the ANN arm at that point, so
    // the combination is safe by construction.
    val conf = GraftConf.default.copy(dim = 64,
      bruteCorpusWarnBytes = 1L, failOnOversizeBruteKnn = true)
    assert(Retrieval.Auto().topK(corpus, queries, k, conf).count() > 0)
  }
}
