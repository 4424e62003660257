package graft

import graft.operators.{Dedup, GraphExpand, Ingest, Knn}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an EMPTY (or
  * seeds-only) result on empty inputs — not throw. At 100 TB, empty
  * partitions, empty deltas, and queries matching nothing are the normal
  * case, not the exception. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs =
    Seq.empty[(String, String, Seq[Float])].toDF("id", "mtype", "embedding")
  private val oneQuery =
    Seq(("q1", "text", Seq(1f, 0f))).toDF("qid", "qtype", "qvec")

  test("KNN over an empty corpus returns no rows") {
    assert(Knn.search(emptyDocs, oneQuery, k = 5).count() == 0)
  }

  test("KNN with an empty query batch returns no rows") {
    val docs = Seq(("a", "text", Seq(1f, 0f))).toDF("id", "mtype", "embedding")
    val noQueries = Seq.empty[(String, String, Seq[Float])].toDF("qid", "qtype", "qvec")
    assert(Knn.search(docs, noQueries, k = 5).count() == 0)
  }

  test("expansion with an empty edge table returns exactly the seeds") {
    val seeds = Seq(("q", "s1", 0.9, 1)).toDF("qid", "id", "sim", "rank")
    val noEdges = Seq.empty[(String, String, Double, Long)]
      .toDF("src", "dst", "score", "seq")
    val faithful = GraphExpand.expandFaithful(seeds, noEdges, k = 5).collect()
    assert(faithful.map(_.getAs[String]("id")).toSeq == Seq("s1"))
    val all = GraphExpand.expandAll(seeds, noEdges, k = 5, depth = 2).collect()
    assert(all.map(_.getAs[String]("id")).toSeq == Seq("s1"))
  }

  test("ingest of an empty batch is a no-op delta") {
    val empty = Seq.empty[(String, String, Long)].toDF("mtype", "data", "seq")
    val existing = Seq(("doc:x", "text")).toDF("id", "mtype")
    assert(Ingest.dedupDelta(
      Ingest.prepare(empty, GraftConf(dim = 4)), existing).count() == 0)
  }

  test("sketch dedup over empty / whitespace-only docs yields no pairs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "!!!")).toDF("doc_id", "text")
    assert(Dedup.nearDupMinhashLsh(docs, "doc_id", "text").count() == 0)
    // simhash of token-less docs is 0 for all three -> they pair with
    // each other (identical empty token multisets) - documented behavior
    val sk = Dedup.nearDupSimhash(docs, "doc_id", "text", bits = 8)
    assert(sk.count() == 3) // C(3,2) pairs, all sketch 0
    assert(sk.select("sketch").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("round-3 operators degrade to empty on empty inputs") {
    val emptyTexts = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(emptyTexts, "doc_id", "text").count() == 0)
    assert(Dedup.nearDupSimhashRadius(emptyTexts, "doc_id", "text").count() == 0)
    val emptySeeds = Seq.empty[(String, String, Double, Int)]
      .toDF("qid", "id", "sim", "rank")
    val edges = Seq(("a", "b", 0.5, 1L)).toDF("src", "dst", "score", "seq")
    assert(GraphExpand.expandFaithfulDepth(emptySeeds, edges, k = 5, depth = 3)
      .count() == 0)
    assert(graft.operators.Ann.topKIvf(
      emptyDocs.drop("mtype"), oneQuery.select(col("qid"), col("qvec")),
      k = 5, dim = 2, nCentroids = 4, nprobe = 2).count() == 0)
  }

  test("IVF probe buckets are distinct and in range for any vector") {
    val vecs = Seq(
      ("a", Seq(1f, 0f, 0f, 0f)),
      ("b", Seq(0f, 0f, 0f, 0f)), // zero vector: every dot ties at 0
      ("c", Seq(-0.5f, 0.5f, -0.5f, 0.5f))).toDF("id", "v")
    val rows = vecs.select(col("id"),
      graft.operators.Ann.ivfProbeBuckets(col("v"), 4, 8, 3).as("probes"))
      .collect()
    rows.foreach { r =>
      val ps = r.getSeq[Int](1)
      assert(ps.length == 3 && ps.distinct.length == 3, s"$r")
      assert(ps.forall(p => p >= 1 && p <= 8), s"$r")
    }
  }

  test("repetition stats: degenerate repeated text scores ~1, diverse prose low, short text 0") {
    val docs = Seq(
      (1L, Seq.fill(50)("buy cheap tokens now").mkString(" ")), // stuffed
      (2L, "the quick brown fox jumps over a lazy dog while rain falls softly tonight"),
      (3L, "too short")) // < 3 tokens -> no grams
      .toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis
      .repetitionStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L)._3 > 0.2, s"keyword stuffing must score high: ${m(1L)}")
    assert(m(2L)._3 < 0.15, s"diverse prose must score low: ${m(2L)}")
    assert(m(2L)._2 == 1L, "no repeated 3-gram in diverse prose")
    assert(m(3L) == ((0L, 0L, 0.0)), s"short doc reports zeros: ${m(3L)}")
  }

  test("empty-string text analysis: zeros, not NaNs") {
    val m = graft.operators.TextAnalysis
      .analyze(Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(m.getAs[Int]("n_tokens") == 0)
    assert(m.getAs[Double]("stopword_ratio") == 0.0)
    assert(m.getAs[Double]("punct_ratio") == 0.0)
    assert(m.getAs[Long]("fingerprint") == 0L)
    assert(!m.getAs[Double]("quality").isNaN)
  }

  test("expandAllCheckpointed completes a depth-10 traversal (lineage truncation)") {
    // 12-node chain: depth 10 reaches exactly node c10 from the seed.
    // The pinned expandAll variant's plan nests one join deeper per hop
    // and analysis cost blows up around this depth (NEXT.md gotcha) —
    // the checkpointed twin must stay O(1) plan per hop and just finish.
    val seeds = Seq(("q", "c0", 1.0, 1)).toDF("qid", "id", "sim", "rank")
    val edges = (0 until 11)
      .map(i => (s"c$i", s"c${i + 1}", 1.0, 1L))
      .toDF("src", "dst", "score", "seq")
    val res = GraphExpand.expandAllCheckpointed(seeds, edges, k = 100, depth = 10)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("score")).toMap
    assert(res.size == 11, s"depth 10 from c0 reaches c0..c10: ${res.keySet}")
    assert(res.contains("c10") && !res.contains("c11"))
    assert(math.abs(res("c10") - math.pow(0.9, 10)) < 1e-9,
      s"ten decay steps compound to 0.9^10: ${res("c10")}")
    // early stop: a 3-node chain at depth 10 must terminate at the
    // diameter (empty frontier), not run 10 joins — and return the chain
    val shortEdges = Seq(("c0", "c1", 1.0, 1L), ("c1", "c2", 1.0, 1L))
      .toDF("src", "dst", "score", "seq")
    val short = GraphExpand.expandAllCheckpointed(seeds, shortEdges, k = 100, depth = 10)
    assert(short.collect().map(_.getAs[String]("id")).toSet == Set("c0", "c1", "c2"))
  }

  test("chunking survives a single extreme document (100k tokens, 1M chars)") {
    // one pathological row must not break the per-row HOF pipeline: a
    // 100k-token doc yields ceil((100000-64)/48)+1 windows from ONE row
    val big = (1 to 100000).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, big), (2L, "small doc")).toDF("doc_id", "text")
    val chunks = graft.operators.Chunking
      .chunkWindows(docs, "doc_id", "text", 64, 48)
    val n = chunks.filter(col("doc_id") === 1L).count()
    assert(n == 1 + math.ceil((100000 - 64) / 48.0).toLong, s"got $n")
    // token mass conservation at stride == window on the same monster
    val disjoint = graft.operators.Chunking
      .chunkWindows(docs, "doc_id", "text", 64, 64)
      .filter(col("doc_id") === 1L)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(disjoint == 100000L)
  }

  test("chunking + pooling degrade to empty on empty/tokenless corpora") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Chunking
      .chunkWindows(none, "doc_id", "text", 8, 4).isEmpty)
    assert(graft.operators.Chunking
      .pooledEmbeddings(none, "doc_id", "text", 8, 4, 16).isEmpty)
    val junk = Seq((1L, "!!! ??? ---"), (2L, "")).toDF("doc_id", "text")
    assert(graft.operators.Chunking
      .chunkWindows(junk, "doc_id", "text", 8, 4).isEmpty)
    assert(graft.operators.Chunking
      .pooledEmbeddings(junk, "doc_id", "text", 8, 4, 16).isEmpty)
  }
}
