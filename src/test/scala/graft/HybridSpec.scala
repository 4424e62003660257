package graft

import graft.functions.VectorFunctions.dotProduct
import graft.operators.{Ann, Embed, Hybrid}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality + determinism contract for hybrid lexical+vector retrieval
  * (the q69 operator), measured — not asserted — on the driver corpus.
  *
  * Two ground truths, because they answer different questions:
  *  - KNOWN-ITEM truth: each q69 query is built from its source doc's
  *    prefix, so the relevant item is the source doc. This is the task
  *    the queries encode, and the branches are complementary on it
  *    (the prefix embedding drifts from the full-doc embedding, so the
  *    vector branch misses known items the lexical branch nails).
  *    Contract: fusion recall@10 >= each branch alone.
  *  - EXACT-COSINE truth: brute-force cosine top-10. The vector branch
  *    approximates this truth BY DEFINITION, while this corpus' uniform
  *    vocabulary makes term-overlap uncorrelated with the embedding
  *    metric — so fusing costs some best-branch recall (the standard
  *    RRF insurance trade: you pay it because a priori you don't know
  *    which branch is informative). Contract: fusion >= the lexical
  *    branch and retains the majority of the truth set.
  *
  * Plus the rank-arithmetic guarantee that makes RRF robust at all:
  * with k0 (60) >= branch depth k (20), a doc in BOTH branches' top-k
  * scores at least 2/(k0+k) > 1/(k0+1), the best single-branch score —
  * so consensus docs always outrank single-branch docs. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val sfDir = "/root/testdata/sf0.001"

  private def base: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  // same query construction as q69: every 97th doc asks to re-find
  // itself via its own 40-char prefix
  private def queryDf: DataFrame =
    base.filter(col("doc_id") % 97 === 0).select(
      col("doc_id").as("qid"),
      concat(lit("find "), substring(col("text"), 1, 40)).as("qtext"))

  private lazy val queries = queryDf.cache()
  private lazy val docsE = base.select(col("doc_id").as("id"),
    Embed.embedText(col("text"), dim).as("embedding")).cache()
  private lazy val queriesE = queries.select(col("qid"),
    Embed.embedText(col("qtext"), dim).as("qvec"))
  private lazy val lex = Hybrid.lexicalTopK(
    base.withColumnRenamed("doc_id", "id"), queries, k = 20).cache()
  private lazy val vec = Ann.topKMultiTable(docsE, queriesE, k = 20,
    dim = dim, nPlanes = 4, nTables = 8).cache()
  private lazy val fused = Hybrid.rrf(Seq("lex" -> lex, "vec" -> vec), k = 10).cache()

  test("known-item truth: fusion recall@10 >= each branch alone") {
    val nq = queries.count().toDouble
    def knownItem(r: DataFrame): Double =
      r.filter(col("rank") <= 10).filter(col("qid") === col("id"))
        .count().toDouble / nq
    val (rLex, rVec, rFused) = (knownItem(lex), knownItem(vec), knownItem(fused))
    info(f"known-item recall@10 lex=$rLex%.3f vec=$rVec%.3f fused=$rFused%.3f")
    assert(rFused >= rLex)
    assert(rFused >= rVec)
    assert(rFused > 0.0) // and it finds known items at all
  }

  test("exact-cosine truth: fusion >= lexical branch, majority retained") {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    val truth = queriesE.crossJoin(docsE)
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("qid", "id")
      .cache()
    val nTruth = truth.count().toDouble
    def recallAt10(r: DataFrame): Double =
      r.filter(col("rank") <= 10).select("qid", "id")
        .join(truth, Seq("qid", "id")).count().toDouble / nTruth
    val (rLex, rVec, rFused) = (recallAt10(lex), recallAt10(vec), recallAt10(fused))
    info(f"cosine recall@10 lex=$rLex%.3f vec=$rVec%.3f fused=$rFused%.3f")
    assert(rFused >= rLex)
    assert(rFused > 0.5)
    // sanity on the setup itself: the vector branch must approximate
    // its own metric well, and the lexical branch must be the weak one
    assert(rVec > 0.8 && rLex < rVec)
  }

  test("consensus docs always outrank single-branch docs in fused order") {
    val consensus = fused.filter(col("lex_rnk") > 0 && col("vec_rnk") > 0)
    val single = fused.filter(col("lex_rnk") === 0 || col("vec_rnk") === 0)
    val violations = consensus.as("c").join(single.as("s"),
      col("c.qid") === col("s.qid") && col("c.rank") > col("s.rank")).count()
    assert(violations === 0L)
    assert(consensus.count() > 0L) // the guarantee is exercised, not vacuous
  }

  test("lexicalTopK is deterministic under repartitioning") {
    val docs = base.withColumnRenamed("doc_id", "id")
    def run(d: DataFrame): Set[(Long, Long, Long, Long, Long)] =
      Hybrid.lexicalTopK(d, queryDf, k = 20)
        .select(col("qid"), col("id"), col("hits"), col("tfsum"),
          col("rank").cast("long"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("bm25TopK: hand-computed ordering — length norm and multi-term coverage") {
    // avgdl = (3+4+2+3)/4 = 3; idf(banana) = idf(apple) (both df=2)
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple apple apple apple"),
      (3L, "cherry banana"),
      (4L, "unrelated words here")).toDF("id", "text")
    // single term: d1 (tf=2, dl=3 → 4.4/3.2 = 1.375·idf) beats
    // d3 (tf=1, dl=2 → 2.2/1.9 ≈ 1.158·idf): tf saturation still favors
    // the doc with more occurrences at comparable length
    val q1 = Seq((10L, "banana")).toDF("qid", "qtext")
    val r1 = Hybrid.bm25TopK(docs, q1, k = 4).orderBy("rank").collect()
    assert(r1.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
    // two terms: d1 covers both (1.0 + 1.375 = 2.375·idf) and beats
    // d2's saturated single term (tf=4 → 1.6·idf) — term coverage
    // dominates raw repetition, the defining BM25 behavior
    val q2 = Seq((11L, "apple banana")).toDF("qid", "qtext")
    val r2 = Hybrid.bm25TopK(docs, q2, k = 4).orderBy("rank").collect()
    assert(r2.head.getAs[Long]("id") == 1L)
    assert(r2.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    // scores verified against the closed form (rounded to 6dp like the op)
    // same expression shapes as the operator (k1+1 computed, not a 2.2
    // literal — the two can differ in the last ulp)
    val idf = math.log(1.0 + (4.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val d1 = r1.head.getAs[Double]("score")
    assert(d1 == r6(idf * (2.0 * (1.2 + 1)) /
        (2.0 + 1.2 * (0.25 + 0.75 * (3.0 / (12.0 / 4.0))))),
      s"d1 banana score mismatch: $d1")
  }

  test("linearFusion: hand-computed min-max norms, tie case, missing-branch zeros") {
    // branch A: d1=10, d2=5, d3=0 → norms 1.0, 0.5, 0.0
    // branch B: d2=2, d4=2 (all tied → both norm 1.0)
    // fused(0.5, 0.5): d2 = 0.25 + 0.5 = 0.75; d1 = d4 = 0.5; d3 = 0.0
    val a = Seq((1L, 10L, 10.0), (1L, 20L, 5.0), (1L, 30L, 0.0))
      .toDF("qid", "id", "score")
    val b = Seq((1L, 20L, 2.0), (1L, 40L, 2.0)).toDF("qid", "id", "score")
    val r = Hybrid.linearFusion(Seq(("a", a, 0.5), ("b", b, 0.5)), k = 10)
      .orderBy("rank").collect()
      .map(x => (x.getAs[Long]("id"), x.getAs[Double]("a_norm"),
        x.getAs[Double]("b_norm"), x.getAs[Double]("fused")))
    assert(r.toSeq == Seq(
      (20L, 0.5, 1.0, 0.75), // consensus doc leads
      (10L, 1.0, 0.0, 0.5), // fused tie at 0.5 breaks by id: 10 < 40
      (40L, 0.0, 1.0, 0.5),
      (30L, 0.0, 0.0, 0.0)), r.mkString(", "))
  }

  test("bm25TopK is deterministic under repartitioning") {
    val docs = base.withColumnRenamed("doc_id", "id")
    def run(d: DataFrame): Set[(Long, Long, Double, Long)] =
      Hybrid.bm25TopK(d, queryDf, k = 10)
        .select(col("qid"), col("id"), col("score"), col("rank").cast("long"))
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(run(docs) === run(docs.repartition(7)))
  }
}
