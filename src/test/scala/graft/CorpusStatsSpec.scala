package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-audit operators: vocabulary head (q74) and n-gram
  * train→test contamination (q73) — hand-computable semantics plus the
  * plan shapes the 100 TB story depends on. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("vocabStats: hand-computed tf/df/share; ties break by term") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabStats(docs, "doc_id", "text", k = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Double]("share"), r.getAs[Long]("rnk")))
    // tf: a=2, b=2, c=1; total 5; tie a/b at tf=2 breaks to 'a'
    assert(rows.toSeq == Seq(
      ("a", 2L, 1L, 0.4, 1L), ("b", 2L, 2L, 0.4, 2L)))
  }

  test("vocabStats: global top-k plans as TakeOrderedAndProject, not a global window") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.vocabStats(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocabulary top-k must not sort the whole vocab globally:\n$plan")
  }

  test("bigramLogProb: hand-computed corpus LM; short docs report zeros") {
    // corpus bigrams: d1 = (a,b),(b,a),(a,b); d2 = (a,b),(b,c)
    // counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a,·)=3 c(b,·)=2
    // d1 lps: ln(1), ln(1/2), ln(1) → avg = ln(0.5)/3
    // d2 lps: ln(1), ln(1/2)        → avg = ln(0.5)/2
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(m(1L) == ((3L, r6(math.log(1.0 / 2.0) / 3))), s"d1: ${m(1L)}")
    assert(m(2L) == ((2L, r6(math.log(1.0 / 2.0) / 2))), s"d2: ${m(2L)}")
    assert(m(3L) == ((0L, 0.0)), s"short doc: ${m(3L)}")
  }

  test("shingleContamination: full copy = 1.0, partial copy = exact fraction, short doc = 0") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (2L, "the quick brown fox jumps totally novel words appear here"),
      (3L, "too short")).toDF("doc_id", "text") // < 5 tokens: no shingles
    val m = Dedup.shingleContamination(test, train, "doc_id", "text", w = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("contamination")))).toMap
    assert(m(1L) == ((5L, 5L, 1.0)), s"verbatim: ${m(1L)}")
    // doc 2: 10 tokens → 6 shingles; only "the quick brown fox jumps"
    // exists in train → 1/6
    assert(m(2L) == ((6L, 1L, math.floor(1.0 / 6.0 * 1e6 + 0.5) / 1e6)),
      s"partial: ${m(2L)}")
    assert(m(3L) == ((0L, 0L, 0.0)), s"degenerate: ${m(3L)}")
  }
}
