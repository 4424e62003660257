package graft

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Contract tests for the round-7 quality/curation additions:
  * Gopher-rule composite filter, perplexity banding, DSIR importance
  * weights, temperature-scaled mixture allocation. */
class QualityCurationSpec extends SparkSpec {
  import spark.implicits._

  // -- gopherRules ---------------------------------------------------------

  private val goodText = (1 to 60).map(i =>
    Seq("the", "quick", "brown", "fox", "and", "lazy", "dog", "of", "june")(
      i % 9)).mkString(" ")

  test("gopherRules: a well-formed doc passes all five rules") {
    val res = TextAnalysis.gopherRules(
      Seq((1L, goodText)).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(res.length == 1)
    assert(res.head.getAs[Boolean]("pass"))
    assert(res.head.getAs[Long]("n_fail") == 0L)
    assert(res.head.getAs[Long]("n_words") == 60L)
  }

  test("gopherRules: short, symbol-heavy, and stopword-free docs fail the right rules") {
    val short = "too few words here"                       // r_words
    val symbols = goodText + " " + ("###... " * 40).trim   // r_sym
    val noStop = (1 to 60).map(_ => "zebra").mkString(" ") // r_stop (+wlen ok)
    val res = TextAnalysis.gopherRules(
      Seq((1L, short), (2L, symbols), (3L, noStop)).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("id").collect()
    assert(!res(0).getAs[Boolean]("r_words") && !res(0).getAs[Boolean]("pass"))
    assert(!res(1).getAs[Boolean]("r_sym"))
    assert(!res(2).getAs[Boolean]("r_stop"))
    assert(res(2).getAs[Long]("n_stop") == 0L)
  }

  test("gopherRules: empty text reports zeros, not nulls") {
    val res = TextAnalysis.gopherRules(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(res.head.getAs[Long]("n_words") == 0L)
    assert(res.head.getAs[Double]("mean_wlen") == 0.0)
    assert(!res.head.getAs[Boolean]("pass")) // fails r_words (and r_stop)
  }

  // -- perplexityGate ------------------------------------------------------

  test("perplexityGate: bands partition the corpus and counts add up") {
    val docs = Seq(
      (1L, "s1", "abcabcabc abcabc"), (2L, "s1", "abcabcabc abcabc"),
      (3L, "s1", "zqxvjw kpty"), (4L, "s2", "abcabc abcabcabc")
    ).toDF("doc_id", "source", "text")
    val res = TextAnalysis.perplexityGate(
      docs, "doc_id", "text", "source", loMid = -2.0, midHi = -1.0)
    val total = res.agg(sum("n_docs")).head.getLong(0)
    assert(total == 4L)
    val bands = res.select("band").distinct().as[String].collect().toSet
    assert(bands.subsetOf(Set("high", "mid", "low")))
  }

  test("perplexityGate: a doc with no trigram lands in low") {
    val docs = Seq((1L, "s1", "ab"), (2L, "s1", "abcabcabc")).toDF(
      "doc_id", "source", "text")
    val res = TextAnalysis.perplexityGate(
        docs, "doc_id", "text", "source", loMid = -99.0, midHi = -99.0)
      .filter($"band" === "low").collect()
    assert(res.map(_.getAs[Long]("n_docs")).sum == 1L)
  }

  // -- importanceWeights ---------------------------------------------------

  test("importanceWeights: target-domain docs score positive, background negative") {
    val docs = Seq(
      (1L, "wiki", "alpha beta alpha beta"),
      (2L, "wiki", "alpha beta gamma"),
      (3L, "web", "spam spam spam spam"),
      (4L, "web", "spam noise spam")
    ).toDF("doc_id", "source", "text")
    val res = Curation.importanceWeights(
        docs, "doc_id", "text", isTarget = col("source") === "wiki")
      .orderBy("id").collect()
    assert(res(0).getAs[Boolean]("is_target"))
    assert(res(0).getAs[Double]("log_weight") > 0.0) // alpha/beta target-heavy
    assert(res(0).getAs[Boolean]("selected"))
    assert(res(2).getAs[Double]("log_weight") < 0.0) // spam never in target
    assert(!res(2).getAs[Boolean]("selected"))
    assert(res(2).getAs[Long]("n_tokens") == 4L)
  }

  test("importanceWeights: token-free doc reports zero weight, unselected") {
    val docs = Seq((1L, "wiki", "alpha"), (2L, "web", "...")).toDF(
      "doc_id", "source", "text")
    val res = Curation.importanceWeights(
        docs, "doc_id", "text", isTarget = col("source") === "wiki")
      .filter($"id" === 2L).collect()
    assert(res.head.getAs[Long]("n_tokens") == 0L)
    assert(res.head.getAs[Double]("log_weight") == 0.0)
    assert(!res.head.getAs[Boolean]("selected"))
  }

  // -- temperatureMixture --------------------------------------------------

  test("temperatureMixture: allocations are exact, budget-complete, and temperature-flattened") {
    // 400 vs 100 tokens: proportional would split 80/20; sqrt-temperature
    // splits 2:1 — the big source is down-weighted, the small one lifted.
    val docs = Seq(
      (1L, "big", (1 to 400).map(i => s"w$i").mkString(" ")),
      (2L, "small", (1 to 100).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val res = Curation.temperatureMixture(docs, "source", "text", budget = 999L)
      .orderBy("source").collect()
    val byName = res.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("alloc_tokens")).toMap
    assert(byName.values.sum == 999L)          // largest-remainder exactness
    assert(byName("big") == 666L && byName("small") == 333L) // 2:1, not 4:1
  }

  test("temperatureMixture: single source takes the whole budget") {
    val docs = Seq((1L, "only", "a b c d e")).toDF("doc_id", "source", "text")
    val res = Curation.temperatureMixture(docs, "source", "text", budget = 17L)
      .collect()
    assert(res.head.getAs[Long]("alloc_tokens") == 17L)
    assert(res.head.getAs[Double]("share") == 1.0)
  }
}
