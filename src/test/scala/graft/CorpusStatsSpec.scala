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

  test("pmiCollocations: hand-computed PMI; minCount filter; tie-break by (w1,w2)") {
    // bigrams: xy×2, yx×1, pq×1; N=4; c1: x=2,y=1,p=1; c2: y=2,x=1,q=1
    // PMI(x,y)=ln(2·4/(2·2))=ln2; PMI(y,x)=PMI(p,q)=ln4 — a tie that
    // must break by w1: (p,q) before (y,x)
    val docs = Seq((1L, "x y x y"), (2L, "p q")).toDF("doc_id", "text")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = TextAnalysis.pmiCollocations(docs, "doc_id", "text", k = 2, minCount = 1L)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_pair"), r.getAs[Double]("pmi"), r.getAs[Long]("rnk")))
    assert(rows.toSeq == Seq(
      ("p", "q", 1L, r6(math.log(4.0)), 1L),
      ("y", "x", 1L, r6(math.log(4.0)), 2L)), rows.toSeq.toString)
    // minCount=2 keeps only the repeated pair
    val top = TextAnalysis.pmiCollocations(docs, "doc_id", "text", k = 5, minCount = 2L)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Double]("pmi")))
    assert(top.toSeq == Seq(("x", "y", r6(math.log(2.0)))), top.toSeq.toString)
  }

  test("pmiCollocations: top-k plans as TakeOrderedAndProject, not a global window") {
    val docs = Seq((1L, "x y x y"), (2L, "p q")).toDF("doc_id", "text")
    val plan = TextAnalysis.pmiCollocations(docs, "doc_id", "text", k = 2, minCount = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"collocation top-k must not sort all pairs globally:\n$plan")
  }

  test("klFromCorpus: hand-computed divergences; empty doc reports zeros") {
    // corpus: a×2, b×4 (N=6); doc1 p=(2/3,1/3) → KL=(1/3)ln2;
    // doc2 p=(0,1) → KL=ln(3/2); doc3 empty → (0, 0.0)
    val docs = Seq((1L, "a a b"), (2L, "b b b"), (3L, "...")).toDF("doc_id", "text")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = TextAnalysis.klFromCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("kl")))).toMap
    val exp1 = (2.0 / 3) * math.log((2.0 / 3) / (2.0 / 6)) +
      (1.0 / 3) * math.log((1.0 / 3) / (4.0 / 6))
    assert(m(1L) == ((3L, r6(exp1))), s"d1: ${m(1L)}")
    assert(m(2L) == ((3L, r6(math.log((3.0 / 3) / (4.0 / 6))))), s"d2: ${m(2L)}")
    assert(m(3L) == ((0L, 0.0)), s"empty: ${m(3L)}")
    // Gibbs: KL ≥ 0 for every doc
    assert(m.values.forall(_._2 >= 0.0), "KL must be non-negative")
  }

  test("typeTokenStats: hand-computed diversity panel; empty source reports zeros") {
    // A: tokens a,a,b,c -> 4 tokens, 3 types, 2 hapax, ttr .75, hapax 2/3
    val docs = Seq(("A", "a a b"), ("A", "c"), ("B", "..."))
      .toDF("source", "text")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = TextAnalysis.typeTokenStats(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"),
          r.getAs[Double]("ttr"), r.getAs[Double]("hapax_ratio")))).toMap
    assert(m("A") == ((2L, 4L, 3L, 2L, 0.75, r6(2.0 / 3))), s"A: ${m("A")}")
    assert(m("B") == ((1L, 0L, 0L, 0L, 0.0, 0.0)), s"B: ${m("B")}")
  }

  test("crossSourceBigramTransfer: hand-computed coverage + covered logprob matrix") {
    // A: "a b a c" -> types ab,ba,ac (each x1), ctx a=2,b=1; B: "a b"
    val docs = Seq(("A", "a b a c"), ("B", "a b")).toDF("source", "text")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = TextAnalysis.crossSourceBigramTransfer(docs, "source", "text")
      .collect().map(r => (r.getAs[String]("train_source"),
        r.getAs[String]("eval_source")) ->
        ((r.getAs[Long]("n_covered"), r.getAs[Double]("coverage"),
          r.getAs[Double]("avg_logprob")))).toMap
    assert(m.size == 4, s"full 2x2 grid expected: $m")
    // diagonal: coverage is the tautology 1.0
    assert(m(("A", "A")) == ((3L, 1.0, r6(2 * math.log(0.5) / 3))), s"AA: ${m(("A", "A"))}")
    assert(m(("B", "B")) == ((1L, 1.0, 0.0)), s"BB: ${m(("B", "B"))}")
    // B's only bigram (a,b) is in A's model at P(b|a)=1/2
    assert(m(("A", "B")) == ((1L, 1.0, r6(math.log(0.5)))), s"AB: ${m(("A", "B"))}")
    // A's ab is covered by B at P=1; ba/ac are novel to B
    assert(m(("B", "A")) == ((1L, r6(1.0 / 3), 0.0)), s"BA: ${m(("B", "A"))}")
  }

  test("sourceJsd: identical = 0, disjoint = ln 2, half-overlap = ln2/2") {
    val docs = Seq(("A", "a b"), ("B", "a c"), ("C", "a b"), ("D", "x y"))
      .toDF("source", "text")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = TextAnalysis.sourceJsd(docs, "source", "text")
      .collect().map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("jsd")))).toMap
    assert(m.size == 6, s"all unordered pairs expected: ${m.keySet}")
    assert(m(("A", "C")) == ((2L, 0.0)), s"identical: ${m(("A", "C"))}")
    assert(m(("A", "D")) == ((0L, r6(math.log(2.0)))), s"disjoint: ${m(("A", "D"))}")
    // share 'a' at equal prob (zero contribution); half the mass private
    assert(m(("A", "B")) == ((1L, r6(0.5 * math.log(2.0)))), s"half: ${m(("A", "B"))}")
    assert(m(("B", "C")) == m(("A", "B")), "JSD must respect the A=C identity")
    // bounds: 0 <= jsd <= ln 2 for every pair
    assert(m.values.forall(v => v._2 >= 0.0 && v._2 <= math.log(2.0) + 1e-12))
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
