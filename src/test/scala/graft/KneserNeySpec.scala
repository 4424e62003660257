package graft

import graft.operators.TextAnalysis

/** Kneser-Ney family (q101–q103): the distributed smoothers checked
  * against independent SCALAR reimplementations of the Chen-Goodman
  * formulas (plain Scala collections over the same token lists — a
  * second implementation of the math, not a replay of the plan), plus
  * the degenerate-doc contract and the probability-mass invariant that
  * defines a proper smoother.
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Array[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  // corpus with all four count-of-count buckets populated:
  // ab×4, ba×3, bc×2, cb×1, cd×2, dc×2, de×1, ac×1
  private val mknCorpus = Seq(
    (1L, "a b a b a b a b"),
    (2L, "b c b c"),
    (3L, "c d c d c"),
    (4L, "d e"),
    (5L, "a c"),
    (6L, "e"))

  /** Scalar modified-KN: per-doc (n_bigrams, rounded mean logprob). */
  private def scalarMkn(corpus: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val bigrams = corpus.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq
    }
    val all = bigrams.flatMap(_._2)
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1 = cb.count(_._2 == 1).toDouble; val n2 = cb.count(_._2 == 2).toDouble
    val n3 = cb.count(_._2 == 3).toDouble; val n4 = cb.count(_._2 == 4).toDouble
    // same guards + clamps as the operator (degenerate-spectrum rule)
    val y = if (n1 + 2.0 * n2 == 0.0) 0.0 else n1 / (n1 + 2.0 * n2)
    def clamp(raw: Double, k: Double) = math.min(math.max(raw, 0.0), k)
    val d1 = if (n1 == 0) 0.0 else clamp(1.0 - 2.0 * y * n2 / n1, 1.0)
    val d2 = if (n2 == 0) 0.0 else clamp(2.0 - 3.0 * y * n3 / n2, 2.0)
    val d3 = if (n3 == 0) 0.0 else clamp(3.0 - 4.0 * y * n4 / n3, 3.0)
    val nw = cb.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> ((m.count(_._2 == 1).toLong, m.count(_._2 == 2).toLong,
        m.count(_._2 >= 3).toLong))
    }
    val n1b = cb.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nbt = cb.size.toDouble
    def p(w1: String, w2: String): Double = {
      val c = cb((w1, w2)).toDouble
      val dd = if (c == 1) d1 else if (c == 2) d2 else d3
      val (b1, b2, b3) = nw(w1)
      val lam = (d1 * b1 + d2 * b2 + d3 * b3) / cu(w1)
      math.max(c - dd, 0.0) / cu(w1) + lam * (n1b(w2) / nbt)
    }
    bigrams.map { case (id, bs) =>
      if (bs.isEmpty) id -> ((0L, 0.0))
      else id -> ((bs.size.toLong,
        r6(bs.map { case (a, b) => math.log(p(a, b)) }.sum / bs.size))) }.toMap
  }

  test("modifiedKneserNey ≡ scalar Chen-Goodman reimplementation; short docs zero") {
    val expected = scalarMkn(mknCorpus)
    val got = TextAnalysis.modifiedKneserNeyLogProb(
      mknCorpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    assert(got.keySet == expected.keySet)
    for (id <- expected.keys) {
      assert(got(id)._1 == expected(id)._1, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - expected(id)._2) < 1e-9,
        s"doc $id: got ${got(id)._2}, expected ${expected(id)._2}")
    }
    assert(got(6L) == ((0L, 0.0)), "1-token doc must report (0, 0.0)")
  }

  test("modifiedKneserNey: degenerate count spectrum (no singletons/doubletons) stays finite") {
    // the sf0.1 shape: every bigram type has count >= 3, so n1 = n2 = 0
    // and the unguarded Chen-Goodman closed form is 0/0. With the
    // guards: y = 0, d1 = d2 = 0, d3 = 3 — full discount on the 3+
    // bucket, all mass through the continuation term. Hand-check:
    // corpus ab x3 (3 docs) + bc x4 (4 docs) + scorer "x" (no bigrams):
    // p(a,b) = max(3-3,0)/3 + (3·1/3)·(1/2) = 1/2
    // p(b,c) = max(4-3,0)/4 + (3·1/4)·(1/2) = 1/4 + 3/8 = 5/8
    val corpus = Seq.tabulate(3)(i => (i + 1L, "a b")) ++
      Seq.tabulate(4)(i => (i + 10L, "b c")) :+ ((20L, "x"))
    val expected = scalarMkn(corpus)
    val got = TextAnalysis.modifiedKneserNeyLogProb(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got(1L) == ((1L, r6(math.log(0.5)))), s"ab doc: ${got(1L)}")
    assert(got(10L) == ((1L, r6(math.log(0.625)))), s"bc doc: ${got(10L)}")
    assert(got(20L) == ((0L, 0.0)))
    assert(got.values.forall(v => !v._2.isNaN && !v._2.isInfinite))
  }

  test("modifiedKneserNey: per-context probabilities sum to 1 (proper smoother)") {
    // invariant that distinguishes MKN from an ad-hoc discount: for any
    // context w1, Σ_w2∈V [max(c−D(c),0)/c(w1·) + λ(w1)·Pcont(w2)] = 1
    // when summed over the FULL vocabulary (observed mass + λ·1).
    val corpus = mknCorpus
    val all = corpus.flatMap { case (_, t) =>
      toks(t).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))) }
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1 = cb.count(_._2 == 1).toDouble; val n2 = cb.count(_._2 == 2).toDouble
    val n3 = cb.count(_._2 == 3).toDouble; val n4 = cb.count(_._2 == 4).toDouble
    val y = n1 / (n1 + 2.0 * n2)
    val ds = Array(1.0 - 2.0 * y * n2 / n1, 2.0 - 3.0 * y * n3 / n2,
      3.0 - 4.0 * y * n4 / n3)
    val n1b = cb.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nbt = cb.size.toDouble
    for (w1 <- cu.keys) {
      val succ = cb.filter(_._1._1 == w1)
      val discounted = succ.map { case (_, c) =>
        math.max(c - ds(math.min(c, 3).toInt - 1), 0.0) / cu(w1) }.sum
      val lam = succ.map { case (_, c) =>
        ds(math.min(c, 3).toInt - 1) }.sum / cu(w1)
      val cont = n1b.values.map(_ / nbt).sum // = 1 over the full vocab
      assert(math.abs(discounted + lam * cont - 1.0) < 1e-12,
        s"mass for context '$w1'")
    }
  }

  // trigram corpus: abc×3, bca×2, cab×2, abd×2, bda×1, dab×1, bcd×1
  private val knTriCorpus = Seq(
    (1L, "a b c a b c a b c"),
    (2L, "a b d a b d"),
    (3L, "b c d"),
    (4L, "x y"))

  /** Scalar interpolated trigram KN (D = 0.75 both levels). */
  private def scalarKnTri(corpus: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val d = 0.75
    val tris = corpus.map { case (id, t) =>
      id -> toks(t).sliding(3).filter(_.length == 3)
        .map(a => (a(0), a(1), a(2))).toSeq
    }
    val all = tris.flatMap(_._2)
    val ct = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cc = all.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    val nf3 = ct.keys.toSeq.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    val cc2 = ct.keys.toSeq.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size.toLong }
    val md = cc2.toSeq.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val nf2 = cc2.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cw = cc2.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val ntt = cc2.size.toDouble
    def p(t: (String, String, String)): Double = {
      val (w1, w2, w3) = t
      val inner = math.max(cc2((w2, w3)) - d, 0.0) / md(w2) +
        (d * nf2(w2) / md(w2)) * (cw(w3) / ntt)
      math.max(ct(t) - d, 0.0) / cc((w1, w2)) +
        (d * nf3((w1, w2)) / cc((w1, w2))) * inner
    }
    tris.map { case (id, ts) =>
      if (ts.isEmpty) id -> ((0L, 0.0))
      else id -> ((ts.size.toLong,
        r6(ts.map(t => math.log(p(t))).sum / ts.size))) }.toMap
  }

  test("kneserNeyTrigram ≡ scalar two-level reimplementation; short docs zero") {
    val expected = scalarKnTri(knTriCorpus)
    val got = TextAnalysis.kneserNeyTrigramLogProb(
      knTriCorpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_logprob")))).toMap
    assert(got.keySet == expected.keySet)
    for (id <- expected.keys) {
      assert(got(id)._1 == expected(id)._1, s"doc $id n_trigrams")
      assert(math.abs(got(id)._2 - expected(id)._2) < 1e-9,
        s"doc $id: got ${got(id)._2}, expected ${expected(id)._2}")
    }
    assert(got(4L) == ((0L, 0.0)), "2-token doc must report (0, 0.0)")
  }

  test("kneserNeyTrigram rewards corpus-typical text over scrambled text") {
    // the signal the smoother exists for: a doc made of corpus-frequent
    // trigrams scores higher than one whose trigrams are all novel
    val corpus = knTriCorpus ++ Seq((9L, "c a d b a c"))
    val got = TextAnalysis.kneserNeyTrigramLogProb(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(got(1L) > got(9L),
      s"typical ${got(1L)} must beat scrambled ${got(9L)}")
  }
}
