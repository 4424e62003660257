package graft

import graft.operators.Bpe

/** BPE merge learning + segmentation (Bpe): the distributed learner is
  * pinned against a driver-side brute implementation of the classical
  * algorithm (Sennrich et al. 2016) — same (freq DESC, lhs, rhs)
  * tie-break, same greedy left-to-right merge application — on corpora
  * chosen to exercise overlapping-run greediness and frequency ties.
  * The q150/q151 oracles add the cross-engine hash gate. */
class BpeSpec extends SparkSpec {

  /** Driver-side reference: classical BPE over a (word -> freq) map. */
  private def bruteBpe(
      vocab: Map[String, Long], k: Int): (List[(String, String, Long)],
      Map[String, List[String]]) = {
    var syms: Map[String, List[String]] =
      vocab.map { case (w, _) => w -> w.split("").toList }
    val merges = List.newBuilder[(String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; Seq(a, b) <- s.sliding(2) if s.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + vocab(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, f))
        syms = syms.map { case (w, s) =>
          val out = collection.mutable.ListBuffer.empty[String]
          for (x <- s) {
            if (out.nonEmpty && out.last == l && x == r)
              out(out.length - 1) = l + r
            else out += x
          }
          w -> out.toList
        }
        step += 1
      }
    }
    (merges.result(), syms)
  }

  private def learn(words: Seq[(String, Long)], k: Int) = {
    import spark.implicits._
    val vocab = words.toDF("word", "freq")
    val (merges, fin) = Bpe.learnMerges(vocab, k)
    val got = merges.map(m => (m.lhs, m.rhs, m.freq)).toList
    val gotSyms = fin.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Seq[String]]("sym").toList)
      .toMap
    (got, gotSyms)
  }

  test("learnMerges == brute classical BPE (overlapping runs, ties)") {
    // 'lll' forces the greedy-overlap case once (l,l) wins; 'abab'
    // exercises re-pairing after a merge ((a,b) then (ab,ab)).
    val words = Seq("hello" -> 3L, "lll" -> 4L, "abab" -> 5L,
      "he" -> 2L, "x" -> 9L, "llama" -> 1L)
    val (want, wantSyms) = bruteBpe(words.toMap, 6)
    val (got, gotSyms) = learn(words, 6)
    assert(got == want)
    assert(gotSyms == wantSyms)
  }

  test("learnMerges: frequency ties break on (lhs, rhs) ascending") {
    // 'zy' and 'ab' both occur exactly twice: (a,b) must win step 1.
    val words = Seq("zy" -> 2L, "ab" -> 2L)
    val (got, _) = learn(words, 1)
    assert(got == List(("a", "b", 2L)))
  }

  test("learnMerges stops when no pairs remain (all words fused)") {
    val words = Seq("ab" -> 3L, "cd" -> 1L)
    val (got, gotSyms) = learn(words, 10)
    assert(got.length == 2, "two merges exhaust the vocab")
    assert(gotSyms("ab") == List("ab") && gotSyms("cd") == List("cd"))
  }

  test("learnMerges == brute on a seeded random corpus") {
    val rng = new scala.util.Random(41)
    val words = (0 until 120).map { _ =>
      val len = 1 + rng.nextInt(8)
      (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq
    val (want, wantSyms) = bruteBpe(words.toMap, 8)
    val (got, gotSyms) = learn(words, 8)
    assert(got == want)
    assert(gotSyms == wantSyms)
  }

  test("segmentStats: token mass conserves characters; 0-merge identity") {
    import spark.implicits._
    val docs = Seq((1L, "srcA", "aa bb aa"), (2L, "srcB", "ccc aa"))
      .toDF("doc_id", "source", "text")
    val (_, fin0) = Bpe.learnMerges(
      Bpe.vocabulary(docs, "text"), 0)
    val zero = Bpe.segmentStats(docs, "source", "text", fin0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))).toMap
    // with no merges every token is a single char: n_tokens == n_chars
    assert(zero("srcA") == ((6L, 6L)))
    assert(zero("srcB") == ((5L, 5L)))
    val (_, fin) = Bpe.learnMerges(Bpe.vocabulary(docs, "text"), 4)
    val seg = Bpe.segmentStats(docs, "source", "text", fin)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))).toMap
    // merges only ever shrink token count; char mass is invariant
    assert(seg("srcA")._2 == 6L && seg("srcA")._1 < 6L)
    assert(seg("srcB")._2 == 5L && seg("srcB")._1 < 5L)
  }

  /** Driver-side replay of a learned merge sequence over arbitrary
    * words — the brute mirror of Bpe.applyMerges. */
  private def bruteApply(
      words: Seq[String], merges: Seq[(String, String)]): Map[String, List[String]] =
    words.map { w =>
      var s = w.split("").toList
      for ((l, r) <- merges) {
        val out = collection.mutable.ListBuffer.empty[String]
        for (x <- s) {
          if (out.nonEmpty && out.last == l && x == r)
            out(out.length - 1) = l + r
          else out += x
        }
        s = out.toList
      }
      w -> s
    }.toMap

  test("applyMerges == brute replay on held-out words (incl. OOV)") {
    import spark.implicits._
    val trainWords = Seq("hello" -> 3L, "lll" -> 4L, "abab" -> 5L,
      "he" -> 2L, "llama" -> 1L)
    val (merges, _) = Bpe.learnMerges(trainWords.toDF("word", "freq"), 6)
    // held-out mixes seen words, recombinations, and fully-OOV chars
    val heldout = Seq("hello", "ball", "ababab", "qqq", "z", "lllll")
    val got = Bpe.applyMerges(heldout.toDF("word"), merges)
      .collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Seq[String]]("sym").toList)
      .toMap
    val want = bruteApply(heldout, merges.map(m => (m.lhs, m.rhs)))
    assert(got == want)
  }

  test("applyMerges on the training vocab == learnMerges' own segmentation") {
    import spark.implicits._
    val words = Seq("hello" -> 3L, "lll" -> 4L, "abab" -> 5L,
      "he" -> 2L, "x" -> 9L, "llama" -> 1L)
    val (merges, fin) = Bpe.learnMerges(words.toDF("word", "freq"), 8)
    val learned = fin.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Seq[String]]("sym").toList)
      .toMap
    val applied = Bpe.applyMerges(words.map(_._1).toDF("word"), merges)
      .collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Seq[String]]("sym").toList)
      .toMap
    assert(applied == learned)
  }

  test("q156 fertility pipeline completes end-to-end at sf0.001") {
    // Round-9 regression guard: this exact pipeline (learn-on-half,
    // applyMerges at k=8, segmentStats) OOMed the harness JVM because
    // applyMerges stacked 8 un-checkpointed HOF rewrites. The spec
    // asserts completion + shape, not values (the q156 oracle pins
    // values cross-engine).
    val rows = SparkEntry.queries("q156_bpe_fertility")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "heldout"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("segmentation join is broadcast (corpus side never shuffles)") {
    import spark.implicits._
    val docs = Seq((1L, "s", "ab ab cd")).toDF("doc_id", "source", "text")
    val (_, fin) = Bpe.learnMerges(Bpe.vocabulary(docs, "text"), 2)
    val plan = Bpe.segmentStats(docs, "source", "text", fin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
