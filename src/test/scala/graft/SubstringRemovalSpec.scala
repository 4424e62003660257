package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.DataFrame

/** Corpus-grain substring REMOVAL gate (SubstringDedup.
  * removeDuplicateSpans): planted fixtures with disjoint character
  * classes make expected cleaned text exact; a seeded-random
  * small-alphabet corpus (dense natural overlaps) is checked against a
  * driver-side brute coverage reference; idempotence is asserted on
  * both. The q138 oracle adds the end-to-end hash gate over the
  * md5-chain planted corpus. */
class SubstringRemovalSpec extends SparkSpec {

  import SubstringDedup.SuffixAutomaton

  private def cleanMap(df: DataFrame): Map[String, (String, Int)] =
    df.collect().map(r => (r.getAs[Any]("id").toString,
      (r.getAs[String]("text"), r.getAs[Int]("n_cut")))).toMap

  test("coverageIntervals: exact merged intervals from the match profile") {
    val sam = new SuffixAutomaton("zzabcdefqq")
    // 'abcdef' at [2,7]; 'abcde' at [10,14]
    assert(sam.coverageIntervals("XXabcdefYYabcdeZZ", 5) ==
      List((2, 7), (10, 14)))
    assert(sam.coverageIntervals("XXabcdefYYabcdeZZ", 6) == List((2, 7)))
    assert(sam.coverageIntervals("XXabcdefYYabcdeZZ", 7) == Nil)
    assert(sam.coverageIntervals("", 1) == Nil)
    // adjacent coverage merges: 'abc' then 'def' both match, the
    // profile at minLen=3 covers [0,5] as one interval
    assert(new SuffixAutomaton("abcXdef").coverageIntervals("abcdef", 3) ==
      List((0, 5)))
  }

  test("planted spans: exact cut, adjacent-union across two earlier partners") {
    import spark.implicits._
    val textA = "abcdefghijklmnopqrstuvwxyz" * 3 // 78 chars, lowercase
    val textB = "ABCDEFGHIJKLMNOPQRSTUVWXYZ" * 3 // 78 chars, uppercase
    val sliceA = textA.substring(5, 45)  // 40 chars
    val sliceB = textB.substring(7, 47)  // 40 chars
    // c embeds sliceA directly followed by sliceB: the two per-partner
    // coverage intervals are ADJACENT and must cut as one 80-char block
    val textC = "0123456789" + sliceA + sliceB + "9876543210"
    val docs = Seq((1L, textA), (2L, textB), (3L, textC)).toDF("id", "text")
    val got = cleanMap(
      SubstringDedup.removeDuplicateSpans(docs, minLen = 10, k = 4, w = 5))
    assert(got("1") == ((textA, 0)), "earliest holder untouched")
    assert(got("2") == ((textB, 0)))
    assert(got("3") == (("0123456789" + "9876543210", 80)), s"${got("3")}")
  }

  test("exact duplicate cleans to the empty string; first occurrence wins") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((10L, t), (20L, t), (30L, "zzz" + t + "qqq"))
      .toDF("id", "text")
    val got = cleanMap(
      SubstringDedup.removeDuplicateSpans(docs, minLen = 10, k = 4, w = 5))
    assert(got("10") == ((t, 0)))
    assert(got("20") == (("", t.length)), "exact dup fully covered")
    assert(got("30") == (("zzz" + "qqq", t.length)), "embedded copy cut")
  }

  private def bruteClean(
      docs: Seq[(Long, String)], minLen: Int): Map[String, (String, Int)] =
    docs.map { case (id, t) =>
      val earlier = docs.filter(_._1 < id).map(_._2)
      val covered = Array.fill(t.length)(false)
      for (a <- earlier; q <- 0 to t.length - minLen)
        if (a.contains(t.substring(q, q + minLen))) {
          var l = minLen
          while (q + l < t.length && a.contains(t.substring(q, q + l + 1)))
            l += 1
          (q until q + l).foreach(covered(_) = true)
        }
      val clean =
        t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
      (id.toString, (clean, covered.count(identity)))
    }.toMap

  test("brute-reference equality on a dense small-alphabet random corpus") {
    import spark.implicits._
    // 2-letter alphabet: ~10 shared 12-gram pairs per doc pair in
    // expectation — coverage is patchy and genuinely exercises the
    // interval union (a 3-letter alphabet at this length is near-empty)
    val rnd = new scala.util.Random(4242)
    val docs = (1L to 8L).map { id =>
      val n = 150 + rnd.nextInt(100)
      (id, Array.fill(n)("ab".charAt(rnd.nextInt(2))).mkString)
    }
    val expected = bruteClean(docs, minLen = 12)
    val got = cleanMap(SubstringDedup.removeDuplicateSpans(
      docs.toDF("id", "text"), minLen = 12, k = 4, w = 5))
    assert(got == expected)
  }

  test("exact-dup short-circuit at multiplicity: semantics match brute") {
    import spark.implicits._
    // a text duplicated 4x (would be 6 pairs through the fingerprint
    // join without the short-circuit), a doc embedding one of its
    // spans, and a duplicated doc SHORTER than minLen (must pass
    // through uncut — too short to host a qualifying span)
    val base = "abcdefghijklmnopqrstuvwxyz" * 3
    val docs = Seq(
      (1L, base), (2L, base), (3L, base), (4L, base),
      (5L, "00000" + base.substring(10, 40) + "11111"),
      (6L, "tiny"), (7L, "tiny"))
    val expected = bruteClean(docs, minLen = 12)
    val got = cleanMap(SubstringDedup.removeDuplicateSpans(
      docs.toDF("id", "text"), minLen = 12, k = 4, w = 5))
    assert(got == expected)
    assert(got("2") == (("", base.length)) && got("4") == (("", base.length)))
    assert(got("7") == (("tiny", 0)), "below-minLen dup must stay intact")
  }

  /** Brute coverage of `t` against a set of source texts: every
    * position inside a ≥minLen substring of `t` contained in ANY
    * source (maximal extension, same semantics as bruteClean's inner
    * loop). */
  private def bruteCovered(
      t: String, sources: Seq[String], minLen: Int): (String, Int) = {
    val covered = Array.fill(t.length)(false)
    for (a <- sources; q <- 0 to t.length - minLen)
      if (a.contains(t.substring(q, q + minLen))) {
        var l = minLen
        while (q + l < t.length && a.contains(t.substring(q, q + l + 1)))
          l += 1
        (q until q + l).foreach(covered(_) = true)
      }
    val clean =
      t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
    (clean, covered.count(identity))
  }

  test("removeContaminatedSpans: planted slice cut, copies empty, clean docs pass") {
    import spark.implicits._
    val s1 = "abcdefghijklmnopqrstuvwxyz" // 26-char contaminated span
    val train = Seq(
      (1L, "0000" + s1 + "1111"),            // embeds an eval span
      (2L, "9876543210" * 5),                // untouched
      (3L, "EV#" + s1 + "#tail-x"))          // exact copy of eval doc
      .toDF("id", "text")
    val eval = Seq((100L, "EV#" + s1 + "#tail-x")).toDF("id", "text")
    val got = cleanMap(SubstringDedup.removeContaminatedSpans(
      train, eval, minLen = 12, k = 4, w = 5))
    assert(got.keySet == Set("1", "2", "3"), "eval docs never emitted")
    assert(got("1") == (("0000" + "1111", 26)))
    assert(got("2") == (("9876543210" * 5, 0)))
    assert(got("3") == (("", ("EV#" + s1 + "#tail-x").length)),
      "train doc equal to an eval doc cleans to empty")
  }

  test("removeContaminatedSpans: brute-reference equality on a dense random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    def mk(n: Int) = Array.fill(n)("ab".charAt(rnd.nextInt(2))).mkString
    val train = (1L to 8L).map(id => (id, mk(150 + rnd.nextInt(100))))
    val eval = (101L to 103L).map(id => (id, mk(120 + rnd.nextInt(60))))
    val evalTexts = eval.map(_._2)
    val expected = train.map { case (id, t) =>
      (id.toString, bruteCovered(t, evalTexts, 12))
    }.toMap
    val got = cleanMap(SubstringDedup.removeContaminatedSpans(
      train.toDF("id", "text"), eval.toDF("id", "text"),
      minLen = 12, k = 4, w = 5))
    assert(got == expected)
  }

  test("iterated removal reaches the fixpoint a single pass misses (seam re-match)") {
    import spark.implicits._
    val P = "alphabravo"    // 10 chars — below minLen alone
    val Q = "charliedel"    // 10 chars — below minLen alone
    val Z = "zuluxrayzulu"  // 12 chars — cut in pass 1
    val e2 = "33333%" + Z + "%44444"      // id 1: earliest holder of Z
    val e1 = "11111%" + P + Q + "%22222"  // id 2: holds P·Q CONTIGUOUS
    val b = "55555#" + P + Z + Q + "#66666"
    val docs = Seq((1L, e2), (2L, e1), (3L, b)).toDF("id", "text")
    // pass 1 cuts exactly Z: P and Q are each 10 < 12, and the distinct
    // sentinel alphabets ('#' vs '%') pin the match boundaries
    val once = cleanMap(
      SubstringDedup.removeDuplicateSpans(docs, minLen = 12, k = 4, w = 5))
    assert(once("3") == (("55555#" + P + Q + "#66666", Z.length)),
      "single pass must leave the seam")
    // ...which makes P·Q contiguous — now a 20-char run held by the
    // earlier doc 2, so the fixpoint cuts it too
    val fixed = SubstringDedup.removeDuplicateSpansIterated(
        docs, minLen = 12, maxIter = 5, k = 4, w = 5)
      .collect().map(r => (r.getAs[Any]("id").toString,
        (r.getAs[String]("text"), r.getAs[Long]("n_cut")))).toMap
    assert(fixed("1") == ((e2, 0L)) && fixed("2") == ((e1, 0L)),
      "earliest holders untouched at the fixpoint")
    assert(fixed("3") == (("55555##66666", (Z.length + P.length + Q.length).toLong)),
      s"fixpoint must also cut the seam: ${fixed("3")}")
    // maxIter=1 degrades to the single pass
    val one = SubstringDedup.removeDuplicateSpansIterated(
        docs, minLen = 12, maxIter = 1, k = 4, w = 5)
      .collect().map(r => (r.getAs[Any]("id").toString,
        r.getAs[String]("text"))).toMap
    assert(one("3") == "55555#" + P + Q + "#66666")
  }

  test("iterated removal converges immediately when one pass suffices") {
    import spark.implicits._
    val textA = "abcdefghijklmnopqrstuvwxyz" * 3
    val docs = Seq(
      (1L, textA),
      (2L, "0123456789" + textA.substring(5, 45) + "9876543210"))
      .toDF("id", "text")
    val once = cleanMap(
      SubstringDedup.removeDuplicateSpans(docs, minLen = 10, k = 4, w = 5))
    val fixed = SubstringDedup.removeDuplicateSpansIterated(
        docs, minLen = 10, maxIter = 5, k = 4, w = 5)
      .collect().map(r => (r.getAs[Any]("id").toString,
        (r.getAs[String]("text"), r.getAs[Long]("n_cut").toInt))).toMap
    assert(fixed == once, "fixpoint == single pass on a seam-free corpus")
  }

  test("incremental fixpoint == naive full-pass loop (r18 optimization)") {
    import spark.implicits._
    // adversarial multi-pass corpus exercising every carry seam:
    //  - a seam re-match needing pass 2 (docs 1/2/3 — the q146 device);
    //  - exact-dup churn: doc 4 duplicates doc 3's ORIGINAL text, so
    //    pass 1 cuts doc 4 to "" via the hash shortcut while doc 3 is
    //    cut by the pair machinery (both leave the stable set);
    //  - an untouched bystander (doc 5) that stays stable throughout.
    val P = "alphabravo"
    val Q = "charliedel"
    val Z = "zuluxrayzulu"
    val b = "55555#" + P + Z + Q + "#66666"
    val docs = Seq(
      (1L, "33333%" + Z + "%44444"),
      (2L, "11111%" + P + Q + "%22222"),
      (3L, b),
      (4L, b),
      (5L, "qqqwwweeerrrtttyyyuuuiiiooo"))
      .toDF("id", "text")
    // naive reference: re-run the FULL single pass until nothing cuts
    var ref = docs.select($"id", $"text", org.apache.spark.sql.functions.lit(0L).as("n_cut"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    var changed = true
    while (changed) {
      val in = ref.toSeq.map { case (id, (t, _)) => (id, t) }.toDF("id", "text")
      val out = cleanMap(SubstringDedup.removeDuplicateSpans(
        in, minLen = 12, k = 4, w = 5))
      changed = false
      ref = ref.map { case (id, (t, n)) =>
        val (t2, cut) = out(id.toString)
        if (cut > 0) changed = true
        (id, (t2, n + cut))
      }
    }
    val got = SubstringDedup.removeDuplicateSpansIterated(
        docs, minLen = 12, maxIter = 6, k = 4, w = 5)
      .collect().map(r => (r.getAs[Long]("id"),
        (r.getAs[String]("text"), r.getAs[Long]("n_cut")))).toMap
    assert(got == ref, s"incremental diverged from naive loop:\n$got\nvs\n$ref")
  }

  test("idempotence: clean(clean(x)) == clean(x) on planted and random corpora") {
    import spark.implicits._
    // 3-letter alphabet: sparse natural overlaps, so cut seams are
    // overwhelmingly unlikely to form NEW >=12-char runs matching an
    // earlier doc (idempotence is a fixture property, not a theorem —
    // a seam-spanning re-match is possible in principle; Lee et al.
    // iterate to convergence for exactly that reason)
    val rnd = new scala.util.Random(777)
    val random = (1L to 6L).map { id =>
      val n = 120 + rnd.nextInt(80)
      (id, Array.fill(n)("abc".charAt(rnd.nextInt(3))).mkString)
    }
    val planted = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz" * 2),
      (2L, "0000" + ("abcdefghijklmnopqrstuvwxyz" * 2).substring(3, 33) + "1111"))
    for (corpus <- Seq(random, planted)) {
      val once = SubstringDedup.removeDuplicateSpans(
        corpus.toDF("id", "text"), minLen = 12, k = 4, w = 5)
      val onceRows = once.select("id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
      val twice = cleanMap(SubstringDedup.removeDuplicateSpans(
        onceRows.toDF("id", "text"), minLen = 12, k = 4, w = 5))
      onceRows.foreach { case (id, t) =>
        assert(twice(id.toString) == ((t, 0)),
          s"doc $id changed on second clean: '${twice(id.toString)._1}' vs '$t'")
      }
    }
  }
}
