package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._

/** Substring-grain exact contamination — planted-fixture gate (this
  * operator is spec-only by design: no faithful SQL oracle exists for
  * winnowing + automaton extend, the streaming precedent; the operator
  * scaladoc documents the gap). Fixtures use DISJOINT character sets
  * for train text (lowercase) and eval filler (digits/uppercase), so
  * the planted fragment is provably the unique longest common
  * substring and length/offset assertions are exact. */
class SubstringDedupSpec extends SparkSpec {

  import SubstringDedup.SuffixAutomaton

  // defaults k=20, w=6 -> guarantee threshold k + w - 1 = 25 chars
  private val train1 = "the quick brown fox jumps over the lazy dog while the cat naps"
  private val train2 = "pack my box with five dozen liquor jugs for the long voyage home"

  test("suffix automaton: exact LCS length and earliest eval-side offset") {
    val sam = new SuffixAutomaton("zzabcdefqq")
    assert(sam.longestCommonSubstring("0123abcdef45abcdef") == ((6, 4)),
      "longest match 'abcdef' first occurs at offset 4")
    assert(sam.longestCommonSubstring("XYZ") == ((0, -1)))
    assert(new SuffixAutomaton("").longestCommonSubstring("abc") == ((0, -1)))
  }

  test("planted overlaps: exact pair set, LCS length, and offsets") {
    import spark.implicits._
    val plant1 = train1.substring(10, 40) // 30 chars of train1
    val plant2 = train2.substring(0, 28)  // 28 chars of train2
    val train = Seq(("t1", train1), ("t2", train2)).toDF("id", "text")
    val eval = Seq(
      ("e1", "0123456789" + plant1 + "XYZXYZXYZXYZ"),  // t1 @ offset 10
      ("e2", "55555" + plant1 + "77777"),              // t1 @ offset 5 (amortized-SAM sibling)
      ("e3", plant2 + "0000000000111111111122222222"), // t2 @ offset 0
      ("e4", "9876543210ZYXWVUTSRQPONMLKJIHGFEDCBA9876543210")) // clean
      .toDF("id", "text")
    val got = SubstringDedup.contamination(train, eval, minOverlap = 25)
      .collect()
      .map(r => (r.getAs[String]("eval_id"), r.getAs[String]("train_id"),
        r.getAs[Int]("lcs_len"), r.getAs[Int]("eval_offset"))).toSet
    assert(got == Set(
      ("e1", "t1", 30, 10),
      ("e2", "t1", 30, 5),
      ("e3", "t2", 28, 0)), s"$got")
  }

  test("boundary: exactly k + w - 1 shared chars are detected; one less is not reported") {
    import spark.implicits._
    val at = train1.substring(5, 30)      // exactly 25 = 20 + 6 - 1
    val below = train2.substring(10, 34)  // 24 chars
    val train = Seq(("t1", train1), ("t2", train2)).toDF("id", "text")
    val eval = Seq(("eA", "000" + at + "111"), ("eB", "000" + below + "111"))
      .toDF("id", "text")
    val got = SubstringDedup.contamination(train, eval, minOverlap = 25)
      .collect()
      .map(r => (r.getAs[String]("eval_id"), r.getAs[String]("train_id"),
        r.getAs[Int]("lcs_len"))).toSet
    assert(got == Set(("eA", "t1", 25)), s"$got")
  }

  test("candidate generation is a fingerprint equi-join (no all-pairs), and misses nothing above the guarantee") {
    import spark.implicits._
    // 40 train docs x 40 eval docs, one planted pair — the join must be
    // keyed (plan check) and the guarantee must hold on the one plant
    val train = (1 to 40).map(i => (s"t$i", train1 + s" salt$i padpadpad"))
      .toDF("id", "text")
    val eval = ((1 to 39).map(i => (s"e$i", s"CLEAN${i}0123456789ABCDEFGHIJ" * 3)) :+
      (("e40", "00000" + train1.substring(0, 26) + "ZZZZZ"))).toDF("id", "text")
    val cands = SubstringDedup.candidatePairs(
      train, eval, k = 12, w = 14, idCol = "id", textCol = "text")
    val p = cands.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fingerprint join degraded to all-pairs:\n$p")
    val pairs = cands.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // t1..t40 all contain train1, so e40 is a candidate against many;
    // the guarantee only demands (e40, t1) is PRESENT
    assert(pairs.contains(("e40", "t1")), s"$pairs")
    assert(pairs.forall(_._1 == "e40"), s"clean evals produced candidates: $pairs")
  }

  test("real corpus: exactly matches driver-side brute force (guarantee holds end-to-end)") {
    // The q61 train/eval split over the real documents table: the
    // distributed winnow→join→extend pipeline must find EXACTLY the
    // pairs a brute all-pairs LCS finds (the corpus contains natural
    // >= 25-char overlaps, so the assertion is not vacuous). The brute
    // truth reuses only the automaton (hand-verified above) — the
    // candidate generation under test plays no part in it.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 37 =!= 0)
    val eval = docs.filter(col("doc_id") % 37 === 0)
    val got = SubstringDedup.contamination(
      train, eval, minOverlap = 25, idCol = "doc_id", textCol = "text")
      .collect()
      .map(r => (r.getAs[String]("eval_id"), r.getAs[String]("train_id"),
        r.getAs[Int]("lcs_len"))).toSet
    val trainRows = train.collect().map(r => (r.getLong(0).toString, r.getString(1)))
    val evalRows = eval.collect().map(r => (r.getLong(0).toString, r.getString(1)))
    val brute = (for {
      (tid, ttext) <- trainRows
      sam = new SuffixAutomaton(ttext)
      (eid, etext) <- evalRows
      l = sam.longestCommonSubstring(etext)._1
      if l >= 25
    } yield (eid, tid, l)).toSet
    assert(brute.nonEmpty, "corpus lost its natural overlaps - fixture assumption broken")
    assert(got == brute, s"distributed=${got.size} brute=${brute.size}\n" +
      s"missing=${brute -- got}\nextra=${got -- brute}")
  }

  test("rollup: per-eval worst overlap, hit count, deterministic tie-break") {
    import spark.implicits._
    val plantA = train1.substring(0, 30)
    val plantB = train2.substring(0, 27)
    val train = Seq(("t1", train1), ("t2", train2),
      ("t3", "XX" + plantA + "YY")).toDF("id", "text") // t3 shares plantA too
    val eval = Seq(
      ("e1", "000" + plantA + "111" + plantB + "222"), // hits t1(30), t3(30), t2(27)
      ("e2", "999" + plantB + "888"))                  // hits t2 only
      .toDF("id", "text")
    val r = SubstringDedup.contaminationRollup(train, eval, minOverlap = 25)
      .collect()
      .map(x => x.getAs[String]("eval_id") -> ((x.getAs[Long]("n_train_hits"),
        x.getAs[Int]("max_lcs_len"), x.getAs[String]("worst_train_id")))).toMap
    // e1: three hits; max LCS 30 shared by t1 and t3 -> smallest id wins
    assert(r("e1") == ((3L, 30, "t1")), s"$r")
    assert(r("e2") == ((1L, 27, "t2")), s"$r")
  }

  test("minOverlap below the winnowing guarantee is rejected") {
    import spark.implicits._
    val df = Seq(("a", "x" * 40)).toDF("id", "text")
    intercept[IllegalArgumentException] {
      SubstringDedup.contamination(df, df, minOverlap = 20) // < 25
    }
  }
}
