package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Bucketized interval join: result-equal to the naive inequality join
  * on generated data (boundary-inclusive, multi-bucket intervals, empty
  * overlaps), and plans as a hash equi-join — never a broadcast nested
  * loop on the inequality alone. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  test("bucketized == naive inequality join, across bucket widths") {
    val points = samples(for {
      k <- Gen.chooseNum(0, 4)
      t <- Gen.chooseNum(0L, 1000L)
    } yield (k, t), 120).zipWithIndex
      .map { case ((k, t), i) => (k.toLong, t, i.toLong) }
      .toDF("k", "t", "pid")
    val intervals = samples(for {
      k <- Gen.chooseNum(0, 4)
      lo <- Gen.chooseNum(0L, 950L)
      len <- Gen.chooseNum(0L, 200L) // zero-length intervals included
    } yield (k, lo, lo + len), 40).zipWithIndex
      .map { case ((k, lo, hi), i) => (k.toLong, lo, hi, i.toLong) }
      .toDF("k", "lo", "hi", "iid")
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(7L, 64L, 1024L)) {
      val bucketized = RangeJoin.pointInInterval(
          points, "k", "t", intervals, "k", "lo", "hi", Seq("iid"), w)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketized == naive, s"width $w diverges from naive join")
    }
    assert(naive.nonEmpty, "generator produced no overlaps — test is vacuous")
  }

  test("plan: hash equi-join on (key, bucket), no nested-loop join") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "t", "pid")
    val intervals = Seq((1L, 0L, 10L, 1L)).toDF("k", "lo", "hi", "iid")
    val df = RangeJoin.pointInInterval(
      points, "k", "t", intervals, "k", "lo", "hi", Seq("iid"), 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$p")
    assert(p.contains("HashJoin"), p)
  }
}
