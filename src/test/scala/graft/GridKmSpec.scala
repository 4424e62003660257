package graft

import org.apache.spark.sql.functions._

/** Equivalence gate for the r19 codegen grid-scoring expression
  * (graft.expressions.GridKmScore) against the interpreted
  * higher-order-function forms it replaced in KMeansTrain: identical
  * Int64 arithmetic, identical first-minimum tie rule, on dense random
  * grids including negative components and ties. */
class GridKmSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260819)
  private val dim = 16
  private val k = 7
  private val cents: Array[Array[Long]] =
    Array.fill(k)(Array.fill(dim)(rnd.nextLong() % 2000000L))
  // plant an exact duplicate centroid so the tie rule is exercised
  cents(4) = cents(1).clone()

  private def vecs(n: Int): Seq[Seq[Long]] =
    (0 until n).map { i =>
      if (i % 11 == 0) cents(i % k).toSeq // exact centroid hits
      else Seq.fill(dim)(rnd.nextLong() % 2000000L)
    }

  private def hofScores(byDot: Boolean) = array(cents.map { c =>
    val dot = aggregate(
      zip_with(col("ue"), typedLit(c), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    if (byDot) lit(-1L) * dot
    else lit(c.map(u => u * u).sum) - lit(2L) * dot
  }: _*)

  test("assign (l2 and negdot) matches the HOF argmin incl. tie-to-first") {
    import spark.implicits._
    val df = vecs(500).toDF("ue")
    for (byDot <- Seq(false, true)) {
      val got = df.select(
        graft.expressions.GridKmScore.assign(col("ue"), cents, byDot).as("g"),
        array_position(hofScores(byDot), array_min(hofScores(byDot)))
          .cast("int").as("h"))
        .collect()
      assert(got.forall(r => r.getInt(0) == r.getInt(1)),
        s"byDot=$byDot mismatch: " +
          got.find(r => r.getInt(0) != r.getInt(1)).toString)
    }
  }

  test("minSqDist matches the HOF min squared distance") {
    import spark.implicits._
    val df = vecs(300).toDF("ue")
    val hof = array_min(array(cents.map { c =>
      aggregate(
        zip_with(col("ue"), typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
    }: _*))
    val got = df.select(
      graft.expressions.GridKmScore.minSqDist(col("ue"), cents).as("g"),
      hof.as("h")).collect()
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("minL2Score matches the HOF min score; dim mismatch is null") {
    import spark.implicits._
    val df = vecs(300).toDF("ue")
    val hof = array_min(array(cents.map { c =>
      lit(c.map(u => u * u).sum) - lit(2L) * aggregate(
        zip_with(col("ue"), typedLit(c), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    }: _*))
    val got = df.select(
      graft.expressions.GridKmScore.minL2Score(col("ue"), cents).as("g"),
      hof.as("h")).collect()
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
    val bad = Seq(Seq(1L, 2L)).toDF("ue")
      .select(graft.expressions.GridKmScore.assign(col("ue"), cents, byDot = false))
      .collect()
    assert(bad.head.isNullAt(0), "dim mismatch must be null, not a score")
  }
}
