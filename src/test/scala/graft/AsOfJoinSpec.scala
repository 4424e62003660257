package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics + plan shape: backward inclusive match, largest
  * tiebreak at equal times, NULL payload when nothing precedes, and —
  * the scale claim — a single shuffle with no join operator at all. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("u1", 10L, "e1"), // before any right row -> NULL
    ("u1", 20L, "e2"), // exactly at a right row -> inclusive
    ("u1", 35L, "e3"), // between rights -> latest earlier
    ("u2", 50L, "e4") // key with no right rows at all
  ).toDF("k", "t", "ev")

  private lazy val right = Seq(
    ("u1", 20L, 1L, 100.0),
    ("u1", 20L, 2L, 200.0), // same (key, time): larger tiebreak wins
    ("u1", 30L, 3L, 300.0),
    ("u1", 40L, 4L, 400.0) // after every left row -> never matched
  ).toDF("k", "t", "okey", "price")

  private def run = AsOfJoin.asOf(
    left, "k", "t", right, "k", "t",
    rTieBreak = "okey", rPayload = Seq("okey", "price"))

  test("backward inclusive match with largest-tiebreak tie resolution") {
    val m = run.collect()
      .map(r => r.getAs[String]("ev") ->
        (Option(r.getAs[java.lang.Long]("okey")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("price")).map(_.toDouble))).toMap
    assert(m("e1") == ((None, None)), s"nothing precedes t=10: ${m("e1")}")
    assert(m("e2") == ((Some(2L), Some(200.0))),
      s"equal-time right row must be visible, larger tiebreak wins: ${m("e2")}")
    assert(m("e3") == ((Some(3L), Some(300.0))), m("e3").toString)
    assert(m("e4") == ((None, None)), s"keyless side stays NULL: ${m("e4")}")
    assert(m.size == 4, "every left row survives (left-join semantics)")
  }

  test("plan: union-merge form — one exchange, ZERO join operators") {
    val df = run
    df.collect()
    // AQE plan strings repeat the tree under "== Initial Plan ==" —
    // count operators in the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
  }
}
