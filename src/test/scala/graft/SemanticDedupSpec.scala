package graft

import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.DataFrame

/** SemDeDup contract tests ([[Dedup.semanticDedup]]): drop-if-similar-
  * to-earlier within an IVF cluster. Fixture vectors ARE the
  * deterministic centroids (a vector equal to centroid j argmaxes to
  * cluster j+1 — its self-dot is 1.0, every other centroid dot is
  * strictly below on unit vectors), so cluster membership is controlled
  * exactly. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val nCent = 4
  private def cent(j: Int): Seq[Float] = Ann.centroidVector(j, dim).toSeq

  private def run(df: DataFrame, threshold: Double = 0.9): DataFrame =
    Dedup.semanticDedup(df, "id", "v", dim, nCent, threshold)

  test("identical twin in the same cluster drops; first occurrence and singletons keep") {
    val df = Seq(
      (1L, cent(0)), // first occupant of cluster 1 → keep
      (2L, cent(0)), // identical to id 1, same cluster → drop at 1.0
      (3L, cent(1))  // alone in cluster 2 → keep, max_sim_prev = -1.0
    ).toDF("id", "v")
    val res = run(df).orderBy("id").collect()
    assert(res.map(_.getAs[Boolean]("keep")).toSeq == Seq(true, false, true))
    assert(res(1).getAs[Double]("max_sim_prev") == 1.0)
    assert(res(2).getAs[Double]("max_sim_prev") == -1.0)
    // twins share a cluster by construction (same vector, same argmax)
    assert(res(0).getAs[Long]("cluster") == res(1).getAs[Long]("cluster"))
  }

  test("sub-threshold neighbors both keep; the reported max is their cosine") {
    // two DIFFERENT centroids can land in one cluster only if equal —
    // instead plant two orthogonal-ish vectors forced into one cluster
    // by mixing: v2 = normalize(0.5*c0 + sqrt(3)/2*c2-orthogonal part)
    // is overkill; simpler: same centroid with a sign-flipped tail
    // component stays in the cluster but at cosine < 1.
    val c0 = cent(0).toArray
    val bent = c0.clone(); bent(dim - 1) = -bent(dim - 1)
    val df = Seq((1L, c0.toSeq), (2L, bent.toSeq)).toDF("id", "v")
    val res = run(df, threshold = 0.999).orderBy("id").collect()
    if (res(0).getAs[Long]("cluster") == res(1).getAs[Long]("cluster")) {
      val ms = res(1).getAs[Double]("max_sim_prev")
      assert(ms < 0.999 && ms > -1.0)
      assert(res(1).getAs[Boolean]("keep"))
    }
    assert(res(0).getAs[Boolean]("keep"))
  }

  test("idempotence: re-running on the kept set keeps everything") {
    val df = Seq(
      (1L, cent(0)), (2L, cent(0)), (3L, cent(0)),
      (4L, cent(2)), (5L, cent(2))
    ).toDF("id", "v")
    val first = run(df)
    val kept = df.as("d").join(
      first.filter($"keep").select("id"), Seq("id"), "left_semi")
    val second = run(kept).collect()
    assert(second.forall(_.getAs[Boolean]("keep")))
    assert(second.length == 2) // one survivor per planted group
  }
}
