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

  test("planted mega-cluster: candidates stay bounded, exact twins still drop") {
    // degenerate corpus (VERDICT r7 Next #4): every vector argmaxes to
    // the SAME IVF cluster (nCentroids=1), so the uncapped generator
    // would produce n(n-1)/2 pairs. With maxCluster well below n, the
    // LSH sub-block reroute must carve the cluster into signature cells.
    val n = 400
    val rng = new scala.util.Random(7)
    def unit(): Seq[Float] = {
      val raw = Array.fill(dim)(rng.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / nrm).toFloat).toSeq
    }
    val base = Seq.tabulate(n)(i => (i.toLong, unit()))
    // five exact-twin pairs: ids (1000+i, copy of vector i) — identical
    // vectors agree on every hyperplane in every table, so they are
    // ALWAYS co-blocked; the capped route must still drop the later id
    val twins = (0 until 5).map(i => (1000L + i, base(i)._2))
    val df = (base ++ twins).toDF("id", "v")

    val maxCluster = 64
    val subPlanes = 4
    val subTables = 3
    val assigned = graft.operators.Par.ensureMapParallelism(df)
      .select($"id", $"v",
        Ann.ivfBucket($"v", dim, 1).cast("long").as("cluster"))
    val nPairs = Dedup.semanticScoredPairs(
      assigned, dim, maxCluster, subPlanes, subTables).count()
    val allPairs = (n + 5).toLong * (n + 4) / 2
    info(s"scored candidate rows: $nPairs vs all-pairs $allPairs")
    // 3 tables × 16 cells: expected ~3·Σ cell² ≈ all-pairs·3/16 for even
    // spread; assert the order-of-magnitude guarantee, not the constant
    assert(nPairs < allPairs / 2,
      s"sub-blocking must beat all-pairs: $nPairs vs $allPairs")

    val res = Dedup.semanticDedup(df, "id", "v", dim, 1, 0.999,
      maxCluster, subPlanes, subTables)
      .filter($"id" >= 1000L).orderBy("id").collect()
    assert(res.length == 5)
    assert(res.forall(!_.getAs[Boolean]("keep")),
      "exact twins are co-blocked in every table and must drop")
    assert(res.forall(_.getAs[Double]("max_sim_prev") >= 0.999999))
  }

  test("capped and uncapped routes agree when no cluster exceeds the cap") {
    val df = Seq(
      (1L, cent(0)), (2L, cent(0)), (3L, cent(1)), (4L, cent(2)), (5L, cent(2))
    ).toDF("id", "v")
    val uncapped = run(df).orderBy("id").collect().toSeq.map(_.toString)
    val capped = Dedup.semanticDedup(df, "id", "v", dim, nCent, 0.9,
      maxCluster = 1, subPlanes = 4, subTables = 3) // cap FORCES the reroute
      .orderBy("id").collect().toSeq.map(_.toString)
    // identical twins survive any sub-blocking (same signature cells);
    // singletons have no peer either way — on this fixture the two
    // routes are exactly equal even though the plans differ
    assert(capped == uncapped)
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
