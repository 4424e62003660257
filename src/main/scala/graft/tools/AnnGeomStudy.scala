package graft.tools

import graft.operators.{Ann, Codebooks, Knn}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-geometry study for the ANN constructions (r6 verdict Next #6):
  * the shipped recall envelopes (SCALE.md) were measured on the driver's
  * near-isotropic embeddings — the HARDEST geometry for bucketed ANN
  * (true neighbors sit barely above the bulk, per-bit agreement ~0.61).
  * Real embedding corpora are clustered; this study re-measures the
  * whole family — trained IVF (fresh 16/64-list codebooks), the FROZEN
  * isotropic-trained codebooks applied cross-geometry, and multi-table
  * LSH — on a planted-cluster corpus at bench scale (sf0.1-sized:
  * 600 clusters × 100 points, dim 64), reporting recall@5 AND the
  * candidate scan fraction actually paid.
  *
  * Planting device: the q89/q50 idea applied to vectors — unit-norm
  * Gaussian cluster centers, members = center + σ·noise, re-normalized.
  * σ = 0.25 gives within-cluster cosine ≈ 0.9 (strong but not
  * degenerate structure). Deterministic seed → the numbers are
  * reproducible; AnnRecallSpec pins the small-scale shape of the same
  * fixture so a regression fails in CI, while this main produces the
  * bench-scale table recorded in SCALE.md.
  *
  * Run: sbt "runMain graft.tools.AnnGeomStudy [nClusters perCluster]"
  */
object AnnGeomStudy {

  def clusteredCorpus(
      spark: SparkSession, nClusters: Int, perCluster: Int,
      dim: Int, sigma: Double, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for (c <- 0 until nClusters; p <- 0 until perCluster) yield {
      val v = centers(c).map(x => (x + sigma * rnd.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (f"v$c%04d_$p%03d", v.map(_ / n))
    }
    // driver-side generation is STUDY-ONLY plumbing (the corpus is the
    // experiment's input, not data-path output); ~60k × 64 floats ≈ 15 MB
    rows.toDF("id", "embedding").repartition(32).cache()
  }

  /** Isotropic companion corpus — unit-norm Gaussians, NO cluster
    * structure. Used to TRAIN cross-geometry codebooks (the
    * "frozen-isotropic" arms): quantizers fit on this geometry and then
    * applied to the clustered corpus measure exactly the mismatch a
    * production system inherits when its codebooks are trained on one
    * distribution and served on another. */
  def isotropicCorpus(
      spark: SparkSession, n: Int, dim: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nr = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (f"i$i%06d", v.map(_ / nr))
    }
    rows.toDF("id", "embedding").repartition(32).cache()
  }

  def main(args: Array[String]): Unit = {
    val nClusters = args.lift(0).map(_.toInt).getOrElse(600)
    val perCluster = args.lift(1).map(_.toInt).getOrElse(100)
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = clusteredCorpus(spark, nClusters, perCluster, dim, 0.25, 42L)
    val n = docs.count()
    val queries = docs.filter(col("id").endsWith("_000"))
      .filter(hash(col("id")) % 6 === 0) // ~100 of the 600 cluster reps
      .select(col("id").as("qid"), col("embedding").as("qvec"))
      .cache()
    val nq = queries.count()
    println(s"[geom] corpus=$n clustered (k=$nClusters x $perCluster, dim=$dim), queries=$nq")

    def resultSet(df: DataFrame): Map[String, Set[String]] =
      df.collect().groupBy(_.getAs[String]("qid")).view
        .mapValues(_.map(_.getAs[String]("id")).toSet).toMap
    val truth = resultSet(Knn.topK(docs, queries, k = 5))
    def recall(approx: Map[String, Set[String]]): Double = {
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }

    // IVF scan fraction = Σq (occupancy of probed lists) / (nq · N)
    def ivfFraction(cents: Array[Array[Float]], nprobe: Int): Double = {
      val occ = docs.select(Ann.ivfBucketWith(col("embedding"), cents).as("b"))
        .groupBy("b").count()
      val probed = queries.select(col("qid"),
        explode(Ann.ivfProbeBucketsWith(col("qvec"), cents, nprobe)).as("b"))
      probed.join(occ, Seq("b"))
        .agg(sum("count")).as[Long].head().toDouble / (nq.toDouble * n)
    }

    def ivfLine(tag: String, cents: Array[Array[Float]], nprobe: Int): Unit = {
      val r = recall(resultSet(Ann.topKIvfWith(docs, queries, 5, cents, nprobe)))
      val f = ivfFraction(cents, nprobe)
      println(f"[geom] $tag nprobe=$nprobe recall@5=$r%.3f scanFrac=$f%.3f")
    }

    val fresh16 = Ann.trainedCentroids(docs, nCentroids = 16)
    val fresh64 = Ann.trainedCentroids(docs, nCentroids = 64)
    Seq(1, 2, 4).foreach(ivfLine("ivf16-fresh", fresh16, _))
    Seq(4, 8, 16).foreach(ivfLine("ivf64-fresh", fresh64, _))
    // cross-geometry: the frozen isotropic-trained codebooks on
    // clustered data — the mismatch cost the study exists to expose
    Seq(1, 2, 4).foreach(ivfLine("ivf16-frozen-isotropic", Codebooks.ivf16dim64, _))
    Seq(4, 8, 16).foreach(ivfLine("ivf64-frozen-isotropic", Codebooks.ivf64dim64, _))

    def lshLine(nPlanes: Int, nTables: Int): Unit = {
      val r = recall(resultSet(
        Ann.topKMultiTable(docs, queries, 5, dim, nPlanes, nTables)))
      val f = Ann.multiTableCandidates(docs, queries, dim, nPlanes, nTables)
        .count().toDouble / (nq.toDouble * n)
      println(f"[geom] lsh ${nPlanes}x$nTables recall@5=$r%.3f scanFrac=$f%.3f")
    }
    lshLine(4, 8)
    lshLine(8, 8)
    lshLine(8, 16)

    // PQ/ADC arm (r7 backlog): the MEMORY side on clustered geometry.
    // The rerank scans every code (scanFrac=1 by construction — PQ
    // bounds bytes, not candidates); the study metric is ADC *fidelity*:
    // does the true top-5 survive the shortlist cut? All arms spend the
    // SAME 32-bit/vector budget (8x4-bit vs 4x8-bit codes; the float
    // embedding is 2048 bits — 64x). The interesting axis (pinned small-
    // scale in AnnRecallSpec): k-means codebooks at 8x16 COLLAPSE
    // cluster members onto shared codes (MSE-optimal, rank-blind) while
    // 4x256 buys the resolution to order within clusters — bit
    // allocation matters more than codebook placement.
    import graft.operators.Pq
    def pqLine(tag: String, shortlist: Int,
        run: Int => DataFrame): Unit = {
      val r = recall(resultSet(run(shortlist)))
      println(f"[geom] $tag shortlist=$shortlist recall@5=$r%.3f bits/vec=32 (64x)")
    }
    val sls = Seq(50, 200)
    sls.foreach(sl => pqLine("pq8x16-det", sl,
      s => Pq.topKPqRerank(docs, queries, 5, dim, 8, 16, s)))
    val cbs8 = Pq.trainedCodebooks(docs, dim, nSub = 8, nCodes = 16)
    sls.foreach(sl => pqLine("pq8x16-trained", sl,
      s => Pq.topKPqRerankWith(docs, queries, 5, dim, cbs8, s)))
    val cbs4 = Pq.trainedCodebooks(docs, dim, nSub = 4, nCodes = 256)
    sls.foreach(sl => pqLine("pq4x256-trained", sl,
      s => Pq.topKPqRerankWith(docs, queries, 5, dim, cbs4, s)))

    // cross-geometry PQ (r7 verdict Missing #2): codebooks TRAINED on an
    // isotropic corpus, APPLIED to the clustered one — the PQ analogue
    // of the ivf*-frozen-isotropic lines. The IVF study showed
    // isotropic-trained coarse quantizers mislead on clustered data;
    // this measures whether the same codebook-placement mismatch costs
    // ADC rank fidelity, at the same 32-bit/vector budget.
    val iso = isotropicCorpus(spark, n.toInt, dim, 1234L)
    val isoCbs8 = Pq.trainedCodebooks(iso, dim, nSub = 8, nCodes = 16)
    sls.foreach(sl => pqLine("pq8x16-iso-xgeom", sl,
      s => Pq.topKPqRerankWith(docs, queries, 5, dim, isoCbs8, s)))
    val isoCbs4 = Pq.trainedCodebooks(iso, dim, nSub = 4, nCodes = 256)
    sls.foreach(sl => pqLine("pq4x256-iso-xgeom", sl,
      s => Pq.topKPqRerankWith(docs, queries, 5, dim, isoCbs4, s)))
    iso.unpersist()

    // random-rotation PQ (r8 forward list): the training-free OPQ
    // baseline — rotate docs AND queries with one frozen orthogonal R,
    // train codebooks on the ROTATED corpus, shortlist+rerank in
    // rotated space (exact scores are R-invariant, so recall is
    // measured against the same unrotated truth). Tests whether
    // spreading cluster energy across subspaces fixes the 8x16
    // collapse that clustered-trained codebooks exhibit.
    val rot = Pq.randomRotation(dim, 11L)
    val rotDocs = docs.select(col("id"),
      Pq.rotateVec(col("embedding"), rot).as("embedding")).cache()
    val rotQs = queries.select(col("qid"),
      Pq.rotateVec(col("qvec"), rot).as("qvec")).cache()
    val rrCbs8 = Pq.trainedCodebooks(rotDocs, dim, nSub = 8, nCodes = 16)
    sls.foreach(sl => pqLine("pq8x16-rr-trained", sl,
      s => Pq.topKPqRerankWith(rotDocs, rotQs, 5, dim, rrCbs8, s)))
    val rrCbs4 = Pq.trainedCodebooks(rotDocs, dim, nSub = 4, nCodes = 256)
    sls.foreach(sl => pqLine("pq4x256-rr-trained", sl,
      s => Pq.topKPqRerankWith(rotDocs, rotQs, 5, dim, rrCbs4, s)))
    rotDocs.unpersist(); rotQs.unpersist()

    // IVF-PQ composition on clustered geometry (the q56 envelope was
    // isotropic-only): fresh coarse quantizer + deterministic codes,
    // ADC shortlist inside the probed lists, exact rescoring on top.
    def ivfPqLine(nprobe: Int, shortlist: Int): Unit = {
      val r = recall(resultSet(Pq.topKIvfPq(
        docs, queries, 5, dim, nCentroids = 16, nprobe = nprobe,
        nSub = 8, nCodes = 16, shortlist = shortlist)))
      println(f"[geom] ivfpq16 det8x16 nprobe=$nprobe shortlist=$shortlist recall@5=$r%.3f")
    }
    ivfPqLine(1, 50)
    ivfPqLine(2, 50)
    ivfPqLine(2, 200)
    spark.stop()
  }
}
