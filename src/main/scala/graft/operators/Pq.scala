package graft.operators

import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance scoring — the
  * MEMORY side of the 100 TB ANN story. LSH/IVF bound how many vectors a
  * query scores; PQ bounds how many bytes each vector costs: the dim-64
  * float embedding (256 B) compresses to one byte per subspace (8 B
  * here), and queries score candidates from the codebook WITHOUT
  * decompressing (ADC: the query keeps full precision, the doc side is
  * its code word — the standard IVF-PQ pairing).
  *
  * Codebooks are DETERMINISTIC stand-ins (md5-derived vectors scaled to
  * the expected subvector shell, ||x_s|| ≈ 1/√nSub for unit embeddings)
  * exactly like the LSH planes / IVF centroids: a real deployment swaps
  * in k-means codebooks, changing only these literals; assignment,
  * storage, and ADC scoring — what Spark executes — are identical.
  * Random codebooks quantize coarsely, so ADC here is a candidate
  * RANKER to be followed by exact re-scoring of a shortlist (the
  * standard two-stage retrieval; see [[topKPqRerank]]), not a drop-in
  * similarity.
  */
object Pq {

  /** Codebook centroid: subspace `s`, code `j`, of `subDim` floats, on
    * the shell where unit-vector subvectors live. */
  def centroid(s: Int, j: Int, subDim: Int, nSub: Int): Array[Float] = {
    val raw = Array.tabulate(subDim)(i => Ann.planeComponentT(9000 + s, j, i))
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    val scale = 1.0 / math.sqrt(nSub.toDouble)
    raw.map(x => (x / nrm * scale).toFloat)
  }

  private def codebook(s: Int, subDim: Int, nSub: Int, nCodes: Int): Array[Array[Float]] =
    Array.tabulate(nCodes)(j => centroid(s, j, subDim, nSub))

  /** Code for subspace `s`: 1-based index of the nearest centroid by
    * squared distance, computed as argmax(2·<x_s,c> − ||c||²) — one dot
    * per code over the MATERIALIZED subvector, first-max tie-break. */
  def subCode(vec: Column, s: Int, subDim: Int, nSub: Int, nCodes: Int): Column = {
    val sub = slice(vec, s * subDim + 1, subDim)
    val scores = array((0 until nCodes).map { j =>
      val c = centroid(s, j, subDim, nSub)
      val c2 = c.map(x => x.toDouble * x.toDouble).sum
      dotProduct(sub, typedLit(c)) * 2.0 - lit(c2)
    }: _*)
    array_position(scores, array_max(scores)).cast("int")
  }

  /** Full PQ code as an array of `nSub` small ints — the 8-byte row the
    * store keeps instead of the 256-byte embedding. */
  def encode(vec: Column, dim: Int, nSub: Int, nCodes: Int): Column = {
    require(dim % nSub == 0)
    val subDim = dim / nSub
    array((0 until nSub).map(s => subCode(vec, s, subDim, nSub, nCodes)): _*)
  }

  /** ADC score of a full-precision query against a code column:
    * Σ_s <q_s, centroid(s, code_s)> — codebook lookups against plan
    * literals, no decompression of the doc side. */
  def adcScore(qvec: Column, code: Column, dim: Int, nSub: Int, nCodes: Int): Column = {
    val subDim = dim / nSub
    (0 until nSub).map { s =>
      val cb = typedLit(codebook(s, subDim, nSub, nCodes))
      dotProduct(slice(qvec, s * subDim + 1, subDim),
        element_at(cb, element_at(code, s + 1)))
    }.reduce(_ + _)
  }

  /** Two-stage retrieval: ADC over the CODES picks a `shortlist`, exact
    * dot products re-score only those — the full-precision side touches
    * `shortlist` vectors per query instead of the whole corpus.
    * @return (qid, id, sim, rank) — sim is the EXACT score. */
  def topKPqRerank(
      docs: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      dim: Int,
      nSub: Int = 8,
      nCodes: Int = 16,
      shortlist: Int = 50,
      conf: graft.GraftConf = graft.GraftConf.default): DataFrame = {
    require(shortlist >= k)
    // the code column is what a 100 TB store would have materialized;
    // keeping the embedding alongside stands in for the exact-rescore
    // fetch (in production: a second narrow store keyed by id)
    // spread before encode: the per-row PQ encoding and the ADC scoring
    // stage both inherit the corpus side's split count (Knn scaladoc)
    val coded = Knn.spreadForScoring(docs, conf)
      .withColumn("code", encode(col("embedding"), dim, nSub, nCodes))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("id"))
    val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    coded.crossJoin(Knn.maybeBroadcast(queries, conf))
      .withColumn("adc", adcScore(col("qvec"), col("code"), dim, nSub, nCodes))
      .withColumn("_ar", row_number().over(wAdc))
      .filter(col("_ar") <= shortlist)
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("qid", "id", "sim", "rank")
  }

  /** IVF-PQ: the production composition — the inverted-list probe
    * bounds HOW MANY vectors a query touches (q47's construction), the
    * PQ codes bound WHAT EACH COSTS (this file's), and exact re-scoring
    * of the shortlist restores precision. At 100 TB: the store holds
    * (id, bucket, code) = ~16 B/vector partitioned by bucket; full
    * embeddings live in a second narrow table fetched only for the
    * shortlist.
    * @return (qid, id, sim, rank) — sim is the EXACT score. */
  def topKIvfPq(
      docs: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      dim: Int,
      nCentroids: Int = 16,
      nprobe: Int = 2,
      nSub: Int = 8,
      nCodes: Int = 16,
      shortlist: Int = 30,
      conf: graft.GraftConf = graft.GraftConf.default): DataFrame = {
    require(shortlist >= k)
    val d = docs
      .withColumn("bucket", Ann.ivfBucket(col("embedding"), dim, nCentroids))
      .withColumn("code", encode(col("embedding"), dim, nSub, nCodes))
    val q = queries.withColumn("bucket",
      explode(Ann.ivfProbeBuckets(col("qvec"), dim, nCentroids, nprobe)))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("id"))
    val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    d.join(Knn.maybeBroadcast(q, conf), Seq("bucket"))
      .withColumn("adc", adcScore(col("qvec"), col("code"), dim, nSub, nCodes))
      .withColumn("_ar", row_number().over(wAdc))
      .filter(col("_ar") <= shortlist)
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("qid", "id", "sim", "rank")
  }

  // ---- explicit-codebook (trained) variants ------------------------------
  // Same assignment/storage/ADC plumbing as the deterministic family;
  // only the plan literals change. Training is per-subspace k-means —
  // the real PQ training step (Jégou et al., TPAMI'11): each subspace
  // gets its own nCodes-word codebook fit on the corpus's OWN subvector
  // distribution, which is what closes the quantization-error gap the
  // md5 stand-ins deliberately leave open.

  /** Per-subspace k-means codebooks. One fit per subspace over the
    * sliced corpus (training is a run-once step; the result is a
    * driver-held literal exactly like [[Ann.trainedCentroids]]).
    * @return cbs(s)(j) = centroid j of subspace s */
  def trainedCodebooks(
      docs: DataFrame, // (id, embedding)
      dim: Int,
      nSub: Int = 8,
      nCodes: Int = 16,
      seed: Long = 7L,
      maxIter: Int = 10): Array[Array[Array[Float]]] = {
    require(dim % nSub == 0)
    val subDim = dim / nSub
    val cached = docs.select(col("embedding")).cache()
    try {
      (0 until nSub).map { s =>
        val sub = cached.select(
          org.apache.spark.ml.functions.array_to_vector(
            slice(col("embedding"), s * subDim + 1, subDim)).as("features"))
        new org.apache.spark.ml.clustering.KMeans()
          .setK(nCodes).setSeed(seed + s).setMaxIter(maxIter)
          .fit(sub).clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
    } finally cached.unpersist()
  }

  /** [[subCode]] against an explicit codebook. */
  def subCodeWith(vec: Column, s: Int, subDim: Int, cb: Array[Array[Float]]): Column = {
    val sub = slice(vec, s * subDim + 1, subDim)
    val scores = array(cb.map { c =>
      val c2 = c.map(x => x.toDouble * x.toDouble).sum
      dotProduct(sub, typedLit(c)) * 2.0 - lit(c2)
    }: _*)
    array_position(scores, array_max(scores)).cast("int")
  }

  /** [[encode]] against explicit codebooks. */
  def encodeWith(vec: Column, dim: Int, cbs: Array[Array[Array[Float]]]): Column = {
    require(dim % cbs.length == 0)
    val subDim = dim / cbs.length
    array(cbs.indices.map(s => subCodeWith(vec, s, subDim, cbs(s))): _*)
  }

  /** [[adcScore]] against explicit codebooks. */
  def adcScoreWith(
      qvec: Column, code: Column, dim: Int,
      cbs: Array[Array[Array[Float]]]): Column = {
    val subDim = dim / cbs.length
    cbs.indices.map { s =>
      val cb = typedLit(cbs(s))
      dotProduct(slice(qvec, s * subDim + 1, subDim),
        element_at(cb, element_at(code, s + 1)))
    }.reduce(_ + _)
  }

  /** [[topKPqRerank]] against explicit (e.g. trained) codebooks. */
  def topKPqRerankWith(
      docs: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      dim: Int,
      cbs: Array[Array[Array[Float]]],
      shortlist: Int = 50,
      conf: graft.GraftConf = graft.GraftConf.default): DataFrame = {
    require(shortlist >= k)
    val coded = Knn.spreadForScoring(docs, conf)
      .withColumn("code", encodeWith(col("embedding"), dim, cbs))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("id"))
    val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))
    coded.crossJoin(Knn.maybeBroadcast(queries, conf))
      .withColumn("adc", adcScoreWith(col("qvec"), col("code"), dim, cbs))
      .withColumn("_ar", row_number().over(wAdc))
      .filter(col("_ar") <= shortlist)
      .withColumn("sim", dotProduct(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("qid", "id", "sim", "rank")
  }

  /** Frozen random rotation — the training-free OPQ baseline (Ge et
    * al., "Optimized Product Quantization", CVPR 2013: the R in
    * min‖x − R⁻¹·q(Rx)‖; random orthogonal R is the standard no-train
    * instance). PQ's loss concentrates when a few subspaces carry most
    * of the variance — exactly what clustered corpora do — and an
    * orthogonal rotation spreads that energy across subquantizers
    * while preserving every dot product and norm, so the exact rerank
    * stage is rotation-invariant and only the CODES see the rotated
    * geometry. Built by modified Gram-Schmidt (double precision) on a
    * seeded Gaussian matrix: full rank with probability 1,
    * deterministic seed → a plan literal, no broadcast, no training
    * job — the same deployment story as the md5 plane family. */
  def randomRotation(dim: Int, seed: Long = 11L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        var d = 0.0
        var k = 0
        while (k < dim) { d += m(i)(k) * m(j)(k); k += 1 }
        k = 0
        while (k < dim) { m(i)(k) -= d * m(j)(k); k += 1 }
      }
      val n = math.sqrt(m(i).map(x => x * x).sum)
      require(n > 1e-9, s"degenerate Gram-Schmidt at row $i (seed $seed)")
      for (k <- 0 until dim) m(i)(k) /= n
    }
    m.map(_.map(_.toFloat))
  }

  /** R·v as a column: element i = ⟨R_i, v⟩ — dim codegen'd dot
    * products against row literals (the [[Ann]] plane device), no UDF,
    * no shuffle. Apply to BOTH sides before coding; downstream exact
    * rescoring is unchanged by orthogonality. */
  def rotateVec(vec: Column, r: Array[Array[Float]]): Column =
    array(r.map(row => dotProduct(vec, typedLit(row)).cast("float")): _*)

  /** SQL mirror fragments. */
  def sqlCentroidLits(s: Int, subDim: Int, nSub: Int, nCodes: Int): String =
    codebook(s, subDim, nSub, nCodes)
      .map(_.map(_.toString).mkString("[", ", ", "]"))
      .mkString("[", ",\n       ", "]")
}
