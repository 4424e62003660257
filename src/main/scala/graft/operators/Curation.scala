package graft.operators

import graft.functions.HashFunctions.hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation primitives for training-data pipelines: reproducible
  * sampling and per-group quotas.
  *
  * Both are HASH-based, not RNG-based, on purpose: `df.sample()` (and
  * `sampleBy`) draw from per-partition RNG streams, so the selected set
  * changes with partitioning, retries, and engine — unacceptable for a
  * dataset that must be reproducible and auditable. Hashing the row's
  * identity gives the same sample on any engine (exactly mirrorable in
  * the oracle), stable under repartition, and trivially invertible for
  * holdout splits (the complement predicate).
  */
object Curation {

  /** Deterministic membership score in [0, 1000): uniform md5-derived
    * per-id value — the basis for rate and split predicates. */
  def hashScore(id: Column): Column = hash60(id.cast("string")) % 1000L

  /** Keep ~`permille`/1000 of rows, selected by id hash. */
  def sampleByHash(docs: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    docs.filter(hashScore(col(idCol)) < permille)
  }

  /** Stratified deterministic sampling: per-stratum keep rates
    * (permille), unlisted strata dropped. Rates ride a CASE expression —
    * no join, no shuffle, pure map stage. */
  def sampleStratified(
      docs: DataFrame, idCol: String, stratumCol: String,
      permilleByStratum: Map[String, Int]): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(hashScore(col(idCol)) < rate)
  }

  /** Weighted systematic sampling: deterministic, selection probability
    * proportional to an integer weight (chars, tokens, quality bucket),
    * ~`k` rows out. The classic PPS design: lay rows on a line in key
    * order, each covering its weight; a row is selected iff its interval
    * (cum - w, cum] contains a multiple of step = total_weight div k.
    *
    * Scale shape: the cumulative weight comes from the q08 construction —
    * range-repartition by key, per-partition window cumsum, triangular
    * prefix-sum of per-partition totals (metadata-sized broadcasts) —
    * never a global single-partition window. Exactly mirrorable: all
    * arithmetic is integer except floor(a/b) on doubles, whose quotients
    * sit far from integer boundaries (min distance 1/b >> the ~1e-16
    * relative rounding), so Spark and the oracle agree bit-for-bit.
    *
    * @return (key, weight, cum_weight, tile) for selected rows only */
  def weightedSystematicSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val sortKeys = Seq(col(keyCol).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(sortKeys: _*)
    // pinned: ranked rows, per-partition totals, and the grand total all
    // read it — without the barrier the range shuffle runs three times
    val parts = df.select(col(keyCol), col(weightCol).cast("long").as("_w"))
      .repartitionByRange(32, sortKeys: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(graft.CacheScope.pin)
    val ranked = parts.withColumn("_pcum", sum(col("_w")).over(w))
    val pw = parts.groupBy("_pid").agg(sum(col("_w")).as("_pw"))
    val offsets = pw.as("ca")
      .join(pw.as("cb"), col("cb._pid") < col("ca._pid"), "left")
      .groupBy(col("ca._pid").as("_pid"))
      .agg(coalesce(sum(col("cb._pw")), lit(0L)).as("_off"))
    val total = parts.agg(sum(col("_w")).as("_tw"))
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val cum = col("_pcum") + col("_off")
    val step = idiv(col("_tw"), lit(k.toLong))
    ranked.join(broadcast(offsets), Seq("_pid"))
      .crossJoin(broadcast(total))
      .withColumn("cum_weight", cum)
      .withColumn("tile", idiv(col("cum_weight"), step))
      .filter(col("tile") > idiv(col("cum_weight") - col("_w"), step))
      .select(col(keyCol), col("_w").as("weight"),
        col("cum_weight"), col("tile"))
  }

  /** Per-group quota: keep at most `quota` rows per group, chosen in
    * hash order (deterministic, unbiased by any payload column) with the
    * id as tiebreak. One shuffle on the group key; Spark plans the
    * row_number filter as WindowGroupLimit, pruning to `quota` rows per
    * group MAP-SIDE before the exchange. */
  def capPerGroup(
      docs: DataFrame, idCol: String, groupCol: String, quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(hashScore(col(idCol)), col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }

  /** Data-mixture sampling under per-source TOKEN budgets — the "mixing
    * weights" step of a pre-training pipeline: each source contributes
    * documents, in deterministic hash order, until its token budget is
    * exhausted (take-while cumulative-tokens ≤ budget; the first
    * over-budget doc and everything after it are dropped). Hash order —
    * not id order — so the kept prefix is an unbiased sample of the
    * source, and identical under any partitioning.
    *
    * Scale shape: one shuffle on the source key + a per-source window
    * cumsum. Per-source sequential prefix sums are inherent to budget
    * semantics; parallelism comes from the source COUNT (real mixtures
    * have thousands of domains). A single pathologically-huge source
    * generalizes via the [[Packing.packManifest]] distributed
    * prefix-sum construction, same as [[weightedSystematicSample]].
    *
    * @param budgets token budget per source value; unlisted sources
    *                contribute nothing
    * @return (source, id, n_tokens, cum_tokens) for kept rows */
  def budgetedMixture(
      docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("source") === k, lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(hashScore(col("id")), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .select(col(sourceCol).as("source"), col(idCol).as("id"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("source", "id", "n_tokens", "cum_tokens")
  }

  // ---- deterministic dataset splits --------------------------------------

  /** Split bucket in [0, 100): salted portable hash of the split KEY.
    * The key choice is the leakage policy — key on the doc id for a
    * plain split, on the CONTENT hash so byte-identical dups co-locate
    * ([[hashSplit]]), or on a dedup-cluster keeper so near-dups
    * co-locate ([[leakFreeSplit]]). */
  def splitBucket(key: Column, salt: String): Column =
    hash60(concat(lit(salt), lit(":"), key.cast("string"))) % 100L

  /** Bucket → split name by cumulative percent thresholds. */
  def splitName(bucket: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic train/val/test split keyed on the CONTENT hash —
    * the reproducible-split primitive every training pipeline needs:
    * stable across runs, partitioning, and engines (the md5 device,
    * exactly mirrorable); keyed on sha256(content) rather than the id
    * so byte-identical duplicates always land in the SAME split (the
    * cheapest form of leakage control — an id-keyed split sends two
    * copies of one document to train and test). Pure map stage: no
    * shuffle, no RNG, no driver state.
    *
    * @return (id, bucket, split) */
  def hashSplit(
      docs: DataFrame, idCol: String, textCol: String,
      salt: String = "graft", trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = splitBucket(sha2(col(textCol), 256), salt)
    Par.ensureMapParallelism(docs).select(
      col(idCol).as("id"),
      bucket.as("bucket"),
      splitName(bucket, trainPct, valPct).as("split"))
  }

  /** Near-dup-leakage-free split: every member of a dedup cluster
    * inherits its KEEPER's bucket, so no near-duplicate pair ever
    * straddles a split boundary (the contamination mode a content-hash
    * split cannot catch: lightly-edited copies hash apart but leak
    * train→test all the same). Input is [[GraphAlgos.dedupClusters]]
    * output — the composition is split-by-connected-component, the
    * standard eval-hygiene construction. One map stage over the
    * cluster assignment; the expensive part (LSH + components) is the
    * dedup pass the pipeline already ran.
    *
    * @param clusters (id, keeper) — every doc with its cluster keeper
    * @return (id, keeper, bucket, split) */
  def leakFreeSplit(
      clusters: DataFrame,
      salt: String = "graft", trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = splitBucket(col("keeper"), salt)
    Par.ensureMapParallelism(clusters).select(
      col("id"), col("keeper"),
      bucket.as("bucket"),
      splitName(bucket, trainPct, valPct).as("split"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    * score every document by how much more likely its tokens are under
    * the TARGET domain's unigram LM than under the full-corpus
    * background LM — `log_weight = Σ_tok [ln p_t(w) − ln p_bg(w)]` with
    * add-one smoothing over the shared vocabulary. Positive weight =
    * "looks like the target domain"; data selection keeps the top slice
    * (here surfaced as `selected = log_weight > 0`). This is the
    * cheap-proxy domain filter that runs where a model-based classifier
    * is too expensive — exactly the DSIR pitch.
    *
    * Exactness: each probability is one IEEE division on integer counts
    * (bit-identical operands in the mirror), ln within 1 ulp, the sum
    * portable-rounded (the q71/BM25 device: summing ~300 one-ulp terms
    * leaves ~1e-13 absolute wobble, absorbed by the 1e-6 rounding grid).
    *
    * Scale shape: count tables are term-keyed and map-side combined;
    * the scorer is two term-keyed joins plus ONE 1-row broadcast of the
    * corpus constants (the allowed BNLJ); per-doc rollup shuffles one
    * double per token.
    *
    * @param isTarget row predicate marking the target-domain documents
    * @return (id, is_target, n_tokens, log_weight, selected) */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val tok = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), isTarget.as("is_t"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .transform(graft.CacheScope.pin) // tf tables, constants, scorer all read it
    val tfT = tok.filter(col("is_t")).groupBy("term")
      .agg(count(lit(1)).as("ct_t"))
    val tfAll = tok.groupBy("term").agg(count(lit(1)).as("ct_r"))
    val consts = tok.agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
      count(lit(1)).as("n_r"),
      countDistinct(col("term")).as("v"))
    val scored = tok
      .join(tfAll, Seq("term"))
      .join(tfT, Seq("term"), "left")
      .crossJoin(broadcast(consts)) // 1-row corpus constants
      .withColumn("lp",
        log((coalesce(col("ct_t"), lit(0L)) + 1).cast("double") /
            (col("n_t") + col("v")).cast("double")) -
        log((col("ct_r") + 1).cast("double") /
            (col("n_r") + col("v")).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), rnd6(sum(col("lp"))).as("log_weight"))
    docs.select(col(idCol).as("id"), isTarget.as("is_target"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"),
        (coalesce(col("log_weight"), lit(0.0)) > 0.0).as("selected"))
  }

  /** Temperature-scaled mixture allocation (the multilingual/multi-source
    * sampling rule of mT5/XLM-R, α = 0.5): each source's share of the
    * token budget is proportional to `count^α` — big sources are
    * DOWN-weighted relative to proportional sampling, small sources
    * up-weighted, without the truncation cliff of a hard cap. The
    * integer largest-remainder method distributes the budget exactly
    * (allocations sum to `budget` whenever Σweight > 0).
    *
    * Exactness: the only float op is `sqrt` (IEEE correctly-rounded,
    * bit-identical cross-engine); weights are floor-scaled to integer
    * micro-units and everything after is 64-bit integer arithmetic —
    * `budget × weight` stays far under Long range for any real corpus
    * (weights ≈ 1e6·√tokens; re-scale the unit for >1e7-token budgets).
    *
    * Scale shape: one token-count aggregation over the corpus (map-side
    * combined), then all allocation logic runs on the SOURCE-grain frame
    * — bounded rows, so the unpartitioned remainder window is a
    * dimension-table sort, not a data-scale one.
    *
    * @return (source, n_tokens, weight, alloc_tokens, share) */
  def temperatureMixture(
      docs: DataFrame, srcCol: String, textCol: String,
      budget: Long): DataFrame = {
    val perSrc = Par.ensureMapParallelism(docs)
      .groupBy(col(srcCol).as("source"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long")).as("n_tokens"))
      .withColumn("weight",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      .transform(graft.CacheScope.pin) // total + base + remainder read it
    val tot = perSrc.agg(sum(col("weight")).as("tot"))
    val based = perSrc.crossJoin(broadcast(tot)) // 1-row total
      .withColumn("base", expr(s"(${budget}L * weight) div tot"))
      .withColumn("rem", (lit(budget) * col("weight")) % col("tot"))
      .transform(graft.CacheScope.pin) // extra-count + window read it
    val extra = based.agg((lit(budget) - sum(col("base"))).as("extra"))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source")) // source-grain: bounded rows
    based.crossJoin(broadcast(extra)) // 1-row remainder count
      .withColumn("rn", row_number().over(wRem))
      .withColumn("alloc_tokens",
        col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("weight"), col("alloc_tokens"),
        rnd6(col("alloc_tokens").cast("double") / lit(budget.toDouble))
          .as("share"))
  }

  /** Deterministic seeded global shuffle + shard assignment — the
    * training-data EMISSION ordering step. Model training wants the
    * corpus in a reproducible pseudo-random order, split into shards a
    * loader can stream round-robin; `df.orderBy(rand(seed))` is neither
    * reproducible across engines nor stable under partitioning, so the
    * order key is the portable id hash instead (the same
    * hashing-not-RNG argument as [[sampleByHash]]).
    *
    * Produces, per row: `shard` = key mod nShards, `pos` = the row's
    * 1-based rank within its shard (by key, id-tiebroken), and
    * `global_pos` = (pos−1)·nShards + shard — the round-robin
    * interleaved curriculum position a multi-shard loader reading one
    * row per shard per step would see.
    *
    * Scale shape: ONE shuffle on the shard key, then a per-shard window
    * rank; at 100 TB pick nShards ≥ cluster parallelism (shards are the
    * emission unit AND the parallelism unit — each window partition is
    * one shard). No global sort is ever materialized: the global order
    * is a FORMULA over (shard, pos), not an orderBy.
    *
    * @return (id, key, shard, pos, global_pos) */
  def seededShuffle(
      docs: DataFrame, idCol: String, seed: String, nShards: Int): DataFrame = {
    require(nShards >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("key"), col("id"))
    Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"),
        hash60(concat(lit(seed), lit(":"), col(idCol).cast("string")))
          .as("key"))
      .withColumn("shard", col("key") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("global_pos",
        (col("pos") - 1L) * nShards + col("shard"))
  }

  /** Embedding-space outlier report — the encoder-failure / noise
    * detector a pipeline runs over a fresh embedding batch: a vector
    * whose cosine to its own (nearest) coarse centroid sits far below
    * the corpus norm is a mis-encoded, corrupted, or out-of-
    * distribution item. Score = cos(v, assigned centroid); z-scored
    * against the corpus; flagged at z ≤ `zFlag`.
    *
    * Determinism: the per-row score is rounded to the 1e-6 grid, then
    * corpus mean/variance accumulate over the INTEGER micro-unit scores
    * (the perplexityGate device — Int64 sums are association-free
    * where a double sum's last bits depend on partition order); the
    * division/sqrt tail runs an identical operation sequence in both
    * engines on identical inputs, so z is bit-deterministic. Degenerate
    * corpora (zero variance) report z = 0.
    *
    * Scale shape: one map projection (16 centroid dots per row against
    * plan literals), one 3-long aggregate, one 1-row broadcast back —
    * no keyed shuffle at all. Int64 micro-sums hold to ~10¹² rows;
    * beyond that widen to decimal.
    *
    * @return (id, cluster, score, z, outlier) — every input row */
  def embeddingOutliers(
      embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCentroids: Int, zFlag: Double = -2.0): DataFrame = {
    val dots = array((0 until nCentroids).map(j =>
      graft.functions.VectorFunctions.dotProduct(
        col("v"), typedLit(graft.operators.Ann.centroidVector(j, dim)))): _*)
    val scored = Par.ensureMapParallelism(embs)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), dots.as("_dots"),
        graft.functions.VectorFunctions.sumSquares(col("v")).as("_ss"))
      .select(col("id"),
        array_position(col("_dots"), array_max(col("_dots")))
          .cast("long").as("cluster"),
        rnd6(array_max(col("_dots")) / sqrt(col("_ss"))).as("score"))
      .withColumn("su", floor(col("score") * lit(1e6) + lit(0.5)).cast("long"))
      .transform(graft.CacheScope.pin) // stats + the z projection read it
    val st = scored.agg(count(lit(1)).as("n"),
      sum(col("su")).as("s1"), sum(col("su") * col("su")).as("s2"))
    scored.crossJoin(broadcast(st)) // 1-row corpus stats
      .withColumn("_mean", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("_std", sqrt(greatest(
        col("s2").cast("double") / col("n").cast("double")
          - col("_mean") * col("_mean"), lit(0.0))))
      .withColumn("z", when(col("_std") > 0.0,
          rnd6((col("su").cast("double") - col("_mean")) / col("_std")))
        .otherwise(lit(0.0)))
      .select(col("id"), col("cluster"), col("score"), col("z"),
        (col("z") <= zFlag).as("outlier"))
  }

  /** Cluster-balanced (diversity-preserving) sampling over an embedding
    * column: cap every IVF coarse cluster at `perCluster` deterministic
    * picks. Metadata-stratified sampling ([[sampleStratified]]) balances
    * what the data SAYS it is; this balances what the data IS in
    * embedding space — the de-biasing step for fine-tuning/eval sets
    * where a dominant semantic mode (boilerplate, one topic) would
    * otherwise swamp the sample. Within a cluster the picks are the
    * lowest salted-hash ranks (id-tiebroken): reproducible, engine-
    * independent, stable under repartition — the [[sampleByHash]]
    * argument. Clusters smaller than the cap keep everything.
    *
    * Scale shape: one map projection (centroid dots against plan
    * literals), ONE cluster-keyed shuffle for the rank window;
    * nCentroids ≈ √N keeps window partitions flat.
    *
    * @return (id, cluster, rk) for selected rows, rk = 1..perCluster */
  def clusterBalancedSample(
      embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCentroids: Int, perCluster: Int): DataFrame = {
    require(perCluster >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy(col("key"), col("id"))
    Par.ensureMapParallelism(embs)
      .select(col(idCol).as("id"),
        graft.operators.Ann.ivfBucket(col(vecCol), dim, nCentroids)
          .cast("long").as("cluster"))
      .withColumn("key",
        hash60(concat(lit("cbs:"), col("id").cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perCluster)
      .select("id", "cluster", "rk")
  }

  private def rnd6(c: Column): Column = graft.functions.PortableMath.rnd(c, 6)
}
