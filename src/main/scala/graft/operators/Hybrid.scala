package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval — the fusion pattern the
  * reference's domain (semantic search) implies beyond what it ships:
  * a term-match branch catches exact vocabulary the embedding smooths
  * over, the vector branch catches paraphrase the lexicon misses, and
  * reciprocal-rank fusion (RRF) merges them WITHOUT score calibration —
  * only ranks enter the formula, so a cosine in [-1,1] and an unbounded
  * term-hit count need no common scale.
  *
  * Everything here is deterministic and engine-portable: branch ranks
  * are integers with total tie-breaks, and the RRF weight 1/(k0+rank)
  * is one correctly-rounded IEEE division per branch — the oracle
  * mirrors it bit-exactly (no floats would survive the hash gate
  * otherwise).
  *
  * Scale shape: the lexical branch is an inverted-index equi-join on
  * term (shuffle bounded by posting-list volume, never all pairs); the
  * vector branch is whatever [[Retrieval]] strategy the caller picks
  * (ANN at scale); the fusion itself is a (qid,id)-keyed outer join of
  * two already-small top-k sets.
  */
object Hybrid {

  /** Lexical top-k by inverted-index term overlap.
    *
    * Score = number of DISTINCT query terms present in the doc (hits),
    * ties by total term frequency of the matched terms (tfsum), then id
    * — integer-only, so ranking is exact on any engine. Smallest
    * sensible unit for a training-data / retrieval pipeline: no floats,
    * no IDF (see [[TextAnalysis.distinctiveTerms]] for the integer
    * TF/DF ranking rationale).
    *
    * @param docs    (id, text)
    * @param queries (qid, qtext)
    * @return (qid, id, hits, tfsum, rank), rank <= k
    */
  def lexicalTopK(
      docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "id", textCol: String = "text",
      qidCol: String = "qid", qtextCol: String = "qtext"): DataFrame = {
    val qterms = queries.select(
      col(qidCol).as("qid"),
      explode(array_distinct(tokens(col(qtextCol)))).as("term"))
    val dtf = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("qid")
      .orderBy(col("hits").desc, col("tfsum").desc, col("id"))
    qterms.join(dtf, Seq("term"))
      .groupBy("qid", "id")
      .agg(count(lit(1)).as("hits"), sum("tf").as("tfsum"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "hits", "tfsum", "rank")
  }

  /** BM25 lexical ranking (Robertson et al.; the Lucene `1 +` idf
    * variant, so idf stays positive for terms in over half the corpus).
    *
    * score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), N = corpus size,
    * dl = doc token count, avgdl = mean dl over the corpus.
    *
    * Engine-portability of the float path (why this can sit under the
    * exact-hash oracle gate even though [[TextAnalysis.distinctiveTerms]]
    * deliberately avoids float IDF): every *, /, +, − is IEEE-754
    * correctly rounded, hence bit-identical across engines given
    * bit-identical operands — measured, only `ln` differs, in ~0.05% of
    * idf arguments and only by 1 ulp (~1e-16 relative). The two places
    * that could surface such a difference are both rounded away: the
    * final score is [[graft.functions.PortableMath.rnd]]'d to 6 decimals
    * (quantum 1e-6 vs combined error ~1e-15), and the RANK is computed
    * on the ROUNDED score — near-ties collapse to equal and fall to the
    * integer id tie-break instead of flipping on a last-ulp difference.
    * The same rounding-before-rank also absorbs float-sum reorder across
    * engines/partitions (Σ over matched terms is the one
    * order-dependent step).
    *
    * Residual risk, quantified (the rounding device is probabilistic,
    * not absolute): rounding only absorbs a cross-engine difference when
    * the true sum is NOT within the accumulated error of a rounding
    * boundary. Accumulated error ≈ 1 ulp per ln × ~1e-16 relative on
    * scores of O(1..50), plus reorder error of the same magnitude —
    * ≤ ~1e-13 absolute. Boundaries sit every 1e-6, so P(flip per scored
    * pair) ≈ 2·1e-13/1e-6 = 2e-7; at this corpus's ~6.5k scored pairs
    * that is ~1e-3 per full run — and a flip only matters if the two
    * flipped scores additionally straddle the top-k cut. Measured across
    * the r6 gate runs: zero. If the gate must be unconditional, sum
    * per-term scores in a deterministic order (sort the term-score array
    * and fold) — not done here because the mirror engine's list-sum
    * fold order is not contractual either.
    *
    * Scale shape: inverted-index equi-join on term (posting-list
    * bounded, like [[lexicalTopK]]); df and corpus stats are
    * term-keyed/scalar aggregates (map-side combined); the scalar
    * (N, S) stats join is a literal broadcast; per-query top-k is a
    * qid window (WindowGroupLimit prunes map-side).
    *
    * @param docs    (id, text)
    * @param queries (qid, qtext)
    * @return (qid, id, score, rank) — score already portable-rounded
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "id", textCol: String = "text",
      qidCol: String = "qid", qtextCol: String = "qtext"): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin) // tf, dl and corpus stats all read it
    val dl = toked.select(col("id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toked
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // df derives from it AND joins back
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries.select(
      col(qidCol).as("qid"),
      explode(array_distinct(tokens(col(qtextCol)))).as("term"))

    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val dlRatio = col("dl").cast("double") /
      (col("sum_dl").cast("double") / col("n_docs").cast("double"))
    val termScore = idf * (col("tf").cast("double") * lit(k1 + 1)) /
      (col("tf").cast("double") + lit(k1) * (lit(1 - b) + lit(b) * dlRatio))

    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    qterms
      .join(tf, Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .groupBy("qid", "id")
      .agg(graft.functions.PortableMath.rnd(sum(termScore), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }

  /** Weighted linear fusion over per-query MIN-MAX-normalized scores —
    * the other standard hybrid baseline next to [[rrf]]: where RRF uses
    * only ranks (robust, calibration-free), linear fusion preserves
    * score MAGNITUDE — a doc that wins its branch by a mile outranks
    * one that wins by a hair, which rank-only fusion cannot express.
    *
    * Per branch and query: norm = (s − min)/(max − min) over that
    * query's branch candidates; the degenerate all-tied case (max =
    * min) normalizes to 1.0 — every candidate IS the branch maximum.
    * A doc missing from a branch contributes 0. Fused score =
    * Σ wᵢ·normᵢ, portable-rounded BEFORE ranking (same last-ulp
    * argument as [[bm25TopK]] — the normalizing division is one IEEE
    * op on bit-identical operands, but rounding-before-rank also
    * absorbs any branch whose scores carry accumulated float error).
    *
    * Scale shape: per-branch window min/max over ≤ branch-k rows per
    * query, then a (qid, id)-keyed outer join of already-small top-k
    * sets — same join geometry as [[rrf]].
    *
    * @param branches (name, ranking (qid, id, score), weight)
    * @return (qid, id, <name>_norm…, fused, rank) */
  def linearFusion(
      branches: Seq[(String, DataFrame, Double)], k: Int): DataFrame = {
    require(branches.nonEmpty)
    // duplicate names would collide in the <name>_norm columns and only
    // surface later as an ambiguous-column AnalysisException — fail here
    require(branches.map(_._1).distinct.size == branches.size,
      s"branch names must be unique, got: ${branches.map(_._1).mkString(", ")}")
    val normed = branches.map { case (name, df, _) =>
      val w = Window.partitionBy("qid")
      df.select(col("qid"), col("id"),
        when(max(col("score")).over(w) === min(col("score")).over(w), lit(1.0))
          .otherwise((col("score") - min(col("score")).over(w)) /
            (max(col("score")).over(w) - min(col("score")).over(w)))
          .as(s"${name}_norm"))
    }
    val joined = normed.reduce((a, b) => a.join(b, Seq("qid", "id"), "full_outer"))
    val fused: Column = branches.map { case (name, _, weight) =>
      lit(weight) * coalesce(col(s"${name}_norm"), lit(0.0))
    }.reduce(_ + _)
    val wRank = Window.partitionBy("qid").orderBy(col("fused").desc, col("id"))
    val normCols = branches.map { case (name, _, _) =>
      graft.functions.PortableMath.rnd(
        coalesce(col(s"${name}_norm"), lit(0.0)), 6).as(s"${name}_norm")
    }
    joined
      .withColumn("fused", graft.functions.PortableMath.rnd(fused, 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(Seq(col("qid"), col("id")) ++ normCols ++
        Seq(col("fused"), col("rank")): _*)
  }

  /** Reciprocal-rank fusion of named branch rankings.
    *
    * Each branch is (qid, id, rank); fused score =
    * Σ_branches 1/(k0 + rank), a doc missing from a branch contributes
    * 0. Output carries one `<name>_rnk` column per branch (0 where the
    * branch missed the doc — never NULL, for exact hashing) plus the
    * fused score and final rank.
    *
    * @param branches (name, ranking) pairs; name becomes `<name>_rnk`
    * @param k        fused list depth
    * @param k0       RRF smoothing constant (the standard 60)
    * @return (qid, id, <name>_rnk…, rrf, rank)
    */
  def rrf(branches: Seq[(String, DataFrame)], k: Int, k0: Int = 60): DataFrame = {
    require(branches.nonEmpty)
    // same uniqueness rule as [[linearFusion]]: <name>_rnk must not collide
    require(branches.map(_._1).distinct.size == branches.size,
      s"branch names must be unique, got: ${branches.map(_._1).mkString(", ")}")
    val tagged = branches.map { case (name, df) =>
      df.select(col("qid"), col("id"), col("rank").cast("long").as(s"${name}_rnk"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("qid", "id"), "full_outer"))
    val score: Column = branches.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0.toLong) + col(s"${name}_rnk")), lit(0.0))
    }.reduce(_ + _)
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("id"))
    val rnkCols = branches.map { case (name, _) =>
      coalesce(col(s"${name}_rnk"), lit(0L)).as(s"${name}_rnk")
    }
    joined.withColumn("rrf", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("qid"), col("id")) ++ rnkCols ++
        Seq(col("rrf"), col("rank")): _*)
  }
}
