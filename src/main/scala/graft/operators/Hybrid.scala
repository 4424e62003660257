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
