package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableMath.rnd
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding merge learning + segmentation (the Sennrich et al.
  * 2016 subword algorithm), re-expressed as DataFrame aggregations over
  * the collapsed (word, freq) vocabulary.
  *
  * The reference pipeline counts tokens with a pretrained HF tokenizer
  * (reference vec.py:9-14 delegates tokenization to the embedding
  * model); this operator is the TRAINING side of that story — learn the
  * merge table from the corpus itself, the step a pretraining pipeline
  * runs before any token budget / packing decision (q65/q72 consumers).
  *
  * Scale shape (100 TB): the corpus collapses to its distinct-word
  * vocabulary FIRST — one shuffle keyed by word, after a map-side
  * partial count. Vocabulary size is O(1M) rows independent of corpus
  * row count, so every merge iteration runs on a tiny relation: one
  * pair-count aggregation (map-side partial), a 1-row argmax collect
  * (the chosen merge is a scalar — k driver round-trips of ONE ROW
  * each, not data collects), and one higher-order-function rewrite of
  * the symbol arrays. The full corpus is touched exactly twice: once to
  * build the vocabulary, once — via a broadcast join against the final
  * vocab — to segment. No iteration ever rescans the corpus.
  *
  * Determinism: ties in pair frequency break on (lhs, rhs) ascending,
  * so the merge sequence is a pure function of the corpus. The greedy
  * left-to-right application resolves overlapping occurrences left
  * first ("l l l" + merge (l,l) -> ["ll","l"]), exactly the reference
  * BPE scan order and the DuckDB `list_reduce` oracle mirror.
  */
object Bpe {

  /** One learned merge: at `step`, adjacent pair (lhs, rhs) had the
    * highest corpus frequency `freq` and is rewritten to lhs+rhs. */
  final case class Merge(step: Int, lhs: String, rhs: String, freq: Long)

  /** Collapsed (word, freq) vocabulary of a corpus — the only shuffle
    * whose width scales with the corpus. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    Par.ensureMapParallelism(docs)
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of ONE merge (lhs, rhs) to a
    * symbol array, as a pure higher-order-function fold: the merged
    * symbol replaces the accumulator's last element, so an overlapping
    * run resolves left-first and never re-merges (lhs+rhs != lhs since
    * rhs is non-empty). Single-symbol arrays pass through untouched. */
  def mergeOnce(sym: Column, lhs: String, rhs: String): Column =
    when(size(sym) <= 1, sym).otherwise(
      aggregate(
        slice(sym, lit(2), size(sym)),
        array(element_at(sym, 1)),
        (acc, x) =>
          when(element_at(acc, -1) === lit(lhs) && x === lit(rhs),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
            .otherwise(concat(acc, array(x)))))

  /** Adjacent-pair frequencies of a (freq, sym) vocabulary: one row per
    * distinct (lhs, rhs), weighted by word frequency. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("sym")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), size(col("sym")) - 1),
          j => struct(
            element_at(col("sym"), j).as("lhs"),
            element_at(col("sym"), (j + 1).cast("int")).as("rhs"))))
          .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("freq").as("freq"))

  /** Learn up to k merges from a (word, freq) vocabulary. Returns the
    * merge table in learned order plus the final vocabulary with its
    * `sym` segmentation column (word, freq, sym) — the broadcast side
    * of any downstream corpus segmentation.
    *
    * Each iteration `localCheckpoint`s the rewritten vocabulary: the
    * merge rewrite is cheap but lineage would otherwise nest k HOF
    * folds deep, and the argmax collect re-executes the frame. */
  def learnMerges(
      vocab: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var v = vocab
      .select(col("word"), col("freq"), split(col("word"), "").as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = pairCounts(v)
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val row = best.head
        val (l, r) = (row.getString(0), row.getString(1))
        merges += Merge(step, l, r, row.getLong(2))
        val prev = v
        v = v.withColumn("sym", mergeOnce(col("sym"), l, r))
          .localCheckpoint()
        prev.unpersist()
        step += 1
      }
    }
    (merges.result(), v)
  }

  /** The learned merge table as a DataFrame (step, lhs, rhs, freq). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Apply an already-learned merge sequence to an arbitrary word
    * relation (column `word`) — the merges need NOT come from this
    * corpus, which is what makes held-out evaluation possible. Unseen
    * words degrade gracefully to whatever prefix of the merge sequence
    * applies (worst case: single characters) — byte-pair vocabularies
    * have no OOV.
    *
    * Each merge rewrite is `localCheckpoint`ed before the next is
    * stacked — the SAME per-step discipline [[learnMerges]] applies,
    * and for the same reason: [[mergeOnce]] references its input
    * expression ~5× through nested `aggregate` lambdas, so chaining k
    * rewrites in one projection grows the optimizer/codegen tree
    * ~5^k-fold (k=8 OOMed an 8 GiB heap on 500 docs in round 9). The
    * input is the collapsed vocabulary — O(distinct words), corpus-size
    * independent — so k tiny materializations are noise. */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    var v = words.withColumn("sym", split(col("word"), ""))
      .localCheckpoint()
    merges.foreach { m =>
      val prev = v
      v = v.withColumn("sym", mergeOnce(col("sym"), m.lhs, m.rhs))
        .localCheckpoint()
      prev.unpersist()
    }
    v
  }

  /** Segment a corpus with a learned vocabulary and report per-source
    * token statistics: token count, distinct subword types, character
    * mass, and chars-per-token compression. The corpus side is one
    * explode + broadcast join (vocab is tiny by construction) + two
    * aggregations — no shuffle wider than the per-source grain. */
  def segmentStats(
      docs: DataFrame, srcCol: String, textCol: String,
      finalVocab: DataFrame): DataFrame = {
    val words = Par.ensureMapParallelism(docs)
      .select(col(srcCol), explode(tokens(col(textCol))).as("word"))
    val joined = words
      .join(broadcast(finalVocab.select("word", "sym")), "word")
    val perSrc = joined.groupBy(srcCol).agg(
      count(lit(1)).as("n_words"),
      sum(size(col("sym"))).as("n_tokens"),
      sum(length(col("word")).cast("long")).as("n_chars"))
    val types = joined
      .select(col(srcCol), explode(col("sym")).as("tok"))
      .groupBy(srcCol)
      .agg(count_distinct(col("tok")).as("n_types"))
    perSrc.join(types, srcCol)
      .select(col(srcCol), col("n_words"), col("n_tokens"), col("n_types"),
        col("n_chars"),
        rnd(col("n_chars").cast("double") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"),
        rnd(col("n_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("tokens_per_word"))
  }
}
