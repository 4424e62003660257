package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import graft.functions.PortableMath.rnd
import org.apache.spark.sql.functions._

/** Per-document text-analysis columns for training-data curation: token
  * counts, language ID, quality score, fingerprint. Single narrow
  * projection over the corpus — no shuffle at all; the whole operator is
  * one codegen'd map stage, which is exactly what you want when the input
  * is 100 TB of text. */
object TextAnalysis {

  /** All metrics at once (single pass). */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      tokenCount(col(textCol)).as("n_tokens"),
      approxBpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      length(col(textCol)).as("n_chars"),
      rnd(stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      rnd(punctRatio(col(textCol)), 6).as("punct_ratio"),
      rnd(meanTokenLen(col(textCol)), 6).as("mean_token_len"),
      langIdHeuristic(col(textCol)).as("lang_pred"),
      rnd(qualityScore(col(textCol)), 6).as("quality"),
      docFingerprint(col(textCol)).as("fingerprint"))
}
