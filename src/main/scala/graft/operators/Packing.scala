package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents end-to-end on
  * a global token line (key order) and cut it into fixed-size bins — the
  * manifest a trainer consumes to build packed context windows. A doc
  * whose token span crosses a bin boundary is SPLIT: one manifest row per
  * (doc, bin) segment, with the in-bin offset and segment length.
  *
  * Scale shape: the global token line is the q08 prefix-sum construction
  * (range-repartition by key, per-partition window cumsum, triangular
  * prefix-sum of the per-partition totals — metadata-sized broadcasts),
  * never a single-partition global window; the bin explode emits
  * ceil(w / binSize) + 1 rows per doc at most. All arithmetic is integer
  * except floor(a/b) on doubles, whose quotients sit >= 1/binSize away
  * from integer boundaries — far above the ~1e-16 rounding — so the
  * oracle mirrors it exactly.
  */
object Packing {

  /** @param tokenCount integer token count expression for a row
    * @return (key, n_tokens, bin, bin_offset, seg_len) — one row per
    *         (doc, bin) segment; zero-token docs carry no tokens and are
    *         excluded from the manifest */
  def packManifest(
      df: DataFrame, keyCol: String, tokenCount: Column,
      binSize: Long): DataFrame = {
    require(binSize >= 1)
    val sortKeys = Seq(col(keyCol).asc)
    val w = Window.partitionBy("_pid").orderBy(sortKeys: _*)
    val parts = df.select(col(keyCol), tokenCount.cast("long").as("_w"))
      .filter(col("_w") > 0)
      .repartitionByRange(32, sortKeys: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(graft.CacheScope.pin) // ranked rows + totals read it
    val ranked = parts.withColumn("_pcum", sum(col("_w")).over(w))
    val pw = parts.groupBy("_pid").agg(sum(col("_w")).as("_pw"))
    val offsets = pw.as("ca")
      .join(pw.as("cb"), col("cb._pid") < col("ca._pid"), "left")
      .groupBy(col("ca._pid").as("_pid"))
      .agg(coalesce(sum(col("cb._pw")), lit(0L)).as("_off"))
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val B = lit(binSize)
    val end = col("_pcum") + col("_off")
    val start = end - col("_w")
    ranked.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_start", start)
      .withColumn("_end", end)
      .withColumn("bin", explode(sequence(
        idiv(col("_start"), B), idiv(col("_end") - 1, B))))
      .select(col(keyCol), col("_w").as("n_tokens"), col("bin"),
        (greatest(col("_start"), col("bin") * B) - col("bin") * B).as("bin_offset"),
        (least(col("_end"), (col("bin") + 1) * B)
          - greatest(col("_start"), col("bin") * B)).as("seg_len"))
  }
}
