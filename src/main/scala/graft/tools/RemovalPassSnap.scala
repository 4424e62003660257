package graft.tools

import graft.operators.SubstringDedup
import graft.operators.SubstringDedup.RemovalCarry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import java.nio.file.{Files, Paths}

/** Dumps the PASS-INTERNAL plan of an incremental removal pass — the
  * evidence [[PlanSnap]] cannot capture for q146: the iterated fixpoint
  * localCheckpoints every pass, so the final query plan shows only the
  * last checkpoint (a Scan ExistingRDD), never the pass machinery. This
  * tool drives [[SubstringDedup.removeDuplicateSpansPass]] directly on
  * the q146 corpus shape (same planted seam construction as
  * SparkEntry.removalFixpointQ, mirrored here because the query builder
  * is private to the entry map): pass 1 with a carry request, then pass
  * 2 WITH the carry, and writes pass 2's pre-checkpoint plan. The dump
  * shows the r19 incremental structure: the carried fingerprint
  * checkpoint (Scan ExistingRDD) semi-joined to the stable set unioned
  * with the winnowing subtree computed ONLY over anti-joined (non-stable)
  * keepers, feeding the pair join with the stable-x-stable reject.
  *
  * Usage: runMain graft.tools.RemovalPassSnap <outDir> <tag> [sfDir]
  */
object RemovalPassSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RemovalPassSnap <outDir> <tag> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)

    // q146's planted two-pass corpus (SparkEntry.removalFixpointQ)
    def hexbody(id: Column): Column =
      concat((0 until 10).map(j =>
        md5(concat(id.cast("string"), lit(":" + j)))): _*)
    def ns(id: Column, t: String, len: Int): Column =
      substring(concat(
        md5(concat(id.cast("string"), lit(s":${t}0"))),
        md5(concat(id.cast("string"), lit(s":${t}1")))), 1, len)
    val id = col("doc_id")
    val corpus = graft.Tables.documents(spark, sfDir).select(id,
      when(id % 9 === 4,
        concat(substring(hexbody(id), 1, 40), lit("#"),
          ns(id, "p", 40), ns(id, "z", 64), ns(id, "q", 40),
          lit("#"), substring(hexbody(id), 41, 280)))
        .when(id % 9 === 2,
          concat(substring(hexbody(id), 1, 100), lit("%"),
            ns(id + 2, "p", 40), ns(id + 2, "q", 40),
            lit("%"), substring(hexbody(id), 101, 220)))
        .when(id % 9 === 0,
          concat(substring(hexbody(id), 1, 100), lit("%"),
            ns(id + 4, "z", 64),
            lit("%"), substring(hexbody(id), 101, 220)))
        .otherwise(hexbody(id)).as("text"))
      .localCheckpoint()

    // pass 1, exactly as the iterated loop runs it (needCarry = true)
    val p1 = SubstringDedup.removeDuplicateSpansPass(
      corpus.select(col("doc_id"), col("text")), minLen = 64,
      idCol = "doc_id", textCol = "text", carry = None, needCarry = true)
    val ck1 = p1.out
      .withColumnRenamed("n_cut", "_round_cut")
      .localCheckpoint()
    val carry = RemovalCarry(p1.fp,
      ck1.filter(col("_keeper") && col("_round_cut") === 0)
        .select(col("doc_id")))

    // pass 2 WITH the carry; dump its plan BEFORE any checkpoint
    val p2 = SubstringDedup.removeDuplicateSpansPass(
      ck1.select(col("doc_id"), col("text")), minLen = 64,
      idCol = "doc_id", textCol = "text",
      carry = Some(carry), needCarry = false)
    val plan = p2.out.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val path = outDir.resolve(s"q146_pass2_internal_$tag.txt")
    Files.writeString(path, plan)
    println(s"[removalpasssnap] pass-2 internal plan -> $path")
    spark.stop()
  }
}
