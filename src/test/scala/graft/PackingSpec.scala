package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence-packing manifest semantics (the q72 operator): exact segment
  * layout on a hand-built token line, plus the invariants a trainer
  * relies on (segments tile each doc exactly; bins fill without overlap;
  * zero-token docs never appear). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token line (key order): a [0,100) b [100,300) c [300,600), binSize 256
  private val docs = Seq(
    ("a", 100L), ("b", 200L), ("c", 300L), ("z", 0L)).toDF("k", "w")

  private lazy val manifest = Packing.packManifest(
    docs, "k", col("w"), binSize = 256)
    .collect()
    .map(r => (r.getAs[String]("k"), r.getAs[Long]("bin"),
      r.getAs[Long]("bin_offset"), r.getAs[Long]("seg_len")))
    .toSet

  test("packManifest: exact hand-computed segment layout, boundary docs split") {
    assert(manifest == Set(
      ("a", 0L, 0L, 100L), // fits bin 0 whole
      ("b", 0L, 100L, 156L), ("b", 1L, 0L, 44L), // crosses the 256 boundary
      ("c", 1L, 44L, 212L), ("c", 2L, 0L, 88L))) // crosses the 512 boundary
    // zero-token docs carry no tokens: excluded, not a zero-length row
    assert(!manifest.exists(_._1 == "z"))
  }

  test("packManifest: segments tile each doc and bins fill contiguously") {
    val rows = Packing.packManifest(docs, "k", col("w"), binSize = 256)
    // per-doc: segment lengths sum to the doc's token count
    val perDoc = rows.groupBy("k")
      .agg(sum("seg_len").as("s"), first("n_tokens").as("w"))
      .filter(col("s") =!= col("w")).count()
    assert(perDoc == 0L)
    // per-bin: segments sum to exactly binSize for all but the last bin
    val binSums = rows.groupBy("bin").agg(sum("seg_len").as("s"))
      .orderBy("bin").collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("s"))
    assert(binSums.dropRight(1).forall(_._2 == 256L), binSums.mkString(","))
    assert(binSums.last._2 == 600L - 2 * 256L)
    // offsets stay inside the bin
    assert(rows.filter(col("bin_offset") < 0 ||
      col("bin_offset") + col("seg_len") > 256).count() == 0L)
  }
}
