package graft.tools

import graft.GraftConf
import graft.operators.{Ann, Ingest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Geometry-vs-store-size study for the at-rest multi-table LSH corpus
  * (r14 verdict #3): fixed nPlanes/nTables means per-probe candidate
  * work grows linearly with the store (expected bucket occupancy
  * ≈ N / 2^nPlanes per table), so the flatness a growth series shows
  * over 20× will NOT hold over 100× — the design needs a measured rule
  * for choosing nPlanes from a target corpus size, and a migration
  * lever ([[Ann.regeometryMultiTableCorpus]]) for stores that outgrow
  * their geometry.
  *
  * This main maintains one store PER GEOMETRY over identical growth
  * slabs and, at each size, times the stored probe
  * ([[Ann.multiTableStoreCandidates]] + top-k rank) for a
  * reference-grain query batch and reports the candidate-pair count —
  * the linear driver the probe time follows. At the final size it
  * executes the migration (smallest geometry → largest) and re-times
  * the probe on the migrated store, so the study measures the exact
  * lever a production deployment would pull, not just the curves that
  * justify pulling it. Numbers are recorded in SCALE.md
  * §ann-regeometry.
  *
  * Env knobs: REGEOM_SLABS (default 8), REGEOM_SLAB_ROWS (25000),
  * REGEOM_PROBE_ROWS (50). One JSON line per measurement plus a final
  * summary — greppable the way StreamBench output is.
  *
  * Run: sbt "runMain graft.tools.RegeomStudy"
  */
object RegeomStudy {

  def main(args: Array[String]): Unit = {
    val slabs = sys.env.getOrElse("REGEOM_SLABS", "8").toInt
    val slabRows = sys.env.getOrElse("REGEOM_SLAB_ROWS", "25000").toInt
    val probeRows = sys.env.getOrElse("REGEOM_PROBE_ROWS", "50").toInt
    val dim = 64
    val geoms = Seq((6, 4), (8, 4), (10, 4)) // (nPlanes, nTables)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = GraftConf(dim = dim)

    val dir = java.nio.file.Files.createTempDirectory("graft_regeom").toString
    def storeDir(p: Int, t: Int) = s"$dir/ann_p${p}t$t"

    def freshDocs(offset: Long, n: Int) =
      spark.range(0, n.toLong)
        .select(
          when((col("id") + offset) % 3 === 0, "image").otherwise("text").as("mtype"),
          concat(lit("regeom payload number "),
            (col("id") + offset).cast("string")).as("data"),
          (col("id") + offset).as("seq"))

    def timedProbe(store: String, p: Int, t: Int, qOffset: Long): (Double, Long) = {
      val queries = Ingest.prepare(freshDocs(qOffset, probeRows), conf)
        .select(col("id").as("qid"), col("embedding").as("qvec"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val cands = Ann.multiTableStoreCandidates(
        spark, store, queries, dim, p, t, conf)
      val nCands = cands.count()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, nCands)
    }

    (0 until slabs).foreach { i =>
      val slab = Ingest.prepare(
          freshDocs(10000000L + i.toLong * slabRows, slabRows), conf)
        .select("id", "mtype", "embedding")
        .localCheckpoint()
      geoms.foreach { case (p, t) =>
        Ann.appendMultiTableBatch(slab, storeDir(p, t), dim, p, t)
        spark.catalog.refreshByPath(storeDir(p, t))
      }
      slab.unpersist()
      val size = (i.toLong + 1) * slabRows
      geoms.foreach { case (p, t) =>
        val (secs, nCands) = timedProbe(storeDir(p, t), p, t,
          50000000L + i.toLong * probeRows)
        println(f"""{"study":"regeom","store_rows":$size,"nplanes":$p,"ntables":$t,""" +
          f""""probe_sec":$secs%.3f,"candidate_pairs":$nCands,""" +
          f""""cand_frac":${nCands.toDouble / (probeRows.toDouble * size)}%.5f}""")
      }
    }

    // the migration lever at final size: smallest geometry -> largest,
    // then the probe re-timed on the MIGRATED store (results equivalent
    // to a fresh backfill at the new geometry — spec-pinned)
    val (p0, t0g) = geoms.head
    val (p1, t1g) = geoms.last
    val mig = storeDir(p0, t0g)
    val m0 = System.nanoTime()
    Ann.regeometryMultiTableCorpus(spark, mig, dim, p1, t1g)
    val migSec = (System.nanoTime() - m0) / 1e9
    val (postSec, postCands) = timedProbe(mig, p1, t1g, 90000000L)
    val finalRows = slabs.toLong * slabRows
    println(f"""{"study":"regeom_migration","store_rows":$finalRows,""" +
      f""""from":"p${p0}t$t0g","to":"p${p1}t$t1g","migrate_sec":$migSec%.1f,""" +
      f""""probe_sec_after":$postSec%.3f,"candidate_pairs_after":$postCands}""")
    spark.stop()
  }
}
