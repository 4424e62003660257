package graft.sources

import org.apache.spark.sql.SparkSession

/** One-line at-rest parameter manifests for partitioned store layouts.
  *
  * A store whose DIRECTORY STRUCTURE encodes derived keys (LSH buckets,
  * band-hash buckets) is only readable at the parameters the files were
  * written with: probing at any other parameters computes different keys,
  * prunes to the WRONG directories, and is silently incorrect — no error,
  * just missing rows. The layout parameters are therefore LAYOUT, not
  * configuration, and must travel with the data: a `_`-prefixed file at
  * the store root (Spark's file listing never sees it, and it rides every
  * whole-dir crash-safe swap).
  *
  * This is the generalized machinery behind the ann store's `_GEOMETRY`
  * manifest ([[graft.operators.Ann.readGeometry]], r15), reused by the
  * dedup signature-index store (`_SIGPARAMS`) and the single-table
  * bucketed corpus — the r15 verdict's top finding was that the manifest
  * discipline stopped at the ann store while the dedup side re-opened the
  * identical silent-wrong-pruning class.
  *
  * Format: a single UTF-8 line of space-separated fields, written via
  * tmp-file + rename. Writers publish a manifest either onto a store that
  * lacks one (stamp-on-first-write — a crash between delete and rename
  * only re-opens the benign pre-manifest fallback window) or into a
  * not-yet-published swap tmp dir (so data + parameters publish in ONE
  * rename, never observable apart).
  */
object StoreManifest {

  /** Read `dir/<name>` as one trimmed line; None when absent (the
    * pre-manifest fallback — callers use their configured parameters,
    * correct because only manifest-writing operations ever change a
    * store's layout parameters). */
  def readLine(
      spark: SparkSession, dir: String, name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Stamp `dir/<name>` with `line` (tmp-write + rename; creates parent
    * dirs — stamping ahead of a streaming sink's first batch is legal). */
  def writeLine(
      spark: SparkSession, dir: String, name: String, line: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, name + ".tmp")
    val out = fs.create(tmp, true) // creates parents
    try out.write((line + "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(root, name)
    if (fs.exists(dst))
      require(fs.delete(dst, false),
        s"StoreManifest: delete of stale $dst failed")
    require(fs.rename(tmp, dst), s"StoreManifest: rename $tmp -> $dst failed")
  }

  /** Parse a manifest line of exactly `n` integer fields. */
  def intFields(dir: String, name: String, line: String, n: Int): Array[Int] = {
    val a = line.split("\\s+")
    require(a.length == n, s"malformed $name in $dir: '$line'")
    a.map(_.toInt)
  }
}
