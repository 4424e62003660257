package graft.operators

import graft.GraftConf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic-graph construction — the reference's
  * `update_graph_connections` (main.py:258-279) as an edge-delta
  * derivation over KNN results.
  *
  * Reference semantics reproduced (SURVEY.md §2.4 G1):
  *  - for each KNN neighbor of an ingested doc, excluding self
  *    (main.py:266: `if node_id == doc_id: continue`), add edge
  *    (doc, neighbor) with the similarity score
  *  - cross-modal boost: endpoint modalities differ ⇒
  *    score = max(score, 0.8) (main.py:272-273, F6)
  *  - the graph is undirected (networkx.Graph) ⇒ canonical storage with
  *    src < dst
  *  - NetworkX `add_edge` on an existing edge OVERWRITES the score
  *    (main.py:276) ⇒ latest-wins upsert, decided by an ingest-sequence
  *    column (SURVEY.md §7.4 risk 4)
  *
  * Scale: edge deltas are tiny (k rows per ingested doc); the upsert is a
  * window-dedup on (src,dst) — shuffles only edges, never documents. The
  * reference re-pickles the whole graph per ingest (O(G) write
  * amplification, main.py:35-37); the relational form appends deltas and
  * compacts on read.
  */
object GraphBuild {

  /** Edge deltas from KNN output rows
    * (qid, qtype, id, mtype, sim, seq) — qid is the newly ingested doc. */
  def edgeDelta(knn: DataFrame, conf: GraftConf = GraftConf.default): DataFrame =
    knn
      .filter(col("id") =!= col("qid")) // self-edge guard (main.py:266)
      .withColumn(
        "score",
        when(col("mtype") =!= col("qtype"),
          greatest(col("sim"), lit(conf.crossModalBoost)))
          .otherwise(col("sim"))) // F6 (main.py:272-273)
      .select(
        least(col("qid"), col("id")).as("src"),
        greatest(col("qid"), col("id")).as("dst"),
        col("score"),
        col("seq"))

  /** Latest-wins view of an edge frame: the max-seq row per (src, dst)
    * — NetworkX overwrite semantics, one window over edges only. */
  def latestWins(edges: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src", "dst").orderBy(col("seq").desc)
    edges
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Latest-wins upsert over canonical undirected edges. */
  def upsertEdges(existing: DataFrame, delta: DataFrame): DataFrame =
    latestWins(existing.unionByName(delta))

  /** Compact an append-only edge-delta store in place: rewrite
    * `edgesDir` to its [[latestWins]] view (O8 — the reference
    * re-pickles the whole graph per ingest; the relational form appends
    * deltas and compacts PERIODICALLY, so the store reads at O(live
    * edges), not O(all deltas ever appended)). `seq` is retained, so a
    * latest-wins read over (compacted ∪ later deltas) is unchanged —
    * compaction is invisible to every reader by construction
    * (StreamingSpec pins stream ≡ batch over a compacted store).
    *
    * Swap discipline (CRASH-SAFE, rename-aside — never delete-first):
    * the compacted frame lands in a sibling tmp dir, the live dir is
    * renamed ASIDE to a `.compact.old.N` slot, tmp renames in, and only
    * then is the aside copy deleted — every rename's boolean result is
    * checked and failure throws, so no code path ever removes the only
    * copy of the edge history. A crash inside the swap leaves either
    * (a) no live dir but an aside dir — healed by [[recoverEdges]]
    * (called here on entry, and cheap enough for writers to call before
    * appending) — or (b) a live dir plus a superseded aside dir, which
    * the next compaction folds into its [[latestWins]] input (a no-op
    * on superseded rows, full recovery if a restarted writer had
    * re-created the live dir fresh in the meantime: `seq` makes the
    * union-then-latest-wins correct in both cases). The swap is not
    * atomic for CONCURRENT readers; inside the streaming writer's
    * foreachBatch (the intended call site) batches are sequential, so
    * no reader can observe the gap. */
  def compactEdges(spark: org.apache.spark.sql.SparkSession, edgesDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(edgesDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverEdges(spark, edgesDir)
    if (!fs.exists(path)) return
    val asides = listAsides(fs, edgesDir)
    val tmp = new org.apache.hadoop.fs.Path(edgesDir + ".compact.tmp")
    val all = asides.foldLeft(spark.read.parquet(edgesDir)) {
      (df, a) => df.unionByName(spark.read.parquet(a.toString))
    }
    latestWins(all).write.mode("overwrite").parquet(tmp.toString)
    // swap: live -> fresh aside slot, tmp -> live, then drop every
    // superseded aside. Rename results CHECKED — a false return must
    // not fall through into a state where only tmp holds the data.
    val aside = freeAsideSlot(fs, edgesDir)
    require(fs.rename(path, aside), s"compactEdges: rename $path -> $aside failed")
    if (!fs.rename(tmp, path)) {
      // restore the store before failing: aside is the complete
      // pre-compaction history
      fs.rename(aside, path)
      throw new IllegalStateException(
        s"compactEdges: rename $tmp -> $path failed (store restored from $aside)")
    }
    (asides :+ aside).foreach { a =>
      require(fs.delete(a, true) || !fs.exists(a),
        s"compactEdges: delete of superseded $a failed")
    }
    // drop any cached file listing for the swapped path
    spark.catalog.refreshByPath(edgesDir)
  }

  /** Heal a crash-interrupted [[compactEdges]] swap: when the live dir is
    * missing but a `.compact.old.N` aside exists, rename the aside back in
    * (uncompacted but COMPLETE — `seq` is retained, so every latest-wins
    * reader is unaffected). Idempotent and cheap (two existence probes);
    * writers appending to the store should call it first so a replayed
    * batch never re-creates an empty store over a recoverable one. */
  def recoverEdges(spark: org.apache.spark.sql.SparkSession, edgesDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(edgesDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) listAsides(fs, edgesDir).headOption.foreach { a =>
      require(fs.rename(a, path), s"recoverEdges: rename $a -> $path failed")
    }
  }

  private def listAsides(
      fs: org.apache.hadoop.fs.FileSystem,
      edgesDir: String): Seq[org.apache.hadoop.fs.Path] = {
    val parent = new org.apache.hadoop.fs.Path(edgesDir).getParent
    val prefix = new org.apache.hadoop.fs.Path(edgesDir).getName + ".compact.old."
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(prefix)).sortBy(_.getName)
  }

  private def freeAsideSlot(
      fs: org.apache.hadoop.fs.FileSystem,
      edgesDir: String): org.apache.hadoop.fs.Path =
    Iterator.from(0)
      .map(i => new org.apache.hadoop.fs.Path(edgesDir + s".compact.old.$i"))
      .find(!fs.exists(_))
      .get

  // ---- hash-bucketed edge log (incremental-compaction layout) -----------
  // [[compactEdges]] rewrites the WHOLE edge store per cycle — O(live
  // edges) maintenance on the ingest cadence (r14 verdict #2, the edge
  // twin of the ann-store finding). The bucketed layout partitions the
  // log by eb = xxhash64(src, dst) mod nBuckets, so ALL deltas of one
  // undirected edge co-locate in one directory and latest-wins inside a
  // bucket is globally exact — which makes per-directory incremental
  // compaction ([[graft.sources.Sinks.compactPartitionDirsIncremental]])
  // semantics-preserving: only buckets that accumulated delta files are
  // rewritten, cold directories are never re-read. Readers are unchanged:
  // `spark.read.parquet(dir)` sees the same (src, dst, score, seq) rows
  // plus the inert eb partition column, and [[latestWins]] folds exactly
  // as on the flat log (spec-pinned equivalence).

  /** The bucket id of a canonical (src < dst) edge row. */
  private def ebCol(nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("src"), col("dst")), lit(nBuckets)).cast("int")

  // The bucket count of an at-rest edge log is LAYOUT the same way the
  // ann store's geometry is (Ann.scala's _GEOMETRY rationale) — with one
  // grade less severity: readers always fold [[latestWins]] over the
  // WHOLE store, so rows of one edge split across two bucket counts are
  // still read correctly. What a mismatched append silently costs is
  // the maintenance contract — per-bucket incremental compaction can
  // never converge cross-bucket supersedence, so superseded rows
  // accumulate unfoldably. The store therefore carries `_EDGEBUCKETS`:
  // appends stamp it on first write and fail loudly on disagreement,
  // and [[rebucketEdgeLog]] is the one operation that changes it
  // (atomically with the re-partitioned data).

  private val EdgeBucketsFile = "_EDGEBUCKETS"

  /** The edge log's bucket-count manifest; None for a pre-manifest
    * store (callers fall back to their configured value — [[
    * appendEdgeDeltaBucketed]] stamps it on the next append). */
  def readEdgeBuckets(
      spark: org.apache.spark.sql.SparkSession, dir: String): Option[Int] =
    graft.sources.StoreManifest.readLine(spark, dir, EdgeBucketsFile)
      .map(l => graft.sources.StoreManifest
        .intFields(dir, EdgeBucketsFile, l, 1)(0))

  /** The bucket count a (re)starting writer must append at: the store's
    * own manifest when present (a log migrated by [[rebucketEdgeLog]]
    * in a previous run must be continued at the migrated count), the
    * configured value otherwise. Heals crash-interrupted maintenance
    * swaps first — in the crash window the manifest sits in the aside
    * slot and "no manifest" would silently regress a migrated store. */
  def adoptEdgeBuckets(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      configured: Int): Int = {
    require(configured >= 1, s"nBuckets must be >= 1, got $configured")
    graft.sources.Sinks.recoverSwap(spark, dir)
    recoverEdgesBucketed(spark, dir)
    readEdgeBuckets(spark, dir).getOrElse(configured)
  }

  /** Append an edge delta into the bucketed log. Clustered on eb before
    * the partitioned write (the [[graft.operators.Ann
    * .appendMultiTableBatch]] discipline): a batch adds ~one file per
    * touched bucket instead of tasks × buckets tiny files. Stamps the
    * `_EDGEBUCKETS` manifest on a store that lacks one; an append at a
    * count disagreeing with the manifest fails loudly (adopt via
    * [[adoptEdgeBuckets]] or migrate via [[rebucketEdgeLog]] first). */
  def appendEdgeDeltaBucketed(
      delta: DataFrame, dir: String, nBuckets: Int): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = delta.sparkSession
    readEdgeBuckets(spark, dir) match {
      case Some(n) => require(n == nBuckets,
        s"append at nBuckets=$nBuckets against an edge log whose " +
          s"$EdgeBucketsFile says $n — adopt the manifest " +
          s"(GraphBuild.adoptEdgeBuckets) or migrate the store " +
          s"(GraphBuild.rebucketEdgeLog) first: $dir")
      case None =>
        graft.sources.StoreManifest.writeLine(
          spark, dir, EdgeBucketsFile, nBuckets.toString)
    }
    delta.withColumn("eb", ebCol(nBuckets))
      .repartition(col("eb"))
      .write.mode("append").partitionBy("eb").parquet(dir)
  }

  /** MIGRATE the bucketed edge log to a new bucket count — the
    * occupancy lever on this layout (r17 verdict #7, edge parity with
    * [[graft.operators.Dedup.rebucketSignatureIndexStore]] and
    * [[graft.operators.Ann.rebucketBucketedCorpus]]): fixed nBuckets
    * means per-bucket row count grows linearly with the live graph, so
    * the incremental compactor's "hot bucket" rewrites converge on
    * O(store/nBuckets) — a constant fraction of a growing store — and
    * fold granularity degrades with scale. One deliberate O(live edges)
    * pass behind the crash-safe whole-dir swap: the log folds to its
    * [[latestWins]] view in passing (eb is a pure function of the
    * stored (src, dst), so no other state moves — superseded and
    * replay-duplicated rows converge away here, exactly as a whole-store
    * [[compactEdges]] would), re-partitions at the new count, and the
    * NEW `_EDGEBUCKETS` manifest publishes atomically with the data.
    * Readers are unchanged by construction (latest-wins over the folded
    * store ≡ latest-wins over the raw log — oracle-gated by q203);
    * writers adopt the manifest at restart ([[adoptEdgeBuckets]]). */
  def rebucketEdgeLog(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1, got $newBuckets")
    // heal BOTH swap grains before the whole-dir swap reads the store
    graft.sources.Sinks.recoverSwap(spark, dir)
    recoverEdgesBucketed(spark, dir)
    graft.sources.Sinks.swapInPlace(spark, dir, (df, tmp) => {
      latestWins(df.drop("eb"))
        .withColumn("eb", ebCol(newBuckets))
        .repartition(col("eb"))
        .write.mode("overwrite").partitionBy("eb").parquet(tmp)
      graft.sources.StoreManifest.writeLine(
        spark, tmp, EdgeBucketsFile, newBuckets.toString)
    })
  }

  /** Incremental compaction of the bucketed edge log: fold only `eb=`
    * directories holding more than `maxFilesPerBucket` data files to
    * their [[latestWins]] view — per-cycle cost O(hot-bucket edges),
    * independent of store size. `seq` is retained, so latest-wins over
    * (compacted ∪ later deltas) is unchanged, exactly as with
    * [[compactEdges]]. @return compacted bucket directory names */
  def compactEdgesIncremental(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerBucket: Int = 4): Seq[String] =
    graft.sources.Sinks.compactPartitionDirsIncremental(
      spark, dir, "eb=", maxFilesPerBucket, latestWins)

  /** Heal crash-interrupted [[compactEdgesIncremental]] swaps — writers
    * call this before appending to a bucketed log after a restart (the
    * [[recoverEdges]] discipline for the bucketed layout). */
  def recoverEdgesBucketed(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, dir)

  /** Symmetric (both-orientations) view for traversal joins. */
  def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"), col("score"))
      .unionByName(
        edges.select(col("dst").as("u"), col("src").as("v"), col("score")))
}
