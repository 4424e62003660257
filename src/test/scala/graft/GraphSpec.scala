package graft

import graft.operators.{GraphBuild, GraphExpand, GraphViews}
import org.apache.spark.sql.functions._

/** Graph operator semantics: F6 boost, canonical form, latest-wins upsert
  * (NetworkX add_edge overwrite), faithful single-pop expansion, F7 decay. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("edgeDelta: cross-modal boost floors score at 0.8, same-modal untouched (main.py:272-273)") {
    val knn = Seq(
      ("q1", "text", "a", "image", 0.3, 1L), // cross, low → boosted to 0.8
      ("q1", "text", "b", "image", 0.95, 1L), // cross, high → kept
      ("q1", "text", "c", "text", 0.3, 1L), // same → kept
      ("q1", "text", "q1", "text", 1.0, 1L) // self → dropped
    ).toDF("qid", "qtype", "id", "mtype", "sim", "seq")
    val edges = GraphBuild.edgeDelta(knn).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Double]("score")).toMap
    assert(edges.size == 3)
    assert(edges(("a", "q1")) == 0.8)
    assert(edges(("b", "q1")) == 0.95)
    assert(edges(("c", "q1")) == 0.3)
  }

  test("edgeDelta: canonical src < dst (undirected storage)") {
    val knn = Seq(("z", "text", "a", "text", 0.5, 1L))
      .toDF("qid", "qtype", "id", "mtype", "sim", "seq")
    val e = GraphBuild.edgeDelta(knn).collect().head
    assert(e.getAs[String]("src") == "a" && e.getAs[String]("dst") == "z")
  }

  test("upsertEdges: latest seq wins per (src,dst) — NetworkX overwrite (main.py:276)") {
    val existing = Seq(("a", "b", 0.5, 1L), ("a", "c", 0.6, 1L))
      .toDF("src", "dst", "score", "seq")
    val delta = Seq(("a", "b", 0.9, 2L), ("a", "d", 0.7, 2L))
      .toDF("src", "dst", "score", "seq")
    val res = GraphBuild.upsertEdges(existing, delta).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Double]("score")).toMap
    assert(res == Map(("a", "b") -> 0.9, ("a", "c") -> 0.6, ("a", "d") -> 0.7))
  }

  test("compactEdges: crash-safe swap — aside recovery, superseded-aside merge, no window loses the store") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_compact_crash").toString + "/edges"
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = hp(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("a", "b", 0.5, 1L), ("a", "b", 0.9, 2L), ("a", "c", 0.6, 1L))
      .toDF("src", "dst", "score", "seq").write.parquet(dir)
    GraphBuild.compactEdges(spark, dir)
    assert(spark.read.parquet(dir).count() == 2, "normal compaction")
    assert(!fs.exists(hp(dir + ".compact.tmp")) &&
      !fs.exists(hp(dir + ".compact.old.0")), "compaction left debris")
    // crash window (a): between rename-aside and rename-in — live dir
    // missing, aside holds the complete history. recoverEdges heals it.
    assert(fs.rename(hp(dir), hp(dir + ".compact.old.0")))
    GraphBuild.recoverEdges(spark, dir)
    val healed = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(healed == Map(("a", "b") -> 0.9, ("a", "c") -> 0.6), s"$healed")
    // crash window (c): aside left over AND a restarted writer re-created
    // the live dir with only post-crash deltas — the next compaction must
    // MERGE both (seq makes latest-wins over the union exact), not treat
    // the aside as stale garbage
    assert(fs.rename(hp(dir), hp(dir + ".compact.old.0")))
    Seq(("a", "d", 0.7, 3L), ("a", "b", 0.95, 3L))
      .toDF("src", "dst", "score", "seq").write.parquet(dir)
    GraphBuild.compactEdges(spark, dir)
    val merged = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(merged == Map(
      ("a", "b") -> 0.95, ("a", "c") -> 0.6, ("a", "d") -> 0.7), s"$merged")
    assert(!fs.exists(hp(dir + ".compact.old.0")), "superseded aside retained")
  }

  test("expandFaithful: only the rank-1 seed is expanded (search.py:10-14 single pop)") {
    // graph: s1 - n1 (0.5), s2 - n2 (0.5). Seeds rank1=s1, rank2=s2.
    // Faithful depth=1: n1 appears (decayed), n2 must NOT.
    val seeds = Seq(("q", "s1", 0.9, 1), ("q", "s2", 0.8, 2))
      .toDF("qid", "id", "sim", "rank")
    val edges = Seq(("n1", "s1", 0.5, 1L), ("n2", "s2", 0.5, 1L))
      .toDF("src", "dst", "score", "seq")
    val res = GraphExpand.expandFaithful(seeds, edges, k = 10)
    val ids = res.collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("score")).toMap
    assert(ids.contains("n1") && !ids.contains("n2"))
    // F7 decay: parent 0.9 * edge 0.5 * 0.9
    assert(math.abs(ids("n1") - 0.9 * 0.5 * 0.9) < 1e-12)
  }

  test("expandFaithful: seed scores win on collision (search.py:19)") {
    // s2 is also a neighbor of s1 with huge edge weight; its seed score
    // (0.8) must survive, not the decayed-from-parent value.
    val seeds = Seq(("q", "s1", 0.9, 1), ("q", "s2", 0.8, 2))
      .toDF("qid", "id", "sim", "rank")
    val edges = Seq(("s1", "s2", 1.0, 1L)).toDF("src", "dst", "score", "seq")
    val res = GraphExpand.expandFaithful(seeds, edges, k = 10).collect()
    val s2 = res.find(_.getAs[String]("id") == "s2").get
    assert(s2.getAs[Double]("score") == 0.8)
    assert(s2.getAs[String]("origin") == "seed")
  }

  test("expandFaithfulDepth: pops follow seed rank order; first writer wins across pops") {
    // graph: s1-c (0.5), s2-c (0.9), s2-d (0.5). depth=2:
    //  pop1 = s1 discovers c at 0.9*0.5*0.9 = 0.405
    //  pop2 = s2 sees c ALREADY CLAIMED (search.py:19 dict guard — even
    //  though its path would score higher, 0.8*0.9*0.9 = 0.648) and only
    //  adds d at 0.8*0.5*0.9 = 0.36
    val seeds = Seq(("q", "s1", 0.9, 1), ("q", "s2", 0.8, 2))
      .toDF("qid", "id", "sim", "rank")
    val edges = Seq(("c", "s1", 0.5, 1L), ("c", "s2", 0.9, 1L), ("d", "s2", 0.5, 1L))
      .toDF("src", "dst", "score", "seq")
    val d1 = GraphExpand.expandFaithfulDepth(seeds, edges, k = 10, depth = 1)
      .collect().map(_.getAs[String]("id")).toSet
    assert(!d1.contains("d"), "depth 1 must not expand the rank-2 seed")
    val d2 = GraphExpand.expandFaithfulDepth(seeds, edges, k = 10, depth = 2)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Double]("score"), r.getAs[String]("origin"))).toMap
    assert(math.abs(d2("c")._1 - 0.405) < 1e-12,
      s"first-writer-wins violated: ${d2("c")}")
    assert(math.abs(d2("d")._1 - 0.36) < 1e-12)
    assert(d2("c")._2 == "expanded" && d2("d")._2 == "expanded")
    // depth=1 must equal expandFaithful (same single-pop quirk)
    val faithful = GraphExpand.expandFaithful(seeds, edges, k = 10)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Double]("score"))).toSet
    val depth1 = GraphExpand.expandFaithfulDepth(seeds, edges, k = 10, depth = 1)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Double]("score"))).toSet
    assert(faithful == depth1)
  }

  test("expandFaithfulDepth: fewer seeds than depth throws the documented error (r12 verdict #3)") {
    // 1 seed, depth 3: the reference (search.py:10-14) pops FIFO — after
    // the single seed it would pop DISCOVERIES in NetworkX
    // adjacency-insertion order, which no relational form reproduces.
    // The collapsed operator must refuse loudly, not silently expand
    // only the seed pop.
    val seeds = Seq(("q", "s1", 0.9, 1)).toDF("qid", "id", "sim", "rank")
    val edges = Seq(("a", "s1", 0.5, 1L), ("b", "a", 0.9, 1L))
      .toDF("src", "dst", "score", "seq")
    val err = intercept[IllegalArgumentException] {
      GraphExpand.expandFaithfulDepth(seeds, edges, k = 10, depth = 3)
    }
    assert(err.getMessage.contains("search.py:10-14"))
    assert(err.getMessage.contains("q"), s"offending qid missing: ${err.getMessage}")
    // a mixed frame fails too (one valid query doesn't mask the offender)
    val mixed = Seq(
      ("ok", "s1", 0.9, 1), ("ok", "s2", 0.8, 2), ("ok", "s3", 0.7, 3),
      ("short", "s1", 0.9, 1)).toDF("qid", "id", "sim", "rank")
    intercept[IllegalArgumentException] {
      GraphExpand.expandFaithfulDepth(mixed, edges, k = 10, depth = 3)
    }
    // the out-of-band escape hatch keeps the plan lazy and expands the
    // seed pops that DO exist (the documented approximation, caller-owned)
    val lax = GraphExpand.expandFaithfulDepth(
      seeds, edges, k = 10, depth = 3, validateSeedDepth = false)
    assert(lax.collect().map(_.getAs[String]("id")).toSet == Set("s1", "a"))
    // empty seeds are vacuously fine (nothing to pop)
    val empty = seeds.limit(0)
    assert(GraphExpand.expandFaithfulDepth(empty, edges, k = 5, depth = 3)
      .collect().isEmpty)
    // DUPLICATED ranks must fail: three rows with ranks {1, 1, 2} pass a
    // row count but rank 3 is absent — exactly the silent divergence the
    // check exists to reject (r13 ADVICE #2: countDistinct, not sum)
    val duped = Seq(
      ("q", "s1", 0.9, 1), ("q", "s1b", 0.85, 1), ("q", "s2", 0.8, 2))
      .toDF("qid", "id", "sim", "rank")
    intercept[IllegalArgumentException] {
      GraphExpand.expandFaithfulDepth(duped, edges, k = 10, depth = 3)
    }
  }

  test("expandAll: full-frontier BFS reaches depth-2 nodes with compounded decay") {
    val seeds = Seq(("q", "s1", 1.0, 1)).toDF("qid", "id", "sim", "rank")
    val edges = Seq(("s1", "n1", 0.5, 1L), ("n1", "n2", 0.4, 1L))
      .toDF("src", "dst", "score", "seq")
    val d1 = GraphExpand.expandAll(seeds, edges, k = 10, depth = 1).collect()
    assert(!d1.map(_.getAs[String]("id")).contains("n2"))
    val d2 = GraphExpand.expandAll(seeds, edges, k = 10, depth = 2).collect()
    val n2 = d2.find(_.getAs[String]("id") == "n2").get
    assert(math.abs(n2.getAs[Double]("score") - 1.0 * 0.5 * 0.9 * 0.4 * 0.9) < 1e-12)
  }

  test("expandAllCheckpointed ≡ expandAll at depth 1..3 (lineage-truncated twin)") {
    // two queries, branching + a cycle + a multi-path node (n3 reachable
    // via n1 and n2 at different scores) so the max-score dedup is live
    val seeds = Seq(
      ("q1", "s1", 1.0, 1), ("q1", "s2", 0.7, 2),
      ("q2", "s2", 0.9, 1)
    ).toDF("qid", "id", "sim", "rank")
    val edges = Seq(
      ("s1", "n1", 0.8, 1L), ("s1", "n2", 0.5, 1L), ("s2", "n2", 0.9, 1L),
      ("n1", "n3", 0.6, 1L), ("n2", "n3", 0.9, 1L), ("n3", "s1", 0.4, 1L)
    ).toDF("src", "dst", "score", "seq")
    for (depth <- 1 to 3) {
      val a = GraphExpand.expandAll(seeds, edges, k = 10, depth = depth)
        .collect().map(r => (r.getAs[String]("qid"), r.getAs[String]("id"),
          r.getAs[Double]("score"), r.getAs[Int]("rnk"))).toSet
      val b = GraphExpand.expandAllCheckpointed(seeds, edges, k = 10, depth = depth)
        .collect().map(r => (r.getAs[String]("qid"), r.getAs[String]("id"),
          r.getAs[Double]("score"), r.getAs[Int]("rnk"))).toSet
      assert(a == b, s"depth $depth diverged")
    }
  }

  test("graph views: nodes, degrees, dangling filter (G3-G5)") {
    val edges = Seq(("a", "b", 0.5, 1L), ("b", "c", 0.7, 1L))
      .toDF("src", "dst", "score", "seq")
    assert(GraphViews.nodes(edges).as[String].collect().toSet == Set("a", "b", "c"))
    val deg = GraphViews.degrees(edges).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("degree")).toMap
    assert(deg == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
    // docs store only has a and b → edge (b,c) must be pruned
    val docs = Seq(("a", "text"), ("b", "text")).toDF("id", "mtype")
    val (valid, pruned) = GraphViews.validGraph(edges, docs)
    assert(valid.select("id").as[String].collect().toSet == Set("a", "b"))
    assert(pruned.collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst"))).toSeq == Seq(("a", "b")))
  }
}
