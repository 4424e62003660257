package graft

import graft.operators.{Dedup, GraphAlgos}
import org.apache.spark.sql.functions._

/** Connected components + dedup-cluster resolution. */
class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: two chains and a singleton-free graph resolve to min labels") {
    // components: {a,b,c,d} (chain) and {x,y}
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    val cc = GraphAlgos.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("connectedComponents: converges on a cycle and a long path within maxIter") {
    val cycle = Seq(("1", "2"), ("2", "3"), ("3", "1")).toDF("src", "dst")
    val cc = GraphAlgos.connectedComponents(cycle).collect()
      .map(_.getString(1)).distinct
    assert(cc.toSeq == Seq("1"))
    // path of length 9: diameter > default label hops per iteration
    val path = (1 to 9).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    val cc2 = GraphAlgos.connectedComponents(path, maxIter = 12).collect()
    assert(cc2.map(_.getString(1)).distinct.toSeq == Seq("n01"))
  }

  test("connectedComponents: pointer doubling converges in O(log diameter), where plain hop-propagation provably fragments") {
    def chain(n: Int) =
      (1 until n).map(i => (f"c$i%04d", f"c${i + 1}%04d")).toDF("src", "dst")
    // the pre-round-11 algorithm: plain min-label hops, capped — the
    // spec keeps it as the counterexample the redesign exists to kill
    def plainHopCapped(edges: org.apache.spark.sql.DataFrame, cap: Int) = {
      val sym = edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
        .localCheckpoint()
      var labels = sym.select(col("u").as("id")).distinct()
        .withColumn("component", col("id")).localCheckpoint()
      (1 to cap).foreach { _ =>
        labels = labels.unionByName(
            sym.join(labels, col("u") === col("id"))
              .select(col("v").as("id"), col("component")))
          .groupBy("id").agg(min("component").as("component"))
          .localCheckpoint()
      }
      labels
    }
    // a 200-node chain has diameter 199: 10 capped hops move labels at
    // most 10 edges, so the old code returns MANY components — silently
    // fragmented clusters = kept duplicates at crawl scale
    val fragmented = plainHopCapped(chain(200), cap = 10)
      .select("component").distinct().count()
    assert(fragmented > 1, s"expected the capped hop algorithm to fragment, got $fragmented component(s)")
    // the doubling algorithm resolves the same chain in ~log2(199)
    // supersteps (distance covered ≈ 2^(k+1)-2) plus one confirm pass
    val r = GraphAlgos.connectedComponentsWithStats(chain(200))
    assert(r.converged)
    assert(r.labels.select("component").distinct().count() == 1)
    assert(r.iterations <= 10, s"expected ≤10 supersteps for diameter 199, took ${r.iterations}")
    // growth is ~log in chain length: 10× longer chain buys only a
    // few extra supersteps, not 10× of them
    val r50 = GraphAlgos.connectedComponentsWithStats(chain(50))
    val r500 = GraphAlgos.connectedComponentsWithStats(chain(500))
    assert(r50.converged && r500.converged)
    assert(r500.labels.select("component").distinct().count() == 1)
    assert(r500.iterations - r50.iterations <= 4,
      s"superstep growth not logarithmic: ${r50.iterations} -> ${r500.iterations}")
  }

  test("connectedComponents: unconverged exit fails loud instead of returning fragments") {
    val longChain = (1 until 300)
      .map(i => (f"n$i%04d", f"n${i + 1}%04d")).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      GraphAlgos.connectedComponents(longChain, maxIter = 3).count()
    }
    assert(e.getMessage.contains("fragmented"))
    // ...while the stats surface reports instead of throwing
    val r = GraphAlgos.connectedComponentsWithStats(longChain, maxIter = 3)
    assert(!r.converged && r.iterations == 3)
  }

  test("dedupClusters: transitive near-dup groups keep exactly one doc (min id)") {
    // pairs: (1,2), (2,3) transitively one cluster; (7,8) another
    val pairs = Seq(("1", "2"), ("2", "3"), ("7", "8")).toDF("id_a", "id_b")
    val res = GraphAlgos.dedupClusters(pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(res.toSet == Set(
      ("1", "1", true), ("2", "1", false), ("3", "1", false),
      ("7", "7", true), ("8", "7", false)))
  }

  test("end to end: minhash pairs -> clusters -> keepers on a corpus with transitive dups") {
    // doc 1 ~ doc 2 ~ doc 3 (chain of small edits); doc 4 unrelated
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),
      (3L, base + " tonight again"),
      (4L, "completely different content about databases and distributed query engines at scale")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhashLsh(docs, "doc_id", "text",
        shingleWidth = 2, numHashes = 16, bands = 8, threshold = 0.5)
      .select(col("id_a").cast("string").as("id_a"),
        col("id_b").cast("string").as("id_b"))
    val clusters = GraphAlgos.dedupClusters(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // all three near-dups collapse to keeper "1"; doc 4 absent (no pairs)
    assert(clusters.values.toSet == Set("1"))
    assert(clusters.keySet == Set("1", "2", "3"))
  }

  test("pageRankFixedPoint: hand-computed integer recurrence; 2-cycle is a fixed point") {
    // a→b, b→a, c→b; odeg all 1; unit 1e9, base 150000000
    // iter1: insum a=1e9, b=2e9, c=0 → r1 a=1e9, b=1.85e9, c=0.15e9
    // iter2: insum a=1.85e9, b=1.15e9, c=0
    //        → r2 a=1722500000, b=1127500000, c=150000000
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "b")).toDF("src", "dst")
    val r2 = GraphAlgos.pageRankFixedPoint(edges, iters = 2).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("nanorank")).toMap
    assert(r2 == Map("a" -> 1722500000L, "b" -> 1127500000L, "c" -> 150000000L),
      s"hand computation diverged: $r2")
    // a symmetric 2-cycle conserves mass exactly: rank 1.0 is a fixed
    // point of the integer recurrence (850/1000 of 1e9 is exact)
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r5 = GraphAlgos.pageRankFixedPoint(cyc, iters = 5).collect()
      .map(_.getAs[Long]("nanorank"))
    assert(r5.toSeq == Seq(1000000000L, 1000000000L), r5.mkString(","))
  }

  test("personalizedPageRankFixedPoint: mass starts and teleports only at seeds") {
    // path a→b→c, seed {a}:
    // r0: a=1e9, b=0, c=0
    // r1: a=base=0.15e9; b=floor(1e9·0.85)=0.85e9; c=0
    // r2: a=0.15e9; b=floor(0.15e9·0.85)=127500000; c=floor(0.85e9·0.85)=722500000
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("id")
    val r2 = GraphAlgos.personalizedPageRankFixedPoint(edges, seeds, iters = 2)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("nanorank")).toMap
    assert(r2 == Map(
      "a" -> 150000000L, "b" -> 127500000L, "c" -> 722500000L), s"$r2")
    // an isolated seed (not in the edge set) keeps exactly its base mass
    val iso = GraphAlgos.personalizedPageRankFixedPoint(
      edges, Seq("z").toDF("id"), iters = 3).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("nanorank")).toMap
    assert(iso("z") == 150000000L && iso("a") == 0L && iso("b") == 0L,
      s"isolated-seed case: $iso")
  }

  test("weightedPersonalizedPageRank: mass splits proportionally to integer weights") {
    // a→b (w=3), a→c (w=1), all seeds, one iteration:
    // shares: b = floor(1e9·3/4) = 750000000, c = floor(1e9/4) = 250000000
    // r1: a = base; b = base + floor(750000000·0.85) = 787500000;
    //     c = base + floor(250000000·0.85) = 362500000
    val e = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w")
    val all = Seq("a", "b", "c").toDF("id")
    val r1 = GraphAlgos.weightedPersonalizedPageRankFixedPoint(e, all, iters = 1)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("nanorank")).toMap
    assert(r1 == Map(
      "a" -> 150000000L, "b" -> 787500000L, "c" -> 362500000L), s"$r1")
    // zero-weight edges carry no mass and don't enter the denominator
    val e0 = Seq(("a", "b", 1L), ("a", "c", 0L)).toDF("src", "dst", "w")
    val z = GraphAlgos.weightedPersonalizedPageRankFixedPoint(e0, all, iters = 1)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("nanorank")).toMap
    assert(z("b") == 1000000000L && z("c") == 150000000L,
      s"zero-weight edge leaked mass or denominator: $z")
  }

  test("triangleStats: hand-computed census; orientation- and dup-insensitive") {
    // triangle a-b-c plus pendant c-d, fed in MIXED orientation with a
    // duplicate — canonicalization must absorb both
    val e = Seq(("a", "b"), ("c", "b"), ("a", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val r = GraphAlgos.triangleStats(e).collect()
      .map(x => x.getAs[String]("id") -> ((x.getAs[Long]("degree"),
        x.getAs[Long]("triangles"), x.getAs[Double]("clustering")))).toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(r == Map(
      "a" -> ((2L, 1L, 1.0)), "b" -> ((2L, 1L, 1.0)),
      "c" -> ((3L, 1L, r6(2.0 / 6.0))), "d" -> ((1L, 0L, 0.0))), s"$r")
  }

  test("kCore: cascading peel reaches the stable core") {
    // triangle a-b-c + path c-d-e: e (deg 1) peels, THEN d (deg drops
    // to 1) peels — the cascade needs two rounds; the 2-core is the
    // triangle with in-core degrees 2
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val core = GraphAlgos.kCore(e, k = 2).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("core_degree")).toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), s"$core")
    // k above the densest structure empties the graph
    assert(GraphAlgos.kCore(e, k = 3).count() == 0L)
  }

  test("kCore over the ANN-built similarity graph recovers planted clusters, peels noise") {
    // The one analytics deliberately NOT composed as an oracle query
    // (NEXT.md): natural mutual-KNN graphs have degenerate cores, so
    // the composition needs planted topology. Planted here: 12 tight
    // clusters (within-cluster cos ~ 0.9) plus 40 isotropic noise
    // singletons; the ANN graph (multi-table LSH, top-8 neighbors,
    // sim >= 0.5) gives cluster members in-cluster degree ~ 8 while
    // noise gets no qualifying edge at all — the 5-core must keep the
    // clusters and peel every noise point.
    import graft.operators.Ann
    val clusters = graft.tools.AnnGeomStudy.clusteredCorpus(
      spark, nClusters = 12, perCluster = 30, dim = 64, sigma = 0.25, seed = 42L)
    val noise = graft.tools.AnnGeomStudy.clusteredCorpus(
      spark, nClusters = 40, perCluster = 1, dim = 64, sigma = 0.25, seed = 99L)
      .select(concat(lit("n"), col("id")).as("id"), col("embedding"))
    val corpus = clusters.unionByName(noise)
    val q = corpus.select(col("id").as("qid"), col("embedding").as("qvec"))
    val edges = Ann.topKMultiTable(corpus, q, k = 9, dim = 64, nPlanes = 4, nTables = 8)
      .filter(col("qid") =!= col("id") && col("sim") >= 0.5)
      .select(least(col("qid"), col("id")).as("src"),
        greatest(col("qid"), col("id")).as("dst"))
      .distinct()
    val core = GraphAlgos.kCore(edges, k = 5, maxIter = 10).collect()
      .map(_.getAs[String]("id")).toSet
    val clusterIds = clusters.select("id").collect().map(_.getString(0)).toSet
    assert(core.forall(!_.startsWith("n")),
      s"noise must peel out of the 5-core: ${core.filter(_.startsWith("n"))}")
    val kept = core.intersect(clusterIds).size.toDouble / clusterIds.size
    info(f"5-core keeps ${kept * 100}%.1f%% of planted cluster members, 0 noise")
    assert(kept >= 0.9, f"planted clusters should survive the peel: $kept%.3f")
    // every planted cluster is represented in the core
    val coreClusters = core.map(_.take(5)).size
    assert(coreClusters == 12, s"all 12 clusters expected in core: $coreClusters")
    clusters.unpersist(); noise.unpersist()
  }

  test("labelPropagation: two bridged triangles resolve to two communities") {
    // triangles {a,b,c} and {d,e,f} with one bridge c-d: propagation
    // converges (within 5 rounds, traced by hand) to community "a" on
    // the left triangle and "c" on the right — the bridge alone can't
    // flip a triangle's majority
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")).toDF("src", "dst")
    val r = GraphAlgos.labelPropagation(e, maxIter = 5).collect()
      .map(x => x.getAs[String]("id") -> x.getAs[String]("community")).toMap
    assert(r == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "c", "e" -> "c", "f" -> "c"), s"$r")
  }

  test("labelPropagationWeighted: one strong tie outvotes two weak ones; unweighted tie-break differs") {
    // star x—a (w=1), x—b (w=5), x—c (w=1): round 1, x's neighbor labels
    // are their ids. Weighted: b's vote (5) wins. Unweighted: all votes
    // tie at 1 and the (count desc, label asc) tie-break picks "a" — the
    // two variants provably disagree on this input.
    val e = Seq(("x", "a", 1L), ("x", "b", 5L), ("x", "c", 1L))
      .toDF("src", "dst", "w")
    val wd = GraphAlgos.labelPropagationWeighted(e, maxIter = 1).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("community")).toMap
    assert(wd("x") == "b", s"$wd")
    val uw = GraphAlgos.labelPropagation(e.select("src", "dst"), maxIter = 1)
      .collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("community")).toMap
    assert(uw("x") == "a", s"$uw")
  }

  test("labelPropagationWeighted: non-positive weights carry no vote; all-dropped nodes vanish") {
    // y's only edge has w=0 → y is not in the graph at all; x—a (w=2)
    // still votes. Duplicate parallel edges collapse to max weight.
    val e = Seq(("x", "a", 2L), ("a", "x", 1L), ("x", "y", 0L), ("z", "x", -3L))
      .toDF("src", "dst", "w")
    val r = GraphAlgos.labelPropagationWeighted(e, maxIter = 1).collect()
      .map(x => x.getAs[String]("id")).toSet
    assert(r == Set("x", "a"), s"$r")
  }

  test("graph family degrades to empty on empty inputs — never throws") {
    val none = Seq.empty[(String, String)].toDF("src", "dst")
    assert(GraphAlgos.triangleStats(none).count() == 0L)
    assert(GraphAlgos.kCore(none, k = 2).count() == 0L)
    assert(GraphAlgos.labelPropagation(none).count() == 0L)
    assert(GraphAlgos.labelPropagationWeighted(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "w")).count() == 0L)
    assert(GraphAlgos.hitsFixedPoint(none).count() == 0L)
    assert(GraphAlgos.pageRankFixedPoint(none).count() == 0L)
  }

  test("k-core over the ANN graph recovers planted dense clusters (planted-topology composition)") {
    // q89's scaladoc documents why this composition degenerates on
    // NATURAL corpora: a KNN graph gives every node out-degree k, so
    // after symmetrization nobody falls below k and the k-core peels
    // nothing. The composition becomes discriminating with a similarity
    // threshold on the ANN edges — "dense semantic neighborhood" mining:
    // keep edges at cosine ≥ minSim, then k-core. Planted topology
    // (VERDICT r7 Missing #3): clusters of 30/12/5 members (σ=0.05,
    // within-cluster cos ≈ 0.995) + 60 scatter points. The 6-core must
    // keep exactly the two clusters with > 6 members: scatter loses its
    // (weak) edges to the threshold, and the 5-cluster — internally as
    // TIGHT as the big ones, so a pure threshold would keep it — has
    // only 4 strong neighbors per member and is peeled by the degree
    // rule. That separation is the k-core's discriminating action.
    import graft.operators.Ann
    val dim = 16
    val rng = new scala.util.Random(11)
    def unit(raw: Array[Double]): Seq[Float] = {
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat).toSeq
    }
    def cluster(tag: String, m: Int): Seq[(String, Seq[Float])] = {
      val c = Array.fill(dim)(rng.nextGaussian())
      Seq.tabulate(m)(i =>
        (s"${tag}_$i", unit(c.map(_ + 0.05 * rng.nextGaussian()))))
    }
    val a = cluster("a", 30)
    val b = cluster("b", 12)
    val tiny = cluster("t", 5)
    val scatter = Seq.tabulate(60)(i =>
      (s"s_$i", unit(Array.fill(dim)(rng.nextGaussian()))))
    val docs = (a ++ b ++ tiny ++ scatter).toDF("id", "embedding")
    val qs = docs.select(col("id").as("qid"), col("embedding").as("qvec"))
    // k = 7 because rank 1 is the query itself (the F5 self-match): 6
    // real neighbors per node keeps min out-degree at the core
    // threshold — with only 5, boundary nodes dip below 6 and the peel
    // CASCADES the whole cluster away (measured: core = ∅)
    val edges = Ann.topKMultiTable(docs, qs, k = 7, dim = dim,
        nPlanes = 4, nTables = 8)
      .filter(col("qid") =!= col("id"))
      .groupBy(least(col("qid"), col("id")).as("src"),
        greatest(col("qid"), col("id")).as("dst"))
      .agg(max(col("sim")).as("sim"))
    val strong = edges.filter(col("sim") >= 0.8)
    val core = GraphAlgos.kCore(strong, k = 6).collect()
      .map(_.getAs[String]("id")).toSet
    val want = (a ++ b).map(_._1).toSet
    assert(core == want,
      s"6-core should be exactly the 30- and 12-clusters; " +
        s"missing=${want -- core}, extra=${core -- want}")
    // and the threshold alone would NOT have discriminated: the tiny
    // cluster's internal edges survive it
    val tinyStrong = strong.filter(col("src").startsWith("t_")).count()
    assert(tinyStrong > 0, "tiny cluster must keep strong edges pre-peel")
  }

  test("hitsFixedPoint: hand-computed hubs/authorities with max-normalization") {
    // a→c, b→c, c→d; one iteration:
    // a-raw: c = 2e6, d = 1e6 → max-norm: c = 1e6, d = 5e5
    // h-raw: a = a(c) = 1e6, b = 1e6, c = a(d) = 5e5 → max-norm keeps them
    val e = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val r = GraphAlgos.hitsFixedPoint(e, iters = 1).collect()
      .map(x => x.getAs[String]("id") ->
        ((x.getAs[Long]("hub"), x.getAs[Long]("authority")))).toMap
    assert(r == Map(
      "a" -> ((1000000L, 0L)), "b" -> ((1000000L, 0L)),
      "c" -> ((500000L, 1000000L)), "d" -> ((0L, 500000L))), s"$r")
  }
}
