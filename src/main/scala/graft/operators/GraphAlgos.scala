package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame joins — no GraphX dependency,
  * same join-per-superstep structure (SURVEY.md §7.3: traversal =
  * iterative self-joins).
  */
object GraphAlgos {

  /** Result of [[connectedComponentsWithStats]]: converged labels plus
    * the superstep count actually run (specs and ScaleProbe assert the
    * count grows ~log, not linear, in graph diameter). */
  final case class CcResult(labels: DataFrame, iterations: Int, converged: Boolean)

  /** Connected components by min-label propagation WITH pointer doubling
    * (the Shiloach–Vishkin hybrid): every node starts labeled with
    * itself; each superstep first takes the min label among itself and
    * its neighbors (the "hop"), then shortcuts through the label graph —
    * `component := component's component` (the "jump"). The hop moves
    * min-label information one edge per step; the jump compounds paths
    * through already-labeled nodes, so the distance covered per node
    * roughly DOUBLES each superstep (measured on an n-node chain:
    * 2, 6, 14, 30, … ≈ 2^(k+1)−2 after k supersteps) — convergence in
    * O(log diameter), not O(diameter).
    *
    * Why not plain min-propagation (the round-≤10 implementation): it
    * converges in O(diameter) supersteps, and its own defense ("near-dup
    * clusters have tiny diameters") is exactly what breaks on a
    * template-heavy crawl where evolving boilerplate forms long near-dup
    * CHAINS — a diameter-10³ chain needs 10³ joins, and a capped run
    * returns silently fragmented components (= kept duplicates).
    * Pointer doubling turns that 10³ into ~11, and the unconverged exit
    * now FAILS LOUD (below) instead of returning fragments.
    *
    * Invariants (both hold inductively, any orderable id type):
    *  - component(id) ≤ id, so the jump join `a.component = b.id` always
    *    matches (every label value is itself a labeled node) — no row
    *    loss, no outer join needed;
    *  - component(id) is reachable from id, so labels never escape the
    *    true component; the min over a component is its fixed point.
    *
    * Scale notes: each superstep is one join of labels against the
    * symmetric edge view + a min-aggregation + one self-join (the jump)
    * — all shuffle on node id, so co-partitioning (bucketing by id)
    * makes supersteps exchange-free. The per-superstep label frame is
    * `localCheckpoint`ed, NOT merely persisted: persist caches data but
    * keeps the compounded logical plan, which grows exponentially across
    * supersteps until plan stringification alone OOMs (hit in testing at
    * ~10 iterations) — lineage truncation is mandatory for iterative
    * DataFrame algorithms.
    *
    * @param edges undirected (src, dst) pairs
    * @param maxIter superstep cap; with doubling, 30 covers diameters
    *   beyond 2³⁰ — hitting it means a genuinely pathological input,
    *   and the unconverged exit throws (fail-loud) rather than
    *   returning fragmented labels
    * @return (id, component) — component = min node id reachable
    * @throws IllegalStateException if labels were still changing when
    *   maxIter was exhausted (use [[connectedComponentsWithStats]] to
    *   inspect instead of throwing)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val r = connectedComponentsWithStats(edges, maxIter)
    if (!r.converged)
      throw new IllegalStateException(
        s"connectedComponents: labels still changing after $maxIter " +
          "supersteps — refusing to return fragmented components " +
          "(raise maxIter or use connectedComponentsWithStats)")
    r.labels
  }

  /** [[connectedComponents]] exposing (labels, iterations, converged)
    * instead of throwing — the spec/ScaleProbe surface. Iterations
    * counts supersteps run INCLUDING the final no-change confirm pass. */
  def connectedComponentsWithStats(edges: DataFrame, maxIter: Int = 30): CcResult = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint()
    var ck = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var labels = ck
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      // hop: min over own label and all neighbors' labels. The node's
      // OWN row additionally carries its previous label (`_prev` — null
      // on neighbor rows, so max() recovers the single self value),
      // which rides through the jump and makes the convergence check a
      // narrow filter over the already-checkpointed superstep result
      // instead of a third shuffle-join job per superstep (optimization
      // guide §2.4 — the check re-joined next against labels on id,
      // one full exchange per superstep just to ask "did anything
      // move?").
      val neighborLabels = sym.as("e")
        .join(labels.as("l"), col("e.u") === col("l.id"))
        .select(col("e.v").as("id"), col("l.component"))
      // hop stays LAZY (r18 verdict #7: one materialization per
      // superstep, not two): the jump shortcuts through the PREVIOUS
      // round's checkpointed labels instead of through hop itself, so
      // hop is consumed exactly once and the whole superstep lands in
      // a single localCheckpoint. Reach analysis: hop extends the
      // previous reach by one edge, the jump composes with the previous
      // round's pointers — r_k = 2·r_{k−1} + 1 = 2^k − 1, still
      // doubling (the two-checkpoint form's 2^{k+1} − 2 costs one
      // superstep less but materializes twice per step). Joining hop
      // (a union plan) against the checkpointed labels is the same
      // shape as neighborLabels above — the Catalyst Union-constraint
      // self-join rewrite hazard needs BOTH sides to be the union.
      val hop = labels
        .select(col("id"), col("component"), col("component").as("_prev"))
        .unionByName(neighborLabels
          .select(col("id"), col("component"),
            lit(null).cast(labels.schema("component").dataType).as("_prev")))
        .groupBy("id")
        .agg(min("component").as("component"), max("_prev").as("_prev"))
      // jump: component := previous round's component(component). Inner
      // join is safe: every component value is a node id present in
      // labels (invariant above), and comp(comp) ≤ comp keeps the
      // result monotone.
      val next = hop.as("a")
        .join(labels.as("b"), col("a.component") === col("b.id"))
        .select(col("a.id"), col("b.component").as("component"),
          col("a._prev").as("_prev"))
        .localCheckpoint() // truncate lineage (see scaladoc)
      // in-memory scan of the checkpointed frame — no join, no exchange
      val changed = next
        .filter(col("component") =!= col("_prev"))
        .limit(1).count()
      converged = changed == 0
      // the previous round's checkpoint is dead once next landed —
      // free its blocks instead of waiting for the ContextCleaner
      graft.CacheScope.freeLocalCheckpoint(ck)
      ck = next
      labels = next.select("id", "component")
      i += 1
    }
    CcResult(labels, i, converged)
  }

  /** Dedup-cluster resolution: near-dup pairs (id_a, id_b) → one keeper
    * per connected component (min id — the reference's first-wins rule
    * generalized transitively). Returns (id, keeper, is_keeper).
    *
    * Oracle note (q48): the engine runs to CONVERGENCE (fail-loud
    * otherwise), so the DuckDB mirror states converged semantics
    * directly — min reachable id via a recursive reachability CTE
    * ([[graft.OracleSql.ccConverged]]) — with no superstep-count
    * coupling between the two sides at all. */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")), maxIter)
      .select(col("id"), col("component").as("keeper"),
        (col("id") === col("component")).as("is_keeper"))

  /** PageRank in FIXED-POINT integer arithmetic — authority scoring for
    * the semantic graph (importance-weighted retrieval, crawl-frontier
    * prioritization), built determinism-first.
    *
    * Why fixed-point: float PageRank sums neighbor contributions, and
    * float addition is order-dependent — across engines (or even across
    * partitionings) the last ulp differs, the difference compounds over
    * iterations, and no final rounding can repair intermediate
    * divergence, so an exact-hash oracle would be unsound. Integer
    * sums are exact and order-free: ranks live in units of 1e-9
    * ("nanorank", Long — a rank mass of N×1e9 for N up to ~2^33 nodes
    * fits with headroom), per-edge contribution is rank DIV out-degree
    * (remainder deliberately dropped — documented leak, identical on
    * both sides), and damping is (850 × sum) DIV 1000. Every op is
    * integer multiply/divide/sum, bit-identical on any engine; the
    * mirror unrolls the same fixed iteration count (same idea as
    * [[connectedComponents]]'s q48 oracle).
    *
    * Scale shape: per iteration one join of ranks against the out-edge
    * list + one sum-by-dst — both shuffle on node id (bucketing by id
    * makes supersteps exchange-free); `localCheckpoint` per superstep
    * truncates lineage (mandatory for iterative DataFrames). Dangling
    * nodes (no out-edges) leak their mass like the dropped remainders —
    * the standard simplification; redistribute if sums must be
    * conserved.
    *
    * @param edges directed (src, dst) pairs
    * @param iters fixed iteration count (mirror must unroll the same)
    * @return (id, nanorank) — Long fixed-point rank per node */
  def pageRankFixedPoint(
      edges: DataFrame, iters: Int = 5, dampingPermille: Int = 850): DataFrame = {
    // uniform PageRank IS personalized PageRank with every node a seed
    // (per-node unit mass convention, so the delegation is exact)
    val e = edges.select(col("src"), col("dst"))
    val all = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    personalizedPageRankFixedPoint(edges, all, iters, dampingPermille)
  }

  /** Personalized PageRank, same fixed-point integer recurrence as
    * [[pageRankFixedPoint]] but with teleport mass concentrated on
    * `seeds`: init rank = unit for seeds / 0 elsewhere, and the
    * per-iteration base term goes only to seeds. The retrieval-side
    * variant — authority RELATIVE to a query's seed set (expansion
    * re-ranking, related-document discovery) rather than global.
    *
    * @param seeds one `id` column; nodes absent from the edge set still
    *              hold their seed mass (isolated seeds keep base) */
  def personalizedPageRankFixedPoint(
      edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, dampingPermille: Int = 850): DataFrame =
    // unit edge weight: share = floor(rank·1 / Σ1) = floor(rank/odeg),
    // numerically identical to the unweighted recurrence
    weightedPersonalizedPageRankFixedPoint(
      edges.select(col("src"), col("dst"), lit(1L).as("w")),
      seeds, iters, dampingPermille)

  /** Synchronous label-propagation community detection (LPA): every
    * node starts labeled with itself; each round it adopts the most
    * frequent label among its NEIGHBORS, ties to the smallest label —
    * communities over a similarity graph (cluster-aware sampling,
    * near-dup families beyond pairwise transitive closure, topic-ish
    * grouping without embeddings math).
    *
    * Fully deterministic and engine-exact: counts are integers, the
    * argmax is a (count desc, label asc) row_number, isolated nodes
    * keep their label. Synchronous LPA can oscillate on bipartite-ish
    * structure — with a FIXED round count both engines oscillate
    * identically, and the early convergence stop is safe by the q48
    * argument (a converged labeling is a fixed point of the round).
    *
    * Scale: per round one edge⋈label join + a (node, label)-keyed
    * count + a node-windowed argmax (WindowGroupLimit prunes map-side);
    * localCheckpoint per round.
    *
    * @param edges undirected pairs, any orientation/dup form
    * @return (id, community) after the final round */
  def labelPropagation(edges: DataFrame, maxIter: Int = 5): DataFrame =
    // unweighted LPA IS weighted LPA with unit weights: Σ1 over
    // neighbor labels ≡ the neighbor-label count, identical argmax
    labelPropagationWeighted(
      edges.select(col("src"), col("dst"), lit(1L).as("w")), maxIter)

  /** Weighted LPA: each neighbor's vote counts its edge weight — over a
    * similarity graph, a few strong ties outvote many weak ones (the
    * variant that respects score magnitude the way [[labelPropagation]]
    * respects only topology). Weights must be positive INTEGERS
    * (callers quantize float similarities to milli-weights, the
    * [[weightedPersonalizedPageRankFixedPoint]] convention): integer
    * sums are order-free, so the per-round argmax — (Σw desc, label
    * asc) — is exact on any engine and the oracle can unroll the same
    * fixed rounds. Zero/negative weights are dropped (they carry no
    * vote); parallel duplicate edges collapse to their max weight.
    *
    * @param edges (src, dst, w: Long) undirected, any orientation/dup form
    * @return (id, community) after the final round */
  def labelPropagationWeighted(edges: DataFrame, maxIter: Int = 5): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w").cast("long").as("w"))
      .filter(col("a") =!= col("b") && col("w") > 0)
      .groupBy("a", "b").agg(max("w").as("w"))
    val sym = canon.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint()
    val nodes = sym.select(col("u").as("id")).distinct().localCheckpoint()
    var ck = nodes.withColumn("label", col("id")).localCheckpoint()
    var labels = ck
    var converged = false
    var i = 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("c").desc, col("label"))
    while (i < maxIter && !converged) {
      val adopted = sym.as("e")
        .join(labels.as("l"), col("e.v") === col("l.id"))
        .select(col("e.u").as("id"), col("l.label"), col("e.w"))
        .groupBy("id", "label").agg(sum("w").as("c"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select("id", "label")
      // the round's join already has the previous label in hand (_old):
      // carry it into the checkpoint so the convergence check is a
      // narrow in-memory filter, not another id-keyed join job per
      // round (optimization guide §2.4)
      val next = nodes
        .join(adopted.withColumnRenamed("label", "_new"), Seq("id"), "left")
        .join(labels.withColumnRenamed("label", "_old"), Seq("id"))
        .select(col("id"), coalesce(col("_new"), col("_old")).as("label"),
          col("_old"))
        .localCheckpoint()
      converged = next
        .filter(col("label") =!= col("_old")).limit(1).count() == 0
      // free the superseded round's checkpoint blocks eagerly
      graft.CacheScope.freeLocalCheckpoint(ck)
      ck = next
      labels = next.select("id", "label")
      i += 1
    }
    labels.select(col("id"), col("label").as("community"))
  }

  /** K-core decomposition: iteratively peel nodes of degree < k until
    * the remainder is stable — the standard graph-cleanup primitive
    * (keep the densely-connected core of a similarity graph, drop
    * tendrils and near-isolated noise before clustering or ranking).
    *
    * Shape per round: degree aggregation + two semi-joins restricting
    * edges to surviving endpoints, all node-keyed; `localCheckpoint`
    * per round (iterative-DataFrame rule). Early convergence stop is
    * oracle-safe by the q48 argument: peeling is monotone and
    * idempotent at its fixed point, so "stopped when stable" equals
    * "ran all maxIter rounds" whenever convergence happens in time.
    *
    * @param edges undirected pairs, any orientation/dup form
    * @return (id, core_degree) — nodes of the k-core with their degree
    *         WITHIN the core */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 10): DataFrame = {
    require(k >= 1)
    var live = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val deg = live.select(col("a").as("id"))
        .unionByName(live.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("id").localCheckpoint()
      val next = live
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
      converged = next.count() == live.count()
      live = next
      i += 1
    }
    live.select(col("a").as("id"))
      .unionByName(live.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
  }

  /** Per-node triangle count + local clustering coefficient — the
    * graph-quality signals (spam rings and boilerplate clusters are
    * triangle-dense; genuine topical neighborhoods cluster midway;
    * scraped link farms barely at all).
    *
    * Shape: canonical edges (src < dst) self-joined twice —
    * (a,b) ⋈ (b,c) ⋈ (a,c) with a < b < c finds every triangle exactly
    * once; per-node counts come from exploding the triangle's three
    * corners. All joins are node-keyed equi-joins; the classic skew
    * trap (hub nodes) is bounded because the wedge join builds only on
    * ordered pairs (each wedge is counted at its middle vertex once).
    * Everything integer except the coefficient = 2·t / (deg·(deg−1)),
    * one portable-rounded division.
    *
    * @param edges undirected (src, dst) pairs, any orientation/dup form
    * @return (id, degree, triangles, clustering) */
  def triangleStats(edges: DataFrame): DataFrame = {
    // canonicalize: undirected edge set with src < dst, deduped
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .transform(graft.CacheScope.pin) // three joins + degrees read it
    val tri = canon.as("e1")
      .join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .join(canon.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          graft.functions.PortableMath.rnd(
            lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double") /
              (col("degree").cast("double") * (col("degree").cast("double") - lit(1.0))), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** HITS hubs/authorities in fixed-point integer arithmetic — the
    * second classic authority model next to PageRank: authority(v) =
    * Σ hub(u) over in-edges, hub(u) = Σ authority(v) over out-edges,
    * max-normalized each half-step. For the semantic graph: authorities
    * = documents many well-connected docs point at, hubs = docs whose
    * neighborhoods cover the authorities (both useful as retrieval
    * priors; directions matter on ingest edges: query-doc → stored-doc).
    *
    * Fixed-point design (same reasoning as [[pageRankFixedPoint]]):
    * scores live in MICRO units (1e6) so sums are exact Longs; each
    * half-step renormalizes x → floor(x·1e6 / max x), keeping scores in
    * [0, 1e6] — the float algorithm's L2 norm is replaced by max-norm,
    * which is division-free up to one scalar (a broadcast 1-row agg)
    * and keeps every operation integer, hence order-free and exactly
    * mirrorable. Overflow envelope: raw sums ≤ 1e6·maxDegree and the
    * normalization multiply ≤ 1e12·maxDegree — exact in Long AND under
    * 2^53 while maxDegree < ~9e3 at micro scale; drop the unit for
    * denser graphs.
    *
    * @param edges directed (src, dst)
    * @return (id, hub, authority) — micro-unit Longs, max = 1e6 */
  def hitsFixedPoint(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1)
    val unit = 1000000L
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    var hub = nodes.withColumn("h", lit(unit)).localCheckpoint()
    var auth = nodes.withColumn("a", lit(unit)).localCheckpoint()
    def normalized(raw: DataFrame, c: String): DataFrame = {
      // max over a non-empty frame (nodes exist whenever edges do);
      // raw is all-zero only on a degenerate empty graph — guarded by
      // greatest(max, 1) so the division is total
      val mx = raw.agg(greatest(max(col(c)), lit(1L)).as("_mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("id"), floor(col(c) * lit(unit) / col("_mx")).cast("long").as(c))
    }
    for (_ <- 1 to iters) {
      val aRaw = nodes.join(
          e.join(hub.select(col("id").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("a")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("a"), lit(0L)).as("a"))
      auth = normalized(aRaw, "a").localCheckpoint()
      val hRaw = nodes.join(
          e.join(auth.select(col("id").as("dst"), col("a")), Seq("dst"))
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("h")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0L)).as("h"))
      hub = normalized(hRaw, "h").localCheckpoint()
    }
    hub.join(auth, Seq("id"))
      .select(col("id"), col("h").as("hub"), col("a").as("authority"))
  }

  /** The general core: weighted, personalized, fixed-point PageRank.
    * Transition mass splits proportionally to INTEGER edge weights:
    * share(s→t) = floor(rank(s) · w(s→t) / W(s)), W(s) = Σ out-weights —
    * for the semantic graph, similarity-proportional authority flow
    * (callers quantize float scores to milli-weights; the quantization
    * is the documented semantic, not a shortcut, because only integer
    * weights keep every sum order-free and the oracle exact). Zero- or
    * negative-weight edges are dropped up front: they carry no mass and
    * a zero W(s) would be a division by zero.
    *
    * Overflow envelope: rank·w stays under 2^53 (exact double division)
    * while total-mass × max-weight < 9e15 — e.g. milli-weights support
    * ~9T nanorank total ≈ 9000 unit-mass nodes per connected region at
    * full concentration; drop `unit` or the weight scale for more. */
  def weightedPersonalizedPageRankFixedPoint(
      edges: DataFrame, // (src, dst, w: Long > 0)
      seeds: DataFrame,
      iters: Int = 5, dampingPermille: Int = 850): DataFrame = {
    require(iters >= 0 && dampingPermille >= 0 && dampingPermille <= 1000)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .filter(col("w") > 0)
      .localCheckpoint()
    val seedIds = seeds.select(col("id")).distinct()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .unionByName(seedIds)
      .distinct()
      .join(seedIds.withColumn("_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_seed"), lit(false)).as("is_seed"))
      .localCheckpoint()
    val outW = e.groupBy("src").agg(sum(col("w")).as("ow")).localCheckpoint()
    val unit = 1000000000L // 1.0 of rank mass in nanorank
    val d = dampingPermille.toLong
    val base = unit - unit * d / 1000
    var ranks = nodes.select(col("id"),
      when(col("is_seed"), lit(unit)).otherwise(lit(0L)).as("nanorank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ranks.join(outW, col("id") === col("src"))
        .join(e, Seq("src"))
        // integer division: per-edge share in nanorank; remainder drops
        .select(col("dst").as("id"),
          floor(col("nanorank") * col("w") / col("ow")).cast("long").as("share"))
        .groupBy("id").agg(sum(col("share")).as("insum"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            floor(coalesce(col("insum"), lit(0L)) * d / lit(1000L)).cast("long"))
            .as("nanorank"))
        .localCheckpoint() // truncate lineage per superstep
    }
    ranks
  }
}
