package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Hash-based curation sampling: the property RNG sampling cannot give —
  * the SAME selected set under any partitioning — plus rate accuracy,
  * quota enforcement, and the map-side WindowGroupLimit plan shape. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i =>
    (i, if (i % 3 == 0) "en" else "de")).toDF("doc_id", "lang")

  test("sample set is identical under repartitioning (reproducibility)") {
    val a = Curation.sampleByHash(docs, "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleByHash(docs.repartition(17), "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = Curation.sampleByHash(docs.coalesce(1), "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && b == c, "selection must not depend on partitioning")
    // uniform hash: 30% +- a few points on 2000 rows
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate off: ${a.size}")
    // the complement predicate is the holdout: disjoint and exhaustive
    val holdout = docs.filter(Curation.hashScore(col("doc_id")) >= 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((a & holdout).isEmpty && a.size + holdout.size == 2000)
  }

  test("hashSplit: deterministic, content-keyed (exact dups co-locate), ratios sane") {
    val docs = (1L to 400L).map(i => (i, s"document body number ${i % 350}"))
      .toDF("doc_id", "text") // ids 351..400 duplicate the text of 1..50
    val a = Curation.hashSplit(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("bucket"), r.getAs[String]("split")))).toMap
    // stable under repartitioning AND re-evaluation
    val b = Curation.hashSplit(docs.repartition(13), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("bucket"), r.getAs[String]("split")))).toMap
    assert(a == b, "split must not depend on partitioning")
    // content-keyed: byte-identical dups land in the same split
    for (i <- 1L to 50L)
      assert(a(i) == a(i + 350), s"dup pair ($i, ${i + 350}) split apart")
    // 80/10/10 thresholds hold approximately on the 350 distinct texts
    val bySplit = a.groupBy(_._2._2).view.mapValues(_.size).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
      s"train must dominate an 80/10/10 split: $bySplit")
    assert(Set("train", "val", "test") == bySplit.keySet)
    // bucket range contract
    assert(a.values.forall { case (bk, _) => bk >= 0 && bk < 100 })
  }

  test("leakFreeSplit: every cluster member inherits the keeper's split") {
    val clusters = Seq( // three clusters incl. a 3-member chain
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("id", "keeper")
    val got = Curation.leakFreeSplit(clusters).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("keeper"), r.getAs[String]("split")))).toMap
    val byKeeper = got.values.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byKeeper.values.forall(_.size == 1),
      s"every member must share its keeper's split: ${byKeeper.toMap}")
    // and the keeper's split equals what hashing the keeper id gives
    for ((id, (keeper, split)) <- got) assert(got(keeper)._2 == split, s"$id")
  }

  test("per-group quota caps each group; plan uses WindowGroupLimit") {
    val capped = Curation.capPerGroup(docs, "doc_id", "lang", quota = 50)
    val byLang = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 50L, "de" -> 50L), byLang.toString)
    // deterministic: same 50 under different partitioning
    val again = Curation.capPerGroup(docs.repartition(13), "doc_id", "lang", 50)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"quota filter should prune map-side:\n$p")
  }

  test("budgetedMixture: budgets respected, unlisted sources dropped, deterministic, maximal") {
    import graft.functions.TextFunctions.tokenCount
    // 30 docs over 3 sources; doc i carries (i % 7 + 1) tokens
    val docs = (1 to 30)
      .map(i => (i.toLong, s"src${i % 3}", ("w " * (i % 7 + 1)).trim))
      .toDF("doc_id", "source", "text")
    val budgets = Map("src0" -> 10L, "src1" -> 5L) // src2 unlisted
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.budgetedMixture(
        d, "doc_id", "source", tokenCount(col("text")), budgets)
    val rows = run(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    // unlisted source contributes nothing
    assert(!rows.exists(_._1 == "src2"))
    // per-source token totals stay within budget, and something is kept
    val bySource = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySource.nonEmpty)
    bySource.foreach { case (s, tot) =>
      assert(tot <= budgets(s), s"$s over budget: $tot > ${budgets(s)}") }
    // maximal prefix: each source's docs sum to more than its budget
    // (10 docs × ≥1 token ≥ 10 > 5), so every listed source must have
    // dropped docs — and the last kept cum must equal the source total
    assert(rows.groupBy(_._1).forall { case (s, rs) => rs.length < 10 })
    rows.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._4).max == bySource(s)) }
    // identical set under repartitioning (hash order, not physical order)
    val again = run(docs.repartition(7)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    assert(rows.toSet == again.toSet)
  }

  test("weighted systematic sample: PPS invariants + partitioning independence") {
    val weighted = (1L to 400L).map(i => (i, 1L + (i * 7) % 50))
      .toDF("id", "w")
    val k = 10
    val picked = Curation.weightedSystematicSample(weighted, "id", "w", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // local reference: cumulative weights in id order, step = total div k,
    // selected iff (cum - w, cum] contains a multiple of step
    val rows = (1L to 400L).map(i => (i, 1L + (i * 7) % 50))
    val total = rows.map(_._2).sum
    val step = total / k
    var cum = 0L
    val expected = rows.flatMap { case (id, w) =>
      cum += w
      val tile = cum / step
      if (tile > (cum - w) / step) Some((id, w, cum, tile)) else None
    }
    assert(picked.sortBy(_._1).toSeq == expected,
      s"picked=${picked.toSeq} expected=$expected")
    // ~k rows out; every row heavier than step is guaranteed in
    assert(math.abs(picked.length - k) <= 1)
    spark.sharedState.cacheManager.clearCache()
    // same set under adversarial input partitioning
    val again = Curation.weightedSystematicSample(
        weighted.repartition(13), "id", "w", k)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == picked.map(_._1).toSet,
      "selection must not depend on input partitioning")
    spark.sharedState.cacheManager.clearCache()
  }
}
