package graft

import graft.operators.{Curation, Dedup, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Contract tests for the round-8 pipeline additions: the hashed linear
  * quality classifier (q122), seeded shuffle/sharding (q123), within-doc
  * repeated-unit removal (q124), and the ordered event funnel (q125). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side mirror of HashFunctions.hash60 (md5 first 15 hex → long). */
  private def hash60jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("hashedLinearClassifier: single-token doc scores exactly its bucket weight") {
    val ws = TextAnalysis.ClassifierWeightsMicro
    val docs = Seq((1L, "hello"), (2L, "world"), (3L, ""), (4L, "hello hello"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearClassifier(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("score"),
          r.getAs[String]("band")))).toMap
    def expected(tok: String): Double = {
      val w = ws((hash60jvm(tok) % ws.length).toInt)
      math.rint(w.toDouble / 1e6 * 1e6) / 1e6
    }
    assert(got(1L)._1 == 1L && got(1L)._2 == expected("hello"))
    assert(got(2L)._2 == expected("world"))
    assert(got(3L) == ((0L, 0.0, "drop")), "empty doc lands in drop at 0.0")
    // mean pooling: two copies of one token = the same score as one
    assert(got(4L)._1 == 2L && got(4L)._2 == got(1L)._2)
  }

  test("hashedLinearClassifier: bands are thresholds on the rounded score") {
    // force scores via single-token docs whose bucket weights we know
    val ws = TextAnalysis.ClassifierWeightsMicro
    val docs = Seq.tabulate(200)(i => (i.toLong, s"tok$i")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearClassifier(docs, "doc_id", "text").collect()
    got.foreach { r =>
      val s = r.getAs[Double]("score")
      val b = r.getAs[String]("band")
      val want = if (s > 0.05) "keep" else if (s < -0.05) "drop" else "review"
      assert(b == want, s"score $s banded $b, want $want")
    }
    // the frozen weights must actually populate more than one band
    assert(got.map(_.getAs[String]("band")).toSet.size >= 2)
  }

  test("seededShuffle: deterministic, partitioning-independent, round-robin formula holds") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
    val a = Curation.seededShuffle(docs, "doc_id", "graft", 8)
      .orderBy("shard", "pos").collect()
    val b = Curation.seededShuffle(docs.repartition(7), "doc_id", "graft", 8)
      .orderBy("shard", "pos").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "order must not depend on input partitioning")
    // per-shard positions are contiguous from 1
    a.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (1L to rows.length.toLong).toSeq, s"shard $sh positions not contiguous")
    }
    // global_pos = (pos-1)*n + shard, and is collision-free
    assert(a.forall(r => r.getAs[Long]("global_pos") ==
      (r.getAs[Long]("pos") - 1) * 8 + r.getAs[Long]("shard")))
    assert(a.map(_.getAs[Long]("global_pos")).distinct.length == a.length)
    // a different seed produces a different order
    val c = Curation.seededShuffle(docs, "doc_id", "other", 8)
      .orderBy("shard", "pos").collect()
    assert(c.map(_.getAs[Long]("id")).toSeq != a.map(_.getAs[Long]("id")).toSeq)
  }

  test("intraDocDedup: keeps first occurrence in order, reports removal count") {
    val docs = Seq(
      (1L, "alpha\n\nbeta\n\nalpha\n\ngamma"), // one repeat
      (2L, "solo"),                            // nothing to remove
      (3L, "x\n\nx\n\nx\n\nx"),                // three repeats
      (4L, "")                                 // no units at all
    ).toDF("doc_id", "text")
    val got = Dedup.intraDocDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_units"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("cleaned_len"), r.getAs[String]("cleaned_hash")))).toMap
    def h(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((4L, 1L, 18L, h("alpha\n\nbeta\n\ngamma"))))
    assert(got(2L) == ((1L, 0L, 4L, h("solo"))))
    assert(got(3L) == ((4L, 3L, 1L, h("x"))))
    assert(!got.contains(4L), "empty doc has no units, no row")
  }

  test("cmsHeavyHitters: estimates never undercount; exact when collision-free") {
    // "alpha" x5, "beta" x3, "gamma" x2 — wide sketch (256 cols, 4 rows)
    // cannot collide 3 tokens in every row, so all estimates are exact
    val docs = Seq((1L, ("alpha " * 5) + ("beta " * 3) + ("gamma " * 2)))
      .toDF("doc_id", "text")
    val got = graft.operators.Sketches
      .cmsHeavyHitters(docs, "text", depth = 4, width = 256, topK = 10)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"),
          r.getAs[Long]("overestimate")))).toMap
    assert(got == Map(
      "alpha" -> ((5L, 5L, 0L)), "beta" -> ((3L, 3L, 0L)),
      "gamma" -> ((2L, 2L, 0L))))
    // width 1 forces total collision: every estimate = total token mass
    val crushed = graft.operators.Sketches
      .cmsHeavyHitters(docs, "text", depth = 2, width = 1, topK = 10)
      .collect()
    crushed.foreach { r =>
      assert(r.getAs[Long]("cms_n") == 10L,
        s"width-1 sketch must report the full mass: $r")
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"))
    }
  }

  test("ksDrift: hand-computed D and argmax tie-break; identical slices drift 0") {
    val docs = Seq(
      ("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)
    ).toDF("source", "x").withColumn("doc_id", lit(0L))
    val r = TextAnalysis.ksDrift(docs, "source", "a", "b", col("x")).collect()(0)
    // support {1,2,3}: F_a = .5, 1, 1; F_b = 0, .5, 1 → D=.5 at x∈{1,2},
    // smallest-x tie-break → 1
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("ks_d") == 0.5 && r.getAs[Long]("x_at_max") == 1L)
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L))
      .toDF("source", "x")
    val r2 = TextAnalysis.ksDrift(same, "source", "a", "b", col("x")).collect()(0)
    assert(r2.getAs[Double]("ks_d") == 0.0)
  }

  test("embeddingOutliers: junk vector flags, centroid-aligned vectors do not") {
    import graft.operators.Ann
    val dim = 8
    // 12 vectors sitting ON centroids (cos 1.0 to their own cluster)
    // plus one junk vector built to be far from every centroid — its
    // max-centroid-cosine sits far below the corpus norm
    val aligned = (0 until 12).map(i =>
      (i.toLong, Ann.centroidVector(i % 4, dim).toSeq))
    // orthogonalize a probe against all 4 centroids (Gram-Schmidt) —
    // max cosine ≈ 0 where everyone else scores 1.0
    val cents = (0 until 4).map(j => Ann.centroidVector(j, dim).map(_.toDouble))
    var probe = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.0)
    cents.foreach { c =>
      val d = probe.zip(c).map { case (a, b) => a * b }.sum
      probe = probe.zip(c).map { case (a, b) => a - d * b }
    }
    val nrm = math.sqrt(probe.map(x => x * x).sum)
    val junk = (99L, probe.map(x => (x / nrm).toFloat).toSeq)
    val df = (aligned :+ junk).toDF("id", "v")
    val got = graft.operators.Curation
      .embeddingOutliers(df, "id", "v", dim, 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("score"), r.getAs[Double]("z"),
          r.getAs[Boolean]("outlier")))).toMap
    assert(got(99L)._1 < 0.5 && got(99L)._3,
      s"junk vector must flag: ${got(99L)}")
    aligned.foreach { case (i, _) =>
      assert(got(i)._1 > 0.999 && !got(i)._3, s"id $i: ${got(i)}")
    }
  }

  test("eventSpikes: burst hour flags, uniform type does not, zero-variance type reports z=0") {
    val H = 3600000000L
    val burst = (0 until 4).map(h => ("burst", h * H + 5L)) ++ // 1/hour
      Seq.fill(20)(("burst", 4 * H + 5L))                      // 20 in hour 4
    val flat = (0 until 5).map(h => ("flat", h * H + 5L))      // 1/hour always
    val ev = (burst ++ flat).toDF("event_type", "tus")
    val got = graft.operators.Relational.eventSpikes(ev, zFlag = 2.0)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("z"), r.getAs[Boolean]("spike")))).toMap
    assert(got(("burst", 4L))._1 == 20L && got(("burst", 4L))._3,
      s"burst hour must flag: ${got(("burst", 4L))}")
    (0 until 4).foreach { h =>
      assert(!got(("burst", h.toLong))._3, s"quiet hour $h flagged") }
    (0 until 5).foreach { h =>
      val (n, z, s) = got(("flat", h.toLong))
      assert(n == 1L && z == 0.0 && !s, s"flat hour $h: ${got(("flat", h.toLong))}")
    }
  }

  test("clusterBalancedSample: caps dominant clusters, keeps small ones whole, partitioning-independent") {
    import graft.operators.Ann
    val dim = 8
    // planted imbalance: 200 vectors on centroid 0, 5 on centroid 2
    val docs = (
      (0 until 200).map(i => (i.toLong, Ann.centroidVector(0, dim).toSeq)) ++
      (0 until 5).map(i => (1000L + i, Ann.centroidVector(2, dim).toSeq))
    ).toDF("id", "v")
    val got = graft.operators.Curation
      .clusterBalancedSample(docs, "id", "v", dim, 4, perCluster = 20)
      .collect()
    val byCluster = got.groupBy(_.getAs[Long]("cluster")).view
      .mapValues(_.length).toMap
    assert(byCluster.values.forall(_ <= 20), s"cap violated: $byCluster")
    assert(byCluster.size == 2 && byCluster.values.sum == 25,
      s"dominant capped at 20, small kept whole (5): $byCluster")
    // deterministic under repartition (the hashing-not-RNG contract)
    val again = graft.operators.Curation
      .clusterBalancedSample(docs.repartition(7), "id", "v", dim, 4, 20)
      .collect().map(_.toString).sorted.toSeq
    assert(again == got.map(_.toString).sorted.toSeq)
  }

  test("qRetentionCohorts core math: offsets, sparse cells, rate denominators") {
    // use the operator's own building blocks on a planted week table:
    // cohort A (users 1,2 first week 0): u1 active weeks 0,1,3; u2 week 0
    // cohort B (user 3 first week 1): active weeks 1,2
    val weekUs = 7L * 86400L * 1000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (3L, 1L), (3L, 2L), (3L, 2L)
    ).map { case (u, w) => (u, new java.sql.Timestamp(w * weekUs / 1000)) }
      .toDF("user_id", "ts")
    ev.createOrReplaceTempView("planted_events")
    // drive the same logic inline (the operator reads Tables.events)
    val res = {
      val e = ev.select(col("user_id"),
        expr(s"unix_micros(ts) div ${weekUs}L").as("week"))
      val first = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      val sizes = first.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
      e.distinct().join(first, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, Seq("cohort_week"))
        .collect()
        .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
          ((r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort")))).toMap
    }
    assert(res == Map(
      (0L, 0L) -> ((2L, 2L)), // both cohort-A users active week 0
      (0L, 1L) -> ((1L, 2L)), // only u1 returns week 1
      (0L, 3L) -> ((1L, 2L)), // sparse: week 2 cell absent
      (1L, 0L) -> ((1L, 1L)),
      (1L, 1L) -> ((1L, 1L))), s"$res")
  }

  test("funnel: earliest-completion anchors and window cutoffs") {
    val W = 100L
    val ev = Seq(
      // user 1: full funnel, in-window each step
      (1L, "view", 1000L), (1L, "click", 1050L), (1L, "purchase", 1120L),
      // user 2: click arrives AFTER the window from first view → stage 1
      (2L, "view", 1000L), (2L, "click", 1200L),
      // user 3: click before any view never counts → stage 1
      (3L, "click", 900L), (3L, "view", 1000L),
      // user 4: anchors are the EARLIEST qualifying events — second
      // view is ignored, purchase within window of earliest click
      (4L, "view", 1000L), (4L, "view", 1010L),
      (4L, "click", 1080L), (4L, "click", 1090L), (4L, "purchase", 1170L),
      // user 5: no view at all → absent from the funnel
      (5L, "purchase", 1000L)
    ).toDF("user_id", "event_type", "tus")
    val got = Relational.funnel(ev, "view", "click", "purchase", W)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("stage")))).toMap
    assert(got(1L) == ((Some(1000L), Some(1050L), Some(1120L), 3L)))
    assert(got(2L) == ((Some(1000L), None, None, 1L)))
    assert(got(3L) == ((Some(1000L), None, None, 1L)))
    assert(got(4L) == ((Some(1000L), Some(1080L), Some(1170L), 3L)))
    assert(!got.contains(5L))
  }
}
