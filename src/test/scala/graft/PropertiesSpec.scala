package graft

import graft.functions.VectorFunctions
import graft.operators.{Dedup, Ingest, Knn}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2), using raw ScalaCheck
  * generators with FIXED seeds (deterministic runs; the scalatest-plus
  * bridge isn't on the offline classpath). Each property runs the REAL
  * operators on generated corpora. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)

  private val corpusGen: Gen[List[(String, String, Seq[Float])]] = for {
    n <- Gen.chooseNum(1, 12)
    rows <- Gen.listOfN(n, for {
      id <- Gen.identifier.map(_.take(8))
      mt <- Gen.oneOf("text", "image")
      v <- vecGen
    } yield (id, mt, v))
  } yield rows.distinctBy(_._1)

  test("KNN invariants: |results| <= k, <= k/2 per bucket, scores in [-1-eps, 1]") {
    for ((rows, k) <- samples(Gen.zip(corpusGen, Gen.chooseNum(2, 8)), 8)
         if rows.nonEmpty) {
      val docs = rows.toDF("id", "mtype", "embedding")
        .withColumn("embedding", VectorFunctions.l2Normalize(col("embedding")))
      val q = Seq(("qq", "text", Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
        .toDF("qid", "qtype", "qvec")
      val res = Knn.search(docs, q, k).collect()
      assert(res.length <= k)
      res.groupBy(_.getAs[String]("mtype")).foreach { case (_, g) =>
        assert(g.length <= math.max(k / 2, 1))
      }
      assert(res.forall { r =>
        val s = r.getAs[Double]("sim"); s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9
      })
    }
  }

  test("l2Normalize is idempotent (up to float ulp)") {
    for (v <- samples(vecGen, 10)) {
      val df = Seq(Tuple1(v)).toDF("v")
      val r = df.select(VectorFunctions.l2Normalize(col("v")).as("n1"))
        .select(VectorFunctions.l2Normalize(col("n1")).as("n2"), col("n1"))
        .collect().head
      val n1 = r.getSeq[Float](1)
      val n2 = r.getSeq[Float](0)
      assert(n1.zip(n2).forall { case (a, b) => math.abs(a - b) <= 2e-7 })
    }
  }

  test("ingest dedup idempotent under arbitrary duplication") {
    val textsGen = Gen.listOfN(6, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12)))
    for (texts <- samples(textsGen, 6) if texts.nonEmpty) {
      val batch = texts.zipWithIndex
        .map { case (t, i) => ("text", t, i.toLong) }
        .toDF("mtype", "data", "seq")
      val doubled = batch.unionByName(batch.withColumn("seq", col("seq") + 100))
      val empty = Seq.empty[(String, String)].toDF("id", "mtype")
      val conf = GraftConf(dim = 4)
      val a = Ingest.dedupDelta(Ingest.prepare(batch, conf), empty)
        .select("id").as[String].collect().toSet
      val b = Ingest.dedupDelta(Ingest.prepare(doubled, conf), empty)
        .select("id").as[String].collect().toSet
      assert(a == b)
    }
  }

  test("exact dedup: unique contents out, min id kept") {
    val textsGen = Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd"))
    for (texts <- samples(textsGen, 8) if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = Dedup.dedupExact(docs, "doc_id", "text").collect()
      assert(kept.groupBy(_.getAs[String]("text")).values.forall(_.length == 1))
      val minIds = texts.zipWithIndex.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).min).toMap
      kept.foreach { r =>
        assert(r.getAs[Long]("doc_id") == minIds(r.getAs[String]("text")))
      }
    }
  }

  test("simhash radius banding recovers flipped-bit pairs the exact bucket misses") {
    // doc 2 = doc 1 plus a few tokens: sketches differ in >=1 bit for
    // these texts, so radius-0 (exact bucket) misses the pair while the
    // pigeonhole banding at radius 3 must find it; doc 3 is unrelated
    // and must stay outside the radius.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the old river bank dog"),
      (3L, "completely different subject matter entirely unrelated vocabulary zone")
    ).toDF("doc_id", "text")
    val exact = Dedup.nearDupSimhash(docs, "doc_id", "text", bits = 32)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val radius = Dedup.nearDupSimhashRadius(docs, "doc_id", "text", bits = 32, radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!exact.contains((1L, 2L)), s"perturbation did not flip any bit: $exact")
    val found = radius.find(p => p._1 == 1L && p._2 == 2L)
    assert(found.isDefined, s"radius banding missed the near-pair: ${radius.toSeq}")
    assert(found.get._3 >= 1 && found.get._3 <= 3)
    assert(!radius.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated doc inside radius: ${radius.toSeq}")
  }

  test("ngram block cap: an adversarial shared-rare-shingle block never goes quadratic") {
    // 200 mutually-DISSIMILAR docs forced into ONE block (the premise of
    // the attack: they share their two rarest shingles, here by fiat on
    // the pre-blocked relation). The capped candidate generator must
    // reroute them through MinHash banding, where dissimilar docs almost
    // never share a band — candidates stay O(rows), not block².
    val nDocs = 200
    val rnd = new scala.util.Random(7)
    def gibberish(i: Int): Seq[String] =
      Seq.fill(30)(rnd.alphanumeric.take(6).mkString) :+ s"doc$i"
    val rows = (1 to nDocs).map { i =>
      (i.toLong, gibberish(i), "sharedblock", nDocs.toLong)
    }
    val blocked = rows.map { case (id, _, blk, bn) => (id, blk, bn) }
      .toDF("id", "blk", "bn")
    val withSh = rows.map { case (id, sh, _, _) => (id, sh) }.toDF("id", "sh")
    val cand = Dedup.ngramCandidates(blocked, withSh,
      maxBlock = 64, numHashes = 12, bands = 6)
    val nCand = cand.count()
    val quadratic = nDocs.toLong * (nDocs - 1) / 2
    assert(nCand < quadratic / 10,
      s"cap failed: $nCand candidates ~ quadratic $quadratic")
    // planted near-identical pair inside the oversized block IS found,
    // and with its exact jaccard, by the full operator
    val twin = Seq(
      (1000L, rows.head._2.mkString(" ")),
      (1001L, (rows.head._2 :+ "tail").mkString(" ")))
    val docs = rows.map { case (id, sh, _, _) => (id, sh.mkString(" ")) }
      .++(twin).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxBlock = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1000L, 1001L)),
      s"planted near-dup pair missed: ${pairs.toSeq.take(20)}")
  }

  test("ngram small blocks keep EXACT within-block recall (capped route untouched)") {
    // below the cap the operator must behave like plain blocking:
    // every within-block pair is verified exactly. Identical texts have
    // identical shingle sets, hence identical two-min-hash block keys —
    // co-blocking is guaranteed, not probabilistic.
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd"),
      (2L, "aaaa bbbb cccc dddd"),
      (3L, "aaaa bbbb cccc dddd")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.1, maxBlock = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)), pairs.toString)
  }

  test("admission cap property: capped candidates ⊆ uncapped; decisions identical when no band is hot") {
    // random tiny sig worlds: 12-component signatures over a SMALL value
    // alphabet so band collisions actually happen
    val sigGen: Gen[Seq[Long]] =
      Gen.listOfN(12, Gen.chooseNum(0L, 3L)).map(_.toSeq)
    val worldGen = for {
      nIdx <- Gen.chooseNum(1, 25)
      nIn <- Gen.chooseNum(1, 8)
      idx <- Gen.listOfN(nIdx, sigGen)
      inc <- Gen.listOfN(nIn, sigGen)
    } yield (idx, inc)
    for (((idx, inc), w) <- samples(worldGen, 12).zipWithIndex) {
      val idxDf = idx.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("xid", "xsig")
      val idxBand = idxDf.select(col("xid"), col("xsig"),
        explode(Dedup.bandKeysFromSig(col("xsig"), 4, 3)).as("bkey"))
      val inSig = inc.zipWithIndex
        .map { case (s, i) => (1000L + i, s) }.toDF("id", "sig")
      def pairs(mb: Int): Set[(Long, Long)] =
        Dedup.admissionCandidates(inSig, idxBand, 4, 3, mb)
          .select("id", "xid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = pairs(Int.MaxValue)
      val capped = pairs(2) // tiny cap: hot routes exercised often
      assert(capped.subsetOf(uncapped),
        s"world $w: capped added pairs ${capped -- uncapped}")
      // every pair agreeing on >= 2 full bands survives the cap (the
      // reroute's recall contract)
      def bandsOf(s: Seq[Long]) = (0 until 4).map(b => s.slice(b * 3, b * 3 + 3))
      val twoBand = for {
        (is, ii) <- inc.zipWithIndex
        (xs, xi) <- idx.zipWithIndex
        if bandsOf(is).zip(bandsOf(xs)).count { case (a, b) => a == b } >= 2
      } yield (1000L + ii, xi.toLong)
      // ...unless truncated away: with cap=2 a pair key keeps the 2
      // smallest xids, so only assert for xids within the first 2 of
      // their pair key — conservatively, xid < 2 is always kept
      twoBand.filter(_._2 < 2L).foreach { p =>
        assert(capped.contains(p), s"world $w: two-band pair $p lost")
      }
      // and when NO band exceeds the cap, capped == uncapped exactly
      val maxBandSize = idx.flatMap(s => bandsOf(s).zipWithIndex
        .map { case (b, i) => (i, b) }).groupBy(identity).values.map(_.size).max
      if (maxBandSize <= 2)
        assert(capped == uncapped, s"world $w: no-hot-band divergence")
    }
  }

  test("decontamination flags copied text across the split, not fresh text") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim copy
      (2L, "iota kappa lambda mu nu xi omicron pi"),         // disjoint
      (3L, "intro words then alpha beta gamma delta epsilon tail") // partial
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val hits = graft.operators.Dedup.crossCorpusContamination(
        train, test, "doc_id", "text", w = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    // doc 1: all 6 shingles shared (jaccard 1.0); doc 3: the copied run
    // contributes 3 of its 3-shingles; doc 2: zero — never reported
    assert(hits.map(h => (h._1, h._2)) == List((1L, 100L), (3L, 100L)), hits.toString)
    assert(hits.head._3 == 6L, hits.toString)
    val j1 = graft.operators.Dedup.crossCorpusContamination(
        train, test, "doc_id", "text", w = 3, minShared = 2)
      .filter(col("train_id") === 1L).collect().head.getAs[Double]("jaccard")
    assert(j1 == 1.0, s"verbatim copy must score jaccard 1.0, got $j1")
    spark.sharedState.cacheManager.clearCache()
  }

  test("PII scrub: counts per class and full redaction, clean text untouched") {
    val docs = Seq(
      (1L, "write to bob@example.com or sue.jones@mail.test.org today"),
      (2L, "call +1 (555) 123-4567 and cc ops@corp.io"),
      (3L, "no personal data in this row at all")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.piiScrub(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == (2L, 0L, "write to <EMAIL> or <EMAIL> today"))
    assert(out(2L) == (1L, 1L, "call <PHONE> and cc <EMAIL>"))
    assert(out(3L) == (0L, 0L, "no personal data in this row at all"))
  }

  test("minhash pairs report EXACT jaccard in [0,1]; identical docs give 1.0") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    for (cut <- 0 to 8) {
      val words = base.split(" ")
      val docs = Seq((1L, words.mkString(" ")), (2L, words.drop(cut).mkString(" ")))
        .toDF("doc_id", "text")
      val pairs = Dedup.nearDupMinhashLsh(docs, "doc_id", "text",
        shingleWidth = 2, numHashes = 16, bands = 8, threshold = 0.0)
      pairs.collect().foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j >= 0.0 && j <= 1.0)
        if (cut == 0) assert(j == 1.0)
      }
    }
  }

  test("chunking property: chunkWindows == brute for random (text, window, stride)") {
    def bruteTokens(text: String): List[String] =
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList
    def brute(text: String, w: Int, st: Int): List[(Long, String, Long)] = {
      val toks = bruteTokens(text)
      if (toks.isEmpty) Nil
      else (0 until (1 + math.ceil(math.max(toks.length - w, 0).toDouble / st).toInt))
        .toList.map { i =>
          val c = toks.slice(i * st, i * st + w)
          (i.toLong, c.mkString(" "), c.length.toLong)
        }
    }
    val wordGen = Gen.oneOf("aa", "b1", "ccc", "Dd", "!", "e f", "...", "g")
    val caseGen = for {
      nWords <- Gen.chooseNum(0, 60)
      words <- Gen.listOfN(nWords, wordGen)
      w <- Gen.chooseNum(1, 9)
      st <- Gen.chooseNum(1, w) // stride within [1, window] by construction
    } yield (words.mkString(" "), w, st)
    val cases = samples(caseGen, 40)
    assert(cases.size >= 25, s"generator must mostly succeed, got ${cases.size}")
    // one Spark job for ALL cases: each case is a row, chunked with its
    // own (w, st) via per-case filtering
    cases.zipWithIndex.groupBy { case ((_, w, st), _) => (w, st) }
      .foreach { case ((w, st), grp) =>
        val df = grp.map { case ((text, _, _), i) => (i.toLong, text) }
          .toDF("doc_id", "text")
        val got = graft.operators.Chunking
          .chunkWindows(df, "doc_id", "text", w, st)
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("chunk_idx"),
            r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens"))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toList.sortBy(_._1)).toMap
        grp.foreach { case ((text, _, _), i) =>
          assert(got.getOrElse(i.toLong, Nil) == brute(text, w, st),
            s"case $i text='$text' w=$w st=$st")
        }
      }
  }
}
