package graft

import graft.operators.Chunking

/** Passage chunking (Chunking.chunkWindows): pinned against a driver-side
  * brute mirror on boundary-heavy corpora — exact-window, window+1,
  * sub-window, empty, and punctuation-only docs; disjoint (stride ==
  * window) and overlapped strides. */
class ChunkingSpec extends SparkSpec {

  private def bruteTokens(text: String): List[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList

  private def bruteChunks(
      text: String, window: Int, stride: Int): List[(Long, String, Long)] = {
    val toks = bruteTokens(text)
    if (toks.isEmpty) Nil
    else {
      val n = toks.length
      val nChunks = 1 + math.ceil(math.max(n - window, 0).toDouble / stride).toInt
      (0 until nChunks).toList.map { i =>
        val w = toks.slice(i * stride, i * stride + window)
        (i.toLong, w.mkString(" "), w.length.toLong)
      }
    }
  }

  private def run(
      docs: Seq[(Long, String)], window: Int, stride: Int) = {
    import spark.implicits._
    Chunking.chunkWindows(
      docs.toDF("doc_id", "text"), "doc_id", "text", window, stride)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens")))
      .toList.sortBy(t => (t._1, t._2))
  }

  test("chunkWindows == brute on boundary cases (overlapped stride)") {
    val docs = Seq(
      1L -> "one two three four five six seven eight",  // n == 8 == window
      2L -> "one two three four five six seven eight nine", // window+1
      3L -> "tiny doc",                                  // n < window
      4L -> "",                                          // empty -> no rows
      5L -> "!!! ... ---",                               // tokenless -> no rows
      6L -> (1 to 23).map(i => s"w$i").mkString(" "))    // multi-window tail
    val got = run(docs, window = 8, stride = 5)
    val want = docs.flatMap { case (id, t) =>
      bruteChunks(t, 8, 5).map { case (i, c, n) => (id, i, c, n) }
    }.toList.sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("chunkWindows stride == window partitions tokens exactly") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = run(Seq(1L -> text), window = 4, stride = 4)
    assert(got.map(_._3) ==
      List("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(got.map(_._4).sum == 10L, "disjoint chunks conserve token mass")
  }

  test("pooledEmbeddings: unit norm; single-chunk doc == its chunk vector") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      1L -> "alpha beta gamma",                       // one chunk (n < window)
      2L -> (1 to 40).map(i => s"w$i").mkString(" "), // several chunks
      3L -> "").toDF("doc_id", "text")
    val pooled = graft.operators.Chunking
      .pooledEmbeddings(docs, "doc_id", "text", window = 8, stride = 6, dim = 16)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"),
          r.getSeq[Float](r.fieldIndex("embedding")).toList))
      .toMap
    assert(!pooled.contains(3L), "tokenless doc pools to nothing")
    pooled.values.foreach { case (n, emb) =>
      assert(n >= 1 && emb.length == 16)
      val nrm = math.sqrt(emb.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-6, s"unit norm, got $nrm")
    }
    // a single-chunk doc's pooled vector IS its chunk embedding up to the
    // 1e-6 quantization + renormalize round-trip
    val direct = docs.filter(col("doc_id") === 1L)
      .select(graft.operators.Embed
        .embedText(org.apache.spark.sql.functions.lower(col("text")), 16)
        .as("e"))
      .collect().head match { case r => r.getSeq[Float](r.fieldIndex("e")).toList }
    val (n1, p1) = pooled(1L)
    assert(n1 == 1L)
    direct.zip(p1).foreach { case (a, b) =>
      assert(math.abs(a - b) < 2e-6, s"single-chunk identity: $a vs $b")
    }
  }

  test("chunk-grain near-dup: shared boilerplate chunks drop (min-cid keeper), unique chunks keep themselves") {
    import graft.operators.{Dedup, GraphAlgos}
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // docs 1 and 2 open with the same 12-token boilerplate banner, then
    // diverge; doc 3 is unrelated. window=8/stride=8 → chunk 0 of docs
    // 1 and 2 is the identical banner (Jaccard 1), every other chunk is
    // distinct.
    val banner = "terms of service apply to all content on this site today"
    val docs = Seq(
      (1L, banner + " alpha beta gamma delta epsilon zeta eta theta"),
      (2L, banner + " one two three four five six seven eight nine"),
      (3L, "completely different text about spark catalyst expression codegen and shuffle partitioning")
    ).toDF("doc_id", "text")
    val chunks = graft.operators.Chunking
      .chunkWindows(docs, "doc_id", "text", window = 8, stride = 8)
      .select((col("doc_id") * 100L + col("chunk_idx")).as("cid"),
        col("chunk_text"))
    val clusters = GraphAlgos.dedupClusters(
      Dedup.nearDupMinhashLsh(chunks, "cid", "chunk_text",
        shingleWidth = 3, numHashes = 12, bands = 4, threshold = 0.6))
    val decisions = chunks.join(
        clusters.select(col("id").as("cid"), col("keeper"), col("is_keeper")),
        Seq("cid"), "left")
      .select(col("cid"),
        coalesce(col("keeper"), col("cid")).as("keeper"),
        coalesce(col("is_keeper"), lit(true)).as("keep"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 2's banner chunk (cid 200) collapses onto doc 1's (cid 100)
    assert(decisions(200L) == (100L, false), s"banner dup must drop: ${decisions(200L)}")
    assert(decisions(100L) == (100L, true))
    // every non-banner chunk survives as its own keeper
    decisions.filterNot(kv => kv._1 == 100L || kv._1 == 200L).foreach {
      case (cid, (keeper, keep)) =>
        assert(keep && keeper == cid, s"unique chunk $cid must keep itself")
    }
  }

  test("chunkWindows covers every token and indexes chunks densely") {
    val rng = new scala.util.Random(7)
    val docs = (1L to 20L).map { id =>
      id -> (0 until rng.nextInt(40)).map(_ => s"x${rng.nextInt(9)}").mkString(" ")
    }
    val got = run(docs, window = 7, stride = 3)
    docs.foreach { case (id, t) =>
      val want = bruteChunks(t, 7, 3).map { case (i, c, n) => (id, i, c, n) }
      assert(got.filter(_._1 == id) == want)
    }
  }
}
