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
