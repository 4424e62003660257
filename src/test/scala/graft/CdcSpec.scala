package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking (q115): the partition invariant, the
  * boundary-resynchronization property that distinguishes CDC from
  * fixed-stride chunking, and the chunk-grain dedup report. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the quick brown fox jumps over the lazy dog while " +
    "seventy silver spoons slowly slid across the antique mahogany table " +
    "as rain hammered the tin roof and the old clock counted midnight " +
    "in a language only the house still remembered from better days"

  test("cdcChunks: chunks partition the text exactly (no char lost or duplicated)") {
    val docs = Seq((1L, prose), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs, "doc_id", "text").collect()
      .groupBy(_.getAs[Long]("id")).view
      .mapValues(_.map(_.getAs[String]("chunk"))).toMap
    assert(got(1L).mkString == prose, "concatenated chunks must rebuild the text")
    assert(got(1L).size > 1, s"prose should split into multiple chunks: ${got(1L).size}")
    assert(got(2L).toSeq == Seq("short"), "sub-window text is one chunk")
    assert(!got.contains(3L), "empty text yields no chunks")
  }

  test("cdcChunks: boundaries resynchronize after a prefix edit (the CDC property)") {
    // an insertion at the FRONT shifts every fixed-stride chunk; CDC
    // boundaries depend only on the trailing window, so chunks
    // downstream of the edit are byte-identical
    val long = Seq.tabulate(8)(i => s"[$i] " + prose).mkString(" ")
    val docs = Seq((1L, long), (2L, "INSERTED PREFIX >>> " + long))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs, "doc_id", "text").collect()
      .groupBy(_.getAs[Long]("id")).view
      .mapValues(_.map(_.getAs[String]("chunk")).toSeq).toMap
    // occurrence-level: how many of doc 1's chunk occurrences also
    // occur in doc 2 (set intersection would collapse the repeats)
    val in2 = got(2L).toSet
    val shared = got(1L).count(in2).toDouble / got(1L).size
    info(f"chunks of the original recovered in the prefixed copy: ${shared * 100}%.0f%%")
    assert(shared >= 0.9,
      f"CDC must resync after the edit (fixed-stride would share ~0): $shared%.2f")
    // and the damage is EXACTLY the head: every chunk after the first matches
    assert(got(1L).tail == got(2L).tail.takeRight(got(1L).tail.size),
      "all chunks after the first must be byte-identical")
  }

  test("cdcChunks: mean chunk length tracks the divisor") {
    val docs = Seq((1L, prose * 20)).toDF("doc_id", "text")
    val lens = Dedup.cdcChunks(docs, "doc_id", "text", divisor = 64).collect()
      .map(_.getAs[String]("chunk").length)
    val mean = lens.sum.toDouble / lens.size
    info(f"mean chunk length = $mean%.1f (divisor 64)")
    assert(mean > 16 && mean < 256, s"mean chunk length out of band: $mean")
  }

  test("CdcCuts expression matches the HOF reference formulation exactly") {
    // the one-pass codegen expression replaced the O(L²·w) HOF form in
    // round 8; this pin is the license for that swap — element-wise
    // equal cut positions on prose, edge cases, and seeded-random text
    val rng = new scala.util.Random(42)
    val randoms = Seq.tabulate(50) { i =>
      val n = rng.nextInt(600)
      (100L + i, Seq.fill(n)((32 + rng.nextInt(95)).toChar).mkString)
    }
    val cases = Seq(
      (1L, prose), (2L, prose * 10), (3L, ""), (4L, "short"),
      (5L, "x" * 7), (6L, "x" * 8), (7L, "\n\t  mixed   whitespace\n" * 40),
      // unicode parity (the scaladoc claims CODEPOINT-exact equality):
      // multi-byte BMP (latin-1 supplement, CJK) and supplementary-plane
      // codepoints (surrogate pairs in compute()'s iteration)
      (8L, "héllo wörld — üñïçødé ¿prose? " * 30),
      (9L, "日本語のテキストと中文文本が混在する例です。" * 25),
      (10L, ("plane-1: 𝒜𝒝𝒞 emoji 😀" +
        "🚀 mixed ascii tail ") * 30)
    ) ++ randoms
    for ((w, d) <- Seq((8, 64), (4, 32), (1, 16), (12, 128))) {
      val df = cases.toDF("doc_id", "text").select(
        col("doc_id"),
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.CdcCuts(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("text")),
            w, d, 31L, 1000003L)).as("fast"),
        Dedup.cdcCutsHof(col("text"), w, d, 31L, 1000003L).as("ref"))
      val rows = df.collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"w=$w d=$d doc=${r.getLong(0)}: ${r.getSeq[Int](1)} != ${r.getSeq[Int](2)}")
      }
    }
  }

  test("graft_cdc_cuts is callable from SQL via GraftExtensions") {
    Seq((1L, prose)).toDF("doc_id", "text").createOrReplaceTempView("cdc_sql_probe")
    val viaSql = spark.sql(
      "SELECT graft_cdc_cuts(text, 8, 64, 31, 1000003) AS cuts FROM cdc_sql_probe")
      .collect()(0).getSeq[Int](0)
    val viaCol = Seq((1L, prose)).toDF("doc_id", "text")
      .select(Dedup.cdcCutsHof(col("text"), 8, 64, 31L, 1000003L).as("cuts"))
      .collect()(0).getSeq[Int](0)
    assert(viaSql == viaCol)
  }

  test("cdcDedupStats: twin docs share nearly all chunks; unique doc shares none") {
    val long = Seq.tabulate(8)(i => s"[$i] " + prose).mkString(" ")
    val docs = Seq(
      (1L, long),
      (2L, long + " with a small suffix edit"),
      (3L, "completely unrelated content about submarine cartography and phosphorescent depths"))
      .toDF("doc_id", "text")
    val m = Dedup.cdcDedupStats(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("shared_ratio")))).toMap
    assert(m(1L)._3 >= 0.7, s"suffix twin must share most chunks: ${m(1L)}")
    assert(m(3L)._2 == 0L && m(3L)._3 == 0.0, s"unique doc: ${m(3L)}")
    // shared counts are symmetric at the chunk level: doc 2 shares the
    // same common chunks plus keeps its edited tail private
    assert(m(2L)._2 <= m(2L)._1 && m(2L)._2 >= m(1L)._2 - 2, s"${m(2L)} vs ${m(1L)}")
  }
}
