package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Paragraph-grain dedup (q70's operator): keeper semantics, near-dup
  * detection through the distinct-content MinHash stage, and the
  * occurrence-vs-distinct scale contract. */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  // 8-token boilerplate (6 word-3-shingles); variant flips the LAST word
  // only → 3-shingle Jaccard 5/7 ≈ 0.714, a near- but not exact-dup
  private val Boiler = "boiler x y z common words here ok"
  private val BoilerVar = "boiler x y z common words here okay"

  private def corpus = Seq(
    (1L, s"alpha beta gamma delta\n\n$Boiler\n\nunique one text"),
    (2L, s"$Boiler\n\nsecond own paragraph content"),
    (3L, s"$BoilerVar\n\nthird own paragraph content"),
    (4L, "totally different text\n\n") // trailing empty para must drop
  ).toDF("id", "text")

  test("keeper semantics, contamination fractions, planted near pair") {
    val out = Dedup.paragraphContamination(
        corpus, "id", "text", delim = "\n\n",
        shingleWidth = 3, numHashes = 12, bands = 6, threshold = 0.5)
      .select("id", "n_paras", "n_exact_dup", "n_near_dup", "contamination")
      .as[(Long, Long, Long, Long, Double)]
      .collect().toSet
    // doc 1 owns the first Boiler occurrence (keeper) → 0 exact dups but
    // its content is near-flagged via the doc-3 variant; doc 2 repeats it
    // (1 exact dup of 2 paras); doc 4's trailing empty paragraph drops.
    assert(out === Set(
      (1L, 3L, 0L, 1L, 0.0),
      (2L, 2L, 1L, 1L, 0.5),
      (3L, 2L, 0L, 1L, 0.0),
      (4L, 1L, 0L, 0L, 0.0)))
  }

  test("near-dup stage runs at distinct-content grain, not occurrences") {
    // 40 docs all carrying the same boilerplate: the LSH candidate stage
    // must see ONE representative for it (distinct hashes), so the pair
    // relation over reps is empty here (a rep cannot pair with itself)
    // and every repeat is counted as an EXACT dup instead.
    val many = (1L to 40L)
      .map(i => (i, s"$Boiler\n\nown paragraph number $i with words"))
      .toDF("id", "text")
    val out = Dedup.paragraphContamination(
        many, "id", "text", delim = "\n\n",
        shingleWidth = 3, numHashes = 12, bands = 6, threshold = 0.5)
    val agg = out.agg(
      sum("n_exact_dup").cast("long"), sum("n_near_dup").cast("long"))
      .as[(Long, Long)].head()
    assert(agg._1 === 39L) // 39 non-keeper occurrences of the boilerplate
    assert(agg._2 === 0L)  // no distinct-content near pair exists
  }
}
