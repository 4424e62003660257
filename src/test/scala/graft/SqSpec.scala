package graft

import graft.operators.{Knn, Sq}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (q189): encode bounds, degenerate inputs,
  * and the two-stage rerank's exactness contract. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id").cast("string").as("id"), col("embedding"))

  private def queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").cast("string").as("qid"),
      col("embedding").as("qvec"))

  test("encode: per-component reconstruction error <= scale/2; codes fit int8") {
    val enc = Sq.encode(corpus, "embedding")
      .select(col("sq_scale"),
        // max over components of |code*scale - original|
        array_max(zip_with(col("sq_codes"), col("embedding"),
          (c, x) => abs(c.cast("double") * col("sq_scale") - x.cast("double"))))
          .as("maxerr"),
        array_max(transform(col("sq_codes"), c => abs(c.cast("int"))))
          .as("maxcode"))
    val bad = enc.filter(col("maxerr") > col("sq_scale") / 2.0 + 1e-15).count()
    assert(bad == 0, s"$bad vectors exceed the scale/2 reconstruction bound")
    // byte range is enforced by the schema; the magnitude bound is the
    // floor(v/s + 0.5) construction's promise
    assert(enc.filter(col("maxcode") > 128).count() == 0)
  }

  test("encode: zero vector takes the all-zero-code guard, no division blowup") {
    val z = Seq(("z", Array.fill(8)(0.0f))).toDF("id", "embedding")
    val row = Sq.encode(z, "embedding")
      .select("sq_scale", "sq_codes").collect().head
    assert(row.getDouble(0) == 0.0)
    assert(row.getSeq[Byte](1).forall(_ == 0))
  }

  test("topKSqRerank with shortlist >= corpus IS brute-force top-k, exactly") {
    val n = corpus.count().toInt
    val sq = Sq.topKSqRerank(corpus, queries, k = 5, shortlist = n)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getInt(3))).toSet
    val brute = Knn.topK(corpus, queries, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(sq == brute, "full-shortlist SQ8 rerank must equal brute top-k")
  }

  test("tight shortlist: exact sims, k rows per query, high recall on this corpus") {
    val k = 5
    val sq = Sq.topKSqRerank(corpus, queries, k, shortlist = 20)
    val perQuery = sq.groupBy("qid").count()
      .filter(col("count") =!= k).count()
    assert(perQuery == 0, "every query must return exactly k rows")
    // sims are EXACT (re-scored at full precision): each returned pair's
    // sim equals the direct dot product
    val bad = sq.join(corpus, Seq("id"))
      .join(queries, Seq("qid"))
      .filter(abs(col("sim") -
        graft.functions.VectorFunctions.dotProduct(col("qvec"), col("embedding"))) > 0.0)
      .count()
    assert(bad == 0, "rerank sims must be the exact full-precision scores")
    // SQ8 at dim 64 is nearly lossless for ranking: overlap with brute
    // top-k stays high (the documented trade; exact bound not promised)
    val brute = Knn.topK(corpus, queries, k)
      .select("qid", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = sq.select("qid", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.95, f"SQ8@20 recall $recall%.3f below 0.95 on the fixture")
  }
}
