package graft

import graft.operators.{Ann, Knn}
import org.apache.spark.sql.functions._

/** ANN quality report: recall@k of the LSH-bucketed search against the
  * brute-force ground truth on real embeddings. Not an oracle — a
  * quality gate: multi-probe recall must dominate single-probe, and both
  * must be non-trivial. Prints the numbers for the round report. */
class AnnRecallSpec extends SparkSpec {

  test("LSH recall@5 vs brute force; multi-probe >= single-probe") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val queries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0) // 25 queries
      .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvec"))

    def resultSet(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
      df.collect().groupBy(_.getAs[String]("qid")).view
        .mapValues(_.map(_.getAs[String]("id")).toSet).toMap

    val truth = resultSet(Knn.topK(docs, queries, k = 5))
    val lsh1 = resultSet(Ann.topKBucketed(docs, queries, 5, 64, 8, probes = 1))
    val lsh4 = resultSet(Ann.topKBucketed(docs, queries, 5, 64, 8, probes = 4))

    def recall(approx: Map[String, Set[String]]): Double = {
      val perQuery = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      perQuery.sum / perQuery.size
    }

    val (r1, r4) = (recall(lsh1), recall(lsh4))
    info(f"recall@5: probes=1 -> $r1%.3f, probes=4 -> $r4%.3f (25 queries, 500 docs, 8 planes)")
    assert(r4 >= r1, s"multi-probe must not lose recall: $r4 < $r1")
    assert(r1 > 0.05, s"single-probe recall degenerate: $r1")
    // every query finds at least its self-match across 4 probes
    assert(lsh4.size == truth.size)
  }

  test("recall-vs-planes sweep: fewer planes -> bigger buckets -> higher recall (cost trade)") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val queries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvec"))
    def resultSet(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
      df.collect().groupBy(_.getAs[String]("qid")).view
        .mapValues(_.map(_.getAs[String]("id")).toSet).toMap
    val truth = resultSet(Knn.topK(docs, queries, k = 5))
    def recall(nPlanes: Int): Double = {
      val approx = resultSet(Ann.topKBucketed(docs, queries, 5, 64, nPlanes))
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    val sweep = Seq(4, 6, 8, 10).map(n => n -> recall(n))
    info(sweep.map { case (n, r) => f"planes=$n -> $r%.3f" }.mkString(", "))
    // monotone trend modulo hash noise: min planes must beat max planes
    assert(sweep.head._2 >= sweep.last._2)
  }
}
