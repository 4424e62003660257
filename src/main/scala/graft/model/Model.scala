package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed data model (SURVEY.md §1.1/§1.3): case-class views over the
  * engine's two core tables for call sites where compile-time typing
  * helps (encoders give typed column access + serialization for free;
  * the relational operators stay DataFrame-based — Catalyst optimizes
  * both identically).
  */
final case class Doc(
    id: String, // "doc:" + sha256(content)
    mtype: String, // text | image | audio
    data: String,
    embedding: Array[Float]) // unit-norm, GraftConf.dim wide

final case class Edge(
    src: String, // canonical: src < dst
    dst: String,
    score: Double,
    seq: Long) // ingest sequence (latest-wins upsert)

object Model {
  def asDocs(df: DataFrame)(implicit s: SparkSession): Dataset[Doc] = {
    import s.implicits._
    df.select("id", "mtype", "data", "embedding").as[Doc]
  }

  def asEdges(df: DataFrame)(implicit s: SparkSession): Dataset[Edge] = {
    import s.implicits._
    df.select("src", "dst", "score", "seq").as[Edge]
  }
}
