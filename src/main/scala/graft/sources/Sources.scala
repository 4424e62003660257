package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion beyond parquet: CSV and JSON-lines document sources with an
  * EXPLICIT schema (never schema inference on a 100 TB corpus — inference
  * is an extra full scan and type-unstable across files), plus the
  * content-addressed binary source in Multimodal.fromBinaryFiles.
  */
object Sources {

  /** (mtype, data, seq) — the ingest batch contract (Ingest.prepare). */
  val batchSchema: StructType = StructType(Seq(
    StructField("mtype", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** JSON-lines ingest source. Corrupt lines land in a `_corrupt` column
    * (PERMISSIVE) rather than failing the batch — filter them to a
    * quarantine sink; never let one bad record kill a 100 TB job.
    * NB: Spark disallows corrupt-column-ONLY queries on the raw source —
    * cache (or write out) the parsed frame before inspecting `_corrupt`
    * by itself. */
  def readJsonBatch(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(batchSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** CSV ingest source (header, explicit schema, PERMISSIVE). */
  def readCsvBatch(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(batchSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** The full document-table schema for JSONL corpora ([[JsonlFixture]],
    * q185) — explicit for the same 100 TB reason as [[batchSchema]]. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** JSONL document-corpus source: explicit schema, PERMISSIVE corrupt
    * quarantine (same discipline as [[readJsonBatch]]). Callers that
    * inspect `_corrupt` must cache the parsed frame first — Spark
    * disallows corrupt-column-only sub-queries on the raw file scan.
    * Decompression is extension-driven (Hadoop codec discovery):
    * `.gz` ships with Hadoop, `.zst` through the engine's
    * [[ZstdJniCodec]] — registered here so a `.jsonl.zst` corpus reads
    * with zero caller setup. */
  def readJsonDocuments(spark: SparkSession, path: String): DataFrame = {
    ZstdJniCodec.register(spark)
    spark.read
      .schema(documentsSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** CSV document-corpus source: explicit schema, header, PERMISSIVE
    * corrupt quarantine — the [[readJsonDocuments]] contract for the
    * other ubiquitous corpus format ([[CsvFixture]], q186). */
  def readCsvDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema.add("_corrupt", StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Valid rows only (corrupt quarantined by the caller if needed). */
  def validRows(batch: DataFrame): DataFrame =
    if (batch.columns.contains("_corrupt"))
      batch.filter(col("_corrupt").isNull).drop("_corrupt")
        .filter(col("data").isNotNull)
    else batch.filter(col("data").isNotNull)
}
