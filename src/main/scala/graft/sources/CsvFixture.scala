package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic CSV fixture for the q186 source roundtrip — the
  * [[JsonlFixture]] idea applied to the other ubiquitous corpus
  * format, with one twist: the driver corpus contains no delimiters,
  * quotes, or newlines (nothing that would exercise CSV escaping), so
  * the fixture PERTURBS the text deterministically —
  * `text || ', quoted "' || lang || '" tail'` — forcing an embedded
  * comma AND embedded double-quotes into every written field. The
  * engine writes with its own CSV sink (which must quote the field and
  * escape the inner quotes) and reads back with the explicit-schema
  * PERMISSIVE source; the q186 oracle recomputes the same perturbed
  * text from the parquet table, so any asymmetry between the writer's
  * escaping and the reader's parsing breaks the sha256 hash compare.
  *
  * Corrupt lines: `nCorrupt` rows whose doc_id is not a number AND
  * whose token count is wrong — malformed under any CSV dialect, so
  * they land in the PERMISSIVE `_corrupt` column deterministically.
  * The corrupt part file carries its own header line (with
  * `header=true` Spark skips the first line of EVERY file).
  */
object CsvFixture {

  /** Planted malformed lines — the q186 oracle states this literal. */
  val NCorrupt = 7

  /** The deterministic perturbation, as a Column (engine side). The
    * oracle mirrors it with string concatenation in SQL. */
  def perturb(text: org.apache.spark.sql.Column,
      lang: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(text, lit(", quoted \""), lang, lit("\" tail"))

  private def wipe(dir: Path): Unit =
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
    }

  /** Materialize `outDir` as CSV from `sfDir/documents.parquet` (text
    * perturbed to exercise quoting) plus `nCorrupt` malformed lines.
    * Wiped and rewritten each call. */
  def materialize(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nCorrupt: Int = NCorrupt): Unit = {
    wipe(Paths.get(outDir))
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), perturb(col("text"), col("lang")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .coalesce(4)
      .write.mode("overwrite").option("header", "true").csv(outDir)
    val corrupt = "doc_id,text,lang,source,n_chars" +:
      (0 until nCorrupt).map(k => s"notanumber$k,malformed row")
    Files.write(Paths.get(outDir, "zz_corrupt.csv"),
      corrupt.mkString("\n").getBytes("UTF-8"))
  }
}
