package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic binary-file fixture for the S2/E2/E3/E4 ingest path
  * (reference main.py:59-68: raw uploaded bytes → hash → embed).
  *
  * The driver's testdata ships no binary files, so the upload path could
  * only be spec-tested. This helper derives a byte-identical-per-run file
  * tree FROM `documents.parquet` — one file per selected document, named
  * `<doc_id>.<ext>`, whose content is the document text's UTF-8 bytes —
  * so a DuckDB oracle over the same parquet table can mirror the whole
  * binary pipeline (sha256 id, extension-derived modality, stub
  * embedding) exactly. Extensions cycle by `doc_id % 3`
  * (png → image, wav → audio, dat → binary), exercising E4's
  * audio-through-the-image-branch degeneracy alongside images.
  *
  * E3 poison: `nPoison` single-NUL-byte files with doc_ids far above the
  * corpus range. All-zero content is the stub model's "undecodable"
  * input (Multimodal.StubMediaModel.embedOpt) — zero-LENGTH files would
  * be skipped at split planning and never reach the operator — so these
  * rows flow through the source and must vanish from `extractFeatures`
  * output; the oracle simply never includes them, making the driver's
  * hash-compare prove the E3 drop.
  *
  * Files are written from executor tasks (foreachPartition): under
  * local[n] any local path works; on a real cluster `outDir` must be a
  * shared filesystem. The fixture is wiped and rewritten each call —
  * content depends only on the parquet input, so reruns are
  * bit-identical.
  */
object BinaryFixture {

  /** doc_ids used for the poison files — far above any real doc_id. */
  private[graft] val PoisonBase = 900000000L

  private def extFor(docId: Long): String = (docId % 3) match {
    case 0 => "png"
    case 1 => "wav"
    case _ => "dat"
  }

  private def wipe(dir: Path): Unit =
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
    }

  /** Materialize `outDir` from `sfDir/documents.parquet`
    * (doc_id % 5 == 0, non-empty text), plus `nPoison` empty files. */
  def materialize(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nPoison: Int = 3): Unit = {
    import spark.implicits._
    val out = Paths.get(outDir)
    wipe(out)
    Files.createDirectories(out)
    graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0 &&
        col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .foreachPartition { (rows: Iterator[(Long, String)]) =>
        rows.foreach { case (docId, text) =>
          Files.write(
            Paths.get(outDir, s"$docId.${extFor(docId)}"),
            text.getBytes("UTF-8"))
        }
      }
    (0 until nPoison).foreach { k =>
      val id = PoisonBase + k
      Files.write(out.resolve(s"$id.${extFor(id)}"), Array[Byte](0))
    }
  }
}
