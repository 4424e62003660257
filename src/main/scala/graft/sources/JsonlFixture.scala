package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Deterministic JSON-lines fixture for the q185 source roundtrip.
  *
  * JSONL is the de-facto interchange format for LLM training corpora,
  * and the Sources JSONL reader was only spec-covered — no oracle
  * pinned the full write → read → parse loop. This helper materializes
  * `documents.parquet` AS a JSONL directory via the engine's own sink
  * (`df.write.json` — which makes the fixture double as the JSONL SINK
  * capability check), then plants `NCorrupt` malformed lines in a
  * trailing part file. The q185 oracle states the expected parsed rows
  * straight from the parquet table, so the whole loop — JSON escaping,
  * explicit-schema parse, PERMISSIVE corrupt quarantine — must be
  * byte-faithful for the driver's hash compare to pass.
  *
  * The corrupt lines are unterminated-string JSON (malformed at the
  * lexer, not merely type-mismatched), so they land in the PERMISSIVE
  * `_corrupt` column deterministically on every Spark version.
  */
object JsonlFixture {

  /** Planted malformed lines — the q185 oracle states this literal. */
  val NCorrupt = 7

  private def wipe(dir: Path): Unit =
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
    }

  /** Materialize `outDir` as JSONL from `sfDir/documents.parquet` plus
    * `nCorrupt` malformed lines. Wiped and rewritten each call —
    * content depends only on the parquet input. */
  def materialize(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nCorrupt: Int = NCorrupt): Unit = {
    wipe(Paths.get(outDir))
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(4)
      .write.mode("overwrite").json(outDir)
    Files.write(Paths.get(outDir, "zz_corrupt.json"),
      corruptLines(nCorrupt).mkString("\n").getBytes("UTF-8"))
  }

  /** [[materialize]] under gzip — the de-facto LLM-corpus interchange is
    * COMPRESSED JSONL (`.jsonl.gz`), the first thing a real user points
    * the engine at (r13 verdict #4): the engine's own sink writes
    * codec'd part files (`compression=gzip`), and the planted malformed
    * lines are landed INSIDE the codec (a gzipped part file written
    * through GZIPOutputStream), so the q187 oracle proves the whole
    * write → decompress → parse → quarantine loop byte-faithful — one
    * bad line inside a .gz member must quarantine, not kill the read.
    * Decompression is by file extension (Hadoop codec discovery), so
    * the READER code is identical to the plain-JSONL path — which is
    * the point: a format knob, not a code path. */
  def materializeGzip(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nCorrupt: Int = NCorrupt): Unit = {
    wipe(Paths.get(outDir))
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(4)
      .write.mode("overwrite").option("compression", "gzip").json(outDir)
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(outDir, "zz_corrupt.json.gz")))
    try gz.write(corruptLines(nCorrupt).mkString("\n").getBytes("UTF-8"))
    finally gz.close()
  }

  /** [[materializeGzip]] under ZSTD — the other de-facto LLM-corpus
    * interchange codec (r14 verdict #5). Hadoop ships no usable zstd
    * codec without native libhadoop, so the engine's own
    * [[ZstdJniCodec]] (zstd-jni, already on Spark's classpath) is both
    * the sink codec here and the extension-discovered reader codec —
    * registered on the session before the write so the q190 roundtrip
    * exercises the exact read path a user's `.jsonl.zst` corpus takes.
    * The planted malformed lines land INSIDE a zstd frame (written
    * through ZstdOutputStreamNoFinalizer), mirroring q187's
    * inside-the-codec quarantine proof. */
  def materializeZstd(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nCorrupt: Int = NCorrupt): Unit = {
    ZstdJniCodec.register(spark)
    wipe(Paths.get(outDir))
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(4)
      .write.mode("overwrite")
      .option("compression", classOf[ZstdJniCodec].getName)
      .json(outDir)
    val zs = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(
      Files.newOutputStream(Paths.get(outDir, "zz_corrupt.json.zst")))
    try zs.write(corruptLines(nCorrupt).mkString("\n").getBytes("UTF-8"))
    finally zs.close()
  }

  private def corruptLines(n: Int): Seq[String] = (0 until n)
    .map(k => s"""{"doc_id": ${900000000L + k}, "text": "truncated $k""")
}
