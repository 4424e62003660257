package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** `.zst` support for the text-based sources (JSONL/CSV corpora) —
  * r14 verdict #5: zstd is the OTHER de-facto LLM-corpus interchange
  * codec next to gzip (q187), but Hadoop's own `ZStandardCodec` needs
  * the native libhadoop build (absent here — `NativeCodeLoader` falls
  * back to builtin-java classes, which have no zstd), and Spark's
  * shipped zstd paths (shuffle/parquet) don't reach the Hadoop codec
  * seam the line-based readers use. This codec closes that gap with
  * zero new dependencies: it adapts `zstd-jni` (already on Spark's
  * classpath for shuffle compression) to the
  * `org.apache.hadoop.io.compress.CompressionCodec` interface, so the
  * SAME extension-driven discovery that serves `.gz` serves `.zst` —
  * the reader code path is identical by construction, which is the
  * whole point (a format knob, not a code path; see
  * [[JsonlFixture.materializeGzip]]'s design note).
  *
  * Stream-level only, deliberately: the codec wraps whole-file frames
  * (`ZstdInputStreamNoFinalizer` reads concatenated frames to EOF, the
  * multi-member convention), and the block-level `Compressor` /
  * `Decompressor` pool objects are inert `@DoNotPool` stand-ins — the
  * non-splittable text path never calls them (it reads through
  * `createInputStream`), and anything that WOULD stream through the
  * pooled push-API fails loudly instead of corrupting data. Like gzip,
  * `.zst` frames are not splittable: one task per file, so a 100 TB
  * corpus must arrive sharded (the universal convention the fixture's
  * multi-part write models).
  */
class ZstdJniCodec extends CompressionCodec with Configurable {
  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".zst"

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.ZstdWrappedOutputStream(out)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.InertCompressor]
  override def createCompressor(): Compressor = new ZstdJniCodec.InertCompressor

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.ZstdWrappedInputStream(in)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.InertDecompressor]
  override def createDecompressor(): Decompressor = new ZstdJniCodec.InertDecompressor
}

object ZstdJniCodec {

  /** Make `.zst` discoverable by extension on this session's Hadoop conf
    * (Hadoop ADDS `io.compression.codecs` entries to its ServiceLoader
    * defaults, so `.gz` et al. keep working). Idempotent; call before
    * reading or writing `.zst` through a Hadoop-codec'd source. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = "io.compression.codecs"
    val hc = spark.sparkContext.hadoopConfiguration
    val cur = Option(hc.get(key)).getOrElse("")
    val me = classOf[ZstdJniCodec].getName
    if (!cur.split(",").map(_.trim).contains(me))
      hc.set(key, if (cur.isEmpty) me else s"$cur,$me")
  }

  private final class ZstdWrappedOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val zout = new ZstdOutputStreamNoFinalizer(raw)
    private var finished = false
    override def write(b: Int): Unit = zout.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      zout.write(b, off, len)
    override def flush(): Unit = if (!finished) zout.flush()
    // finish() must land the complete frame in `raw`; closing the zstd
    // stream does exactly that (the base class then re-closes raw —
    // idempotent on every FS output stream Spark hands us)
    override def finish(): Unit = if (!finished) { finished = true; zout.close() }
    override def resetState(): Unit =
      throw new UnsupportedOperationException(
        "ZstdJniCodec writes one frame per stream; resetState is unused on the text-sink path")
  }

  private final class ZstdWrappedInputStream(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val zin = new ZstdInputStreamNoFinalizer(raw)
    override def read(): Int = zin.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = zin.read(b, off, len)
    override def available(): Int = zin.available()
    override def resetState(): Unit =
      throw new UnsupportedOperationException(
        "ZstdJniCodec reads whole-file concatenated frames; resetState is unused on the text-source path")
    override def close(): Unit =
      try zin.close() finally super.close()
  }

  /** Pool stand-ins: the non-splittable text path never streams through
    * the block push-API — these exist only so `CodecPool` can
    * borrow/return instances around [[CompressionCodec.createInputStream]].
    * `@DoNotPool` routes the return to `end()` (a no-op here); every
    * data-bearing method throws rather than pretend. */
  @org.apache.hadoop.io.compress.DoNotPool
  final class InertCompressor extends Compressor {
    private def unsupported = throw new UnsupportedOperationException(
      "ZstdJniCodec is stream-level; the block Compressor API is not wired")
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unsupported
    override def needsInput(): Boolean = unsupported
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unsupported
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = unsupported
    override def finished(): Boolean = unsupported
    override def compress(b: Array[Byte], off: Int, len: Int): Int = unsupported
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  @org.apache.hadoop.io.compress.DoNotPool
  final class InertDecompressor extends Decompressor {
    private def unsupported = throw new UnsupportedOperationException(
      "ZstdJniCodec is stream-level; the block Decompressor API is not wired")
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unsupported
    override def needsInput(): Boolean = unsupported
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unsupported
    override def needsDictionary(): Boolean = unsupported
    override def finished(): Boolean = unsupported
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = unsupported
    override def getRemaining: Int = unsupported
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
