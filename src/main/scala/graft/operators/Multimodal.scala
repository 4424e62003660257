package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: opaque `BINARY` content
  * with typed metadata, mirroring the reference's upload path
  * (main.py:59-68: raw bytes hashed and stored; embedding service decodes
  * them, app.py:31-40). The reference's audio path is degenerate — audio
  * bytes are sent down the image branch (vec.py:16-22) — preserved here
  * by routing every modality through the same byte pipeline.
  *
  * STUBBED DECODE: no image/audio codecs exist in this offline
  * environment, so `decodeMeta` and the per-partition "model" inside
  * [[extractFeatures]] are DETERMINISTIC FAKES (hash-derived). The
  * Spark-side plumbing — binaryFile source, schema, partitioning,
  * per-partition handle lifecycle, batch shape — is real and tested; swap
  * `StubMediaModel` for a real codec/model to go live.
  *
  * Scale: content bytes never shuffle — metadata and features are derived
  * per-row (map-only); `binaryFile` splits by file, so parallelism = file
  * count; feature extraction holds ONE model per partition (the standard
  * Spark model-inference pattern, SURVEY.md §2.6 E1/E2).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("mtype", StringType, nullable = false),
    StructField("path", StringType, nullable = true),
    StructField("content", BinaryType, nullable = false)))

  /** Ingest a directory of binary files (S2): content-addressed id +
    * extension-derived modality tag. */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        concat(lit("doc:"), sha2(col("content"), 256)).as("id"),
        when(lower(col("path")).rlike("\\.(png|jpe?g|gif|bmp)$"), "image")
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(lower(col("path")).rlike("\\.(mp4|avi|mkv|webm)$"), "video")
          .otherwise("binary").as("mtype"),
        col("path"),
        col("content"))

  /** STUB metadata decode — deterministic fake dimensions from the
    * content hash (a real build decodes headers here). Column-level, so
    * it composes with pruning/pushdown like any projection.
    * Integer-only arithmetic (shift, not division — `/` on a Long column
    * is DOUBLE division, whose rounding no other engine reproduces
    * bit-for-bit), so the q43 oracle mirrors it exactly. */
  def decodeMeta(content: Column): Column = {
    val h = HashFunctions.hash60(sha2(content, 256))
    struct(
      (h % 1920).cast("int").as("width"),
      (shiftright(h, 16) % 1080).cast("int").as("height"),
      lit(3).as("channels"),
      (h % 600000).cast("int").as("duration_ms"))
  }

  /** Pseudo frame sampling: n equal byte slices of the content (a real
    * build decodes + samples frames; the slicing plumbing — one row in,
    * array of n binary chunks out — is what the pipeline needs).
    * call_function reaches the Substring expression with non-literal
    * pos/len (the Scala `substring` wrapper only takes Ints). */
  def frameSample(content: Column, n: Int): Column = {
    // floor + cast: `/` on columns is Double division; the floor keeps
    // chunk integral so slice offsets are exact (and SQL-mirrorable)
    val chunk = greatest(floor(length(content) / n), lit(1)).cast("int")
    transform(sequence(lit(0), lit(n - 1)),
      i => call_function("substring", content, i * chunk + 1, chunk))
  }

  /** Pluggable media-embedding contract (r11 verdict #3): the one
    * interface a real encoder (CLIP image/text towers, reference
    * app.py:22-40; any ONNX/torch model) implements to go live.
    * `embedOpt` returns None for undecodable content — the E3 contract
    * (reference main.py:74-75: embed failure drops the row, never stores
    * a poisoned vector). Implementations need not be thread-safe or
    * serializable: [[extractFeatures]] instantiates one per PARTITION on
    * the executor via [[MediaEncoderFactory]] and streams rows through
    * it (the standard Spark model-inference pattern). */
  trait MediaEncoder {
    def embedOpt(content: Array[Byte]): Option[Array[Float]]
  }

  /** Serializable factory shipped inside the mapPartitions closure;
    * `create` runs once per partition ON THE EXECUTOR — the place to
    * load weights / open an ONNX session. */
  trait MediaEncoderFactory extends Serializable {
    def create(dim: Int): MediaEncoder
  }

  /** Default factory: the deterministic stub (oracle-mirrorable). */
  object StubEncoderFactory extends MediaEncoderFactory {
    def create(dim: Int): MediaEncoder = new StubMediaModel(dim)
  }

  /** Second production-shaped encoder (r12 verdict #6): a FROZEN LINEAR
    * PROJECTION over the content's byte-frequency histogram — a real
    * (if small) model: its features depend on the content's byte
    * DISTRIBUTION (the standard file-type/entropy signal), not on a
    * hash of the whole blob, so near-identical payloads embed nearby
    * where the stub jumps discontinuously. No external weights needed:
    * the projection matrix is generated from a fixed integer mix
    * (pseudo-random frozen init — exactly how an untrained projection
    * head ships), which also keeps it DuckDB-mirrorable.
    *
    * Arithmetic contract (what makes the oracle exact):
    *  - histogram quantized to a 1e4 grid: q(b) = ⌊count(b)·10000 / len⌋
    *    — scale-invariant (a frequency profile) and bounded, so every
    *    downstream integer stays < 2^53 REGARDLESS of content size
    *  - weights W(i,b) ∈ [-1000, 1000] from the affine mix family the
    *    engine already uses (Embed.embedText)
    *  - raw(i) = Σ_b W(i,b)·q(b): exact Int64 (|raw| ≤ 1000·Σq ≤ 1e7)
    *  - Σ raw² ≤ 16e14 < 2^53: the norm's radicand converts to double
    *    EXACTLY, so sqrt/divide/float-cast are the same correctly-
    *    rounded steps in both engines.
    * Failure contract (E3): None on null/empty/all-NUL content, like
    * the stub, and on the (astronomically unlikely) all-zero
    * projection, where no unit vector exists. */
  object HistogramProjectionEncoderFactory extends MediaEncoderFactory {
    def create(dim: Int): MediaEncoder = new HistogramProjectionModel(dim)
  }

  private final class HistogramProjectionModel(dim: Int) extends MediaEncoder {
    require(dim <= 256, s"projection dim $dim exceeds the 256 histogram bins")
    private val M = 2147483647L // 2^31-1, same modulus as Embed.embedText

    /** Frozen weight: idx = i*256 + b; every intermediate non-negative
      * so `%` agrees between JVM and SQL. */
    private def w(idx: Long): Long =
      ((1103515245L * (idx + 1L) + (idx * 1013904223L) % M) % M) % 2001L - 1000L

    def embedOpt(content: Array[Byte]): Option[Array[Float]] = {
      if (content == null || content.isEmpty || content.forall(_ == 0))
        return None
      val counts = new Array[Long](256)
      content.foreach(b => counts(b & 0xff) += 1)
      val len = content.length.toLong
      // quantized frequency histogram: Σ q ≤ 10000 by construction
      val q = counts.map(c => c * 10000L / len)
      val raw = Array.tabulate(dim) { i =>
        var acc = 0L
        var b = 0
        while (b < 256) {
          if (q(b) != 0L) acc += w(i.toLong * 256L + b) * q(b)
          b += 1
        }
        acc
      }
      var nrmSq = 0L // exact: ≤ dim·(1000·10000)² = 1.6e15 < 2^53
      raw.foreach(r => nrmSq += r * r)
      if (nrmSq == 0L) None
      else {
        val nrm = math.sqrt(nrmSq.toDouble)
        Some(raw.map(r => (r.toDouble / nrm).toFloat))
      }
    }
  }

  /** FOURTH encoder implementation (r17 verdict #6): a QUANTIZED
    * LEARNED linear probe over the byte-histogram features — the
    * closest thing to a real trained model this offline container can
    * run end-to-end. The projection matrix is LEARNED from data
    * ([[trainHistogramProjection]]: PCA over a training corpus's
    * quantized byte-frequency histograms, MLlib's exact SVD path — the
    * standard "linear probe over frozen features" recipe), then frozen
    * and quantized to int8 per output row (scale = 127/max|w|, the
    * standard weight-quantization deployment shape). The factory
    * carries ONLY the quantized weights (dim × 256 bytes — the
    * serializable artifact shipped inside the mapPartitions closure);
    * `create` runs once per partition ON THE EXECUTOR, which is where a
    * real session-open/weight-load would sit ([[extractFeatures]]'s
    * model-once-per-partition contract; the spec counts creations).
    *
    * Arithmetic: features are the same 1e4-grid quantized histogram as
    * [[HistogramProjectionEncoderFactory]] (Σq ≤ 10000); weights are
    * int8 (|w| ≤ 127), so raw(i) = Σ_b w8(i,b)·q(b) is an exact Int64
    * (|raw| ≤ 1.27e6) and the norm radicand ≤ dim·1.62e12 < 2^53 —
    * bit-deterministic across executors given the same frozen weights.
    * Failure contract (E3) identical to every other implementation:
    * None on null/empty/all-NUL content and on a zero projection. */
  final case class LearnedProjectionEncoderFactory(
      weights: Array[Array[Byte]]) extends MediaEncoderFactory {
    require(weights.nonEmpty && weights.forall(_.length == 256),
      "weights must be dim rows of 256 int8 values")
    def create(dim: Int): MediaEncoder = {
      require(dim <= weights.length,
        s"encoder trained for ${weights.length} dims, asked for $dim")
      new QuantizedProjectionModel(weights.take(dim))
    }
  }

  /** Learn the projection: PCA over the training corpus's quantized
    * byte-frequency histograms (rows with un-embeddable content are
    * excluded, like the serving path drops them), components quantized
    * to int8 per output row. One distributed pass builds the 256×256
    * Gramian; the SVD is driver-side (256×256 — constant). At 100 TB
    * the training input is a SAMPLE anyway (linear probes saturate
    * quickly); the artifact is dim×256 bytes however big the corpus.
    * @return row-major int8 weights for [[LearnedProjectionEncoderFactory]] */
  def trainHistogramProjection(
      media: DataFrame, contentCol: String, dim: Int): Array[Array[Byte]] = {
    require(dim >= 1 && dim <= 256, s"dim must be in [1, 256], got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    val feats = media.select(col(contentCol)).as[Array[Byte]]
      .mapPartitions(_.flatMap { content =>
        if (content == null || content.isEmpty || content.forall(_ == 0))
          None
        else {
          val counts = new Array[Long](256)
          content.foreach(b => counts(b & 0xff) += 1)
          val len = content.length.toLong
          Some(counts.map(c => (c * 10000L / len).toDouble))
        }
      })
      .toDF("hist")
      .select(org.apache.spark.ml.functions.array_to_vector(col("hist"))
        .as("features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("proj").setK(dim)
      .fit(feats)
    val pc = model.pc // 256 × dim, column j = component j
    Array.tabulate(dim) { j =>
      val w = Array.tabulate(256)(b => pc(b, j))
      val m = w.map(math.abs).max
      val scale = if (m == 0.0) 0.0 else 127.0 / m
      w.map(x => math.round(x * scale).toByte)
    }
  }

  private final class QuantizedProjectionModel(w8: Array[Array[Byte]])
      extends MediaEncoder {
    def embedOpt(content: Array[Byte]): Option[Array[Float]] = {
      if (content == null || content.isEmpty || content.forall(_ == 0))
        return None
      val counts = new Array[Long](256)
      content.foreach(b => counts(b & 0xff) += 1)
      val len = content.length.toLong
      val q = counts.map(c => c * 10000L / len)
      val raw = w8.map { row =>
        var acc = 0L
        var b = 0
        while (b < 256) { if (q(b) != 0L) acc += row(b) * q(b); b += 1 }
        acc
      }
      var nrmSq = 0L // exact: ≤ dim·(127·10000)² ≈ 4.1e14 < 2^53
      raw.foreach(r => nrmSq += r * r)
      if (nrmSq == 0L) None
      else {
        val nrm = math.sqrt(nrmSq.toDouble)
        Some(raw.map(r => (r.toDouble / nrm).toFloat))
      }
    }
  }

  /** The per-partition "model": deterministic fake producing the same
    * vector as Embed.embedBinary (embedText of the sha256 hex digest), so
    * the imperative JVM path is bit-checkable against the SQL oracle. */
  private final class StubMediaModel(dim: Int) extends MediaEncoder {
    private val md5 = java.security.MessageDigest.getInstance("MD5")
    private val sha = java.security.MessageDigest.getInstance("SHA-256")

    private def hex(bytes: Array[Byte]): String =
      bytes.map("%02x".format(_)).mkString

    /** Mirror of HashFunctions.hash60 (first 15 md5 hex chars, base 16). */
    private def hash60(s: String): Long = {
      md5.reset()
      val h = hex(md5.digest(s.getBytes("UTF-8")))
      java.lang.Long.parseLong(h.substring(0, 15), 16)
    }

    /** E3 failure contract (reference main.py:74-75: embed failure drops
      * the row): None on undecodable input. For the stub, "undecodable"
      * = null/empty content, or content that is ALL zero bytes (the
      * stand-in for a corrupt header: file sources skip zero-LENGTH
      * files at split planning, so an on-disk poison fixture needs a
      * non-empty undecodable form; UTF-8 text is never all-NUL). */
    def embedOpt(content: Array[Byte]): Option[Array[Float]] =
      if (content == null || content.isEmpty || content.forall(_ == 0)) None
      else Some(embed(content))

    /** Mirror of Embed.embedText(sha256Hex(content), dim): one md5 base
      * key, affine component mixes — identical integer arithmetic. */
    def embed(content: Array[Byte]): Array[Float] = {
      sha.reset()
      val M = 2147483647L
      val key = hash60(hex(sha.digest(content))) % M
      val raw = Array.tabulate(dim) { i =>
        val mix = (key * (i * 2 + 1) + (i * 1013904223L) % M) % M
        ((mix % 2000001L - 1000000L).toDouble / 1000000.0).toFloat
      }
      var ss = 0.0
      var i = 0
      while (i < dim) { ss += raw(i).toDouble * raw(i).toDouble; i += 1 }
      val nrm = math.sqrt(ss)
      if (nrm == 0.0) raw
      else raw.map(x => (x.toDouble / nrm).toFloat)
    }
  }

  /** Feature extraction over binary content via mapPartitions: ONE model
    * instance per partition (the real-model pattern — amortizes load
    * cost), rows streamed through it. Output: (id, features ARRAY<FLOAT>).
    *
    * E3: a row whose content cannot be embedded (null/empty here; decode
    * exception with a real model) emits NO output row — the reference
    * drops the document on embed failure (main.py:74-75) instead of
    * storing a poisoned vector. flatMap, not map: the guard is part of
    * the operator, not caller policy — a model that THROWS is treated
    * exactly like one that returns None.
    *
    * @param encoder injectable model factory (default: the deterministic
    *                stub) — swapping in a real CLIP/ONNX tower is a
    *                constructor argument, not an operator edit */
  def extractFeatures(
      media: DataFrame,
      idCol: String,
      contentCol: String,
      dim: Int,
      encoder: MediaEncoderFactory = StubEncoderFactory): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col(idCol), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val model = encoder.create(dim) // per-partition handle
        rows.flatMap { case (id, content) =>
          val feats =
            try model.embedOpt(content)
            catch { case scala.util.control.NonFatal(_) => None }
          feats.map(v => (id, v))
        }
      }
    out.toDF(idCol, "features")
  }
}
