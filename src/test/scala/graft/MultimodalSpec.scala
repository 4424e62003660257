package graft

import graft.operators.{Embed, Multimodal}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Multimodal plumbing: binaryFile source, content-addressed ids, stub
  * decode determinism, frame slicing shape, and — the key check — the
  * imperative mapPartitions feature extractor producing BIT-IDENTICAL
  * vectors to the declarative Embed.embedBinary column expression. */
class MultimodalSpec extends SparkSpec {

  private lazy val mediaDir: String = {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), Array.tabulate[Byte](256)(_.toByte))
    Files.write(dir.resolve("b.wav"), Array.fill[Byte](100)(7))
    Files.write(dir.resolve("c.mp4"), "fake video bytes".getBytes)
    Files.write(dir.resolve("d.bin"), Array[Byte](1, 2, 3))
    dir.toString
  }

  test("binaryFile source: content-addressed id + extension modality tag (S2)") {
    val df = Multimodal.fromBinaryFiles(spark, mediaDir)
    val rows = df.collect()
    assert(rows.length == 4)
    val byType = rows.map(r => r.getAs[String]("mtype")).sorted.toSeq
    assert(byType == Seq("audio", "binary", "image", "video"))
    assert(rows.forall(_.getAs[String]("id").startsWith("doc:")))
    // content round-trips
    val png = rows.find(_.getAs[String]("mtype") == "image").get
    assert(png.getAs[Array[Byte]]("content").length == 256)
  }

  test("decodeMeta: deterministic fake dims within bounds") {
    val df = Multimodal.fromBinaryFiles(spark, mediaDir)
      .select(Multimodal.decodeMeta(col("content")).as("m"))
    val metas = df.select("m.width", "m.height", "m.channels").collect()
    assert(metas.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 1920))
    assert(metas.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 1080))
    // determinism: second run identical
    val again = Multimodal.fromBinaryFiles(spark, mediaDir)
      .select(Multimodal.decodeMeta(col("content")).as("m"))
      .select("m.width", "m.height", "m.channels").collect()
    assert(metas.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("frameSample: n slices covering the content") {
    val df = Multimodal.fromBinaryFiles(spark, mediaDir)
      .filter(col("mtype") === "image")
      .select(Multimodal.frameSample(col("content"), 4).as("frames"))
    val frames = df.collect().head.getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 64)) // 256 / 4
  }

  test("extractFeatures (mapPartitions model) == Embed.embedBinary (column expr), bit for bit") {
    val media = Multimodal.fromBinaryFiles(spark, mediaDir)
    val imperative = Multimodal.extractFeatures(media, "id", "content", dim = 16)
    val declarative = media.select(col("id"),
      Embed.embedBinary(col("content"), 16).as("features"))
    val a = imperative.collect().map(r =>
      r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
    val b = declarative.collect().map(r =>
      r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(a == b) // exact Float equality — same hash, same fold, same casts
    assert(a.values.forall(_.length == 16))
  }

  test("BinaryFixture: deterministic tree from documents.parquet; poison files drop (E3)") {
    val sfDir = "/root/testdata/sf0.001"
    val fix = Files.createTempDirectory("graft_binfix").toString
    graft.sources.BinaryFixture.materialize(spark, sfDir, fix, nPoison = 2)
    val nDocs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull && length(col("text")) > 0)
      .count()
    val files = new java.io.File(fix).listFiles()
    assert(files.length == nDocs + 2, "one file per selected doc + poison")
    // re-materializing is byte-identical (content derives only from parquet)
    val before = files.map(f => f.getName -> f.length()).toMap
    graft.sources.BinaryFixture.materialize(spark, sfDir, fix, nPoison = 2)
    val after = new java.io.File(fix).listFiles().map(f => f.getName -> f.length()).toMap
    assert(before == after)
    // full pipeline: poison (empty) files never reach the feature output
    val media = Multimodal.fromBinaryFiles(spark, fix)
    val feats = Multimodal.extractFeatures(media, "id", "content", dim = 16)
    assert(media.count() == nDocs + 2)
    assert(feats.count() == nDocs)
  }

  test("E3: a row the model cannot embed emits NO output row (main.py:74-75)") {
    import spark.implicits._
    val media = Seq(
      ("doc:good", "payload bytes".getBytes("UTF-8")),
      ("doc:poisoned-empty", Array.empty[Byte]),
      ("doc:poisoned-null", null.asInstanceOf[Array[Byte]]),
      ("doc:poisoned-allzero", Array[Byte](0, 0, 0))
    ).toDF("id", "content")
    val out = Multimodal.extractFeatures(media, "id", "content", dim = 16)
    val ids = out.collect().map(_.getString(0)).toSet
    assert(ids == Set("doc:good"), s"poisoned rows must drop, got $ids")
  }

  /** A second MediaEncoder implementation: byte-histogram features, None
    * on content starting with 'X', THROWS on content starting with 'Y' —
    * exercises every branch of the injection contract a real codec hits. */
  private object ToyEncoderFactory extends Multimodal.MediaEncoderFactory {
    def create(dim: Int): Multimodal.MediaEncoder =
      new Multimodal.MediaEncoder {
        def embedOpt(content: Array[Byte]): Option[Array[Float]] =
          if (content == null || content.isEmpty) None
          else if (content(0) == 'X') None
          else if (content(0) == 'Y') throw new RuntimeException("decode error")
          else Some(Array.tabulate(dim)(i =>
            content.count(b => ((b & 0xff) % dim) == i).toFloat))
      }
  }

  test("MediaEncoder injection: the operator runs the SAME contract against the stub and a second implementation") {
    import spark.implicits._
    val media = Seq(
      ("doc:a", "alpha payload".getBytes("UTF-8")),
      ("doc:b", "beta payload longer than alpha".getBytes("UTF-8")),
      ("doc:x-undecodable", "X-prefixed".getBytes("UTF-8")),
      ("doc:y-throws", "Y-prefixed".getBytes("UTF-8")),
      ("doc:empty", Array.empty[Byte])
    ).toDF("id", "content")
    // contract, THREE implementations (stub, toy, histogram projection):
    // undecodable/throwing rows DROP, every surviving row carries a
    // dim-length vector
    for (factory <- Seq(Multimodal.StubEncoderFactory: Multimodal.MediaEncoderFactory,
        ToyEncoderFactory, Multimodal.HistogramProjectionEncoderFactory)) {
      val out = Multimodal.extractFeatures(media, "id", "content",
        dim = 8, encoder = factory).collect()
      val ids = out.map(_.getString(0)).toSet
      val expectDropped = factory match {
        case ToyEncoderFactory => Set("doc:x-undecodable", "doc:y-throws", "doc:empty")
        case _ => Set("doc:empty") // stub decodes X/Y payloads fine
      }
      assert(ids == Set("doc:a", "doc:b", "doc:x-undecodable", "doc:y-throws") -- expectDropped,
        s"$factory: $ids")
      assert(out.forall(_.getSeq[Float](1).length == 8), s"$factory: bad dim")
    }
    // the histogram encoder is a real model, not a hash: its features
    // are scale-invariant in the byte DISTRIBUTION (the quantized
    // frequency profile divides length out), so content ++ content
    // embeds IDENTICALLY while a different distribution embeds
    // differently — both behaviors impossible for the whole-blob-hash
    // stub, proving the injection reached a genuinely different model
    val hist = Multimodal.HistogramProjectionEncoderFactory.create(8)
    val base = "abcabcabc".getBytes("UTF-8")
    val doubled = base ++ base
    val other = "zzzzzzzzz".getBytes("UTF-8")
    assert(hist.embedOpt(base).get.toSeq == hist.embedOpt(doubled).get.toSeq,
      "frequency profile must be scale-invariant")
    assert(hist.embedOpt(base).get.toSeq != hist.embedOpt(other).get.toSeq,
      "different byte distributions must embed differently")
    val e = hist.embedOpt(base).get
    val nrm = math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(nrm - 1.0) < 1e-6, s"not unit-norm: $nrm")
    assert(hist.embedOpt(Array[Byte](0, 0, 0)).isEmpty, "all-NUL must drop")
    assert(hist.embedOpt(Array.empty[Byte]).isEmpty, "empty must drop")

    // the toy features really are the toy's (injection reached the model)
    val toy = Multimodal.extractFeatures(media, "id", "content",
      dim = 8, encoder = ToyEncoderFactory).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val want = "alpha payload".getBytes("UTF-8")
      .count(b => ((b & 0xff) % 8) == 0).toFloat
    assert(toy("doc:a")(0) == want)
    // default argument still routes to the stub (q30/q41 path unchanged)
    val viaDefault = Multimodal.extractFeatures(media, "id", "content", dim = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
    val viaStub = Multimodal.extractFeatures(media, "id", "content",
      dim = 8, encoder = Multimodal.StubEncoderFactory)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(viaDefault == viaStub)
  }

  test("learned quantized projection (4th implementation, r17 verdict #6): " +
      "trained in-engine, contract-identical, ONE model create per partition") {
    import spark.implicits._
    // training corpus with two byte-distribution families, so the PCA
    // has real variance structure to learn
    val train = (0 until 64).map { i =>
      val s =
        if (i % 2 == 0) s"lowercase text payload number $i with many words"
        else s"ZZ##$i##BIN" * 3
      (s"t:$i", s.getBytes("UTF-8"))
    }.toDF("id", "content")
    val w = Multimodal.trainHistogramProjection(train, "content", dim = 8)
    assert(w.length == 8 && w.forall(_.length == 256))
    assert(w.forall(_.exists(_ != 0)),
      "every learned row must carry non-zero quantized weights")
    val factory = Multimodal.LearnedProjectionEncoderFactory(w)

    // E3 contract: poisoned rows drop, survivors are unit dim-vectors
    val media = Seq(
      ("doc:a", "alpha payload".getBytes("UTF-8")),
      ("doc:b", "beta payload longer than alpha".getBytes("UTF-8")),
      ("doc:empty", Array.empty[Byte]),
      ("doc:allzero", Array[Byte](0, 0, 0))
    ).toDF("id", "content")
    val out = Multimodal.extractFeatures(media, "id", "content",
      dim = 8, encoder = factory).collect()
    assert(out.map(_.getString(0)).toSet == Set("doc:a", "doc:b"))
    out.foreach { r =>
      val e = r.getSeq[Float](1)
      assert(e.length == 8)
      val nrm = math.sqrt(e.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-6, s"not unit-norm: $nrm")
    }
    // a real frequency-profile model, like the frozen-init third impl:
    // scale-invariant in the distribution, sensitive to it
    val m = factory.create(8)
    val base = "abcabcabc".getBytes("UTF-8")
    assert(m.embedOpt(base).get.toSeq == m.embedOpt(base ++ base).get.toSeq)
    // probe with bytes the TRAINING corpus covers: a learned projection
    // legitimately zeros bytes it never saw vary (e.g. 'z' here), and
    // the E3 contract maps a zero projection to a dropped row
    assert(m.embedOpt(base).get.toSeq !=
      m.embedOpt("with many words".getBytes("UTF-8")).get.toSeq)
    // the LEARNED weights differ from the frozen-init family — the
    // injection reached a genuinely trained model
    val frozen = Multimodal.HistogramProjectionEncoderFactory.create(8)
    assert(m.embedOpt(base).get.toSeq != frozen.embedOpt(base).get.toSeq)

    // model-once-per-partition (the real-model cost contract): create()
    // runs exactly once per input partition, not per row
    MultimodalSpec.creates.set(0)
    val many = (0 until 100).map(i =>
        (s"doc:$i", s"payload number $i".getBytes("UTF-8")))
      .toDF("id", "content").repartition(4)
    val n = Multimodal.extractFeatures(many, "id", "content",
      dim = 8, encoder = CountingEncoderFactory(factory)).count()
    assert(n == 100L)
    assert(MultimodalSpec.creates.get() == 4,
      s"expected one model create per partition (4), got " +
        s"${MultimodalSpec.creates.get()}")
  }
}

/** Counting wrapper (top-level so the Spark closure never captures the
  * suite instance): local[*] runs executors in this JVM, so the static
  * counter observes executor-side create() calls directly. */
private final case class CountingEncoderFactory(
    inner: Multimodal.MediaEncoderFactory)
    extends Multimodal.MediaEncoderFactory {
  def create(dim: Int): Multimodal.MediaEncoder = {
    MultimodalSpec.creates.incrementAndGet()
    inner.create(dim)
  }
}

object MultimodalSpec {
  val creates = new java.util.concurrent.atomic.AtomicInteger(0)
}
