package graft

import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth: JSON/CSV ingestion with corrupt-row quarantine,
  * partitioned sinks with partition pruning verified IN THE PLAN, and
  * edge-log compaction. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSON-lines batch source: valid rows parsed, corrupt rows quarantined not fatal") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.write(java.nio.file.Paths.get(s"$dir/batch.jsonl"),
      ("""{"mtype":"text","data":"hello json","seq":1}""" + "\n" +
        """{"mtype":"image","data":"beef","seq":2}""" + "\n" +
        """{this is not json""" + "\n").getBytes)
    // Spark refuses corrupt-column-only queries on raw JSON; cache the
    // parse first (the documented pattern)
    val raw = Sources.readJsonBatch(spark, s"$dir/batch.jsonl").cache()
    val valid = Sources.validRows(raw)
    assert(valid.count() == 2)
    assert(raw.filter(col("_corrupt").isNotNull).count() == 1)
    // flows straight into the ingest contract
    val prepared = graft.operators.Ingest.prepare(valid, GraftConf(dim = 4))
    assert(prepared.select("id").distinct().count() == 2)
  }

  test("JSONL corpus fixture roundtrip: sink → source is byte-faithful; planted corrupt lines quarantine (q185 shape)") {
    val sf = "/root/testdata/sf0.001"
    val fix = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    graft.sources.JsonlFixture.materialize(spark, sf, fix)
    val raw = Sources.readJsonDocuments(spark, fix).cache()
    val parsed = raw.filter(col("_corrupt").isNull)
    val docs = Tables.documents(spark, sf)
    assert(parsed.count() == docs.count(), "row fidelity")
    assert(raw.filter(col("_corrupt").isNotNull).count() ==
      graft.sources.JsonlFixture.NCorrupt.toLong, "planted corrupt count")
    // byte fidelity: text survives JSON escaping exactly
    val mismatch = parsed.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(docs.select(col("doc_id"), sha2(col("text"), 256).as("h0")),
        Seq("doc_id"))
      .filter(col("h") =!= col("h0")).count()
    assert(mismatch == 0, "text roundtrip not byte-faithful")
    // re-materialize: wiped and rewritten, same content (determinism)
    graft.sources.JsonlFixture.materialize(spark, sf, fix)
    assert(Sources.readJsonDocuments(spark, fix)
      .filter(col("_corrupt").isNull).count() == docs.count())
    raw.unpersist()
  }

  test("gzipped JSONL fixture roundtrip: codec'd parts parse identically; corrupt lines quarantine INSIDE the codec (q187 shape)") {
    val sf = "/root/testdata/sf0.001"
    val fix = Files.createTempDirectory("graft_jsonlgz").toString + "/docs"
    graft.sources.JsonlFixture.materializeGzip(spark, sf, fix)
    // every data file really is a gzip member — decompression is
    // extension-driven, so this is the property that makes the read a
    // codec exercise rather than a plain-text rerun
    val parts = new java.io.File(fix).listFiles()
      .map(_.getName).filter(n => n.startsWith("part-") || n.startsWith("zz_"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".gz")),
      s"non-gzip files in the fixture: ${parts.filterNot(_.endsWith(".gz")).mkString(", ")}")
    val raw = Sources.readJsonDocuments(spark, fix).cache()
    val parsed = raw.filter(col("_corrupt").isNull)
    val docs = Tables.documents(spark, sf)
    assert(parsed.count() == docs.count(), "row fidelity under gzip")
    // the malformed lines live inside a .gz member: they must quarantine
    // per-line after decompression, never fail the file
    assert(raw.filter(col("_corrupt").isNotNull).count() ==
      graft.sources.JsonlFixture.NCorrupt.toLong, "planted corrupt count under gzip")
    val mismatch = parsed.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(docs.select(col("doc_id"), sha2(col("text"), 256).as("h0")),
        Seq("doc_id"))
      .filter(col("h") =!= col("h0")).count()
    assert(mismatch == 0, "gzip JSONL roundtrip not byte-faithful")
    raw.unpersist()
  }

  test("zstd JSONL fixture roundtrip: ZstdJniCodec parts parse identically; corrupt lines quarantine INSIDE the frame (q190 shape)") {
    val sf = "/root/testdata/sf0.001"
    val fix = Files.createTempDirectory("graft_jsonlzst").toString + "/docs"
    graft.sources.JsonlFixture.materializeZstd(spark, sf, fix)
    // every data file really is a .zst frame — same extension-driven
    // discovery as gzip, through the engine's own codec
    val parts = new java.io.File(fix).listFiles()
      .map(_.getName).filter(n => n.startsWith("part-") || n.startsWith("zz_"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".zst")),
      s"non-zstd files in the fixture: ${parts.filterNot(_.endsWith(".zst")).mkString(", ")}")
    // the frames must be REAL zstd (magic 0xFD2FB528 LE), not plain text
    // behind a misleading extension
    val firstPart = new java.io.File(fix).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val magic = Files.readAllBytes(firstPart.toPath).take(4)
    assert(magic.sameElements(Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte)),
      s"part file is not a zstd frame: ${magic.mkString(",")}")
    val raw = Sources.readJsonDocuments(spark, fix).cache()
    val parsed = raw.filter(col("_corrupt").isNull)
    val docs = Tables.documents(spark, sf)
    assert(parsed.count() == docs.count(), "row fidelity under zstd")
    assert(raw.filter(col("_corrupt").isNotNull).count() ==
      graft.sources.JsonlFixture.NCorrupt.toLong, "planted corrupt count under zstd")
    val mismatch = parsed.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(docs.select(col("doc_id"), sha2(col("text"), 256).as("h0")),
        Seq("doc_id"))
      .filter(col("h") =!= col("h0")).count()
    assert(mismatch == 0, "zstd JSONL roundtrip not byte-faithful")
    raw.unpersist()
  }

  test("CSV corpus fixture roundtrip: quoting/escaping is byte-faithful; malformed lines quarantine (q186 shape)") {
    val sf = "/root/testdata/sf0.001"
    val fix = Files.createTempDirectory("graft_csvrt").toString + "/docs"
    graft.sources.CsvFixture.materialize(spark, sf, fix)
    val raw = Sources.readCsvDocuments(spark, fix).cache()
    val parsed = raw.filter(col("_corrupt").isNull)
    val docs = Tables.documents(spark, sf)
    assert(parsed.count() == docs.count(), "row fidelity")
    assert(raw.filter(col("_corrupt").isNotNull).count() ==
      graft.sources.CsvFixture.NCorrupt.toLong, "planted corrupt count")
    // the perturbation really forces quoting: every parsed text carries
    // the embedded comma and quotes, and survives byte-exactly
    val mismatch = parsed.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(docs.select(col("doc_id"),
        sha2(graft.sources.CsvFixture.perturb(col("text"), col("lang")), 256)
          .as("h0")), Seq("doc_id"))
      .filter(col("h") =!= col("h0")).count()
    assert(mismatch == 0, "CSV quote/comma roundtrip not byte-faithful")
    assert(parsed.filter(!col("text").contains(", quoted \"")).count() == 0,
      "perturbation missing — quoting was not exercised")
    raw.unpersist()
  }

  test("CSV batch source with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(s"$dir/batch.csv"),
      "mtype,data,seq\ntext,hello csv,1\ntext,more text,2\n".getBytes)
    val batch = Sources.validRows(Sources.readCsvBatch(spark, s"$dir/batch.csv"))
    assert(batch.count() == 2)
    assert(batch.schema.fieldNames.toSeq == Seq("mtype", "data", "seq"))
  }

  test("partitioned sink: reads with a partition filter scan only matching directories") {
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = Seq(
      ("doc:a", "text", "t1"), ("doc:b", "text", "t2"), ("doc:c", "image", "i1"))
      .toDF("id", "mtype", "data")
    Sinks.writePartitioned(docs, dir, "mtype")
    val read = spark.read.parquet(dir).filter(col("mtype") === "text")
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("mtype"), plan)
    assert(read.count() == 2)
    // physical layout really is one directory per modality
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("mtype=")) == 2)
  }

  test("edge-log compaction: latest seq wins, one row per canonical edge") {
    val dir = Files.createTempDirectory("graft_edges").toString
    val (log, out) = (s"$dir/log", s"$dir/compact")
    Sinks.appendEdgeDelta(
      Seq(("a", "b", 0.5, 1L), ("a", "c", 0.6, 1L)).toDF("src", "dst", "score", "seq"), log)
    Sinks.appendEdgeDelta(
      Seq(("a", "b", 0.9, 2L)).toDF("src", "dst", "score", "seq"), log)
    Sinks.compactEdges(spark, log, out)
    val res = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Double]("score"))
      .toMap
    assert(res == Map(("a", "b") -> 0.9, ("a", "c") -> 0.6))
  }
}
