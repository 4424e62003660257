package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Embed, Ingest}
import org.apache.spark.sql.functions._

/** Scalar-layer semantics: vector math, normalization, text primitives,
  * embedder contract, ingest dedup idempotence. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotProduct: exact on axis vectors, symmetric") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val d1 = df.select(VectorFunctions.dotProduct(col("a"), col("b"))).as[Double].head()
    val d2 = df.select(VectorFunctions.dotProduct(col("b"), col("a"))).as[Double].head()
    assert(d1 == 32.0 && d2 == 32.0)
  }

  test("l2Normalize: unit norm out; zero vector passes through") {
    val df = Seq(Tuple1(Seq(3f, 4f)), Tuple1(Seq(0f, 0f))).toDF("v")
    val norms = df.select(
      VectorFunctions.l2Norm(VectorFunctions.l2Normalize(col("v"))).as("n"))
      .as[Double].collect()
    assert(math.abs(norms(0) - 1.0) < 1e-7)
    assert(norms(1) == 0.0) // zero vector unchanged, no NaN
  }

  test("embedText: deterministic, fixed dim, unit norm (E1 contract)") {
    val df = Seq("hello world", "hello world", "other").toDF("t")
      .select(col("t"), Embed.embedText(col("t"), 32).as("v"))
    val rows = df.select(col("t"), col("v"),
      VectorFunctions.l2Norm(col("v")).as("n")).collect()
    val v0 = rows(0).getSeq[Float](1)
    val v1 = rows(1).getSeq[Float](1)
    val v2 = rows(2).getSeq[Float](1)
    assert(v0.length == 32)
    assert(v0 == v1) // same content → same vector
    assert(v0 != v2)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("n") - 1.0) < 1e-6))
  }

  test("tokens/charShingles: empty and short-string edges") {
    val df = Seq("", "ab", "The quick brown fox!").toDF("text")
    val res = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      size(TextFunctions.charShingles(col("text"), 3)).as("sh")).collect()
    assert(res(0).getInt(0) == 0 && res(0).getInt(1) == 0)
    assert(res(1).getInt(0) == 1 && res(1).getInt(1) == 0) // len 2 < n=3
    assert(res(2).getInt(0) == 4)
  }

  test("docFingerprint: order-sensitive, deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fp = df.select(TextFunctions.docFingerprint(col("text"))).as[Long].collect()
    assert(fp(0) == fp(2) && fp(0) != fp(1))
  }

  test("ingest dedup is idempotent: ingest(x ++ x) == ingest(x) (main.py:80-81)") {
    val batch = Seq(("text", "doc one", 1L), ("text", "doc two", 2L))
      .toDF("mtype", "data", "seq")
    val doubled = batch.unionByName(
      batch.withColumn("seq", col("seq") + 10))
    val empty = Seq.empty[(String, String)].toDF("id", "mtype")
    val conf = GraftConf(dim = 8)
    val once = Ingest.dedupDelta(Ingest.prepare(batch, conf), empty)
    val twice = Ingest.dedupDelta(Ingest.prepare(doubled, conf), empty)
    assert(once.select("id", "seq").collect().toSet ==
      twice.select("id", "seq").collect().toSet)
  }

  test("minhash LSH: duplicate docs collide in every band; jaccard 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhashLsh(docs, "doc_id", "text",
      shingleWidth = 3, numHashes = 8, bands = 4, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L && pairs.head.getAs[Long]("id_b") == 2L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical token multisets agree; disjoint vocab differs") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "zeta eta theta iota kappa")
      .toDF("text").select(Dedup.simhash(col("text"), 32).as("s"))
    val s = df.as[Long].collect()
    assert(s(0) == s(1))
    assert(s(0) != s(2))
  }

  test("F3: float32 little-endian pack/unpack round-trips (db.py:21-22 wire parity)") {
    val df = Seq(Tuple1(Seq(1.5f, -2.25f, 3.125f))).toDF("v")
    val back = df.select(
      VectorFunctions.bytesToVec(VectorFunctions.vecToBytes(col("v"))).as("r"),
      VectorFunctions.vecToBytes(col("v")).as("b")).collect().head
    assert(back.getSeq[Float](0) == Seq(1.5f, -2.25f, 3.125f))
    // 1.5f little-endian = 00 00 C0 3F
    assert(back.getAs[Array[Byte]](1).take(4).toSeq ==
      Seq(0x00.toByte, 0x00.toByte, 0xC0.toByte, 0x3F.toByte))
  }

  test("F10: file extension extraction (os.path.splitext semantics)") {
    val df = Seq("uploads/a.png", "x.tar.gz", "noext", "dir.d/file").toDF("p")
    val ext = df.select(graft.functions.HashFunctions.fileExt(col("p"))).as[String].collect()
    assert(ext.toSeq == Seq(".png", ".gz", "", ""))
  }

  test("codegen DotProductF == HOF dot product, bit for bit, on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val both = pairs.select(
      VectorFunctions.dotProduct(col("a.embedding"), col("b.embedding")).as("native"),
      VectorFunctions.dotProductHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("DotProductF: length mismatch yields NULL (matches HOF), equal lengths don't") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 1f)),      // mismatched dims
      (Seq(1f, 2f), Seq(3f, 4f))            // matched dims
    ).toDF("a", "b")
    val out = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("native"),
      VectorFunctions.dotProductHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // both forms: null
    assert(out(1).getDouble(0) == 11.0 && out(1).getDouble(1) == 11.0)
  }

  test("typed Dataset[Doc]/Dataset[Edge] views round-trip (SURVEY §1.3 model)") {
    implicit val s = spark
    val docsDf = Seq(("doc:a", "text", "hello", Seq(1f, 0f)))
      .toDF("id", "mtype", "data", "embedding")
    val ds = graft.model.Model.asDocs(docsDf)
    val doc = ds.collect().head
    assert(doc.id == "doc:a" && doc.embedding.toSeq == Seq(1f, 0f))
    val edgesDf = Seq(("a", "b", 0.5, 1L)).toDF("src", "dst", "score", "seq")
    val e = graft.model.Model.asEdges(edgesDf).collect().head
    assert(e.src == "a" && e.score == 0.5 && e.seq == 1L)
  }
}
