package graft

import graft.operators.{GraphBuild, Pipelines}
import org.apache.spark.sql.functions._

/** Replay of the reference's ingest-smoke shape (SURVEY.md §5.4): ~30
  * short texts (including single words) + ~30 binary items tagged as
  * images, ingested in arrival order, then the reference's behavioral
  * invariants checked: content-hash dedup makes resubmission a no-op
  * (main.py:80-81), each submit yields <= submitK neighbors with
  * <= k/2 per modality bucket (main.py:245-249), and cross-modal edges
  * are floored at 0.8 (main.py:272-273). Corpus is synthetic but
  * shape-matched (short texts, repeated single words, two modalities). */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(dim = 16)

  private val texts: Seq[String] =
    Seq("simplicity", "technology", "resilience", "curiosity", "gratitude",
      "a journey of a thousand miles begins under one small step",
      "the mountain keeps its silence while the river keeps moving",
      "creativity is intelligence having fun with the unknown",
      "every sunset is a promise of another morning",
      "small habits compound into remarkable outcomes",
      "the library smelled of old paper and quiet ambition",
      "rain traced slow rivers down the window glass",
      "a good question outlives every easy answer",
      "courage is fear that has done its homework",
      "maps end where curiosity begins") ++
      (1 to 15).map(i => s"short note number $i about ordinary things")

  private val images: Seq[Array[Byte]] =
    (1 to 30).map(i => Array.tabulate[Byte](64)(j => ((i * 31 + j) % 127).toByte))

  test("replay: dedup no-op, neighbor quotas, cross-modal boost floor") {
    // arrival order: texts then images, in 4 batches (the reference
    // ingests serially; batching preserves per-item semantics because
    // within-batch dedup is first-wins by seq)
    val items = texts.map(t => ("text", t)) ++
      images.map(b => ("image", b.map("%02x".format(_)).mkString))
    val batches = items.zipWithIndex
      .map { case ((mt, data), i) => (mt, data, i.toLong) }
      .grouped(15).toSeq

    var docs = Seq.empty[(String, String, String, Seq[Float])]
      .toDF("id", "mtype", "data", "embedding")
    var edges = Seq.empty[(String, String, Double, Long)]
      .toDF("src", "dst", "score", "seq")

    batches.foreach { batch =>
      val batchDf = batch.toDF("mtype", "data", "seq")
      val (newDocs, knn, delta) = Pipelines.submit(docs, batchDf, conf)
      // neighbor quotas per newly ingested doc
      val counts = knn.groupBy("qid", "mtype").count().collect()
      counts.groupBy(_.getString(0)).foreach { case (_, rows) =>
        assert(rows.map(_.getLong(2)).sum <= conf.submitK)
        rows.foreach(r => assert(r.getLong(2) <= conf.submitK / 2))
      }
      edges = GraphBuild.upsertEdges(edges, delta)
      docs = newDocs
    }

    val total = docs.count()
    assert(total == items.map(_._2).distinct.size) // content-hash identity

    // resubmitting the whole corpus is a no-op
    val resubmit = items.zipWithIndex
      .map { case ((mt, data), i) => (mt, data, 1000L + i) }
      .toDF("mtype", "data", "seq")
    val (docs2, _, _) = Pipelines.submit(docs, resubmit, conf)
    assert(docs2.count() == total)

    // graph invariants: canonical form; cross-modal edges floored at 0.8
    assert(edges.filter(col("src") >= col("dst")).count() == 0)
    val typed = edges
      .join(docs.select(col("id").as("src"), col("mtype").as("smt")), Seq("src"))
      .join(docs.select(col("id").as("dst"), col("mtype").as("dmt")), Seq("dst"))
    val crossBelow = typed
      .filter(col("smt") =!= col("dmt")).filter(col("score") < 0.8).count()
    assert(crossBelow == 0)
    // and the graph is non-trivial
    assert(edges.count() > 0)
  }
}
