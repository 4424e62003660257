package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.PortableMath.{rnd, sqlRnd}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from the SURVEY.md §2
  * inventory (or the LLM-pipeline extension set), expressed Spark-first,
  * with a DuckDB oracle in [[oracleSql]] that mirrors the exact arithmetic
  * (same fold order, same Double casts, same rounding) so the driver's
  * hash-compare is exact.
  *
  * Conventions:
  *  - counts from Spark `size`/`length`/`row_number` are cast to LONG
  *    (DuckDB emits BIGINT for these);
  *  - accumulated doubles are rounded identically on both sides with
  *    PortableMath.rnd / sqlRnd (built-in round() differs on
  *    half-boundaries between engines);
  *  - every result is totally ordered with a unique tie-breaker.
  */
object SparkEntry {

  /** Flagship: the reference's /search query (§2.3 KNN with modality
    * balancing) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnModalBalanced(spark, "/root/testdata/sf0.001")

  // ---- shared Spark fragments -------------------------------------------

  /** docs view over embeddings.parquet: modality stand-in = label % 2
    * (FIXTURES.md §2). */
  private def embDocs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id").cast("string").as("id"),
      concat(lit("m"), (col("label") % 2).cast("string")).as("mtype"),
      col("embedding"))

  /** Query batch: every 100th vector plays a search request. */
  private def embQueries(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") % 100 === 0)
      .select(
        col("vec_id").cast("string").as("qid"),
        concat(lit("m"), (col("label") % 2).cast("string")).as("qtype"),
        col("embedding").as("qvec"))

  /** §2.3 KNN with the query's modality tag re-attached (graph building
    * needs qtype for the cross-modal boost). */
  private def knnWithQtype(s: SparkSession, dir: String): DataFrame =
    Knn.search(embDocs(s, dir), embQueries(s, dir), k = 10)
      .join(embQueries(s, dir).select("qid", "qtype"), Seq("qid"))

  private def knnModalBalanced(s: SparkSession, dir: String): DataFrame =
    Knn.search(embDocs(s, dir), embQueries(s, dir), k = 10)
      .select(col("qid"), col("id"), col("mtype"),
        rnd(col("sim"), 6).as("sim"), col("rank").cast("long").as("rnk"))
      .orderBy("qid", "rnk")

  private def knnTopK(s: SparkSession, dir: String): DataFrame =
    Knn.topK(embDocs(s, dir), embQueries(s, dir).drop("qtype"), k = 5)
      .select(col("qid"), col("id"),
        rnd(col("sim"), 6).as("sim"), col("rank").cast("long").as("rnk"))
      .orderBy("qid", "rnk")

  /** Ingest dedup delta (S3/S8/O6): existing corpus = doc_id %10 != 0;
    * incoming batch = (%10 == 0) ∪ (%7 == 0) with the second leg arriving
    * later (seq offset) — exercises within-batch first-wins AND
    * anti-join-against-existing. */
  private def ingestDelta(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val existing = base.filter(col("doc_id") % 10 =!= 0)
      .select(graft.functions.HashFunctions.docId(col("text")).as("id"))
    val batch = base.filter(col("doc_id") % 10 === 0)
      .withColumn("seq", col("doc_id"))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .withColumn("seq", col("doc_id") + 10000))
      .withColumnRenamed("text", "data")
      .withColumn("mtype", lit("text"))
    val prepared = Ingest.prepare(batch, GraftConf(dim = 16))
    Ingest.dedupDelta(prepared, existing)
      .select("id", "seq", "mtype")
      .orderBy("id")
  }

  /** Graph edge upsert (G1 + latest-wins): delta A = edges from the full
    * KNN; delta B = re-scored edges for the top-3 neighbors arriving
    * later. Upsert must keep B where present, A elsewhere. */
  private def edgeUpsert(s: SparkSession, dir: String): DataFrame = {
    val knn = knnWithQtype(s, dir)
    val deltaA = GraphBuild.edgeDelta(knn.withColumn("seq", lit(1L)))
    val deltaB = GraphBuild.edgeDelta(
      knn.filter(col("rank") <= 3)
        .withColumn("sim", col("sim") * 0.9)
        .withColumn("seq", lit(2L)))
    GraphBuild.upsertEdges(deltaA, deltaB)
      .select(col("src"), col("dst"), rnd(col("score"), 6).as("score"), col("seq"))
      .orderBy("src", "dst")
  }

  /** Canonical deduped edge table from the KNN run (shared by q14/q15). */
  private def knnEdges(s: SparkSession, dir: String): DataFrame = {
    val delta = GraphBuild.edgeDelta(
      knnWithQtype(s, dir).withColumn("seq", lit(1L)))
    GraphBuild.upsertEdges(delta.limit(0), delta)
  }

  /** Faithful G2 expansion (depth=1 single-pop quirk) over the KNN graph.
    * Seeds = top-5 only (edges come from the full k=10 KNN), so the
    * expansion step genuinely contributes non-seed nodes. */
  private def graphExpand(s: SparkSession, dir: String): DataFrame = {
    val seeds = knnWithQtype(s, dir)
      .filter(col("rank") <= 5).select("qid", "id", "sim", "rank")
    GraphExpand.expandFaithful(seeds, knnEdges(s, dir), k = 20)
      .select(col("qid"), col("id"), rnd(col("score"), 6).as("score"),
        col("origin"), col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** Graph views (G3-G5): per-node degree + strength. */
  private def graphDegrees(s: SparkSession, dir: String): DataFrame =
    GraphViews.degrees(knnEdges(s, dir))
      .select(col("id"), col("degree"), rnd(col("strength"), 6).as("strength"))
      .orderBy("id")

  // ---- the registry -----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q03_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q05_local_supplier" -> ((s, d) => Relational.q5LocalSupplier(s, d)),
    "q06_top_orders_per_customer" ->
      ((s, d) => Relational.qTopOrdersPerCustomer(s, d)
        .withColumn("rk", col("rk").cast("long"))),
    "q07_event_rollup" -> ((s, d) => Relational.qEventRollup(s, d)),
    "q08_order_price_deciles" ->
      ((s, d) => Relational.qOrderPriceDeciles(s, d)
        .withColumn("decile", col("decile").cast("long"))
        .select("decile", "n_orders", "lo", "hi")),
    "q10_knn_topk" -> ((s, d) => knnTopK(s, d)),
    "q11_knn_modal_balanced" -> ((s, d) => knnModalBalanced(s, d)),
    "q12_ingest_dedup_delta" -> ((s, d) => ingestDelta(s, d)),
    "q13_edge_upsert" -> ((s, d) => edgeUpsert(s, d)),
    "q14_graph_expand" -> ((s, d) => graphExpand(s, d)),
    "q15_graph_degrees" -> ((s, d) => graphDegrees(s, d)),
    "q20_text_analysis" ->
      ((s, d) => TextAnalysis.analyze(Tables.documents(s, d), "doc_id", "text")
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .withColumn("n_chars", col("n_chars").cast("long"))
        .orderBy("id")),
    "q21_dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val all = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.exactDupGroups(all, "doc_id", "text").orderBy("content_hash")
    }),
    "q22_neardup_embedding" -> ((s, d) =>
      Dedup.nearDupEmbedding(
          Tables.embeddings(s, d), "vec_id", "embedding", "label", 0.35)
        .orderBy("id_a", "id_b"))
  )

  // ---- oracles ----------------------------------------------------------

  /** DuckDB dot-product mirror of VectorFunctions.dotProduct: element-wise
    * Double products, strict left fold from 0.0. */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), " +
      s"(acc, v) -> acc + v)"

  private val sqlStopwords: String =
    graft.functions.TextFunctions.EnglishStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB mirror of TextFunctions.tokens. */
  private val sqlToks: String =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** DuckDB mirror of TextFunctions.qualityScore (pre-rounding). */
  private val sqlQuality: String =
    "0.4 * least(length(text) / 500.0, 1.0) " +
      "+ 0.3 * least(sw_ratio / 0.2, 1.0) " +
      "+ 0.3 * (1.0 - least(p_ratio * 4.0, 1.0))"

  /** Shared §2.3 KNN CTE chain ending in
    * knn(qid, qtype, id, mtype, sim, rnk) — the SQL mirror of
    * Knn.search(embDocs, embQueries, k=10) with qtype attached. */
  private val sqlKnnCtes: String =
    s"""docs AS (
       |  SELECT CAST(vec_id AS VARCHAR) AS id,
       |         'm' || CAST(label % 2 AS VARCHAR) AS mtype, embedding
       |  FROM embeddings),
       |q AS (
       |  SELECT CAST(vec_id AS VARCHAR) AS qid,
       |         'm' || CAST(label % 2 AS VARCHAR) AS qtype,
       |         embedding AS qvec
       |  FROM embeddings WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.qid, q.qtype, d.id, d.mtype,
       |    CASE WHEN d.id = q.qid THEN 1.0
       |         ELSE ${sqlDot("q.qvec", "d.embedding")} END AS sim,
       |    CASE WHEN d.mtype = q.qtype THEN 'same' ELSE 'cross' END AS bucket
       |  FROM q CROSS JOIN docs d),
       |overfetched AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS ofr
       |    FROM scored) WHERE ofr <= 60),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid, bucket
       |                                 ORDER BY sim DESC, id) AS brank
       |    FROM overfetched) WHERE brank <= 5),
       |unioned AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY (CASE WHEN bucket = 'same' THEN 0 ELSE 1 END), sim DESC, id) AS urank
       |    FROM kept) WHERE urank <= 10),
       |knn AS (
       |  SELECT qid, qtype, id, mtype, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rnk
       |  FROM unioned)""".stripMargin

  /** SQL mirror of GraphBuild.edgeDelta over the `knn` CTE (score boost
    * F6 + canonical undirected form), parameterized by sim expression,
    * seq literal and an extra filter. */
  private def sqlEdgeDelta(simExpr: String, seq: Int, extraWhere: String): String =
    s"""SELECT least(qid, id) AS src, greatest(qid, id) AS dst,
       |    CASE WHEN mtype <> qtype THEN greatest($simExpr, 0.8)
       |         ELSE $simExpr END AS score,
       |    CAST($seq AS BIGINT) AS seq
       |  FROM knn WHERE id <> qid$extraWhere""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  ${sqlRnd("sum(l_extendedprice)", 2)} AS sum_base_price,
        |  ${sqlRnd("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS sum_disc_price,
        |  ${sqlRnd("avg(l_quantity)", 6)} AS avg_qty,
        |  ${sqlRnd("avg(l_discount)", 6)} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_shipping_priority" ->
      s"""SELECT l_orderkey,
        |  ${sqlRnd("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q05_local_supplier" ->
      s"""SELECT r_name, n_name,
        |  ${sqlRnd("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q06_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q07_event_rollup" ->
      s"""SELECT user_id, event_type,
        |  count(*) AS n_events,
        |  ${sqlRnd("sum(value)", 4)} AS sum_value,
        |  ${sqlRnd("max(value)", 6)} AS max_value
        |FROM events
        |GROUP BY user_id, event_type
        |HAVING count(*) >= 2
        |ORDER BY user_id, event_type""".stripMargin,
    "q08_order_price_deciles" ->
      s"""SELECT decile, count(*) AS n_orders,
        |  ${sqlRnd("min(o_totalprice)", 2)} AS lo,
        |  ${sqlRnd("max(o_totalprice)", 2)} AS hi
        |FROM (
        |  SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey) AS decile
        |  FROM orders)
        |GROUP BY decile ORDER BY decile""".stripMargin,
    "q10_knn_topk" ->
      s"""WITH docs AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS id, embedding FROM embeddings),
         |q AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qvec
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, d.id, ${sqlDot("q.qvec", "d.embedding")} AS sim
         |  FROM q CROSS JOIN docs d),
         |ranked AS (
         |  SELECT qid, id, sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rnk
         |  FROM scored)
         |SELECT qid, id, ${sqlRnd("sim", 6)} AS sim, rnk
         |FROM ranked WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "q11_knn_modal_balanced" ->
      s"""WITH $sqlKnnCtes
         |SELECT qid, id, mtype, ${sqlRnd("sim", 6)} AS sim, rnk
         |FROM knn
         |ORDER BY qid, rnk""".stripMargin,
    "q12_ingest_dedup_delta" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |existing AS (
        |  SELECT concat('doc:', sha256(text)) AS id FROM base WHERE doc_id % 10 <> 0),
        |batch AS (
        |  SELECT concat('doc:', sha256(text)) AS id, doc_id AS seq, 'text' AS mtype
        |  FROM base WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT concat('doc:', sha256(text)), doc_id + 10000, 'text'
        |  FROM base WHERE doc_id % 7 = 0),
        |batch_first AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq) AS _rn
        |    FROM batch) WHERE _rn = 1)
        |SELECT id, seq, mtype FROM batch_first
        |WHERE id NOT IN (SELECT id FROM existing)
        |ORDER BY id""".stripMargin,
    "q13_edge_upsert" ->
      s"""WITH $sqlKnnCtes,
         |ea AS (
         |  ${sqlEdgeDelta("sim", 1, "")}),
         |eb AS (
         |  ${sqlEdgeDelta("sim * 0.9", 2, " AND rnk <= 3")}),
         |upserted AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src, dst ORDER BY seq DESC) AS _rn
         |    FROM (SELECT * FROM ea UNION ALL SELECT * FROM eb))
         |  WHERE _rn = 1)
         |SELECT src, dst, ${sqlRnd("score", 6)} AS score, seq
         |FROM upserted ORDER BY src, dst""".stripMargin,
    "q14_graph_expand" ->
      s"""WITH $sqlKnnCtes,
         |ed AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src, dst ORDER BY seq DESC) AS _rn
         |    FROM (${sqlEdgeDelta("sim", 1, "")}))
         |  WHERE _rn = 1),
         |sym AS (
         |  SELECT src AS u, dst AS v, score FROM ed
         |  UNION ALL SELECT dst, src, score FROM ed),
         |head AS (SELECT qid AS h_qid, id AS h_id, sim AS h_sim FROM knn WHERE rnk = 1),
         |nb AS (
         |  SELECT h_qid AS qid, v AS id, h_sim * score * 0.9 AS score, 1 AS prio
         |  FROM head JOIN sym ON h_id = u),
         |sd AS (SELECT qid, id, sim AS score, 0 AS prio FROM knn WHERE rnk <= 5),
         |ud AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid, id
         |                                 ORDER BY prio, score DESC) AS _rn
         |    FROM (SELECT * FROM sd UNION ALL SELECT * FROM nb))
         |  WHERE _rn = 1),
         |fin AS (
         |  SELECT qid, id, score,
         |    CASE WHEN prio = 0 THEN 'seed' ELSE 'expanded' END AS origin,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk
         |  FROM ud)
         |SELECT qid, id, ${sqlRnd("score", 6)} AS score, origin, rnk
         |FROM fin WHERE rnk <= 20
         |ORDER BY qid, rnk""".stripMargin,
    "q15_graph_degrees" ->
      s"""WITH $sqlKnnCtes,
         |ed AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src, dst ORDER BY seq DESC) AS _rn
         |    FROM (${sqlEdgeDelta("sim", 1, "")}))
         |  WHERE _rn = 1),
         |sym AS (
         |  SELECT src AS u, dst AS v, score FROM ed
         |  UNION ALL SELECT dst, src, score FROM ed)
         |SELECT u AS id, count(*) AS degree, ${sqlRnd("sum(score)", 6)} AS strength
         |FROM sym GROUP BY u
         |ORDER BY id""".stripMargin,
    "q20_text_analysis" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id, text, $sqlToks AS toks FROM documents),
         |m AS (
         |  SELECT id, text, toks,
         |    len(toks) AS n_tokens,
         |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_tokens,
         |    length(text) AS n_chars,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(toks, x -> list_contains($sqlStopwords, x))) AS DOUBLE)
         |              / CAST(len(toks) AS DOUBLE) END AS sw_ratio,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |              / CAST(length(text) AS DOUBLE) END AS p_ratio,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |                list_transform(toks, x -> CAST(length(x) AS DOUBLE))),
         |                (a, b) -> a + b) / CAST(len(toks) AS DOUBLE) END AS mtl,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(toks, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))),
         |      (a, h) -> (a * 31 + h % 2147483647) % 2147483647) AS fingerprint
         |  FROM t)
         |SELECT id, n_tokens, n_bpe_tokens, n_chars,
         |  ${sqlRnd("sw_ratio", 6)} AS stopword_ratio,
         |  ${sqlRnd("p_ratio", 6)} AS punct_ratio,
         |  ${sqlRnd("mtl", 6)} AS mean_token_len,
         |  CASE WHEN sw_ratio >= 0.08 THEN 'en' ELSE 'unknown' END AS lang_pred,
         |  ${sqlRnd(sqlQuality, 6)} AS quality,
         |  fingerprint
         |FROM m ORDER BY id""".stripMargin,
    "q21_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents)
        |SELECT sha256(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS keeper_id
        |FROM all_docs
        |GROUP BY sha256(text)
        |HAVING count(*) >= 2
        |ORDER BY content_hash""".stripMargin,
    "q22_neardup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id AS id, embedding AS v, label AS blk FROM embeddings),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    ${sqlRnd(sqlDot("a.v", "b.v"), 6)} AS cos
         |  FROM e a JOIN e b ON a.blk = b.blk AND a.id < b.id)
         |SELECT id_a, id_b, cos FROM pairs
         |WHERE cos >= 0.35
         |ORDER BY id_a, id_b""".stripMargin
  )
}
