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
  *  - accumulated doubles are rounded identically on both sides;
  *  - every result is totally ordered with a unique tie-breaker.
  */
object SparkEntry {

  /** Flagship: the reference's /search query (§2.3 KNN with modality
    * balancing) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnModalBalanced(spark, "/root/testdata/sf0.001")

  // ---- shared fragments -------------------------------------------------

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
      s"""WITH docs AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS id,
         |         'm' || CAST(label % 2 AS VARCHAR) AS mtype, embedding
         |  FROM embeddings),
         |q AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS qid,
         |         'm' || CAST(label % 2 AS VARCHAR) AS qtype,
         |         embedding AS qvec
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, d.id, d.mtype,
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
         |    FROM kept) WHERE urank <= 10)
         |SELECT qid, id, mtype, ${sqlRnd("sim", 6)} AS sim,
         |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rnk
         |FROM unioned
         |ORDER BY qid, rnk""".stripMargin,
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
