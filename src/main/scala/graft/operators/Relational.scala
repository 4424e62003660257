package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.PortableMath.rnd
import org.apache.spark.sql.functions._

/** General relational surface over the TPC-H-ish driver tables: the
  * aggregation / join / window / sort-limit operators the engine must
  * support beyond the vector-search core (SURVEY.md §2.5, §7.2 step 7).
  *
  * Determinism-for-oracle conventions used by every query here:
  *  - aggregates over non-integer doubles are `rnd(x, 2..6)` in BOTH
  *    engines (partial-aggregation order differs between Spark and DuckDB;
  *    the error is ~1e-9 relative, rounding absorbs it);
  *  - counts / sums of integer-valued doubles (l_quantity) are exact;
  *  - every result has a total ORDER BY with unique tie-breaker.
  *
  * Scale notes: all group-bys here are partial-aggregated map-side by
  * Catalyst (sum/count/avg are all DeclarativeAggregates); the joins
  * declare the small dimension side broadcast-able (customer/orders at
  * TPC-H ratios; Catalyst auto-broadcasts below the threshold, AQE fixes
  * the rest at runtime).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy groupBy with partial
    * aggregation; the canonical "does aggregation scale" probe. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integer-valued doubles: exact
        rnd(sum(round(col("l_extendedprice") * 100.0).cast("long"))
          .cast("double") / lit(100.0), 2).as("sum_base_price"),
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2)
          .as("sum_disc_price"),
        rnd(avg("l_quantity"), 6).as("avg_qty"),
        rnd(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q2-style min-cost supplier (q02): for every part, the
    * EUROPE supplier quoting the lowest observed price — the
    * correlated-subquery shape (`price = (SELECT min … WHERE same
    * part)`) expressed as a window min + filter, which Spark executes
    * as ONE partial-aggregated shuffle on the part key instead of a
    * re-scan per row. The fixture has no partsupp table, so the quote
    * is each supplier's minimum l_extendedprice for the part
    * (min of exact parquet doubles — no summation-order hazard, no
    * rounding needed). Ties on price break to the smallest suppkey.
    * Dimension chain supplier→nation→region is broadcast. */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_suppkey", "s_name", "n_name")
    val offers = Tables.lineitem(spark, sfDir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "s_suppkey", "s_name", "n_name")
      .agg(min("l_extendedprice").as("offer"))
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("offer"), col("s_suppkey"))
    offers
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("offer"))
      .orderBy("p_partkey")
  }

  /** Join breadth: customer ⨝ orders ⨝ lineitem with a selective filter —
    * exercises broadcast-hash join selection + filter pushdown to the
    * parquet scans. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style order-priority check (q04): per priority band, how
    * many 1997-Q1 orders had at least one LATE line (shipped more than
    * 90 days after the order date) — the EXISTS shape as a LEFT SEMI
    * hash join on the order key (the non-equi lateness predicate rides
    * the join condition, so no lineitem aggregation materializes), with
    * the selective quarter filter pushed to the orders scan. Date
    * arithmetic in exact micros under the UTC session (o_orderdate
    * reads TIMESTAMP_NTZ → cast, the Tables.events precedent). */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val lateUs = 90L * 86400L * 1000000L
    val ord = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997 &&
        quarter(col("o_orderdate")) === 1)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("_ship_us"))
    ord
      .withColumn("_ord_us",
        unix_micros(col("o_orderdate").cast("timestamp")))
      .join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("_ship_us") > col("_ord_us") + lit(lateUs),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q13-style customer distribution (q143): how many customers
    * placed k orders, INCLUDING k = 0 — the left-outer-join-then-
    * histogram shape (two aggregation levels over one join). The
    * zero bucket is the part an inner join silently loses; the LEFT
    * join + count(o_orderkey) (nulls uncounted) keeps it exact. Both
    * aggregations partial-aggregate map-side; the join is key-shuffled
    * on custkey and the histogram grain is tiny. */
  def qCustDist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Returned-item revenue report — the TPC-H Q10 shape: customers
    * ranked by the revenue they returned ('R' lineitems), with their
    * nation. The fact side filters BEFORE the join chain (returnflag
    * pushdown reaches the lineitem scan), orders join is orderkey-keyed,
    * customer/nation ride broadcasts; top-20 cut ranks on the ROUNDED
    * revenue (round-before-rank) with custkey as the unique tie-break,
    * and plans as TakeOrdered — no global sort of the aggregate. */
  def qReturnedCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), volMicro.as("_rev"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(rnd(sum(col("_rev")).cast("double") / lit(10000.0), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Promotion-revenue share by ship month — the TPC-H Q14 shape: a
    * conditional aggregate over the lineitem⨝part join (promo share =
    * CASE-summed revenue / total revenue). Part is the dimension side
    * and rides a broadcast, so the fact table is never shuffled; both
    * sums partial-aggregate map-side on the month grain. The ratio is
    * computed from the two ROUNDED sums (portable division operands),
    * then rounded itself. */
  def qPromoRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        rnd(sum(when(col("p_type") === "PROMO", volMicro)
          .otherwise(lit(0L))).cast("double") / lit(10000.0), 2)
          .as("promo_revenue"),
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2)
          .as("total_revenue"))
      .withColumn("promo_pct",
        rnd(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6))
      .orderBy("ship_month")

  /** Large-volume orders — the TPC-H Q18 shape: orders whose total
    * line quantity exceeds a threshold, with their customer. The
    * lineitem aggregation runs FIRST (one partial-aggregated shuffle
    * on orderkey) and the selective HAVING collapses it to a few
    * hundred rows before any join — orders/customer then attach to
    * the tiny survivor set (survivors broadcast), so neither dimension
    * scan shuffles. l_quantity is integer-valued: the sum is exact,
    * no rounding needed. Top-100 ranks on quantity with orderkey as
    * the unique tie-break and plans as TakeOrdered. */
  def qLargeOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(100)

  /** Disjunctive brand/size/quantity revenue — the TPC-H Q19 shape:
    * an OR-of-ANDs predicate spanning both join sides. The per-branch
    * p_size bounds push to the part scan as a single coarse range
    * (size <= 15 covers all branches) and the residual disjunction
    * evaluates post-join; part rides a broadcast so the fact side
    * streams. One global aggregate row per qualifying branch keeps
    * the output deterministic. */
  def qBrandRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val branch =
      when(col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) &&
        col("l_quantity").between(1.0, 11.0), lit("Brand#12"))
        .when(col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 10) &&
          col("l_quantity").between(10.0, 20.0), lit("Brand#23"))
        .when(col("p_brand") === "Brand#15" &&
          col("p_size").between(1, 15) &&
          col("l_quantity").between(20.0, 30.0), lit("Brand#15"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("_branch", branch)
      .filter(col("_branch").isNotNull)
      .groupBy(col("_branch").as("brand"))
      .agg(
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("brand")
  }

  /** Dormant high-balance customers — the TPC-H Q22 shape: customers
    * whose balance exceeds the global positive-balance average and who
    * placed NO order in 1998, rolled up by market segment. The global
    * average is a 1-row aggregate broadcast into the filter (the
    * scalar-subquery shape); the "no 1998 order" EXISTS negation is a
    * LEFT ANTI hash join against the year-filtered orders projection
    * (the year filter pushes to the orders scan). Balance sums round
    * to 2 dp for portability. */
  def qDormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(rnd(avg("c_acctbal"), 6).as("_avg_bal"))
    val active98 = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1998)
      .select("o_custkey")
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("_avg_bal"))
      .join(active98, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        rnd(sum(round(col("c_acctbal") * 100.0).cast("long"))
          .cast("double") / lit(100.0), 2).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Exact 1e-4-unit lineitem revenue: prices carry 2 dp (cents) and
    * discounts 2 dp, so price·(1−discount) is EXACT in integer
    * ten-thousandths — the Int64 sum is association-free and the
    * revenue is bit-identical across engines and partition orders.
    * The r10 q160 lesson: a double revenue sum can land within an ulp
    * of a .005 cent boundary, where rnd(·,2) stops being portable —
    * sums that feed a 2 dp output (or an equality, q162) must
    * accumulate in micro-units. Max sum ≈ 1e8 rows · 1e9 units ≪ 2⁶³. */
  private def volMicro: Column =
    round(col("l_extendedprice") * 100.0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100.0).cast("long"))

  /** Forecast-revenue change — the TPC-H Q6 shape: a pure scan-filter
    * aggregate (date range + discount band + quantity cap, no join at
    * all). The value of the shape is what the PLAN must look like:
    * every predicate pushes to the parquet scan and the single global
    * sum partial-aggregates map-side — the cheapest possible pass over
    * an arbitrarily large fact table. Discount bounds compare doubles
    * that both engines read verbatim from the same parquet, so the
    * band edges are exact; price·discount accumulates in exact 1e-4
    * units ([[volMicro]] argument). */
  def qForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(rnd(sum(round(col("l_extendedprice") * 100.0).cast("long") *
        round(col("l_discount") * 100.0).cast("long"))
        .cast("double") / lit(10000.0), 2).as("revenue"))

  /** Bilateral shipping volume — the TPC-H Q7 shape generalized to ALL
    * directed nation pairs (the fixture's nations are uniform, so the
    * classic two-nation filter degenerates to zero rows at small SF):
    * supplier nation × customer nation × ship year revenue. The two
    * nation lookups ride one broadcast each; the fact table shuffles
    * once for the (pair, year) aggregate, partial-aggregated map-side. */
  def qVolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("_sk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("_ck"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("_sk"))
      .join(broadcast(n2), col("c_nationkey") === col("_ck"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(count(lit(1)).as("n_items"),
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** National market share — the TPC-H Q8 shape: within ASIA-customer
    * STANDARD-part order volume, the share supplied by NATION_3, per
    * order year. All five dimension legs broadcast; the fact table
    * shuffles once on the year grain; the share divides the two
    * ROUNDED sums (the q14 device). */
  def qMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("_sk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_type") === "STANDARD").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n1), col("s_nationkey") === col("_sk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        rnd(sum(when(col("supp_nation") === "NATION_3", volMicro)
          .otherwise(lit(0L))).cast("double") / lit(10000.0), 2)
          .as("nation_volume"),
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2)
          .as("total_volume"))
      .withColumn("mkt_share",
        rnd(col("nation_volume") / col("total_volume"), 6))
      .orderBy("o_year")
  }

  /** Top supplier by half-year revenue — the TPC-H Q15 shape: per-
    * supplier revenue over a ship-date window, keep the max. The
    * revenue CTE aggregates once (map-side partial); the max is a
    * 1-row broadcast compared against the ROUNDED per-supplier revenue
    * (both engines round before the equality, so float fold order
    * cannot split the tie). */
  def qTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-07-01"))
      .groupBy("l_suppkey")
      .agg(rnd(sum(volMicro).cast("double") / lit(10000.0), 2)
        .as("total_revenue"))
      .transform(graft.CacheScope.pin) // max + equality filter read it
    val mx = rev.agg(max("total_revenue").as("_mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("_mx"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Small-quantity-order revenue — the TPC-H Q17 shape: lineitems of
    * one brand whose quantity undercuts 20% of that part's average
    * quantity; the correlated scalar subquery becomes a per-part
    * aggregate joined back. The per-part averages are computed over the
    * FULL lineitem (as in the spec) but only brand parts survive the
    * join, and the brand filter pushes into the part scan + semi-joins
    * the averages before the fact-side join. avg is one IEEE division
    * on exact integer-valued operands, so the 0.2·avg threshold is
    * bit-identical cross-engine. */
  def qSmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val brandParts = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#1").select("p_partkey"))
    val perPart = Tables.lineitem(spark, sfDir)
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey")
      .agg((lit(0.2) * avg("l_quantity")).as("_thr"))
    Tables.lineitem(spark, sfDir)
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(perPart), Seq("l_partkey"))
      .filter(col("l_quantity") < col("_thr"))
      .agg(count(lit(1)).as("n_items"),
        rnd(sum(round(col("l_extendedprice") * 100.0).cast("long"))
          .cast("double") / lit(100.0) / lit(7.0), 2).as("avg_yearly"))
  }

  /** Multi-hop dimension join through nation/region (5-way) with a
    * broadcast chain — the TPC-H Q5 shape. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    li.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        rnd(sum(volMicro).cast("double") / lit(10000.0), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Window ranking: top-3 orders per customer by total price — per-group
    * top-k via row_number, the same physical pattern the KNN ranker uses. */
  def qTopOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** Event-stream rollup (batch view of the streaming shape): per
    * user+event_type counts and value stats — what the watermarked
    * streaming aggregation computes incrementally. */
  def qEventRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        rnd(sum("value"), 4).as("sum_value"),
        rnd(max("value"), 6).as("max_value"))
      .filter(col("n_events") >= 2)
      .orderBy("user_id", "event_type")

  /** Batch sessionization over the event stream: lag-gap session
    * boundaries (30 min), cumulative-sum session ids, per-user session
    * stats — the lag/cumulative-window pattern every behavioral pipeline
    * needs. Timestamps handled as exact micros (see Tables.events). */
  /** Lag-gap session spans: one row per (user, session) with start/end
    * micros and event count — the reusable core of [[qSessionize]] and
    * the batch twin the streaming sessionizer
    * (StreamingIngest.sessionizeStream) is equivalence-tested against.
    * @param ev (user_id, event_id, tus) — tus = event-time micros */
  def sessionSpans(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    ev
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(w))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
        min("tus").as("start_us"), max("tus").as("end_us"))
  }

  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    sessionSpans(ev, gapUs)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("n_events").as("max_events"),
        max(col("end_us") - col("start_us")).as("max_dur_us"))
      .orderBy("user_id")
  }

  /** Ordered multi-step funnel over the event stream — the classic
    * product-analytics operator: of the users who did step 1, how many
    * went on to step 2 within `windowUs`, and then step 3 within
    * `windowUs` of THAT. Earliest-completion semantics (each stage
    * anchors at the MIN qualifying time after the previous stage),
    * which is deterministic and the standard funnel definition.
    *
    * Shape: three conditional min-aggregations keyed on user_id —
    * every shuffle is user-keyed, so the three stages co-partition and
    * AQE collapses the joins to local ones; nothing is ever global. At
    * 100 TB of events this is the right plan: no session explosion, no
    * self-join on the raw stream, per-user state is three longs.
    *
    * @return (user_id, s1_us, s2_us, s3_us, stage) — sN_us = micros of
    *         the stage-N anchor event (null if not reached), stage =
    *         highest stage reached (1..3; users with no step-1 event
    *         are absent) */
  def qEventFunnel(
      spark: SparkSession, sfDir: String,
      step1: String = "view", step2: String = "click", step3: String = "purchase",
      windowUs: Long = 1800L * 1000000L): DataFrame =
    funnel(Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus")),
      step1, step2, step3, windowUs)

  /** [[qEventFunnel]]'s core over a prepared (user_id, event_type, tus)
    * relation — separated so specs can drive planted event streams. */
  def funnel(
      events: DataFrame,
      step1: String, step2: String, step3: String,
      windowUs: Long): DataFrame = {
    val ev = events.transform(graft.CacheScope.pin) // three stage scans read it
    val s1 = ev.filter(col("event_type") === step1)
      .groupBy("user_id").agg(min("tus").as("s1_us"))
    val s2 = ev.filter(col("event_type") === step2)
      .join(s1, Seq("user_id"))
      .filter(col("tus") >= col("s1_us") && col("tus") <= col("s1_us") + windowUs)
      .groupBy("user_id").agg(min("tus").as("s2_us"))
    val s3 = ev.filter(col("event_type") === step3)
      .join(s2, Seq("user_id"))
      .filter(col("tus") >= col("s2_us") && col("tus") <= col("s2_us") + windowUs)
      .groupBy("user_id").agg(min("tus").as("s3_us"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("s1_us"), col("s2_us"), col("s3_us"),
        (lit(1L) + when(col("s2_us").isNotNull, 1L).otherwise(0L)
          + when(col("s3_us").isNotNull, 1L).otherwise(0L)).as("stage"))
  }

  /** Hourly rate-spike detection per event type — the stream-health
    * monitor: z-score each (event_type, hour)'s event count against
    * that type's hourly distribution; hours at z ≥ `zFlag` are spikes
    * (incident bursts, bot storms, replayed traffic). Only hours that
    * HAVE events enter the distribution (sparse-hour semantics,
    * mirrored in the oracle).
    *
    * Determinism: counts are exact integers; the mean/std tail is the
    * same fixed operation sequence both engines run on identical
    * inputs (the [[Curation.embeddingOutliers]] argument); zero-
    * variance types report z = 0.
    *
    * Shape: one (type, hour)-keyed partial-aggregated count, one
    * 5-row per-type stats aggregate broadcast back — the hour grain
    * bounds every post-scan relation regardless of event volume.
    *
    * @return (event_type, hour, n, z, spike) — every populated hour */
  def qEventSpikes(
      spark: SparkSession, sfDir: String, zFlag: Double = 2.0): DataFrame =
    eventSpikes(Tables.events(spark, sfDir)
        .select(col("event_type"), unix_micros(col("ts")).as("tus")),
      zFlag)

  /** [[qEventSpikes]]'s core over a prepared (event_type, tus) relation
    * — separated so specs can drive planted event streams. */
  def eventSpikes(events: DataFrame, zFlag: Double): DataFrame =
    eventSpikesFromCounts(
      events
        .select(col("event_type"),
          // floor (not truncate) division: DuckDB's `//` floors, and the
          // grains must agree for pre-epoch (negative-micros) timestamps
          graft.functions.PortableMath.floorDiv(col("tus"), 3600000000L)
            .as("hour"))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n")),
      zFlag)

  /** The z-score tail over an ALREADY-AGGREGATED (event_type, hour, n)
    * relation — shared by the batch scan path above and the streaming
    * ledger path ([[graft.streaming.StreamingIngest.hourlyCountsWriter]]
    * + [[spikesFromLedger]]): at scale the event-grain count is the
    * only expensive stage, and a stream maintains it INCREMENTALLY;
    * this hour-grain tail is scale-free and can rerun on every ledger
    * read. */
  def eventSpikesFromCounts(counts: DataFrame, zFlag: Double): DataFrame = {
    val perHour = counts
      .transform(graft.CacheScope.pin) // stats + the z projection read it
    val st = perHour.groupBy("event_type")
      .agg(count(lit(1)).as("nh"),
        sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"))
    perHour.join(broadcast(st), Seq("event_type"))
      .withColumn("_mean", col("s1").cast("double") / col("nh").cast("double"))
      .withColumn("_std", sqrt(greatest(
        col("s2").cast("double") / col("nh").cast("double")
          - col("_mean") * col("_mean"), lit(0.0))))
      .withColumn("z", when(col("_std") > 0.0,
          rnd((col("n").cast("double") - col("_mean")) / col("_std"), 6))
        .otherwise(lit(0.0)))
      .select(col("event_type"), col("hour"), col("n"), col("z"),
        (col("z") >= zFlag).as("spike"))
  }

  /** Spike report from a streaming hourly-count ledger dir (written by
    * [[graft.streaming.StreamingIngest.hourlyCountsWriter]] — the
    * parquet STREAMING sink, so finalized windows land exactly once):
    * the scale-free z tail re-derives the report from the incrementally
    * maintained counts. The defensive per-(type, hour) re-sum makes a
    * ledger assembled from several runs/unions equivalent too. */
  def spikesFromLedger(
      spark: SparkSession, ledgerDir: String,
      zFlag: Double = 2.0): DataFrame =
    eventSpikesFromCounts(
      spark.read.parquet(ledgerDir)
        .groupBy("event_type", "hour").agg(sum("n").as("n")),
      zFlag)

  /** Weekly retention cohorts over the event stream — the other classic
    * product-analytics table next to the funnel: users grouped by the
    * week of their FIRST event (the cohort), then for each later week
    * the fraction of the cohort still active. Sparse semantics: only
    * (cohort, offset) cells with at least one active user appear
    * (offset 0 always does — the cohort's own week).
    *
    * Shape: user-keyed min-aggregation for the cohort, distinct
    * (user, week) activity, one join back on user, then aggregation on
    * the (cohort_week, week_offset) grain — every post-scan relation
    * is bounded by users or by weeks², never by raw event volume.
    *
    * @return (cohort_week, week_offset, n_cohort, n_active, retention) */
  def qRetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, sfDir)
      // floorDiv, not `/` or `div`: Column./ is Double division (the
      // Tables.events precision gotcha) and `div` truncates where
      // DuckDB's `//` floors (pre-epoch timestamps)
      .select(col("user_id"),
        graft.functions.PortableMath.floorDiv(
          expr("unix_micros(ts)"), weekUs).as("week"))
      .transform(graft.CacheScope.pin) // cohort min AND activity read it
    retentionFromActivity(ev)
  }

  /** The cohort tail over a (user_id, week) activity relation — shared
    * by the batch scan above (event-grain rows, deduped here) and the
    * streaming ledger path ([[graft.streaming.StreamingIngest
    * .weeklyActiveWriter]] + [[retentionFromLedger]]). Everything past
    * the input is bounded by users or weeks², never raw event volume. */
  def retentionFromActivity(ev: DataFrame): DataFrame = {
    val first = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
      .transform(graft.CacheScope.pin) // sizes AND the activity join
    val sizes = first.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    val active = ev.distinct()
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"),
        col("n_cohort"), col("n_active"),
        rnd(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention"))
  }

  /** Retention report from a streaming weekly-activity ledger dir
    * (written by [[graft.streaming.StreamingIngest.weeklyActiveWriter]]
    * — finalized (user, week) rows exactly once): the user-grain tail
    * re-derives cohorts on every read. The spike-monitor decomposition
    * applied to retention: the stream maintains the only event-volume
    * stage (distinct weekly activity) incrementally. */
  def retentionFromLedger(spark: SparkSession, ledgerDir: String): DataFrame =
    retentionFromActivity(
      spark.read.parquet(ledgerDir).select("user_id", "week").distinct())

  /** Hierarchical totals via ROLLUP(region, nation) — grouping-sets
    * breadth (subtotal + grand-total rows). */
  def qRevenueRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    Tables.lineitem(spark, sfDir)
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        volMicro.as("rev_u"))
      .createOrReplaceTempView("rev_src_q31")
    // the rollup runs through the SQL parser: Spark's DataFrame resolver
    // flags post-rollup references to grouping columns as ambiguous
    // (the nullable grouping output shadows the input attribute)
    spark.sql(
      """SELECT region, nation,
        |  floor(sum(rev_u) / 100.0D + 0.5D) / 100.0D AS revenue,
        |  count(*) AS n_items
        |FROM rev_src_q31
        |GROUP BY ROLLUP (region, nation)
        |ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin)
  }

  /** Semi-structured extraction: `props` is a JSON blob per event;
    * pull the numeric field out, bucket it, aggregate per (event_type,
    * bucket). The extraction is a pure map expression (codegen'd
    * get_json_object) — at 100 TB the JSON never leaves the scan
    * projection and the shuffle carries only grouped partial aggregates. */
  def qEventPropsRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .withColumn("k_bucket", floor(col("k") / 25.0).cast("long"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("n_events"),
        rnd(avg("k"), 6).as("avg_k"),
        rnd(sum("value"), 4).as("sum_value"))
      .orderBy("event_type", "k_bucket")

  /** Explicit GROUPING SETS — the third grouping-sets surface next to
    * ROLLUP (q31) and CUBE (q37): per-region totals, per-nation totals,
    * and the grand total, WITHOUT the (region, nation) detail level a
    * rollup would force. One aggregation pass; Spark expands the sets
    * into a single Expand + partial-agg plan, not three scans. */
  def qRevenueGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    Tables.lineitem(spark, sfDir)
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        volMicro.as("rev_u"))
      .createOrReplaceTempView("rev_src_q64")
    // through the SQL parser for the same resolver reason as q31
    spark.sql(
      """SELECT region, nation,
        |  floor(sum(rev_u) / 100.0D + 0.5D) / 100.0D AS revenue,
        |  count(*) AS n_items
        |FROM rev_src_q64
        |GROUP BY GROUPING SETS ((region), (nation), ())
        |ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin)
  }

  /** Set operations: nations that have BOTH a high-balance customer and a
    * BUILDING-segment customer (INTERSECT), and those with high-balance
    * only (EXCEPT). */
  def qNationSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val rich = c.filter(col("c_acctbal") > 7000).select("c_nationkey").distinct()
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select("c_nationkey").distinct()
    rich.intersect(building).withColumn("which", lit("both"))
      .unionByName(rich.except(building).withColumn("which", lit("rich_only")))
      .orderBy("which", "c_nationkey")
  }

  /** Calendar rollup over order dates — date-function breadth
    * (year/month/quarter extraction on timestamp columns). */
  def qOrdersByMonth(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        rnd(sum(round(col("o_totalprice") * 100.0).cast("long"))
          .cast("double") / lit(100.0), 2).as("revenue"))
      .orderBy("y", "m")

  /** Outer-join breadth: every customer with their order count and total
    * — zero-order customers kept with coalesced zeros (the only join
    * family the rest of the suite doesn't exercise). */
  def qCustomerOrderSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(
        count(col("o_orderkey")).as("n_orders"), // count(col): nulls not counted
        rnd(coalesce(sum(round(col("o_totalprice") * 100.0).cast("long")),
          lit(0L)).cast("double") / lit(100.0), 2).as("total_spend"))
      .orderBy("c_custkey")

  /** CUBE with grouping_id over order priority × status — all four
    * grouping-set combinations in one pass (SQL-parser route: same
    * resolver quirk as ROLLUP). */
  def qOrderCube(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("o_totalprice") * 100.0).cast("long").as("price_u"))
      .createOrReplaceTempView("orders_q37")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  sum(price_u) / 100.0D AS revenue
        |FROM orders_q37
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
        |         o_orderstatus ASC NULLS FIRST""".stripMargin)
  }

  /** Explicit window frames: 3-row moving average and running sum of
    * event values per user (ROWS BETWEEN framing — the suite otherwise
    * only uses default frames). Sampled to one user in ten. */
  def qEventMovingStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables.events(spark, sfDir)
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("moving_avg",
        rnd(avg("value").over(w.rowsBetween(-2, 0)), 6))
      .withColumn("running_sum",
        rnd(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
      .select("user_id", "event_id", "moving_avg", "running_sum")
      .orderBy("user_id", "event_id")
  }

  /** Decile distribution of order prices — exact `ntile(10)` semantics
    * WITHOUT the global single-partition window (`Window.orderBy` with no
    * partition moves the whole table to one task — a scale killer).
    *
    * Partition-parallel global rank instead:
    *  1. `repartitionByRange` on the total sort key — range partitioner
    *     puts partition i's keys entirely before partition i+1's, so
    *     partition ids are ordered by key;
    *  2. `row_number` WITHIN each range partition (parallel window);
    *  3. global rank = local rank + prefix-sum of partition counts (a
    *     window over #partitions rows — metadata-sized at any scale);
    *  4. exact ntile arithmetic: with N rows in n tiles, the first
    *     N mod n tiles get ceil(N/n) rows, the rest floor(N/n).
    * The only broadcast sides are the 32-row offset table and the 1-row
    * total — this plan survives any table size. */
  def qOrderPriceDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val sortKeys = Seq(col("o_totalprice").asc, col("o_orderkey").asc)
    // persisted because both the ranked rows and the per-partition counts
    // read it; without the barrier the range shuffle runs twice
    val parts = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .repartitionByRange(32, sortKeys: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(graft.CacheScope.pin)
    val ranked = parts.withColumn("_lrn",
      row_number().over(Window.partitionBy("_pid").orderBy(sortKeys: _*)))
    // prefix sum over the #partitions-row count table via a triangular
    // self-join, not a global window (even a metadata-sized
    // Window.orderBy would emit the single-partition WindowExec warning)
    val counts = parts.groupBy("_pid").agg(count(lit(1)).as("_pcnt"))
    val offsets = counts.as("ca")
      .join(counts.as("cb"), col("cb._pid") < col("ca._pid"), "left")
      .groupBy(col("ca._pid").as("_pid"))
      .agg(coalesce(sum(col("cb._pcnt")), lit(0L)).as("_off"))
    val total = parts.agg(count(lit(1)).as("_n"))
    // integral divide via floor: every quotient here is <= 10 (tile
    // index), so the double rounding error (~1e-15 abs) cannot cross an
    // integer boundary
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val n = lit(10L)
    val rn = col("_lrn").cast("long") + col("_off")
    val szSmall = idiv(col("_n"), n)
    val szBig = szSmall + lit(1L) // tiles 1..r are one row larger
    val r = col("_n") % n
    val decile = when(rn <= szBig * r, idiv(rn - 1, szBig) + 1)
      .otherwise(r + idiv(rn - 1 - szBig * r, szSmall) + 1)
    ranked.join(broadcast(offsets), Seq("_pid"))
      .crossJoin(broadcast(total))
      .withColumn("decile", decile)
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_orders"),
        rnd(min("o_totalprice"), 2).as("lo"),
        rnd(max("o_totalprice"), 2).as("hi"))
      .orderBy("decile")
  }

  /** TPC-H Q4-shaped semi/anti probe: per priority, how many orders
    * have at least one returned line (EXISTS → left-semi) and how many
    * have none (NOT EXISTS → left-anti). Both legs plan as hash joins
    * on the order key with the DISTINCT key set broadcast — the probe
    * side (orders) never shuffles. */
  def qOrderReturns(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
    val withRet = orders.join(returned, Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_with_returns"))
    val without = orders.join(returned, Seq("o_orderkey"), "left_anti")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_without_returns"))
    withRet.join(without, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        coalesce(col("n_with_returns"), lit(0L)).as("n_with_returns"),
        coalesce(col("n_without_returns"), lit(0L)).as("n_without_returns"))
      .orderBy("o_orderpriority")
  }

  /** Unpivot (melt): the wide revenue matrix back to long form —
    * (priority, status, revenue) — via the native unpivot operator
    * (a Generate expansion, no shuffle beyond the pivot's own). */
  def qRevenueUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    qRevenuePivot(spark, sfDir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("rev_f"), col("rev_o"), col("rev_p")),
        "status", "revenue")
      .filter(col("revenue").isNotNull)
      .orderBy("o_orderpriority", "status")

  /** Correlated scalar subquery: each order priced relative to its own
    * customer's average — routed through spark.sql because that IS the
    * surface being exercised; Catalyst decorrelates the subquery into an
    * aggregate + join (no per-row re-execution). */
  def qPriceVsCustomerAvg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    // rounding applied OUTSIDE the SQL: Spark SQL parses bare decimal
    // literals as DECIMAL (the rollup gotcha), so PortableMath stays in
    // the DataFrame layer where Double literals are Doubles
    spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice / (SELECT avg(o_totalprice) FROM orders_v i
        |                  WHERE i.o_custkey = o.o_custkey) AS pr
        |FROM orders_v o
        |WHERE o_totalprice > 1.5D * (SELECT avg(o_totalprice) FROM orders_v i
        |                             WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
      .select(col("o_custkey"), col("o_orderkey"),
        rnd(col("pr"), 6).as("price_ratio"))
  }

  /** LATERAL join: per nation, the top-3 customers by account balance —
    * the correlated table-subquery surface (a per-row ORDER BY ... LIMIT
    * against the outer row). Routed through spark.sql because LATERAL is
    * the surface exercised; Catalyst decorrelates to a ranked join — one
    * shuffle of customers by nation key, never a per-nation re-scan. */
  def qTopCustomersLateral(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation_v")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation_v n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer_v c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 3) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
      .select(col("n_name"), col("c_custkey"),
        rnd(col("c_acctbal"), 2).as("acctbal"))
  }

  /** Lineitem with DERIVED shipping columns — the TPC-H Q12/Q21
    * completions (r12). The fixture carries no shipmode / commitdate /
    * receiptdate, so they derive deterministically — identically in
    * both engines — from columns it does carry (the derived-partsupp
    * recipe): shipmode hash-picked from the TPC-H mode list, commit =
    * ship ± 30 days, receipt = ship + 1..30 days, all in exact integer
    * micros (`hash60` on the (orderkey, linenumber) key). */
  def lineitemShipping(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.HashFunctions.hash60
    val dayUs = 86400000000L
    val key = concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))
    val modes = Seq("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR")
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
      .withColumn("l_shipmode", element_at(array(modes.map(lit(_)): _*),
        (hash60(concat(lit("sm:"), key)) % 7L + 1L).cast("int")))
      .withColumn("commit_us", col("ship_us") +
        (hash60(concat(lit("cd:"), key)) % 60L - 30L) * dayUs)
      .withColumn("receipt_us", col("ship_us") +
        (lit(1L) + hash60(concat(lit("rd:"), key)) % 30L) * dayUs)
  }

  /** TPC-H Q12 shape (shipmode / order-priority): for the slow modes,
    * how many critical vs non-critical orders had a line that shipped
    * before its commit date but was received after it — pure integer
    * micros comparisons, counts exact. */
  def q12ShipmodePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val us1997 = 852076800000000L // 1997-01-01T00:00Z
    val us1998 = 883612800000000L
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitemShipping(spark, sfDir)
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("commit_us") < col("receipt_us") &&
        col("ship_us") < col("commit_us") &&
        col("receipt_us") >= us1997 && col("receipt_us") < us1998)
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_shipmode")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!crit, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_shipmode")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): per supplier,
    * finalized orders where ITS line was late (receipt past commit) and
    * it was the ONLY late supplier among several on the order — the
    * EXISTS/NOT-EXISTS pair as LEFT SEMI / LEFT ANTI hash joins on the
    * order key (the non-equi supplier≠supplier predicate rides the join
    * condition; nothing aggregates before the joins). */
  def q21WaitingSuppliers(
      spark: SparkSession, sfDir: String, topN: Int = 25): DataFrame = {
    val li = lineitemShipping(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("receipt_us") > col("commit_us")).as("late"))
      .transform(graft.CacheScope.pin) // l1 + the EXISTS/NOT-EXISTS probes
    val late = li.filter(col("late")).select("l_orderkey", "l_suppkey")
    late.as("l1")
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("o_orderkey") === col("l1.l_orderkey"))
      .join(li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
        col("ok2") === col("l1.l_orderkey") &&
          col("sk2") =!= col("l1.l_suppkey"), "left_semi")
      .join(late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3")),
        col("ok3") === col("l1.l_orderkey") &&
          col("sk3") =!= col("l1.l_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("s_suppkey") === col("l1.l_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(topN)
  }

  /** Pivot: revenue matrix priority × status. Pivot values are DECLARED
    * (not discovered) — at scale the two-pass distinct-then-pivot is a
    * full extra scan, and a declared domain keeps the output schema
    * stable for downstream consumers. */
  def qRevenuePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      // no coalesce: an absent (priority, status) combo is a NULL cell in
      // pivot AND a NULL SUM in the oracle's CASE mirror — exact match
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(rnd(sum(round(col("o_totalprice") * 100.0).cast("long"))
        .cast("double") / lit(100.0), 2))
      .withColumnsRenamed(Map(
        "F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
      .orderBy("o_orderpriority")
}
