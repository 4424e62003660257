package graft.operators

import graft.Tables
import graft.functions.HashFunctions.hash60
import graft.functions.PortableMath.rnd
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The four TPC-H shapes that need a part-supplier inventory table
  * (Q9 / Q11 / Q16 / Q20), over a DERIVED partsupp: the driver fixture
  * ships no partsupp.parquet, so the table is computed — identically in
  * both engines — from data the fixture does ship.
  *
  *  - keys: the DISTINCT (l_partkey, l_suppkey) pairs observed in
  *    lineitem — referential integrity with the fact table is by
  *    construction (a hash-synthesized 4-supplier assignment would
  *    intersect the fixture's random lineitem pairs almost nowhere);
  *  - attributes: hash-assigned on integer grids (`hash60`, the
  *    md5-based portable hash every dedup oracle already mirrors):
  *    ps_availqty ∈ [1, 9999], ps_supplycost in CENTS ∈ [100, 100000]
  *    (1.00..1000.00) — integer money units keep every downstream sum
  *    association-free and bit-identical across engines (the volMicro
  *    discipline).
  *
  * Scale notes: the distinct is one shuffle of two narrow longs;
  * attributes derive map-side. Q9's lineitem ⨝ partsupp is the one
  * genuine big-big join (compound key (partkey, suppkey) — both sides
  * shuffle-partition on it; at warehouse scale both would be BUCKETED
  * on partkey and AQE handles the residual skew); part/supplier/nation
  * stay broadcast. Q11's "fraction of total" threshold compares
  * integer cents·qty products — exact, no double drift.
  */
object Partsupp {

  /** Derived partsupp (see object doc). Column `ps_supplycost_c` is the
    * cents-grain integer; `ps_supplycost` the conventional 2-dp money
    * view (an exact IEEE division both engines perform identically). */
  def derivedPartsupp(spark: SparkSession, sfDir: String): DataFrame = {
    def key(tag: String): Column = concat(lit(tag + ":"),
      col("ps_partkey").cast("string"), lit(":"),
      col("ps_suppkey").cast("string"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty", lit(1L) + hash60(key("aq")) % 9999L)
      .withColumn("ps_supplycost_c", lit(100L) + hash60(key("sc")) % 99901L)
      .withColumn("ps_supplycost", col("ps_supplycost_c") / lit(100.0))
  }

  /** TPC-H Q9 shape (product-type profit): per (supplier nation, order
    * year), the profit over parts matching a name fragment — revenue in
    * exact 1e-4 units minus supply cost (cents × integer qty × 100, so
    * the whole amount stays on the 1e-4 integer grid; the sum is
    * association-free). */
  def q9ProductTypeProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val ps = derivedPartsupp(spark, sfDir)
    val amountU =
      round(col("l_extendedprice") * 100.0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100.0).cast("long")) -
        col("ps_supplycost_c") * round(col("l_quantity")).cast("long") * lit(100L)
    Tables.lineitem(spark, sfDir)
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_name").like("%red%")).select("p_partkey")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("n_nationkey") === col("s_nationkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(rnd(sum(amountU).cast("double") / lit(10000.0), 2).as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  /** TPC-H Q11 shape (important stock): per part, the inventory value
    * (Σ cost·qty in exact cents) held by one nation GROUP's suppliers
    * (nationkey ≡ 2 mod 5 — a single nation is empty at the smallest
    * fixture SF; the group is populated at every SF); keep parts whose
    * value exceeds 1/1000 of the group total. The threshold compares
    * integers (value·1000 > total), so the cut is exact in both
    * engines; the tiny one-row total broadcasts. */
  def q11ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    val ps = derivedPartsupp(spark, sfDir)
      .join(broadcast(Tables.supplier(spark, sfDir)
        .filter(col("s_nationkey") % 5 === 2)
        .select("s_suppkey")),
        col("s_suppkey") === col("ps_suppkey"))
    val value = ps.groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost_c") * col("ps_availqty")).as("value_c"))
    val total = value.agg(sum("value_c").as("total_c"))
    value.crossJoin(broadcast(total))
      .filter(col("value_c") * 1000L > col("total_c"))
      .select(col("ps_partkey"),
        rnd(col("value_c").cast("double") / lit(100.0), 2).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    * counts per (brand, type, size) bucket, excluding one brand, one
    * type prefix, off-list sizes, and a deterministic "complained"
    * supplier set (hash-derived — the fixture carries no comment
    * column to LIKE on; 1 in 10 suppliers excluded). */
  def q16SupplierRelationship(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29).map(lit(_))
    val part = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#11" &&
        !col("p_type").like("PROMO%") &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    derivedPartsupp(spark, sfDir)
      .filter(hash60(concat(lit("cmpl:"), col("ps_suppkey").cast("string")))
        % 10L =!= 0L)
      .join(broadcast(part), col("p_partkey") === col("ps_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (excess inventory): per supplier, how many of its
    * name-matched parts hold stock above 50× what shipped in 1997 —
    * the correlated "availqty > k · Σ qty" subquery as one grouped
    * join; the comparison is integer-exact. Counts (not the bare
    * supplier list): at fixture supplier counts every supplier owns
    * SOME excess part, so the per-supplier count is the discriminating
    * output. */
  def q20ExcessStock(spark: SparkSession, sfDir: String): DataFrame = {
    val shipped = Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === 1997)
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
    derivedPartsupp(spark, sfDir)
      .join(shipped, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_name").like("small%")).select("p_partkey")),
        col("p_partkey") === col("ps_partkey"))
      .filter(col("ps_availqty") > lit(50L) * col("qty"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("s_suppkey") === col("ps_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(countDistinct("ps_partkey").as("n_excess"))
      .orderBy("s_suppkey")
  }
}
