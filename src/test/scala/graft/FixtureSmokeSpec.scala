package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Fixture-drift guard (VERDICT r7 Missing #1). The driver regenerates
  * /root/testdata between rounds; round 7 silently broke six event
  * queries because events.parquet changed its `ts` physical type
  * (TIMESTAMP(NANOS) → timestamp[us]) and no spec read the driver's
  * fixtures. This spec loads EVERY TESTDATA.md table through `Tables.*`
  * at sf0.001 and asserts row counts > 0 plus the logical schema each
  * downstream operator depends on — so a future regeneration turns
  * `sbt test` red instead of killing driver queries for a full round.
  *
  * Skips (rather than fails) when /root/testdata is absent, so the
  * suite still runs on a checkout without driver fixtures.
  */
class FixtureSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def fixturesPresent: Boolean = Files.isDirectory(Paths.get(sfDir))

  private def requireCols(df: org.apache.spark.sql.DataFrame,
                          table: String,
                          cols: (String, DataType)*): Unit = {
    // compare ignoring nullability (parquet element-nullable flags vary)
    // ...and treating NTZ and instant timestamps as one family: the
    // guard cares that the column is time-typed and usable, not which
    // session-timezone flavor the writer chose.
    def norm(dt: DataType): DataType = dt match {
      case ArrayType(e, _)  => ArrayType(norm(e), containsNull = true)
      case TimestampNTZType => TimestampType
      case other            => other
    }
    val schema = df.schema
    cols.foreach { case (name, dt) =>
      assert(schema.fieldNames.contains(name), s"$table: missing column $name")
      assert(norm(schema(name).dataType) == norm(dt),
        s"$table.$name: expected $dt, fixture now has ${schema(name).dataType}")
    }
    assert(df.limit(1).count() == 1, s"$table: fixture is empty")
  }

  test("all driver fixture tables load through Tables.* with expected schemas") {
    assume(fixturesPresent, s"$sfDir not present — skipping fixture smoke")
    val s = spark

    requireCols(Tables.region(s, sfDir), "region",
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    requireCols(Tables.nation(s, sfDir), "nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    requireCols(Tables.customer(s, sfDir), "customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    requireCols(Tables.supplier(s, sfDir), "supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    requireCols(Tables.part(s, sfDir), "part",
      "p_partkey" -> LongType, "p_retailprice" -> DoubleType)
    requireCols(Tables.orders(s, sfDir), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType)
    requireCols(Tables.lineitem(s, sfDir), "lineitem",
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TimestampType)
    requireCols(Tables.documents(s, sfDir), "documents",
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType)
    // The events loader must surface `ts` as a real TimestampType no
    // matter which physical encoding the fixture generation used —
    // this is exactly the assertion that would have caught the r7 drift.
    requireCols(Tables.events(s, sfDir), "events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    val emb = Tables.embeddings(s, sfDir)
    requireCols(emb, "embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)

    // One trivial aggregate through the adaptive events loader — proves
    // the ts column is usable, not just present.
    val evAgg = Tables.events(s, sfDir)
      .selectExpr("count(*) AS n", "min(ts) < max(ts) AS ordered")
      .collect()(0)
    assert(evAgg.getLong(0) > 0)
    assert(evAgg.getBoolean(1), "events.ts: min should precede max")
  }
}
