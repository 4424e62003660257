package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md). Parquet scans
  * go through the vectorized reader; select/filter pushdown is preserved by
  * returning the raw scan (callers prune columns themselves — never
  * pre-select here, or pushdown chances are lost for wider callers). */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet has shipped `ts` both as TIMESTAMP(NANOS) (which
    * Spark's reader rejects unless `nanosAsLong=true` maps it to raw
    * Long nanos) and, in later fixture generations, as plain
    * timestamp[us]. Adapt to whichever the file actually carries:
    * inspect the read schema and only apply the nanos→micros rewrite
    * when `ts` surfaces as LongType. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `ts div 1000`, NOT `ts / 1000`: the latter is Double division
        // and epoch-nanos (~1.7e18) exceed 2^53, so it silently loses
        // ~µs precision; integer div matches DuckDB's epoch_ns(ts)//1000.
        raw.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Downstream operators call unix_micros(ts), which wants the
        // instant flavor. Sessions run with timeZone=UTC, so this cast
        // yields the same epoch-micros DuckDB's epoch_ns(ts)//1000 does.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // already an instant timestamp column — use as-is
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
