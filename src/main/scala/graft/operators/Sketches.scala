package graft.operators

import graft.functions.HashFunctions.hash60
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size sketch operators (count-min) with exact-vs-estimate audit
  * output — the deterministic, mergeable summaries a 100 TB pipeline
  * keeps where exact per-key state would not fit.
  *
  * Everything here is hash-deterministic (the portable hash60 family),
  * so estimates are bit-identical across engines and runs — unlike
  * RNG-seeded sketch libraries, the oracle can recompute the sketch. */
object Sketches {

  /** Count-min heavy hitters over corpus tokens (Cormode & Muthukrishnan
    * 2005): a depth×width integer sketch, where token t's estimate is
    * min over rows r of cell(r, h_r(t)) — never an underestimate, over
    * by at most the collision mass in its lightest row. Reports, for
    * the exact top-`topK` tokens, the exact count next to the sketch
    * estimate and the overestimate — the audit that sizes width/depth
    * before trusting the sketch where exact counting is unaffordable.
    *
    * Scale shape: cell counts aggregate from the DISTINCT-token count
    * table (cell(r,c) = Σ exact_n over tokens hashing there — identical
    * to counting occurrences directly, at vocabulary cardinality
    * instead of corpus cardinality); both aggregations are map-side
    * combinable, the sketch itself is depth×width rows (a constant),
    * and the top-k is TakeOrdered — no global sort materializes.
    *
    * @return (token, exact_n, cms_n, overestimate), exact-count
    *         descending, token tie-break */
  def cmsHeavyHitters(
      docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256, topK: Int = 30): DataFrame = {
    require(depth >= 1 && width >= 1 && topK >= 1)
    val exact = Par.ensureMapParallelism(docs)
      .select(explode(tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("exact_n"))
      .transform(graft.CacheScope.pin) // cells + top-k probes read it
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"), (hash60(col("t"), r) % width).as("c"))
    }
    val cells = exact
      .select(col("exact_n"), explode(array(rows: _*)).as("p"))
      .groupBy(col("p.r").as("r"), col("p.c").as("c"))
      .agg(sum("exact_n").as("cell_n"))
    val top = exact.orderBy(col("exact_n").desc, col("t")).limit(topK)
    top
      .select(col("t"), col("exact_n"), explode(array(rows: _*)).as("p"))
      .select(col("t"), col("exact_n"), col("p.r").as("r"), col("p.c").as("c"))
      .join(cells, Seq("r", "c"))
      .groupBy("t", "exact_n")
      .agg(min("cell_n").as("cms_n"))
      .select(col("t").as("token"), col("exact_n"), col("cms_n"),
        (col("cms_n") - col("exact_n")).as("overestimate"))
  }
}
