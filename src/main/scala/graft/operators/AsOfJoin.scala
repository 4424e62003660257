package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward): for every left row, the single LATEST right
  * row with the same key and right-time <= left-time — the standard
  * feature-store / training-data temporal join ("what was the state of X
  * when this example happened").
  *
  * NOT a range join: the naive `l.key = r.key AND r.t <= l.t` join
  * materializes every (left, earlier-right) pair per key — O(|L|·|R|)
  * per key — before keeping the max. This is the union-merge form:
  *  - tag both sides and union them (no join at all);
  *  - ONE shuffle on the key, ONE window pass ordered by (time,
  *    side, tiebreak) carrying the last-seen right payload forward
  *    (`last(_, ignoreNulls)` over an unbounded-preceding frame);
  *  - keep the left rows, now annotated with their as-of right payload.
  * Cost: shuffle |L|+|R| rows once, sort within key — the sort-merge
  * an MPP engine would plan for ASOF, expressed in DataFrame ops.
  *
  * Semantics pinned for the oracle:
  *  - inclusive: a right row AT the left row's exact time is visible
  *    (right sorts before left on the side flag);
  *  - several rights at the same (key, time) resolve to the LARGEST
  *    `rTieBreak` value;
  *  - left rows with no prior right keep NULL payload (left join).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String,
      rTieBreak: String, rPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rTagged = right.select(
      col(rKey).as("_k"), col(rTime).as("_t"),
      col(rTieBreak).cast("long").as("_tb"), lit(0).as("_side"),
      struct(rPayload.map(col): _*).as("_r"))
    val rType = rTagged.schema("_r").dataType
    val lTagged = left.select(
      col(lKey).as("_k"), col(lTime).as("_t"),
      lit(0L).as("_tb"), lit(1).as("_side"),
      lit(null).cast(rType).as("_r"), struct(lCols.map(col): _*).as("_l"))
    val unioned = rTagged
      .withColumn("_l", lit(null).cast(lTagged.schema("_l").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = unioned
      .withColumn("_asof", last("_r", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    annotated.select(
      lCols.map(c => col(s"_l.$c").as(c)) ++
        rPayload.map(p => col(s"_asof.$p").as(p)): _*)
  }
}
