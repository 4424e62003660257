package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` columns, as pure Catalyst column
  * expressions (no UDFs — stays inside the optimized plan, works through
  * column pruning / filter pushdown, and is deterministic).
  *
  * Determinism contract (matters for the DuckDB oracle): every float
  * element is cast to Double BEFORE any arithmetic, and every reduction is
  * a strict left fold (`aggregate` = foldLeft). DuckDB's `list_reduce`
  * with the same cast discipline produces bit-identical Doubles, so
  * hash-compares are exact — no tolerance needed.
  *
  * Reference semantics reproduced here:
  *  - cosine distance metric (reference: db.py:35-39, `DISTANCE_METRIC: COSINE`)
  *  - vectors L2-normalized at embed time (reference: app.py:14-15,26,37),
  *    so cosine(a,b) == dot(a,b) on the stored data — we still provide the
  *    full cosine for un-normalized inputs.
  */
object VectorFunctions {

  /** Left-fold dot product: ((0 + a0*b0) + a1*b1) + ... all in Double.
    * Backed by the codegen expression [[graft.expressions.DotProductF]]
    * (tight loop inside whole-stage codegen); [[dotProductHof]] is the
    * pure-public-API form with identical bit-level semantics on dense
    * equal-length arrays. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.DotProductF(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Higher-order-function dot product (no custom expression involved) —
    * kept as the reference implementation the codegen path must match. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Sum of squares (Double), same fold discipline. */
  def sumSquares(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(sumSquares(a))

  /** Full cosine similarity (for inputs that are NOT pre-normalized). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine distance = 1 - similarity (reference exposes distance,
    * main.py:221 converts back with `1 - d`). */
  def cosineDist(a: Column, b: Column): Column =
    lit(1.0) - cosineSim(a, b)

  /** F3 (db.py:21-22, main.py:290-291): little-endian float32 packing —
    * the reference's Redis wire format. Storage-edge parity only;
    * ArrayType is the native in-engine representation. */
  private val vecToBytesUdf =
    org.apache.spark.sql.functions.udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val bb = java.nio.ByteBuffer.allocate(v.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        v.foreach(bb.putFloat)
        bb.array()
      }
    }

  private val bytesToVecUdf =
    org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        val bb = java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.fill(b.length / 4)(bb.getFloat())
      }
    }

  def vecToBytes(v: Column): Column = vecToBytesUdf(v)
  def bytesToVec(b: Column): Column = bytesToVecUdf(b)

  /** L2-normalize an ARRAY<FLOAT> in Double precision, returning
    * ARRAY<FLOAT> (float32 storage parity with the reference, app.py:14-15).
    * Zero vectors pass through unchanged (torch F.normalize uses an eps
    * clamp; we mirror "no NaN out" behavior). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(
      transform(a, x => (x.cast("double") / n).cast("float")))
  }
}
