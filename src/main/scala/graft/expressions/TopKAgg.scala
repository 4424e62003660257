package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k accumulator (SURVEY.md §7.3 upgrade path): per-group
  * top-k without materializing and sorting the whole group. The window
  * form already gets map-side pruning from Spark 4's WindowGroupLimit;
  * this aggregate goes further — the partial state that crosses the
  * shuffle is AT MOST k (score,id) pairs per group per partition, and no
  * sort ever sees more than 2k rows.
  *
  * Ordering contract matches the window form exactly: score DESC, id ASC
  * tie-break — swapping one for the other cannot change results
  * (spec-verified against Knn.topK).
  *
  * Buffer: an ArrayBuffer pruned to k whenever it reaches 2k (amortized
  * O(log k) per row via sort-and-truncate at halving points).
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, UTF8String)]] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))))
  override def prettyName: String = "graft_topk"

  /** score DESC, id ASC — strict less-than for sortWith. */
  private def beats(a: (Double, UTF8String), b: (Double, UTF8String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)

  private def prune(buf: ArrayBuffer[(Double, UTF8String)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(beats).take(k)
      buf.clear()
      buf ++= kept
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, UTF8String)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, UTF8String)],
      input: InternalRow): ArrayBuffer[(Double, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      // clone: the UTF8String points into a reused row buffer
      buf += ((s.asInstanceOf[Double], id.asInstanceOf[UTF8String].clone()))
      if (buf.length >= 2 * k) prune(buf)
    }
    buf
  }

  override def merge(
      b1: ArrayBuffer[(Double, UTF8String)],
      b2: ArrayBuffer[(Double, UTF8String)]): ArrayBuffer[(Double, UTF8String)] = {
    b1 ++= b2
    prune(b1)
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, UTF8String)]): Any = {
    val top = buf.sortWith(beats).take(k)
    new GenericArrayData(top.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    prune(buf)
    out.writeInt(buf.length)
    buf.foreach { case (s, id) =>
      out.writeDouble(s)
      val b = id.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, UTF8String)]
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
