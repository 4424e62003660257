package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen k-means grid scoring over an `ARRAY<LONG>` vector
  * against a LITERAL centroid matrix — the perf-tier twin of
  * [[DotProductF]] for the q170/q171 Lloyd loop (r19, guide step 4:
  * eliminate interpreted higher-order functions from the hot path).
  *
  * Semantics are IDENTICAL to the HOF forms in KMeansTrain, operand
  * order included, so swapping cannot change an oracle-checked bit:
  *  - mode = [[GridKmScore.SqDist]]: min_c Σ_j (u_j − c_j)·(u_j − c_j),
  *    the left fold `aggregate(zip_with(u, c, (a,b) => (a−b)*(a−b)))`
  *    (farthest-point init);
  *  - mode = [[GridKmScore.L2]]: min_c (Σ_j c_j² − 2·Σ_j u_j·c_j) with
  *    the centroid norm pre-summed driver-side exactly like
  *    `lit(c.map(u => u*u).sum)` (Lloyd's assignment / codebook cost);
  *  - mode = [[GridKmScore.NegDot]]: min_c (−Σ_j u_j·c_j), i.e. argmax
  *    inner product (the serve-time bucket rule).
  * All arithmetic is Int64 with Java wrap semantics — exactly what the
  * Catalyst Long operators do — and the per-centroid scan keeps the
  * FIRST minimum, matching `array_position(scores, array_min(scores))`
  * ties-to-smaller-cid.
  *
  * Why it's faster: the HOF form evaluates k·dim interpreted lambda
  * bodies per row (measured ~0.4 s per pass on 2 000 rows × 16 × 64 at
  * 32 cores — expression interpretation, not data); this compiles to a
  * k×dim primitive loop inside whole-stage codegen.
  *
  * Nulls: null vector → null (UnaryExpression default); a vector whose
  * length differs from the centroid dim → null (fail detectably, the
  * [[DotProductF]] rule — the HOF form's null-padded zip would poison
  * the score the same way).
  *
  * @param argmin true → 1-based index of the first-minimum centroid
  *               (IntegerType); false → the minimum score (LongType)
  */
case class GridKmScore(
    child: Expression,
    cents: Array[Array[Long]],
    mode: String,
    argmin: Boolean)
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "centroid matrix must be non-empty and rectangular")
  require(GridKmScore.Modes.contains(mode), s"unknown mode $mode")

  // Σ c_j² per centroid, pre-summed EXACTLY like the HOF form's
  // lit(c.map(u => u*u).sum) (Scala Long fold, wrap semantics)
  private val cNorms: Array[Long] = cents.map(_.map(u => u * u).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_grid_km expects ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = if (argmin) IntegerType else LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_grid_km"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    val dim = cents(0).length
    if (u.numElements() != dim) return null
    val uu = u.toLongArray()
    var best = 0L
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0L
      var sq = 0L
      var j = 0
      while (j < dim) {
        val uj = uu(j); val cj = cv(j)
        dot += uj * cj
        val d = uj - cj
        sq += d * d
        j += 1
      }
      val score = mode match {
        case GridKmScore.SqDist => sq
        case GridKmScore.L2     => cNorms(c) - 2L * dot
        case GridKmScore.NegDot => -dot
      }
      if (c == 0 || score < best) { best = score; bestC = c }
      c += 1
    }
    if (argmin) bestC + 1 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
      val normsRef = ctx.addReferenceObj("cNorms", cNorms, "long[]")
      val uu = ctx.freshName("uu")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val sq = ctx.freshName("sq")
      val d = ctx.freshName("d")
      val score = ctx.freshName("score")
      val cv = ctx.freshName("cv")
      val uj = ctx.freshName("uj")
      val cj = ctx.freshName("cj")
      val scoreExpr = mode match {
        case GridKmScore.SqDist => s"$sq"
        case GridKmScore.L2     => s"$normsRef[$c] - 2L * $dot"
        case GridKmScore.NegDot => s"-$dot"
      }
      s"""
         |if ($u.numElements() != ${cents(0).length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $uu = $u.toLongArray();
         |  long $best = 0L; int $bestC = 0;
         |  for (int $c = 0; $c < ${cents.length}; $c++) {
         |    long[] $cv = $centsRef[$c];
         |    long $dot = 0L; long $sq = 0L;
         |    for (int $j = 0; $j < ${cents(0).length}; $j++) {
         |      long $uj = $uu[$j]; long $cj = $cv[$j];
         |      $dot += $uj * $cj;
         |      long $d = $uj - $cj;
         |      $sq += $d * $d;
         |    }
         |    long $score = $scoreExpr;
         |    if ($c == 0 || $score < $best) { $best = $score; $bestC = $c; }
         |  }
         |  ${ev.value} = ${if (argmin) s"$bestC + 1" else s"$best"};
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GridKmScore =
    copy(child = newChild)
}

object GridKmScore {
  val SqDist = "sqdist"
  val L2 = "l2"
  val NegDot = "negdot"
  private[expressions] val Modes = Set(SqDist, L2, NegDot)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** 1-based id of the nearest centroid (ties to the smaller id). */
  def assign(ue: Column, cents: Array[Array[Long]], byDot: Boolean): Column =
    Bridge.column(GridKmScore(Bridge.expression(ue), cents,
      if (byDot) NegDot else L2, argmin = true))

  /** min_c Σ (u−c)² — the farthest-point init's distance-to-seeds. */
  def minSqDist(ue: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(GridKmScore(Bridge.expression(ue), cents, SqDist,
      argmin = false))

  /** min_c (‖c‖² − 2·u·c) — the quantization-cost summand. */
  def minL2Score(ue: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(GridKmScore(Bridge.expression(ue), cents, L2,
      argmin = false))
}
