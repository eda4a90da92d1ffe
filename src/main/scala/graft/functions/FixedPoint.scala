package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BinaryExpression, BitwiseAnd, Coalesce, Expression, ExpressionInfo, If, IsNull, Literal, ShiftRight, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Exact fixed-point (6 or 12 dp) summation kernel.
  *
  * The gate's exact-sum rule — accumulate doubles in DECIMAL so
  * partition merge order cannot perturb the result — is semantically
  * right but, at many aggregates per row, computationally wrong on
  * Spark's side: each `sum(cast(x as decimal))` routes every row
  * through BigDecimal allocation, and a 15-aggregate pass (q116's
  * correlation matrix) degrades superlinearly as the generated update
  * function outgrows the JIT's compile budget (measured 4.0 s for 15
  * decimal sums vs 0.24 s for 15 double sums over the same 600k rows,
  * while 5 decimal sums cost 1.26 s).
  *
  * This kernel keeps the EXACT same math in pure long arithmetic:
  *
  *   - [[ToFixedN]]: double → unscaled long at scale 6 — HALF_UP of
  *     the EXACT binary value of the double (`new BigDecimal(v)`
  *     semantics, which is also what engines that scale-and-round in
  *     double arithmetic compute). The fast path splits v into exact
  *     whole/frac parts and classifies the fractional remainder
  *     against .5; within a ±1e-9 ambiguity zone — where the ≤6e-11
  *     rounding error of `frac*1e6` could misclassify — it defers to
  *     the exact BigDecimal expansion, so the invariant
  *     `toFixed6(v) == round_half_up(exact(v)·10⁶)` holds for EVERY
  *     double, not just typical ones. NaN/±Inf → null (as the decimal
  *     cast). |v| ≥ 1e12 (the DECIMAL(18,6) integral range) throws
  *     rather than silently diverging — callers sum bounded
  *     quantities.
  *
  *     Nuance vs Spark's own cast: `Cast(double AS DECIMAL)` rounds
  *     the SHORTEST-representation decimal (`BigDecimal.valueOf`),
  *     which can differ from the exact-binary rounding by one 1e-6
  *     unit when the double's true value and its shortest decimal
  *     fall on opposite sides of a .000_000_5 boundary (measurably so
  *     for |v| ≳ 1e10, where ulp > 1e-6). The same class of per-row
  *     discrepancy already exists between Spark's cast and DuckDB's —
  *     the gate passes because the compared outputs are rounded
  *     ratio statistics, invariant to ±1e-6 on 1e15-scale sums.
  *     This kernel picks the exact-binary convention: deterministic,
  *     partitioning-proof, and the one a scale-and-round engine
  *     agrees with.
  *   - [[SumFixedN]]: a DeclarativeAggregate over (hi, lo) longs in
  *     base 2^60 — carry is one shift and one mask, so update/merge
  *     stay inside whole-stage codegen with zero allocation. The
  *     128-bit width holds ~2^63 rows of maximal 6-dp addends; the
  *     fold is exact, hence partitioning- and merge-order-proof.
  *   - [[FixedToDouble]]: (hi, lo) → double via one BigDecimal per
  *     GROUP (not per row), matching `decimal.toDouble` exactly.
  *
  * `sumFixed6(x)` matches `sum(cast(x as decimal(28,6))).cast(double)`
  * bit-for-bit on ≤6-dp data below 2^53·1e-6 (all the gate tables) and
  * to one 1e-6 unit per row on arbitrary doubles (the valueOf nuance
  * above) — verified by PropertySpec over random, boundary, null, and
  * empty inputs, plus exact partition-invariance — at ~15× the
  * throughput.
  */
object FixedPoint {

  private val Base = 60 // accumulate in base 2^60
  private val Mask = (1L << Base) - 1

  /** double → unscaled long @ `scale` dp, HALF_UP of the exact binary
    * value. `pow` = 10^scale, `bound` = 10^(18-scale), `zone` = the
    * classification slack: half-ulp of the max |frac·pow| (6e-11 at
    * scale 6, 1.2e-4 at scale 12) with an order of magnitude to spare.
    */
  def toFixed(v: Double, scale: Int, pow: Double, bound: Double, zone: Double): Long = {
    if (v >= bound || v <= -bound) {
      throw new ArithmeticException(
        s"sum_fixed$scale addend $v outside the DECIMAL(18,$scale) integral range")
    }
    val whole = v.toLong // toward zero; exact
    val frac = v - whole // exact: |v - whole| < 1, operands within 2x
    val p = frac * pow
    val f = p.toLong // toward zero
    val rem = math.abs(p - f) // exact: f is p's integral part
    val powL = pow.toLong
    if (rem > 0.5 + zone) {
      whole * powL + f + (if (frac < 0) -1L else 1L)
    } else if (rem < 0.5 - zone) {
      whole * powL + f
    } else {
      // ambiguity zone: double rounding error cannot settle the
      // HALF_UP comparison — defer to the exact binary expansion
      // (`new BigDecimal(double)`, not `valueOf`)
      new java.math.BigDecimal(v)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
  }

  /** double → unscaled long @ scale 6 (see [[toFixed]]). */
  def toFixed6(v: Double): Long = toFixed(v, 6, 1e6, 1e12, 1e-9)

  /** double → unscaled long @ scale 12 (see [[toFixed]]). */
  def toFixed12(v: Double): Long = toFixed(v, 12, 1e12, 1e6, 1e-3)

  /** (hi, lo) base-2^60 accumulator → double, = DECIMAL(38,s)→double. */
  def toDouble(hi: Long, lo: Long, scale: Int): Double =
    new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi).shiftLeft(Base)
        .add(java.math.BigInteger.valueOf(lo)), scale)
      .doubleValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for (scale <- Seq(6, 12)) {
      val id = FunctionIdentifier(s"sum_fixed$scale")
      if (!reg.functionExists(id)) {
        reg.registerFunction(
          id,
          new ExpressionInfo(classOf[SumFixedN].getName, s"sum_fixed$scale"),
          (children: Seq[Expression]) => SumFixedN(children.head, scale))
      }
    }
  }

  /** Exact order-proof 6-dp sum of a double column, emitted as double. */
  def sumFixed6(c: Column): Column = call_function("sum_fixed6", c)

  /** Exact order-proof 12-dp sum of a double column, emitted as double. */
  def sumFixed12(c: Column): Column = call_function("sum_fixed12", c)
}

/** See [[FixedPoint.toFixed]]. */
case class ToFixedN(child: Expression, scale: Int) extends UnaryExpression {

  private def pow = if (scale == 6) "1.0E6" else "1.0E12"
  private def bound = if (scale == 6) "1.0E12" else "1.0E6"
  private def zone = if (scale == 6) "1.0E-9" else "1.0E-3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_fixed$scale requires a double input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val d = v.asInstanceOf[Double]
      if (d.isNaN || d.isInfinite) null
      else FixedPoint.toFixed(d, scale, pow.toDouble, bound.toDouble, zone.toDouble)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull} && !Double.isNaN(${c.value}) && !Double.isInfinite(${c.value})) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.FixedPoint.toFixed(${c.value}, $scale, $pow, $bound, $zone);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): ToFixedN =
    copy(child = newChild)
}

/** See [[FixedPoint.toDouble]]. */
case class FixedToDouble(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def nullSafeEval(hi: Any, lo: Any): Any =
    FixedPoint.toDouble(hi.asInstanceOf[Long], lo.asInstanceOf[Long], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hi, lo) =>
      s"graft.functions.FixedPoint.toDouble($hi, $lo, $scale)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedToDouble =
    copy(left = newLeft, right = newRight)
}

/** See [[FixedPoint]] — the aggregate itself. */
case class SumFixedN(child: Expression, scale: Int)
    extends DeclarativeAggregate with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = s"sum_fixed$scale"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sum_fixed$scale requires a double input, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  override lazy val updateExpressions: Seq[Expression] = {
    val s = ToFixedN(child, scale)
    // null addend folds as +0: carry = lo >> 60 = 0, lo unchanged
    val t = Add(lo, Coalesce(Seq(s, Literal(0L))))
    Seq(
      Add(hi, ShiftRight(t, Literal(60))),
      BitwiseAnd(t, Literal((1L << 60) - 1)),
      org.apache.spark.sql.catalyst.expressions.And(isEmpty, IsNull(s)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = Add(lo.left, lo.right)
    Seq(
      Add(Add(hi.left, hi.right), ShiftRight(t, Literal(60))),
      BitwiseAnd(t, Literal((1L << 60) - 1)),
      org.apache.spark.sql.catalyst.expressions.And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DoubleType), FixedToDouble(hi, lo, scale))

  override protected def withNewChildInternal(newChild: Expression): SumFixedN =
    copy(child = newChild)
}
