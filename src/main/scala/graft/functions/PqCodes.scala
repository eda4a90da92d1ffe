package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Product-quantization encoder: `pq_codes(vec, codebook, m)` returns
  * the `m` per-subspace nearest-centroid ids for `vec` against a
  * cid-sorted `array<struct<cid bigint, cv array<float|double>>>`
  * codebook (one broadcast row, see `SimilarityOps.pqEncode`).
  *
  * The declarative equivalent — an `aggregate` argmin fold whose step
  * recomputes a `zip_with`+`aggregate` subspace distance — runs
  * INTERPRETED (higher-order functions have no codegen) and was the
  * entire q70/q97 runtime: subspaces × centroids × subdim boxed
  * lambda dispatches per corpus row. This kernel generates the same
  * triple loop as primitive Java inside whole-stage codegen.
  *
  * Bit-compatibility contract (PropertySpec asserts it on real data):
  * distances accumulate sequentially left-to-right in DOUBLE exactly
  * like `subL2`'s fold, and the argmin keeps the EARLIEST codebook
  * entry on ties (strict `<`), matching both the declarative fold and
  * the DuckDB twin's `row_number() OVER (ORDER BY dist, cid)`.
  * A centroid too short for a subspace is skipped — the declarative
  * twin's null-padded zip_with makes its distance NULL, which the
  * strict `<` likewise never selects. Subspace width is
  * `len(vec) / m` (integer division; the remainder tail is outside
  * every subspace, as in the declarative form).
  */
case class PqCodes(vec: Expression, cb: Expression, m: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cb
  override def third: Expression = m

  private def vecElem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  private def cbElem(t: DataType): Option[DataType] = t match {
    case ArrayType(StructType(Array(f0, f1)), _)
        if f0.dataType == LongType => vecElem(f1.dataType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElem(vec.dataType).isDefined && cbElem(cb.dataType).isDefined &&
        m.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_codes requires (array<float|double>, " +
        "array<struct<bigint, array<float|double>>>, int), got " +
        s"${vec.dataType.catalogString}, ${cb.dataType.catalogString}, " +
        s"${m.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vec.nullable || cb.nullable || m.nullable

  private def isFloat(t: DataType): Boolean = t == FloatType

  override def nullSafeEval(v: Any, c: Any, mm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val book = c.asInstanceOf[ArrayData]
    val mSub = mm.asInstanceOf[Int]
    val xf = isFloat(vecElem(vec.dataType).get)
    val cf = isFloat(cbElem(cb.dataType).get)
    val n = x.numElements()
    val sd = n / mSub
    val codes = new Array[Long](mSub)
    var j = 0
    while (j < mSub) {
      var bestD = Double.MaxValue
      var bestC = -1L
      var e = 0
      val nCb = book.numElements()
      while (e < nCb) {
        val entry = book.getStruct(e, 2)
        val cv = entry.getArray(1)
        if (cv.numElements() >= (j + 1) * sd) {
          var d = 0.0
          var i = 0
          while (i < sd) {
            val xi: Double =
              if (xf) x.getFloat(j * sd + i).toDouble else x.getDouble(j * sd + i)
            val ci: Double =
              if (cf) cv.getFloat(j * sd + i).toDouble else cv.getDouble(j * sd + i)
            val dx = xi - ci
            d += dx * dx
            i += 1
          }
          if (d < bestD) { bestD = d; bestC = entry.getLong(0) }
        }
        e += 1
      }
      codes(j) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (isFloat(vecElem(vec.dataType).get)) "getFloat" else "getDouble"
    val cGet = if (isFloat(cbElem(cb.dataType).get)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (xv, cbv, mv) => {
      val n = ctx.freshName("n")
      val sd = ctx.freshName("sd")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val nCb = ctx.freshName("nCb")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val entry = ctx.freshName("entry")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val dx = ctx.freshName("dx")
      s"""
         |int $n = $xv.numElements();
         |int $sd = $n / $mv;
         |long[] $codes = new long[$mv];
         |int $nCb = $cbv.numElements();
         |for (int $j = 0; $j < $mv; $j++) {
         |  double $bestD = Double.MAX_VALUE;
         |  long $bestC = -1L;
         |  for (int $e = 0; $e < $nCb; $e++) {
         |    org.apache.spark.sql.catalyst.InternalRow $entry = $cbv.getStruct($e, 2);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $entry.getArray(1);
         |    if ($cv.numElements() >= ($j + 1) * $sd) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $sd; $i++) {
         |        double $dx = ((double) $xv.$xGet($j * $sd + $i))
         |          - ((double) $cv.$cGet($j * $sd + $i));
         |        $d += $dx * $dx;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $entry.getLong(0); }
         |    }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqCodes =
    copy(vec = newFirst, cb = newSecond, m = newThird)
}

object PqCodes {

  /** Idempotently register `pq_codes` (public Column API, like the
    * other kernels). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("pq_codes")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
        (children: Seq[Expression]) => PqCodes(children.head, children(1), children(2)))
    }
  }

  def codes(vec: Column, cb: Column, m: Column): Column =
    call_function("pq_codes", vec, cb, m)
}
