package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over `array<float>` / `array<double>` columns.
  *
  * Spark's declarative equivalent — `aggregate(zip_with(a, b, (x,y) ->
  * x*y), 0D, (acc,v) -> acc+v)` — is evaluated INTERPRETED (higher-order
  * functions have no codegen), boxing every element; on a brute-force
  * pair join it was the whole runtime. This expression generates a tight
  * primitive loop inside whole-stage codegen instead (~100× on 64-dim
  * vectors), with identical semantics: sequential left-to-right double
  * accumulation, so results stay bit-identical to the interpreted form
  * and to DuckDB's `list_dot_product`.
  *
  * Mismatched vector dimensions yield NULL (they indicate malformed
  * embedding data; DuckDB's `list_dot_product` raises on them, and a
  * silent shorter-prefix dot product would return a wrong score that
  * no gate could catch).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Idempotently register `vec_dot` on a session and return a Column
    * builder. Registration (rather than constructing the Column from
    * the catalyst node directly) keeps us on the public Column API. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("vec_dot")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => VecDot(children.head, children(1)))
    }
  }

  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
