package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of 32-bit element hashes:
  * `sig[i] = min over x of (a_i * x + b_i) mod p`.
  *
  * The declarative form — `transform(sequence(0, K-1), i ->
  * array_min(transform(hs, x -> (A[i+1]*x + B[i+1]) % P)))` — runs
  * interpreted (higher-order functions have no codegen) and was the
  * dominant cost of the MinHash-LSH pipeline (~10µs per element eval);
  * this expression generates the K×n primitive-long loop inside
  * whole-stage codegen with identical arithmetic.
  *
  * Inputs are expected non-empty (LSH callers filter empty shingle
  * sets); an empty input yields an empty signature.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  private val k = a.length
  require(b.length == k, "coefficient arrays must have equal length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val sig = new Array[Long](k)
      var i = 0
      while (i < k) {
        var best = Long.MaxValue
        var j = 0
        while (j < n) {
          val h = (a(i) * xs.getLong(j) + b(i)) % p
          if (h < best) best = h
          j += 1
        }
        sig(i) = best
        i += 1
      }
      new GenericArrayData(sig)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val best = ctx.freshName("best")
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[$n == 0 ? 0 : $k];
         |if ($n > 0) {
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $best = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $h = ($aRef[$i] * $c.getLong($j) + $bRef[$i]) % ${p}L;
         |      if ($h < $best) $best = $h;
         |    }
         |    $sig[$i] = $best;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Idempotently register `minhash_sig` (coefficients fixed to the
    * engine's CrossHash family) and return a Column builder. */
  def register(spark: SparkSession, a: Seq[Long], b: Seq[Long], p: Long): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("minhash_sig")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (children: Seq[Expression]) => MinHashSig(children.head, a, b, p))
    }
  }

  def sig(c: Column): Column = call_function("minhash_sig", c)
}
