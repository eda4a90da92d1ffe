package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document → MinHash kernel: tokenize, 3-gram shingle, 32-bit
  * md5-prefix hash, distinct, and the K-permutation signature — ONE
  * pass per row, no intermediate array columns.
  *
  * Why fused: the staged pipeline (`tokens` → `shingles` →
  * `hash32_array` → `minhash_sig`) derives array columns that
  * CollapseProject re-inlines into every consumer, which forced two
  * full-corpus round-robin Exchanges (`Dist.materialize`) just to pin
  * the intermediates. At 100 TB those two barriers shuffle the whole
  * tokenized corpus twice; this kernel removes them — signature
  * computation becomes pure map-side work at scan speed, and the LSH
  * band join is the ONLY shuffle in the near-dup plan.
  *
  * Arithmetic is identical to the staged form (and the DuckDB oracle):
  * whitespace tokens of `trim(text)`, shingles joined with one space,
  * `md5`-prefix32 element hashes, `(a_i*x + b_i) mod p` row-min
  * signature. The shingle-hash set is deduplicated at the HASH level
  * and emitted sorted ascending.
  */
object MinHashDocKernels {

  /** Returns struct(sig: array<long>, sset: array<long>). Documents
    * with fewer than 3 tokens yield two empty arrays. */
  def minhashDoc(text: UTF8String, a: Array[Long], b: Array[Long], p: Long): InternalRow = {
    val toks = text.trim.toString.split(" +")
    if (toks.length < 3)
      return new GenericInternalRow(Array[Any](
        new GenericArrayData(Array.emptyLongArray),
        new GenericArrayData(Array.emptyLongArray)))
    val md = MessageDigest.getInstance("MD5")
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      set.add(h)
      i += 1
    }
    val sset = new Array[Long](set.size)
    val it = set.iterator()
    var si = 0
    while (it.hasNext) { sset(si) = it.next(); si += 1 }
    val k = a.length
    val sig = new Array[Long](k)
    var ki = 0
    while (ki < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < sset.length) {
        val h = (a(ki) * sset(j) + b(ki)) % p
        if (h < best) best = h
        j += 1
      }
      sig(ki) = best
      ki += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(sig), new GenericArrayData(sset)))
  }

  /** Jaccard of two SORTED DISTINCT long arrays via a linear merge —
    * O(|a|+|b|), no boxing. Empty union yields 0.0. */
  def setJaccard(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); val m = y.numElements()
    var ia = 0; var ib = 0; var inter = 0
    while (ia < n && ib < m) {
      val xv = x.getLong(ia); val yv = y.getLong(ib)
      if (xv == yv) { inter += 1; ia += 1; ib += 1 }
      else if (xv < yv) ia += 1
      else ib += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** |x ∩ y| over two sorted distinct long arrays — the same linear
    * merge as [[setJaccard]], returning the raw count (for verifies
    * that need the overlap itself, e.g. q77's n_shared). */
  def setIntersect(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements(); val m = y.numElements()
    var ia = 0; var ib = 0; var inter = 0L
    while (ia < n && ib < m) {
      val xv = x.getLong(ia); val yv = y.getLong(ib)
      if (xv == yv) { inter += 1; ia += 1; ib += 1 }
      else if (xv < yv) ia += 1
      else ib += 1
    }
    inter
  }
}

case class MinHashDoc(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length, "coefficient arrays must have equal length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_doc requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("sset", ArrayType(LongType, containsNull = false))))

  override def nullSafeEval(input: Any): Any =
    MinHashDocKernels.minhashDoc(
      input.asInstanceOf[UTF8String], a.toArray, b.toArray, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashDocKernels.minhashDoc($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashDoc =
    copy(child = newChild)
}

object MinHashDoc {

  def register(spark: SparkSession, a: Seq[Long], b: Seq[Long], p: Long): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("minhash_doc")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[MinHashDoc].getName, "minhash_doc"),
        (children: Seq[Expression]) => MinHashDoc(children.head, a, b, p))
    }
    val jid = FunctionIdentifier("set_jaccard")
    if (!reg.functionExists(jid)) {
      reg.registerFunction(
        jid,
        new ExpressionInfo(classOf[SetJaccard].getName, "set_jaccard"),
        (children: Seq[Expression]) => SetJaccard(children.head, children(1)))
    }
  }

  def doc(c: Column): Column = call_function("minhash_doc", c)
}

/** Codegen'd Jaccard over two sorted distinct array<long> columns —
  * see [[MinHashDocKernels.setJaccard]]. The declarative
  * `size(array_intersect)/size(array_union)` pair walks both arrays
  * through interpreted set builders twice per pair. */
case class SetJaccard(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"set_jaccard requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any, y: Any): Any =
    MinHashDocKernels.setJaccard(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MinHashDocKernels.setJaccard($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetJaccard =
    copy(left = newLeft, right = newRight)
}

object SetJaccard {
  def jac(a: Column, b: Column): Column = call_function("set_jaccard", a, b)
}

/** Codegen'd |x ∩ y| over two sorted distinct array<long> columns —
  * [[MinHashDocKernels.setIntersect]]. */
case class SetIntersect(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"set_intersect requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    MinHashDocKernels.setIntersect(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MinHashDocKernels.setIntersect($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetIntersect =
    copy(left = newLeft, right = newRight)
}

object SetIntersect {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("set_intersect")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[SetIntersect].getName, "set_intersect"),
        (children: Seq[Expression]) => SetIntersect(children.head, children(1)))
    }
  }

  def count(a: Column, b: Column): Column = call_function("set_intersect", a, b)
}
