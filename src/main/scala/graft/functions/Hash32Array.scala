package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Batch kernel: md5-prefix32 of every element of an array<string>.
  *
  * Arithmetic identical to `conv(substring(md5(s),1,8),16,10)` — the
  * first 4 digest bytes read big-endian — but computed in one call per
  * ROW with a reused MessageDigest over the raw UTF8 bytes. The
  * declarative per-element form paid interpreted-HOF dispatch plus a
  * hex-string round-trip per element (~10µs); at ~150 shingles × each
  * doc it dominated the dedup pipelines.
  */
object CrossHashKernels {

  /** 32-bit SimHash from element hashes: per bit, elements vote +1/-1
    * by their hash bit; positive sum sets the bit. Identical result to
    * the per-bit nested-aggregate formulation (vote order is
    * irrelevant — it's a sum). */
  def simhash32(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < 32) {
        if (((x >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) h |= (1L << j)
      j += 1
    }
    h
  }

  def md5Prefix32(arr: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit variant: first 8 digest bytes big-endian as a SIGNED long
    * (the sign bit is digest bit 0). Twin: [[CrossHash.duckX64]]. */
  def md5Prefix64(arr: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash from 64-bit element hashes — same vote rule as
    * [[simhash32]]; bit 63 makes the result negative when set (two's
    * complement), which downstream band extraction handles with
    * arithmetic-shift + mask. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((x >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) h |= (1L << j)
      j += 1
    }
    h
  }
}

case class Hash32Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash32_array requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CrossHashKernels.md5Prefix32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CrossHashKernels.md5Prefix32($c);")

  override protected def withNewChildInternal(newChild: Expression): Hash32Array =
    copy(child = newChild)
}

object Hash32Array {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("hash32_array")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[Hash32Array].getName, "hash32_array"),
        (children: Seq[Expression]) => Hash32Array(children.head))
    }
    val sid = FunctionIdentifier("simhash32")
    if (!reg.functionExists(sid)) {
      reg.registerFunction(
        sid,
        new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
        (children: Seq[Expression]) => SimHash32(children.head))
    }
    val id64 = FunctionIdentifier("hash64_array")
    if (!reg.functionExists(id64)) {
      reg.registerFunction(
        id64,
        new ExpressionInfo(classOf[Hash64Array].getName, "hash64_array"),
        (children: Seq[Expression]) => Hash64Array(children.head))
    }
    val sid64 = FunctionIdentifier("simhash64")
    if (!reg.functionExists(sid64)) {
      reg.registerFunction(
        sid64,
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
  }

  def hash(c: Column): Column = call_function("hash32_array", c)
  def hash64(c: Column): Column = call_function("hash64_array", c)
}

/** 64-bit md5-prefix hash of every element of an array<string> — the
  * SimHash input: 32 bits of hash entropy caps banded SimHash at 1,024
  * distinct band keys (candidate blowup at corpus scale), so the
  * near-dup path hashes tokens to 64 bits instead. */
case class Hash64Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash64_array requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CrossHashKernels.md5Prefix64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CrossHashKernels.md5Prefix64($c);")

  override protected def withNewChildInternal(newChild: Expression): Hash64Array =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash — see [[CrossHashKernels.simhash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CrossHashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CrossHashKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def sim(c: Column): Column = call_function("simhash64", c)
}

/** Codegen'd 32-bit SimHash over an array of element hashes — see
  * [[CrossHashKernels.simhash32]]; the nested-aggregate declarative
  * form (32 bit-positions × n tokens of interpreted lambda evals) was
  * the dominant cost of the SimHash dedup path. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CrossHashKernels.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CrossHashKernels.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def sim(c: Column): Column = call_function("simhash32", c)
}
