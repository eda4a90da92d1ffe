package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScalableRank

/** Round-8 additions: the two-pass exact-rank escape must equal the
  * single-partition global window bit-for-bit on arbitrary data, at
  * ANY partition count (1 / 3 / 7 — prime counts shear the range
  * bounds away from key boundaries), with hot keys and dense ties.
  */
class Round8Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val rnd = new Random(4242)

  /** 800 rows, one hot key (~70%), values drawn from a SMALL domain so
    * ties are dense, unique id tie-break. */
  private def randDf(): DataFrame = {
    val rows = Seq.tabulate(800) { i =>
      val k = if (rnd.nextInt(10) < 7) "hot" else "k" + rnd.nextInt(3)
      (k, rnd.nextInt(40).toLong, (rnd.nextInt(9000) + 1000).toLong, i.toLong)
    }
    rows.toDF("key", "v", "amt", "id")
  }

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0)
    assert(b.except(a).count() === 0)
  }

  test("ScalableRank.rowNumber equals global row_number at any partition count") {
    val df = randDf()
    val w = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
    for (p <- Seq(1, 3, 7))
      same(ScalableRank.rowNumber(df, Seq("key"), Seq(col("v"), col("id")),
        "rn", numParts = p), want)
    // unpartitioned (global order) form, desc ordering
    val wg = Window.orderBy(col("amt").desc, col("id"))
    val wantG = df.withColumn("rn", row_number().over(wg).cast("long"))
    same(ScalableRank.rowNumber(df, Seq.empty,
      Seq(col("amt").desc, col("id")), "rn", numParts = 7), wantG)
  }

  test("ScalableRank.ntile equals global ntile for ragged bucket sizes") {
    val df = randDf()
    // 800 rows over buckets in {7, 10, 13} exercises n % b != 0; the
    // per-key form exercises groups smaller than the bucket count too
    for (b <- Seq(7, 10, 13)) {
      val wg = Window.orderBy(col("amt").desc, col("id"))
      val want = df.withColumn("t", ntile(b).over(wg))
      same(ScalableRank.ntile(df, Seq.empty,
        Seq(col("amt").desc, col("id")), b, "t", numParts = 7), want)
      val wk = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
      val wantK = df.withColumn("t", ntile(b).over(wk))
      same(ScalableRank.ntile(df, Seq("key"),
        Seq(col("v"), col("id")), b, "t", numParts = 3), wantK)
    }
    // n < buckets: every row its own bucket
    val tiny = Seq(("a", 1L, 10L, 1L), ("a", 2L, 20L, 2L), ("a", 3L, 5L, 3L))
      .toDF("key", "v", "amt", "id")
    val wantT = tiny.withColumn("t",
      ntile(10).over(Window.orderBy(col("v"), col("id"))))
    same(ScalableRank.ntile(tiny, Seq.empty,
      Seq(col("v"), col("id")), 10, "t", numParts = 3), wantT)
  }

  test("ScalableRank.percentRank equals global percent_rank under dense ties") {
    val df = randDf()
    // per-key percent_rank over v ALONE (ties collapse) — the q132 shape
    val wk = Window.partitionBy(col("key")).orderBy(col("v"))
    val want = df.withColumn("pr", percent_rank().over(wk))
    for (p <- Seq(1, 3, 7))
      same(ScalableRank.percentRank(df, Seq("key"), Seq(col("v")),
        Seq(col("id")), "pr", numParts = p), want)
    // single-row groups emit 0.0
    val one = Seq(("a", 5L, 1L, 1L)).toDF("key", "v", "amt", "id")
    assert(ScalableRank.percentRank(one, Seq("key"), Seq(col("v")),
      Seq(col("id")), "pr", numParts = 3)
      .select("pr").as[Double].head() === 0.0)
  }

  test("ScalableRank.cumSum equals the global DECIMAL running sum") {
    val df = randDf().withColumn("d", col("amt").cast(DecimalType(28, 6)))
    val wg = Window.orderBy(col("amt").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum",
      sum(col("d")).over(wg).cast(DoubleType))
    for (p <- Seq(1, 3, 7))
      same(ScalableRank.cumSum(df, Seq.empty, Seq(col("amt").desc, col("id")),
          col("d"), "cum", numParts = p)
        .withColumn("cum", col("cum").cast(DoubleType)), want)
    // per-key form
    val wk = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantK = df.withColumn("cum", sum(col("d")).over(wk).cast(DoubleType))
    same(ScalableRank.cumSum(df, Seq("key"), Seq(col("v"), col("id")),
        col("d"), "cum", numParts = 7)
      .withColumn("cum", col("cum").cast(DoubleType)), wantK)
  }
}
