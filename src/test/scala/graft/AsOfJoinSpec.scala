package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin
import graft.sources.Tables

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("as-of backward equals the naive max-ts-<= formulation") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(to_date(col("ts")).as("d"), col("ts"), col("event_id"),
        col("value").as("click_val"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("d"), col("ts"))
      .agg(max(col("value")).as("view_val"))

    val fast = AsOfJoin.backward(clicks, views, Seq("d"), "ts", Seq("view_val"))
      .select("event_id", "view_val")

    // naive O(n*m) reference: range join then keep the latest quote
    val naive = clicks.as("c").join(views.as("v"),
        col("c.d") === col("v.d") && col("v.ts") <= col("c.ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id")).orderBy(col("v.ts").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("view_val"))

    assert(fast.count() === clicks.count())
    assert(fast.except(naive).count() === 0)
    assert(naive.except(fast).count() === 0)
  }

  test("ties match: right row at the exact left timestamp is taken") {
    import spark.implicits._
    val l = Seq((1, 100L, "L1"), (1, 200L, "L2")).toDF("k", "t", "tag")
    val r = Seq((1, 100L, 1.0), (1, 150L, 2.0)).toDF("k", "t", "v")
    val res = AsOfJoin.backward(l, r, Seq("k"), "t", Seq("v"))
      .orderBy("t").collect()
    assert(res(0).getAs[Double]("v") === 1.0) // equal ts matches
    assert(res(1).getAs[Double]("v") === 2.0) // latest preceding
  }

  test("approx sketches land within tolerance of exact") {
    // q32 emits the bound checks directly (oracle-checkable form)
    val r = SparkEntry.queries("q32_approx_stats")(spark, sf).head
    assert(r.getAs[Long]("exact_orders") > 0)
    assert(r.getAs[Boolean]("hll_ok"))
    assert(r.getAs[Boolean]("p50_ok"))
    assert(r.getAs[Boolean]("p99_ok"))
  }

  test("vec_dot is callable from SQL once registered (extensions front door)") {
    graft.functions.VecDot.register(spark)
    val d = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
    // mixed float/double inputs
    val f = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT)), array(2.0D)) AS d").head.getDouble(0)
    assert(f === 3.0)
  }
}
