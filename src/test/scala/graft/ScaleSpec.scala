package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dist
import graft.sources.{AlpacaSource, Sinks, Tables}

/** Scale-mechanics behaviors: salted joins preserve semantics, bucketed
  * tables join without a shuffle, raw inspection reports payload shape.
  */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join (inner + left) on skewed data") {
    import spark.implicits._
    // hot key: 80% of rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 800) 1 else i, s"l$i")).toDF("k", "lv")
    val right = (1 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
      val salted = Dist.saltedJoin(left, right, Seq("k"), saltBuckets = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.except(plain).count() === 0, jt)
      assert(plain.except(salted).count() === 0, jt)
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    // a previous JVM's managed-table dirs survive in spark-warehouse
    // while the metastore entry does not — clear both
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_bucketed", Seq("l_orderkey"), 8)
    Sinks.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "o_bucketed", Seq("o_orderkey"), 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("raw inspection reports per-payload bar counts") {
    val dir = AlpacaFixtures.write(
      java.nio.file.Files.createTempDirectory("inspect_fix")).toString
    val report = AlpacaSource.inspectRaw(AlpacaSource.readRaw(spark, dir))
    val rows = report.collect().map(r => r.getAs[String]("symbol") -> r.getAs[Int]("n_bars")).toMap
    assert(rows.keySet === Set("MSFT", "AAPL"))
    assert(rows("MSFT") > 200) // 3 full days + extras
  }
}
