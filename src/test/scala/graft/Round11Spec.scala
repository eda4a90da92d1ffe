package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, ExactRound, MultimodalOps}

/** Round-11 widening fixtures: hand-pinned values for the synthetic-
  * image near-dup pipeline (q393) and the ExactRound engine-proof
  * rounding helpers. */
class Round11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("syntheticCells: md5 byte fixture (id 0 cell 0 = 0x3e = 62) and the +16 tweak") {
    val cells = MultimodalOps.syntheticCells(0L, tweaked = false)
    // md5("0:0") = 3eac1f3c... -> first byte 0x3e
    assert(cells(0) === 62)
    assert(cells(1) === 129) // md5("0:1") = 81c99680...
    val tw = MultimodalOps.syntheticCells(0L, tweaked = true)
    assert(tw(0) === 78) // (62 + 16) % 256
    assert(tw.drop(1).sameElements(cells.drop(1)))
  }

  test("bmp8x8 round-trips through the REAL decoder: dims 16x8, aHash = direct cell-bit math") {
    val cells = MultimodalOps.syntheticCells(0L, tweaked = false)
    val bmp = MultimodalOps.bmp8x8(cells)
    val (meta, _) = MultimodalOps.decodeBmp24(bmp).get
    assert(meta.width === 16 && meta.height === 8 && meta.channels === 3)
    // each hash cell owns two identical gray pixels -> bit c is
    // exactly cells(c) >= mean(cells)
    val mean = cells.sum.toDouble / 64
    var expected = 0L
    for (i <- 0 until 64) if (cells(i) >= mean) expected |= (1L << i)
    assert(MultimodalOps.aHash64(bmp) === Some(expected))
    assert(expected === 6799798859660099900L) // pinned for id 0
  }

  test("q393 pipeline: twin pairs surface through decode + aHash + band join") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 5L, 10L).toDF("vec_id")
    val assets = MultimodalOps.syntheticImageAssets(ids, "vec_id")
    // 5 bases + twins for ids 0, 5, 10
    assert(assets.count() === 8)
    val pairs = DedupOps.hammingNearDups(
        MultimodalOps.imageHashes(assets), "asset_id", "ahash",
        maxHamming = 3)
      .orderBy("id_a")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 0), (10L, 11L, 0), (20L, 21L, 0)))
  }

  test("ExactRound.ratioRound: HALF_UP on exact rationals, sign-aware, boundary-exact") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 8L),    // 0.125    -> 0.13 at 2dp (exact tie, up)
      (2L, -1L, 8L),   // -0.125   -> -0.13 (away from zero)
      (3L, 1L, 3L),    // 0.333... -> 0.33
      (4L, 2L, 3L),    // 0.666... -> 0.67
      (5L, 0L, 7L))    // 0 -> 0
      .toDF("id", "num", "den")
    val out = df.select(org.apache.spark.sql.functions.col("id"),
        ExactRound.ratioRound(
          org.apache.spark.sql.functions.col("num"),
          org.apache.spark.sql.functions.col("den"), 2).as("r"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out.toSeq === Seq(0.13, -0.13, 0.33, 0.67, 0.0))
  }

  test("ExactRound: q365's boundary class — 0.1250005-style rationals round exactly") {
    import spark.implicits._
    // 1250005 / 10^7 at 6dp: the exact rational ties at the 7th digit
    // -> HALF_UP gives 0.125001 in BOTH engines by construction
    // (Spark's round() on the double quotient gives 0.125001 here but
    // DuckDB's multiply-based round gives 0.125 — the r10 q365 bug)
    val df = Seq((1250005L, 10000000L)).toDF("num", "den")
    val r = df.select(ExactRound.ratioRound(
        org.apache.spark.sql.functions.col("num"),
        org.apache.spark.sql.functions.col("den"), 6).as("r"))
      .head().getDouble(0)
    assert(r === 0.125001)
  }
}
