package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** Round-13 pinned fixtures: the resize→decode round trip (q407) and
  * the dHash gate (q408) over the synthetic md5-BMP corpus. */
class Round13Spec extends AnyFunSuite {
  import SparkTestSession._

  test("resizeBmpNN 16×8→8×4 samples exactly the cells with c%16<8") {
    // cells(c) = c makes the sampled set directly readable in the
    // histogram: values {16y+x} = 0-7, 16-23, 32-39, 48-55 → four
    // bins (v/16 ∈ {0,1,2,3}) of exactly 8 pixels each
    val cells = Array.tabulate(64)(identity)
    val bmp = MultimodalOps.bmp8x8(cells)
    val resized = MultimodalOps.resizeBmpNN(bmp, 8, 4)
    assert(resized.isDefined)
    val decoded = MultimodalOps.decodeBmp24(resized.get)
    assert(decoded.isDefined)
    val (meta, hist) = decoded.get
    assert(meta.width === 8 && meta.height === 4 && meta.channels === 3)
    assert(hist.take(4).forall(_ === 0.25))
    assert(hist.drop(4).forall(_ === 0.0))
  }

  test("dHash64 gradient bits pin to all-set / all-clear on monotone rows") {
    // per-row ascending levels → no left cell ever brighter → 0L;
    // descending → every compare wins → all 64 bits set (-1L)
    val asc = Array.tabulate(64)(c => (c % 8) * 30)
    val desc = Array.tabulate(64)(c => (7 - c % 8) * 30)
    assert(MultimodalOps.dHash64(MultimodalOps.bmp8x8(asc)) === Some(0L))
    assert(MultimodalOps.dHash64(MultimodalOps.bmp8x8(desc)) === Some(-1L))
  }

  test("synthetic twin flips at most the one row-0 gradient bit of dHash") {
    // id 50: cell0 206 vs cell1 210 — the +16 tweak crosses 210, so
    // exactly bit 0 flips; id 65: 171 vs 171 tweaked to 187, the
    // strict > compare was false and stays... (187 > 171 flips it? no:
    // base 171 > 171 is false; tweaked 187 > 171 is true → flip).
    // Pin the EXACT hamming both engines compute: 1 for id 50.
    def ham(id: Long): Int = {
      val a = MultimodalOps.dHash64(MultimodalOps.bmp8x8(
        MultimodalOps.syntheticCells(id, tweaked = false))).get
      val b = MultimodalOps.dHash64(MultimodalOps.bmp8x8(
        MultimodalOps.syntheticCells(id, tweaked = true))).get
      java.lang.Long.bitCount(a ^ b)
    }
    assert(ham(50L) === 1)
    assert(ham(65L) === 1)
    assert(ham(0L) <= 1) // never more than the single touched compare
  }

  test("degreeAssortativity pins: path graph −1, uniform degrees null") {
    import spark.implicits._
    // P3: degrees 1,2,1 — every edge joins unequal degrees → exactly −1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = graft.ops.GraphOps.degreeAssortativity(path).collect().head
    assert(r.getLong(0) === 3 && r.getLong(1) === 2)
    assert(r.getDouble(2) === -1.0)
    // triangle: all degrees equal → zero variance → null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(graft.ops.GraphOps.degreeAssortativity(tri).collect().head.isNullAt(2))
  }

  test("signalTurnover pins: persistent day = +1, reversed day = −1") {
    import spark.implicits._
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    // day1 has no return, so day2 has no "yesterday" — the first
    // emitting day is day3 (reversal vs day2: −1); day4 repeats
    // day3's ordering (persistence: +1)
    val bars = Seq(
      ("A", ts(1, 10), 100.0), ("A", ts(2, 10), 200.0),
      ("A", ts(3, 10), 202.0), ("A", ts(4, 10), 204.02),
      ("B", ts(1, 10), 100.0), ("B", ts(2, 10), 150.0),
      ("B", ts(3, 10), 225.0), ("B", ts(4, 10), 337.5),
      ("C", ts(1, 10), 100.0), ("C", ts(2, 10), 110.0),
      ("C", ts(3, 10), 220.0), ("C", ts(4, 10), 440.0)
    ).toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.signalTurnover(bars)
      .orderBy(col("d")).collect()
    assert(out.length === 2)
    // day3 returns rank C (ln2) > B (ln1.5) > A (ln1.01); yesterday's
    // rank A > B > C → Σd² = 8, rho = 1 − 48/24 = −1, mean |move| = 4/3
    assert(out(0).getLong(1) === 3 && out(0).getDouble(2) === -1.0 &&
      out(0).getDouble(3) === 1.3333)
    assert(out(1).getDouble(2) === 1.0 && out(1).getDouble(3) === 0.0)
  }

  test("volOfVol pins: identical daily RVs give sd 0 and the exact mean") {
    import spark.implicits._
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    // two days, each with two +1% log returns → rv = sqrt(2e-4) both
    val e = math.exp(0.01)
    val bars = Seq(
      ("X", ts(1, 10), 1.0), ("X", ts(1, 11), e), ("X", ts(1, 12), e * e),
      ("X", ts(2, 10), e * e * e), ("X", ts(2, 11), e * e * e * e)
    ).toDF("series", "bar_ts", "close")
    // day2's first return crosses midnight (the q92 lag-crosses-boundary
    // rule), so day2 also holds two 0.01 returns
    val r = graft.ops.MarketBars.volOfVol(bars).collect().head
    assert(r.getLong(1) === 2)
    assert(r.getDouble(2) === 0.01414214) // round8(sqrt(0.0002))
    assert(r.getDouble(3) === 0.0)
  }

  test("prefixRecall pins: mass outside the prefix misses, full dims hit") {
    import spark.implicits._
    // query [0.6,0,0.8,0]: full winner b ([0,0,1,0], dot .8) has ZERO
    // prefix-2 dot, so the 2-dim shortlist picks a ([1,0,0,0], dot .6)
    val emb = Seq(
      (0L, Array(0.6f, 0f, 0.8f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val r = graft.ops.SimilarityOps.prefixRecall(emb, "vec_id", "embedding",
        k = 1, dims = Seq(2, 4), queryEvery = 100)
      .collect().head
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0L) // hits_2
    assert(r.getLong(2) === 1L) // hits_4 == full ranking
  }

  test("truncationLoss pins exact kept-token accounting") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s1"), (2L, "a b c d e", "s1"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.CorpusOps.truncationLoss(docs, limits = Seq(4))
      .collect().head
    assert(r.getLong(2) === 2 && r.getLong(3) === 1) // n_docs, n_truncated
    assert(r.getLong(4) === 8 && r.getLong(5) === 7) // total, kept
    assert(r.getDouble(6) === 0.875)
  }

  test("fkEdge pins exact orphan/childless accounting") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.ops.WarehouseOps.fkEdge("e", child, "ck", parent, "pk")
      .collect().head
    assert(r.getLong(1) === 4 && r.getLong(2) === 1) // child, orphans (9)
    assert(r.getLong(3) === 3 && r.getLong(4) === 1) // parents, childless (3)
    assert(r.getDouble(5) === 0.25 && r.getDouble(6) === 0.333333)
  }

  test("windowFunnel pins greedy-earliest chain and window cutoff") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 completes in-window; u2's purchase lands outside the 1h
    // window of its first view; u3 never clicks
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:10:00"), "click"),
      (2L, ts("2024-01-01 12:00:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ops.EventAnalytics.windowFunnel(
        ev, Seq("view", "click", "purchase"), windowSec = 3600L)
      .orderBy(col("step")).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L)) // reached
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 1L, 1L)) // stopped
    assert(out(2).getDouble(4) === 0.333333)
  }

  test("volumeSpikes pins the exact squared z-compare") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // trailing 5 days 10,10,10,12,8 (S=50, Q=508); day6 v=30:
    // dvm=100, varNum=40 → z² = 100²·4/(5·40) = 200 → spike at z>2
    val bars = Seq(10L, 10L, 10L, 12L, 8L, 30L).zipWithIndex.map {
      case (v, i) => ("X", ts(i + 1), v)
    }.toDF("series", "bar_ts", "n_ticks")
    val out = graft.ops.MarketBars.volumeSpikes(bars, lookback = 5, z = 2)
      .collect()
    assert(out.length === 1) // only day6 has a full window
    val r = out.head
    assert(r.getLong(2) === 30 && r.getDouble(3) === 10.0)
    assert(r.getBoolean(4))
    assert(r.getDouble(5) === 200.0)
  }

  test("knnConfusion pins the majority vote on two clean clusters") {
    import spark.implicits._
    // two well-separated clusters of 5: every vector's 5-NN holds 4
    // same-class + 1 cross neighbor → majority = own label everywhere
    val emb = (0 until 10).map { i =>
      val v = if (i < 5) Array(1f, 0.01f * i, 0f, 0f)
      else Array(0f, 0f, 1f, 0.01f * i)
      (i.toLong, v, if (i < 5) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ops.SimilarityOps.knnConfusion(emb, "vec_id",
        "embedding", "label", k = 5, centroidEvery = 50, nprobe = 2)
      .orderBy(col("label")).collect()
    assert(out.length === 2)
    assert(out.forall(r => r.getInt(0) === r.getInt(1) && r.getLong(2) === 5))
  }

  test("growthAccounting pins the four ledger lines on a hand history") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // u1 buys d1,d2,d4 (d4 = resurrected); u2 buys d2 only
    val ev = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(4)), (2L, ts(2)))
      .map { case (u, t) => (u, t, "purchase") }
      .toDF("user_id", "ts", "event_type")
    val out = graft.ops.EventAnalytics.growthAccounting(ev)
      .orderBy(col("w")).collect()
    // (active, new, retained, resurrected, churned) per active day;
    // churn into an INACTIVE day has no ledger row by construction
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq ===
      Seq((1L, 1L, 0L, 0L, 0L), (2L, 1L, 1L, 0L, 0L),
        (1L, 0L, 0L, 1L, 0L)))
  }

  test("audienceOverlap pins day-scoped Jaccard") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // view audience {(u1,d1),(u1,d2)}, click audience {(u1,d1),(u2,d1)}
    // → intersection 1, union 3
    val ev = Seq((1L, ts(1), "view"), (1L, ts(1), "click"),
      (1L, ts(2), "view"), (2L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = graft.ops.EventAnalytics.audienceOverlap(ev).collect().head
    assert(r.getString(0) === "click" && r.getString(1) === "view")
    assert(r.getLong(2) === 2 && r.getLong(3) === 2 && r.getLong(4) === 1)
    assert(r.getDouble(5) === 0.333333)
  }

  test("seqInterference pins the in-chain error split") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val ev = Seq(
      (1L, t("10:00"), "view"), (1L, t("10:05"), "error"),
      (1L, t("10:10"), "purchase"),
      (2L, t("10:00"), "view"), (2L, t("10:30"), "purchase"),
      (3L, t("10:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = graft.ops.EventAnalytics.seqInterference(
      ev, "view", "purchase", "error", windowSec = 3600L).collect().head
    assert(r.getLong(0) === 3 && r.getLong(1) === 2)
    assert(r.getLong(2) === 1 && r.getLong(3) === 1)
    assert(r.getDouble(4) === 0.5)
  }

  test("rangeEfficiency pins the Kaufman ratio on a hand day") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // closes 1.0 → 2.0 → 1.5: direction 0.5, path 1.5 → ER = 1/3
    val bars = Seq(("X", ts(10), 1.0), ("X", ts(11), 2.0), ("X", ts(12), 1.5))
      .toDF("series", "bar_ts", "close")
    val r = graft.ops.MarketBars.rangeEfficiency(bars).collect().head
    assert(r.getLong(2) === 3)
    assert(r.getDouble(3) === 0.333333)
  }

  test("hardNegativeMargin pins separable vs inverted clusters") {
    import spark.implicits._
    // label 0 tight around e1, label 1 tight around e3: every anchor's
    // same-label best ≈ 1, cross best ≈ 0 → margins positive
    val emb = (0 until 10).map { i =>
      val v = if (i < 5) Array(1f, 0.01f * i, 0f, 0f)
      else Array(0f, 0f, 1f, 0.01f * i)
      (i.toLong, v, if (i < 5) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ops.SimilarityOps.hardNegativeMargin(
        emb, "vec_id", "embedding", "label", queryEvery = 1)
      .orderBy(col("label")).collect()
    assert(out.length === 2)
    assert(out.forall(r => r.getLong(1) === 5 && r.getDouble(2) > 0.9 &&
      r.getDouble(3) === 1.0))
    // a singleton label drops out (no same-label best exists)
    val single = (emb.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))).toSeq :+
        ((99L, Array(0.5f, 0.5f, 0.5f, 0.5f), 7)))
      .toDF("vec_id", "embedding", "label")
    val labels = graft.ops.SimilarityOps.hardNegativeMargin(
        single, "vec_id", "embedding", "label", queryEvery = 1)
      .select("label").collect().map(_.getInt(0)).toSet
    assert(labels === Set(0, 1))
  }

  test("resized payloads flow back through imageHashes (round trip)") {
    import spark.implicits._
    val assets = Seq(
      MultimodalOps.MediaAsset(1L, "image",
        MultimodalOps.bmp8x8(MultimodalOps.syntheticCells(1L, tweaked = false))))
      .toDS()
    // 16×8 → 16×8 identity resize must preserve both hashes
    val resized = MultimodalOps.resizeImages(assets, 16, 8)
      .map(r => MultimodalOps.MediaAsset(r.asset_id, "image", r.payload))
    val before = MultimodalOps.imageHashes(assets).collect().head
    val after = MultimodalOps.imageHashes(resized).collect().head
    assert(before === after)
  }
}
