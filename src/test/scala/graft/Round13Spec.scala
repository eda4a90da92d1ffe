package graft

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
