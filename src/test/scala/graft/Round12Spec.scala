package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** Round-12 pinned fixtures: the synthetic-WAV audio-frame path
  * (q405) and the all-integer q365 contract live in Round10Spec. */
class Round12Spec extends AnyFunSuite {
  import SparkTestSession._

  test("audioFrameEnergy: hand-built WAV pins frame RMS/peak/voiced exactly") {
    import spark.implicits._
    // 40 silent samples, 40 at s_int=64 (s=0.5), 20 tail at s_int=-64:
    // with 5 ms frames at 8 kHz (frameLen 40) -> three frames
    val samples = Array.fill(40)(0) ++ Array.fill(40)(64) ++
      Array.fill(20)(-64)
    val wav = MultimodalOps.wav8k(samples)
    val assets = Seq(MultimodalOps.MediaAsset(7L, "audio", wav))
      .toDS()
    val out = MultimodalOps.audioFrameEnergy(assets, frameMs = 5,
        voicedRms = 0.25)
      .collect().sortBy(_.frame_idx)
    assert(out.length === 3)
    assert(out(0).n_samples === 40 && out(0).rms === 0.0 &&
      out(0).peak === 0.0 && !out(0).voiced)
    assert(out(1).n_samples === 40 && out(1).rms === 0.5 &&
      out(1).peak === 0.5 && out(1).voiced)
    // tail frame keeps the remainder
    assert(out(2).n_samples === 20 && out(2).rms === 0.5 &&
      out(2).peak === 0.5 && out(2).voiced)
  }

  test("syntheticPcm: dyadic samples, length 320 + id % 160, md5-derived") {
    val p0 = MultimodalOps.syntheticPcm(0L)
    assert(p0.length === 320)
    assert(MultimodalOps.syntheticPcm(161L).length === 321)
    assert(p0.forall(s => s >= -128 && s <= 127))
    // first byte of md5("aud:0:0") as a signed byte, independently
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update("aud:0:0".getBytes("UTF-8"))
    assert(p0(0) === md.digest()(0).toInt)
  }

  test("wav8k round-trips through the real decoder") {
    val samples = Array(64, -64, 127, -128)
    val wav = MultimodalOps.wav8k(samples)
    val decoded = MultimodalOps.decodeWavPcm16(wav)
    assert(decoded.isDefined)
    val (meta, _, peak, _) = decoded.get
    assert(meta.sample_rate === 8000 && meta.channels === 1 &&
      meta.n_samples === 4L)
    assert(peak === 1.0) // |-128|/128
  }
}
