package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image / audio / video) column handling.
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * structs — the layout a 100 TB training-data lake uses: parquet
  * row-groups of (id, kind, payload, meta), partitioned by kind/date,
  * with the decode step running batch-wise inside `mapPartitions`
  * (the JVM analog of a vectorized Pandas-UDF decode stage).
  *
  * Decoding: uncompressed 24-bit BMP payloads are decoded FOR REAL by
  * [[decodeBmp24]] (pure JVM header+pixel parsing — no codec library
  * needed), producing true dimensions and a 16-bin luminance
  * histogram. Compressed formats (JPEG/PNG/…) have no codec in this
  * environment, so they fall through to a clearly-marked DETERMINISTIC
  * STUB deriving stable pseudo-features from the bytes. Everything
  * around the kernels — schemas, encoders, batching, partitioning, the
  * query surface — is identical for both paths, so swapping the stub
  * for a real codec (javax.imageio, ffmpeg bindings, …) changes one
  * function body and nothing else.
  */
object MultimodalOps {

  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

  case class ImageMeta(width: Int, height: Int, channels: Int)

  case class AudioMeta(sample_rate: Int, channels: Int, n_samples: Long)

  /** Decoded audio: metadata + signal statistics (RMS, peak, zero
    * crossing rate) standing in for learned audio features. */
  case class DecodedAudio(
      asset_id: Long,
      meta: AudioMeta,
      rms: Double,
      peak: Double,
      zcr: Double)

  /** Decoded image: metadata + a fixed-width feature vector (here a
    * 16-bin normalized byte histogram standing in for model
    * embeddings / pixel statistics). */
  case class DecodedImage(
      asset_id: Long,
      meta: ImageMeta,
      features: Array[Double])

  /** Batch size for the decode kernel — real codecs amortize setup
    * per batch exactly like Arrow batches in a Pandas UDF. */
  val DecodeBatchSize = 64

  // ------------------------------------------------------------------
  // REAL decode kernel: uncompressed 24-bit BMP (pure JVM)
  // ------------------------------------------------------------------

  /** Decode an uncompressed 24-bit BMP payload: parses the
    * BITMAPFILEHEADER/BITMAPINFOHEADER (little-endian), walks the
    * 4-byte-aligned bottom-up (or top-down, negative height) pixel
    * rows, and emits true (width, height, 3) metadata plus a 16-bin
    * normalized luminance histogram (ITU-R BT.601 integer weights) as
    * the feature vector. Returns None for anything that is not a
    * well-formed uncompressed 24bpp BMP. */
  private[graft] def decodeBmp24(p: Array[Byte]): Option[(ImageMeta, Array[Double])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h == 0 || off < 54) return None
    val height = math.abs(h)
    val bottomUp = h > 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off.toLong + rowSize.toLong * height > p.length) return None
    val hist = new Array[Double](16)
    var y = 0
    while (y < height) {
      val row = off + (if (bottomUp) height - 1 - y else y) * rowSize
      var x = 0
      while (x < w) {
        val b = u8(row + x * 3); val g = u8(row + x * 3 + 1); val r = u8(row + x * 3 + 2)
        val lum = (299 * r + 587 * g + 114 * b) / 1000
        hist(lum / 16) += 1.0
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * height
    Some((ImageMeta(w, height, 3), hist.map(_ / n)))
  }

  // ------------------------------------------------------------------
  // REAL decode kernel: RIFF/WAVE PCM-16 audio (pure JVM)
  // ------------------------------------------------------------------

  /** Decode a 16-bit PCM WAV payload: parses the RIFF header and walks
    * the chunk list to the `fmt ` and `data` chunks (little-endian),
    * then computes per-signal statistics over the interleaved samples.
    * Returns None for anything that is not well-formed PCM-16 WAV. */
  private[graft] def decodeWavPcm16(p: Array[Byte]): Option[(AudioMeta, Double, Double, Double)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int, s: String): Boolean =
      p.length >= i + 4 && (0 until 4).forall(j => p(i + j) == s.charAt(j).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= p.length && (dataOff < 0 || !fmtOk)) {
      val sz = le32(pos + 4)
      if (sz < 0 || pos + 8 + sz > p.length) return None
      if (tag(pos, "fmt ")) {
        if (sz < 16) return None
        fmtOk = le16(pos + 8) == 1 // PCM
        channels = le16(pos + 10)
        rate = le32(pos + 12)
        bits = le16(pos + 22)
      } else if (tag(pos, "data")) {
        dataOff = pos + 8; dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (!fmtOk || bits != 16 || channels < 1 || rate <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    if (n == 0) return Some((AudioMeta(rate, channels, 0L), 0.0, 0.0, 0.0))
    var sumSq = 0.0; var peak = 0.0; var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i < n) {
      val s = (le16(dataOff + i * 2) << 16 >> 16) / 32768.0 // sign-extend
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
      if (prevSign != 0 && sign != prevSign) crossings += 1
      prevSign = sign
      i += 1
    }
    Some((AudioMeta(rate, channels, n.toLong / channels),
      math.sqrt(sumSq / n), peak, crossings.toDouble / n))
  }

  /** Decode a partition of PCM-16 WAV assets — same batched
    * mapPartitions layout as [[decodeImages]]; non-WAV payloads are
    * dropped (a production pipeline would route them to a dead-letter
    * table). */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[DecodedAudio] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { iter =>
      iter.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          decodeWavPcm16(a.payload).map { case (meta, rms, peak, zcr) =>
            DecodedAudio(a.asset_id, meta, rms, peak, zcr)
          }
        }
      }
    }
  }

  /** One fixed-length audio frame's features (the VAD/segmentation
    * primitive): per-frame RMS + peak + an energy-gate voiced flag. */
  case class AudioFrame(
      asset_id: Long,
      frame_idx: Int,
      n_samples: Int,
      rms: Double,
      peak: Double,
      voiced: Boolean)

  /** Frame-level feature extraction over PCM-16 WAV payloads: split
    * the signal into fixed `frameMs` windows (remainder tail kept) and
    * emit RMS/peak/voiced per frame — the row-explosion "feature
    * extract" shape of an audio pipeline (each binary asset becomes
    * O(duration) feature rows). Same batched mapPartitions layout as
    * [[decodeAudio]]; malformed payloads drop. Frames are derived
    * per-asset in one pass, so the op is map-side — the output
    * inherits the input partitioning. */
  def audioFrameEnergy(
      assets: Dataset[MediaAsset],
      frameMs: Int = 20,
      voicedRms: Double = 0.1): Dataset[AudioFrame] = {
    require(frameMs >= 1)
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { iter =>
      iter.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          val p = a.payload
          wavData(p).iterator.flatMap { case (rate, _, dataOff, n) =>
            val frameLen = math.max(1, rate * frameMs / 1000)
            def u8(i: Int): Int = p(i) & 0xff
            def sample(i: Int): Double =
              (((u8(dataOff + i * 2) | (u8(dataOff + i * 2 + 1) << 8)) << 16) >> 16) / 32768.0
            (0 until (n + frameLen - 1) / frameLen).iterator.map { f =>
              val start = f * frameLen
              val len = math.min(frameLen, n - start)
              var sumSq = 0.0; var peak = 0.0; var i = 0
              while (i < len) {
                val s = sample(start + i)
                sumSq += s * s
                val abs = math.abs(s); if (abs > peak) peak = abs
                i += 1
              }
              val rms = math.sqrt(sumSq / len)
              AudioFrame(a.asset_id, f, len, rms, peak, rms >= voicedRms)
            }
          }
        }
      }
    }
  }

  /** WAV header walk shared by the frame extractor: (rate, channels,
    * data offset, sample count) for a PCM-16 payload, None otherwise.
    * (Kept alongside [[decodeWavPcm16]], whose stats loop is fused
    * into its header walk for the single-pass whole-clip path.) */
  private[graft] def wavData(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int, s: String): Boolean =
      p.length >= i + 4 && (0 until 4).forall(j => p(i + j) == s.charAt(j).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= p.length && (dataOff < 0 || !fmtOk)) {
      val sz = le32(pos + 4)
      if (sz < 0 || pos + 8 + sz > p.length) return None
      if (tag(pos, "fmt ")) {
        if (sz < 16) return None
        fmtOk = le16(pos + 8) == 1
        channels = le16(pos + 10)
        rate = le32(pos + 12)
        bits = le16(pos + 22)
      } else if (tag(pos, "data")) {
        dataOff = pos + 8; dataLen = sz
      }
      pos += 8 + sz + (sz & 1)
    }
    if (!fmtOk || bits != 16 || channels < 1 || rate <= 0 || dataOff < 0) None
    else Some((rate, channels, dataOff, dataLen / 2))
  }

  // ------------------------------------------------------------------
  // STUB decode kernel (deterministic fake; see object Scaladoc)
  // ------------------------------------------------------------------

  /** STUB: a real implementation would hand `payload` to an image
    * codec. This fake derives meta + features deterministically from
    * the bytes so tests are stable. */
  private[graft] def decodeImageStub(payload: Array[Byte]): (ImageMeta, Array[Double]) = {
    val w = (if (payload.nonEmpty) (payload(0) & 0xff) % 64 else 0) + 1
    val h = (if (payload.length > 1) (payload(1) & 0xff) % 64 else 0) + 1
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xff) / 16) += 1.0)
    val n = math.max(1, payload.length).toDouble
    (ImageMeta(w, h, 3), hist.map(_ / n))
  }

  /** Decode a partition of assets in batches of [[DecodeBatchSize]].
    * `mapPartitions` keeps the decode distributed and pipelined with
    * the scan; no data moves to the driver. */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { iter =>
      iter.grouped(DecodeBatchSize).flatMap { batch =>
        // one codec-setup per batch in a real implementation
        batch.iterator.map { a =>
          // real decode for uncompressed BMP; stub for formats whose
          // codecs aren't in this environment
          val (meta, features) = decodeBmp24(a.payload)
            .getOrElse(decodeImageStub(a.payload))
          DecodedImage(a.asset_id, meta, features)
        }
      }
    }
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint of a 24-bit
    * BMP: box-average the luminance onto an 8×8 grid, threshold each
    * cell against the grid mean, pack row-major (bit cy*8+cx). Small
    * edits flip few bits, so image near-dup detection reduces to a
    * hamming band join — the IMAGE twin of text SimHash (q26). Needs
    * at least 8×8 pixels (every grid cell must own >= 1 pixel);
    * smaller or non-BMP payloads return None. */
  private[graft] def aHash64(p: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0 || w < 8 || h == 0 || off < 54) return None
    val height = math.abs(h)
    if (height < 8) return None
    val bottomUp = h > 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off.toLong + rowSize.toLong * height > p.length) return None
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < height) {
      val row = off + (if (bottomUp) height - 1 - y else y) * rowSize
      val cy = (y.toLong * 8 / height).toInt
      var x = 0
      while (x < w) {
        val b = u8(row + x * 3); val g = u8(row + x * 3 + 1); val r = u8(row + x * 3 + 2)
        val cell = cy * 8 + (x.toLong * 8 / w).toInt
        sum(cell) += (299 * r + 587 * g + 114 * b) / 1000
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => sum(i).toDouble / cnt(i))
    val gridMean = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) >= gridMean) bits |= (1L << i)
      i += 1
    }
    Some(bits)
  }

  /** 64-bit difference-hash (dHash): an 8×9 luma grid where bit
    * (y, x) = cell(y, x) brighter than its RIGHT neighbor — gradient
    * signs instead of [[aHash64]]'s absolute-vs-mean levels, which
    * makes it INVARIANT under any global brightness shift (every cell
    * moves together, the inequalities don't). The cell compare is
    * cross-multiplied (sumA·cntB > sumB·cntA) — pure integer, no
    * division anywhere. Same BMP guards as aHash. */
  private[graft] def dHash64(p: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0 || w < 9 || h == 0 || off < 54) return None
    val height = math.abs(h)
    if (height < 8) return None
    val bottomUp = h > 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off.toLong + rowSize.toLong * height > p.length) return None
    val sum = new Array[Long](72) // 8 rows x 9 cols
    val cnt = new Array[Long](72)
    var y = 0
    while (y < height) {
      val row = off + (if (bottomUp) height - 1 - y else y) * rowSize
      val cy = (y.toLong * 8 / height).toInt
      var x = 0
      while (x < w) {
        val b = u8(row + x * 3); val g = u8(row + x * 3 + 1); val r = u8(row + x * 3 + 2)
        val cell = cy * 9 + (x.toLong * 9 / w).toInt
        sum(cell) += (299 * r + 587 * g + 114 * b) / 1000
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val a = yy * 9 + xx
        val bI = a + 1
        // mean(a) > mean(b)  ⇔  sumA·cntB > sumB·cntA (exact)
        if (sum(a) * cnt(bI) > sum(bI) * cnt(a))
          bits |= (1L << (yy * 8 + xx))
        xx += 1
      }
      yy += 1
    }
    Some(bits)
  }

  /** Perceptual hashes for a distributed image collection — batched
    * [[aHash64]] + [[dHash64]] inside `mapPartitions` (same shape as
    * [[decodeImages]]: decode stays on the executors, pipelined with
    * the scan). Payloads that aren't decodable BMPs drop out; feed
    * either column to [[graft.ops.DedupOps.hammingNearDups]] —
    * ahash catches level copies, dhash survives brightness edits. */
  def imageHashes(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { iter =>
      iter.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          for (ah <- aHash64(a.payload); dh <- dHash64(a.payload))
            yield (a.asset_id, ah, dh)
        }
      }
    }.toDF("asset_id", "ahash", "dhash")
  }

  private[graft] def resizeBmpNN(
      p: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h == 0 || off < 54) return None
    val height = math.abs(h)
    val bottomUp = h > 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off.toLong + rowSize.toLong * height > p.length) return None
    val outRow = ((outW * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + outRow * outH)
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, out.length); put32(10, 54); put32(14, 40)
    put32(18, outW); put32(22, outH) // positive height = bottom-up
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, outRow * outH)
    var y = 0
    while (y < outH) {
      val srcY = (y.toLong * height / outH).toInt // top-down logical row
      val srcRow = off + (if (bottomUp) height - 1 - srcY else srcY) * rowSize
      val dstRow = 54 + (outH - 1 - y) * outRow // write bottom-up
      var x = 0
      while (x < outW) {
        val srcX = (x.toLong * w / outW).toInt
        out(dstRow + x * 3) = p(srcRow + srcX * 3)
        out(dstRow + x * 3 + 1) = p(srcRow + srcX * 3 + 1)
        out(dstRow + x * 3 + 2) = p(srcRow + srcX * 3 + 2)
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  case class ResizedImage(
      asset_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** REAL nearest-neighbor resize over the 24-bit BMP decoder: each
    * output pixel samples src[floor(y·H/outH)][floor(x·W/outW)] and
    * the result re-encodes as a well-formed bottom-up 24-bit BMP —
    * so resized payloads flow back through [[decodeImages]] /
    * [[imageHashes]] unchanged (tested round-trip). Same batched
    * mapPartitions shape as the other decoders: the kernel runs on
    * the executors, pipelined with the scan, map-side (output
    * partitioning inherits the input's). Undecodable payloads drop
    * out. Replaces the former metadata-only stub for the one format
    * this container can decode; [[resizeMeta]] remains the
    * plan-level helper for codec-less formats. */
  def resizeImages(
      assets: Dataset[MediaAsset], outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, "target box must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { iter =>
      iter.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap(a =>
          resizeBmpNN(a.payload, outW, outH)
            .map(bytes => ResizedImage(a.asset_id, outW, outH, bytes)))
      }
    }
  }

  /** Metadata-only resize for codec-less formats: recomputes the
    * target box preserving aspect ratio (payload untouched — the BMP
    * path has the real kernel, [[resizeImages]]). */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = lit(maxSide).cast("double") / greatest(w, h)
    struct(
      ceil(w * least(scale, lit(1.0))).cast("int").as("width"),
      ceil(h * least(scale, lit(1.0))).cast("int").as("height"),
      meta.getField("channels").as("channels"))
  }

  /** Frame-sampling plan for video: indices of every `every`-th frame
    * — pure Column arithmetic, no decode needed to plan the sample. */
  def frameSampleIndices(nFrames: Column, every: Int): Column =
    when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(every)))
      .otherwise(array().cast("array<int>"))

  /** Wrap a text table as fake media assets (payload = utf-8 bytes) —
    * the stand-in corpus used by tests and the oracle-checked metadata
    * query, since the container ships no real media. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }

  /** The 64 deterministic gray levels of the synthetic test image for
    * `id`: cell c's level is the first byte of md5("id:c") — a value
    * an engine WITHOUT the BMP decoder (the DuckDB oracle) can
    * recompute from the same md5 string, which is what makes the
    * decode→aHash→band-join pipeline oracle-checkable end to end. */
  private[graft] def syntheticCells(id: Long, tweaked: Boolean): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cells = Array.tabulate(64) { c =>
      md.reset()
      md.update(s"$id:$c".getBytes("UTF-8"))
      md.digest()(0) & 0xff
    }
    if (tweaked) cells(0) = (cells(0) + 16) % 256
    cells
  }

  /** A 16×8 24-bit bottom-up gray BMP where pixel (x, y-from-top) =
    * `cells(y*8 + x/2)` — each aHash grid cell owns exactly two
    * identical pixels (cell mean = the level, exactly), so the hash
    * bits are pure functions of the 64 levels; width 16 also
    * satisfies dHash's 8×9 grid minimum so [[imageHashes]] keeps the
    * asset. */
  private[graft] def bmp8x8(cells: Array[Int]): Array[Byte] = {
    val rowSize = 48 // 16 px × 3 B, already 4-byte aligned
    val out = new Array[Byte](54 + rowSize * 8)
    def put32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, out.length); put32(10, 54); put32(14, 40)
    put32(18, 16); put32(22, 8) // positive height = bottom-up
    out(26) = 1; out(28) = 24 // planes, bpp (compression stays 0)
    var yTop = 0
    while (yTop < 8) {
      val rowOff = 54 + (7 - yTop) * rowSize
      var x = 0
      while (x < 16) {
        val v = cells(yTop * 8 + x / 2).toByte
        out(rowOff + x * 3) = v; out(rowOff + x * 3 + 1) = v
        out(rowOff + x * 3 + 2) = v
        x += 1
      }
      yTop += 1
    }
    out
  }

  /** Deterministic synthetic image corpus over an id column: every id
    * yields one 8×8 gray BMP (asset_id = 2·id) whose pixels derive
    * from md5(id:cell); ids divisible by 5 additionally yield a
    * NEAR-DUPLICATE twin (asset_id = 2·id+1) with cell 0's level
    * shifted by +16 mod 256 — a genuine small perceptual edit that
    * flips 0–few aHash bits (the cell's own bit plus any cell within
    * 0.25 gray levels of the old grid mean). Feeds [[imageHashes]] so
    * the REAL decoder runs; the oracle twin recomputes the hash bits
    * from the same md5 bytes in SQL (q393).
    *
    * Scale posture: map-side generate (no shuffle); at a real lake
    * the assets come off parquet instead — everything downstream
    * (decode batching, band join) is the production path. */
  def syntheticImageAssets(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].flatMap { id =>
      val base = MediaAsset(id * 2, "image", bmp8x8(syntheticCells(id, tweaked = false)))
      if (id % 5 == 0)
        Seq(base, MediaAsset(id * 2 + 1, "image", bmp8x8(syntheticCells(id, tweaked = true))))
      else Seq(base)
    }
  }

  /** The signed PCM-16 sample values of the synthetic test clip for
    * `id`: sample j is (first byte of md5("aud:id:j") as a SIGNED
    * byte) << 8 — the low byte stays 0, so the decoded double is
    * s_int/128, a DYADIC rational. Every per-frame Σs² is then an
    * EXACT integer over 16384 (sums of dyadics with numerators far
    * below 2^53 are exact), which is what lets an engine WITHOUT the
    * WAV decoder (the DuckDB oracle) reproduce the frame RMS doubles
    * bit-for-bit from the same md5 strings (q405). Clip length
    * 320 + id % 160 samples at 8 kHz — two full 20 ms frames plus a
    * remainder tail on most ids, so the tail-frame path is
    * exercised. */
  private[graft] def syntheticPcm(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 320 + (id % 160).toInt
    Array.tabulate(n) { j =>
      md.reset()
      md.update(s"aud:$id:$j".getBytes("UTF-8"))
      md.digest()(0).toInt // signed byte: -128..127
    }
  }

  /** A minimal PCM-16 mono 8 kHz WAV wrapping [[syntheticPcm]]. */
  private[graft] def wav8k(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag(i: Int, s: String): Unit =
      (0 until 4).foreach(j => out(i + j) = s.charAt(j).toByte)
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16)
    out(20) = 1 // PCM
    out(22) = 1 // mono
    put32(24, 8000) // rate
    put32(28, 16000) // byte rate
    out(32) = 2 // block align
    out(34) = 16 // bits
    tag(36, "data"); put32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, j) =>
      val v = s << 8 // high byte carries the signed level, low byte 0
      out(44 + j * 2) = (v & 0xff).toByte
      out(44 + j * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  /** Deterministic synthetic audio corpus over an id column: one
    * PCM-16 mono 8 kHz WAV per id with md5-derived dyadic samples —
    * feeds [[audioFrameEnergy]] so the REAL header walk + framer +
    * stats loop run, while the q405 oracle recomputes every frame's
    * RMS/peak from the same md5 bytes in SQL. Map-side generate. */
  def syntheticAudioAssets(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      MediaAsset(id, "audio", wav8k(syntheticPcm(id)))
    }
  }

  /** The 64 gray levels of frame `f` of synthetic video `id` (q426):
    * most frames are unique (cells from md5("vid:id:f:c")), but frames
    * with (id + 3f) % 5 == 0 carry SHARED content — one of seven stock
    * frames (cells from md5("vf:k:c"), k = ((id+3f)/5) % 7), half of
    * them ((id+f) odd) with the q393 one-cell perceptual tweak
    * (cell 0 + 16 mod 256). Cross-video (and occasionally within-
    * video) near-duplicate frames therefore EXIST by construction —
    * identical stock frames hash hamming-0, tweak variants hamming
    * 0–few — and an engine without the decoder can recompute every
    * sampled frame's hash from the same md5 strings. */
  private[graft] def syntheticVideoCells(id: Long, f: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val shared = (id + 3 * f) % 5 == 0
    val cells = Array.tabulate(64) { c =>
      md.reset()
      val key =
        if (shared) s"vf:${((id + 3 * f) / 5) % 7}:$c"
        else s"vid:$id:$f:$c"
      md.update(key.getBytes("UTF-8"))
      md.digest()(0) & 0xff
    }
    if (shared && (id + f) % 2 == 1) cells(0) = (cells(0) + 16) % 256
    cells
  }

  /** Deterministic synthetic video corpus over an id column: one
    * multi-frame container per id — 3 + id % 3 concatenated 16×8 BMP
    * frames ([[bmp8x8]] over [[syntheticVideoCells]]), each frame a
    * self-describing BMP whose header carries its own byte length, so
    * a real container walk ([[videoFrames]]) can split frames without
    * any out-of-band index. Map-side generate; at a real lake the
    * containers come off parquet and everything downstream (walk,
    * sample, decode, band join) is the production path. */
  def syntheticVideoAssets(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = 3 + (id % 3).toInt
      val frames = (0 until n).map(f => bmp8x8(syntheticVideoCells(id, f)))
      MediaAsset(id, "video", Array.concat(frames: _*))
    }
  }

  /** Frame `f` of SCENE-STRUCTURED synthetic video `id` (q427): the
    * 6 + id % 3 frames form two-frame scenes — frame f draws its 64
    * gray levels from md5("scn:id:⌊f/2⌋:c"), so consecutive frames of
    * a scene share content, with the odd frame perturbing cell 1 by
    * +8 mod 256 (a small within-scene jitter that flips 0–few aHash
    * bits); scene boundaries jump to fresh md5 content (≈32-bit
    * hamming). Gives [[videoFrames]]-fed temporal analysis a real
    * shot structure to find: cuts-per-video = scene count − 1 by
    * construction, within-scene hamming small — both value-live at
    * every factor and exactly replayable from the md5 strings. */
  private[graft] def syntheticSceneCells(id: Long, f: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cells = Array.tabulate(64) { c =>
      md.reset()
      md.update(s"scn:$id:${f / 2}:$c".getBytes("UTF-8"))
      md.digest()(0) & 0xff
    }
    if (f % 2 == 1) cells(1) = (cells(1) + 8) % 256
    cells
  }

  /** Scene-structured sibling of [[syntheticVideoAssets]] (q427):
    * 6 + id % 3 concatenated BMP frames with two-frame scene runs
    * ([[syntheticSceneCells]]). Map-side generate. */
  def syntheticSceneVideoAssets(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = 6 + (id % 3).toInt
      val frames = (0 until n).map(f => bmp8x8(syntheticSceneCells(id, f)))
      MediaAsset(id, "video", Array.concat(frames: _*))
    }
  }

  /** REAL video-container walk + frame sampling: parse the payload as
    * concatenated BMP frames — each frame's own header declares its
    * byte length (`bfSize` at offset 2), the walk hops header to
    * header, stops at the first non-"BM" magic or truncated frame —
    * and keep every `every`-th frame as a standalone image asset
    * (frame_id = asset_id·16 + frame index; frame counts are ≤ 15 by
    * construction). The UNSAMPLED frames are never decoded — the
    * frame-sample happens at the container walk, before any pixel
    * work, which is the 100 TB posture (decode is the expensive step;
    * sampling first divides it by `every`).
    *
    * `mapPartitions`-family justification (same as [[decodeImages]]):
    * a byte-level container walk is not an expression fit; the walk is
    * map-side, pipelined with the scan, and emits only the sampled
    * slices. */
  def videoFrames(
      assets: Dataset[MediaAsset], every: Int = 2): Dataset[MediaAsset] = {
    require(every >= 1, s"every must be >= 1 (got $every)")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val p = a.payload
      def u8(i: Int): Int = p(i) & 0xff
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val out = scala.collection.mutable.ArrayBuffer.empty[MediaAsset]
      var off = 0
      var f = 0
      var ok = true
      while (ok && off + 54 <= p.length &&
          p(off) == 'B'.toByte && p(off + 1) == 'M'.toByte) {
        val sz = le32(off + 2)
        if (sz < 54 || off.toLong + sz > p.length) ok = false
        else {
          if (f % every == 0)
            out += MediaAsset(a.asset_id * 16 + f, "image",
              java.util.Arrays.copyOfRange(p, off, off + sz))
          off += sz
          f += 1
        }
      }
      out
    }
  }
}
