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

  /** STUB resize: recomputes metadata for the target box preserving
    * aspect ratio (payload untouched — a real kernel would re-encode). */
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
}
