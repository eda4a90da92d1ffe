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
  * The actual codecs are NOT available in this environment, so the
  * decode kernels below are clearly-marked DETERMINISTIC STUBS: they
  * derive plausible metadata and features purely from the payload
  * bytes. Everything around them — schemas, encoders, batching,
  * partitioning, the query surface — is real and tested, so swapping
  * in a real codec (javax.imageio, ffmpeg bindings, …) changes one
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
  // STUB decode kernels (deterministic fakes; see object Scaladoc)
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
          val (meta, features) = decodeImageStub(a.payload)
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
