package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Streaming corpus curation: the LLM-pipeline analog of the batch
  * [[graft.ops.CorpusPipeline]] for documents arriving as a stream
  * (crawl output, upload queue).
  *
  *   1. exact dedup on the text digest within the watermark —
  *      `dropDuplicatesWithinWatermark` keeps state bounded by the
  *      watermark horizon instead of the whole corpus history;
  *   2. map-side quality stats + language ID (stateless Column
  *      expressions — they stream at scan speed);
  *   3. quality gate.
  *
  * Near-dup LSH stays a batch/compaction job over the landed data
  * (its band self-join needs the full candidate set); this stream
  * handles what is decidable per-document, which is exactly the split
  * a production lake uses: cheap gates inline, global dedup in the
  * nightly compaction.
  */
object CorpusStream {

  /** @param docs       streaming DataFrame with idCol, textCol and an
    *                    event-time column `tsCol`
    * @param watermark   dedup/lateness horizon (state retention bound)
    * @param qualityThreshold minimum composite quality score */
  def curate(
      docs: DataFrame,
      tsCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      watermark: String = "1 hour",
      qualityThreshold: Double = graft.ops.CorpusPipeline.QualityThreshold): DataFrame = {
    val deduped = docs
      .withColumn("text_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_md5")
    TextOps.textStats(deduped, textCol)
      .filter(col("quality_score") >= qualityThreshold)
      .select(col(idCol), col(tsCol), col("n_tokens"), col("quality_score"))
  }
}
