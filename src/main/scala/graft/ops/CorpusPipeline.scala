package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composite pipeline a
  * 100 TB text lake runs before tokenization:
  *
  *   1. quality gate (TextOps.textStats composite score);
  *   2. exact dedup (keep the minimum id per text digest);
  *   3. MinHash-LSH near-dup removal (drop the higher id of every
  *      verified pair — greedy, one pass; a connected-components
  *      clusterer slots in here when transitive dedup is required).
  *
  * Each stage is one of the engine's primitive ops, so the whole
  * curation is a single declarative plan: scan → map-side stats →
  * digest shuffle → LSH band shuffle → two anti-joins.
  */
object CorpusPipeline {

  val QualityThreshold = 0.55
  val JaccardThreshold = 0.3

  def curate(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      qualityThreshold: Double = QualityThreshold,
      jaccardThreshold: Double = JaccardThreshold): DataFrame = {
    val scored = TextOps.textStats(docs)
      .filter(col("quality_score") >= qualityThreshold)
    val keep = scored
      .groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"))
    val unique = scored.join(keep, col(idCol) === col("keep_id"), "left_semi")
    val drops = DedupOps
      .minhashNearDups(unique, textCol, idCol, jaccardThreshold)
      .select(col("id_b").as(idCol))
      .distinct()
    unique
      .join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("n_tokens"), col("quality_score"))
  }
}
