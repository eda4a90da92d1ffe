package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composite pipeline a
  * 100 TB text lake runs before tokenization:
  *
  *   1. quality gate (TextOps.textStats composite score);
  *   2. exact dedup (keep the minimum id per text digest);
  *   3. MinHash-LSH near-dup removal, TRANSITIVE: verified pairs form
  *      a graph, [[GraphOps.connectedComponents]] clusters them, and
  *      only each cluster's minimum id survives (greedy per-pair
  *      dropping under-drops: (a,c),(b,c) kept both a and b).
  *
  * Each stage is one of the engine's primitive ops; stages 1–2 are a
  * single declarative plan (scan → map-side stats → digest shuffle →
  * LSH band shuffle), stage 3 adds the iterative star-contraction
  * rounds of the clusterer over the (tiny) verified-pair set.
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
    // checkpoint before the iterative stage: `unique` is consumed twice
    // (minhash pair generation AND the final anti-join), and the
    // clusterer's per-round actions would otherwise recompute the whole
    // scan -> stats -> digest-dedup chain for each consumer. Lazy — the
    // CC initializer's first action materializes it.
    val unique = scored.join(keep, col(idCol) === col("keep_id"), "left_semi")
      .localCheckpoint(eager = false)
    val pairs = DedupOps.minhashNearDups(unique, textCol, idCol, jaccardThreshold)
    val drops = GraphOps.connectedComponents(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    unique
      .join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("n_tokens"), col("quality_score"))
  }
}
