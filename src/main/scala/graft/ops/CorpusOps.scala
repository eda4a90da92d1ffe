package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus-level statistics and layout operators a training-data
  * pipeline runs after curation:
  *
  *   - [[packByBudget]] — token-budget sequence packing: assign docs
  *     to fixed-token-budget bins (the layout step before tokenized
  *     examples are concatenated into training sequences);
  *   - [[termFrequency]] — corpus term/document frequencies with a
  *     deterministic top-k cut (vocabulary building, stopword mining);
  *   - [[labelCentroids]] — per-label embedding centroids (cluster
  *     summaries, classifier prototypes, drift monitoring).
  *
  * Scale posture: packing windows are partitioned by shard (parallel;
  * shard count scales with the cluster — a global pack order would
  * serialize on one task). Term counting is a map-side-combined
  * groupBy on the term; hot terms (stopwords) are absorbed by partial
  * aggregation, not a skewed join. Centroids explode to (label, pos)
  * keys — dims × labels groups, partial-aggregated — and accumulate
  * in DECIMAL so partial-aggregation order cannot perturb the double
  * result (same rule as the exact-statistics queries).
  */
object CorpusOps {

  /** Assign each document to a token-budget bin, packing in `idCol`
    * order WITHIN each of `nShards` hash shards: bin = floor((running
    * token total − 1) / budget). A document that crosses a budget
    * boundary belongs to the bin its cumulative count lands in — the
    * standard one-window approximation of greedy packing that stays
    * embarrassingly parallel across shards. */
  def packByBudget(
      docs: DataFrame,
      budget: Long,
      nShards: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val stats = TextOps.textStats(docs, textCol)
      .select(col(idCol), col("token_est"))
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stats
      .withColumn("cum_tokens", sum(col("token_est")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - 1) / lit(budget.toDouble)).cast("long"))
  }

  /** Corpus term frequency (tf) and document frequency (df), top `k`
    * by (tf desc, term asc) — a total order, so the cut is
    * deterministic. */
  def termFrequency(
      docs: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)

  /** Per-(label, dimension) embedding centroid: mean of each vector
    * position, decimal-accumulated, rounded to 6 places. Output one
    * row per (label, pos) — dims × labels rows. */
  def labelCentroids(
      emb: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DoubleType).cast(DecimalType(28, 12))).as("sx"))
      .select(col("label"), col("pos"), col("n"),
        round(col("sx").cast(DoubleType) / col("n"), 6).as("centroid"))
}
