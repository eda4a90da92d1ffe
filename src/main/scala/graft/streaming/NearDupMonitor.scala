package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, MinHashDoc}
import graft.ops.{DedupOps, TextOps}

/** Streaming MinHash-LSH near-duplicate candidates — the live twin of
  * the batch q25 candidate stage ([[graft.ops.DedupOps]]'s band join)
  * and the missing piece of [[CorpusStream]]'s curation split (exact
  * dedup + quality gate stream inline; near-dup candidates previously
  * waited for the nightly compaction).
  *
  * Each arriving doc maps to its K-element MinHash signature (the
  * same fused codegen kernel as batch — stateless, streams at scan
  * speed) and explodes into (band, bsig) bucket keys; a watermarked
  * stream-stream SELF-join on the bucket key emits a candidate pair
  * the moment the SECOND member of a bucket arrives. `horizon` bounds
  * the join state (docs further apart in event time than the horizon
  * are never paired — the same within-watermark semantic the exact
  * dedup stage uses), so state is O(docs within the horizon), never
  * the corpus history.
  *
  * On replay of a corpus whose event-time span fits inside the
  * horizon, the DISTINCT emitted pair set equals the batch
  * [[DedupOps.lshCandidatePairs]] set exactly (StreamingSpec locks
  * this across a mid-stream split); pairs colliding in several bands
  * emit once per band — downstream either verifies idempotently or
  * distincts, exactly as the batch pipeline does.
  */
object NearDupMonitor {

  /** @param docs    streaming DataFrame with `idCol`, `textCol`, `tsCol`
    * @param horizon max event-time distance for two docs to pair (also
    *                the watermark: state eviction + lateness bound) */
  def candidatePairs(
      docs: DataFrame,
      tsCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      horizon: String = "1 hour"): DataFrame = {
    MinHashDoc.register(docs.sparkSession, DedupOps.A, DedupOps.B,
      CrossHash.P)
    def bands(d: DataFrame) = d
      .filter(size(TextOps.tokens(col(textCol))) >= 3)
      .select(col(idCol).as("doc"), col(tsCol).as("ts"),
        MinHashDoc.doc(col(textCol)).getField("sig").as("sig"))
      .select(col("doc"), col("ts"),
        DedupOps.lshBands(col("sig")).as("b"))
      .select(col("doc"), col("ts"),
        col("b.band").as("band"), col("b.bsig").as("bsig"))
      .withWatermark("ts", horizon)
    val x = bands(docs)
    val y = bands(docs).select(col("doc").as("doc_y"),
      col("ts").as("ts_y"), col("band").as("band_y"),
      col("bsig").as("bsig_y"))
    // No LessThan on the doc ids anywhere near the join: the streaming
    // join helper derives state watermarks from EVERY </> predicate in
    // the (pushed-down) condition and internal-errors on a non-time
    // one. A Not(EqualTo) guard + least/greatest normalization is
    // semantically the same pair set; each unordered pair emits once
    // per direction per colliding band — downstream verifies
    // idempotently or distincts, as the batch pipeline does.
    x.join(y,
        col("band") === col("band_y") && col("bsig") === col("bsig_y") &&
          col("ts_y") >= col("ts") - expr(s"INTERVAL $horizon") &&
          col("ts_y") <= col("ts") + expr(s"INTERVAL $horizon"))
      .filter(col("doc") =!= col("doc_y"))
      .select(least(col("doc"), col("doc_y")).as("id_a"),
        greatest(col("doc"), col("doc_y")).as("id_b"),
        col("band"), greatest(col("ts"), col("ts_y")).as("pair_ts"))
  }
}
