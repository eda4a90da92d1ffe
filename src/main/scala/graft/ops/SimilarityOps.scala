package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecDot

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k; the correctness
  *     baseline. Queries are broadcast, the corpus streams — one
  *     nested-loop join with no corpus shuffle, so it scales to any
  *     corpus size as long as the query batch is small.
  *   - [[ivfTopK]] — IVF-style bucketed search: corpus vectors are
  *     assigned to their nearest centroid (one broadcast join against
  *     the small centroid set), queries probe only the `nprobe`
  *     nearest buckets. At 100 TB the corpus-side assignment is
  *     map-side + one partitioned write; per-query work drops by
  *     ~(centroids/nprobe)×.
  *
  * Vectors are L2-normalized ONCE per row (so cosine = one dot
  * product per pair, not three), and the dot product is the custom
  * codegen [[graft.functions.VecDot]] expression — the interpreted
  * `aggregate(zip_with(...))` form was ~100× slower and dominated the
  * pair join. All arithmetic is sequential-fold double, bit-identical
  * to DuckDB's `list_dot_product` (verified empirically), so ranking
  * ties cannot diverge between engines.
  */
object SimilarityOps {

  /** Codegen'd sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column = VecDot.dot(a, b)

  /** Append an L2-normalized double-array copy of `vecCol`. */
  def withUnitVec(df: DataFrame, vecCol: String, out: String = "nv"): DataFrame = {
    VecDot.register(df.sparkSession)
    df.withColumn("__nrm", sqrt(dot(col(vecCol), col(vecCol))))
      .withColumn(out, transform(col(vecCol), x => x.cast("double") / col("__nrm")))
      .drop("__nrm")
  }

  /** Exact top-k neighbors for each query vector (query ids are a
    * small broadcast side; ranks break ties by neighbor id). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    val q = withUnitVec(queries, vecCol).select(col(idCol).as("qid"), col("nv").as("qv"))
    val c = withUnitVec(corpus, vecCol).select(col(idCol).as("nid"), col("nv"))
      // the corpus arrives in O(file splits) partitions; spread the
      // nested-loop probe across the cluster
      .repartition(parallelism)
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cosine", dot(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic IVF: centroids are the vectors whose id divides
    * `centroidEvery` (a stand-in for a k-means codebook — the search
    * plumbing is what matters; swap the codebook without touching the
    * query path). Each corpus vector is assigned to its highest-cosine
    * centroid; each query probes its `nprobe` nearest buckets. */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidEvery: Int,
      nprobe: Int,
      queryFilter: Column): DataFrame = {
    val parallelism = emb.sparkSession.sparkContext.defaultParallelism
    val e = withUnitVec(emb, vecCol).select(col(idCol).as("vid"), col("nv").as("v"))
      .repartition(parallelism)
    val cents = e.filter(col("vid") % centroidEvery === 0)
      .select(col("vid").as("cid"), col("v").as("cv"))

    // corpus → nearest centroid (broadcast the centroid codebook)
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("v"), col("cv")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vid"), col("v"), col("cid"))

    // query → nprobe nearest centroids
    val q = e.filter(queryFilter).select(col("vid").as("qid"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qcos", dot(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))

    // search only the probed buckets
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    probes.join(assigned, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid").as("nid"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}
