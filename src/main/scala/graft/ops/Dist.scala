package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for compute-heavy declarative stages. */
object Dist {

  /** Spread a compute-heavy map stage across the cluster when the
    * scan produced fewer splits than cores (a small file arrives as
    * ONE split, serializing everything downstream on one core). At
    * real scale the scan already has >= cores splits and this is a
    * no-op; the check reads only the plan's partitioning, it runs no
    * job. */
  def rebalance(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism) else df
  }

  /** Skew-safe equi-join: replicate the (small-ish) right side
    * `saltBuckets` times and scatter the left side's hot keys across
    * the replicas with a deterministic salt. Use when one join key
    * carries a disproportionate share of rows and AQE's skew-join
    * split isn't available (e.g. the key is hot on BOTH inputs, or
    * the shuffle is sort-merge under a hint). Result is identical to
    * the plain join — verified by property test. */
  def saltedJoin(
      lhs: DataFrame,
      rhs: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched RIGHT row once per
    // salt replica — fail fast rather than silently multiply rows
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin replicates the right side; only inner/left joins are " +
        s"correct (got '$joinType')")
    import org.apache.spark.sql.functions.{col, explode, hash, lit, pmod, sequence}
    // deterministic scatter: hash the whole left row so equal keys spread
    val saltedLeft = lhs.withColumn("__salt",
      pmod(hash(lhs.columns.toIndexedSeq.map(c => col(c)): _*), lit(saltBuckets)))
    val saltedRight = rhs.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Measured skew factor of a join key: how many AVERAGE partitions
    * the hottest key would fill on its own (top-key count over
    * total/parallelism). One planning-time aggregate over the pruned
    * key columns — two numbers reach the driver, never data. 1.0 ≈
    * uniform; ≥ parallelism ≈ one key owns the whole stage. */
  def skewFactor(df: DataFrame, keys: Seq[String]): Double = {
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val row = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top"), sum(col("c")).as("total"))
      .collect().head
    if (row.isNullAt(0) || row.getLong(1) == 0L) 0.0
    else row.getLong(0).toDouble /
      math.max(1L, row.getLong(1) / math.max(1, parallelism))
  }

  /** [[saltedJoin]] with the bucket count CHOSEN from the measured
    * skew: below `skewThreshold` the plain join runs (no salt
    * overhead on healthy data); above it, buckets = ⌈factor⌉ capped
    * at `maxBuckets` — just enough replicas to flatten the hot key
    * back to average-partition size. The planning-time measurement is
    * the same move AQE's skew-join makes from runtime map statistics,
    * available here for the joins AQE can't split (hot on both
    * sides, or sort-merge under a hint). Result is identical to the
    * plain join — property-tested. */
  def autoSaltedJoin(
      lhs: DataFrame,
      rhs: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      skewThreshold: Double = 4.0,
      maxBuckets: Int = 64): DataFrame = {
    val factor = skewFactor(lhs, keys)
    if (factor <= skewThreshold) lhs.join(rhs, keys, joinType)
    else saltedJoin(lhs, rhs, keys,
      math.min(maxBuckets, math.max(2, math.ceil(factor).toInt)), joinType)
  }

  /** Materialization barrier: force the columns computed so far to be
    * physically produced (via a round-robin exchange) instead of being
    * re-inlined into every consumer.
    *
    * Catalyst's CollapseProject substitutes a derived column's
    * DEFINING EXPRESSION into each use site — including inside
    * higher-order-function lambdas, where a reference like
    * `element_at(toks, i)` becomes `element_at(split(text,' '), i)`
    * PER ELEMENT, turning an O(n) tokenize into O(n²) interpreted
    * regex work (observed: the minhash stage spent its whole runtime
    * re-splitting text). An Exchange is a projection barrier no
    * optimizer rule crosses, so one shuffle of the (small, already
    * tokenized) rows buys single evaluation. Use after deriving an
    * expensive array column that downstream lambdas iterate over. */
  def materialize(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
