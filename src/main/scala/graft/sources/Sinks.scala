package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks with the reference's safety rule: never overwrite the
  * serving table with an empty frame
  * (`/root/reference/project/transform_data.py:194-197` aborts before
  * the destructive JDBC overwrite).
  *
  * The engine's canonical lake sink is Parquet. Full-refresh overwrite
  * mirrors the reference (`transform_data.py:200-209`); the scale
  * path is partitioned append + dedup (`dropDuplicates` on the
  * natural key replaces the UNIQUE constraint the reference's
  * overwrite silently dropped — SURVEY §1.3, §7.4).
  */
object Sinks {

  class EmptyResultException(msg: String) extends RuntimeException(msg)

  /** Overwrite `path`, aborting on an empty frame. The emptiness probe
    * is `isEmpty` (limit-1 scan), not a full count. */
  def overwriteParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    if (df.isEmpty)
      throw new EmptyResultException(
        s"refusing to overwrite $path with an empty result (transform_data.py:196-197 rule)")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Row-oriented JSON sink (S7 — the reference writes one raw JSON
    * payload per symbol, `project/ingest_data.py:104-106`; the
    * distributed analog is line-delimited JSON part files). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Size-targeted parquet writer — the small-files guard: pick the
    * file count from the optimizer's size estimate so each output
    * file lands near `targetBytes` AFTER parquet compression
    * (`compressionRatio` ≈ in-memory bytes per stored byte; snappy
    * on columnar analytics data runs ~3×). A 1000-executor job that
    * writes one file per task floods the lake with ~KB files and
    * every later scan pays per-file open costs; repartitioning to the
    * computed count makes file size a CONTRACT of the sink instead of
    * an accident of upstream parallelism. Uses the plan-stats
    * estimate — no extra job — and clamps to [1, maxFiles].
    *
    * Stat-less sources (JDBC relations, some views) report
    * `spark.sql.defaultSizeInBytes` = Long.MaxValue, which would clamp
    * to `maxFiles` and recreate exactly the small-files flood this
    * sink prevents; any estimate at or past that sentinel falls back
    * to the plan's incoming partition count (one file per upstream
    * task — the pre-`writeSized` behavior, never a 100000-file
    * explosion). */
  def writeSized(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L << 20,
      compressionRatio: Double = 3.0,
      maxFiles: Int = 100000): Unit = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val sentinel = BigInt(
      df.sparkSession.sessionState.conf.defaultSizeInBytes)
    val perFile = BigInt((targetBytes * compressionRatio).toLong.max(1L))
    val n =
      if (est >= sentinel)
        df.rdd.getNumPartitions.max(1).min(maxFiles)
      else ((est + perFile - 1) / perFile).max(1).min(maxFiles).toInt
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** [[overwriteParquet]]'s empty-guard + [[writeSized]]'s file-count
    * contract in one sink — the product pipeline's serving write
    * (`Pipeline.run`) routes here so the refresh output lands as
    * ~`targetBytes` files regardless of upstream parallelism, instead
    * of one file per task. */
  def overwriteSized(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L << 20): Unit = {
    if (df.isEmpty)
      throw new EmptyResultException(
        s"refusing to overwrite $path with an empty result (transform_data.py:196-197 rule)")
    writeSized(df, path, targetBytes)
  }

  /** JDBC full-refresh sink with the same empty-guard rule (S3 —
    * `transform_data.py:200-209`; overwrite drops and recreates the
    * table from the frame schema, as the reference's did). Round-trip,
    * refresh, and guard semantics are covered by JdbcSpec against
    * embedded Derby. */
  def overwriteJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): Unit = {
    if (df.isEmpty)
      throw new EmptyResultException(
        s"refusing to overwrite $table with an empty result")
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }

  /** Z-order-clustered parquet write: compute the Morton key over two
    * columns, range-partition on it, sort within partitions, drop the
    * key. Each output file then covers a NARROW rectangle of the
    * (a, b) key space, so parquet row-group min/max stats prune scans
    * filtered on EITHER column — one sort order serving two predicate
    * dimensions (the ScaleSpec test measures per-file z-spans at a few
    * % of the global span). This is the write-side application of
    * [[graft.ops.LayoutOps.zValue]]; `nFiles` sizes the range
    * partitioning (at 100 TB: total bytes / target file size). */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      aCol: String,
      bCol: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    graft.ops.LayoutOps.zOrdered(df, aCol, bCol)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed managed table: pre-hash-partitions rows by the join key
    * so repeated joins/aggregations on that key run WITHOUT a shuffle
    * — the lake-layout half of "co-locate joins via bucketing"
    * (SURVEY §7.4 / the 100 TB posture). Requires a warehouse-backed
    * table (bucket metadata lives in the catalog). */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  /** Incremental append with key dedup against the incoming batch —
    * the 100 TB replacement for full refresh. Partition by trading
    * date so daily reruns prune to one partition. */
  def appendDeduped(df: DataFrame, path: String, keyCols: Seq[String], partitionBy: Seq[String]): Unit = {
    val deduped = df.dropDuplicates(keyCols)
    val w = deduped.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Incremental JDBC append with key dedup — the UNIQUE constraint
    * the reference's full-refresh overwrite silently dropped
    * (`transform_data.py:200-209`, SURVEY §1.3/§7.4(b)) re-expressed
    * engine-side: the batch drops its internal key duplicates, then
    * anti-joins the target's EXISTING keys (a key-columns-only JDBC
    * scan — column pruning reaches the generated SQL) and appends only
    * the survivors. Creates the table when absent. Idempotent:
    * replaying a delivered batch appends nothing, so at-least-once
    * upstream delivery yields exactly-once table contents. A batch
    * that dedups to empty is a silent no-op (an incremental day may
    * legitimately already be loaded), unlike the destructive
    * overwrite's empty GUARD. */
  def appendDedupedJdbc(df: DataFrame, url: String, table: String,
      keyCols: Seq[String],
      props: java.util.Properties = new java.util.Properties): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val deduped = df.dropDuplicates(keyCols)
    val fresh = scala.util.Try(
        spark.read.jdbc(url, table, props).select(keyCols.map(col): _*)
      ) match {
      case scala.util.Success(existingKeys) =>
        deduped.join(existingKeys, keyCols, "left_anti")
      case scala.util.Failure(_) => deduped // table absent: first load
    }
    if (!fresh.isEmpty)
      fresh.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
