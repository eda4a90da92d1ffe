package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact global rank / ntile / running-sum WITHOUT a single-partition
  * window — the "q158 two-pass escape" as a reusable op, the rank
  * sibling of [[ScalableWindow]].
  *
  * Why: `Window.orderBy(...)` with no partition key (or a handful of
  * hot keys) plans a SINGLE-task sort over the whole relation — fine
  * for a |series|-sized aggregate, a one-core serialization point
  * when the key set grows with the data (users, customers, parts,
  * docs). The classic escape is two passes:
  *
  *   1. range-repartition on (keys ++ order) — each task holds a
  *      contiguous, disjoint slice of the global order;
  *   2. per-(task, key) row counts → tiny exclusive prefix offsets
  *      (≤ numParts·|keys| rows, broadcast back);
  *   3. within-task row_number + offset = the exact global index.
  *
  * Exactness: the range partitioner is a pure function of the sort
  * key, so (a) the slices partition the global order and (b) rows
  * equal on ALL order columns land in the SAME task — within-task
  * `row_number`/`rank` therefore compose with the exclusive offsets
  * into the global `row_number`/`rank` bit-for-bit, for any partition
  * count (property-tested at 1/3/7/32 partitions, with hot keys and
  * dense ties).
  *
  * Scale posture: two balanced corpus shuffles (the range exchange;
  * the (task, key) window hash exchange — every group bounded by a
  * task's slice, never a key's history), one tiny aggregate, one
  * broadcast. No single-partition exchange anywhere in the plan
  * (ScaleSpec-locked for the routed queries).
  *
  * Derived ranks ride the same index: `ntile` is a closed-form
  * bucket formula over (rn, n); `percent_rank` is (rank−1)/(n−1)
  * with rank = min rn over the tie group (a per-tie-group window —
  * tie groups of a continuous value are small; the hot key was the
  * PARTITION, not the value). Running sums swap the count offsets
  * for per-task value sums (exact DECIMAL, order-insensitive).
  */
object ScalableRank {

  private def nParts(df: DataFrame, numParts: Int): Int =
    if (numParts > 0) numParts
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Range-partition on (keys ++ order) and freeze the slice id.
    * Checkpointed once — the slice map AND the final window both read
    * it (same discipline as [[ScalableWindow.dayScoped]]). */
  private def parted(
      df0: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      numParts: Int): DataFrame =
    df0.repartitionByRange(nParts(df0, numParts),
        (keyCols.map(col) ++ orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)

  /** Workhorse: augment `df0` with `rnCol` = exact 1-based global
    * row_number per `keyCols` group under the `orderCols` total order
    * and `nCol` = the group's total row count, without any
    * single-partition exchange. `orderCols` MUST totally order rows
    * within a key (add an id tie-break) — same contract as
    * `row_number` itself. Helper columns are dropped; pass the result
    * straight into [[ntileExpr]] or a (key, value) min-window for
    * tie-collapsing ranks. */
  def withRowIndex(
      df0: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      rnCol: String = "__grn",
      nCol: String = "__gn",
      numParts: Int = 0): DataFrame = {
    val p = parted(df0, keyCols, orderCols, numParts)
    val keys = keyCols.map(col)
    val counts = p.groupBy((col("__pid") +: keys): _*)
      .agg(count(lit(1)).as("__n"))
    val offW = Window.partitionBy(keys: _*).orderBy(col("__pid"))
    // exclusive prefix of slice counts + the key's total — both over
    // the ≤ numParts·|keys| count relation, broadcast back
    val offs = counts
      .withColumn("__off", sum(col("__n")).over(offW) - col("__n"))
      .withColumn("__nk", sum(col("__n")).over(Window.partitionBy(keys: _*)))
      .drop("__n")
    val w = Window.partitionBy((col("__pid") +: keys): _*).orderBy(orderCols: _*)
    p.join(broadcast(offs), "__pid" +: keyCols)
      .withColumn(rnCol, row_number().over(w).cast("long") + col("__off"))
      .withColumn(nCol, col("__nk"))
      .drop("__pid", "__off", "__nk")
  }

  /** SQL `ntile(buckets)` as a closed-form expression of the global
    * 1-based row number `rn` and group size `n`: the first n mod b
    * buckets take ⌈n/b⌉ rows, the rest ⌊n/b⌋ — the standard
    * semantics both Spark and DuckDB implement, so the formula
    * reproduces `ntile` bit-for-bit under the same total order.
    * Double division is exact below 2^53 rows per group. */
  def ntileExpr(rn: Column, n: Column, buckets: Int): Column = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val b = lit(buckets.toLong)
    val k = n % b                                     // big buckets
    val small = floor(n.cast(DoubleType) / b).cast("long")
    val big = small + lit(1L)
    val cut = k * big                                 // rows inside big buckets
    when(rn <= cut, floor((rn - 1).cast(DoubleType) / big) + 1)
      .otherwise(k + floor((rn - cut - 1).cast(DoubleType) / small) + 1)
      .cast("int")
  }

  /** `ntile(buckets) OVER (PARTITION BY keys ORDER BY order)` via the
    * two-pass index — `orderCols` must be a total order (ntile with
    * ties is nondeterministic in ANY engine; the callers all
    * tie-break on an id). */
  def ntile(
      df0: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      buckets: Int,
      out: String,
      numParts: Int = 0): DataFrame =
    withRowIndex(df0, keyCols, orderCols, "__grn", "__gn", numParts)
      .withColumn(out, ntileExpr(col("__grn"), col("__gn"), buckets))
      .drop("__grn", "__gn")

  /** `row_number() OVER (PARTITION BY keys ORDER BY order)` (LONG). */
  def rowNumber(
      df0: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      out: String,
      numParts: Int = 0): DataFrame =
    withRowIndex(df0, keyCols, orderCols, out, "__gn", numParts).drop("__gn")

  /** `percent_rank() OVER (PARTITION BY keys ORDER BY valueCols)`
    * with SQL tie semantics (peers share the rank of their first
    * row): global row_number under (valueCols ++ tieCols), then
    * rank = min(rn) over the (keys, valueCols) tie group and
    * percent_rank = (rank−1)/(n−1). The tie-group window hash-
    * partitions on (keys, value) — bounded by the largest tie group,
    * not by a key's history. `tieCols` must break all value ties. */
  def percentRank(
      df0: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[Column],
      tieCols: Seq[Column],
      out: String,
      numParts: Int = 0): DataFrame = {
    val aug = withRowIndex(df0, keyCols, valueCols ++ tieCols,
      "__grn", "__gn", numParts)
    val peers = Window.partitionBy((keyCols.map(col) ++ valueCols): _*)
    aug
      .withColumn("__rk", min(col("__grn")).over(peers))
      .withColumn(out,
        when(col("__gn") > 1,
          (col("__rk") - 1).cast(DoubleType) /
            (col("__gn") - 1).cast(DoubleType))
          .otherwise(lit(0.0)))
      .drop("__grn", "__gn", "__rk")
  }

  /** Exact running sum `sum(val) OVER (PARTITION BY keys ORDER BY
    * order ROWS UNBOUNDED PRECEDING..CURRENT)` via per-slice value
    * sums as the offsets. `valCol` should be DECIMAL (exact,
    * order-insensitive partials) and non-null — null rows contribute
    * 0 rather than SQL's all-null-frame NULL. */
  def cumSum(
      df0: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valCol: Column,
      out: String,
      numParts: Int = 0): DataFrame = {
    val p = parted(df0, keyCols, orderCols, numParts)
    val keys = keyCols.map(col)
    val v = coalesce(valCol, lit(0).cast("decimal(1,0)"))
    val sums = p.groupBy((col("__pid") +: keys): _*).agg(sum(v).as("__s"))
    val offW = Window.partitionBy(keys: _*).orderBy(col("__pid"))
    val offs = sums
      .withColumn("__soff", sum(col("__s")).over(offW) - col("__s"))
      .drop("__s")
    val w = Window.partitionBy((col("__pid") +: keys): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(broadcast(offs), "__pid" +: keyCols)
      .withColumn(out, sum(v).over(w) + col("__soff"))
      .drop("__pid", "__soff")
  }
}
