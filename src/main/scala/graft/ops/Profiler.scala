package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Single-pass numeric column profiler — the per-column completeness /
  * cardinality / range / mass summary a data-quality report opens with
  * (the columnar generalization of the reference's per-day bar audit,
  * `project/validate_data.py:62-101`).
  *
  * ONE scan and ONE aggregate produce every statistic for every
  * profiled column; the wide 1-row result is then unpivoted with
  * `stack` into a row per column. Sums accumulate in DECIMAL (the q34
  * rule) so the emitted mass is partitioning-independent.
  *
  * Scale posture: the multi-column exact `count_distinct` plans as one
  * Expand (input × n_cols) feeding a single partial-aggregated
  * shuffle — the standard Spark multi-distinct shape; the expand
  * factor equals the number of profiled columns, so cost scales
  * linearly and predictably. At 100 TB with wide profiles, swap
  * `count_distinct` for `approx_count_distinct` per column (same
  * plan minus the Expand) — exact is kept here because the oracle
  * hash-compares cardinalities.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        sum(col(c).cast(DecimalType(28, 6))).as(s"${c}__sum"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nd, CAST(${c}__min AS DOUBLE), " +
        s"CAST(${c}__max AS DOUBLE), CAST(${c}__sum AS DOUBLE)"
    }.mkString(", ")
    one
      .selectExpr("__total AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_non_null, n_distinct, min_v, max_v, sum_v)")
      .select(col("col_name"), col("n_rows"), col("n_non_null"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"),
        round(col("min_v"), 6).as("min_v"),
        round(col("max_v"), 6).as("max_v"),
        round(col("sum_v"), 6).as("sum_v"))
  }
}
