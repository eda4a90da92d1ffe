package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-modeling operators the reference's Postgres layer gets
  * from hand-written SQL; here they are engine operators.
  *
  * The reference persists run-stamped snapshots
  * (`validate_calendar_alpaca.py:104-129` inserts keyed detail rows and
  * lets history accumulate); the natural next step for any consumer of
  * that history is a slowly-changing-dimension view — "what was this
  * key's attribute over time, as validity intervals". [[scd2]] builds
  * exactly that from an append-only snapshot/event log.
  */
object WarehouseOps {

  /** Slowly-changing-dimension Type 2 build: collapse an append-only
    * snapshot log (key, ts, attribute) into attribute validity
    * intervals — one row per attribute CHANGE with `effective_from`,
    * `effective_to` (null while current), a per-key `version`, and an
    * `is_current` flag.
    *
    * Change detection is a lag over (ts, tie) within the key;
    * consecutive equal attribute values collapse (the q136 islands
    * rule, producing intervals instead of run stats). `tieCol` makes
    * same-timestamp snapshots deterministic: the later tie wins the
    * interval, the earlier one closes at zero length — identical
    * total order in both engines.
    *
    * Scale: both window passes share ONE partitioning/ordering
    * (partition by key, order by ts, tie), so Catalyst plans a single
    * exchange + sort reused across the lag, row_number, and lead —
    * per-key history is bounded by change count, not log size, after
    * the first filter. The key cardinality grows with data; no hot
    * partitions.
    */
  def scd2(
      snapshots: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    snapshots
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol),
        col("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** The standing per-(day, key) rollup [[incrementalDailyAgg]]
    * maintains: exact counts plus a DECIMAL-accumulated value sum
    * emitted as a 6dp double. */
  def dailyAgg(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    events.groupBy(to_date(col(tsCol)).as("d"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valCol).cast(DecimalType(18, 6))), 6)
          .cast(DoubleType).as("sum_value"))
  }

  /** Bidirectional referential-coverage audit of one FK edge: orphan
    * child rows (key absent from the parent) AND childless parent
    * keys (no referencing child) with their shares — the cardinality
    * profile of the whole star schema that [[tableExpectations]]'s
    * pass/fail orphan checks don't report (a fact table can be 100%
    * FK-valid while half the dimension is dead weight worth pruning
    * from broadcast joins).
    *
    * Scale: child keys pre-aggregate map-side to one (key, count) row
    * before the single full-outer key join against the distinct
    * parent keys; the fold is a 1-row aggregate. Dimensions stay
    * dimension-sized throughout. */
  def fkEdge(edge: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.groupBy(col(childKey).as("k"))
      .agg(count(lit(1)).as("nc"))
    val pk = parent.select(col(parentKey).as("k")).distinct()
      .withColumn("__p", lit(1))
    ck.join(pk, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(col("nc")), lit(0L)).as("n_child"),
        coalesce(sum(when(col("__p").isNull, col("nc"))), lit(0L))
          .as("n_orphans"),
        coalesce(sum(when(col("__p").isNotNull, 1L)), lit(0L))
          .as("n_parents"),
        coalesce(sum(when(col("__p").isNotNull && col("nc").isNull, 1L)),
          lit(0L)).as("n_childless"))
      .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"),
        col("n_parents"), col("n_childless"),
        when(col("n_child") > 0,
          ExactRound.ratioRound(col("n_orphans"), col("n_child"), 6))
          .as("orphan_share"),
        when(col("n_parents") > 0,
          ExactRound.ratioRound(col("n_childless"), col("n_parents"), 6))
          .as("childless_share"))
  }

  /** The full FK-edge audit: one [[fkEdge]] row per named edge,
    * unioned — each edge is an independent branch that prunes to its
    * two key columns. */
  def fkAudit(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    edges.map { case (e, c, ck, p, pk) => fkEdge(e, c, ck, p, pk) }
      .reduce(_ unionByName _)

  /** Deequ-style relational expectation suite over the star schema:
    * one row per named check with checked/violation counts and a pass
    * flag — the table-level data-quality audit the reference's
    * per-bar validators (`validate_data.py`) never get to
    * (uniqueness, referential integrity, value ranges, temporal
    * sanity). On the synthetic data two checks genuinely FIRE
    * (duplicate (orderkey, linenumber) pairs; ship-before-order
    * lines), so the suite is exercised, not decorative.
    *
    * Scale: every check is one map-side-combined aggregate or one
    * key-join (anti joins for FKs — the q08 shape; the temporal check
    * joins on the natural fact key); checks run as independent
    * branches of one union — at 100 TB each branch prunes to the
    * columns it needs and nothing is collected. */
  def tableExpectations(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame): DataFrame = {
    def check(name: String, checked: Column, violations: Column,
        src: DataFrame) =
      src.agg(checked.as("n_checked"), violations.as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0).as("pass"))
    val cnt = count(lit(1))
    val pkDups = check("lineitem_pk_unique", cnt,
      cnt - count_distinct(struct(col("l_orderkey"), col("l_linenumber"))),
      lineitem)
    def fkCheck(name: String, fact: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String) = {
      val total = fact.agg(count(lit(1)).as("n_checked"))
      val orphans = fact
        .join(dim.select(col(dimKey)), col(factKey) === col(dimKey),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      total.crossJoin(orphans)
        .select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0).as("pass"))
    }
    val checks = Seq(
      pkDups,
      fkCheck("orders_custkey_fk", orders, "o_custkey",
        customer, "c_custkey"),
      fkCheck("lineitem_orderkey_fk", lineitem, "l_orderkey",
        orders.select(col("o_orderkey")), "o_orderkey"),
      check("discount_in_unit_range", cnt,
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)), lineitem),
      check("quantity_positive", cnt,
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)), lineitem),
      check("price_positive", cnt,
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)), lineitem),
      check("orderdate_not_null", cnt,
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)), orders),
      check("ship_not_before_order", cnt,
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)),
        lineitem.join(orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))))
    checks.reduce(_ unionByName _)
  }

  /** Candidate functional-dependency audit: for each declared X → Y,
    * one row with the number of X-groups, the groups holding MORE
    * than one distinct Y (the FD violations), the violation rate, and
    * the worst fanout — the schema-discovery / denormalization-sanity
    * check next to [[tableExpectations]]'s declared constraints
    * (Deequ's `hasUniqueness` answers "is X a key"; this answers "is
    * Y determined by X", the question a modeler asks before collapsing
    * a dimension).
    *
    * Determinism: all-integer counts plus one floor-form 6dp rate.
    *
    * Scale: each candidate is ONE X-keyed count-distinct aggregate
    * over its two pruned columns (map-side partial, the q12 shape);
    * branches union independently — nothing corpus-sized moves
    * except the grouped key shuffle itself. */
  def fdViolations(
      candidates: Seq[(String, DataFrame, String, String)]): DataFrame = {
    def dbl(c: Column) = c.cast(org.apache.spark.sql.types.DoubleType)
    candidates.map { case (name, df, lhs, rhs) =>
      df.select(col(lhs), col(rhs))
        .groupBy(col(lhs))
        .agg(count_distinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("n_rhs")).as("max_fanout"))
        .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
          // n_keys = 0 (empty candidate relation) must NOT read as
          // "FD holds": null rate and null verdict instead of 0/0 NaN
          when(col("n_keys") > 0,
            floor(dbl(col("n_violating")) / dbl(col("n_keys")) * lit(1e6) +
              lit(0.5)) / lit(1e6)).as("violation_rate"),
          col("max_fanout"),
          when(col("n_keys") > 0, col("n_violating") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Incremental refresh of a standing daily aggregate under LATE
    * data: recompute ONLY the days the delta batch touches (from the
    * full source, so multiple late batches stay idempotent) and splice
    * them over the base — the partition-scoped "backfill just what
    * changed" pattern every warehouse pipeline runs nightly, instead
    * of the reference's full-refresh (`ingest_data.py` rewrites whole
    * tables).
    *
    * Correctness contract: the result equals [[dailyAgg]] over the
    * full source exactly (days without late rows are untouched base
    * rows; days with late rows are recomputed whole). The affected-day
    * sliver BROADCASTS into both branches — an anti join keeps the
    * untouched base rows, a semi join prunes the recompute scan to the
    * affected days BEFORE any aggregation, so the refresh costs
    * O(affected partitions), not O(table). */
  def incrementalDailyAgg(
      baseAgg: DataFrame,
      fullSource: DataFrame,
      delta: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    val affected = delta.select(to_date(col(tsCol)).as("ad")).distinct()
    val kept = baseAgg.join(broadcast(affected),
      col("d") === col("ad"), "left_anti")
    val recomputed = dailyAgg(
      fullSource.join(broadcast(affected),
        to_date(col(tsCol)) === col("ad"), "left_semi"),
      keyCol, tsCol, valCol)
    kept.unionByName(recomputed)
  }
}
