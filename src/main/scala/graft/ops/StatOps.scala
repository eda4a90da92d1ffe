package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Cross-table association / inequality statistics that don't belong
  * to one domain module: rank association (Kendall tau-b) and
  * entropy-based inequality (Theil T/L). Both follow the repo's
  * determinism playbook — integer/DECIMAL accumulation, one shared
  * double formula at the end — so results are partitioning- and
  * scale-independent.
  */
object StatOps {

  private def dbl(c: Column) = c.cast(DoubleType)

  /** Kendall tau-b between two DISCRETE columns, computed from the
    * contingency table rather than from row pairs.
    *
    * The textbook statistic is O(n²) in row pairs; over a contingency
    * table with cells (x, y, n_xy) the concordant count is
    * C = Σ_cells n_xy · Σ_{x'>x, y'>y} n_x'y' (each unordered pair
    * counted once because both inequalities are strict), discordant D
    * mirrors it with y' < y, and the tie terms n1/n2 come from the
    * marginals. tau_b = (C − D) / (√(n0−n1) · √(n0−n2)) with
    * n0 = n(n−1)/2.
    *
    * Scale: one aggregation collapses the fact table to |X|·|Y| cells
    * (bounded by distinct-value products, NOT by rows); the cell
    * self-join is broadcast — at 100 TB the shuffle is the single
    * groupBy, everything after runs on a few hundred rows. All counts
    * fold in long arithmetic (C ≤ n(n−1)/2 fits a long for n < 6e9);
    * the two variance factors can pass 2^63 multiplied, so the final
    * formula takes √ of each factor separately in double — the same
    * op order as the oracle.
    */
  def kendallTauB(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df
      .select(xCol.cast(LongType).as("x"), yCol.cast(LongType).as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val conc = a.join(broadcast(b),
        col("xb") > col("xa") && col("yb") > col("ya"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("conc"))
    val disc = a.join(broadcast(b),
        col("xb") > col("xa") && col("yb") < col("ya"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("disc"))
    // t(t-1) is always even, so integer DIV is exact — and unlike
    // double `/` it stays exact past 2^53 (the heapsLaw div lesson)
    val tiesX = cells.groupBy(col("x")).agg(sum(col("c")).as("tx"))
      .agg(sum(expr("tx * (tx - 1) DIV 2")).as("n1"),
        sum(col("tx")).as("n"))
    val tiesY = cells.groupBy(col("y")).agg(sum(col("c")).as("ty"))
      .agg(sum(expr("ty * (ty - 1) DIV 2")).as("n2"))
    val nCells = cells.agg(count(lit(1)).as("n_cells"))
    conc.crossJoin(disc).crossJoin(tiesX).crossJoin(tiesY).crossJoin(nCells)
      .withColumn("n0", expr("n * (n - 1) DIV 2"))
      .select(col("n"), col("n_cells"), col("conc"), col("disc"),
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          round(dbl(col("conc") - col("disc")) /
            (sqrt(dbl(col("n0") - col("n1"))) *
              sqrt(dbl(col("n0") - col("n2")))), 6))
          .as("tau_b"))
  }

  /** Per-group Theil inequality indices of a positive value spread
    * over members: T = (1/n) Σ (x/μ) ln(x/μ) and L = (1/n) Σ ln(μ/x)
    * — the entropy-based alternative to the Gini (q266) whose terms
    * are MEMBER-LOCAL once μ is known, so unlike the Gini there is no
    * sort and no pairwise structure: two aggregations and a broadcast
    * join, at any scale.
    *
    * `members` must carry (groupCol, a DECIMAL-exact positive value
    * `xdec`). Determinism: μ = round(Σxdec, 2) cast to double (round
    * the DECIMAL first — the .xx5 cast lesson), each member term is
    * one shared-order double formula rounded at 12 dp and folded in
    * DECIMAL(38,12), the final indices round at 6.
    */
  def theilIndex(members: DataFrame, groupCol: String): DataFrame = {
    val totals = members.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("xdec")), 2).cast(DoubleType).as("total"))
    members.join(broadcast(totals), groupCol)
      .withColumn("mu", col("total") / dbl(col("n_members")))
      .withColumn("xd", dbl(col("xdec")))
      .withColumn("tt",
        round(col("xd") / col("mu") * log(col("xd") / col("mu")), 12)
          .cast(DecimalType(38, 12)))
      .withColumn("tl",
        round(log(col("mu") / col("xd")), 12).cast(DecimalType(38, 12)))
      .groupBy(col(groupCol))
      .agg(max(col("n_members")).as("n_members"),
        round(max(col("mu")), 4).as("mean_value"),
        round(dbl(sum(col("tt"))) / dbl(max(col("n_members"))), 6)
          .as("theil_t"),
        round(dbl(sum(col("tl"))) / dbl(max(col("n_members"))), 6)
          .as("theil_l"))
  }

  /** Kaplan–Meier product-limit survival per group, evaluated at
    * fixed horizons: S(H) = Π_{event times t ≤ H} (1 − d_t/n_t) with
    * right-censoring — the estimator that answers "what share of
    * customers have NOT reordered within H days" without the bias of
    * dropping still-active customers (censored spells count in the
    * at-risk denominator until their censor time, which a plain gap
    * histogram like q244 cannot do).
    *
    * `durations` carries (groupCol, `dur` integer time units,
    * `event` 1 = observed, 0 = censored). Determinism: d_t and the
    * at-risk n_t are exact integers (one desc-cumulative window over
    * the (group, dur) cells); the product folds as Σ ln((n−d)/n)
    * rounded at 12 dp in DECIMAL(38,12), exp rounds at 6; a horizon
    * that has absorbed a d = n event time pins S to exactly 0.
    *
    * Scale: the spell table collapses to (group, dur) cells in one
    * shuffle — windows and the broadcast horizon join run on cells
    * (bounded by distinct durations), never on members. */
  def kaplanMeier(
      durations: DataFrame,
      groupCol: String,
      horizons: Seq[Int]): DataFrame = {
    val dec = DecimalType(38, 12)
    val cells = durations
      .groupBy(col(groupCol), col("dur"))
      .agg(count(lit(1)).as("n_all"), sum(col("event")).as("d"))
    val wDesc = Window.partitionBy(col(groupCol)).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ev = cells
      .withColumn("at_risk", sum(col("n_all")).over(wDesc))
      .filter(col("d") > 0)
      .withColumn("lnterm",
        when(col("d") < col("at_risk"),
          round(log(dbl(col("at_risk") - col("d")) / dbl(col("at_risk"))),
            12).cast(dec)))
    val hs = durations.sparkSession
      .createDataFrame(horizons.map(Tuple1(_))).toDF("horizon")
    val base = durations.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_spells"), sum(col("event")).as("n_events"))
    base.crossJoin(broadcast(hs))
      .join(ev.select(col(groupCol), col("dur"), col("d"), col("lnterm")),
        Seq(groupCol), "left")
      .withColumn("in_h", col("dur").isNotNull && col("dur") <= col("horizon"))
      .groupBy(col(groupCol), col("horizon"), col("n_spells"),
        col("n_events"))
      .agg(sum(when(col("in_h"), col("lnterm"))).as("lnsum"),
        max(when(col("in_h") && col("lnterm").isNull, 1)
          .otherwise(0)).as("absorbed"),
        sum(when(col("in_h"), col("d")).otherwise(0L)).as("d_in_h"))
      .select(col(groupCol), col("horizon"), col("n_spells"),
        col("n_events"),
        when(col("absorbed") === 1, lit(0.0))
          .when(col("d_in_h") === 0, lit(1.0))
          .otherwise(round(exp(dbl(col("lnsum"))), 6)).as("surv"))
  }

}
