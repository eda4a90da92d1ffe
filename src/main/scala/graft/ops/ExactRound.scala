package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Engine-proof HALF_UP rounding for INTEGER-BACKED RATIONALS.
  *
  * `round(x, d)` on a double quotient of exact integers is the one
  * construct this repo never ships: Spark rounds via the double's
  * shortest round-trip decimal repr (BigDecimal.valueOf + HALF_UP)
  * while DuckDB rounds via a scaled multiply on the double product —
  * two legal implementations that can disagree by one step of the
  * rounding scale whenever the exact rational sits within a few ulps
  * of a half-boundary (the r10 q365 failure; see
  * tools/check_oracle.py --boundary-audit for the detector).
  *
  * The fix is to never form the double: compute the d-dp-scaled value
  * as an exact integer — `n·10^d div den`, plus one when twice the
  * exact remainder reaches the denominator (= HALF_UP, sign-aware,
  * away from zero) — and divide by the scale once at the very end.
  * Both engines do exact integer arithmetic (Spark DECIMAL(38,0)
  * div/%, DuckDB HUGEINT // and %), so the result is bit-identical by
  * construction at any engine version.
  *
  * Twin idiom ([[sqlRatioRound]]): the same finish in DuckDB SQL over
  * HUGEINT (INT128) — keep the two generators next to each other so a
  * query and its oracle can never drift.
  */
object ExactRound {

  private val dec = DecimalType(38, 0)

  /** The dp-scaled integer HALF_UP(`num`/`den` · 10^dp) as a LONG,
    * computed entirely in exact integer arithmetic. `num` and `den`
    * must be exact integers (longs or DECIMAL(38,0) — pass scaled-
    * decimal folds through [[toUnscaled]] first); `den` must be
    * strictly positive (guard with `when(den > 0, ...)` at the call
    * site); `num` may be negative (ties round away from zero,
    * matching both engines' HALF_UP on negatives).
    *
    * Exact while |num|·10^dp < 10^38 and the result fits a LONG. The
    * tie check compares the exact remainder r = a % b against b - r
    * (equivalent to 2r >= b without the doubling), so no intermediate
    * ever exceeds a = |num|·10^dp — the 10^38 bound above is the ONLY
    * overflow surface, matching the DuckDB twin's HUGEINT headroom. */
  def ratioRoundScaled(num: Column, den: Column, dp: Int): Column = {
    require(dp >= 0 && dp <= 18, s"dp out of range: $dp")
    val a = abs(num.cast(dec)) * lit(math.pow(10, dp).toLong).cast(dec)
    val b = den.cast(dec)
    val r = a % b
    val q = call_function("div", a, b) +
      when(r >= b - r, 1L).otherwise(0L)
    when(num < 0, -q).otherwise(q)
  }

  /** HALF_UP(`num`/`den`, `dp`) as a DOUBLE — [[ratioRoundScaled]]
    * divided by the scale once, the engine-proof replacement for
    * `round(num.cast(double) / den.cast(double), dp)`. */
  def ratioRound(num: Column, den: Column, dp: Int): Column =
    ratioRoundScaled(num, den, dp).cast(DoubleType) /
      lit(math.pow(10, dp))

  /** A DECIMAL(38, s) column's exact unscaled integer value as
    * DECIMAL(38,0): multiply by 10^s (exact — the value is integral
    * after the shift). Use to feed a 12dp/8dp scaled-decimal fold
    * into [[ratioRound]] without a lossy double cast. */
  def toUnscaled(c: Column, s: Int): Column = {
    require(s >= 0 && s <= 18, s"scale out of range: $s")
    (c * lit(math.pow(10, s).toLong)).cast(dec)
  }

  /** DuckDB twin of [[ratioRoundScaled]]: emits the HUGEINT
    * exact-integer dp-scaled HALF_UP integer for `num`/`den`.
    * `num`/`den` are SQL expressions producing exact integers
    * (HUGEINT-castable); `den` strictly positive. */
  def sqlRatioRoundScaled(num: String, den: String, dp: Int): String = {
    require(dp >= 0 && dp <= 18, s"dp out of range: $dp")
    val s = math.pow(10, dp).toLong
    val a = s"(abs(CAST(($num) AS HUGEINT))*$s)"
    val b = s"CAST(($den) AS HUGEINT)"
    // tie check as r >= b - r (no doubling): mirrors the Spark side's
    // overflow surface exactly — only a = |num|·10^dp can overflow
    s"((CASE WHEN ($num) < 0 THEN -1 ELSE 1 END)*($a//$b + " +
      s"(CASE WHEN ($a%$b) >= $b-($a%$b) THEN 1 ELSE 0 END)))"
  }

  /** DuckDB twin of [[ratioRound]]: the scaled integer divided by the
    * scale once, as DOUBLE. */
  def sqlRatioRound(num: String, den: String, dp: Int): String = {
    val s = math.pow(10, dp).toLong
    s"(CAST(${sqlRatioRoundScaled(num, den, dp)} AS DOUBLE)/$s.0)"
  }
}
