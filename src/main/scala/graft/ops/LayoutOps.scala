package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys.
  *
  * Z-ordering (Morton codes) is the standard way to make ONE sort
  * order serve range predicates on SEVERAL columns: interleaving the
  * bits of two keys means rows close in either key stay close in the
  * sorted file, so parquet min/max row-group stats prune scans on
  * both dimensions. At 100 TB this is a write-side layout choice —
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` before
  * the sink — and the z-value itself is pure map-side bit math
  * (codegen arithmetic, no shuffle, no UDF).
  */
object LayoutOps {

  /** Morton z-value interleaving the low `bits` bits of `a` (even
    * positions) and `b` (odd positions): z = Σ_i ((a>>i)&1)<<2i |
    * ((b>>i)&1)<<(2i+1). Unrolled to a flat sum of 2·bits codegen'd
    * terms — the same expression a SQL twin can write literally, so
    * the key is engine-portable. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31 (got $bits)")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Cluster `df` for two-column locality: z-value over (`aCol`,
    * `bCol`), rows ordered by it. The query gate exercises the KEY
    * (deterministic bit math); the write-side
    * repartitionByRange + sortWithinPartitions application is the
    * caller's sink decision. */
  def zOrdered(df: DataFrame, aCol: String, bCol: String, bits: Int = 16): DataFrame =
    df.withColumn("z", zValue(col(aCol), col(bCol), bits))
}
