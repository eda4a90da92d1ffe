package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic hashing.
  *
  * Spark's native `hash`/`xxhash64` have no DuckDB twin, so every
  * operator that must be oracle-checkable derives integer hashes from
  * `md5` hex prefixes — identical bytes in any engine. The 8-hex-char
  * prefix gives a uniform value in [0, 2^32), small enough that the
  * universal-hash family `(a*x + b) mod p` below never overflows a
  * signed 64-bit integer (a, b < 2^31, x < 2^32 → a*x + b < 2^63).
  *
  * At 100 TB this costs one md5 per token/shingle — still cheap next
  * to the shuffle it feeds; swap in `xxhash64` when oracle parity is
  * not required.
  */
object CrossHash {

  /** Prime just above 2^32 for the universal hash family. */
  val P: Long = 4294967311L

  /** 32-bit integer hash of a string column (md5-prefix). */
  def x32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** DuckDB SQL twin of [[x32]]. */
  def duckX32(e: String): String =
    s"CAST(concat('0x', substr(md5($e),1,8)) AS BIGINT)"

  /** DuckDB SQL twin of [[CrossHashKernels.md5Prefix64]]: signed 64-bit
    * from the first 16 md5 hex chars, assembled from two 32-bit halves
    * (a direct 16-hex-char cast overflows BIGINT for values >= 2^63).
    * `hi*2^32 + lo` stays in signed range once hi is re-signed. */
  def duckX64(e: String): String = {
    val hi = s"CAST(concat('0x', substr(md5($e),1,8)) AS BIGINT)"
    val lo = s"CAST(concat('0x', substr(md5($e),9,8)) AS BIGINT)"
    s"(($hi - CASE WHEN $hi >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + $lo)"
  }

  /** Deterministic universal-hash coefficients a_i ∈ [1, 2^31). */
  def hashA(k: Int): Seq[Long] =
    (0 until k).map(i => (2654435761L * (i + 1) + 1013904223L) % 2147483646L + 1)

  /** Deterministic universal-hash offsets b_i ∈ [0, 2^31). */
  def hashB(k: Int): Seq[Long] =
    (0 until k).map(i => (2246822519L * (i + 1) + 3266489917L) % 2147483647L)
}
