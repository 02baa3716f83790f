package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Every probabilistic operator (MinHash, SimHash, hyperplane LSH) derives
  * its hash bits from md5 — the one hash both Spark and DuckDB implement
  * bit-identically — so the driver's DuckDB oracle can recompute signatures
  * and buckets exactly. xxhash64/murmur3 are Spark-only and would leave the
  * operators un-oracle-able (round-1 verdict).
  *
  * Scale note: md5 is ~10× the cost of xxhash64, so operators call [[h64]]
  * ONCE per token/shingle and fan out to k hash functions with the affine
  * universal family [[affine]] — integer multiply-add-mod on the single
  * md5-derived value, virtually free and equally portable.
  */
object Hashing {

  /** Largest 32-bit prime; the affine family works mod P32 on 32-bit
    * inputs so products stay under 2^63 (no overflow in either engine). */
  val P32 = 4294967291L

  /** 60-bit hash: first 15 hex digits of md5(seed:value), parsed base-16.
    * DuckDB mirror: CAST('0x' || substring(md5(seed || ':' || v), 1, 15) AS BIGINT). */
  def h64(v: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), v)), 1, 15), 16, 10).cast("long")

  /** The low 32 bits of [[h64]] — input domain of the affine family. */
  def h32(v: Column, seed: String): Column =
    h64(v, seed).bitwiseAND(lit(0xFFFFFFFFL))

  /** i-th affine universal hash of a 32-bit value: (a_i·x + b_i) mod P32.
    * Coefficients are md5-derived at plan time → identical literals in the
    * generated oracle SQL. */
  def affine(x: Column, i: Int): Column =
    pmod(lit(affineA(i)) * x + lit(affineB(i)), lit(P32))

  /** Plan-time coefficient a_i ∈ [1, 2^30): md5-derived, odd. */
  def affineA(i: Int): Long = (planTimeH64(s"a:$i") & 0x3FFFFFFFL) | 1L

  /** Plan-time coefficient b_i ∈ [0, 2^30). */
  def affineB(i: Int): Long = planTimeH64(s"b:$i") & 0x3FFFFFFFL

  /** JVM-side twin of [[h64]] for plan-time constants (seeds, hyperplanes). */
  def planTimeH64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment equivalent to [[h64]] applied to `expr`. */
  def h64Sql(expr: String, seed: String): String =
    s"CAST(('0x' || substring(md5('$seed:' || $expr), 1, 15)) AS BIGINT)"

  /** DuckDB SQL fragment equivalent to [[affine]]([[h32]](expr, seed), i). */
  def affineSql(xExpr: String, i: Int): String =
    s"((${affineA(i)} * ($xExpr & 4294967295) + ${affineB(i)}) % $P32)"
}
