package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Externally-reproducible hashing for the near-dup / ANN operators.
  *
  * Round 1 derived signatures from Spark's xxhash64, which no other engine
  * implements — so the LSH/SimHash/ANN queries could not be oracled
  * (CORRECTNESS `no_oracle`). Everything here is computable bit-for-bit in
  * any SQL engine with `md5` and 64-bit integer arithmetic:
  *
  *  - base hash: the first/second 8 hex chars of md5(s), parsed as unsigned
  *    32-bit integers (DuckDB: `('0x' || substr(md5(s),1,8))::BIGINT`);
  *  - permutation mixing: affine (a*h + b) mod (2^61-1) with a < 2^30 so the
  *    product stays inside a signed 64-bit integer under ANSI arithmetic;
  *  - coefficients and LSH hyperplanes: fixed splitmix64-derived integer
  *    tables, baked as literals into BOTH the Spark plan and the generated
  *    oracle SQL (same Scala arrays).
  *
  * Determinism across engines is the point; cryptographic strength is not.
  */
object OracleHash {

  /** Mersenne prime 2^61 - 1 — modulus of the affine permutation family. */
  val P: Long = 2305843009213693951L

  /** standard splitmix64 finalizer-based generator (public domain algorithm;
    * used only to derive fixed constant tables). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** multipliers a_j: odd, < 2^30 (product with a 32-bit hash fits 2^62). */
  def coefA(k: Int): Seq[Long] =
    (0 until k).map(j => (splitmix64(2L * j + 1) & ((1L << 30) - 1)) | 1L)

  /** offsets b_j: < 2^30. */
  def coefB(k: Int): Seq[Long] =
    (0 until k).map(j => splitmix64(2L * j + 2) & ((1L << 30) - 1))

  /** LSH hyperplane component table: integer in [0, 100000); the plane value
    * is (v/100000.0 - 0.5). Indexed [bit][dim]. */
  def planeInts(bits: Int, maxDim: Int): Seq[Seq[Long]] =
    (0 until bits).map(q =>
      (0 until maxDim).map(i => Math.floorMod(splitmix64(q * 1000003L + i + 77L), 100000L)))

  // ---- Spark Column builders ----

  /** unsigned 32-bit from md5 hex chars [1..8]. */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 62-bit hash from one md5: 31 low bits of each half, packed. Stays below
    * 2^62 so bit masks and sums never overflow a signed 64-bit integer in
    * either engine. */
  def h62FromMd5Hex(m: Column): Column =
    conv(substring(m, 1, 8), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL)) +
      conv(substring(m, 9, 8), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL)) * lit(2147483648L)

  // ---- DuckDB SQL text builders (same math, same constants) ----

  /** SQL: unsigned 32-bit from md5 hex chars [1..8] of expression `e`. */
  def sqlH32(e: String): String = s"(('0x' || substr(md5($e),1,8))::BIGINT)"

  /** SQL: the 62-bit packed hash of [[h62FromMd5Hex]] over md5 hex `m`. */
  def sqlH62(m: String): String =
    s"((('0x' || substr($m,1,8))::BIGINT & 2147483647) + " +
      s"(('0x' || substr($m,9,8))::BIGINT & 2147483647) * 2147483648)"

  /** SQL: 3-word shingles of a text expression (matches TextDedup.shingles). */
  def sqlShingles(text: String, n: Int): String =
    s"(CASE WHEN len(regexp_split_to_array($text, '\\s+')) < $n THEN [$text] " +
      s"ELSE list_transform(range(0, len(regexp_split_to_array($text, '\\s+')) - $n + 1), " +
      s"i -> array_to_string(regexp_split_to_array($text, '\\s+')[i+1:i+$n], ' ')) END)"

  def sqlLongList(xs: Seq[Long]): String = xs.mkString("[", ",", "]")
  def sqlLongListList(xss: Seq[Seq[Long]]): String = xss.map(sqlLongList).mkString("[", ",", "]")
}
