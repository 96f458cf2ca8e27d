package graft.queries

/** Pure-SQL (DuckDB) restatement of Spark's XXH64 arithmetic — the
  * shared machinery behind every value-exact oracle for an
  * xxhash64-derived query column (SimHashSql's per-token hashes, the
  * epoch-shuffle / weighted-upsample keys).
  *
  * All values are HUGEINT carrying the UNSIGNED 64-bit word; every
  * primitive reduces mod 2^64. Multiplication splits operands into
  * 32-bit halves so intermediates stay inside HUGEINT (128-bit) range.
  */
private[queries] object XxhashSql {
  val M = "18446744073709551616"   // 2^64
  val P1 = "11400714785074694791"  // 0x9E3779B185EBCA87
  val P2 = "14029467366897019727"  // 0xC2B2AE3D27D4EB4F
  val P3 = "1609587929392839161"   // 0x165667B19E3779F9
  val P4 = "9650029242287828579"   // 0x85EBCA77C2B2AE63
  val P5 = "2870177450012600261"   // 0x27D4EB2F165667C5

  def mul(a: String, b: String): String =
    s"(((($a) % 4294967296) * (($b) % 4294967296) + " +
      s"(((($a) // 4294967296) * (($b) % 4294967296) + " +
      s"(($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) " +
      s"* 4294967296) % $M)"
  def add(a: String, b: String): String = s"((($a) + ($b)) % $M)"
  def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"
  def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % $M) + (($x) // ${java.lang.Long.toUnsignedString(1L << (64 - r))}))"
  def shr(x: String, n: Int): String = s"(($x) // ${1L << n})"

  /** One derived column per primitive op: each step sees the previous
    * step's VALUE as a column reference, so textual operand duplication
    * inside mul/rotl stays O(1). */
  final class Prog(val from: String) {
    private val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    private var n = 0
    def add(expr: String): String = {
      n += 1; val c = s"x$n"; steps += ((c, expr)); c
    }
    def render(select: String): String =
      s"SELECT $select FROM " +
        steps.foldLeft(s"($from)")((acc, s) =>
          s"(SELECT *, ${s._2} AS ${s._1} FROM $acc)")
  }

  /** XXH64.hashLong(value, seed) — the exact pipeline Spark's
    * `xxhash64` runs per LongType child (one 8-byte word round + the
    * final avalanche), appended to `p` step by step. `input` and
    * `seed` are column refs / expressions holding UNSIGNED words;
    * returns the column holding the unsigned result. Chaining
    * multi-column xxhash64(a, b) is hashLong(b, hashLong(a, 42)). */
  def hashLong(p: Prog, input: String, seed: String): String = {
    val h0 = p.add(add(add(seed, P5), "8"))
    val a1 = p.add(mul(input, P2))
    val a2 = p.add(rotl(a1, 31))
    val a3 = p.add(mul(a2, P1))
    val a4 = p.add(xor(h0, a3))
    val a5 = p.add(rotl(a4, 27))
    val a6 = p.add(mul(a5, P1))
    val a7 = p.add(add(a6, P4))
    val f1 = p.add(xor(a7, shr(a7, 33)))
    val f2 = p.add(mul(f1, P2))
    val f3 = p.add(xor(f2, shr(f2, 29)))
    val f4 = p.add(mul(f3, P3))
    p.add(xor(f4, shr(f4, 32)))
  }

  /** Signed-BIGINT view of an unsigned HUGEINT word. */
  def signed(c: String): String =
    s"CAST(CASE WHEN $c >= 9223372036854775808 THEN $c - $M ELSE $c END AS BIGINT)"

  /** Unsigned-HUGEINT view of a signed BIGINT column. */
  def unsigned(c: String): String =
    s"(CAST($c AS HUGEINT) + CASE WHEN $c < 0 THEN CAST($M AS HUGEINT) ELSE 0 END)"
}
