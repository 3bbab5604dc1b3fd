package graft.queries

/** Builders for DuckDB SQL that reproduces the engine's 64-bit hash
  * arithmetic bit-for-bit, so hash-keyed operators (deterministic
  * sampling, winnowing fingerprints, simhash) get REAL value-level
  * oracles instead of rows-only checks.
  *
  * Technique: model the unsigned 64-bit lane as HUGEINT in
  * [0, 2^64). Wraparound multiply by a ~2^63 constant would overflow
  * signed 128-bit, so constants are split into 32-bit halves
  * (`mulmod`); rotations/shifts become mult/div by powers of two;
  * xor is DuckDB's native HUGEINT `xor`.
  */
object SqlHash {

  private val M = "18446744073709551616::HUGEINT" // 2^64

  /** (a * b) mod 2^64 for an unsigned-64 constant b and an expression
    * a in [0, 2^64). Splits b so no intermediate exceeds 2^96. */
  def mulmod(a: String, b: Long): String = {
    val bh = b >>> 32
    val bl = b & 0xffffffffL
    s"((($a) * $bl::HUGEINT) % $M + " +
      s"(((($a) % 4294967296::HUGEINT) * $bh::HUGEINT) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $M"
  }

  /** Unsigned rotate-left by r of an expression in [0, 2^64). */
  def rotl(a: String, r: Int): String =
    s"((($a) * ${1L << r}::HUGEINT) % $M + ($a) // ${1L << (64 - r)}::HUGEINT) % $M"

  /** Unsigned shift-right. */
  def shr(a: String, s: Int): String = s"($a) // ${1L << s}::HUGEINT"

  def xor(a: String, b: String): String = s"xor($a, $b)"

  /** Map an unsigned [0,2^64) HUGEINT expression to its signed
    * two's-complement BIGINT value (what the engine's LongType holds). */
  def toSigned(a: String): String =
    s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT " +
      s"THEN ($a) - $M ELSE ($a) END)::BIGINT"

  // XXH64 primes (public constants of the algorithm)
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** CTE chain computing Spark's `xxhash64` of ONE BIGINT column under
    * `seed` — XXH64 of the 8-byte little-endian long. Returns the WITH
    * steps (to splice after an input CTE named `from` holding columns
    * `keep` + `col`) and leaves the result in column `out` of the last
    * step, as unsigned HUGEINT in [0, 2^64).
    *
    * Mirrors XxHash64Function.hashLong: acc = seed + P5 + 8;
    * acc ^= rotl31(l*P2)*P1; acc = rotl27(acc)*P1 + P4; fmix.
    */
  def xxh64LongSteps(stem: String, from: String, col: String,
                     keep: Seq[String], seed: Long, out: String): String = {
    val ks = keep.map(k => s"$k, ").mkString
    val acc0 = java.lang.Long.toUnsignedString(seed + P5 + 8L)
    s"""${stem}_a AS (SELECT $ks${mulmod(s"($col)::HUGEINT", P2)} AS k1a FROM $from),
       |${stem}_b AS (SELECT $ks${mulmod(rotl("k1a", 31), P1)} AS k1 FROM ${stem}_a),
       |${stem}_c AS (SELECT $ks(${mulmod(rotl(xor(s"$acc0::HUGEINT", "k1"), 27), P1)} + ${java.lang.Long.toUnsignedString(P4)}::HUGEINT) % $M AS h2 FROM ${stem}_b),
       |${stem}_d AS (SELECT $ks${mulmod(xor("h2", shr("h2", 33)), P2)} AS h4 FROM ${stem}_c),
       |${stem}_e AS (SELECT $ks${mulmod(xor("h4", shr("h4", 29)), P3)} AS h6 FROM ${stem}_d),
       |$stem AS (SELECT $ks${xor("h6", shr("h6", 32))} AS $out FROM ${stem}_e)""".stripMargin
  }

  /** FNV-1a over a list of byte/codepoint codes (codes < 2^24 — covers
    * UTF-8 bytes AND every Unicode codepoint, max 0x10FFFF < 2^21),
    * starting from the FNV offset basis — one expression (the
    * multiplier is only 2^40, so a plain wraparound multiply fits
    * HUGEINT). The xor rewrites only the low 24 bits of the HUGEINT
    * lane (xor of two sub-2^24 BIGINTs), which is exact because the
    * code contributes no higher bits.
    * `codesList` must be a DuckDB list expression of integer codes. */
  def fnv1aSql(codesList: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT, $codesList),
       |  (h, c) -> ((h - h % 16777216::HUGEINT +
       |              xor((h % 16777216::HUGEINT)::BIGINT, c::BIGINT)::HUGEINT)
       |             * 1099511628211::HUGEINT) % $M)""".stripMargin

  /** splitmix64 of an unsigned [0,2^64) HUGEINT expression — mirrors
    * [[graft.functions.SignProjection.mix64]] bit-for-bit. The input
    * expression is substituted textually (twice per xor step), so
    * keep `e` SMALL — a few tokens, not a nested CTE. */
  def splitmix64(e: String): String = {
    val z0 = s"((($e) + 11400714819323198485::HUGEINT) % $M)"
    val z1 = s"(${mulmod(xor(z0, shr(z0, 30)), 0xBF58476D1CE4E5B9L)})"
    val z2 = s"(${mulmod(xor(z1, shr(z1, 27)), 0x94D049BB133111EBL)})"
    xor(z2, shr(z2, 31))
  }

  /** DuckDB list of the UTF-8 BYTE values of a VARCHAR expression —
    * the engine's fnv64 hashes UTF-8 bytes, so mirrors that hash
    * strings must feed bytes, not codepoints (they agree only on
    * ASCII). Standard UTF-8 arithmetic per codepoint, flattened. */
  def utf8Codes(str: String): String =
    s"""flatten(list_transform(
       |  list_transform(range(1, length($str)+1), j -> unicode(($str)[j])),
       |  c -> CASE
       |    WHEN c < 128 THEN [c]
       |    WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]
       |    WHEN c < 65536 THEN
       |      [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64]
       |    ELSE [240 + c // 262144, 128 + (c // 4096) % 64,
       |          128 + (c // 64) % 64, 128 + c % 64]
       |  END))""".stripMargin
}
