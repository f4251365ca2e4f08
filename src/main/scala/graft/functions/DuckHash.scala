package graft.functions

import scala.collection.mutable.ArrayBuffer

/** DuckDB-SQL emitter for Spark's XXH64 hash family (`xxhash64`), used to
  * build exact oracles for hash-parameterized operators (MinHash-LSH,
  * SimHash, hyperplane-LSH ANN, deterministic splits/sketches).
  *
  * Arithmetic model: every value is a HUGEINT (int128) in [0, 2^64).
  * Multiplications by 64-bit XXH64 primes are split into 32-bit halves so
  * intermediates stay < 2^97 (inside HUGEINT), then reduced mod 2^64.
  * Rotations are arithmetic (`* 2^r` + `// 2^(64-r)`; the halves are
  * disjoint bit ranges, so `+` is `|`). XOR is DuckDB's HUGEINT-native
  * `xor`. Signed comparisons (Spark longs) go through [[toSigned]].
  *
  * Structure model: DuckDB inlines lateral column aliases and single-use
  * CTEs, so a chained hash expression would be RE-EVALUATED exponentially
  * (each fmix level references its input twice → 2^5 per fmix). [[SqlChain]]
  * therefore emits every dependency level as its own MATERIALIZED CTE: each
  * value is computed exactly once, and multi-referenced stages (e.g. an LSH
  * band table probed by both join sides) stay single-evaluation.
  *
  * Validated bit-for-bit against Spark's `xxhash64` (string seed-42 hashing,
  * int chaining, long chaining; lengths 0..100 covering the 32-byte stripe
  * loop and the 8/4/1-byte tails) via the driver's DuckDB gate and
  * `tools/oracle_check.py`.
  */
object DuckHash {
  val Mod = "18446744073709551616" // 2^64
  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)

  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)
  private def pow2(r: Int): String = java.math.BigInteger.TWO.pow(r).toString

  /** (x * p) mod 2^64 for a constant p, HUGEINT-overflow-safe. */
  private def mulc(x: String, p: Long): String = {
    val lo = p & 0xffffffffL
    val hi = p >>> 32
    s"((($x) * $lo + ((($x) * $hi) % 4294967296) * 4294967296) % $Mod)"
  }

  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${pow2(r)}) % $Mod) + (($x) // ${pow2(64 - r)}))"

  private def xor(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** Chain of MATERIALIZED CTEs. Each level's expressions may reference only
    * columns of the previous level; `carry` is the running column set.
    */
  final class SqlChain(pfx: String, inputName: String, initCarry: Seq[String]) {
    val ctes  = ArrayBuffer.empty[(String, String)]
    var carry = initCarry.toVector
    private var n    = 0
    private var prev = inputName

    def level(cols: Seq[(String, String)], drop: Seq[String] = Nil): this.type = {
      n += 1
      carry = carry.filterNot(drop.contains)
      val sel = (carry ++ cols.map { case (nm, e) => s"$e AS $nm" }).mkString(", ")
      ctes += (s"${pfx}_$n" -> s"(SELECT $sel FROM $prev)")
      prev = s"${pfx}_$n"
      carry = carry ++ cols.map(_._1)
      this
    }

    def last: String = prev
  }

  private def fmixLevels(ch: SqlChain, h: String, out: String): SqlChain = {
    ch.level(Seq(s"${out}_fa" -> xor(h, s"($h) // ${pow2(33)}")), drop = Seq(h))
    ch.level(Seq(s"${out}_fb" -> mulc(s"${out}_fa", P2)), drop = Seq(s"${out}_fa"))
    ch.level(Seq(s"${out}_fc" -> xor(s"${out}_fb", s"${out}_fb // ${pow2(29)}")), drop = Seq(s"${out}_fb"))
    ch.level(Seq(s"${out}_fd" -> mulc(s"${out}_fc", P3)), drop = Seq(s"${out}_fc"))
    ch.level(Seq(out -> xor(s"${out}_fd", s"${out}_fd // ${pow2(32)}")), drop = Seq(s"${out}_fd"))
  }

  private def lane8(off: String): String =
    (0 until 8).map(j => s"b[($off) + ${j + 1}] * ${pow2(8 * j)}").mkString("(", " + ", ")")

  private def lane4(off: String): String =
    (0 until 4).map(j => s"b[($off) + ${j + 1}] * ${pow2(8 * j)}").mkString("(", " + ", ")")

  /** Byte-list expr for an ASCII string expr (DuckDB `ord` per char — equals
    * UTF-8 byte iteration for the all-ASCII synthetic corpora; the `c <> ''`
    * filter drops the phantom element DuckDB's `string_split('', '')` yields).
    */
  def bytesOf(s: String): String =
    s"list_transform(list_filter(string_split($s, ''), c -> c <> ''), c -> ord(c)::HUGEINT)"

  /** Chain computing Spark's `XXH64.hashUnsafeBytes(b, seed)` of byte-list
    * column `b` into column `out`. `inputName` must expose `keys` + `b`.
    */
  def hashBytesChain(pfx: String, inputName: String, keys: Seq[String], seed: String, out: String): SqlChain = {
    val ch = new SqlChain(pfx, inputName, keys :+ "b")
    ch.level(Seq("n" -> "len(b)", "nstripes" -> "len(b) // 32"))
    val upd = mulc(rotl(s"(a + ${mulc("x", P2)}) % $Mod", 31), P1)
    val inits = Seq(
      s"(($seed) + ${u(P1)} + ${u(P2)}) % $Mod",
      s"(($seed) + ${u(P2)}) % $Mod",
      s"($seed) % $Mod",
      s"((($seed) - ${u(P1)}) + $Mod) % $Mod"
    )
    val vcols = inits.zipWithIndex.map { case (init, i) =>
      val lanes = s"list_transform(range(0, nstripes), k -> ${lane8(s"32*k + ${8 * i}")}::HUGEINT)"
      s"v${i + 1}" ->
        s"CASE WHEN n >= 32 THEN list_reduce(list_prepend($init::HUGEINT, $lanes), (a, x) -> $upd) ELSE 0::HUGEINT END"
    }
    ch.level(vcols)
    val merged = s"(${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $Mod"
    ch.level(Seq("h0" -> s"CASE WHEN n >= 32 THEN $merged ELSE (($seed) + ${u(P5)}) % $Mod END"))
    var h = "h0"
    (1 to 4).foreach { i =>
      val k  = mulc(rotl(mulc(s"v$i", P2), 31), P1)
      val mr = s"((${mulc(xor(h, k), P1)}) + ${u(P4)}) % $Mod"
      ch.level(Seq(s"m$i" -> s"CASE WHEN n >= 32 THEN $mr ELSE $h END"), drop = Seq(h, s"v$i"))
      h = s"m$i"
    }
    ch.level(Seq("hl" -> s"($h + n) % $Mod"), drop = Seq(h))
    val t8upd   = s"((${mulc(rotl(xor("a", mulc(rotl(mulc("x", P2), 31), P1)), 27), P1)}) + ${u(P4)}) % $Mod"
    val t8lanes = s"list_transform(range(0, (n % 32) // 8), k -> ${lane8("nstripes * 32 + 8 * k")}::HUGEINT)"
    ch.level(
      Seq(
        "t8" -> s"list_reduce(list_prepend(hl, $t8lanes), (a, x) -> $t8upd)",
        "o4" -> "nstripes * 32 + ((n % 32) // 8) * 8"),
      drop = Seq("hl"))
    val t4 = s"((${mulc(rotl(xor("t8", mulc(lane4("o4"), P1)), 23), P2)}) + ${u(P3)}) % $Mod"
    ch.level(
      Seq(
        "t4" -> s"CASE WHEN n - o4 >= 4 THEN $t4 ELSE t8 END",
        "ob" -> "o4 + CASE WHEN n - o4 >= 4 THEN 4 ELSE 0 END"),
      drop = Seq("t8"))
    val bupd = mulc(rotl(xor("a", s"(x * ${u(P5)}) % $Mod"), 11), P1)
    ch.level(
      Seq("tb" -> s"list_reduce(list_prepend(t4, list_transform(range(ob, n), j -> b[j + 1])), (a, x) -> $bupd)"),
      drop = Seq("t4", "o4", "ob", "b", "nstripes", "n"))
    fmixLevels(ch, "tb", out)
    ch
  }

  /** Append Spark's `XXH64.hashLong(l, seed)` levels; `l`/`seed` are column
    * names (or constant literals) visible on the chain's current level.
    */
  def hashLongLevels(ch: SqlChain, l: String, seed: String, out: String): SqlChain = {
    ch.level(Seq(s"${out}_k" -> mulc(rotl(mulc(l, P2), 31), P1)))
    ch.level(
      Seq(s"${out}_h" ->
        s"((${mulc(rotl(xor(s"(($seed) + ${u(P5)} + 8) % $Mod", s"${out}_k"), 27), P1)}) + ${u(P4)}) % $Mod"),
      drop = Seq(s"${out}_k") ++ (if (ch.carry.contains(seed)) Seq(seed) else Nil))
    fmixLevels(ch, s"${out}_h", out)
  }

  /** Append Spark's `XXH64.hashInt(i, seed)` levels (i in [0, 2^32)). */
  def hashIntLevels(ch: SqlChain, i: String, seed: String, out: String): SqlChain = {
    ch.level(Seq(s"${out}_p" -> xor(s"(($seed) + ${u(P5)} + 4) % $Mod", s"((($i)::HUGEINT) * ${u(P1)}) % $Mod")))
    ch.level(Seq(s"${out}_q" -> s"((${mulc(rotl(s"${out}_p", 23), P2)}) + ${u(P3)}) % $Mod"), drop = Seq(s"${out}_p"))
    fmixLevels(ch, s"${out}_q", out)
  }

  /** Signed-BIGINT view of a mod-2^64 value (Spark longs compare signed). */
  def toSigned(x: String): String =
    s"CASE WHEN $x >= 9223372036854775808::HUGEINT THEN ($x) - $Mod::HUGEINT ELSE ($x)::HUGEINT END"

  def toUnsigned(x: String): String =
    s"CASE WHEN $x < 0 THEN ($x)::HUGEINT + $Mod::HUGEINT ELSE ($x)::HUGEINT END"

  /** Assemble CTEs (MATERIALIZED unless listed) + final select into one SQL. */
  def assemble(ctes: Seq[(String, String)], finalSelect: String, notMaterialized: Set[String] = Set.empty): String =
    ctes
      .map { case (n, s) => if (notMaterialized(n)) s"$n AS $s" else s"$n AS MATERIALIZED $s" }
      .mkString("WITH ", ",\n", s"\n$finalSelect")
}
