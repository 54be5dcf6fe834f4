package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import graft.plans.{MinHashesExpr, SimHash32Expr, StringPolyHash, StringPolyHashArray, WordShinglesExpr}

/** Deterministic text/sketch hashing used by the dedup operators —
  * engine-portable by construction: every hash is integer arithmetic over
  * code points, so the DuckDB oracle can evaluate the *same* function and
  * results compare exactly. Each Column builder has an `…Sql` twin
  * generated from the same constants (single source of truth).
  *
  * The Column builders delegate to the native codegen expressions in
  * [[graft.plans]] (one tight loop per row, including shingle assembly);
  * the SQL twins spell out the identical math for DuckDB.
  */
object Hashing {

  /** Polynomial rolling-hash modulus for token→int. */
  val TokP = 1000003L
  /** MinHash universe modulus. */
  val MinP = 100003L
  /** (a, b) pairs for the MinHash family h_i(x) = (a_i·x + b_i) mod MinP. */
  val MinHashSeeds: Seq[(Long, Long)] = Seq(
    (2L, 17L), (3L, 29L), (5L, 41L), (7L, 53L),
    (11L, 67L), (13L, 79L), (17L, 97L), (19L, 113L))
  /** Knuth multiplicative mixer for SimHash bit material. */
  val Mix = 2654435761L
  val SimBits = 32

  /** Whitespace word split, lowercased, empties dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  def wordsSql(text: String): String =
    s"list_filter(regexp_split_to_array(lower($text), '\\s+'), x -> x <> '')"

  /** k-word shingles (n-gram documents → dedup features), distinct in
    * first-occurrence order — native one-pass expression.
    */
  def shingles(ws: Column, k: Int): Column =
    GraftBridge.column(WordShinglesExpr(GraftBridge.expression(ws), k))

  def shinglesSql(ws: String, k: Int): String =
    s"list_distinct([array_to_string($ws[i:i+${k - 1}], ' ') FOR i IN range(1, len($ws) - ${k - 2})])"

  /** Rolling hash of one token: fold (acc·31 + codepoint) mod TokP, acc₀=7. */
  def tokHash(tok: Column): Column =
    GraftBridge.column(StringPolyHash(GraftBridge.expression(tok), 31L, TokP, 7L))

  def tokHashSql(tok: String): String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(string_split($tok, ''), " +
      s"c -> ord(c)::BIGINT)), (a, c) -> (a * 31 + c) % $TokP)"

  /** Hashes of an array of tokens. */
  def tokHashes(toks: Column): Column =
    GraftBridge.column(StringPolyHashArray(GraftBridge.expression(toks), 31L, TokP, 7L))

  def tokHashesSql(toks: String): String =
    s"list_transform($toks, t -> ${tokHashSql("t")})"

  /** All MinHashes of a token-hash array, one pass (array of
    * MinHashSeeds.length longs).
    */
  def minhashAll(th: Column): Column =
    GraftBridge.column(MinHashesExpr(GraftBridge.expression(th),
      MinHashSeeds.map(_._1), MinHashSeeds.map(_._2), MinP))

  /** i-th MinHash of a token-hash array. */
  def minhash(th: Column, i: Int): Column = element_at(minhashAll(th), i + 1)

  def minhashSql(th: String, i: Int): String = {
    val (a, b) = MinHashSeeds(i)
    s"list_min(list_transform($th, h -> (h * $a + $b) % $MinP))"
  }

  /** SimHash-32 of a token-hash array: bit j is the sign of Σ ±1 over
    * tokens, +1 when bit j of the mixed token hash is set.
    */
  def simhash(th: Column): Column =
    GraftBridge.column(SimHash32Expr(GraftBridge.expression(th), Mix))

  def simhashSql(th: String): String =
    (0 until SimBits).map { j =>
      s"(CASE WHEN CAST(list_sum(list_transform($th, h -> " +
        s"CASE WHEN ((h * $Mix) % 4294967296 >> $j) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0 " +
        s"THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Rolling fingerprint of a whole string (document fingerprinting —
    * normalized-content identity at 64-bit-collision safety).
    */
  def fingerprint(text: Column): Column =
    GraftBridge.column(StringPolyHash(GraftBridge.expression(text), 131L, 1000000007L, 7L))

  def fingerprintSql(text: String): String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(string_split($text, ''), " +
      s"c -> ord(c)::BIGINT)), (a, c) -> (a * 131 + c) % 1000000007)"
}
