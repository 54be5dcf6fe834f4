package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-preparation scalars for the training-data pipeline: the
  * deterministic train/val/test splitter, PII redaction patterns, and
  * the sequence-packing bucket — each with a DuckDB SQL mirror so the
  * oracle evaluates the identical function (the [[Hashing]] pattern).
  *
  * Engine-parity notes baked into the design:
  *  - the splitter compares fixed-width lowercase *hex strings* (both
  *    engines render md5 the same way), never converts hex→int — DuckDB
  *    has no `conv`;
  *  - every regex is RE2-safe (no backreferences/lookaround), so Java's
  *    regex and DuckDB's RE2 agree;
  *  - DuckDB `regexp_replace` replaces the FIRST match unless passed the
  *    `'g'` flag — the mirror always passes it.
  */
object Corpus {

  /** Salted md5 of an id — the shared deterministic-randomness primitive
    * (splits, sampling, shuffling): lowercase hex in both engines, a
    * pure function of (id, salt), so every decision built on it is
    * stable across runs, partitionings, and engines.
    */
  def saltedMd5(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit(":" + salt)))

  def saltedMd5Sql(idExpr: String, salt: String): String =
    s"md5(CAST($idExpr AS VARCHAR) || ':$salt')"

  /** Uniform 16-bit bucket: the first 4 hex chars of [[saltedMd5]]. */
  def bucket16(id: Column, salt: String): Column =
    substring(saltedMd5(id, salt), 1, 4)

  def bucket16Sql(idExpr: String, salt: String): String =
    s"substr(${saltedMd5Sql(idExpr, salt)}, 1, 4)"

  /** Deterministic global-shuffle order key: the full [[saltedMd5]] hex
    * string. Sorting by it (ties → id) is a reproducible random
    * permutation of the corpus — the "shuffle the training data" step —
    * that is a pure function of (id, salt): stable across runs,
    * partitionings, and engines, and re-salting re-shuffles everything
    * at once. Production path at 100 TB: `repartition(n, shardOf(key))
    * .sortWithinPartitions(key)` — one shuffle, per-shard sorts, no
    * global sort.
    */
  def shuffleKey(id: Column, salt: String): Column = saltedMd5(id, salt)

  def shuffleKeySql(idExpr: String, salt: String): String =
    saltedMd5Sql(idExpr, salt)

  /** Shard id from a [[shuffleKey]]: the first `hexChars` hex chars, so
    * 16^hexChars uniform shards (1 → 16 for tests, 3-4 → 4k-64k for a
    * real corpus). A string on purpose: both engines order and group hex
    * strings identically, with no hex→int conversion to disagree on.
    */
  def shardOf(key: Column, hexChars: Int): Column =
    substring(key, 1, hexChars)

  def shardOfSql(keyExpr: String, hexChars: Int): String =
    s"substr($keyExpr, 1, $hexChars)"

  /** Bucket-below-bound membership for a PER-ROW bound column, with the
    * 65536 boundary handled: the bound formats as the 5-char "10000",
    * which compares LESS than any 4-char hex lexicographically — the
    * trap [[hashSplit]]'s literal-bound variant special-cases the same
    * way.
    */
  def bucketBelow(bucket: Column, bound: Column): Column = {
    // clamp negatives to 0 ("admit nothing") on BOTH sides: %04x of a
    // negative long renders 16 'f'-led hex chars that compare GREATER
    // than every 4-char bucket, silently admitting 100% of the domain —
    // identically on both engines, hence undetectable by the oracle
    // (round-12 review; an underflowed mixture rate is the realistic way
    // a per-row bound goes negative)
    val b = greatest(bound, lit(0L))
    b >= 65536L || bucket < format_string("%04x", b)
  }

  def bucketBelowSql(bucket: String, bound: String): String =
    s"(GREATEST($bound, 0) >= 65536 OR " +
      s"$bucket < printf('%04x', GREATEST($bound, 0)))"

  /** Deterministic, id-stable train/val/test assignment: the [[bucket16]]
    * of `(id, salt)` against fixed hex-string fraction bounds. Stable
    * across runs, partitionings, and engines — re-running the pipeline
    * over 100 TB never migrates a document between splits, and changing
    * the salt reshuffles every assignment at once.
    */
  def hashSplit(id: Column, salt: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): Column = {
    val (trainB, valB) = splitBounds(trainFrac, valFrac)
    val h = bucket16(id, salt)
    // literal-bound twin of [[bucketBelow]]'s 65536 special case
    def below(bound: Long): Column =
      if (bound >= 65536L) lit(true) else h < f"$bound%04x"
    when(below(trainB), "train").when(below(valB), "val").otherwise("test")
  }

  /** SQL mirror of [[hashSplit]] (DuckDB). */
  def hashSplitSql(idExpr: String, salt: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): String = {
    val (trainB, valB) = splitBounds(trainFrac, valFrac)
    // single-sourced from bucket16Sql (round-12 review): a second
    // hand-rolled copy of the salted-hash construction would silently
    // drift if the salting scheme ever changes
    val h = bucket16Sql(idExpr, salt)
    def below(bound: Long): String =
      if (bound >= 65536L) "TRUE" else f"$h < '$bound%04x'"
    s"CASE WHEN ${below(trainB)} THEN 'train' WHEN ${below(valB)} THEN 'val' ELSE 'test' END"
  }

  private def splitBounds(trainFrac: Double, valFrac: Double): (Long, Long) = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"invalid split fractions ($trainFrac, $valFrac)")
    (math.round(65536 * trainFrac), math.round(65536 * (trainFrac + valFrac)))
  }

  /** All k-word n-grams WITH multiplicity, in position order — repetition
    * metrics count how often a gram recurs, so [[Hashing.shingles]]'s
    * distinct-set semantics (dedup features) would erase the signal.
    * Native one-pass expression ([[graft.plans.WordNgramsExpr]]): the HOF
    * composition (sequence → transform → slice → concat_ws) evaluates
    * interpreted per gram and was q65's whole cost at sf0.1.
    */
  def ngrams(ws: Column, k: Int): Column = {
    require(k >= 1, s"ngram size must be positive, got $k")
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WordNgramsExpr(
        org.apache.spark.sql.GraftBridge.expression(ws), k))
  }

  /** SQL mirror of [[ngrams]] (DuckDB). `range(a, b)` is end-exclusive
    * and empty when b <= a, so the short-doc case needs no branch.
    */
  def ngramsSql(ws: String, k: Int): String =
    s"[array_to_string($ws[i:i+${k - 1}], ' ') FOR i IN range(1, len($ws) - ${k - 2})]"

  /** Per-document repetition stats `[top2, tot2, dup3, tot3]` in one
    * map-side pass ([[graft.plans.RepetitionStatsExpr]]); docs under 2
    * words yield all zeros.
    */
  def repetitionStats(ws: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.RepetitionStatsExpr(
        org.apache.spark.sql.GraftBridge.expression(ws)))

  /** Redaction patterns, applied in order (an email's digits must not be
    * half-eaten by the number rule first).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"
  val NumberPattern = "\\d{5,}"

  /** Emails → `<EMAIL>`, phone-shaped digits → `<PHONE>`, long digit
    * runs → `<NUM>`. Pure map-side expression work — at 100 TB this is
    * a whole-stage-codegen'd scan, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      NumberPattern, "<NUM>")

  /** SQL mirror of [[redactPii]] (DuckDB needs the 'g' flag for
    * replace-all).
    */
  def redactPiiSql(textExpr: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($textExpr,
       | '$EmailPattern', '<EMAIL>', 'g'),
       | '$PhonePattern', '<PHONE>', 'g'),
       | '$NumberPattern', '<NUM>', 'g')""".stripMargin.replace("\n", "")

  /** Sequence-packing bucket: documents ordered within a partition key
    * concatenate into `budget`-token context windows; a document belongs
    * to the pack its FIRST token lands in (start-offset packing — the
    * contiguous, shuffle-once strategy; greedy first-fit would be
    * order-sequential and unparallelizable). `startOffset` is the
    * exclusive running sum of `tokens` over the caller's window.
    */
  def packId(startOffset: Column, budget: Int): Column = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    floor(startOffset / budget).cast("long")
  }
}
