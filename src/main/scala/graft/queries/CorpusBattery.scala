package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.{Corpus, Hashing}

/** Corpus-curation battery over `documents`: the training-data pipeline
  * stages that come AFTER dedup/quality (TrainingData.scala) and before
  * the tokenizer — deterministic splitting, benchmark decontamination,
  * PII redaction, sequence packing. Oracles evaluate the identical
  * functions via the [[Corpus]] SQL mirrors.
  */
object CorpusBattery {

  import Tables._

  private val W = Hashing.wordsSql("text")

  /** Deterministic hash split (train/val/test): id-stable, engine-stable,
    * partitioning-stable — the split is a pure function of the id, so
    * re-running over a grown corpus never migrates old documents.
    * Map-side expression + one count shuffle.
    */
  private val q59 = GraftQuery(
    "q59_train_split",
    (s, d) => {
      import s.implicits._
      documents(s, d)
        .withColumn("split", Corpus.hashSplit($"doc_id", "graft-r4"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n"),
          sum(size(Hashing.words($"text")).cast("long")).as("sum_tokens"))
        .orderBy($"lang", $"split")
    },
    Some(s"""
      SELECT lang, ${Corpus.hashSplitSql("doc_id", "graft-r4")} AS split,
             COUNT(*) AS n, CAST(SUM(len($W)) AS BIGINT) AS sum_tokens
      FROM documents
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** Benchmark decontamination: documents containing a held-out eval
    * phrase (first-5-words of every 97th document, a stand-in for a
    * benchmark suite) are flagged via a broadcast containment join over
    * the small phrase dim (BroadcastNestedLoopJoin; the corpus side
    * never shuffles — but the per-pair `contains` scan is quadratic in
    * the PHRASE count, so this shape only holds while the benchmark
    * suite stays small; [[q63]] is the fingerprint equi-join that holds
    * on both axes). Matching is case/whitespace-insensitive: the phrase
    * is built from lowercased words, so the text is normalized the same
    * way before the containment test. Self-hits excluded: a match means
    * ANOTHER document carries the phrase.
    */
  private val q60 = GraftQuery(
    "q60_decontaminate",
    (s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      val bench = docs.filter($"doc_id" % 97 === 0)
        .select($"doc_id".as("bench_id"),
          array_join(slice(Hashing.words($"text"), 1, 5), " ").as("phrase"))
      docs
        .withColumn("norm_text", regexp_replace(lower($"text"), "\\s+", " "))
        .join(broadcast(bench),
          $"norm_text".contains($"phrase") && $"doc_id" =!= $"bench_id")
        .select($"doc_id", $"bench_id")
        .orderBy($"doc_id", $"bench_id")
    },
    Some(s"""
      WITH bench AS (
        SELECT doc_id AS bench_id, array_to_string($W[1:5], ' ') AS phrase
        FROM documents WHERE doc_id % 97 = 0)
      SELECT d.doc_id AS doc_id, b.bench_id AS bench_id
      FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm_text
            FROM documents) d JOIN bench b
        ON contains(d.norm_text, b.phrase) AND d.doc_id <> b.bench_id
      ORDER BY 1, 2"""))

  /** PII redaction: synthetic contact lines are appended deterministically
    * (the corpus is PII-free by construction), then emails / phone shapes /
    * long digit runs are scrubbed and accounted. Pure map-side regex
    * chain — codegen'd scan, no shuffle before the final rollup.
    */
  private val q61 = GraftQuery(
    "q61_pii_redact",
    (s, d) => {
      import s.implicits._
      val pii = concat($"text",
        lit(" contact user"), $"doc_id", lit("@example.com ref "),
        $"doc_id" * 7919L, lit(" tel 555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
      documents(s, d)
        .withColumn("pii_text", pii)
        .withColumn("clean", Corpus.redactPii($"pii_text"))
        .withColumn("n_emails",
          size(regexp_extract_all($"pii_text", lit(Corpus.EmailPattern), lit(0))).cast("long"))
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_emails").as("emails_redacted"),
          sum((length($"pii_text") - length($"clean")).cast("long")).as("chars_removed"))
        .orderBy($"source")
    },
    Some(s"""
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(pii_text, '${Corpus.EmailPattern}'))) AS BIGINT)
          AS emails_redacted,
        CAST(SUM(len(pii_text) - len(${Corpus.redactPiiSql("pii_text")})) AS BIGINT)
          AS chars_removed
      FROM (
        SELECT source,
          text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref ' ||
            CAST(doc_id * 7919 AS VARCHAR) || ' tel 555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
        FROM documents) t
      GROUP BY 1
      ORDER BY 1"""))

  /** Sequence packing: per language, documents ordered by id concatenate
    * into 512-token context windows; a document joins the pack its first
    * token lands in. One window cumsum per partition key — a single
    * shuffle on `lang`, no sequential driver loop.
    */
  private val q62 = GraftQuery(
    "q62_seq_pack",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .withColumn("tokens", size(Hashing.words($"text")).cast("long"))
        .withColumn("start", coalesce(sum($"tokens").over(w), lit(0L)))
        .withColumn("pack", Corpus.packId($"start", 512))
        .groupBy($"lang", $"pack")
        .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("sum_tokens"))
        .orderBy($"lang", $"pack")
    },
    Some(s"""
      SELECT lang, CAST(FLOOR(start / 512) AS BIGINT) AS pack,
             COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens
      FROM (
        SELECT lang, tokens,
          COALESCE(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM (SELECT lang, doc_id, CAST(len($W) AS BIGINT) AS tokens
              FROM documents) t) s
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** Fingerprint decontamination — the shape that scales on BOTH axes
    * (corpus size AND benchmark size): shingle each document once into
    * 3-word shingles, fingerprint them, and hash-equi-join against the
    * fingerprinted phrase dim; `contains` runs only on the (rare)
    * candidate pairs to reject fingerprint collisions. One map-side
    * explode + one broadcast HASH join (q60's BroadcastNestedLoopJoin
    * degrades quadratically once the held-out suite carries 10⁵-10⁶
    * n-grams; this stays a hash probe per shingle). Matches are 3-word
    * aligned by construction — the standard n-gram decontamination
    * semantics (3-word grams rather than q60's 5: short enough that the
    * synthetic corpus actually carries cross-document hits, so the
    * candidate join and the collision-verify both run non-degenerately).
    */
  private val q63 = GraftQuery(
    "q63_decontaminate_fingerprint",
    (s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      val bench = docs.filter($"doc_id" % 97 === 0)
        .select($"doc_id".as("bench_id"),
          array_join(slice(Hashing.words($"text"), 1, 3), " ").as("phrase"))
        .withColumn("fp", Hashing.fingerprint($"phrase"))
      docs
        .withColumn("norm_text", regexp_replace(lower($"text"), "\\s+", " "))
        .select($"doc_id", $"norm_text",
          explode(Hashing.shingles(Hashing.words($"text"), 3)).as("shingle"))
        .withColumn("fp", Hashing.fingerprint($"shingle"))
        .join(broadcast(bench), Seq("fp"))
        .filter($"doc_id" =!= $"bench_id" && $"norm_text".contains($"phrase"))
        .select($"doc_id", $"bench_id")
        .distinct()
        .orderBy($"doc_id", $"bench_id")
    },
    Some(s"""
      WITH bench AS (
        SELECT doc_id AS bench_id, phrase, ${Hashing.fingerprintSql("phrase")} AS fp
        FROM (SELECT doc_id, array_to_string($W[1:3], ' ') AS phrase
              FROM documents WHERE doc_id % 97 = 0) p),
      sh AS (
        SELECT doc_id, norm_text, unnest(${Hashing.shinglesSql(W, 3)}) AS shingle
        FROM (SELECT doc_id, text,
                regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm_text
              FROM documents) t)
      SELECT DISTINCT s.doc_id AS doc_id, b.bench_id AS bench_id
      FROM (SELECT doc_id, norm_text, shingle,
              ${Hashing.fingerprintSql("shingle")} AS fp FROM sh) s
      JOIN bench b ON s.fp = b.fp
      WHERE s.doc_id <> b.bench_id AND contains(s.norm_text, b.phrase)
      ORDER BY 1, 2"""))

  val all: Seq[GraftQuery] = Seq(q59, q60, q61, q62, q63)
}
