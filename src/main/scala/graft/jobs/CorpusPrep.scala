package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextAnalysis}
import graft.operators.Dedup

/** Training-corpus preparation composed end-to-end — the LLM-pipeline
  * counterpart of [[IngestQc]]: every operator existed individually
  * (quality scoring, language ID, exact + near dedup, clustering); this
  * is the one job a data-curation deployment runs over a raw document
  * dump.
  *
  * Stages: annotate (lang, quality, tokens) → quality/language gate →
  * exact dedup (canonical = min id per content key) → near-dup
  * clustering (MinHash LSH pairs → connected components, canonical =
  * cluster minimum) → kept corpus + per-stage attrition stats.
  *
  * Scale shape: annotation is pure map-side expression work; the exact
  * dedup is one hash shuffle on the content key; near-dup candidates
  * come from banded LSH (never all-pairs) with the hot-bucket cap;
  * clustering is the adaptive union-find/pointer-jumping operator. At
  * 100 TB nothing here collects unbounded state to the driver.
  */
object CorpusPrep {

  final case class Config(
      minQuality: Double = 0.3,
      dropUnknownLang: Boolean = true,
      exactKeyWords: Int = 8,
      shingleK: Int = 5,
      minJaccard: Double = 0.5,
      // low-entropy gate: docs whose deflate/raw ratio falls below this
      // are repetitive/templated junk. 0.0 disables (default: the
      // synthetic corpus is natural-prose-like, and the threshold is a
      // per-deployment tuning decision)
      minCompressionRatio: Double = 0.0)

  final case class Frames(
      annotated: DataFrame, // input + lang, quality, tokens
      kept: DataFrame,      // canonical surviving docs (persisted by run)
      stats: DataFrame) {   // (stage, docs) attrition ledger
    /** [[run]] returns `kept` persisted (the attrition counts already
      * paid for it); call this when done consuming — a forgotten
      * unpersist pins storage memory for the JVM lifetime.
      */
    def release(): Unit = kept.unpersist()
  }

  /** Map-side annotation: language, quality score, token count, and —
    * only when the config's low-entropy gate is on — the compression
    * ratio. The deflate pass is the most expensive per-row annotation,
    * so the default (gate off) must not pay it for a column nothing
    * reads.
    */
  def annotate(docs: DataFrame, text: String,
      cfg: Config = Config()): DataFrame = {
    val ws = Hashing.words(col(text))
    val base = docs
      .withColumn("lang", TextAnalysis.langId(ws))
      .withColumn("quality", TextAnalysis.qualityScore(ws))
      .withColumn("tokens", TextAnalysis.bpeTokenCount(col(text)))
    if (cfg.minCompressionRatio > 0.0)
      base.withColumn("compression", TextAnalysis.compressionRatio(col(text)))
    else base
  }

  /** Quality + language (+ optional low-entropy) gate. */
  def gate(annotated: DataFrame, cfg: Config): DataFrame = {
    val q = annotated.filter(col("quality") >= cfg.minQuality)
    val c = if (cfg.minCompressionRatio > 0.0) {
      // fail with intent, not UNRESOLVED_COLUMN: annotate only adds the
      // column when ITS config enables the gate — a mismatched pair of
      // configs is a caller bug worth naming
      require(annotated.columns.contains("compression"),
        "low-entropy gate enabled but input has no 'compression' column: " +
          "pass the same Config to annotate(docs, text, cfg)")
      q.filter(col("compression") >= cfg.minCompressionRatio)
    } else q
    if (cfg.dropUnknownLang) c.filter(col("lang") =!= "und") else c
  }

  /** Exact dedup: canonical row = min id per leading-words content key
    * (the q41 key), all rows kept for singleton keys.
    */
  def exactCanonical(
      df: DataFrame, id: String, text: String, cfg: Config): DataFrame = {
    val key = array_join(
      slice(Hashing.words(col(text)), 1, cfg.exactKeyWords), " ")
    val w = Window.partitionBy(key)
    df.withColumn("__keeper", min(col(id)).over(w))
      .filter(col(id) === col("__keeper"))
      .drop("__keeper")
  }

  /** Near-dup canonical selection: LSH pairs → connected components →
    * drop every member that is not its cluster's minimum id.
    */
  def nearDupCanonical(
      df: DataFrame, id: String, text: String, cfg: Config): DataFrame = {
    val pairs = Dedup.minhashLshPairs(
      df, id, text, shingleK = cfg.shingleK, minJaccard = cfg.minJaccard)
    val labels = Dedup.dupClusters(pairs)
    // no broadcast hint: the non-canonical set is bounded by the dup
    // count, which can be a large corpus fraction — AQE picks the
    // strategy from the actual size
    df.join(
      labels.filter(col("id") =!= col("cluster")).select(col("id").as(id)),
      Seq(id), "left_anti")
  }

  /** Streaming deployment of the front half of [[run]] (annotate → gate
    * → exact dedup) for a continuously-arriving corpus: annotation and
    * gating are map-side per micro-batch, the dedup is
    * [[graft.streaming.Streams.dedupStream]]'s watermark-bounded state
    * (first-seen-wins on the content fingerprint), and checkpointed
    * offsets make each surviving document land exactly once. Near-dup
    * clustering stays a periodic batch compaction over the accumulated
    * output — candidate pairs need a global LSH index, which is [[run]].
    *
    * @param tsCol event-time column the dedup watermark advances on
    *              (ingest time works; dedup state is evicted once the
    *              watermark passes it)
    */
  def stream(docs: DataFrame, text: String, tsCol: String,
      cfg: Config = Config()): DataFrame = {
    // dedup on the SAME key the batch exact stage groups by — the
    // leading exactKeyWords content key — not the full text (round-14
    // review: fingerprinting the whole text kept shared-prefix
    // duplicates the batch run drops, and the near-dup compaction pass
    // need not catch them, so the streaming corpus permanently
    // diverged from the batch corpus over identical input). words()
    // lowercases, so dedupStream's internal lower() is a no-op on it.
    val keyed = gate(annotate(docs, text, cfg), cfg)
      .withColumn("__exact_key",
        array_join(slice(Hashing.words(col(text)), 1, cfg.exactKeyWords), " "))
    graft.streaming.Streams.dedupStream(keyed, "__exact_key", tsCol)
      .drop("__exact_key")
  }

  /** The attrition counts would otherwise re-execute the whole
    * annotate → gate → dedup → LSH lineage once per stage (4× the
    * deflate/annotation work, 2× the shuffles): the intermediate frames
    * persist across the counts (MEMORY_AND_DISK — spill beats
    * recompute), upstream stages unpersist once counted, and `kept`
    * STAYS cached for the caller's consumption — call
    * [[Frames.release]] when done.
    *
    * The id column must be integral (the near-dup clustering labels in
    * long — [[graft.operators.Dedup.dupClusters]] rejects other types
    * loudly); pre-assign a dense long id for URL/UUID-keyed corpora.
    */
  def run(docs: DataFrame, id: String, text: String,
      cfg: Config = Config()): Frames = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ann = annotate(docs, text, cfg)
    val gated = gate(ann, cfg).persist()
    val exact = exactCanonical(gated, id, text, cfg).persist()
    val kept = nearDupCanonical(exact, id, text, cfg).persist()
    val stats = Seq(
      ("input", docs.count()),
      ("quality_lang_gate", gated.count()),
      ("exact_dedup", exact.count()),
      ("near_dup", kept.count())
    ).toDF("stage", "docs")
    gated.unpersist()
    exact.unpersist()
    Frames(ann, kept, stats)
  }
}
