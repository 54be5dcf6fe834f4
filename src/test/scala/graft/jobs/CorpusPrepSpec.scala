package graft.jobs

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** End-to-end corpus-prep job: attrition ledger shape, canonical
  * selection through both dedup stages, and second-run stability.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("run composes gate + exact dedup + near-dup; ledger monotone; canonical = min id") {
    val all = Tables.documents(spark, d).select($"doc_id", $"text")
    // two gate-surviving ids to duplicate (so the injected copies can
    // only be removed by a DEDUP stage, never the quality/lang gate)
    val survivors = CorpusPrep
      .gate(CorpusPrep.annotate(all, "text"), CorpusPrep.Config())
      .orderBy($"doc_id").limit(2).select($"doc_id").as[Long].collect()
    val Array(exactSrc, nearSrc) = survivors

    val exactDup = all.filter($"doc_id" === exactSrc)
      .select(lit(100000L).as("doc_id"), $"text")
    val nearDup = all.filter($"doc_id" === nearSrc)
      .select(lit(100001L).as("doc_id"),
        concat($"text", lit(" trailing tail word")).as("text"))
    val input = all.unionByName(exactDup).unionByName(nearDup)

    val out = CorpusPrep.run(input, "doc_id", "text")
    val stats = out.stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("input") == all.count() + 2)
    // each stage only removes rows
    val order = Seq("input", "quality_lang_gate", "exact_dedup", "near_dup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stats(a) >= stats(b), s"$a=${stats(a)} < $b=${stats(b)}")
    }
    assert(out.annotated.columns.toSet
      .intersect(Set("lang", "quality", "tokens")).size == 3)

    val kept = out.kept.select($"doc_id").as[Long].collect().toSet
    // identical text, higher id → removed by exact dedup; canonical stays
    assert(!kept.contains(100000L) && kept.contains(exactSrc))
    // one appended shingle → caught by LSH near-dup, cluster min wins
    assert(!kept.contains(100001L) && kept.contains(nearSrc))

    // a prepped corpus is a fixed point: re-running drops nothing
    val again = CorpusPrep.run(out.kept, "doc_id", "text")
    val s2 = again.stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2("input") == s2("near_dup"), s"second run dropped rows: $s2")
  }

  test("low-entropy gate drops repetitive docs only when enabled") {
    // passes quality (stopword-rich) and language (en lexicon), but
    // deflates to almost nothing
    val rep = Seq((999999L, ("the a fast slow value " * 48).trim))
      .toDF("doc_id", "text")
    val lowEntropy = CorpusPrep.Config(minCompressionRatio = 0.1)
    val ann = CorpusPrep.annotate(rep, "text", lowEntropy)
    // default config: no compression column (the deflate pass is paid only when gated)
    assert(!CorpusPrep.annotate(rep, "text").columns.contains("compression"))
    assert(ann.columns.contains("compression"))
    assert(CorpusPrep.gate(ann, lowEntropy).isEmpty)
    assert(CorpusPrep.gate(ann, CorpusPrep.Config()).count() == 1)
    // mismatched configs (annotate gate-off, gate gate-on) fail with
    // intent, not an UNRESOLVED_COLUMN analysis error
    val e = intercept[IllegalArgumentException] {
      CorpusPrep.gate(CorpusPrep.annotate(rep, "text"), lowEntropy)
    }
    assert(e.getMessage.contains("compression"))
  }

  test("stream gates junk and dedups content across micro-batches") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // gate-surviving texts straight from the corpus fixture
    val good = Tables.documents(spark, d).select($"doc_id", $"text")
    val goodTexts = CorpusPrep
      .gate(CorpusPrep.annotate(good, "text"), CorpusPrep.Config())
      .orderBy($"doc_id").limit(2).select($"text").as[String].collect()

    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = CorpusPrep.stream(docs, "text", "ts")
      .writeStream.format("memory").queryName("corpus_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, goodTexts(0)),
        (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "z")) // gated: quality
      q.processAllAvailable()
      in.addData(
        (Timestamp.valueOf("2024-01-01 11:00:00"), 3L, goodTexts(0)), // dup of 1
        (Timestamp.valueOf("2024-01-01 11:01:00"), 4L, goodTexts(1)))
      q.processAllAvailable()
      val kept = spark.table("corpus_stream").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 4L), s"got $kept")
    } finally q.stop()
  }
}
