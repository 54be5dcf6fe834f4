package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** §2.9 streaming semantics driven through MemoryStream micro-batches. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("dailyAlerts emits only above-warning daily maxima after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "taxon", "conc")
    val warn = Seq(("algae", 50.0), ("cyano", 100.0)).toDF("taxon", "warning_level")

    val alerts = Streams.dailyAlerts(events, warn, "ts", "taxon", "conc")
    val q = alerts.writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "algae", 60.0),
        (Timestamp.valueOf("2024-01-01 11:00:00"), "algae", 80.0),
        (Timestamp.valueOf("2024-01-01 12:00:00"), "cyano", 90.0)) // below level
      q.processAllAvailable()
      // advance watermark past Jan 1 so the daily window closes
      in.addData((Timestamp.valueOf("2024-01-03 00:00:01"), "algae", 1.0))
      q.processAllAvailable()
      val rows = spark.table("alerts")
        .select("taxon", "daily_max").as[(String, Double)].collect().toSet
      assert(rows == Set(("algae", 80.0))) // cyano under its level; no dup rows
    } finally q.stop()
  }

  test("mailSink delivers one ALERT mail per closed alert day via the Mailer seam") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "taxon", "conc")
    val warn = Seq(("algae", 50.0)).toDF("taxon", "warning_level")
    val alerts = Streams.dailyAlerts(events, warn, "ts", "taxon", "conc")
    val mailer = new graft.sources.RecordingMailer
    val checkpoint = java.nio.file.Files.createTempDirectory("mailsink").toString
    val q = Streams.mailSink(alerts, checkpoint, mailer,
      "ifcb-pipeline@localhost", Seq("hab@example.org"), "IFCB HAB").start()
    try {
      in.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "algae", 80.0))
      q.processAllAvailable()
      assert(mailer.sent.isEmpty) // window not closed yet -> nothing to send
      in.addData((Timestamp.valueOf("2024-01-03 00:00:01"), "algae", 1.0))
      q.processAllAvailable()
      assert(mailer.sent.size == 1) // one send for the one closed day
      val (from, to, subject, html) = mailer.sent.head
      assert(from == "ifcb-pipeline@localhost" && to == Seq("hab@example.org"))
      assert(subject == "IFCB HAB ALERT - 2024-01-01") // dated = idempotence key
      assert(html.contains("algae") && html.contains("80"))
      // catch-up: two more alert days close in ONE micro-batch — the
      // batch must split into one dated mail per day, not one undated mail
      in.addData(
        (Timestamp.valueOf("2024-01-03 10:00:00"), "algae", 70.0),
        (Timestamp.valueOf("2024-01-04 10:00:00"), "algae", 90.0),
        (Timestamp.valueOf("2024-01-06 00:00:01"), "algae", 1.0))
      q.processAllAvailable()
      assert(mailer.sent.map(_._3).sorted == Seq(
        "IFCB HAB ALERT - 2024-01-01",
        "IFCB HAB ALERT - 2024-01-03",
        "IFCB HAB ALERT - 2024-01-04"), mailer.sent.map(_._3))
    } finally q.stop()
  }

  test("dedupStream drops repeated fingerprints across micro-batches, first wins") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")

    val deduped = Streams.dedupStream(docs, "text", "ts")
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "alpha beta"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "gamma delta"),
        // same batch, same content (case-folded) → dropped
        (Timestamp.valueOf("2024-01-01 10:02:00"), 3L, "Alpha Beta"))
      q.processAllAvailable()
      in.addData( // later batch, state remembers the fingerprint
        (Timestamp.valueOf("2024-01-01 11:00:00"), 4L, "alpha beta"),
        (Timestamp.valueOf("2024-01-01 11:01:00"), 5L, "epsilon"))
      q.processAllAvailable()
      val kept = spark.table("deduped").select("doc_id").as[Long].collect().toSet
      // exactly one of the same-batch content twins survives; the
      // cross-batch repeat (doc 4) must hit state and never appear
      assert(kept.intersect(Set(1L, 3L)).size == 1, s"got $kept")
      assert(kept.contains(2L) && kept.contains(5L) && !kept.contains(4L), s"got $kept")
    } finally q.stop()
  }

  test("dedupStream state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedupckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("dedupout").toString
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    // file sink: the memory sink refuses checkpoint recovery
    def start() = Streams.dedupStream(docs, "text", "ts")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      in.addData((Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "alpha beta"))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // fresh query, same checkpoint → state store reloads
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:30:00"), 2L, "alpha beta"), // dup pre-restart
        (Timestamp.valueOf("2024-01-01 10:31:00"), 3L, "gamma"))
      q2.processAllAvailable()
      val kept = spark.read.parquet(outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"got $kept")
    } finally q2.stop()
  }

  test("incremental near-dup compaction index survives a stream restart (round-15)") {
    // the CorpusPrep daily-ingest loop: dedup stream → periodic semantic
    // compaction against a DURABLE two-level IVF index. Batch 1 runs and
    // compacts (index v1, full build); the stream restarts from its
    // checkpoint, batch 2 lands, and the next compaction must UPSERT —
    // reuse the frozen codebook (no retrain), bump the version, and
    // cover every accumulated row exactly once.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ivfstreamckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ivfstreamout").toString
    val idxDir = java.nio.file.Files.createTempDirectory("ivfstreamidx").toString
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    def start() = Streams.dedupStream(docs, "text", "ts")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // the embed step stand-in: a deterministic nonzero vector per doc —
    // same-cluster ids (mod 3) are near-identical, so drops can fire
    def embedded() = spark.read.parquet(outDir)
      .withColumn("embedding",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(1),
            org.apache.spark.sql.functions.lit(8)),
          i => (org.apache.spark.sql.functions.when(
            $"doc_id" % 3 === i % 3, 5.0f).otherwise(-5.0f)
            + $"doc_id" / 10000.0).cast("float")))
    def compact() = graft.jobs.CorpusPrep.compactNearDups(
      embedded(), "doc_id", "embedding", idxDir, tau = 0.95, k = _ => 4)

    val q1 = start()
    try {
      in.addData((1L to 6L).map(i =>
        (Timestamp.valueOf(s"2024-01-01 10:0$i:00"), i, s"alpha doc $i")): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val c1 = compact()
    assert(c1.retrained && c1.version == 1 && c1.ledger.count() == 6)

    val q2 = start() // same checkpoint: dedup state reloads
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "alpha doc 1"), // dup pre-restart
        (Timestamp.valueOf("2024-01-01 11:01:00"), 8L, "fresh doc 8"),
        (Timestamp.valueOf("2024-01-01 11:02:00"), 9L, "fresh doc 9"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(outDir).count() == 8) // 7 deduped pre-restart

    val c2 = compact()
    assert(!c2.retrained, "in-distribution delta must not retrain")
    assert(c2.version == 2)
    val ids = c2.ledger.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L), s"got $ids")
    // same-cluster near-identical vectors: at least one semantic drop,
    // and the keep-lowest-id policy keeps doc 1
    val dropped = c2.ledger.filter($"dropped").select("id").as[Long].collect().toSet
    assert(dropped.nonEmpty && !dropped.contains(1L), s"dropped $dropped")
    c1.codebook.release(); c2.codebook.release()
  }

  test("sessionize closes sessions on gap and carries state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionize(in.toDS(), gapMicros = 60L * 1000000)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.SessionEvent(1L, 0L, 1.0),
        Streams.SessionEvent(1L, 30L * 1000000, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      in.addData(Streams.SessionEvent(1L, 500L * 1000000, 5.0)) // gap > 60 s
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("key", "n", "sum").as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 2L, 3.0))) // first session closed with 2 events
    } finally q.stop()
  }

  test("sessionize late cross-batch events never rewind the session tail (round-11)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionize(in.toDS(), gapMicros = 60L * 1000000)
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Streams.SessionEvent(1L, 100L * 1000000, 1.0))
      q.processAllAvailable()
      // batch 2: one in-gap late event (folds in, start extends back)
      // and one far-late straggler (emits as its own singleton session
      // instead of re-ordering history); the old code set last = 10 s
      // here and a later 35 s event would then have merged wrongly
      in.addData(
        Streams.SessionEvent(1L, 70L * 1000000, 2.0), // 30 s before tail: folds
        Streams.SessionEvent(1L, 10L * 1000000, 3.0)) // 90 s before tail: straggler
      q.processAllAvailable()
      // batch 3: event 65 s after the REAL tail (100 s) must CLOSE the
      // session, not merge against a rewound tail
      in.addData(Streams.SessionEvent(1L, 165L * 1000000, 4.0))
      q.processAllAvailable()
      val rows = spark.table("late_sessions")
        .select("startMicros", "endMicros", "n", "sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows.forall { case (s, e, _, _) => e >= s }, s"end < start in $rows")
      // batch parity (round-15): folding 70 s lowers the window to
      // 70−60 = 10 s, re-admitting the 10 s straggler — batch order
      // chains 10→70→100 into ONE session (70−10 = gap exactly). The
      // pre-round-15 expectation (a spurious 10 s singleton beside a
      // [70,100] session) pinned the stale-window bug the deferral fixed.
      assert(rows == Set(
        (10L * 1000000, 100L * 1000000, 3L, 6.0)), // closed by 165 s
        s"got $rows")
    } finally q.stop()
  }

  test("sessionize folds a late event inside the open span (round-12, batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionize(in.toDS(), gapMicros = 60L * 1000000)
    val q = out.writeStream.format("memory").queryName("inspan_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Seq(0L, 50L, 100L, 150L)
        .map(s => Streams.SessionEvent(1L, s * 1000000, 1.0)): _*)
      q.processAllAvailable()
      // late event INSIDE [0, 150]: farther than one gap from the TAIL,
      // but batch order folds it between the 0 s and 50 s events — the
      // round-11 tail-only guard emitted a spurious overlapping
      // singleton [10, 10] here
      in.addData(Streams.SessionEvent(1L, 10L * 1000000, 1.0))
      q.processAllAvailable()
      in.addData(Streams.SessionEvent(1L, 300L * 1000000, 1.0)) // closes
      q.processAllAvailable()
      val rows = spark.table("inspan_sessions")
        .select("startMicros", "endMicros", "n")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((0L, 150L * 1000000, 5L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionize: a same-batch foldable event re-admits an earlier straggler (round-15)") {
    // state {start=100, last=105}, gap=50; a batch delivers ts=40 and
    // ts=58. Eager emission classified 40 against the STALE window
    // (>= 50) and emitted a spurious singleton even though folding 58
    // lowers start to 58 and batch order chains 40→58→100→105 into ONE
    // session. Deferral + the descending retry must fold both.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val q = Streams.sessionize(in.toDS(), gapMicros = 50L)
      .writeStream.format("memory").queryName("sess_defer")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Streams.SessionEvent(1L, 100L, 1.0),
        Streams.SessionEvent(1L, 105L, 1.0))
      q.processAllAvailable()
      in.addData(Streams.SessionEvent(1L, 40L, 1.0),
        Streams.SessionEvent(1L, 58L, 1.0))
      q.processAllAvailable()
      in.addData(Streams.SessionEvent(1L, 1000L, 0.0)) // closes the session
      q.processAllAvailable()
      val got = spark.table("sess_defer").as[Streams.SessionOut].collect()
        .map(s => (s.startMicros, s.endMicros, s.n)).toSet
      assert(got == Set((40L, 105L, 4L)), s"got $got")
      // and a straggler that stays outside the settled window still
      // emits as its own singleton (the documented lateness trade)
      in.addData(Streams.SessionEvent(1L, 2000L, 0.0),
        Streams.SessionEvent(1L, 100L, 1.0)) // far below 2000-50
      q.processAllAvailable()
      val late = spark.table("sess_defer").as[Streams.SessionOut].collect()
        .map(s => (s.startMicros, s.endMicros, s.n)).toSet
      assert(late.contains((100L, 100L, 1L)), s"got $late")
    } finally q.stop()
  }

  test("sessionize: a straggler re-admits into a session CLOSED in the same batch (round-16)") {
    // round-16 advice: state {start=100, last=110}, gap=5; one batch
    // delivers 92, 96, 200. 92 defers (92 < 100−5), 96 folds lowering
    // start to 96, 200 closes the session — the close path used to
    // flush 92 as a singleton even though 92 ≥ 96−5 chains it into the
    // closing session under batch order. The close-time retry must
    // fold it: one session (92,110,n=4), then (200,...) when closed.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val q = Streams.sessionize(in.toDS(), gapMicros = 5L)
      .writeStream.format("memory").queryName("sess_close_defer")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Streams.SessionEvent(1L, 100L, 1.0),
        Streams.SessionEvent(1L, 105L, 1.0),
        Streams.SessionEvent(1L, 110L, 1.0))
      q.processAllAvailable()
      in.addData(Streams.SessionEvent(1L, 92L, 1.0),
        Streams.SessionEvent(1L, 96L, 1.0),
        Streams.SessionEvent(1L, 200L, 1.0))
      q.processAllAvailable()
      val got = spark.table("sess_close_defer").as[Streams.SessionOut]
        .collect().map(s => (s.startMicros, s.endMicros, s.n)).toSet
      assert(got == Set((92L, 110L, 5L)), s"got $got")
      // a straggler genuinely outside the closing window still emits as
      // its own singleton: state {start=200,last=200}, batch 150, 300 —
      // 150 < 200−5 defers, 300 closes, 150 stays out
      in.addData(Streams.SessionEvent(1L, 150L, 1.0),
        Streams.SessionEvent(1L, 300L, 1.0))
      q.processAllAvailable()
      val late = spark.table("sess_close_defer").as[Streams.SessionOut]
        .collect().map(s => (s.startMicros, s.endMicros, s.n)).toSet
      assert(late.contains((150L, 150L, 1L)) && late.contains((200L, 200L, 1L)),
        s"got $late")
    } finally q.stop()
  }

  test("sessionize idle timeout closes a silent key's session without any flush event") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionize(in.toDS(), gapMicros = 60L * 1000000,
      idleTimeoutMs = Some(200L))
    // NOTE: no processAllAvailable anywhere in this test — with armed
    // processing-time timeouts the engine keeps scheduling empty
    // timeout batches and that call never settles; poll with a deadline
    // instead
    val q = out.writeStream.format("memory").queryName("idle_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.SessionEvent(1L, 0L, 1.0),
        Streams.SessionEvent(1L, 30L * 1000000, 2.0))
      // the session must emit from the idle timeout ALONE — no sentinel,
      // no further events
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("idle_sessions").count() == 0 &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      val rows = spark.table("idle_sessions")
        .select("key", "n", "sum").as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("sessionize over the q82 events fixture equals the batch result across a checkpoint restart") {
    // ST5 differential: the streaming sessionizer and q82's relational
    // twin must agree on the REAL fixture, not just toy rows — same
    // sessions (boundaries, counts), same sums, with the stream split
    // into two micro-batches separated by a full checkpoint restart.
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ckpt = java.nio.file.Files.createTempDirectory("sessckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("sessout").toString

    // q82 floors to epoch seconds and closes on gap >= 1800 s; feeding
    // second-floored micros with gapMicros just under 1800 s makes the
    // two rules decide identically on every pair of fixture timestamps.
    val evs = graft.Tables.events(spark, d)
      .select($"user_id", unix_timestamp($"ts").as("es"), $"value")
      .as[(Long, Long, Double)].collect()
      .map { case (u, es, v) => Streams.SessionEvent(u, es * 1000000L, v) }
      .sortBy(e => (e.tsMicros, e.key))
    val cut = evs(evs.length / 2).tsMicros
    val (batch1, batch2) = evs.partition(_.tsMicros < cut)
    // sentinel per key, far past the last event: closes every key's
    // final session (Append mode only emits CLOSED sessions); the
    // sentinel's own one-event session stays open and never appears.
    val sentinels = evs.map(_.key).distinct
      .map(k => Streams.SessionEvent(k, evs.last.tsMicros + 10L * 1800000000L, 0.0))

    val in = MemoryStream[Streams.SessionEvent]
    def start() = Streams.sessionize(in.toDS(), gapMicros = 1800L * 1000000 - 1)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      in.addData(batch1.toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // fresh query, same checkpoint: session state reloads
    try {
      in.addData(batch2.toIndexedSeq)
      q2.processAllAvailable()
      in.addData(sentinels.toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .select($"key", ($"startMicros" / 1000000L).cast("long").as("start_s"),
        ($"endMicros" / 1000000L).cast("long").as("end_s"), $"n", $"sum")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (k, s0, e0, n, sm) => (k, s0, e0) -> ((n, sm)) }.toMap
    val batch = graft.SparkEntry.queries("q82_sessionize")(spark, d)
      .select($"user_id", $"start_s", $"end_s", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (k, s0, e0, n, sm) => (k, s0, e0) -> ((n, sm)) }.toMap

    assert(streamed.keySet == batch.keySet,
      s"session boundaries diverge: only-streamed=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    streamed.foreach { case (sess, (n, sm)) =>
      val (bn, bsm) = batch(sess)
      assert(n == bn, s"$sess: n $n != $bn")
      // streaming accumulates a running double, batch sums exact decimals:
      // equality up to double-association noise
      assert(math.abs(sm - bsm) < 1e-6, s"$sess: sum $sm != $bsm")
    }
  }

  test("sessionize equals a driver-side reference fold over random inputs and batch splits") {
    // property differential (round 10): random keys, timestamps, gap
    // parameters and micro-batch boundaries — the fixture differential
    // above pins one trace; this pins the semantics across the input
    // space (ties, single-event sessions, keys absent from batches).
    implicit val sqlCtx = spark.sqlContext
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 2654435761L)
      val gap = (1 + rnd.nextInt(1000)).toLong
      val events = {
        var t = 0L
        (0 until 60).map { i =>
          t += rnd.nextInt(3 * gap.toInt).toLong // gaps straddle the cutoff
          Streams.SessionEvent(rnd.nextInt(5).toLong, t, rnd.nextInt(100) / 10.0)
        }
      }.sortBy(_.tsMicros)
      // reference: per key, time-ordered fold with the operator's rule
      // (an event more than `gap` after the last closes the session)
      val expected = events.groupBy(_.key).flatMap { case (k, es) =>
        val closed = Seq.newBuilder[(Long, Long, Long, Long, Double)]
        var cur: Option[(Long, Long, Long, Double)] = None
        es.sortBy(_.tsMicros).foreach { e =>
          cur match {
            case Some((s0, last, n, sum)) if e.tsMicros - last <= gap =>
              cur = Some((s0, e.tsMicros, n + 1, sum + e.value))
            case Some((s0, last, n, sum)) =>
              closed += ((k, s0, last, n, sum))
              cur = Some((e.tsMicros, e.tsMicros, 1L, e.value))
            case None =>
              cur = Some((e.tsMicros, e.tsMicros, 1L, e.value))
          }
        }
        cur.foreach { case (s0, last, n, sum) => closed += ((k, s0, last, n, sum)) }
        closed.result()
      }.toSet
      // streaming: 1-4 time-ordered micro-batches + a closing sentinel
      val nBatches = 1 + rnd.nextInt(4)
      val cutIdxs = Seq.fill(nBatches - 1)(rnd.nextInt(events.length)).sorted
      val batches = (Seq(0) ++ cutIdxs ++ Seq(events.length))
        .sliding(2).map { case Seq(a, b) => events.slice(a, b) }.toSeq
      val sentinels = events.map(_.key).distinct
        .map(k => Streams.SessionEvent(k, events.last.tsMicros + 10L * gap + 10L, 0.0))
      val in = MemoryStream[Streams.SessionEvent]
      val name = s"sess_prop_$seed"
      val q = Streams.sessionize(in.toDS(), gapMicros = gap)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { in.addData(b); q.processAllAvailable() }
        }
        in.addData(sentinels)
        q.processAllAvailable()
        val got = spark.table(name)
          .as[Streams.SessionOut].collect()
          .map(s => (s.key, s.startMicros, s.endMicros, s.n, s.sum)).toSet
        // compare with a tolerance-free set on (key, bounds, n) and a
        // tolerant check on sums (double association order)
        def shape(s: Set[(Long, Long, Long, Long, Double)]) = s.map(x => (x._1, x._2, x._3, x._4))
        assert(shape(got) == shape(expected),
          s"seed $seed gap $gap: only-stream=${shape(got) -- shape(expected)} " +
            s"only-ref=${shape(expected) -- shape(got)}")
        val refSums = expected.map(x => (x._1, x._2, x._3) -> x._5).toMap
        got.foreach { case (k, s0, e0, _, sm) =>
          assert(math.abs(sm - refSums((k, s0, e0))) < 1e-9,
            s"seed $seed: sum mismatch for ($k, $s0, $e0)")
        }
      } finally q.stop()
    }
  }

  test("incremental file source processes each file exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("stream-in")
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir.toString + "/batch1")
    val src = Streams.incrementalFileSource(
      spark, dir.toString + "/*", Seq((0L, "")).toDF("id", "v").schema)
    val q = src.writeStream.format("memory").queryName("inc")
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("inc").count() == 2)
      Seq((3L, "c")).toDF("id", "v")
        .write.mode("overwrite").parquet(dir.toString + "/batch2")
      q.processAllAvailable()
      assert(spark.table("inc").count() == 3) // only the new file added rows
    } finally q.stop()
  }

  test("featureStream extracts slim features from arriving PNGs exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("feat-in")
    val ckpt = java.nio.file.Files.createTempDirectory("feat-ckpt")
    def writePng(id: Long): Unit = {
      val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(id)
      val png = graft.multimodal.Media.encodePng(raw.map(_ & 0xff), w, h)
      java.nio.file.Files.write(dir.resolve(s"roi_$id.png"), png)
    }
    writePng(100L); writePng(200L)
    val q = Streams.featureStream(spark, dir.toString)
      .writeStream.format("memory").queryName("feats")
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val t1 = spark.table("feats")
      assert(t1.count() == 2)
      assert(t1.filter($"numBlobs" > 0 && $"Biovolume" > 0).count() == 2)
      writePng(300L)
      q.processAllAvailable()
      assert(spark.table("feats").count() == 3) // incremental, exactly once
      assert(spark.table("feats").select("roi_id").as[Long].collect().toSet ==
        Set(100L, 200L, 300L))
    } finally q.stop()
  }

  test("featureStream dead-letters a digitless PNG and keeps processing (round-13)") {
    // round-12 made digitless names THROW (never roi_id 0); round-13
    // review moved the failure to the right altitude: a throw inside
    // the stream's map is a poison pill — the checkpointed source
    // replays the failing batch forever, so ONE bad file wedged the
    // whole pipeline. Bad files now surface as error rows (features
    // null) and the stream keeps going, like the batch dead-letter path.
    val dir = java.nio.file.Files.createTempDirectory("feat-bad")
    val ckpt = java.nio.file.Files.createTempDirectory("feat-bad-ckpt")
    val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(7L)
    val png = graft.multimodal.Media.encodePng(raw.map(_ & 0xff), w, h)
    java.nio.file.Files.write(dir.resolve("thumbnail.png"), png)
    java.nio.file.Files.write(dir.resolve("garbage_11.png"),
      Array[Byte](1, 2, 3, 4)) // corrupt payload: dead-letters too
    val q = Streams.featureStream(spark, dir.toString)
      .writeStream.format("memory").queryName("feats_bad")
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val bad = spark.table("feats_bad")
        .filter($"error".isNotNull)
        .select("path", "error").as[(String, String)].collect()
      assert(bad.length == 2, bad.mkString(","))
      assert(bad.exists { case (p, e) =>
        p.endsWith("thumbnail.png") && e.contains("cannot extract a roi id") })
      assert(bad.exists { case (p, e) =>
        p.endsWith("garbage_11.png") && e.contains("corrupt image payload") })
      // the stream is NOT wedged: a good file arriving later processes
      val (raw2, h2, w2) = graft.queries.FeatureExtract.renderRoi(42L)
      java.nio.file.Files.write(dir.resolve("roi_42.png"),
        graft.multimodal.Media.encodePng(raw2.map(_ & 0xff), w2, h2))
      q.processAllAvailable()
      val good = spark.table("feats_bad").filter($"error".isNull)
      assert(good.count() == 1)
      assert(good.select("roi_id").as[Long].head() == 42L)
    } finally q.stop()
  }

  test("featureStreamQuarantined routes poison to the dead-letter CSV and survives restart") {
    // round-13 VERDICT residual #3: error rows were produced but no
    // built-in sink split them — an inattentive caller counted bad
    // files as null-feature rows. The default deployment must (a) land
    // the poison file in the quarantine sink WITH its error string,
    // (b) deliver clean rows unaffected, (c) keep both guarantees
    // across a stream restart from the same checkpoint.
    val dir = java.nio.file.Files.createTempDirectory("featq-in")
    val featDir = java.nio.file.Files.createTempDirectory("featq-out").resolve("features")
    val quarDir = java.nio.file.Files.createTempDirectory("featq-dead").resolve("quarantine")
    val ckpt = java.nio.file.Files.createTempDirectory("featq-ckpt")
    def writePng(id: Long): Unit = {
      val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(id)
      val png = graft.multimodal.Media.encodePng(raw.map(_ & 0xff), w, h)
      java.nio.file.Files.write(dir.resolve(s"roi_$id.png"), png)
    }
    writePng(11L)
    java.nio.file.Files.write(dir.resolve("poison_7.png"),
      Array[Byte](9, 9, 9, 9)) // no container magic: dead-letters
    val q1 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q1.processAllAvailable() finally q1.stop()
    val quarantined = spark.read.option("header", "true").csv(quarDir.toString)
    val badRows = quarantined.select("path", "error").as[(String, String)].collect()
    assert(badRows.length == 1, badRows.mkString(","))
    assert(badRows(0)._1.endsWith("poison_7.png") &&
      badRows(0)._2.contains("corrupt image payload"), badRows(0))
    val feats1 = spark.read.option("header", "true").csv(featDir.toString)
    assert(feats1.count() == 1)
    assert(feats1.select("roi_id").as[String].head() == "11")
    assert(!feats1.columns.contains("error")) // error column dropped
    // restart from the same checkpoint: old files are NOT replayed, a
    // new arrival processes, the quarantine log is unchanged
    writePng(12L)
    val q2 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q2.processAllAvailable() finally q2.stop()
    val feats2 = spark.read.option("header", "true").csv(featDir.toString)
    assert(feats2.count() == 2)
    assert(feats2.select("roi_id").as[String].collect().toSet == Set("11", "12"))
    assert(spark.read.option("header", "true").csv(quarDir.toString).count() == 1)
  }

  test("migrateQuarantineLayout moves legacy flat files to batch_id=-1 and the union reads back (round-16)") {
    val quarDir = java.nio.file.Files.createTempDirectory("featm-dead")
      .resolve("quarantine")
    // a legacy (pre-round-15 flat Append) dir: headered part files at
    // the ROOT, plus the _SUCCESS marker such writes leave behind
    java.nio.file.Files.createDirectories(quarDir)
    java.nio.file.Files.writeString(quarDir.resolve("part-00000.csv"),
      "path,error\n/in/old_1.png,legacy decode failure\n")
    java.nio.file.Files.writeString(quarDir.resolve("part-00001.csv"),
      "path,error\n/in/old_2.png,legacy truncated header\n")
    java.nio.file.Files.writeString(quarDir.resolve("_SUCCESS"), "")
    // ...that a new-layout deployment has ALSO written one batch into
    java.nio.file.Files.createDirectories(quarDir.resolve("batch_id=3"))
    java.nio.file.Files.writeString(
      quarDir.resolve("batch_id=3").resolve("part-00000.csv"),
      "path,error\n/in/new_9.png,new-layout poison\n")
    // pre-migration, partition discovery silently DROPS the root-level
    // legacy files (it anchors on the leaf dirs) — a reader sees only
    // the new-layout rows, which is silent audit-trail loss, worse
    // than a refusal
    val pre = spark.read.option("header", "true").csv(quarDir.toString)
      .select($"path").as[String].collect().toSet
    assert(pre == Set("/in/new_9.png"), pre.toString)
    assert(Streams.migrateQuarantineLayout(spark, quarDir.toString) == 2)
    val rows = spark.read.option("header", "true").csv(quarDir.toString)
      .select($"path", $"batch_id".cast("long")).as[(String, Long)]
      .collect().toSet
    assert(rows == Set(("/in/old_1.png", -1L), ("/in/old_2.png", -1L),
      ("/in/new_9.png", 3L)), rows.toString)
    // idempotent: a second run finds nothing at the root
    assert(Streams.migrateQuarantineLayout(spark, quarDir.toString) == 0)
    // loud on a layout it cannot interpret (non-partition subdir)
    val junk = java.nio.file.Files.createTempDirectory("featm-junk")
      .resolve("quarantine")
    java.nio.file.Files.createDirectories(junk.resolve("year=2024"))
    java.nio.file.Files.writeString(junk.resolve("part-00000.csv"), "x\n")
    val e = intercept[IllegalArgumentException] {
      Streams.migrateQuarantineLayout(spark, junk.toString)
    }
    assert(e.getMessage.contains("refusing to migrate"), e.getMessage)
    // a missing dir is a no-op, not an error
    assert(Streams.migrateQuarantineLayout(
      spark, junk.resolveSibling("absent").toString) == 0)
  }

  test("quarantine append is exactly-once: a batch replayed after a pre-commit crash does not duplicate (round-15)") {
    // simulate the kill-between-append-and-commit window: run one
    // batch to completion, then delete its checkpoint COMMIT marker —
    // on restart the source replays the batch (offsets exist, commit
    // missing), re-running the quarantine write. The old flat Append
    // held two copies of the poison row; the batch_id-keyed Overwrite
    // must leave exactly one.
    val dir = java.nio.file.Files.createTempDirectory("featx-in")
    val featDir = java.nio.file.Files.createTempDirectory("featx-out").resolve("features")
    val quarDir = java.nio.file.Files.createTempDirectory("featx-dead").resolve("quarantine")
    val ckpt = java.nio.file.Files.createTempDirectory("featx-ckpt")
    val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(21L)
    java.nio.file.Files.write(dir.resolve("roi_21.png"),
      graft.multimodal.Media.encodePng(raw.map(_ & 0xff), w, h))
    java.nio.file.Files.write(dir.resolve("poison_5.png"),
      Array[Byte](4, 4, 4, 4))
    val q1 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.option("header", "true").csv(quarDir.toString).count() == 1)

    // q1.stop() can deregister asynchronously; starting the restart
    // query against the same checkpoint before that lands trips the
    // concurrent-use guard
    val deadline = System.currentTimeMillis() + 30000
    while (spark.streams.active.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(spark.streams.active.isEmpty, "previous query did not deregister")

    // crash simulation: the batch committed its sink effects but not
    // its checkpoint — remove the latest commit marker
    val commits = new java.io.File(ckpt.toFile, "commits")
      .listFiles().filterNot(_.getName.startsWith("."))
    assert(commits.nonEmpty, "no commit markers written")
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete(), s"could not delete $last")
    // the local checksum FS shadows every file with .N.crc — a stale
    // one fails the replay's atomic rename
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) assert(crc.delete())

    val q2 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q2.processAllAvailable() finally q2.stop()
    val quarantined = spark.read.option("header", "true").csv(quarDir.toString)
    assert(quarantined.count() == 1,
      s"replayed batch duplicated the quarantine rows: ${quarantined.collect().mkString(",")}")
    assert(quarantined.select("path").as[String].head().endsWith("poison_5.png"))
    // the clean row stays exactly-once too (path anti-join)
    val feats = spark.read.option("header", "true").csv(featDir.toString)
    assert(feats.count() == 1)
    assert(feats.select("roi_id").as[String].head() == "21")
  }

  test("featureStreamQuarantined survives an all-poison first run (dataless featuresDir)") {
    // round-14 review: a first run that quarantines EVERYTHING used to
    // run an empty append (featuresDir = {_SUCCESS}), and the restart's
    // lenient existing-read then crashed with UNABLE_TO_INFER_SCHEMA —
    // the empty write is now gated and the restart read is
    // pinned-schema over non-hidden data files only
    val dir = java.nio.file.Files.createTempDirectory("featp-in")
    val featDir = java.nio.file.Files.createTempDirectory("featp-out").resolve("features")
    val quarDir = java.nio.file.Files.createTempDirectory("featp-dead").resolve("quarantine")
    val ckpt = java.nio.file.Files.createTempDirectory("featp-ckpt")
    java.nio.file.Files.write(dir.resolve("poison_3.png"), Array[Byte](1, 2, 3))
    val q1 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.option("header", "true").csv(quarDir.toString).count() == 1)
    // restart with a good file: the stream must START (no schema-infer
    // crash on the dataless dir) and deliver the clean row
    val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(9L)
    java.nio.file.Files.write(dir.resolve("roi_9.png"),
      graft.multimodal.Media.encodePng(raw.map(_ & 0xff), w, h))
    val q2 = Streams.featureStreamQuarantined(spark, dir.toString,
      featDir.toString, quarDir.toString, ckpt.toString)
    try q2.processAllAvailable() finally q2.stop()
    val feats = spark.read.option("header", "true").csv(featDir.toString)
    assert(feats.count() == 1)
    assert(feats.select("roi_id").as[String].head() == "9")
  }

  /** Most recent batch's state-operator row count — the memory bound of
    * the 100 TB streaming story: if watermark eviction works, this
    * tracks the dedup/window horizon, not everything ever seen.
    */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(fail("no state operator progress reported"))

  test("dedupStream state is bounded by the watermark horizon, not total documents") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.dedupStream(docs, "text", "ts") // 1-day horizon
      .writeStream.format("memory").queryName("dedup_scale")
      .outputMode(OutputMode.Append).start()
    try {
      // day 1: 2000 distinct documents → 2000 fingerprints in state
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      in.addData((0 until 2000).map(i =>
        (new Timestamp(base + i * 1000L), i.toLong, s"document number $i")))
      q.processAllAvailable()
      val loaded = stateRows(q)
      assert(loaded >= 2000, s"expected all fingerprints in state, got $loaded")
      // day 4 arrives: watermark (max event − 1 day) passes every day-1
      // fingerprint's expiry (event + 1 day), so the store must evict
      // them — two batches so the post-eviction metric is reported
      in.addData((Timestamp.valueOf("2024-01-04 00:00:00"), 10000L, "fresh one"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-04 00:00:10"), 10001L, "fresh two"))
      q.processAllAvailable()
      val after = stateRows(q)
      assert(after <= 10,
        s"state grew with the corpus instead of the horizon: $after rows " +
          s"(was $loaded) — watermark eviction broken")
      // and the evicted fingerprints really are forgotten: a day-1 dup
      // arriving after the horizon is admitted (the documented semantics;
      // the batch dedup pass owns cross-horizon dups)
      in.addData((Timestamp.valueOf("2024-01-04 00:00:20"), 10002L, "document number 7"))
      q.processAllAvailable()
      assert(spark.table("dedup_scale").filter($"doc_id" === 10002L).count() == 1)
    } finally q.stop()
  }

  test("dedupStream behaves identically on the RocksDB state store (results + eviction)") {
    // the provider swap is the production memory story
    // (GraftSession.RocksDbProvider scaladoc): state spills to local
    // disk instead of executor heap. Same micro-batch script as the
    // horizon test; results and eviction must not change.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val in = MemoryStream[(Timestamp, Long, String)]
      val docs = in.toDF().toDF("ts", "doc_id", "text")
      val q = Streams.dedupStream(docs, "text", "ts")
        .writeStream.format("memory").queryName("dedup_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        in.addData((0 until 500).map(i =>
          (new Timestamp(base + i * 1000L), i.toLong, s"document number ${i % 400}")))
        q.processAllAvailable()
        // 400 distinct fingerprints survive; the 100 same-batch repeats drop
        assert(spark.table("dedup_rocks").count() == 400)
        assert(stateRows(q) >= 400)
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbGetCount"),
          "query did not actually run on the RocksDB provider")
        in.addData((Timestamp.valueOf("2024-01-04 00:00:00"), 9000L, "fresh a"))
        q.processAllAvailable()
        in.addData((Timestamp.valueOf("2024-01-04 00:00:10"), 9001L, "fresh b"))
        q.processAllAvailable()
        assert(stateRows(q) <= 10,
          s"RocksDB store did not evict on watermark: ${stateRows(q)}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("dailyAlerts window state evicts closed days, not accumulating per-key windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "taxon", "conc")
    val warn = (0 until 1000).map(i => (s"taxon_$i", 50.0)).toDF("taxon", "warning_level")
    val q = Streams.dailyAlerts(events, warn, "ts", "taxon", "conc")
      .writeStream.format("memory").queryName("alerts_scale")
      .outputMode(OutputMode.Append).start()
    try {
      // day 1: 1000 live (taxon, day) windows
      val base = Timestamp.valueOf("2024-01-01 06:00:00").getTime
      in.addData((0 until 1000).map(i =>
        (new Timestamp(base + i * 1000L), s"taxon_$i", 60.0 + i)))
      q.processAllAvailable()
      assert(stateRows(q) >= 1000)
      // day 4 closes and evicts every day-1 window; all 1000 taxa were
      // above their level so the closed windows all emit
      in.addData((Timestamp.valueOf("2024-01-04 06:00:00"), "taxon_0", 1.0))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-04 06:00:10"), "taxon_1", 1.0))
      q.processAllAvailable()
      val after = stateRows(q)
      assert(after <= 10,
        s"window state not evicted after close: $after rows")
      assert(spark.table("alerts_scale").count() == 1000)
    } finally q.stop()
  }
}
