package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** J3 as-of join edge semantics (SURVEY.md §7.4 risk 1): the
  * exactly-at-tolerance boundary and the equal-distance tie-break.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left = Seq(
    (1L, 10L, ts("2024-01-01 12:00:00")),
    (2L, 10L, ts("2024-01-01 18:00:00")), // no right row within 5 min
    (3L, 20L, ts("2024-01-01 12:00:00"))  // different key
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (101L, 10L, ts("2024-01-01 11:55:00")), // exactly at 5-min tolerance
    (102L, 10L, ts("2024-01-01 12:05:00")), // exactly at tolerance, later
    (103L, 20L, ts("2024-01-01 12:01:00")),
    (104L, 30L, ts("2024-01-01 12:00:00"))  // key with no left rows
  ).toDF("event_id", "user_id", "ts")

  test("tolerance boundary is inclusive and ties break to the earlier right row") {
    val out = AsOfJoin.nearest(left, right, on = Seq("user_id"),
      leftTs = "ts", rightTs = "ts", toleranceSec = 300L,
      leftId = Seq("event_id"), rightTieBreak = Seq("event_id"))
      .select("event_id", "asof_event_id").as[(Long, Long)].collect().toMap
    // 101 and 102 are both exactly 300 s away → earlier right row wins
    assert(out(1L) == 101L)
    assert(out(3L) == 103L)
    assert(!out.contains(2L)) // inner: unmatched left dropped
  }

  test("toleranceSec = 0 is rejected loudly (would silently never match)") {
    // round-11 review: zero tolerance divided into null buckets and the
    // equi join silently returned empty even for exactly-equal timestamps
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearest(left, right, on = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", toleranceSec = 0L,
        leftId = Seq("event_id"))
    }
    assert(e.getMessage.contains("toleranceSec"))
  }

  test("left join keeps unmatched rows with null right side") {
    val out = AsOfJoin.nearest(left, right, on = Seq("user_id"),
      leftTs = "ts", rightTs = "ts", toleranceSec = 300L,
      leftId = Seq("event_id"), rightTieBreak = Seq("event_id"),
      joinType = "left")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(2L).isEmpty)
    assert(out(1L).contains(101L))
    assert(out.size == 3)
  }

  test("one second past tolerance does not match") {
    val l = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((9L, 10L, ts("2024-01-01 12:05:01"))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.nearest(l, r, Seq("user_id"), "ts", "ts", 300L,
      Seq("event_id"), Seq("event_id"))
    assert(out.count() == 0)
  }

  test("agrees with the naive non-equi formulation on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val l = (1 to 400).map(i => (i.toLong, (i % 9).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L))).toDF("event_id", "user_id", "ts")
    val r = (1 to 300).map(i => ((i + 1000).toLong, (i % 9).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L))).toDF("event_id", "user_id", "ts")
    val fast = AsOfJoin.nearest(l, r, Seq("user_id"), "ts", "ts", 600L,
        Seq("event_id"), Seq("event_id"))
      .select("event_id", "asof_event_id").as[(Long, Long)].collect().toMap
    // naive: non-equi join + window pick
    val naive = l.as("a").join(r.as("b"),
        $"a.user_id" === $"b.user_id" &&
          abs(unix_micros($"a.ts") - unix_micros($"b.ts")) <= 600L * 1000000L)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"a.event_id").orderBy(
          abs(unix_micros($"a.ts") - unix_micros($"b.ts")).asc,
          $"b.ts".asc, $"b.event_id".asc)))
      .filter($"rn" === 1)
      .select($"a.event_id", $"b.event_id").as[(Long, Long)].collect().toMap
    assert(fast == naive)
  }

  test("backward/forward directions pick the right side of the timeline") {
    val l = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (101L, 10L, ts("2024-01-01 11:58:00")), // 2 min before
      (102L, 10L, ts("2024-01-01 12:01:00"))  // 1 min after (nearest overall)
    ).toDF("event_id", "user_id", "ts")
    def run(dir: String) = AsOfJoin.nearest(l, r, Seq("user_id"), "ts", "ts",
      300L, Seq("event_id"), Seq("event_id"), direction = dir)
      .select("asof_event_id").as[Long].collect().toSeq
    assert(run("nearest") == Seq(102L))
    assert(run("backward") == Seq(101L))
    assert(run("forward") == Seq(102L))
  }
}
