package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** J4 interval join: inclusive bounds, bucket-boundary straddling,
  * multi-interval overlap — semantics of R's `between`
  * (code/ifcb_ingest_and_qc.R:217-221).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inclusive bounds, overlaps, and bucket straddling") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start (inclusive)
      (2L, ts("2024-01-01 11:30:00")), // inside, interval straddles hour buckets
      (3L, ts("2024-01-01 12:00:00")), // == end (inclusive); also in iv B
      (4L, ts("2024-01-01 12:00:01")), // one second past end of A, in B
      (5L, ts("2024-01-02 00:00:00"))  // matches nothing
    ).toDF("pid", "pt")
    val ivs = Seq(
      ("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      ("B", ts("2024-01-01 11:45:00"), ts("2024-01-01 13:00:00"))
    ).toDF("iv", "start", "stop")

    val got = IntervalJoin.contains(points, ivs, "pt", "start", "stop")
      .select("pid", "iv").as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "A"), (2L, "A"), (3L, "A"), (3L, "B"), (4L, "B")))
  }

  test("agrees with the naive non-equi join on random data") {
    val points = (1 to 500).map(i =>
      (i.toLong, new Timestamp(1700000000000L + i * 7919L * 1000))).toDF("pid", "pt")
    val ivs = (1 to 50).map { i =>
      val s = 1700000000000L + i * 80000L * 1000
      ("iv" + i, new Timestamp(s), new Timestamp(s + 3600L * 1000))
    }.toDF("iv", "start", "stop")
    val fast = IntervalJoin.contains(points, ivs, "pt", "start", "stop")
      .select("pid", "iv").as[(Long, String)].collect().toSet
    val naive = points.join(ivs,
        points("pt") >= ivs("start") && points("pt") <= ivs("stop"))
      .select("pid", "iv").as[(Long, String)].collect().toSet
    assert(fast == naive)
  }

  test("replication clamp routes year-long and malformed intervals around the explode") {
    val points = Seq(
      (1L, ts("2024-06-15 10:00:00")),
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2025-02-01 00:00:00"))
    ).toDF("pid", "pt")
    val ivs = Seq(
      // year-long: 8761 hourly buckets — must NOT explode (clamp = 1000)
      ("year", ts("2024-01-01 00:00:00"), ts("2024-12-31 23:59:59")),
      ("normal", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      // malformed: end < start — never matches, never explodes
      ("broken", ts("2024-12-31 00:00:00"), ts("2024-01-01 00:00:00"))
    ).toDF("iv", "start", "stop")
    val got = IntervalJoin.contains(points, ivs, "pt", "start", "stop")
      .select("pid", "iv").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "year"), (2L, "year"), (2L, "normal")))
    // sanity: the same call with the clamp disabled agrees (the year
    // interval replicates 8761x here — fine at fixture scale)
    val unclamped = IntervalJoin.contains(points, ivs.filter($"iv" =!= "broken"),
        "pt", "start", "stop", maxReplication = None)
      .select("pid", "iv").as[(Long, String)].collect().toSet
    assert(unclamped == got)
  }

  test("left join preserves unmatched points once each") {
    val points = Seq(
      (1L, ts("2024-01-01 10:30:00")), // matches A
      (2L, ts("2024-03-01 00:00:00"))  // matches nothing
    ).toDF("pid", "pt")
    val ivs = Seq(("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iv", "start", "stop")
    val got = IntervalJoin.contains(points, ivs, "pt", "start", "stop",
        joinType = "left", maxReplication = None)
      .select("pid", "iv").as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("A")), (2L, None)))
  }

  test("full outer preserves malformed and unmatched intervals exactly once") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val ivs = Seq(
      ("hit", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      // spans many buckets AND unmatched: bucketing would emit it once
      // per exploded bucket; the plain-path full join emits it once
      ("wideMiss", ts("2024-02-01 00:00:00"), ts("2024-02-20 00:00:00")),
      // inverted bounds: must surface as an unmatched row, not vanish
      ("broken", ts("2024-12-31 00:00:00"), ts("2024-01-01 00:00:00")),
      // null bound: ditto (explode(sequence(null,...)) would drop it)
      ("nullEnd", ts("2024-05-01 00:00:00"), null.asInstanceOf[Timestamp])
    ).toDF("iv", "start", "stop")
    val got = IntervalJoin.contains(points, ivs, "pt", "start", "stop",
        joinType = "full", maxReplication = None)
      .select("pid", "iv").as[(Option[Long], Option[String])].collect().toList
    assert(got.count(_ == (Some(1L), Some("hit"))) == 1)
    assert(got.count(_ == (None, Some("wideMiss"))) == 1)
    assert(got.count(_ == (None, Some("broken"))) == 1)
    assert(got.count(_ == (None, Some("nullEnd"))) == 1)
    assert(got.size == 4)
  }

  test("clamp with non-inner join is rejected loudly") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val ivs = Seq(("A", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iv", "start", "stop")
    assertThrows[IllegalArgumentException] {
      IntervalJoin.contains(points, ivs, "pt", "start", "stop",
        joinType = "left", maxReplication = Some(10L))
    }
  }

  test("right/full joins ignore the default clamp (they bypass bucketing)") {
    // round-11 review: the clamp require fired before the plain-path
    // early return, so a right join with DEFAULT arguments threw even
    // though that path never uses maxReplication
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val ivs = Seq(("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iv", "start", "stop")
    val got = IntervalJoin.contains(points, ivs, "pt", "start", "stop",
        joinType = "right") // default maxReplication stays Some(1000)
      .select("pid", "iv").as[(Option[Long], String)].collect().toSet
    assert(got == Set((Some(1L), "A")))
  }

  test("bucketSec = 0 is rejected loudly instead of silently matching nothing") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val ivs = Seq(("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iv", "start", "stop")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.contains(points, ivs, "pt", "start", "stop", bucketSec = 0L)
    }
    assert(e.getMessage.contains("bucketSec"))
  }
}
