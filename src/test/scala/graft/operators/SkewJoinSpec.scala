package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    // 90% of fact rows on one key
    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong + 1000))).toDF("k", "v")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8, saltExpr = $"v")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val plain = large.join(small, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    // hot key spread over multiple salts
    val spread = large.filter($"k" === 1L)
      .select(pmod(xxhash64($"v"), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 4)
  }

  private val metrics = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        metrics.add(t.taskMetrics.shuffleReadMetrics.recordsRead)
  }

  /** Max per-task shuffle-read record count across every stage of `run`. */
  private def maxReducerRows(run: => Unit): Long = {
    metrics.clear()
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      // drain: the listener bus is async; poll until the queue is
      // quiet rather than reaching into private[spark] waitUntilEmpty
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && metrics.size != last) {
        last = metrics.size
        Thread.sleep(200)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    metrics.asScala.foldLeft(0L)(math.max)
  }

  /** Set confs for the duration of `body`, restoring previous values. */
  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val was = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally was.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The q76/q77 imbalance claim, checked rather than implied (round-6
    * verdict): a listener records per-task shuffle-read row counts for
    * the plain and the salted join of the same 90%-hot fact. Row counts
    * are the deterministic cause of reducer task-time spread — asserting
    * them pins the mechanism without the flake of wall-clock thresholds
    * on a 1000-row fixture.
    */
  test("salts = 0 is rejected loudly (would silently return empty)") {
    // round-11 review: pmod(x, 0) nulls the large side while
    // sequence(0, -1) still emits salts on the small side
    val large = Seq((1L, 2L)).toDF("k", "v")
    val small = Seq((1L, "d")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(large, small, "k", salts = 0, $"v")
    }
    assert(e.getMessage.contains("salts"))
  }

  test("listener evidence: salting caps the max reducer's shuffle-read rows") {
    // AQE's parallelism-first coalesce folds this fixture's ~20 KB
    // shuffle partitions (all below the 1 MB minPartitionSize floor)
    // into ONE reducer, erasing the partition structure under test; at
    // bench/production sizes partitions sit above the floor and keep
    // their layout. Disable coalescing for this measurement only.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val coalesceWas = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")

    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong + 1000))).toDF("k", "v")
    // merge hint: a 10-row dim would broadcast and neither variant would
    // shuffle — the scenario under test is the non-broadcastable dim
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
      .hint("merge")

    val (plainMax, saltedMax) =
      try {
        val p = maxReducerRows {
          large.join(small, "k").write.mode("overwrite").format("noop").save()
        }
        val s = maxReducerRows {
          SkewJoin.saltedJoin(large, small, "k", salts = 8, saltExpr = $"v")
            .write.mode("overwrite").format("noop").save()
        }
        (p, s)
      } finally coalesceWas match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None => spark.conf.unset(coalesceKey)
      }
    // plain: the whole 900-row hot key funnels through one reducer.
    // salted: 8 (key, salt) splits over the reducers cap the max task.
    assert(plainMax >= 900L, s"hot key should funnel one task, saw $plainMax")
    assert(saltedMax <= 500L, s"salting should cap the max task, saw $saltedMax")
    assert(saltedMax * 2 < plainMax,
      s"expected ≥2× reducer-imbalance reduction: salted $saltedMax vs plain $plainMax")
  }

  /** The SkewJoin scaladoc decision table, pinned by listener (round-7
    * verdict task 5): with thresholds scaled to the fixture, AQE's
    * `OptimizeSkewedJoin` splits the hot partition of a BARE sort-merge
    * join (salting is redundant there) — but when the same join feeds a
    * same-key aggregation, the split would violate the agg's required
    * hash distribution, the rule skips the join, and the hot key funnels
    * through one reducer again. That suppressed case is exactly where
    * `saltedJoin` stays necessary.
    */
  test("AQE skew split handles the bare join but skips it under a same-key agg") {
    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong + 1000))).toDF("k", "v")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
      .hint("merge") // force SMJ: a broadcast join has no reducer skew to split
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production defaults (5× median AND >256 MB) scaled to a ~20 KB
      // fixture so the rule sees the same shape it would at 100 TB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB") {
      val bareMax = maxReducerRows {
        large.join(small, "k").write.mode("overwrite").format("noop").save()
      }
      assert(bareMax < 900L,
        s"AQE should split the 900-row hot partition of a bare join, saw $bareMax")
      val aggMax = maxReducerRows {
        large.join(small, "k").groupBy("k").count()
          .write.mode("overwrite").format("noop").save()
      }
      assert(aggMax >= 900L,
        s"downstream same-key agg should suppress the skew split, saw $aggMax")
      // and salting still caps the join stage under the same downstream agg
      val saltedAggMax = maxReducerRows {
        SkewJoin.saltedJoin(large, small.hint("merge"), "k", salts = 8, saltExpr = $"v")
          .groupBy("k").count()
          .write.mode("overwrite").format("noop").save()
      }
      assert(saltedAggMax <= 500L,
        s"salted join under an agg should keep reducers capped, saw $saltedAggMax")
    }
  }
}
