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

  /** The q76/q77 imbalance claim, checked rather than implied (round-6
    * verdict): a listener records per-task shuffle-read row counts for
    * the plain and the salted join of the same 90%-hot fact. Row counts
    * are the deterministic cause of reducer task-time spread — asserting
    * them pins the mechanism without the flake of wall-clock thresholds
    * on a 1000-row fixture.
    */
  test("listener evidence: salting caps the max reducer's shuffle-read rows") {
    // AQE's parallelism-first coalesce folds this fixture's ~20 KB
    // shuffle partitions (all below the 1 MB minPartitionSize floor)
    // into ONE reducer, erasing the partition structure under test; at
    // bench/production sizes partitions sit above the floor and keep
    // their layout. Disable coalescing for this measurement only.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val coalesceWas = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")

    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          metrics.add(t.taskMetrics.shuffleReadMetrics.recordsRead)
    }

    def maxReducerRows(run: => Unit): Long = {
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
}
