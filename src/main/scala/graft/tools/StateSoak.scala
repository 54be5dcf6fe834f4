package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.Streams

/** Streaming state-larger-than-heap soak (round-11 verdict task 7).
  *
  * StreamsSpec pins that [[Streams.dedupStream]] produces identical
  * results and watermark eviction on the default (heap-backed) and
  * RocksDB state store providers; what it cannot pin in-process is the
  * reason RocksDB exists: SURVIVING state that exceeds executor heap.
  * This main runs dedupStream over a rate source of all-distinct keys
  * until the state store holds `targetKeys` rows, inside a JVM whose
  * heap (set via SPARK_DRIVER_MEM; Spark refuses drivers under ~450 MB,
  * so 512m is the practical floor) is below a conservative lower bound
  * of what the heap-backed provider would need for the same state
  * (~100 B/row: UnsafeRow key+value pairs plus HashMap entry overhead —
  * the control run measures the real cost at ~227 B/row), then prints
  * one PASS/FAIL JSON line and per-batch progress. The run FAILS unless
  * the target is reached AND that lower bound exceeds the JVM heap —
  * so at the 512 MB floor the target must be > 5.37 M keys (the 8 M
  * default clears it). Run:
  *
  * {{{
  * SPARK_DRIVER_MEM=512m sbt "runMain graft.tools.StateSoak"            // 8M keys
  * SPARK_DRIVER_MEM=512m sbt "runMain graft.tools.StateSoak 8000000 hdfs"  // expect OOM
  * }}}
  *
  * Recorded evidence from this host lives in STATE_SOAK.md.
  */
object StateSoak {

  private val HeapBytesPerStateRowLowerBound = 100L

  def main(args: Array[String]): Unit = {
    val targetKeys = args.headOption.map(_.toLong).getOrElse(8000000L)
    val useRocks = !(args.length > 1 && args(1) == "hdfs")
    val spark = GraftSession.builder(
        master = "local[2]", shufflePartitions = 4,
        appName = "graft-state-soak", rocksdbStateStore = useRocks)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = Files.createTempDirectory("soak-ckpt").toString

    // rate source: monotonically increasing `value` → every key distinct,
    // so state grows one row per input row; timestamps are wall-clock and
    // the 2 h watermark never evicts within the run
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", 400000).load()
      .select(col("timestamp").as("ts"),
        concat(lit("doc body "), col("value")).as("text"))
    val q = Streams.dedupStream(src, "text", "ts", watermark = "2 hours")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .start()

    val heap = Runtime.getRuntime.maxMemory()
    val needed = targetKeys * HeapBytesPerStateRowLowerBound
    println(s"""{"soak":"start","provider":"${if (useRocks) "rocksdb" else "hdfs"}",""" +
      s""""heap_bytes":$heap,"target_keys":$targetKeys,""" +
      s""""heap_lower_bound_bytes":$needed}""")

    var stateRows = 0L
    var batches = 0L
    val deadline = System.nanoTime() + 15L * 60 * 1000 * 1000 * 1000
    // q.isActive in the loop condition (round-12 review): a stream that
    // dies early (checkpoint failure, executor OOM on the hdfs control
    // run) otherwise spins silently for the full 15-minute deadline —
    // the expected-quick control failure became a quarter-hour hang
    while (stateRows < targetKeys && q.isActive && System.nanoTime() < deadline) {
      Thread.sleep(3000)
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        stateRows = p.stateOperators.map(_.numRowsTotal).sum
        batches = p.batchId
        val mem = p.stateOperators.map(_.memoryUsedBytes).sum
        println(s"""{"soak":"progress","batch":$batches,"state_rows":$stateRows,""" +
          s""""state_memory_bytes":$mem,"heap_used_bytes":""" +
          s"""${Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()}}""")
      }
    }
    // capture the failure cause BEFORE stop() clears it — the done line
    // must say WHY a run fell short, not just pass:false
    val streamError = Option(q.exception.orNull)
      .map(e => e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(300))
    q.stop()
    val pass = stateRows >= targetKeys && needed > heap
    println(s"""{"soak":"done","pass":$pass,"provider":"${if (useRocks) "rocksdb" else "hdfs"}",""" +
      s""""state_rows":$stateRows,"batches":$batches,"heap_bytes":$heap,""" +
      s""""heap_lower_bound_bytes":$needed""" +
      streamError.map(e => s""","stream_error":"$e"""").getOrElse("") + "}")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
