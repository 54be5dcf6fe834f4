package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory: the configuration this library is
  * designed against, in one place, so a user of the reference pipeline
  * can stand up an equivalent Spark session with one call.
  *
  * Notes per setting:
  *  - AQE on (default in Spark 4): runtime coalescing + skew-join splits
  *    complement the static designs in `operators/`;
  *  - shuffle partitions sized to cores for local work — on a real
  *    cluster pass `shufflePartitions ≈ 2-3× total executor cores`, or
  *    rely on AQE coalescing from a higher initial value;
  *  - 128 MB file split targets keep scan tasks uniform over 100 TB
  *    (the parquet default, stated explicitly as a contract);
  *  - graft's native SQL functions (haversine_km) registered via
  *    [[graft.plans.GraftExtensions]].
  */
object GraftSession {

  /** Fully-qualified class of Spark's RocksDB state store provider.
    * The default (HDFSBackedStateStoreProvider) keeps every state row on
    * the executor HEAP — fine for tests, a memory wall for production
    * streams whose live state (sessions, dedup fingerprints inside the
    * watermark horizon) exceeds executor memory. RocksDB spills state to
    * local disk with an off-heap block cache, which is the 100 TB
    * posture; StreamsSpec pins that graft's streaming operators behave
    * identically (results AND watermark eviction) on both providers.
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft",
      rocksdbStateStore: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
    if (rocksdbStateStore)
      b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    else b
  }

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    // getOrCreate may return a pre-existing session built elsewhere, in
    // which case constructor-time extensions did not run
    graft.plans.GraftExtensions.install(s)
    s
  }
}
