package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the
  * same logical plan runs at sf0.001 (smoke), sf0.01 (correctness) and
  * sf0.1 (bench) — and, unchanged, against a 100 TB partitioned layout:
  * nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` varies by fixture generation: TIMESTAMP(NANOS) (which
    * Spark 4 refuses to read as a timestamp — [PARQUET_TYPE_ILLEGAL] —
    * so the legacy conf reads it as raw nanos and integer division
    * truncates to µs, exactly DuckDB's TIMESTAMP_NS→µs behavior) or
    * plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark 4
    * infers as TIMESTAMP_NTZ). Both normalize to a session-UTC
    * TimestampType so every downstream plan and oracle sees identical
    * values regardless of which layout the directory holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Flip the legacy nanos conf ONLY when this directory actually holds
    // the nanos layout (Spark refuses its footer at schema inference) —
    // setting it unconditionally would permanently change how any other
    // nanos-timestamp parquet in the shared session is read (r7 ADVICE).
    // It stays set in the nanos case: the scan consults it again at
    // execution, so a set-read-restore dance would break the very read
    // it enabled.
    // walk the CAUSE CHAIN, not just the top message (round-14 review):
    // when footer reading runs as a distributed job the executor-side
    // error arrives wrapped in a SparkException whose own message may
    // carry only stage-failure text, and a top-message-only guard would
    // rethrow instead of enabling the nanos fallback
    def mentionsNanos(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("PARQUET_TYPE_ILLEGAL") ||
        mentionsNanos(t.getCause))
    val raw =
      try table(s, d, "events")
      catch {
        case e: Throwable if mentionsNanos(e) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        // NTZ holds wall-clock micros; the cast re-reads them in the
        // session zone. Only UTC makes that equal the nanos layout (whose
        // timestamp_micros path is zone-independent) and the DuckDB
        // oracle — so fail loudly instead of shifting silently.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          s"events() NTZ→Timestamp cast requires spark.sql.session.timeZone=UTC " +
            s"(got '${s.conf.get("spark.sql.session.timeZone")}')")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet-derived type $other " +
          "(expected nanos-as-long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
