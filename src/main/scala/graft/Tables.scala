package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every table is a single Parquet file under `sfDir`. At cluster scale the
  * same call works on a partitioned directory — `spark.read.parquet` handles
  * both, and Catalyst pushes filters/projections into the scan either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session memo of resolved table DataFrames. `spark.read.parquet`
    * pays a driver-side file listing + footer/schema read on EVERY call;
    * across a 100-query bench run that re-resolution is pure per-query
    * floor (the test tables are immutable, so the resolved plan never goes
    * stale). Weak keys: a stopped/collected session drops its entries, so
    * test suites that build many short-lived sessions don't leak plans.
    * NOTE this memoizes the logical plan only — the DATA is still scanned
    * from parquet per query, keeping the DuckDB bench comparison
    * like-for-like (both engines re-scan; neither holds rows in memory). */
  private val memo =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def cached(spark: SparkSession, key: String)(make: => DataFrame): DataFrame = {
    val m = memo.synchronized {
      var c = memo.get(spark)
      if (c == null) {
        c = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        memo.put(spark, c)
        // First contact with a session: install the graft optimizer
        // rules (idempotent). The driver builds plain sessions, so the
        // library self-registers at the one choke point every query
        // path crosses — the same rationale as the function
        // registration in u02.
        graft.extensions.GraftOptimizations.register(spark)
      }
      c
    }
    m.computeIfAbsent(key, _ => make)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached(spark, s"$sfDir/$name.parquet") {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver-generated
    * datasets, so resolve it from the file's actual schema:
    *  - INT64 TIMESTAMP(NANOS): Spark 4.x rejects it outright
    *    ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long via the legacy
    *    conf; rebuild a real TimestampType column with integer division
    *    (`div`, not `/` — double arithmetic on ~1.7e18 ns values loses
    *    sub-millisecond precision past the 53-bit mantissa).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    *    cast to TimestampType (sessions here run UTC, so the instant is
    *    bit-identical to the nanos path and to DuckDB's naive read).
    * Downstream code always sees TimestampType either way. */
  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"$d/events.parquet#ts") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = load(s, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
