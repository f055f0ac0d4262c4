package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and resolves
  * its inputs through here, so the scan layer is in one place: parquet,
  * schema-on-read, no driver-side caching. Column pruning and predicate
  * pushdown are left to Catalyst — callers `select`/`filter` and the
  * parquet scan only reads what survives.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The driver has regenerated `events.parquet` across rounds with two
    * different physical types for `ts`, so adapt to whichever is on disk:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]); with `nanosAsLong` it surfaces as
    *    LongType epoch-nanos → rebuild micros with integer division
    *    (`div`, not `/` — epoch-nanos exceed 2^53, double math would
    *    corrupt low bits; driver data is µs-precision so it's lossless).
    *  - naive `timestamp[us]` (current data): surfaces as TIMESTAMP_NTZ →
    *    cast to session-local TIMESTAMP. Every session we own pins
    *    spark.sql.session.timeZone=UTC, so the cast is a lossless
    *    reinterpretation matching DuckDB's naive timestamps.
    *
    * The `nanosAsLong` flag is harmless for non-nanos files. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scale-adaptive fan-out for HEAVY per-row compute (tokenization,
    * shingling, codec decode, vector kernels) that rides directly on a
    * scan: the driver's tables are single-row-group parquet files, so a
    * bare scan is ONE task and everything narrow above it runs on one
    * core of local[32] (measured: the shingle pipeline halves with a
    * spread, guide §6 scan-parallelism). On any real cluster the scan
    * has ≥ cores splits and this is a NO-OP — the partition-count probe
    * is what keeps it from becoming a local-only repartition tax at
    * 100 TB (a round-robin of the full corpus before narrow work would
    * be pure shuffle waste there, and the plan-audit narrow pins stay
    * meaningful because the guard fires only under-parallel inputs).
    * Only for CHEAP-to-move rows whose downstream per-row work
    * dominates the move; never for wide relational scans (measured
    * net-negative on TPC-H Q6). Streaming frames pass through (`.rdd`
    * is illegal on them; micro-batch frames inside foreachBatch are
    * batch frames and do get spread). */
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
