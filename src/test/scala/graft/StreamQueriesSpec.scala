package graft

import org.apache.spark.sql.functions._

/** The registered streaming queries (StreamQueries) replay events
  * through real micro-batches and are DuckDB-gated by Verify; this spec
  * pins the same streamed ≡ batch equivalences inside `sbt test`, so a
  * streaming regression fails the suite without waiting for the oracle
  * gate. sf0.001 keeps the replay cheap. */
class StreamQueriesSpec extends SparkSpec {

  test("q_stream_sessionize rows equal the batch lag-based sessionization") {
    val streamed = SparkEntry.queries("q_stream_sessionize")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = SparkEntry.queries("q_sessionize")(spark, sf001)
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_hll rows equal the batch portable HLL sketch") {
    val streamed = SparkEntry.queries("q_stream_hll")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ev = Tables.events(spark, sf001)
    val batch = graft.operators.Hll.cardinality(ev, Seq("event_type"), col("user_id"))
      .select(col("event_type"), col("regs_hit"), col("harmonic"), col("hll_estimate"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_hourly buckets equal the batch hourly aggregation") {
    val streamed = SparkEntry.queries("q_stream_hourly")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q_events_hourly")(spark, sf001)
      .select(col("hour"), col("event_type"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_join pairs equal the batch 30-minute interval self-join") {
    val streamed = SparkEntry.queries("q_stream_join")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // same deterministic quarter of the users the query replays
    val ev = Tables.events(spark, sf001)
      .filter(pmod(col("user_id"), lit(4)) === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val batch = ev.toDF("user_id", "l_us", "l_event_id")
      .join(ev.toDF("user_id", "r_us", "r_event_id"), Seq("user_id"))
      .filter(col("r_us") >= col("l_us") && col("r_us") <= col("l_us") + 1800000000L)
      .select(col("user_id"), col("l_event_id"), col("r_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_cdc snapshot equals global latest-per-key minus deletes") {
    val streamed = SparkEntry.queries("q_stream_cdc")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    val batch = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && pmod(col("event_id"), lit(10)) =!= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("collectReplay fences oversized replay slices loudly") {
    import spark.implicits._
    val small = spark.range(10).map(_.toInt)
    // at or under the cap: passes through
    assert(graft.queries.StreamQueries.collectReplay(small, "t", cap = 10).length == 10)
    // over the cap: the harness must refuse BEFORE building the array
    val e = intercept[IllegalArgumentException](
      graft.queries.StreamQueries.collectReplay(spark.range(11).map(_.toInt), "t", cap = 10))
    assert(e.getMessage.contains("replay harness"))
  }
}
