package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** The bucketed interval join must be pair-for-pair identical to the
  * naive key-equality self-join + range filter it replaces, and must
  * not square on a hot key.
  */
class IntervalJoinSpec extends SparkSpec {

  private def naive(ev: org.apache.spark.sql.DataFrame, windowUs: Long) = {
    val a = ev.select(col("user_id"), col("event_id").as("event_id1"), col("ts_us").as("ts1"))
    val b = ev.select(col("user_id"), col("event_id").as("event_id2"), col("ts_us").as("ts2"))
    a.join(b, Seq("user_id"))
      .filter((col("ts2") > col("ts1") ||
        (col("ts2") === col("ts1") && col("event_id2") > col("event_id1"))) &&
        col("ts2") <= col("ts1") + lit(windowUs))
      .select(col("user_id"), col("event_id1"), col("event_id2"))
  }

  test("bucketed == naive on driver events (sf0.001)") {
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val bucketed = IntervalJoin.selfPairs(ev, "user_id", "event_id", "ts_us", 60000000L)
      .select("user_id", "event_id1", "event_id2")
    val expected = naive(ev, 60000000L)
    assert(bucketed.exceptAll(expected).isEmpty && expected.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)
  }

  test("pairs straddling a bucket boundary are found exactly once; ties break by id") {
    import spark.implicits._
    // window 100: (1,2) straddles buckets 0|1 with gap 100 (inclusive),
    // (2,3) same bucket, (3,4) gap 101 — out; (5,6) tie at equal ts
    val ev = Seq(
      (1L, 1L, 50L), (1L, 2L, 150L), (1L, 3L, 200L), (1L, 4L, 301L),
      (2L, 5L, 70L), (2L, 6L, 70L)).toDF("user_id", "event_id", "ts_us")
    val got = IntervalJoin.selfPairs(ev, "user_id", "event_id", "ts_us", 100L)
      .select("event_id1", "event_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L), (5L, 6L)))
  }

  test("hot key: candidate count scales with nearby pairs, not history squared") {
    import spark.implicits._
    // one user, 2000 events spaced exactly one window apart: the naive
    // plan evaluates 2000²/2 combinations; bucketed generates only
    // adjacent-bucket candidates. Output: each consecutive pair (gap ==
    // window, inclusive) → 1999 pairs.
    val ev = (1L to 2000L).map(i => (7L, i, i * 100L)).toDF("user_id", "event_id", "ts_us")
    val out = IntervalJoin.selfPairs(ev, "user_id", "event_id", "ts_us", 100L)
    assert(out.count() == 1999L)
  }

  test("negative epochs bucket by true floor division — pairs across zero are exact") {
    import spark.implicits._
    // straddle-zero fixture: (-150,-50) and (-50,40) are within the
    // window, (40,160) is not; plus a dense two-sided sweep checked
    // pair-for-pair against the naive join
    val fx = Seq((1L, 1L, -150L), (1L, 2L, -50L), (1L, 3L, 40L), (1L, 4L, 160L))
      .toDF("user_id", "event_id", "ts_us")
    val got = IntervalJoin.selfPairs(fx, "user_id", "event_id", "ts_us", 100L)
      .select("event_id1", "event_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L)))

    val rnd = new scala.util.Random(11)
    val sweep = (1L to 400L).map(i => (i % 3, i, rnd.between(-500L, 500L)))
      .toDF("user_id", "event_id", "ts_us")
    val bucketed = IntervalJoin.selfPairs(sweep, "user_id", "event_id", "ts_us", 100L)
      .select("user_id", "event_id1", "event_id2")
    val expected = naive(sweep, 100L)
    assert(bucketed.exceptAll(expected).isEmpty && expected.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)
  }
}
