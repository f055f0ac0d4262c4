package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Fixture pins for the ordered-funnel semantics (q_funnel): a stage
  * counts only STRICTLY AFTER the previous stage's first completion —
  * independent corroboration of the DuckDB oracle on crafted orderings
  * the synthetic corpus may not contain.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new Timestamp(min * 60000L)

  private def funnel(rows: (Long, String, Timestamp)*): Map[Long, Long] =
    graft.queries.EventQueries.funnel(
        rows.toDF("user_id", "event_type", "ts")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us")))
      .select(col("user_id"), col("stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a purchase BEFORE the click does not complete the funnel") {
    val out = funnel(
      (1L, "view", t(0)), (1L, "purchase", t(5)), (1L, "click", t(10)),
      (2L, "view", t(0)), (2L, "click", t(5)), (2L, "purchase", t(10)))
    assert(out == Map(1L -> 2L, 2L -> 3L))
  }

  test("pre-view clicks are ignored; the first POST-view click anchors stage 3") {
    // u1: click at t=1 precedes the view — stage stops at 1; a purchase
    // at t=3 can't count (no qualifying click)
    val out = funnel(
      (1L, "click", t(1)), (1L, "view", t(2)), (1L, "purchase", t(3)))
    assert(out == Map(1L -> 1L))
  }

  test("simultaneous events do not satisfy the STRICTLY-after constraint") {
    val out = funnel((1L, "view", t(0)), (1L, "click", t(0)))
    assert(out == Map(1L -> 1L))
  }

  test("users with no view at all are stage 0") {
    val out = funnel((1L, "click", t(0)), (1L, "purchase", t(1)))
    assert(out == Map(1L -> 0L))
  }
}
