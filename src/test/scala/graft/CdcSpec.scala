package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC operators: the MERGE truth table (update / insert / delete /
  * untouched), latest-change compaction, and SCD2 interval chaining. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")

  // (k, seq, tie, op, nv): seq+tie is the total change order
  private def changes = Seq(
    (1L, 1L, 0L, "U", 100.0), (1L, 2L, 0L, "D", 0.0), // latest deletes 1
    (2L, 1L, 0L, "U", 200.0), (2L, 1L, 1L, "U", 222.0), // tie on seq → tie col decides
    (4L, 1L, 0L, "U", 400.0), // insert
    (5L, 1L, 0L, "D", 0.0) // delete of an absent key = no-op
  ).toDF("k", "seq", "tie", "op", "nv")

  test("latestPerKey picks the max (order) row per key, associatively") {
    val last = Cdc.latestPerKey(changes, "k", Seq("seq", "tie"), Seq("op", "nv"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(last(1L) == ("D", 0.0))
    assert(last(2L) == ("U", 222.0)) // tie-break column decided
    assert(last(4L) == ("U", 400.0))
  }

  test("applyChanges implements the MERGE truth table") {
    val out = Cdc.applyChanges(base, changes, "k", Seq("seq", "tie"), "op",
        set = Map(
          "v" -> col("chg.nv"),
          "name" -> coalesce(col("base.name"), concat(lit("new-"), col("chg.k")))))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(2L, 3L, 4L)) // 1 deleted, 5's delete a no-op
    assert(out(2L) == ("b", 222.0)) // updated, name kept
    assert(out(3L) == ("c", 30.0)) // untouched
    assert(out(4L) == ("new-4", 400.0)) // inserted with default name
  }

  test("applyChanges: NULL op is an upsert, never a silent delete") {
    // SQL MERGE semantics: `WHEN MATCHED AND op = 'D'` is false for a
    // NULL op, so the row updates (or inserts) — before the r12 fix the
    // three-valued NULL propagated through filter(!isDelete) and the
    // key vanished
    val nullOps = Seq(
      (1L, 1L, 0L, null.asInstanceOf[String], 111.0), // matched, NULL op → UPDATE
      (6L, 1L, 0L, null.asInstanceOf[String], 600.0)  // unmatched, NULL op → INSERT
    ).toDF("k", "seq", "tie", "op", "nv")
    val out = Cdc.applyChanges(base, nullOps, "k", Seq("seq", "tie"), "op",
        set = Map("v" -> col("chg.nv")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 6L))
    assert(out(1L) == 111.0 && out(6L) == 600.0)
  }

  test("applyChanges with no matching changes returns base unchanged") {
    val none = changes.filter(col("k") > 100)
    val out = Cdc.applyChanges(base, none, "k", Seq("seq", "tie"), "op",
      set = Map("v" -> col("chg.nv")))
    assert(out.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
  }

  test("scd2 chains validity intervals per key") {
    val hist = Seq(
      (1L, 10L, "v1"), (1L, 20L, "v2"), (1L, 30L, "v3"),
      (2L, 15L, "w1"))
      .toDF("k", "at", "payload")
    val out = Cdc.scd2(hist, "k", Seq("at"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("at"),
        Option(r.getAs[java.lang.Long]("at_to")).map(_.toLong),
        r.getAs[Long]("is_current")))
      .toSet
    assert(out == Set(
      (1L, 10L, Some(20L), 0L),
      (1L, 20L, Some(30L), 0L),
      (1L, 30L, None, 1L),
      (2L, 15L, None, 1L)))
  }
}
