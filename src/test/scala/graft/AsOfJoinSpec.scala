package graft

import graft.operators.AsOfJoin

/** Fixture-level as-of semantics, including the unmatched-left NULL path
  * the driver data cannot exercise (every user there has orders). */
class AsOfJoinSpec extends SparkSpec {

  test("backward as-of: latest right <= left ts, ties included, NULL when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 50L, "e3"), (3L, 10L, "e4"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 90L, "a"), (1L, 150L, "b"), (1L, 200L, "t"), (9L, 5L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts")
      .select("ev", "r_ts", "r_v").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

    assert(out("e1") == (Some(90L), Some("a")))   // plain backward match
    assert(out("e2") == (Some(200L), Some("t")))  // tie at equal ts IS matched
    assert(out("e3") == (None, None))             // key exists nowhere on right
    assert(out("e4") == (None, None))             // right rows only after left ts? none before
    assert(out.size == 4)                         // left-join: all left rows kept
  }

  test("forward as-of: earliest right >= left ts, ties included, NULL when none after") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 300L, "e5"),
      (2L, 50L, "e3"), (3L, 10L, "e4")).toDF("k", "ts", "ev")
    val right = Seq((1L, 90L, "a"), (1L, 150L, "b"), (1L, 200L, "t"), (9L, 5L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.forward(left, right, "k", "ts")
      .select("ev", "r_ts", "r_v").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

    assert(out("e1") == (Some(150L), Some("b")))  // earliest following, not latest prior
    assert(out("e2") == (Some(200L), Some("t")))  // tie at equal ts IS matched
    assert(out("e5") == (None, None))             // nothing after → NULL extension
    assert(out("e3") == (None, None))             // key absent on right
    assert(out("e4") == (None, None))
    assert(out.size == 5)
  }

  test("forward and backward agree on exact-ts matches and partition the rest") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "ts", "ev")
    val right = Seq((1L, 100L, "same")).toDF("k", "ts", "v")
    val b = AsOfJoin.backward(left, right, "k", "ts").select("r_v").collect()(0).getString(0)
    val f = AsOfJoin.forward(left, right, "k", "ts").select("r_v").collect()(0).getString(0)
    assert(b == "same" && f == "same")
  }

  test("backward as-of on TimestampType keeps sub-second precision") {
    import java.sql.Timestamp
    import spark.implicits._
    // events 250 ms apart inside ONE second — a cast("long") ordering
    // (whole seconds) would tie all of these and match the 750 ms quote
    // to the 250 ms event
    def t(ms: Long) = new Timestamp(1700000000000L + ms)
    val left = Seq((1L, t(250), "early"), (1L, t(900), "late")).toDF("k", "ts", "ev")
    val right = Seq((1L, t(100), "q1"), (1L, t(750), "q2")).toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts")
      .select("ev", "r_v").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("early" -> "q1", "late" -> "q2"))
  }

  test("backward as-of rejects mismatched order-key families (timestamp vs date)") {
    import spark.implicits._
    // left micros vs right epoch-days would merge on incompatible scales
    // and silently put every date "before" every timestamp — refuse loudly
    val left = Seq((1L, new java.sql.Timestamp(1700000000000L), "e")).toDF("k", "ts", "ev")
    val right = Seq((1L, java.sql.Date.valueOf("2023-11-14"), "v")).toDF("k", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "ts")
    }
    assert(ex.getMessage.contains("order units"))
  }

  test("backward as-of on DOUBLE ts keeps fractional precision (no long truncation)") {
    import spark.implicits._
    // pre-r12, fractional ts went through cast("long"): 1.2 and 1.7
    // both became 1, and the 1.7 quote "matched" the 1.2 event
    val left = Seq((1L, 1.2, "early"), (1L, 1.9, "late")).toDF("k", "ts", "ev")
    val right = Seq((1L, 1.1, "q1"), (1L, 1.7, "q2")).toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts")
      .select("ev", "r_v").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("early" -> "q1", "late" -> "q2"))
  }

  test("backward as-of rejects integral-vs-fractional numeric sides and DECIMAL ts") {
    import spark.implicits._
    // int left vs double right: the long family would truncate the
    // fractional side — different unit families, refuse loudly
    val li = Seq((1L, 10L, "e")).toDF("k", "ts", "ev")
    val rd = Seq((1L, 10.5, "v")).toDF("k", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(li, rd, "k", "ts")
    }
    assert(ex.getMessage.contains("order units"))
    // DECIMAL: both numeric detours lose information — actionable reject
    val ld = li.withColumn("ts",
      org.apache.spark.sql.functions.col("ts").cast("decimal(20,2)"))
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(ld, ld, "k", "ts")
    }
    assert(ex2.getMessage.contains("integral epoch"))
  }

  test("backward as-of rejects non-temporal, non-numeric order keys (string ts)") {
    import spark.implicits._
    // a STRING ts would cast("long") to NULL order keys on both sides
    // and silently produce a wrong merge — the exact silent-mismatch
    // class the unit check exists to prevent
    val left = Seq((1L, "2023-11-14T00:00:00", "e")).toDF("k", "ts", "ev")
    val right = Seq((1L, "2023-11-13T00:00:00", "v")).toDF("k", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "ts")
    }
    assert(ex.getMessage.contains("not a temporal or numeric"))
  }
}
