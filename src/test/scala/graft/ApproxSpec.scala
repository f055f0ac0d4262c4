package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface (HLL++ sketches): error bound vs exact
  * on real data. These are the constant-memory aggregations a 100 TB
  * profile pass uses where exact distinct counts would shuffle-explode. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val r = Tables.lineitem(spark, sf001).agg(
      countDistinct(col("l_partkey")).as("exact_p"),
      approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_p"),
      countDistinct(col("l_orderkey")).as("exact_o"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_o")).collect().head
    def relErr(e: Long, a: Long) = math.abs(a - e).toDouble / e
    assert(relErr(r.getLong(0), r.getLong(1)) < 0.05)
    assert(relErr(r.getLong(2), r.getLong(3)) < 0.05)
  }

  test("q_events_hourly_hll estimates per-group distinct users within 5% of exact") {
    // the registered query's oracle asserts the hll_ok GATE (the
    // estimate can't hash-match a different HLL impl); this spec is the
    // TIGHTER early-warning pin — it recomputes the estimate and holds
    // it to the measured 3-sigma band, so a sketch drift shows up here
    // before it eats the gate's 6/0.20 headroom
    val gated = SparkEntry.queries("q_events_hourly_hll")(spark, sf001)
    val gatedRows = gated.collect()
    assert(gatedRows.nonEmpty)
    gatedRows.foreach(r => assert(r.getAs[Boolean]("hll_ok"),
      s"gate flipped: ${r.getAs[String]("hour")}/${r.getAs[String]("event_type")}"))
    val joined = Tables.events(spark, sf001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        count(lit(1)).as("n_events_exact")).collect()
    // the registered query's exact columns agree with this recompute
    val exactByKey = joined.map(r =>
      (r.getAs[String]("hour"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_events_exact")))).toMap
    gatedRows.foreach { r =>
      val (eu, ee) = exactByKey((r.getAs[String]("hour"), r.getAs[String]("event_type")))
      assert(r.getAs[Long]("n_users") == eu && r.getAs[Long]("n_events") == ee)
    }
    joined.foreach { r =>
      val e = r.getAs[Long]("n_users"); val a = r.getAs[Long]("n_users_approx")
      // default rsd 0.05: allow 3 sigma relative, floor of ±3 absolute
      // for tiny groups where one registers' noise dominates
      assert(math.abs(a - e) <= math.max(3.0, 0.15 * e),
        s"hour=${r.getAs[String]("hour")} type=${r.getAs[String]("event_type")}: exact=$e approx=$a")
    }
    // aggregate quality: mean relative error across groups well under rsd
    val errs = joined.filter(_.getAs[Long]("n_users") >= 20).map { r =>
      math.abs(r.getAs[Long]("n_users_approx") - r.getAs[Long]("n_users")).toDouble /
        r.getAs[Long]("n_users")
    }
    if (errs.nonEmpty) assert(errs.sum / errs.length < 0.05,
      f"mean rel err ${errs.sum / errs.length}%.4f")
  }

  test("approx percentile tracks exact percentile") {
    val r = Tables.lineitem(spark, sf001).agg(
      percentile(col("l_quantity"), lit(0.5)).as("exact"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx"))
      .collect().head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }

  test("q_percentile_approx quantiles land within ±2% RANK of exact") {
    // the registered query's oracle asserts the p50_ok/p95_ok rank-
    // bracket gates (DuckDB's t-digest is a different sketch, estimates
    // can't hash-match). The GK sketch's guarantee is on RANK, not value
    // (and it returns a data element while exact percentile()
    // interpolates) — this spec re-derives the bracket independently
    // and checks the estimates against it, so the gate's logic itself
    // is pinned, not just its boolean output.
    val gated = SparkEntry.queries("q_percentile_approx")(spark, sf001)
    val gatedRows = gated.collect()
    assert(gatedRows.nonEmpty)
    gatedRows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok"),
        s"gate flipped for ${r.getAs[String]("event_type")}")
    }
    val joined = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(5000)).as("p50_approx"),
        percentile_approx(col("value"), lit(0.95), lit(5000)).as("p95_approx"),
        percentile(col("value"), lit(0.48)).as("p50_lo"),
        percentile(col("value"), lit(0.52)).as("p50_hi"),
        percentile(col("value"), lit(0.93)).as("p95_lo"),
        percentile(col("value"), lit(0.97)).as("p95_hi")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val t = r.getAs[String]("event_type")
      val p50 = r.getAs[Double]("p50_approx")
      val p95 = r.getAs[Double]("p95_approx")
      assert(p50 >= r.getAs[Double]("p50_lo") && p50 <= r.getAs[Double]("p50_hi"),
        s"p50 outside rank bracket for $t")
      assert(p95 >= r.getAs[Double]("p95_lo") && p95 <= r.getAs[Double]("p95_hi"),
        s"p95 outside rank bracket for $t")
    }
  }
}
