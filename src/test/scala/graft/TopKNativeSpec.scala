package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

/** The native whole-operator top-k (logical node → strategy → two-phase
  * exec) must be row-set identical to the window/rank formulation, plan
  * as partial → exchange → final, and accept key-predicate pushdown
  * from its optimizer rule.
  */
class TopKNativeSpec extends SparkSpec {

  test("native == window top-k on driver orders (sf0.001)") {
    val o = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val native = TopK.perGroupNative(o, Seq("o_custkey"),
      "o_totalprice", Seq("o_orderkey"), k = 3)
    val window = TopK.perGroup(o, Seq(col("o_custkey")),
      col("o_totalprice"), Seq(col("o_orderkey")), k = 3).drop("rn")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("ties, k larger than the group, and multi-column keys") {
    import spark.implicits._
    val df = Seq(
      // key (1,"a"): scores 5,5,3 with ids 1,2,3 — tie at 5 broken by id
      (1, "a", 1L, 5.0), (1, "a", 2L, 5.0), (1, "a", 3L, 3.0),
      // key (1,"b"): single row, k exceeds group size
      (1, "b", 4L, 9.0),
      // key (2,"a"): all equal scores — tie-break alone decides
      (2, "a", 5L, 1.0), (2, "a", 6L, 1.0), (2, "a", 7L, 1.0)
    ).toDF("k1", "k2", "id", "score")
    val got = TopK.perGroupNative(df, Seq("k1", "k2"),
      "score", Seq("id"), k = 2)
      .select("k1", "k2", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1, "a", 1L), (1, "a", 2L), (1, "b", 4L),
      (2, "a", 5L), (2, "a", 6L)))
  }

  test("plans as partial heap -> exchange -> final heap, no sorts") {
    val o = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val q = TopK.perGroupNative(o, Seq("o_custkey"),
      "o_totalprice", Seq("o_orderkey"), k = 3)
    q.collect() // materialize so AQE finalizes the physical plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyExec(partial"), plan)
    assert(plan.contains("TopKPerKeyExec(final"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("Sort "), s"native top-k must not sort:\n$plan")
  }

  test("optimizer rule pushes key-only filters below the node, keeps the rest above") {
    val o = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val q = TopK.perGroupNative(o, Seq("o_custkey"),
      "o_totalprice", Seq("o_orderkey"), k = 3)
      .filter(col("o_custkey") < 100 && col("o_totalprice") > 1000.0)
    val optimized = q.queryExecution.optimizedPlan
    // key predicate descends to the scan side; value predicate stays above
    val nodeStr = optimized.toString
    val idxTopK = nodeStr.indexOf("TopKPerKeyNode")
    val idxKeyPred = nodeStr.indexOf("o_custkey#", nodeStr.indexOf("Filter", idxTopK))
    assert(idxTopK >= 0, nodeStr)
    assert(nodeStr.indexOf("Filter") < idxTopK, s"value filter must stay above:\n$nodeStr")
    assert(idxKeyPred > idxTopK, s"key filter must be below the node:\n$nodeStr")
    // and the pushed-down result is still correct
    val expected = TopK.perGroup(
      o.filter(col("o_custkey") < 100), Seq(col("o_custkey")),
      col("o_totalprice"), Seq(col("o_orderkey")), k = 3).drop("rn")
      .filter(col("o_totalprice") > 1000.0)
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
  }

  test("float group keys normalize -0.0/0.0 and NaN bit patterns like window grouping") {
    import spark.implicits._
    // raw UnsafeRow bytes differ for -0.0 vs 0.0 and NaN payloads; the
    // strategy must collapse them (NormalizeNaNAndZero) or one logical
    // group splits across heaps/partitions
    val weirdNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq(
      (0.0, 1L, 10.0), (-0.0, 2L, 20.0), (-0.0, 3L, 5.0),
      (Double.NaN, 4L, 1.0), (weirdNaN, 5L, 2.0)
    ).toDF("k", "id", "score")
    val native = TopK.perGroupNative(df, Seq("k"), "score", Seq("id"), 2)
    val window = TopK.perGroup(df, Seq(col("k")), col("score"), Seq(col("id")), 2).drop("rn")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    // zero group keeps exactly 2 of its 3 rows → the groups really merged
    assert(native.filter(col("k") === 0.0).count() == 2)
  }

  test("adversarial key cardinality: partial phase flushes at the bound instead of OOM") {
    val big = spark.range(0, 1000000)
      .select((col("id") % 900000).as("k"), col("id").as("id"),
        (col("id") % 37).cast("double").as("score"))
    spark.conf.set("spark.graft.topk.maxKeysInMemory", "1024")
    // AQE buries the partial exec inside a materialized query stage
    // (invisible to plan.collect) — turn it off so the metric is reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val native = TopK.perGroupNative(big, Seq("k"), "score", Seq("id"), 2)
      native.collect() // materialize THIS query execution so metrics fill
      // ~900k distinct keys against a 1024-key bound: the bound must
      // actually have engaged (flush metric > 0 on the partial exec)
      val flushes = native.queryExecution.executedPlan.collect {
        case e: graft.plans.TopKPerKeyExec if e.partial => e.metrics("flushes").value
      }
      assert(flushes.nonEmpty && flushes.head > 0, s"expected bound-triggered flushes, got $flushes")
      val window = TopK.perGroup(big, Seq(col("k")), col("score"), Seq(col("id")), 2).drop("rn")
      assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.topk.maxKeysInMemory")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("zero group keys = global top-k (AllTuples gather, not ClusteredDistribution(Nil))") {
    // the Kmv-over-no-keys shape: ClusteredDistribution(Nil) is rejected
    // by Catalyst, so the final phase must require AllTuples — the
    // partial heaps have already cut each partition to ≤ k rows
    val df = spark.range(0, 10000)
      .select(col("id"), ((col("id") * 37) % 1000).cast("double").as("score"))
    val got = TopK.perGroupNative(df, Seq.empty, "score", Seq("id"), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = df.orderBy(col("score").desc, col("id")).limit(5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("NULL order values rank like the window formulation (nulls last on desc)") {
    import spark.implicits._
    val df = Seq[(Int, Long, java.lang.Double)](
      (1, 1L, 2.0), (1, 2L, null), (1, 3L, 1.0), (1, 4L, null)
    ).toDF("k", "id", "score")
    val native = TopK.perGroupNative(df, Seq("k"), "score", Seq("id"), 3)
    val window = TopK.perGroup(df, Seq(col("k")), col("score"), Seq(col("id")), 3).drop("rn")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  // the broadcast-cross-join assignment shape every localGroups caller
  // certifies: stream-side unique key, each key's rows contiguous
  private def assignmentShaped() = {
    val stream = spark.range(0, 5000)
      .select(col("id"), (col("id") % 97).cast("double").as("w"))
    val small = spark.range(0, 16)
      .select(col("id").as("cell"), ((col("id") * 3) % 7).cast("double").as("boost"))
    stream.crossJoin(broadcast(small))
      .withColumn("score", col("w") * col("boost") + col("cell"))
  }

  test("localGroups: exchange-free single heap pass, identical rows to two-phase") {
    val scored = assignmentShaped()
    val local = TopK.perGroupNative(scored, Seq("id"), "score", Seq("cell"), 3,
      localGroups = true)
    val twoPhase = TopK.perGroupNative(scored, Seq("id"), "score", Seq("cell"), 3)
    assert(local.exceptAll(twoPhase).isEmpty && twoPhase.exceptAll(local).isEmpty)
    assert(local.count() == 5000 * 3)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val all = nodes(local.queryExecution.executedPlan)
    val heaps = all.collect { case t: graft.plans.TopKPerKeyExec => t }
    assert(heaps.size == 1 && heaps.head.localGroups,
      s"expected one local-mode heap:\n${local.queryExecution.executedPlan}")
    assert(!all.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"localGroups plan must not shuffle:\n${local.queryExecution.executedPlan}")
  }

  test("localGroups stays exact when the key bound flushes between contiguous runs") {
    // 5000 contiguous key runs against a 64-key heap bound: dozens of
    // bound-triggered flushes, each falling BETWEEN runs — still exact
    spark.conf.set("spark.graft.topk.maxKeysInMemory", "64")
    try {
      val scored = assignmentShaped()
      val local = TopK.perGroupNative(scored, Seq("id"), "score", Seq("cell"), 3,
        localGroups = true)
      val window = TopK.perGroup(scored, Seq(col("id")), col("score"),
        Seq(col("cell")), 3).drop("rn")
      assert(local.exceptAll(window).isEmpty && window.exceptAll(local).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.topk.maxKeysInMemory")
    }
  }
}
