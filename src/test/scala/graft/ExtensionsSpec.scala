package graft

import org.apache.spark.sql.SparkSession

/** Drives the SQL-registered custom functions through a session built
  * with GraftExtensions — the pure-SQL user's view of the engine. */
class ExtensionsSpec extends SparkSpec {

  // Register on the SHARED test session: building a differently-configured
  // session here would silently dictate JVM-wide config for whichever
  // suite initializes second (getOrCreate first-wins), and getOrCreate
  // ignores withExtensions on an existing session anyway. The real
  // injection path (withExtensions in a fresh JVM) is exercised via
  // `runMain` during verification.
  lazy val extSpark: SparkSession = {
    val s = SparkSpec.spark
    GraftExtensions.registerOn(s)
    s
  }

  test("registerOn path: key filter above native top-k reaches the parquet scan") {
    // extraOptimizations run AFTER the built-in pushdown batches, so
    // PushFilterThroughTopKPerKey must descend the pushed key filter
    // itself (it re-applies PushDownPredicates to the subtree) — pin
    // that the predicate lands in the scan's PushedFilters, not just
    // below the node
    val s = extSpark
    val o = Tables.orders(s, sf001)
    val q = graft.operators.TopK.perGroupNative(
        o, Seq("o_custkey"), "o_totalprice", Seq("o_orderkey"), 3)
      .filter(org.apache.spark.sql.functions.col("o_custkey") === 7L)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]"),
      s"key filter did not reach the scan:\n$p")
    assert(q.count() > 0)
  }

  test("custom functions callable from pure SQL") {
    val s = extSpark
    val cos = s.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val pairRows = s.sql(
      "SELECT p.* FROM (SELECT array('b', 'a', 'c') AS items) LATERAL VIEW pairs(items) p AS x, y")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairRows == Set(("a", "b"), ("a", "c"), ("b", "c")))

    val ph = s.sql(
      "SELECT portable_hash60('42') AS h, conv(substring(md5('42'), 1, 15), 16, 10) AS c")
      .collect().head
    assert(ph.getLong(0) == ph.getString(1).toLong, "portable_hash60 != composed md5 form")

    val sig = s.sql(
      """SELECT minhash_agg(xxhash64(t), 8) AS sig FROM (SELECT explode(array('x','y','z')) AS t)""")
      .collect().head.getAs[scala.collection.Seq[Long]]("sig")
    assert(sig.length == 8)

    val sh = s.sql(
      """SELECT simhash_agg(xxhash64(t)) AS h FROM (SELECT explode(array('x','y')) AS t)""")
      .collect().head.getLong(0)
    assert(sh != 0L)
  }

  test("sketch aggregates reject wrong-typed input at analysis, not mid-job") {
    // update() paths cast without checks (tight loops); the SQL surface
    // must fail these at plan time — un-hashed strings into minhash/
    // simhash, an INT weight into pair_argmax
    val s = extSpark
    for (q <- Seq(
      "SELECT minhash_agg(t, 8) FROM (SELECT explode(array('x','y')) AS t)",
      "SELECT simhash_agg(t) FROM (SELECT explode(array('x','y')) AS t)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](s.sql(q).collect())
      assert(e.getMessage.contains("BIGINT"), s"$q:\n${e.getMessage}")
    }
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      import org.apache.spark.sql.functions._
      import s.implicits._
      Seq(("ab", 1)).toDF("w", "n")
        .agg(graft.functions.SketchAggs.pair_argmax(col("w"), col("n"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }
}
