package graft

import org.apache.spark.storage.StorageLevel

/** Pins the cache-ownership contract: operator-internal persists are
  * registered with [[Caching]], and release() actually empties the
  * session cache — no entry outlives the query whose action it served.
  * (Before round 7, lshCandidates and q_tfidf persisted frames that
  * NOTHING ever unpersisted: a long-running session executing the LSH
  * family repeatedly accumulated signature-frame caches until eviction
  * pressure degraded every subsequent query.)
  */
class CachingSpec extends SparkSpec {

  /** Persistent-RDD ids added to the context by `body` and still alive
    * after it returns. localCheckpoint blocks from OTHER suites sharing
    * the session are excluded by the before-snapshot. */
  private def leakedRddIds(body: => Unit): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    body
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  test("lshCandidates registers its persist and release() empties the cache") {
    val leaked = leakedRddIds {
      val docs = Tables.documents(spark, sf001)
      val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
      val pairs = graft.operators.Dedup.lshCandidates(sigs, "doc_id")
      pairs.count() // the action the persist serves
      assert(Caching.pendingCount > 0, "persist was not registered for release")
      Caching.release()
      assert(Caching.pendingCount == 0)
    }
    assert(leaked.isEmpty, s"cache entries outlived release(): RDDs $leaked")
  }

  test("q_tfidf's tf persist is released by the action runner") {
    val leaked = leakedRddIds {
      SparkEntry.queries("q_tfidf")(spark, sf001).count()
      assert(Caching.pendingCount > 0)
      Caching.release()
    }
    assert(leaked.isEmpty, s"cache entries outlived release(): RDDs $leaked")
  }

  test("capTokenBudgetSalted registers its narrow-projection persist") {
    val leaked = leakedRddIds {
      SparkEntry.queries("q_token_budget_salted")(spark, sf001).count()
      assert(Caching.pendingCount > 0, "narrow projection persist not registered")
      Caching.release()
      assert(Caching.pendingCount == 0)
    }
    assert(leaked.isEmpty, s"cache entries outlived release(): RDDs $leaked")
  }

  test("release is idempotent and tracked frames really were cached during execution") {
    val docs = Tables.documents(spark, sf001)
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = graft.operators.Dedup.lshCandidates(sigs, "doc_id")
    pairs.count()
    // the registered frame is materialized at a real storage level (the
    // reuse is what kills the double tokenize+minhash pass)
    assert(Caching.pendingCount > 0)
    Caching.release()
    Caching.release() // double release must be a no-op
    assert(Caching.pendingCount == 0)
    // a fresh run after release still computes the same result (the
    // persist is an optimization, never a correctness dependency)
    val again = graft.operators.Dedup.lshCandidates(
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
    assert(again.count() == pairs.count())
    Caching.release()
  }

  test("persistTracked uses a spill-capable level") {
    import org.apache.spark.sql.functions._
    val df = Caching.persistTracked(spark.range(10).toDF("id").withColumn("x", col("id") * 2))
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Caching.release()
    assert(df.storageLevel == StorageLevel.NONE)
  }
}
