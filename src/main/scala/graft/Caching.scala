package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Ownership registry for operator-internal `persist()` calls.
  *
  * Operators like [[graft.operators.Dedup.lshCandidates]] (signature
  * frame feeds the band join AND two re-attach joins) and q_tfidf (tf
  * feeds df AND the final join) persist an intermediate so one logical
  * pass serves multiple consumers within a SINGLE query execution. But
  * a lazily-returned DataFrame gives the operator no point in time at
  * which the consumer's action has finished, so it cannot unpersist
  * without destroying the very reuse the persist buys. Left unowned,
  * Spark's CacheManager holds the blocks for the session lifetime —
  * negligible in a one-shot job, a real leak in a long-running session
  * executing many queries (the 100 TB serving shape), where stale
  * signature frames accumulate until eviction pressure degrades every
  * subsequent query.
  *
  * Resolution: the operator REGISTERS what it persists
  * ([[persistTracked]]), and whoever runs the action — Verify after
  * each query dump, Bench after each timed run, a spec, a user
  * session — calls [[release]] afterwards. CachingSpec pins that
  * release() actually empties the cache.
  *
  * CONTRACT — one action at a time: the registry is session-global, so
  * [[release]] unpersists EVERY tracked frame, including one a
  * concurrently-executing query is still reusing (Spark would silently
  * recompute it — correct, but the reuse the persist bought is gone).
  * Verify/Bench/specs are sequential, so this never bites the gates; a
  * concurrent serving deployment needs scoped ownership (e.g. one
  * registry per query context) before calling release() from more than
  * one thread.
  */
object Caching {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK — spill, don't OOM) and register it
    * for the next [[release]]. Operator-internal persists must route
    * through here so they always have a release owner. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** Unpersist every frame registered since the last release. Call
    * after the action consuming a query's result completes; non-
    * blocking (block deletion proceeds async, the CacheManager entry
    * is gone immediately). Idempotent — double-release is a no-op. */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }

  /** Frames registered and not yet released (observability + specs). */
  def pendingCount: Int = tracked.size()
}
