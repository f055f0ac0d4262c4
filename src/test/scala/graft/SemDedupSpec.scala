package graft

import org.apache.spark.sql.functions._
import graft.operators.SemDedup

/** SemDeDup (operators/SemDedup): cluster-bounded semantic dedup.
  * Hand-built geometry pins the semantics; the corpus run pins the
  * survivor partition and the cell bound. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal 4-dim directions as centroids
  private val twoCells: Seq[(Int, Array[Float])] = Seq(
    (0, Array(1f, 0f, 0f, 0f)),
    (1, Array(0f, 1f, 0f, 0f)))

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("identical vectors in one cell: higher id dropped, min id kept") {
    val emb = df(
      1L -> Array(0.9f, 0.1f, 0f, 0f),
      2L -> Array(0.9f, 0.1f, 0f, 0f),   // exact dup of 1
      3L -> Array(0f, 1f, 0.2f, 0f))     // other cell, kept
    val kept = SemDedup.dedup(emb, "id", "vec", threshold = 0.95, twoCells)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("near-dups in DIFFERENT cells are not compared (the cluster bound)") {
    // 45°-ish vectors that land in different cells but are mutually
    // similar — SemDeDup by design does not see the cross-cell pair
    val emb = df(
      1L -> Array(1f, 0.8f, 0f, 0f),   // cell 0
      2L -> Array(0.8f, 1f, 0f, 0f))   // cell 1, cosine≈0.98 with id 1
    val kept = SemDedup.dedup(emb, "id", "vec", threshold = 0.9, twoCells)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    assert(SemDedup.dupEdges(emb, "id", "vec", 0.9, twoCells).isEmpty)
  }

  test("survivors = corpus minus distinct higher-ids of dup edges (corpus run)") {
    val emb = Tables.embeddings(spark, sf001)
    val losers = SemDedup.dupEdges(emb, "vec_id", "embedding", threshold = 0.4)
      .select(col("id2")).distinct()
    val kept = SemDedup.dedup(emb, "vec_id", "embedding", threshold = 0.4)
    assert(kept.count() + losers.count() == emb.count())
    // no survivor is a loser
    assert(kept.join(losers, col("vec_id") === col("id2"), "left_semi").isEmpty)
  }

  test("edges only ever connect ids of the SAME cell, canonical id1 < id2") {
    val edges = SemDedup.dupEdges(Tables.embeddings(spark, sf001),
      "vec_id", "embedding", threshold = 0.3).collect()
    val assigned = SemDedup.assign(Tables.embeddings(spark, sf001),
      "vec_id", "embedding", graft.operators.IvfCentroids.cells)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    edges.foreach { r =>
      val (id1, id2, cell) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(id1 < id2)
      assert(assigned(id1) == cell && assigned(id2) == cell)
    }
  }

  test("cellsFor holds expected cell occupancy at the target across corpus sizes") {
    // ⌈n/target⌉, floored at 1 — unclamped: the 4096 flat-assignment
    // ceiling is the CALLERS' require, so the rule never silently
    // under-reports k (a clamp would re-introduce the fixed-k quadratic)
    assert(SemDedup.cellsFor(0) == 1)
    assert(SemDedup.cellsFor(128) == 1)
    assert(SemDedup.cellsFor(129) == 2)
    assert(SemDedup.cellsFor(2000) == 16)  // the frozen IvfCentroids point
    assert(SemDedup.cellsFor(60000) == 469)
    assert(SemDedup.cellsFor(10000000) == 78125) // honest k past the callers' ceiling
    for (n <- Seq(500L, 5000L, 50000L, 500000L)) {
      val k = SemDedup.cellsFor(n)
      assert(n.toDouble / k <= 128.0, s"occupancy blew past target at n=$n")
    }
    // dedupAuto refuses past even the hierarchical sweet spot (65536
    // cells ≈ 8.4M rows at the default target) rather than degrading
    // silently — the require fires on the id count, before any
    // training or assignment work touches a vector
    intercept[IllegalArgumentException] {
      SemDedup.dedupAuto(
        spark.range(0, 8500000).selectExpr("id", "array(1.0f) AS vec"),
        "id", "vec", 0.5)
    }
  }

  test("dedupAuto: single-cell path below the target; trained path partitions like dedup") {
    // n ≤ target → one cell, no quantizer: behaves as all-pairs dedup
    val emb = df(
      1L -> Array(0.9f, 0.1f, 0f, 0f),
      2L -> Array(0.9f, 0.1f, 0f, 0f),   // exact dup of 1
      3L -> Array(0f, 1f, 0.2f, 0f))
    val kept = SemDedup.dedupAuto(emb, "id", "vec", threshold = 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // trained path (force multi-cell with a small target): survivors +
    // losers still partition the corpus, the dedup() invariant
    val corpus = Tables.embeddings(spark, sf001)
    val auto = SemDedup.dedupAuto(corpus, "vec_id", "embedding",
      threshold = 0.4, targetCellSize = 64)
    val n = corpus.count()
    assert(auto.count() <= n && auto.count() > 0)
    // every id appears at most once and comes from the corpus
    assert(auto.select("vec_id").distinct().count() == auto.count())
    assert(auto.join(corpus, Seq("vec_id"), "left_anti").isEmpty)
  }

  test("maxCellSize caps candidate generation deterministically") {
    val emb = df(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0.01f, 0f, 0f),
      3L -> Array(1f, 0.02f, 0f, 0f),
      4L -> Array(1f, 0.03f, 0f, 0f))
    // cap 2 keeps ids {1,2} in the cell → only edge (1,2) survives;
    // ids 3,4 are never candidates, so they are all kept
    val kept = SemDedup.dedup(emb, "id", "vec", threshold = 0.9, twoCells,
      maxCellSize = Some(2)).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
    val uncapped = SemDedup.dedup(emb, "id", "vec", threshold = 0.9, twoCells)
      .select("id").as[Long].collect().toSet
    assert(uncapped == Set(1L))
  }
}
