package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins for the ANN ops: LSH recall against the exact brute-force
  * baseline, and determinism of the expression-based cosine.
  */
class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf001)
  lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  lazy val bruteTop: Map[Long, Seq[Long]] =
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }

  test("brute force returns k neighbors per query, self excluded") {
    assert(bruteTop.nonEmpty)
    bruteTop.foreach { case (q, ns) =>
      assert(ns.length == 10)
      assert(!ns.contains(q))
    }
  }

  test("cosine is in [-1, 1] and symmetric") {
    val a = emb.limit(1).select(col("embedding").as("a"))
    val pairs = a.crossJoin(emb.limit(50).select(col("embedding").as("b")))
    val vals = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("b"), col("a")).as("ba")).collect()
    vals.foreach { r =>
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-12)
      assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("SRP-LSH with few planes achieves useful recall@10 vs brute force") {
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 10, planes = 4, tables = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = bruteTop.map { case (q, exact) =>
      val got = lsh.getOrElse(q, Set.empty)
      exact.count(got.contains).toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    // 8-table OR-construction over 4-bit codes: ~0.7 predicted for
    // moderately-similar neighbors; pin a conservative floor
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("quality-vs-cost curve: multiprobe LSH and nprobe=8 IVF are the high-recall endpoints") {
    def lshRecall(tables: Int, probes: Int = 0): Double = {
      val got = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, planes = 4, tables = tables, probes = probes)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rs = bruteTop.map { case (q, exact) =>
        exact.count(got.getOrElse(q, Set.empty).contains).toDouble / exact.size
      }
      rs.sum / rs.size
    }
    def ivfRecall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rs = bruteTop.map { case (q, exact) =>
        exact.count(got.getOrElse(q, Set.empty).contains).toDouble / exact.size
      }
      rs.sum / rs.size
    }
    val (lsh8, lsh16) = (lshRecall(8), lshRecall(16))
    val (lsh8mp, lsh16mp) = (lshRecall(8, probes = 4), lshRecall(16, probes = 4))
    val (ivf4, ivf8) = (ivfRecall(4), ivfRecall(8))
    info(f"recall@10 — lsh tables=8: $lsh8%.3f, tables=16: $lsh16%.3f, " +
      f"8+mp: $lsh8mp%.3f, 16+mp: $lsh16mp%.3f; ivf nprobe=4: $ivf4%.3f, nprobe=8: $ivf8%.3f")
    // more tables / more probes only ADD candidates: recall is monotone
    assert(lsh16 >= lsh8, s"lsh16=$lsh16 < lsh8=$lsh8")
    assert(lsh8mp >= lsh8, s"lsh8mp=$lsh8mp < lsh8=$lsh8")
    assert(lsh16mp >= lsh16, s"lsh16mp=$lsh16mp < lsh16=$lsh16")
    assert(ivf8 >= ivf4, s"ivf8=$ivf8 < ivf4=$ivf4")
    // pinned floors for the serving-quality endpoints — honest measured
    // values minus a small margin, re-measured on this corpus
    assert(lsh16 >= 0.85, s"16-table LSH recall@10 = $lsh16")
    assert(lsh16mp >= 0.9, s"16-table Hamming-1 multiprobe LSH recall@10 = $lsh16mp")
    assert(ivf8 >= 0.6, s"nprobe=8 IVF recall@10 = $ivf8")
  }

  test("IVF with nprobe=4/16 cells achieves useful recall@10 vs brute force") {
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = bruteTop.map { case (q, exact) =>
      exact.count(ivf.getOrElse(q, Set.empty).contains).toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean IVF recall@10 = $mean")
  }

  test("srpPlanesFor holds expected bucket occupancy at the target across corpus sizes") {
    // the round-10 ladder corpus pair: 2k vectors -> 4 planes (occupancy
    // 125), 20k -> 8 (occupancy 78); growing 10x again adds ~log2(10)
    assert(Similarity.srpPlanesFor(2000) == 4)
    assert(Similarity.srpPlanesFor(20000) == 8)
    assert(Similarity.srpPlanesFor(200000) == 11)
    assert(Similarity.srpPlanesFor(0) == 1) // degenerate: never below 1 plane
    for (n <- Seq(1000L, 50000L, 1000000L, 1L << 40)) {
      val p = Similarity.srpPlanesFor(n)
      assert((n >> p) <= 128, s"occupancy above target at n=$n")
      assert(p == 1 || (n >> (p - 1)) > 128, s"planes overshot at n=$n")
    }
  }

  test("embeddingNearDupsAuto matches the fixed-planes operator at the rule's planes") {
    val auto = graft.operators.Dedup.embeddingNearDupsAuto(
      emb, "vec_id", "embedding", dim = 64, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = graft.operators.Dedup.embeddingNearDups(
      emb, "vec_id", "embedding", dim = 64, threshold = 0.4,
      planes = Similarity.srpPlanesFor(emb.count()), tables = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed && auto.nonEmpty)
  }

  test("ivfTopKAuto sizes nlist by cellsFor and keeps useful recall") {
    // 500 vectors at target 128 → nlist 4 (occupancy 125): the rule
    // picks a small quantizer for a small corpus, and the probe set
    // nprobe=4 then spans the whole index — recall can only beat the
    // fixed-16-cell pin above
    assert(graft.operators.SemDedup.cellsFor(emb.count()) == 4)
    val ivf = Similarity.ivfTopKAuto(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = bruteTop.map { case (q, exact) =>
      exact.count(ivf.getOrElse(q, Set.empty).contains).toDouble / exact.size
    }
    assert(recalls.sum / recalls.size >= 0.4,
      s"auto-sized IVF recall@10 = ${recalls.sum / recalls.size}")
  }

  test("ivfTopKAuto big-nlist branch: hier train + assign, exact dups found, loud SRP ceiling") {
    // targetCellSize = 1 on 4200 rows → nlist = 4200 > FlatAssignCeiling:
    // the r12 hierarchical branch (trainCentroidsHier +
    // assignCellsHierarchical on both sides). Identical vectors rank the
    // same coarse groups and fine cells, so a query that IS a corpus
    // vector must find its twin at cosine 1.0 even at occupancy ~1.
    val corpus = spark.range(0, 4200).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), d -> cast((pmod(xxhash64(id, d), 200) - 100) / 100.0 as float)) AS embedding")
    val qs = corpus.filter(org.apache.spark.sql.functions.col("vec_id") % 1000 === 7)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val got = Similarity.ivfTopKAuto(corpus, qs, "vec_id", "embedding",
        k = 3, targetCellSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.Caching.release()
    val byQuery = got.groupBy(_._1)
    qs.select("vec_id").collect().map(_.getLong(0)).foreach { q =>
      val hits = byQuery.getOrElse(q, Array.empty)
      assert(hits.exists { case (_, nb, cs) => nb == q - 100000 && cs >= 0.999999 },
        s"query $q did not find its identical twin")
    }
    // past HierAssignCeiling the index family must change — loud require
    val huge = spark.range(0, 10).selectExpr("id", "array(1.0f) AS v")
    val ex = intercept[IllegalArgumentException] {
      // fake a >8.4M corpus cheaply via a tiny target on a count that
      // overflows the ceiling: 10 rows can't, so call cellsFor directly
      require(graft.operators.SemDedup.cellsFor(9000000L) >
        graft.operators.SemDedup.HierAssignCeiling)
      Similarity.ivfTopKAuto(
        spark.range(0, 70000).selectExpr("id", "array(1.0f) AS v"),
        huge, "id", "v", k = 1, targetCellSize = 1)
    }
    assert(ex.getMessage.contains("SRP"))
  }

  test("ivfTopKFrozenHier: twin recall through the frozen two-level serving path") {
    // the q_ann_ivf_hier engine path with a spec-local frozen
    // hashCentroids quantizer past the flat ceiling: identical vectors
    // rank identical coarse groups and fine cells, so a query that IS a
    // corpus vector must surface its twin at cosine 1.0
    val cents = Similarity.hashCentroids(4100, 8, tag = "spec-hier")
    val corpus = spark.range(0, 2000).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), d -> cast((pmod(xxhash64(id, d), 200) - 100) / 100.0 as float)) AS embedding")
    val qs = corpus.filter(col("vec_id") % 400 === 3)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val got = Similarity.ivfTopKFrozenHier(corpus, qs, "vec_id", "embedding",
        k = 3, nprobe = 4, centroids = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    qs.select("vec_id").collect().map(_.getLong(0)).foreach { q =>
      assert(got.getOrElse(q, Array.empty).exists {
          case (_, nb, cs) => nb == q - 100000 && cs >= 0.999999 },
        s"query $q did not find its identical twin through the hier serving path")
    }
  }

  test("strideSample bounds the per-group materialization and stays spread") {
    // pass-through below the cap
    val small = Similarity.strideSample(
      (0 until 10).iterator.map(i => Array(i.toFloat)), 10L, 64)
    assert(small.length == 10)
    // a degenerate all-one-group assignment: 1M points, cap 128 — the
    // kept set must respect the cap AND be strided across the whole
    // group, not a prefix (localLloyd's spread seeding depends on it)
    val big = Similarity.strideSample(
      (0 until 1000000).iterator.map(i => Array(i.toFloat)), 1000000L, 128)
    assert(big.length <= 128 && big.length >= 120, s"kept ${big.length}")
    assert(big.head(0) == 0f && big.last(0) >= 900000f,
      s"stride did not span the group: last=${big.last(0)}")
  }

  test("trainCentroidsHier survives a degenerate coarse assignment on an unsampled frame") {
    // every vector sits in one tight cluster → the coarse quantizer
    // routes (nearly) the whole frame into one group; with the frame
    // 10× larger than 64·k the group must be subsampled, not
    // materialized wholesale — the r12 verdict memory-bound case
    val k = 8
    val n = 64 * k * 10
    val df = spark.range(0, n).selectExpr("id",
      "transform(sequence(0, 7), d -> cast(1.0 + pmod(xxhash64(id, d), 100) / 10000.0 as float)) AS v")
    val cents = Similarity.trainCentroidsHier(df, "v", k, seed = 7L)
    graft.Caching.release()
    assert(cents.size == k, s"expected $k centroids, got ${cents.size}")
    assert(cents.map(_._1).sorted == (0 until k), "cell ids must be 0..k-1")
    assert(cents.forall(_._2.length == 8))
  }

  test("hierarchical assignment: exact at full coarse fan-out, ≥90% agreement at 2 probes") {
    val cents = graft.operators.IvfCentroids.cells // k=16 → g=4 coarse groups
    val flat = Similarity.assignCells(emb, "vec_id", "embedding",
        "id", "v", 1, cents)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // coarseProbes = g probes EVERY group → the two-level assigner must
    // reproduce the flat assignment cell for cell
    val full = Similarity.assignCellsHierarchical(emb, "vec_id", "embedding",
        "id", "v", 1, cents, coarseProbes = 4)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(full == flat)
    // partial fan-out (2 of 4 groups) on RANDOM embeddings — the worst
    // case for any data-dependent routing (centroids near-equidistant,
    // coarse similarity barely informative; measured 0.77 here). Real
    // large-k corpora cluster, which is exactly when the hierarchy is
    // used; the floor pins "most rows still route to their flat cell"
    // plus totality — the exactness contract is the full-fan-out pin
    // above, and misrouted rows still land in their best PROBED cell.
    val two = Similarity.assignCellsHierarchical(emb, "vec_id", "embedding",
        "id", "v", 1, cents, coarseProbes = 2)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two.keySet == flat.keySet)
    val agree = flat.count { case (id, c) => two(id) == c }.toDouble / flat.size
    assert(agree >= 0.7, s"2-probe agreement with flat assignment = $agree")
  }

  test("recallAtK agrees with a driver-side recomputation and keeps recall-0 queries") {
    val approx = Similarity.ivfTopKFrozen(emb, queries, "vec_id", "embedding",
      k = 10, nprobe = 4)
    val out = Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10),
        approx, queries, "vec_id", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // every query appears exactly once, even if the index missed it entirely
    assert(out.keySet == bruteTop.keySet)
    val approxSets = approx.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    bruteTop.foreach { case (q, exact) =>
      val expected = exact.count(approxSets.getOrElse(q, Set.empty).contains)
      assert(out(q)._1 == expected.toLong, s"query $q hits")
      assert(out(q)._2 == expected / 10.0, s"query $q recall")
    }
  }

  test("recallAtK of a result against itself is 1.0 everywhere") {
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    val out = Similarity.recallAtK(brute, brute, queries, "vec_id", k = 10).collect()
    assert(out.nonEmpty && out.forall(_.getDouble(2) == 1.0))
  }

  test("embedding near-dup pairs: LSH+exact recovers high-cosine pairs") {
    import graft.operators.Dedup
    // ground truth: exact all-pairs cosine >= 0.9 (500x500 fine at sf0.001)
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val exact = a.join(b, col("id1") < col("id2"))
      .filter(Similarity.cosine(col("v1"), col("v2")) >= 0.4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 64, 0.4,
      planes = 4, tables = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives possible (exact cosine refilter); check recall
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"near-dup recall = $recall (${lsh.size}/${exact.size})")
    }
  }

  test("LSH buckets are deterministic across partitionings") {
    val b1 = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 64, 5, 4)
    val b2 = Similarity.lshTopK(emb.repartition(5), queries, "vec_id", "embedding", 64, 5, 4)
    assert(b1.exceptAll(b2).isEmpty && b2.exceptAll(b1).isEmpty)
  }

  test("int8 quantization: codes in [-127,127], dequant error within half a step") {
    import org.apache.spark.sql.functions._
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val bad = q.select(
      // worst per-element |x − q·maxabs/127| relative to the half-step maxabs/254
      aggregate(
        zip_with(col("embedding"), col("q8"), (x, c) =>
          abs(x.cast("double") - c.cast("double") * col("maxabs") / lit(127.0))),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"),
      col("maxabs"),
      array_max(transform(col("q8"), c => abs(c))).as("max_code"))
      .filter(col("max_code") > 127 ||
        col("max_err") > col("maxabs") / lit(254.0) + lit(1e-12))
    assert(bad.isEmpty)
  }

  test("int8 quantization: all-zero vector quantizes to zeros, not NaN") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val z = Seq((1L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val row = Similarity.quantizeInt8(z, "vec_id", "embedding").collect().head
    assert(row.getAs[Double]("maxabs") == 0.0)
    assert(row.getAs[scala.collection.Seq[Long]]("q8").forall(_ == 0L))
  }
}
