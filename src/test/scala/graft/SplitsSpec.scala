package graft

import org.apache.spark.sql.functions._
import graft.operators.Splits

class SplitsSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf001).select(col("doc_id"))

  test("split assignment is stable under repartitioning and re-runs") {
    val a = Splits.assign(docs, "doc_id", "s1").orderBy("doc_id").collect()
    val b = Splits.assign(docs.repartition(7), "doc_id", "s1").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("splits are disjoint, exhaustive, and roughly proportioned") {
    val counts = Splits.assign(docs, "doc_id", "s1", trainPct = 80, validPct = 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == docs.count())
    assert(counts.keySet == Set("train", "valid", "test"))
    // md5 buckets over ~50 ids (sf0.001): generous tolerance, the point
    // is gross proportion, not exactness
    assert(counts("train").toDouble / n > 0.6 && counts("train").toDouble / n < 0.95)
  }

  test("changing the salt re-rolls the split") {
    val a = Splits.assign(docs, "doc_id", "s1").select("doc_id", "split")
    val b = Splits.assign(docs, "doc_id", "s2").select("doc_id", "split")
    assert(a.exceptAll(b).count() > 0) // at least one row moved
  }

  test("degenerate percentages are rejected") {
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "doc_id", "s1", trainPct = 90, validPct = 10)
    }
  }

  test("PPS sampling draws exactly k slots per stratum") {
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text"))
    val draws = Splits.samplePps(d, "doc_id", "source",
        size(graft.functions.TextFns.tokens(col("text"))), k = 10, salt = "s1")
      .groupBy("source").agg(sum(col("n_draws")).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = d.select("source").distinct().count()
    assert(draws.size == strata)
    assert(draws.values.forall(_ == 10L), s"uneven strata: $draws")
  }

  test("PPS sampling is stable under repartitioning") {
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text"))
    val w = size(graft.functions.TextFns.tokens(col("text")))
    val a = Splits.samplePps(d, "doc_id", "source", w, 10, "s1")
      .select("doc_id", "n_draws").orderBy("doc_id").collect()
    val b = Splits.samplePps(d.repartition(7), "doc_id", "source", w, 10, "s1")
      .select("doc_id", "n_draws").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("PPS certainty items: a dominant weight is drawn with multiplicity") {
    import spark.implicits._
    // one row owns 90% of the stratum's weight: with k=10 slots of size
    // W/10 it must swallow ~9 boundaries; light rows share the rest
    val d = (Seq((1L, "g", 900L)) ++ (2L to 11L).map(i => (i, "g", 10L)))
      .toDF("id", "grp", "w")
    val out = Splits.samplePps(d, "id", "grp", col("w"), k = 10, salt = "s1")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_draws")).toMap
    assert(out.values.sum == 10L)
    assert(out(1L) >= 8L, s"heavy item under-drawn: $out")
  }

  test("negative sampling: k per anchor minus self-hits, no self pairs, in-corpus") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"))
    val negs = Splits.negativeSample(
      Tables.documents(spark, sf001), "doc_id", k = 4, salt = "s1")
    val n = d.count()
    val rows = negs.collect()
    assert(rows.length <= n * 4 && rows.length > n * 3) // shortfall only from self-hits
    assert(rows.forall(r => r.getAs[Long]("anchor_id") != r.getAs[Long]("neg_id")))
    val ids = d.collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => ids.contains(r.getAs[Long]("neg_id"))))
    // every anchor appears with ≥ 3 of its 4 slots
    val perAnchor = rows.groupBy(_.getAs[Long]("anchor_id")).map(_._2.length)
    assert(perAnchor.size == n && perAnchor.forall(_ >= 3))
  }

  test("negative sampling is stable under repartitioning, re-rolls on salt") {
    val d = Tables.documents(spark, sf001)
    val a = Splits.negativeSample(d, "doc_id", 4, "s1")
      .orderBy("anchor_id", "slot").collect()
    val b = Splits.negativeSample(d.repartition(7), "doc_id", 4, "s1")
      .orderBy("anchor_id", "slot").collect()
    assert(a.toSeq == b.toSeq)
    val c = Splits.negativeSample(d, "doc_id", 4, "s2")
      .orderBy("anchor_id", "slot").collect()
    assert(a.toSeq != c.toSeq)
  }

  test("PPS drops non-positive weights and all-zero strata entirely") {
    import spark.implicits._
    val d = Seq((1L, "a", 5L), (2L, "a", 0L), (3L, "z", 0L))
      .toDF("id", "grp", "w")
    val out = Splits.samplePps(d, "id", "grp", col("w"), k = 3, salt = "s1")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_draws")).toMap
    assert(out == Map(1L -> 3L)) // zero-weight rows and the empty stratum vanish
  }

  test("null ids are dropped uniformly, never silently routed to a split") {
    import spark.implicits._
    val d = Seq(Some(1L), Some(2L), Option.empty[Long]).toDF("id")
      .withColumn("grp", lit("a"))
    val assigned = Splits.assign(d, "id", "s1")
    assert(assigned.count() == 2 && assigned.filter(col("id").isNull).count() == 0)
    val resampled = Splits.resampleByWeight(d, "id", "grp",
      Map("a" -> 20000), 10000, "s1")
    assert(resampled.filter(col("id").isNull).count() == 0)
    val negs = Splits.negativeSample(d, "id", k = 2, salt = "s1")
    Caching.release()
    assert(negs.filter(col("anchor_id").isNull || col("neg_id").isNull).count() == 0)
  }

  test("PPS keeps the sum-of-draws = k invariant under DUPLICATE ids") {
    import spark.implicits._
    // two physical rows share id 7: under a RANGE cumulative frame they
    // tie on (h, id), share one _cum, and the telescoping sum breaks
    val d = Seq((7L, "a", 1L), (7L, "a", 1L), (8L, "a", 1L), (9L, "a", 1L))
      .toDF("id", "grp", "w")
    val total = Splits.samplePps(d, "id", "grp", col("w"), k = 4, salt = "s1")
      .agg(sum("n_draws")).collect()(0).getLong(0)
    assert(total == 4L)
  }

  test("PPS supersedes an input column named 'weight' instead of duplicating it") {
    import spark.implicits._
    val d = Seq((1L, "a", 5L), (2L, "a", 3L)).toDF("id", "grp", "weight")
    val out = Splits.samplePps(d, "id", "grp", col("weight"), k = 2, salt = "s1")
    assert(out.columns.count(_ == "weight") == 1)
    out.select("weight").collect() // would throw AMBIGUOUS_REFERENCE before
  }

  test("PPS rejects fractional weight columns loudly") {
    import spark.implicits._
    val d = Seq((1L, "a", 0.9)).toDF("id", "grp", "w")
    intercept[IllegalArgumentException] {
      Splits.samplePps(d, "id", "grp", col("w"), k = 1, salt = "s1")
    }
  }

  test("negativeSample's two-level-scan rank matches a sequential rank draw") {
    import spark.implicits._
    val ids = Seq(5L, 11L, 2L, 42L, 7L, 30L)
    val d = ids.toDF("doc_id")
    val got = Splits.negativeSample(d, "doc_id", k = 3, salt = "s9")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Caching.release()
    val sorted = ids.sorted
    val want = (for {
      a <- ids; s <- 1 to 3
      h = graft.streaming.StreamingOps.portableHash64Jvm(s"s9:$a:$s")
      neg = sorted(((h % ids.length) + 1 - 1).toInt)
      if neg != a
    } yield (a, s.toLong) -> neg).toMap
    assert(got == want)
  }
}
