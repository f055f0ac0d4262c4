package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cms, Hll, Kmv}

/** Portable HLL + count-min sketch invariants: the properties a row
  * hash cannot see (mergeability, one-sided error, register bounds)
  * plus measured error floors on real data.
  */
class SketchCardSpec extends SparkSpec {
  import spark.implicits._

  test("Hll: register state bounded, estimate within 15% at real cardinality") {
    val li = Tables.lineitem(spark, sf001)
    val regs = Hll.registers(li, Seq("l_returnflag"), col("l_orderkey"))
    val bad = regs.filter(col("reg") < 0 || col("reg") >= Hll.M ||
      col("mx") < 1 || col("mx") > 55).count()
    assert(bad == 0, "register index or rho out of bounds")
    val joined = Hll.estimate(regs, Seq("l_returnflag"))
      .join(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact")), Seq("l_returnflag"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_exact"); val a = r.getAs[Double]("hll_estimate")
      // raw HLL at m=64 is ±1.04/√64 ≈ 13% (1σ); measured ≤3.2% at
      // sf0.01 — gate at 15%, honest to the sketch's design error
      assert(math.abs(a - e) <= 0.15 * e, s"${r.get(0)}: exact=$e est=$a")
    }
  }

  test("Hll: shard merge ≡ direct sketch (max is associative + idempotent)") {
    val li = Tables.lineitem(spark, sf001)
    val shardA = li.filter(col("l_orderkey") % 2 === 0)
    val shardB = li.filter(col("l_orderkey") % 2 =!= 0)
    val merged = Hll.merge(
      Hll.registers(shardA, Seq("l_returnflag"), col("l_orderkey")),
      Hll.registers(shardB, Seq("l_returnflag"), col("l_orderkey")),
      Seq("l_returnflag"))
    val direct = Hll.registers(li, Seq("l_returnflag"), col("l_orderkey"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged shard registers diverge from the direct sketch")
  }

  test("Cms: estimate ≥ exact for every item; exact on a collision-free set") {
    val df = (1L to 500L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i)).toDF("k")
    val sketch = Cms.counters(df, col("k"))
    val est = Cms.pointEstimates(sketch, df.select(col("k")).distinct(), "k")
    val joined = df.groupBy(col("k")).agg(count(lit(1)).as("n")).join(est, Seq("k"))
    assert(joined.filter(col("cms_estimate") < col("n")).count() == 0,
      "CMS undercounted — violates the one-sided guarantee")
    // 500 items in 4×2048 buckets: expect ≥95% collision-free rows
    val exactFrac = joined.filter(col("cms_estimate") === col("n")).count() / 500.0
    assert(exactFrac >= 0.95, s"only $exactFrac of estimates exact")
  }

  test("Cms: unseen items get a row and (on a sparse sketch) estimate 0") {
    // 10 sketched items in 8192 counters → an unseen item's 4 buckets
    // are overwhelmingly likely all empty; the membership-probe shape
    // must answer 0, not drop the item or return an occupied bucket
    val sketch = Cms.counters((1L to 10L).toDF("k"), col("k"))
    val probes = (1001L to 1100L).toDF("k")
    val est = Cms.pointEstimates(sketch, probes, "k")
    assert(est.count() == 100L, "every probed item must get an estimate row")
    assert(est.filter(col("cms_estimate") === 0L).count() >= 95L,
      "unseen items on a near-empty sketch should estimate 0")
    assert(est.filter(col("cms_estimate") < 0L).count() == 0L)
  }

  test("Cms: NULL probes are dropped — NULL is not an item, not a 'never seen' 0") {
    // the NULL hash misses every counter row and would coalesce to a
    // fabricated estimate-0 row; counters() already refuses NULL items,
    // pointEstimates must mirror it (ADVICE r12 — a corner both engines
    // replay identically, so only a fixture can pin it)
    val sketch = Cms.counters((1L to 10L).toDF("k"), col("k"))
    val probes = Seq(Some(1L), None, Some(2L)).toDF("k")
    val est = Cms.pointEstimates(sketch, probes, "k").collect()
    assert(est.length == 2, s"NULL probe produced a row: ${est.mkString(",")}")
    assert(est.forall(r => !r.isNullAt(0)))
  }

  test("Kmv: overlap keeps every tag pair — empty θ*-samples report zeros, not vanish") {
    // single-member sets: each sketch is one hash, so NO hash is below
    // θ* on either side of any pair — the inner-join formulation
    // dropped all three pairs silently
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("tag", "v")
    val ov = Kmv.overlap(Kmv.sketch(df, Seq("tag"), col("v")), "tag")
    val rows = ov.orderBy(col("tag_a"), col("tag_b")).collect()
    assert(rows.length == 3, s"expected all 3 tag pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_common")) == 0L)
      assert(r.getLong(r.fieldIndex("n_either")) == 0L)
      assert(r.isNullAt(r.fieldIndex("jaccard_est")),
        "0/0 jaccard must be NULL (no evidence), not NaN")
    }
  }

  test("Kmv: sketch bounded at K, exact below K, estimate within 15% above it") {
    val li = Tables.lineitem(spark, sf001)
    val sk = Kmv.sketch(li, Seq("l_returnflag"), col("l_orderkey"))
    val sizes = sk.groupBy(col("l_returnflag")).count().collect()
    assert(sizes.forall(_.getAs[Long]("count") <= Kmv.K))
    // small set → sketch is the whole set and the estimate is exact
    val small = (1L to 100L).toDF("k").withColumn("g", lit("x"))
    val se = Kmv.estimateDistinct(
      Kmv.sketch(small, Seq("g"), col("k")), Seq("g")).collect().head
    assert(se.getAs[Long]("n_sk") == 100 && se.getAs[Double]("kmv_estimate") == 100.0)
    // real cardinality (~1.1k per flag at sf0.001) → unbiased ±1/√(k−2)
    val joined = Kmv.estimateDistinct(sk, Seq("l_returnflag"))
      .join(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact")), Seq("l_returnflag"))
      .collect()
    joined.foreach { r =>
      val e = r.getAs[Long]("n_exact"); val a = r.getAs[Double]("kmv_estimate")
      assert(math.abs(a - e) <= 0.15 * e, s"${r.get(0)}: exact=$e est=$a")
    }
  }

  test("Kmv: shard sketches merge by re-trimming the union of hash lists") {
    val li = Tables.lineitem(spark, sf001)
    def trim(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TopK.perGroupNative(
        df.withColumn("negh", -col("h")), Seq("l_returnflag"), "negh",
        Seq.empty, Kmv.K).drop("negh")
    val merged = trim(
      Kmv.sketch(li.filter(col("l_orderkey") % 2 === 0), Seq("l_returnflag"), col("l_orderkey"))
        .unionByName(Kmv.sketch(li.filter(col("l_orderkey") % 2 =!= 0),
          Seq("l_returnflag"), col("l_orderkey")))
        .distinct())
    val direct = Kmv.sketch(li, Seq("l_returnflag"), col("l_orderkey"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "re-trimmed shard union diverges from the direct sketch")
  }

  test("Kmv: pairwise overlap estimates track exact set algebra") {
    val li = Tables.lineitem(spark, sf001)
    val ov = Kmv.overlap(
      Kmv.sketch(li, Seq("l_returnflag"), col("l_orderkey")), "l_returnflag")
      .collect()
    assert(ov.length == 3, s"expected 3 flag pairs, got ${ov.length}")
    val sets = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    ov.foreach { r =>
      val a = sets(r.getAs[String]("tag_a")); val b = sets(r.getAs[String]("tag_b"))
      val exactJ = (a & b).size.toDouble / (a | b).size
      val exactI = (a & b).size.toDouble
      assert(math.abs(r.getAs[Double]("jaccard_est") - exactJ) <= 0.15,
        s"jaccard ${r.getAs[Double]("jaccard_est")} vs exact $exactJ")
      assert(math.abs(r.getAs[Double]("inter_est") - exactI) <= 0.25 * exactI,
        s"intersection ${r.getAs[Double]("inter_est")} vs exact $exactI")
    }
  }

  test("all three sketches ignore NULL values (count-distinct semantics)") {
    // a NULL value used to surface as a NULL register/slot/bucket row:
    // Hll's regs_hit inflated while the harmonic sum skipped it, Kmv's
    // n_sk and theta disagreed by one, Cms carried d dead counters
    val clean = (1L to 300L).map(Option(_)).toDF("k")
    val dirty = ((1L to 300L).map(Option(_)) ++ Seq.fill(5)(Option.empty[Long])).toDF("k")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Hll.cardinality(dirty, Seq.empty, col("k"))) ==
      rows(Hll.cardinality(clean, Seq.empty, col("k"))))
    assert(rows(Kmv.estimateDistinct(Kmv.sketch(dirty, Seq.empty, col("k")), Seq.empty)) ==
      rows(Kmv.estimateDistinct(Kmv.sketch(clean, Seq.empty, col("k")), Seq.empty)))
    assert(rows(Cms.counters(dirty, col("k"))) == rows(Cms.counters(clean, col("k"))))
  }

  test("Cms: shard sketches merge by summing counters") {
    val df = (1L to 300L).toDF("k")
    val a = Cms.counters(df.filter(col("k") <= 150), col("k"))
    val b = Cms.counters(df.filter(col("k") > 150), col("k"))
    val merged = a.unionByName(b)
      .groupBy(col("seed"), col("bucket")).agg(sum(col("c")).as("c"))
    val direct = Cms.counters(df, col("k"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "summed shard counters diverge from the direct sketch")
  }
}
