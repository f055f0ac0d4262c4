package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AssocRules, TopK}

/** Property suites from SURVEY §5.2: invariants over generated baskets,
  * including the permutation-invariance property the reference's own
  * Spark impl violates (§2.7 Q2). Drives scalacheck Gen directly with
  * fixed seeds (the scalatest bridge artifact isn't in the offline
  * dependency cache).
  */
class PropertySpec extends SparkSpec {

  /** Deterministic samples: one per seed. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g, 5).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val basketsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(5, 40)
    rows <- Gen.listOfN(n, for {
      bid <- Gen.choose(0L, 9L)
      item <- Gen.oneOf("a", "b", "c", "d", "e")
    } yield (bid, item))
  } yield rows

  test("rules: 0 < confidence <= 1, support <= confidence, pair symmetry") {
    import spark.implicits._
    forAll(basketsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("bid", "item")
        val rules = AssocRules.rules(df, "bid", "item").collect()
        val pc = rules.map(r => ((r.get(0), r.get(1)), r.getAs[Long]("pair_cnt"))).toMap
        rules.foreach { r =>
          val (s, c) = (r.getAs[Double]("support"), r.getAs[Double]("confidence"))
          assert(c > 0.0 && c <= 1.0 + 1e-15)
          assert(s <= c + 1e-15)
          assert(pc(((r.get(1), r.get(0)))) == r.getAs[Long]("pair_cnt"))
        }
      }
    }
  }

  test("top-k is invariant under input row permutation (the §2.7 Q2 property)") {
    import spark.implicits._
    forAll(basketsGen) { rows =>
      whenever(rows.nonEmpty) {
        def topOf(data: Seq[(Long, String)]) = {
          val counts = data.toDF("bid", "item").groupBy("item").agg(count(lit(1)).as("cnt"))
          TopK.perGroup(counts.withColumn("g", lit(1)), Seq(col("g")), col("cnt"),
            Seq(col("item")), 3).select("item", "cnt", "rn")
            .collect().map(_.toSeq).toSet
        }
        assert(topOf(rows) == topOf(scala.util.Random.shuffle(rows)))
      }
    }
  }

  test("sum of per-month item counts equals total exploded rows") {
    import spark.implicits._
    forAll(basketsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("bid", "item")
        val total = df.count()
        val summed = df.groupBy("bid", "item").agg(count(lit(1)).as("c"))
          .agg(sum(col("c"))).collect().head.getLong(0)
        assert(summed == total)
      }
    }
  }

  // random small-vocabulary docs: high collision rate, so containment,
  // equality, and near-miss prefixes all occur
  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 14)
    rows <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 8)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "ab"))
    } yield toks.mkString(" "))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("containmentPairs ≡ brute-force canonical substring containment (anchor ≥ anchorN only)") {
    import spark.implicits._
    val anchorN = 2
    forAll(docsGen) { rows =>
      val got = graft.operators.Dedup.containmentPairs(
        rows.toDF("doc_id", "text"), "doc_id", "text", anchorN = anchorN)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over the same canonicalization
      val canon = rows.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val want = (for {
        (ia, ta) <- canon if ta.size >= anchorN
        (ib, tb) <- canon
        if ia != ib
        if tb.size > ta.size || (tb.size == ta.size && ia < ib)
        if s" ${tb.mkString(" ")} ".contains(s" ${ta.mkString(" ")} ")
      } yield (ia, ib)).toSet
      assert(got == want, s"docs: $rows")
    }
  }

  test("packSequences ≡ brute-force sequential layout (offsets, bins, straddles)") {
    import spark.implicits._
    val budget = 4L
    val packGen: Gen[List[(Long, String, String)]] = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        grp <- Gen.oneOf("g1", "g2")
        len <- Gen.choose(0, 7)
      } yield (grp, List.fill(len)("w").mkString(" ")))
    } yield rows.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
    forAll(packGen) { rows =>
      val got = graft.operators.TextPipeline
        .packSequences(rows.toDF("doc_id", "grp", "text"), "doc_id", "grp", "text", budget)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
        .toMap
      // brute force: per group in id order, running offset
      val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
        var off = 0L
        grp.sortBy(_._1).map { case (id, _, t) =>
          val n = t.split("\\s+").count(_.nonEmpty).toLong
          val start = off; off += n
          val bin = start / budget
          val straddles = n > 0 && (start + n - 1) / budget != bin
          id -> ((n, start, bin, straddles))
        }
      }
      assert(got == want, s"docs: $rows")
    }
  }

  test("slidingChunks ≡ brute-force strided windows; every token covered") {
    import spark.implicits._
    val docGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 8)
      rows <- Gen.listOfN(n, Gen.choose(0, 23))
    } yield rows.zipWithIndex.map { case (len, i) =>
      (i.toLong, (1 to len).map(j => s"w$j").mkString(" "))
    }
    val (w, s) = (5, 2)
    forAll(docGen) { rows =>
      val got = graft.operators.TextPipeline
        .slidingChunks(rows.toDF("doc_id", "text"), "doc_id", "text", w, s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      val want = rows.flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val starts = if (toks.isEmpty) Seq.empty else 0 to (toks.length - 1) by s
        starts.zipWithIndex.map { case (st, ci) =>
          val slice = toks.slice(st, st + w)
          (id, ci.toLong) -> ((st.toLong, slice.length.toLong, slice.mkString(" ")))
        }
      }.toMap
      assert(got == want, s"docs: $rows")
      // coverage: each doc's chunks jointly span 0 .. n_tokens-1
      rows.foreach { case (id, t) =>
        val n = t.split("\\s+").count(_.nonEmpty)
        val covered = got.collect { case ((d, _), (st, len, _)) if d == id =>
          st until (st + len) }.flatten.toSet
        assert(covered == (0 until n).map(_.toLong).toSet, s"doc $id coverage")
      }
    }
  }

  test("sortedNeighborhoodPairs ≡ brute-force rank windows on random keys") {
    import spark.implicits._
    val keyedGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n, Gen.oneOf("ka", "kb", "kc", "kd"))
    } yield rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val w = 4
    forAll(keyedGen) { rows =>
      val got = graft.operators.Dedup
        .sortedNeighborhoodPairs(rows.toDF("doc_id", "k"), "doc_id", "k", w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      Caching.release()
      val ranked = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      val want = (for {
        (a, ra) <- ranked; (b, rb) <- ranked
        if rb > ra && rb - ra < w
      } yield (a._1, b._1, ra.toLong, rb.toLong)).toSet
      assert(got == want, s"rows: $rows")
    }
  }
}
