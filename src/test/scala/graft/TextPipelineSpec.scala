package graft

import org.apache.spark.sql.functions._
import graft.operators.{Splits, TextPipeline}

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- passageDedup ----------------------------------------------------

  test("q_doc_lm_score: scores in (0,1], one row per multi-token doc, masses consistent") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_doc_lm_score")(spark, sf001).collect()
    val multiTok = Tables.documents(spark, sf001)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 2).count()
    assert(rows.length == multiTok, "one row per doc with >= 2 tokens")
    rows.foreach { r =>
      val (n, pm, fm, s) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("pair_mass"),
        r.getAs[Long]("prefix_mass"), r.getAs[Double]("lm_score"))
      // each bigram contributes cnt <= w1_total, and cnt >= 1
      assert(n >= 1 && pm >= n && fm >= pm, s"masses inconsistent: n=$n pm=$pm fm=$fm")
      assert(s > 0.0 && s <= 1.0, s"score out of range: $s")
      assert(s == pm.toDouble / fm.toDouble)
    }
    graft.Caching.release()
  }

  test("passageDedup drops every copy of a repeated passage and reassembles in order") {
    val boiler = "b1 b2 b3" // 3-token boilerplate passage
    val d = docs(
      1L -> s"$boiler u1 u2 u3",
      2L -> s"$boiler v1 v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6")
    val out = TextPipeline.passageDedup(d, "doc_id", "text",
        passageTokens = 3, maxOccur = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the boilerplate passage occurs twice corpus-wide → both copies drop
    assert(out(1L) == ((2L, 1L, "u1 u2 u3")))
    assert(out(2L) == ((2L, 1L, "v1 v2 v3")))
    assert(out(3L) == ((2L, 2L, "w1 w2 w3 w4 w5 w6")))
  }

  test("passageDedup keeps a doc whose every passage was dropped (empty clean_text)") {
    val d = docs(1L -> "x1 x2 x3", 2L -> "x1 x2 x3")
    val out = TextPipeline.passageDedup(d, "doc_id", "text", 3, maxOccur = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((0L, "")))
    assert(out(2L) == ((0L, "")))
  }

  test("passageDedup reassembly preserves document order across many passages") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> words)
    val out = TextPipeline.passageDedup(d, "doc_id", "text", 4, maxOccur = 1).collect()(0)
    assert(out.getString(3) == words) // nothing repeated → identity, in order
    assert(out.getLong(1) == 8L)      // ceil(30/4)
  }

  // ---- decontaminate ---------------------------------------------------

  test("decontaminate flags exactly the training docs sharing an n-gram with eval") {
    val train = docs(
      10L -> "a b c d e",     // shares 3-gram "a b c" with eval doc 1
      11L -> "p q r s t",     // clean
      12L -> "x y z a b c")   // shares "a b c" too
    val eval = docs(1L -> "a b c q q")
    val out = TextPipeline.decontaminate(train, eval, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(10L, 12L))
    assert(out(10L) == ((1L, 1L)))
    assert(out(12L) == ((1L, 1L)))
  }

  test("decontaminate counts distinct shared shingles and distinct eval docs") {
    val train = docs(10L -> "a b c d e f") // 3-grams: abc bcd cde def
    val eval = docs(1L -> "a b c d", 2L -> "c d e f")
    // shared: abc, bcd (eval1), cde, def (eval2) → 4 shingles, 2 eval docs
    val out = TextPipeline.decontaminate(train, eval, "doc_id", "text", 3).collect()(0)
    assert((out.getLong(1), out.getLong(2)) == ((4L, 2L)))
  }

  // ---- repetitionSignals ----------------------------------------------

  test("repetitionSignals computes exact counts and ratios") {
    val d = docs(1L -> "a a a b", 2L -> "solo")
    val out = TextPipeline.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4L)             // n_tokens
    assert(r1.getLong(2) == 2L)             // n_distinct
    assert(r1.getDouble(3) == 0.5)          // distinct_ratio
    assert(r1.getLong(4) == 3L)             // top_token_cnt ("a")
    assert(r1.getDouble(5) == 0.75)         // top_token_frac
    assert(r1.getLong(6) == 3L)             // bigrams: "a a","a a","a b"
    assert(r1.getLong(7) == 2L)             // distinct bigrams
    assert(r1.getDouble(8) == 1.0 - 2.0 / 3.0)
    val r2 = out(2L)                        // single token: no bigrams
    assert(r2.getLong(6) == 0L && r2.getLong(7) == 0L && r2.getDouble(8) == 0.0)
  }

  // ---- chunk -----------------------------------------------------------

  test("chunk splits into fixed windows with a short remainder") {
    val d = docs(1L -> (1 to 7).map(i => s"t$i").mkString(" "))
    val out = TextPipeline.chunk(d, "doc_id", "text", chunkTokens = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq(
      (0L, 3L, "t1 t2 t3"), (1L, 3L, "t4 t5 t6"), (2L, 1L, "t7")))
  }

  test("chunk boundary: doc length an exact multiple of the window") {
    val d = docs(1L -> "a b c d")
    val out = TextPipeline.chunk(d, "doc_id", "text", 2).orderBy("chunk_idx").collect()
    assert(out.length == 2 && out.forall(_.getLong(2) == 2L))
  }

  test("chunk concatenation round-trips the token stream") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val out = TextPipeline.chunk(docs(1L -> text), "doc_id", "text", 5)
      .orderBy("chunk_idx").collect().map(_.getString(3)).mkString(" ")
    assert(out == text)
  }

  // ---- slidingChunks ---------------------------------------------------

  test("slidingChunks overlaps by window - stride and covers every token") {
    val d = docs(1L -> (1 to 10).map(i => s"t$i").mkString(" "))
    val out = TextPipeline.slidingChunks(d, "doc_id", "text",
        windowTokens = 4, strideTokens = 2)
      .orderBy("chunk_idx").collect()
    // starts 0,2,4,6,8: last start is the largest multiple of 2 below 10
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"), (1L, 2L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, 4L, "t5 t6 t7 t8"), (3L, 6L, 4L, "t7 t8 t9 t10"),
      (4L, 8L, 2L, "t9 t10")))
  }

  test("slidingChunks with stride = window degrades to chunk's tiling") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val slid = TextPipeline.slidingChunks(docs(1L -> text), "doc_id", "text", 5, 5)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getString(4))).toSeq
    val tiled = TextPipeline.chunk(docs(1L -> text), "doc_id", "text", 5)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(slid == tiled)
  }

  test("slidingChunks emits nothing for empty docs and one window for short docs") {
    val d = docs(1L -> "   ", 2L -> "only two")
    val out = TextPipeline.slidingChunks(d, "doc_id", "text", 8, 4).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.length == 1 && out(0).getLong(3) == 2L && out(0).getString(4) == "only two")
  }

  // ---- stratifiedSample ------------------------------------------------

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("lang"))
    val s1 = Splits.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 2000), defaultPermyriad = 8000, salt = "s")
    val s2 = Splits.stratifiedSample(d.repartition(5), "doc_id", "lang",
      Map("en" -> 2000), defaultPermyriad = 8000, salt = "s")
    assert(s1.orderBy("doc_id").collect().toSeq == s2.orderBy("doc_id").collect().toSeq)
    // a kept row's fate never depends on other rows: sampling a subset
    // keeps exactly the intersection
    val subset = Splits.stratifiedSample(d.filter(col("doc_id") < 25), "doc_id", "lang",
      Map("en" -> 2000), defaultPermyriad = 8000, salt = "s")
    assert(subset.collect().map(_.getLong(0)).toSet ==
      s1.filter(col("doc_id") < 25).collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample rate 0 drops the stratum; rate 10000 keeps it whole") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("lang"))
    val out = Splits.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 0), defaultPermyriad = 10000, salt = "s")
    assert(out.filter(col("lang") === "en").count() == 0)
    assert(out.count() == d.filter(col("lang") =!= "en").count())
  }

  // ---- capTokenBudget --------------------------------------------------

  test("capTokenBudget keeps a stable hash-ordered prefix per group") {
    val d = Seq(
      (1L, "s1", "a b c"),        // 3 tokens
      (2L, "s1", "d e f g"),      // 4
      (3L, "s1", "h i"),          // 2
      (4L, "s2", "x y z w v"))    // 5
      .toDF("doc_id", "source", "text")
    val out = TextPipeline.capTokenBudget(d, "doc_id", "source", "text",
      budget = 5L, salt = "s")
    // per group: docs admitted in hash order while cum <= 5; determinism
    // under repartitioning
    val a = out.orderBy("doc_id").collect().toSeq
    val b = TextPipeline.capTokenBudget(d.repartition(3), "doc_id", "source",
      "text", budget = 5L, salt = "s").orderBy("doc_id").collect().toSeq
    assert(a == b)
    // s2's single 5-token doc fits exactly
    assert(out.filter(col("source") === "s2").count() == 1)
    // every kept row satisfies the cap and cum_tokens is consistent
    out.collect().foreach { r =>
      assert(r.getAs[Long]("cum_tokens") <= 5L)
      assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("cum_tokens"))
    }
  }

  test("capTokenBudgetSalted equals capTokenBudget row for row, windows split by sub-key") {
    // a skewed mixture: one dominant source with 200 docs, two small
    // ones — the input class the salted path exists for. The contract
    // is BIT-IDENTICAL output (id set AND cum_tokens), because the
    // sub-buckets are RANGE buckets of the order hash and the offset
    // pass restores the global group prefix exactly.
    // the NULL-source rows pin group parity: the plain path's window
    // (and DuckDB's PARTITION BY) keep NULL as a real budget group, so
    // the salted offset join must be null-SAFE — a using-column join
    // dropped these rows silently (r13 review; driver data can't catch
    // it, documents.source is never NULL)
    val docs = ((1 to 200).map(i => (Some(i.toLong), Some("dominant"), s"w$i x$i y$i")) ++
      Seq((Some(900L), Some("s2"), "a b c d"), (Some(901L), Some("s2"), "e f"),
        (Some(950L), Some("s3"), "p q r"),
        (Some(960L), None, "n1 n2 n3"), (Some(961L), None, "n4")))
      .toDF("doc_id", "source", "text")
    for (budget <- Seq(0L, 7L, 100L, 10000L); subKeys <- Seq(1, 4, 32)) {
      val plain = TextPipeline.capTokenBudget(docs, "doc_id", "source", "text",
          budget, "sp").select("doc_id", "source", "n_tokens", "cum_tokens")
      val salted = TextPipeline.capTokenBudgetSalted(docs, "doc_id", "source",
          "text", budget, "sp", subKeys)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted(subKeys=$subKeys) diverged from plain at budget=$budget")
      // parity must be non-vacuous on the NULL group: at any budget
      // covering it, BOTH paths keep the NULL-source rows (if both
      // dropped them, exceptAll-parity alone would pass silently)
      if (budget >= 10000L)
        assert(salted.filter(col("source").isNull).count() == 2,
          s"NULL-group rows missing from salted output (subKeys=$subKeys)")
    }
    // plan pin: the running-sum window must partition by (source, _sub)
    // — the whole point is that the dominant group's sort is no longer
    // one task — and the offset pass must be the only group-only window
    val plan = TextPipeline.capTokenBudgetSalted(docs, "doc_id", "source",
      "text", 100L, "sp", 32).queryExecution.executedPlan.toString
    // match the order column too: the offsets window ALSO prints as
    // windowspecdefinition(source, _sub ...) (partition source, ORDER BY
    // _sub), so without `_h` the pin would pass even if the running sum
    // regressed to a group-only partition (r13 review)
    assert("windowspecdefinition\\(source#\\d+, _sub#\\d+L, _h#".r.findFirstIn(plan).isDefined,
      s"running sum no longer windows on (source, _sub) ordered by _h:\n$plan")
    // the salted path persistTracks its narrow projection per call —
    // release what the 13 invocations above accumulated (the
    // session-lifetime discipline: every persist needs a release owner)
    graft.Caching.release()
  }

  test("capTokenBudget budget 0 drops everything; huge budget keeps everything") {
    val d = Seq((1L, "s", "a b"), (2L, "s", "c")).toDF("doc_id", "source", "text")
    assert(TextPipeline.capTokenBudget(d, "doc_id", "source", "text", 0L, "s").count() == 0)
    assert(TextPipeline.capTokenBudget(d, "doc_id", "source", "text", 1000L, "s").count() == 2)
  }

  // ---- resampleByWeight ------------------------------------------------

  test("resampleByWeight replicates by integer weight exactly") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = Splits.resampleByWeight(d, "doc_id", "source",
      Map("a" -> 30000), defaultPermyriad = 10000, salt = "s")
    // 3x: every 'a' doc exactly 3 copies with copy_idx 1..3
    val a = out.filter(col("source") === "a").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap ==
      Map(1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L)))
    assert(out.filter(col("source") === "b").count() == 1)
  }

  test("resampleByWeight fractional weight keeps a stable hash-chosen subset") {
    val d = (1L to 200L).map(i => (i, "x")).toDF("doc_id", "source")
    val out = Splits.resampleByWeight(d, "doc_id", "source",
      Map("x" -> 5000), defaultPermyriad = 10000, salt = "s")
    val n = out.count()
    assert(n > 60 && n < 140) // ~100 of 200 at 0.5x
    // deterministic under re-run and repartition
    val n2 = Splits.resampleByWeight(d.repartition(7), "doc_id", "source",
      Map("x" -> 5000), 10000, "s").count()
    assert(n == n2)
    // weight 0 drops the stratum entirely
    assert(Splits.resampleByWeight(d, "doc_id", "source",
      Map("x" -> 0), 10000, "s").count() == 0)
  }

  // ---- ngramJaccardAgainst ---------------------------------------------

  test("ngramJaccardAgainst scores new docs against the corpus only") {
    val corpus = docs(1L -> "a b c d e", 2L -> "p q r s t")
    val nw = docs(
      10L -> "a b c d e",  // exact dup of corpus doc 1
      11L -> "zz yy xx ww vv") // novel
    val out = graft.operators.Dedup.ngramJaccardAgainst(
        corpus, nw, "doc_id", "text", shingleN = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(5)))
    assert(out.toSeq == Seq((10L, 1L, 1.0)))
  }

  test("ngramJaccardAgainst never pairs new docs with each other") {
    val corpus = docs(1L -> "completely different words here now")
    val nw = docs(10L -> "a b c d e", 11L -> "a b c d e") // dups of each other
    val out = graft.operators.Dedup.ngramJaccardAgainst(
      corpus, nw, "doc_id", "text", 3, minJaccard = 0.1)
    assert(out.count() == 0) // new-new duplication is the FULL pass's job
  }

  test("stratifiedSample rejects out-of-range rates") {
    val d = Tables.documents(spark, sf001)
    intercept[IllegalArgumentException] {
      Splits.stratifiedSample(d, "doc_id", "lang", Map("en" -> 10001), 100, "s")
    }
  }

  // ---- decontaminateAgainstLarge / packSequences / leakage-safe split --

  test("decontaminateAgainstLarge ≡ decontaminate (bloom prefilter is invisible in the result)") {
    val all = Tables.documents(spark, sf001)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    val ref = all.filter(col("doc_id") % 7 === 0)
    val exact = TextPipeline.decontaminate(train, ref, "doc_id", "text", 3)
      .withColumnRenamed("n_eval_docs", "n_ref_docs")
    // deliberately undersized bloom → false positives exercised
    val bloomed = TextPipeline.decontaminateAgainstLarge(
      train, ref, "doc_id", "text", 3, expectedItems = 4L)
    assert(bloomed.count() == exact.count())
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }

  test("packSequences: bins, offsets, and straddle flags from hand-counted tokens") {
    val d = Seq(
      (1L, "g1", "a b c"),        // 3 toks, start 0, bin 0
      (2L, "g1", "d e f g"),      // 4 toks, start 3, bin 0, straddles (3+4-1=6 → 6//5=1)
      (3L, "g1", "h i"),          // 2 toks, start 7, bin 1
      (4L, "g2", "x y z w v u t") // 7 toks > budget, start 0, bin 0, straddles
    ).toDF("doc_id", "grp", "text")
    val out = TextPipeline.packSequences(d, "doc_id", "grp", "text", budget = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((3L, 0L, 0L, false)))
    assert(out(2L) == ((4L, 3L, 0L, true)))
    assert(out(3L) == ((2L, 7L, 1L, false)))
    assert(out(4L) == ((7L, 0L, 0L, true)))
  }

  test("packSequences: empty doc occupies no tokens and never straddles") {
    val d = Seq((1L, "g", "a b c d e"), (2L, "g", " "), (3L, "g", "f")).toDF("doc_id", "grp", "text")
    val out = TextPipeline.packSequences(d, "doc_id", "grp", "text", budget = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(2L) == ((0L, 5L, 1L, false))) // zero-width at the cut, no straddle
    assert(out(3L) == ((1L, 5L, 1L, false)))
  }

  // ---- containmentPairs --------------------------------------------------

  test("containmentPairs finds a doc embedded whole in a longer one") {
    val d = docs(
      1L -> "b c d",
      2L -> "a b c d e f",   // contains doc 1
      3L -> "x y z w q")     // unrelated
    val out = graft.operators.Dedup.containmentPairs(d, "doc_id", "text", anchorN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("containmentPairs token-boundary guard: prefix-token overlap is not containment") {
    // anchor matches ('ab'), but 'cd' vs 'cde' differ past a boundary
    val d = docs(1L -> "ab cd", 2L -> "x ab cde y z")
    assert(graft.operators.Dedup.containmentPairs(d, "doc_id", "text", anchorN = 1).isEmpty)
  }

  test("containmentPairs emits equal texts once, canonically") {
    val d = docs(7L -> "a b c", 4L -> "a b c")
    val out = graft.operators.Dedup.containmentPairs(d, "doc_id", "text", anchorN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((4L, 7L)))
  }

  test("containmentPairs maxAnchorDf caps boilerplate-opener postings") {
    // every doc opens with the same 2 tokens → anchor df = 4; cap 2 kills all
    val d = docs(
      1L -> "same open a",
      2L -> "same open a b",
      3L -> "same open c",
      4L -> "same open c d")
    val capped = graft.operators.Dedup.containmentPairs(d, "doc_id", "text",
      anchorN = 2, maxAnchorDf = Some(2))
    assert(capped.isEmpty)
    val uncapped = graft.operators.Dedup.containmentPairs(d, "doc_id", "text", anchorN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (3L, 4L)))
  }

  test("leakage-safe split: every member of a near-dup cluster lands in the SAME split") {
    val out = SparkEntry.queries("q_split_leakage_safe")(spark, sf001)
    val violations = out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(violations.isEmpty)
    // and the mix is roughly 80/10/10 (singleton-dominated corpus)
    val n = out.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.6 && train / n < 0.95)
  }

  test("capTokenBudget and packSequences drop NULL ids (reproducible-layout contract)") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), "g", "a b c"),
      (Option.empty[Long], "g", "x y z"),   // NULL id: order among NULL peers
      (Some(2L), "g", "d e")).toDF("id", "grp", "text")
    val capped = TextPipeline.capTokenBudget(docs, "id", "grp", "text",
      budget = 100L, salt = "s")
    assert(capped.filter(col("id").isNull).isEmpty)
    assert(capped.count() == 2)
    val packed = TextPipeline.packSequences(docs, "id", "grp", "text", budget = 4L)
    assert(packed.filter(col("id").isNull).isEmpty)
    assert(packed.count() == 2)
    // and the surviving layout is the null-free one, not shifted by it
    val offs = packed.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(offs == Map(1L -> 0L, 2L -> 3L))
  }

  test("qualityClassifier: totality, JVM-replay exactness, repartition invariance") {
    import spark.implicits._
    import graft.functions.{QualityWeights => QW}
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a good day for the dog"),
      (2L, "xxxxx yyyyy zzzzz qqqqq wwwww"),
      (3L, ""), (4L, "   "),                       // zero-token docs stay
      (5L, "the the the the")).toDF("doc_id", "text")
    val out = TextPipeline.qualityClassifier(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "total over empty docs")
    val bD = QW.biasFp.toDouble / 1e6
    assert(out(3L) == ((0L, 0L, bD, if (bD >= 0) 1L else 0L)))
    assert(out(4L)._3 == bD)
    // bit-exact JVM replay of the fixed-point model (the serving contract)
    def replay(text: String): (Long, Long, Double) = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val s = toks.map(t => QW.weightsFp(
        (graft.functions.PortableHash60.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)) % QW.D).toInt)).sum
      val logit = if (toks.isEmpty) bD else bD + s.toDouble / 1e6 / toks.length
      (s, toks.length.toLong, logit)
    }
    Seq(1L -> "the cat sat on the mat and it is a good day for the dog",
        5L -> "the the the the").foreach { case (id, text) =>
      val (s, n, logit) = replay(text)
      assert(out(id) == ((s, n, logit, if (logit >= 0) 1L else 0L)), s"doc $id")
    }
    // stopword-heavy text scores above gibberish (the distilled signal)
    assert(out(1L)._3 > out(2L)._3)
    // integer dot product ⇒ identical under any partitioning
    val re = TextPipeline.qualityClassifier(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(re == out)
  }
}
