package graft

import org.apache.spark.sql.functions._
import graft.operators.{AssocRules, TopK}
import graft.sources.BillingReader

/** Golden micro-fixture from FIXTURES.md §4 — all three reference queries
  * hand-verified, plus the ingest edge cases of FIXTURES.md §1–2.
  */
class BillingGoldenSpec extends SparkSpec {

  // FIXTURES.md §4 (6 baskets, 2 months) + edge cases: empty line,
  // duplicate item in basket, singleton basket, non-padded date.
  lazy val goldenPath: String = fixtureFile("golden.txt",
    """2015-1-1,pane,latte
      |2015-1-2,pane,latte,uova
      |2015-1-3,pane
      |2015-2-1,latte
      |2015-2-2,latte,uova
      |2015-2-3,pane,latte
      |""".stripMargin)

  test("dialect A ingest: empty lines dropped, dups deduped, y-M-d dates") {
    val path = fixtureFile("edge.txt",
      "2015-3-7,pane,burro,latte\n\n2015-11-2,latte,latte\n2015-1-20,latte\n")
    val df = BillingReader.dialectA(spark, path)
    val rows = df.orderBy("date").collect()
    assert(rows.length == 3) // blank line dropped
    assert(rows(0).getAs[java.sql.Date]("date").toString == "2015-01-20")
    assert(rows(1).getAs[scala.collection.Seq[String]]("items").toSeq == Seq("pane", "burro", "latte"))
    assert(rows(2).getAs[scala.collection.Seq[String]]("items").toSeq == Seq("latte")) // deduped
  }

  test("dialect B ingest: cost FIRST then item, one row per priced line") {
    val path = fixtureFile("priced.txt",
      "2015-1-3,15 pane,12 uova\n2015-1-20,3 latte\n2015-2-3,15 pane\n")
    val df = BillingReader.dialectB(spark, path)
    assert(df.count() == 4)
    val r = df.filter(col("item") === "uova").collect().head
    assert(r.getAs[Double]("unitCost") == 12.0)
    // same item at two costs stays two rows pre-agg
    assert(df.filter(col("item") === "pane").count() == 2)
  }

  test("golden Q1: monthly top-k item counts") {
    val baskets = BillingReader.dialectA(spark, goldenPath)
    val exploded = baskets.select(
      date_format(col("date"), "yyyy-MM").as("month"),
      explode(col("items")).as("item"))
    val counts = exploded.groupBy("month", "item").agg(count(lit(1)).as("cnt"))
    val top = TopK.perGroup(counts, Seq(col("month")), col("cnt"), Seq(col("item")), 5)
      .orderBy("month", "rn")
    val got = top.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2015-01", "pane", 3L), ("2015-01", "latte", 2L), ("2015-01", "uova", 1L),
      ("2015-02", "latte", 3L), ("2015-02", "pane", 1L), ("2015-02", "uova", 1L)))
  }

  test("golden Q3: rule(pane→latte) support=0.5 confidence=0.75") {
    val baskets = BillingReader.dialectA(spark, goldenPath)
      .select(col("billId"), explode(col("items")).as("item"))
    val rules = AssocRules.rules(baskets, "billId", "item")
    val r = rules.filter(col("antecedent") === "pane" && col("consequent") === "latte")
      .collect().head
    assert(r.getAs[Long]("pair_cnt") == 3L)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("confidence") == 0.75)
    // no self-rules (SURVEY §2.7 Q5)
    assert(rules.filter(col("antecedent") === col("consequent")).count() == 0)
    // symmetry: pair counts equal in both directions
    val ab = rules.select("antecedent", "consequent", "pair_cnt").collect()
      .map(r => ((r.get(0), r.get(1)), r.getLong(2))).toMap
    ab.foreach { case ((x, y), n) => assert(ab((y, x)) == n) }
  }

  test("PairsGenerator path == self-join path on golden baskets") {
    val arrays = BillingReader.dialectA(spark, goldenPath).select(col("billId"), col("items"))
    val viaGen = AssocRules.rulesFromBasketArrays(arrays, "items")
    val viaJoin = AssocRules.rules(
      arrays.select(col("billId"), explode(col("items")).as("item")), "billId", "item")
    assert(viaGen.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaGen).isEmpty)
    // generator handles degenerate baskets: empty array, singleton, dup items
    import spark.implicits._
    val edge = Seq((1L, Seq[String]()), (2L, Seq("a")), (3L, Seq("b", "a", "b")))
      .toDF("billId", "items")
    val pairs = AssocRules.rulesFromBasketArrays(edge, "items")
    assert(pairs.count() == 2) // only basket 3 yields the (a,b) pair → 2 directed rules
    // full equality ON the degenerate input — pins the support
    // denominator rule (empty baskets excluded on both paths)
    val viaJoinEdge = AssocRules.rules(
      edge.select(col("billId"), explode(col("items")).as("item")), "billId", "item")
    assert(pairs.exceptAll(viaJoinEdge).isEmpty && viaJoinEdge.exceptAll(pairs).isEmpty)
  }

  test("string basket ids keep their identity (no silent long-cast collapse)") {
    import spark.implicits._
    // pre-r12, rules() cast bid to LONG: every UUID-ish string id became
    // NULL and ALL such baskets merged into one giant null basket —
    // wrong rules and a pair blowup. Two disjoint string baskets must
    // yield NO cross-basket pair.
    val baskets = Seq(
      ("basket-A", "x"), ("basket-A", "y"),
      ("basket-B", "p"), ("basket-B", "q")).toDF("bid", "item")
    val rules = AssocRules.rules(baskets, "bid", "item")
    val pairs = rules.select("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y"), ("y", "x"), ("p", "q"), ("q", "p")))
    // support denominator sees BOTH baskets
    assert(rules.filter(col("antecedent") === "x").head().getAs[Double]("support") == 0.5)
  }

  test("NULL basket ids are dropped, not merged into a phantom basket") {
    import spark.implicits._
    // groupBy KEEPS a NULL group: without the up-front filter every
    // unkeyed row would merge into one giant basket — phantom rules
    // between items that never co-occurred (ADVICE r12)
    val baskets = Seq(
      (Some("b1"), "x"), (Some("b1"), "y"),
      (None: Option[String], "p"), (None, "q"), (None, "x"))
      .toDF("bid", "item")
    val rules = AssocRules.rules(baskets, "bid", "item")
    val pairs = rules.select("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y"), ("y", "x")), s"phantom NULL-basket pairs: $pairs")
    // denominator counts only the real basket
    assert(rules.filter(col("antecedent") === "x").head().getAs[Double]("support") == 1.0)
  }

  test("maxBasketSize cap: drops the mega-basket, keyed count — no window on bid") {
    import spark.implicits._
    // adversarial skew fixture: one mega-basket (the pair-blowup input
    // the cap exists for) among normal baskets
    val mega = (1 to 200).map(i => (99L, s"item_$i"))
    val normal = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"))
    val baskets = (normal ++ mega).toDF("bid", "item")
    val capped = AssocRules.rules(baskets, "bid", "item", maxBasketSize = Some(10))
    // semantics: identical to running rules() on the input minus the
    // mega-basket (support denominator excludes dropped baskets too)
    val manual = AssocRules.rules(normal.toDF("bid", "item"), "bid", "item")
    assert(capped.exceptAll(manual).isEmpty && manual.exceptAll(capped).isEmpty)
    assert(capped.filter(col("support") === 1.0).count() > 0) // 2 baskets, (a,b) in both
    // plan pin (house rule): the cap path counts basket sizes via
    // partial-aggregable groupBy + semi join, never a window sort on the
    // hot basket key — the window formulation funnels the mega-basket
    // through one sorting task exactly when the cap is needed most
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"cap path planned a window on bid:\n$plan")
  }

  test("golden Q2: revenue per item per month from dialect B") {
    val path = fixtureFile("priced2.txt",
      "2015-1-3,15 pane,12 uova\n2015-1-20,3 pane\n2016-1-3,7 pane\n")
    val priced = BillingReader.dialectB(spark, path)
    val rev = priced.groupBy(col("item"), date_format(col("date"), "yyyy-MM").as("month"))
      .agg(sum(col("unitCost")).as("total"))
    val m = rev.collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // months of different years NOT merged (SURVEY §2.7 Q6)
    assert(m == Map(("pane", "2015-01") -> 18.0, ("uova", "2015-01") -> 12.0,
      ("pane", "2016-01") -> 7.0))
  }
}
