package graft

import org.apache.spark.sql.functions._
import graft.operators.{AssocRules, TopK}
import graft.sources.BillingReader

/** SURVEY §2.7 Q1–Q8 pinned as named test cases (§5.2 item 5): the
  * reference's two implementations of each query disagree with each
  * other; these tests pin the documented *intent* this engine chose.
  */
class QuirksSpec extends SparkSpec {

  import spark.implicits._

  test("Q1: top-5 emits exactly 5 rows (MR emitted 6)") {
    val counts = Seq(("m", "a", 7L), ("m", "b", 6L), ("m", "c", 5L), ("m", "d", 4L),
      ("m", "e", 3L), ("m", "f", 2L), ("m", "g", 1L)).toDF("month", "item", "cnt")
    assert(TopK.perGroup(counts, Seq(col("month")), col("cnt"), Seq(col("item")), 5)
      .count() == 5)
  }

  test("Q2: true top-5, not shuffle-order-dependent take-5 (tie-break = item asc)") {
    val counts = Seq(("m", "z", 9L), ("m", "y", 9L), ("m", "x", 9L))
      .toDF("month", "item", "cnt")
    val got = TopK.perGroup(counts, Seq(col("month")), col("cnt"), Seq(col("item")), 2)
      .orderBy("rn").select("item").as[String].collect().toSeq
    assert(got == Seq("x", "y")) // deterministic ties by item name asc
  }

  test("Q3: support/confidence are fractions, not percentages") {
    val baskets = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("bid", "item")
    val r = AssocRules.rules(baskets, "bid", "item").collect()
    assert(r.forall(_.getAs[Double]("support") <= 1.0))
    assert(r.forall(_.getAs[Double]("confidence") <= 1.0))
  }

  test("Q4: named output columns kill the tuple-order ambiguity") {
    val baskets = Seq((1L, "a"), (1L, "b")).toDF("bid", "item")
    val cols = AssocRules.rules(baskets, "bid", "item").columns.toSet
    assert(Set("antecedent", "consequent", "support", "confidence").subsetOf(cols))
  }

  test("Q5: singleton billings produce no self-pair (MR inflated self-co-occurrence)") {
    val baskets = Seq((1L, "solo"), (2L, "a"), (2L, "b")).toDF("bid", "item")
    val r = AssocRules.rules(baskets, "bid", "item")
    assert(r.filter(col("antecedent") === col("consequent")).count() == 0)
    assert(r.filter(col("antecedent") === "solo").count() == 0)
  }

  test("Q6: real (year, month) key — same month of different years NOT merged") {
    val path = fixtureFile("q6.txt", "2015-1-1,pane\n2016-1-1,pane\n")
    val months = BillingReader.dialectA(spark, path)
      .select(date_format(col("date"), "yyyy-MM").as("m")).as[String].collect().toSet
    assert(months == Set("2015-01", "2016-01"))
  }

  test("Q7: duplicate items within a billing are treated as a set") {
    val path = fixtureFile("q7.txt", "2015-1-1,latte,latte,latte\n")
    val items = BillingReader.dialectA(spark, path)
      .select(col("items")).collect().head.getAs[scala.collection.Seq[String]](0)
    assert(items.toSeq == Seq("latte"))
  }

  test("Q8: one canonical yyyy-MM month key everywhere") {
    val path = fixtureFile("q8.txt", "2015-3-7,pane\n2015-11-2,latte\n")
    val months = BillingReader.dialectA(spark, path)
      .select(date_format(col("date"), "yyyy-MM").as("m")).as[String].collect()
    assert(months.forall(_.matches("""\d{4}-\d{2}""")))
    assert(months.contains("2015-03")) // zero-padded canonical form
  }

  test("Q3b: presentation '###.##' formatting matches the reference's DecimalFormat") {
    // §2.2 row 15: the reference formats support/confidence with
    // DecimalFormat("###.##") at output time. Data paths here keep full
    // fractions (Q3); ColFns.refFormat is the presentation equivalent —
    // pin it against the actual java.text.DecimalFormat on fixtures
    // covering half-even rounding, trailing-zero dropping, and integers.
    val vals = Seq(0.0, 0.5, 0.125, 0.135, 1.0, 2.0, 0.33333, 0.666,
      123.456, 10.1, 0.05, 0.999, 0.001, 1234567.891)
    val df = new java.text.DecimalFormat("###.##",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    val expected = vals.map(df.format)
    val got = vals.toDF("v")
      .select(graft.functions.ColFns.refFormat(col("v"), 2).as("s"))
      .as[String].collect().toSeq
    assert(got == expected, s"\nspark: $got\njava : $expected")
  }

  test("Q3c: negatives rounding to zero keep their sign ('-0'); scale 0 is rejected") {
    // DecimalFormat formats from the IEEE sign bit, so anything negative
    // that rounds to zero prints "-0" — the decimal cast in refFormat
    // loses that sign and must restore it. And at scale 0 the
    // trailing-zero trim would corrupt integers ("100" → "1"), so the
    // helper refuses outright.
    val vals = Seq(-0.001, -0.004999, -1.0049, -123.456, -0.0, -100.0)
    val df = new java.text.DecimalFormat("###.##",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    val expected = vals.map(df.format)
    val got = vals.toDF("v")
      .select(graft.functions.ColFns.refFormat(col("v"), 2).as("s"))
      .as[String].collect().toSeq
    assert(got == expected, s"\nspark: $got\njava : $expected")
    intercept[IllegalArgumentException] {
      graft.functions.ColFns.refFormat(col("v"), 0)
    }
  }

  test("Q3d: known divergence — exact-half shortest-repr doubles round on different views") {
    // Spark's bround rounds the double's SHORTEST decimal repr
    // (BigDecimal.valueOf: "-0.005" is an exact half → half-even → -0.00)
    // while DecimalFormat rounds the exact binary expansion
    // (-0.005000…104 is over half → -0.01). This only bites doubles
    // whose shortest repr is an exact half at the target scale — pin the
    // divergence so a change in either engine surfaces here.
    val fmt = new java.text.DecimalFormat("###.##",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    assert(fmt.format(-0.005) == "-0.01")
    val got = Seq(-0.005).toDF("v")
      .select(graft.functions.ColFns.refFormat(col("v"), 2).as("s"))
      .as[String].collect().head
    assert(got == "-0")
  }
}
