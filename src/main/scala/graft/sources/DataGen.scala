package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, distributed billing-data generator — capability parity with
  * the reference's driver-side generator
  * (`/root/reference/BD_hw1/src/generator/ItemBillingGenerator.java:16-34`,
  * `FoodGenerator.java:15-44`, `RandomDateGenerator.java:7-14`), which
  * writes 1M lines through a single PrintStream on one machine.
  *
  * Same distribution, Spark-native mechanics (FIXTURES.md §5):
  *  - basket size: uniform 1..max-1 (`Random.nextInt(max)` with 0→1);
  *  - items: `size` uniform draws from the vocabulary, then dedup —
  *    realized basket size skews small, exactly like the reference's
  *    HashSet dedup;
  *  - date: uniform day-of-year 2015, rendered NON-zero-padded (y-M-d);
  *  - fully deterministic from (seed, rowId) via xxhash64 — no RNG
  *    state, so any partitioning/retry yields identical data, and
  *    generation scales linearly with `spark.range(n)` parallelism.
  */
object DataGen {

  val DefaultVocab: Seq[String] = Seq(
    "uova", "latte", "pane", "vino", "pesce", "insalata", "formaggio", "dolce")

  /** Deterministic uniform value in [0, bound) from (seed, id, tag). */
  private def draw(bound: Int, tag: String, seed: Long) =
    pmod(xxhash64(col("billId"), lit(tag), lit(seed)), lit(bound.toLong))

  /** Baskets as (billId, date DATE, items ARRAY<STRING>). */
  def baskets(spark: SparkSession, n: Long, maxItems: Int = 10,
              vocab: Seq[String] = DefaultVocab, seed: Long = 42L): DataFrame = {
    require(maxItems >= 1 && vocab.nonEmpty,
      s"need maxItems >= 1 (got $maxItems) and a non-empty vocab " +
        "(pmod by zero would NULL every basket)")
    val vocabCol = array(vocab.map(lit): _*)
    spark.range(n).select(col("id").as("billId"))
      .withColumn("day", draw(365, "day", seed)) // 2015 is not a leap year
      .withColumn("size", greatest(draw(maxItems, "size", seed), lit(1L)))
      .withColumn("items", array_distinct(transform(
        sequence(lit(1), col("size")),
        i => element_at(vocabCol,
          (pmod(xxhash64(col("billId"), i, lit(seed)), lit(vocab.size.toLong)) + 1).cast("int")))))
      .select(col("billId"),
        date_add(lit(java.sql.Date.valueOf("2015-01-01")), col("day").cast("int")).as("date"),
        col("items"))
  }

  /** Reference-format dialect-A text lines (`2015-3-7,pane,latte`) —
    * non-padded dates, basket items comma-joined. Round-trips through
    * BillingReader.dialectA. */
  def dialectALines(spark: SparkSession, n: Long, maxItems: Int = 10,
                    vocab: Seq[String] = DefaultVocab, seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    baskets(spark, n, maxItems, vocab, seed)
      .select(concat_ws(",",
        concat_ws("-", year(col("date")), month(col("date")), dayofmonth(col("date"))),
        concat_ws(",", col("items"))).as("line"))
      .as[String]
  }

  /** Seeded synthetic document corpus with CONTROLLED duplicate
    * structure, for dedup benchmarking at arbitrary scale (the
    * reference's generator only makes billing lines; dedup needs a
    * corpus whose true duplicate rate is known by construction).
    *
    * Per 100 docs: `exactPct` are verbatim copies of a shared template,
    * `nearPct` are copies with ~5% of token positions substituted
    * (near-duplicates a shingle/MinHash pass must still catch), the
    * rest are unique. Templates live in a pool of `n/20` so duplicate
    * clusters have expected size ≥ 2 at every n. Token stream is
    * deterministic from (template, position, seed); length 30..89
    * tokens is template-keyed, so copies agree on length.
    *
    * Mechanics mirror [[baskets]]: pure column expressions over
    * `spark.range(n)` — no RNG state, no driver loop, identical data
    * under any partitioning/retry, generation cost linear in n across
    * however many tasks `range` plans.
    *
    * @return (doc_id BIGINT, kind STRING in {unique,exact,near}, text)
    */
  def documents(spark: SparkSession, n: Long, vocabSize: Int = 5000,
                exactPct: Int = 10, nearPct: Int = 10,
                seed: Long = 42L): DataFrame = {
    require(exactPct >= 0 && nearPct >= 0 && exactPct + nearPct <= 100,
      s"duplicate percentages must fit in [0,100]: exact=$exactPct near=$nearPct")
    val pool = math.max(1L, n / 20L)
    def h(tag: String, cols: org.apache.spark.sql.Column*) =
      xxhash64(cols :+ lit(tag) :+ lit(seed): _*)
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("_roll", pmod(h("roll", col("doc_id")), lit(100L)))
      .withColumn("kind",
        when(col("_roll") < exactPct, lit("exact"))
          .when(col("_roll") < exactPct + nearPct, lit("near"))
          .otherwise(lit("unique")))
      // unique docs template on their own id in a disjoint namespace
      .withColumn("_tpl",
        when(col("kind") === "unique", col("doc_id") + lit(n))
          .otherwise(pmod(h("tpl", col("doc_id")), lit(pool))))
      .withColumn("_len", pmod(h("len", col("_tpl")), lit(60L)) + 30L)
      .withColumn("text", array_join(transform(
        sequence(lit(1L), col("_len")),
        i => concat(lit("w"),
          // near-dups substitute ~1 in 20 positions with a doc-local token
          when(col("kind") === "near" && pmod(h("mut", col("doc_id"), i), lit(20L)) === 0L,
            pmod(h("sub", col("doc_id"), i), lit(vocabSize.toLong)))
            .otherwise(pmod(h("tok", col("_tpl"), i), lit(vocabSize.toLong)))
            .cast("string"))), " "))
      .select(col("doc_id"), col("kind"), col("text"))
  }

  /** Dialect-B priced lines (`2015-1-3,15 pane,12 uova`) — the reference
    * never shipped a generator for this dialect (SURVEY §1.1 ⚠); costs
    * are deterministic 1..20 per (billing, item). */
  def dialectBLines(spark: SparkSession, n: Long, maxItems: Int = 10,
                    vocab: Seq[String] = DefaultVocab, seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    baskets(spark, n, maxItems, vocab, seed)
      .select(col("billId"), col("date"), col("items"))
      .withColumn("priced", transform(col("items"),
        it => concat(
          (pmod(xxhash64(col("billId"), it, lit(seed)), lit(20L)) + 1).cast("string"),
          lit(" "), it)))
      .select(concat_ws(",",
        concat_ws("-", year(col("date")), month(col("date")), dayofmonth(col("date"))),
        concat_ws(",", col("priced"))).as("line"))
      .as[String]
  }
}
