package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The FuseDotProduct optimizer rule must (a) fire on the declarative
  * aggregate(zip_with) dot-product pattern, (b) produce bit-identical
  * results including null semantics, and (c) leave non-matching
  * aggregates alone.
  */
class FuseDotProductSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    GraftExtensions.registerOn(spark)
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.FuseDotProduct)
    }
  }

  lazy val emb = Tables.embeddings(spark, sf001).limit(50)

  test("rule rewrites the HOF dot pattern to the fused kernel") {
    withRule {
      val q = emb.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
      assert(q.queryExecution.optimizedPlan.toString.contains("dot_product"),
        q.queryExecution.optimizedPlan.toString)
      assert(!q.queryExecution.optimizedPlan.toString.contains("aggregate("))
    }
  }

  test("fused result is bit-identical to the interpreted HOF fold") {
    val hof = emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = withRule {
      emb.select(col("vec_id"),
          Similarity.dot(col("embedding"), col("embedding")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(hof == fused) // exact ==, no tolerance: same fold order
    assert(hof.nonEmpty)
  }

  test("null element and length mismatch both yield NULL, matching zip_with") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    def run(fused: Boolean) = {
      val q = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      val rows = (if (fused) withRule(q.collect()) else q.collect())
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows
    }
    val expected = Map(1L -> Some(11.0), 2L -> None, 3L -> None)
    assert(run(fused = false) == expected)
    assert(run(fused = true) == expected)
  }

  test("float-precision multiplies are NOT rewritten (bit-identity guard)") {
    withRule {
      // no casts: the multiply runs in FLOAT precision in the HOF plan;
      // the fused double-multiply kernel would change low bits
      val q = emb.select(aggregate(
        zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(q.count() == 50)
    }
  }

  test("non-dot aggregates are left alone") {
    withRule {
      // a fold that SUMS (no multiply) must not be rewritten
      val q = emb.select(aggregate(col("embedding"), lit(0.0),
        (acc, v) => acc + v.cast("double")).as("s"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(q.count() == 50)
    }
  }
}
