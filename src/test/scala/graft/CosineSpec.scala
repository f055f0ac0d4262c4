package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the custom codegen'd CosineSimilarity expression to the
  * composable HOF formulation: bit-identical on every pair tried, in
  * both codegen and interpreted paths. */
class CosineSpec extends SparkSpec {

  test("native cosine == HOF cosine, bit-exact, on real embeddings") {
    val emb = Tables.embeddings(spark, sf001)
    val a = emb.limit(40).select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.limit(40).select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val both = a.crossJoin(b).select(
      Similarity.cosine(col("va"), col("vb")).as("native"),
      Similarity.cosineHof(col("va"), col("vb")).as("hof"))
    val rows = both.collect()
    assert(rows.length == 1600)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("widened element types: double/double and mixed float/double == float path, bit-exact") {
    val emb = Tables.embeddings(spark, sf001)
    val a = emb.limit(30).select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.limit(30).select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val wide = (c: String) => transform(col(c), x => x.cast("double"))
    val rows = a.crossJoin(b).select(
      Similarity.cosine(col("va"), col("vb")).as("ff"),
      Similarity.cosine(wide("va"), wide("vb")).as("dd"),
      Similarity.cosine(col("va"), wide("vb")).as("fd"),
      Similarity.cosine(wide("va"), col("vb")).as("df")).collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      val bits = (0 to 3).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i)))
      assert(bits.distinct.size == 1, s"paths diverged: $r")
    }
  }

  test("cosine of a vector with itself is ~1") {
    val emb = Tables.embeddings(spark, sf001).limit(10)
    emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
