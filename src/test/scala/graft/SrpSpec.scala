package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The fused codegen'd SRP coder must be bit-identical to the HOF
  * formulation it replaces — same hyperplanes, same fold order — so
  * every LSH bucket assignment (embed near-dups, ANN) is unchanged.
  */
class SrpSpec extends SparkSpec {

  test("native SrpCode == HOF srpBuckets on the embeddings table") {
    val emb = Tables.embeddings(spark, sf001)
    val native = emb.select(col("vec_id"),
      Similarity.srpBuckets(col("embedding"), 64, 4, 16).as("codes"))
    val hof = emb.select(col("vec_id"),
      Similarity.srpBucketsHof(col("embedding"), 64, 4, 16).as("codes"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("SrpCode validates the hyperplane matrix size") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      graft.functions.SrpCode(col("v"), Array(0.5), dim = 2, planes = 2, tables = 2)
    }
  }
}
