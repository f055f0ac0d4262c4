package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfCentroids, KMeansOps}

/** In-engine Lloyd step: assignment agrees with the IVF serving rule,
  * the fixed-point mean is exact on hand vectors, and one step on the
  * real corpus strictly tightens the quantizer (inertia decreases). */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val axes: Seq[(Int, Array[Float])] = Seq(
    0 -> Array(1f, 0f), 1 -> Array(0f, 1f))

  test("lloydStep computes the exact per-dimension member mean") {
    // cosine assigns (1,0)-ish rows to cell 0, (0,1)-ish to cell 1
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(4f, 1f)), // cell 0
      (3L, Array(0f, 2f)) // cell 1
    ).toDF("id", "vec")
    val out = KMeansOps.lloydStep(emb, "id", "vec", axes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // cell 0 members: (1,0), (4,1) → mean (2.5, 0.5); all values are
    // exact binary fractions so the 2^-30 fixed point loses nothing
    assert(out((0L, 0L)) == (2.5, 2L))
    assert(out((0L, 1L)) == (0.5, 2L))
    assert(out((1L, 0L)) == (0.0, 1L))
    assert(out((1L, 1L)) == (2.0, 1L))
  }

  test("assignCells matches brute-force argmax cosine with cell tie-break") {
    val emb = Tables.embeddings(spark, sf001).limit(100)
    val got = KMeansOps.assignCells(emb, "vec_id", "embedding", IvfCentroids.cells)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cdf = spark.createDataFrame(IvfCentroids.cells).toDF("cell", "center")
    val brute = emb.crossJoin(broadcast(cdf))
      .withColumn("csim",
        graft.operators.Similarity.cosine(col("embedding"), col("center")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cell").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == brute)
  }

  test("lloydIterate(rounds=1) is bit-identical to lloydStep") {
    val emb = Tables.embeddings(spark, sf001)
    val one = KMeansOps.lloydStep(emb, "vec_id", "embedding", IvfCentroids.cells)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toMap
    val it = KMeansOps.lloydIterate(emb, "vec_id", "embedding", IvfCentroids.cells, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toMap
    assert(it == one)
  }

  test("lloydIterate(rounds=2) == lloydStep re-fed the round-1 means, bit-exact") {
    // the iterate path keeps everything lazy (broadcast-built centroid
    // sub-plan); this pins it to the explicit two-step composition
    val emb = Tables.embeddings(spark, sf001)
    val r1 = KMeansOps.lloydStep(emb, "vec_id", "embedding", IvfCentroids.cells)
    val manual = KMeansOps.lloydStep(emb, "vec_id", "embedding",
      KMeansOps.centroidsFromLong(r1))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toMap
    val it = KMeansOps.lloydIterate(emb, "vec_id", "embedding", IvfCentroids.cells, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toMap
    assert(it == manual)
  }

  test("the second Lloyd round keeps tightening the quantizer") {
    val emb = Tables.embeddings(spark, sf001)
    def inertiaOf(longForm: org.apache.spark.sql.DataFrame): Double =
      KMeansOps.assignCells(emb, "vec_id", "embedding",
        KMeansOps.centroidsFromLong(longForm))
        .join(KMeansOps.centroidsFromLong(longForm), "cell")
        .select(aggregate(
          zip_with(col("_v"), col("center"), (a, b) =>
            (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
        .agg(sum(col("d2"))).collect().head.getDouble(0)
    val r1 = KMeansOps.lloydIterate(emb, "vec_id", "embedding", IvfCentroids.cells, 1)
    val r2 = KMeansOps.lloydIterate(emb, "vec_id", "embedding", IvfCentroids.cells, 2)
    val i1 = inertiaOf(r1); val i2 = inertiaOf(r2)
    assert(i2 < i1, s"round 2 did not improve inertia: $i1 -> $i2")
  }

  test("one Lloyd step on the corpus decreases k-means inertia") {
    val emb = Tables.embeddings(spark, sf001)
    def inertia(cents: Seq[(Int, Array[Float])]): Double = {
      val cdf = broadcast(spark.createDataFrame(cents).toDF("cell", "center"))
      KMeansOps.assignCells(emb, "vec_id", "embedding", cents)
        .join(cdf, "cell")
        .select(aggregate(
          zip_with(col("_v"), col("center"), (a, b) =>
            (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("d2"))
        .agg(sum(col("d2"))).collect().head.getDouble(0)
    }
    val before = inertia(IvfCentroids.cells)
    val stepped = KMeansOps.lloydStep(emb, "vec_id", "embedding", IvfCentroids.cells)
      .collect()
    val updated = stepped.groupBy(_.getLong(0)).toSeq.map { case (cell, rows) =>
      val arr = new Array[Float](IvfCentroids.dim)
      rows.foreach(r => arr(r.getLong(1).toInt) = r.getDouble(2).toFloat)
      cell.toInt -> arr
    }
    // cells that lost every member keep their old centroid
    val survivors = updated.toMap
    val next = IvfCentroids.cells.map { case (c, old) =>
      c -> survivors.getOrElse(c, old)
    }
    val after = inertia(next)
    assert(after < before, s"inertia did not improve: $before -> $after")
  }
}
