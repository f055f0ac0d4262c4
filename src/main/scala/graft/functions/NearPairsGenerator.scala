package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Catalyst Generator emitting, from one LSH bucket's member list
  * `ARRAY<STRUCT<id, vec>>`, every canonical pair (id1 < id2) whose
  * exact cosine similarity reaches `threshold` — as (x, y, cos).
  *
  * This is the verify-IN-PLACE kernel of [[graft.operators.Dedup
  * .embeddingNearDups]] (the Vernica/Carey/Li SIGMOD'10 posture the r14
  * prefix-Jaccard rewrite established): the bucket's raw candidate
  * pairs — overwhelmingly sub-threshold junk at LSH operating points —
  * are scored and filtered inside the aggregation task that already
  * holds the member vectors, so they NEVER reach an exchange. The
  * previous formulation shuffled the raw (id1, id2) pair stream through
  * a global dropDuplicates and two vector re-attach joins; at the
  * 8.4M-vector dispatch rung that stream is ~8.5 billion rows (16
  * tables × n × occupancy/2 ≈ 150 GB) and exceeded this box's scratch,
  * while the bucket-member stream it replaces is ~n·tables rows of
  * (id, vec) payload (~37 GB) — and on a cluster the same ratio is
  * shuffle capacity freed for real work. A pair colliding in several
  * tables is scored once per collision (cosine is deterministic, so
  * survivors dedup to identical rows); junk pairs collide in ~1 table
  * at LSH operating points, so the redundancy is bounded by the TRUE
  * near-dup multiplicity, not the candidate volume.
  *
  * Cosine semantics are BIT-IDENTICAL to [[CosineSimilarity]] (same
  * ascending-index double fold over min(|a|,|b|) elements, same final
  * op sequence), which is what keeps the q_embed_neardup family's
  * DuckDB oracles hash-exact. Member vectors widen to double[] ONCE per
  * bucket (not per pair); null ids/vecs are dropped and duplicate ids
  * deduped by the id type's ordering — [[PairsGenerator]]'s contract.
  * A ZERO (or effectively-zero) vector has no defined cosine: 0/0 = NaN
  * fails `>= threshold`, so a zero-vector member emits NO pairs — at
  * ANY threshold, including negative ones — exactly as
  * [[CosineSimilarity]] returns NaN for the same pair (the two
  * formulations stay bit-parity). This is a DELIBERATE drop, not an
  * accident of IEEE: "similarity to the zero vector" has no value an
  * engine could defend, and surfacing NaN rows would poison downstream
  * threshold/ranking logic silently. Spec-pinned (DedupSpec zero-vector
  * fixture) because both oracle engines replay NaN identically — the
  * r12 oracle-blind-corner class the driver tables can never surface.
  *
  * Interpreted eval (CodegenFallback): the per-bucket O(k²·dim) cosine
  * loop runs on primitive double[] copies and dominates cost; codegen
  * would only inline the single expression dispatch per bucket row.
  */
case class NearPairsGenerator(child: Expression, threshold: Double)
  extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val idType = structType.fields(0).dataType
  @transient private lazy val vecIsDouble =
    structType.fields(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(idType).asInstanceOf[Ordering[Any]]

  override def elementSchema: StructType = StructType(Seq(
    StructField("x", idType, nullable = false),
    StructField("y", idType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(idF, vecF)), _)
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(idF.dataType) &&
        (vecF.dataType == ArrayType(FloatType, false) ||
         vecF.dataType == ArrayType(FloatType, true) ||
         vecF.dataType == ArrayType(DoubleType, false) ||
         vecF.dataType == ArrayType(DoubleType, true)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        "near_pairs() requires ARRAY<STRUCT<orderable id, ARRAY<FLOAT|DOUBLE>>>, got " +
          other.catalogString)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    val ids = new scala.collection.mutable.ArrayBuffer[Any](n)
    val vecs = new scala.collection.mutable.ArrayBuffer[Array[Double]](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 2)
      if (st != null) {
        val id = st.get(0, idType)
        val v = if (st.isNullAt(1)) null else st.getArray(1)
        if (id != null && v != null) {
          ids += id
          vecs += (if (vecIsDouble) v.toDoubleArray()
                   else {
                     val f = v.toFloatArray()
                     val d = new Array[Double](f.length)
                     var k = 0
                     while (k < f.length) { d(k) = f(k).toDouble; k += 1 }
                     d
                   })
        }
      }
      i += 1
    }
    // canonical order + adjacent-dedup by the id TYPE ordering (the
    // PairsGenerator contract; duplicate ids keep their first vector)
    val idx = (0 until ids.length).sortWith((a, b) => ordering.compare(ids(a), ids(b)) < 0)
    val keep = new scala.collection.mutable.ArrayBuffer[Int](idx.length)
    idx.foreach { k =>
      if (keep.isEmpty || ordering.compare(ids(keep.last), ids(k)) != 0) keep += k
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var a = 0
    while (a < keep.length) {
      val va = vecs(keep(a))
      var b = a + 1
      while (b < keep.length) {
        val vb = vecs(keep(b))
        val m = math.min(va.length, vb.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var k = 0
        while (k < m) {
          val x = va(k); val y = vb(k)
          dot += x * y; na += x * x; nb += y * y
          k += 1
        }
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos >= threshold) out += InternalRow(ids(keep(a)), ids(keep(b)), cos)
        b += 1
      }
      a += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): NearPairsGenerator =
    copy(child = c)
  override def prettyName: String = "near_pairs"
}

object NearPairsGenerator {
  /** Column form; use with a 3-name multi-alias:
    * `df.select(nearPairs(col("members"), 0.4).as(Seq("id1", "id2", "cos_sim")))` */
  def nearPairs(members: Column, threshold: Double): Column =
    ColumnBridge.column(NearPairsGenerator(ColumnBridge.expression(members), threshold))
}
