package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Why a sketch when an exact groupBy exists: at 100 TB the exact
  * count's partial-aggregation state is proportional to the number of
  * DISTINCT keys per task (billions of tokens → hash maps spill), while
  * MG holds exactly `k` counters per task, merges associatively, and
  * GUARANTEES its candidate set contains every item with true frequency
  * > n/(k+1). A second exact pass restricted to the ≤ k candidates
  * (broadcast semi-join, k-entry agg state) then yields EXACT counts for
  * the true heavy hitters — deterministic output from a merge-order-
  * dependent intermediate, which is what makes the result oracle-able.
  *
  * Buffer = (counters: ≤ k string→count entries, n: rows seen). The
  * merge sums common keys then applies the PODS'12 reduction: subtract
  * the (k+1)-th largest count from everything and drop non-positives —
  * keeps the ≤ n/(k+1) undercount bound additive across merges.
  */
object FreqSketch {

  final class MgBuffer(val k: Int) {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var n: Long = 0L
  }

  case class MisraGriesAgg(child: Expression, k: Int,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

    require(k >= 1 && k <= 100000, s"k must be in 1..100000, got $k")

    // update() reads the child as UTF8String; without this check a
    // non-string child would pass analysis and throw ClassCastException
    // mid-job instead of failing at plan time
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries_agg needs a STRING item column, got ${other.sql}")
      }

    override def dataType: DataType = StructType(Seq(
      StructField("items", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("n", LongType, nullable = false)))
    override def nullable: Boolean = false

    override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

    override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
      val v = child.eval(input)
      if (v != null) {
        buf.n += 1L
        val s = v.asInstanceOf[UTF8String].toString
        buf.counters.get(s) match {
          case Some(c) => buf.counters.update(s, c + 1L)
          case None =>
            if (buf.counters.size < k) buf.counters.update(s, 1L)
            else {
              // classic MG decrement-all step; removals keep size < k
              val dead = mutable.ArrayBuffer.empty[String]
              buf.counters.mapValuesInPlace((_, c) => c - 1L)
              buf.counters.foreach { case (key, c) => if (c <= 0L) dead += key }
              dead.foreach(buf.counters.remove)
            }
        }
      }
      buf
    }

    override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
      b1.n += b2.n
      b2.counters.foreach { case (s, c) =>
        b1.counters.update(s, b1.counters.getOrElse(s, 0L) + c)
      }
      if (b1.counters.size > k) {
        // subtract the (k+1)-th largest count, drop non-positives
        val counts = b1.counters.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - (k + 1))
        val dead = b1.counters.collect { case (s, c) if c - cut <= 0L => s }
        dead.foreach(b1.counters.remove)
        b1.counters.mapValuesInPlace((_, c) => c - cut)
      }
      b1
    }

    override def eval(buf: MgBuffer): Any = {
      // sorted for a deterministic array rendering; consumers treat it
      // as a SET (the guarantee is membership, not order or counts)
      val items = buf.counters.keys.toArray.sorted
      new GenericInternalRow(Array[Any](
        new GenericArrayData(items.map(UTF8String.fromString)), buf.n))
    }

    override def serialize(buf: MgBuffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(buf.n)
      out.writeInt(buf.counters.size)
      buf.counters.foreach { case (s, c) =>
        val bytes = s.getBytes("UTF-8")
        out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): MgBuffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new MgBuffer(k)
      buf.n = in.readLong()
      val sz = in.readInt()
      var i = 0
      while (i < sz) {
        val len = in.readInt()
        val sb = new Array[Byte](len); in.readFully(sb)
        buf.counters.update(new String(sb, "UTF-8"), in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGriesAgg = copy(child = c)
    override def prettyName: String = "misra_gries_agg"
  }

  /** struct(items: array&lt;string&gt;, n: bigint) — candidate heavy
    * hitters (every item with frequency > n/(k+1) is guaranteed in) plus
    * the exact row count. */
  def mg_candidates(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(ColumnBridge.expression(item), k)
      .toAggregateExpression())
}
