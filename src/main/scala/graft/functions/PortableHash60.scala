package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash `conv(substring(md5(s), 1, 15), 16, 10)`
  * as ONE codegen'd expression: digest straight to a long (top 60 bits
  * big-endian — exactly the value the 15-hex-char parse yields), no
  * 32-char hex string materialization, no substring, no base-16 parse
  * loop, and the MessageDigest instance is ThreadLocal-reused instead
  * of `getInstance` per row (a provider-registry lookup the composed
  * form pays every call).
  *
  * This chain is the per-row cost of EVERY oracle-portable path —
  * MinHash/Jaccard shingles, splits/sampling, HLL/CMS/KMV sketches —
  * which is why it gets the CosineSimilarity treatment (measured there:
  * 57× vs HOF; here the digest dominates, so the win is the ~2×
  * string-machinery overhead, applied to millions of rows per query).
  *
  * Bit-equality with the composed form is pinned by PortableHashSpec
  * across ASCII/unicode/empty inputs, and every oracle that replays
  * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)` in DuckDB
  * re-proves it on real data.
  */
case class PortableHash60(child: Expression)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_hash60 requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    PortableHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash60.hash($c)")

  override protected def withNewChildInternal(c: Expression): PortableHash60 =
    copy(child = c)

  override def prettyName: String = "portable_hash60"
}

object PortableHash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes of `s`), the integer the 15-hex-char
    * parse produces: first 8 digest bytes big-endian, low 4 bits
    * dropped. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PortableHash60(ColumnBridge.expression(c)))
}
