package graft

import org.apache.spark.sql.types._

/** Contract over the driver-generated testdata schemas.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a physical type once (round 8: `events.ts` went from parquet
  * TIMESTAMP(NANOS) to naive timestamp[us], silently breaking 23 queries
  * and 4 specs). This spec pins what the engine assumes about every
  * table, so the NEXT silent regeneration fails here — one obvious red
  * with the diff in the message — instead of scattering analysis errors
  * across the query surface.
  */
class SchemaContractSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, sf001, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: ts loads as TIMESTAMP regardless of on-disk physical type") {
    val ev = Tables.events(spark, sf001)
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType; got ${ev.schema("ts").dataType}. " +
        "If the driver regenerated events.parquet with a new physical type, " +
        "extend the adapter in Tables.events.")
    // The raw on-disk type must be one the adapter knows how to handle.
    val raw = Tables.load(spark, sf001, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.ts on disk is $raw — unknown to the Tables.events adapter")
  }

  test("events: non-ts columns") {
    val f = fields("events")
    assert(f("event_id") == LongType, f.toString)
    assert(f("user_id") == LongType, f.toString)
    assert(f("event_type") == StringType, f.toString)
    assert(f("value") == DoubleType, f.toString)
    assert(f("props") == StringType, f.toString)
  }

  test("documents: doc_id/text/lang/source/n_chars") {
    val f = fields("documents")
    assert(f("doc_id") == LongType, f.toString)
    assert(f("text") == StringType, f.toString)
    assert(f("lang") == StringType, f.toString)
    assert(f("source") == StringType, f.toString)
    assert(f("n_chars") == LongType, f.toString)
  }

  test("embeddings: vec_id + array<float> embedding + int label") {
    val f = fields("embeddings")
    assert(f("vec_id") == LongType, f.toString)
    assert(f("embedding") == ArrayType(FloatType, containsNull = true) ||
           f("embedding") == ArrayType(FloatType, containsNull = false), f.toString)
    assert(f("label") == IntegerType, f.toString)
  }

  test("tpch tables: key and date column types") {
    assert(fields("lineitem")("l_orderkey") == LongType)
    assert(fields("lineitem")("l_shipdate") == TimestampNTZType)
    assert(fields("orders")("o_orderkey") == LongType)
    assert(fields("orders")("o_custkey") == LongType)
    assert(fields("orders")("o_orderdate") == TimestampNTZType)
    assert(fields("customer")("c_custkey") == LongType)
    assert(fields("customer")("c_nationkey") == IntegerType)
    assert(fields("part")("p_partkey") == LongType)
    assert(fields("supplier")("s_suppkey") == LongType)
    assert(fields("nation")("n_nationkey") == IntegerType)
    assert(fields("region")("r_regionkey") == IntegerType)
  }
}
