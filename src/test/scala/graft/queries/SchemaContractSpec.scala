package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The testdata contract, as one NAMED failure point.
  *
  * Round 8 lesson: the driver regenerated `/root/testdata` and the
  * events `ts` column silently changed encoding (INT64-nanos →
  * timestamp[us]); 17 queries then died at analysis with no test that
  * said why. This spec opens every sf0.01 table and asserts exactly the
  * logical types the engine consumes — the next silent regeneration
  * fails HERE, by name, instead of scattering analysis errors across
  * the query suite.
  *
  * Timestamp columns accept the documented encoding set (the loader is
  * schema-adaptive per [[Queries.normalizeTs]]): INT64-nanos (reads as
  * LongType under the nanos conf), TIMESTAMP_NTZ, or TIMESTAMP.
  */
class SchemaContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Types the schema-adaptive timestamp loaders accept. */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private def fields(name: String): Map[String, DataType] =
    spark.read.parquet(s"$dir/$name.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertTable(
      name: String,
      exact: Map[String, DataType],
      adaptiveTs: Set[String] = Set.empty): Unit = {
    val got = fields(name)
    val expectedNames = exact.keySet ++ adaptiveTs
    assert(got.keySet == expectedNames,
      s"$name columns drifted: got ${got.keySet.toSeq.sorted}, " +
        s"expected ${expectedNames.toSeq.sorted}")
    exact.foreach { case (c, t) =>
      assert(got(c) == t, s"$name.$c is ${got(c)}, engine expects $t")
    }
    adaptiveTs.foreach { c =>
      assert(tsEncodings.contains(got(c)),
        s"$name.$c is ${got(c)} — not one of the documented timestamp " +
          s"encodings $tsEncodings; extend Queries.normalizeTs first")
    }
  }

  test("events matches the engine contract (adaptive ts)") {
    // read through eventsRaw so an INT64-nanos regeneration still opens
    val raw = Queries.eventsRaw(spark, dir)
    val got = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    val exact = Map[String, DataType](
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
    assert(got.keySet == exact.keySet + "ts",
      s"events columns drifted: ${got.keySet.toSeq.sorted}")
    exact.foreach { case (c, t) => assert(got(c) == t, s"events.$c is ${got(c)}") }
    assert(tsEncodings.contains(got("ts")),
      s"events.ts is ${got("ts")} — extend Queries.normalizeTs first")
    // and the normalizer's post-condition: always TimestampType out
    assert(Queries.events(spark, dir).schema("ts").dataType == TimestampType)
  }

  test("lineitem matches the engine contract") {
    assertTable("lineitem", Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
      adaptiveTs = Set("l_shipdate"))
  }

  test("orders matches the engine contract") {
    assertTable("orders", Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
      adaptiveTs = Set("o_orderdate"))
  }

  test("documents and embeddings match the engine contract") {
    assertTable("documents", Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertTable("embeddings", Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("dimension tables match the engine contract") {
    assertTable("customer", Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertTable("supplier", Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertTable("part", Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertTable("nation", Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertTable("region", Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
  }
}
