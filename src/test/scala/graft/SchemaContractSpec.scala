package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guard against testdata drift: the query catalog assumes these physical
  * schemas. When the driver regenerates the testdata with a changed
  * physical type (as happened when `events.ts` moved from
  * TIMESTAMP(NANOS) to timestamp[us] between rounds), this suite fails
  * with one obvious message instead of silently dropping every gate that
  * reads the changed table.
  *
  * Timestamp columns are normalized: naive parquet µs reads as
  * TIMESTAMP_NTZ, tz-adjusted as TIMESTAMP, and every downstream query
  * treats both identically under the UTC session — either satisfies the
  * contract. `events.ts` additionally accepts the legacy nanos-as-long
  * encoding because QUtil.events resolves it from the data files.
  */
class SchemaContractSpec extends AnyFunSuite {
  import SparkTestBase._

  private def flat(table: String): Seq[(String, String)] =
    spark.read.parquet(s"$sf001/$table.parquet").schema.map { f =>
      val t = f.dataType match {
        case TimestampType | TimestampNTZType => "timestamp"
        case dt => dt.simpleString
      }
      f.name -> t
    }.toSeq

  test("tpch-ish tables match the contract") {
    assert(flat("region") === Seq("r_regionkey" -> "int", "r_name" -> "string"))
    assert(flat("nation") === Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"))
    assert(flat("customer") === Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"))
    assert(flat("supplier") === Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"))
    assert(flat("part") === Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"))
    assert(flat("orders") === Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"))
    assert(flat("lineitem") === Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"))
  }

  test("pipeline tables match the contract") {
    assert(flat("documents") === Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"))
    assert(flat("embeddings") === Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))
  }

  test("events reads through QUtil to a session-TZ timestamp") {
    // raw file: ts may be long (legacy nanos) or timestamp[us]; the
    // normalized read must always surface TimestampType
    val ev = graft.queries.QUtil.events(spark, sf001)
    assert(ev.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("event_id").dataType.simpleString === "bigint")
    assert(ev.schema("user_id").dataType.simpleString === "bigint")
    assert(ev.schema("value").dataType.simpleString === "double")
  }
}
