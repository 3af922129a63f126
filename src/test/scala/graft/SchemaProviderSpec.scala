package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.streaming.{DfsSource, SchemaProviders}

class SchemaProviderSpec extends AnyFunSuite {
  import SparkTestBase._

  test("DDL and JSON-file providers produce the same StructType") {
    val ddl = "id BIGINT, name STRING, score DOUBLE"
    val fromDdl = SchemaProviders.fromDdl(ddl)
    assert(fromDdl === StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))

    val jsonFile = tmpDir("schema").resolve("s.json")
    Files.write(jsonFile, fromDdl.json.getBytes(UTF_8))
    assert(SchemaProviders.fromFile(jsonFile.toString) === fromDdl)

    val ddlFile = tmpDir("schema").resolve("s.ddl")
    Files.write(ddlFile, ddl.getBytes(UTF_8))
    assert(SchemaProviders.fromFile(ddlFile.toString) === fromDdl)
  }

  test("Avro record schema maps primitives, logical types, unions, nesting") {
    val avro = """{
      "type": "record", "name": "Order", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "qty", "type": "int"},
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "status", "type": {"type": "enum", "name": "S", "symbols": ["A", "B"]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": ["null", "double"]}},
        {"name": "addr", "type": {"type": "record", "name": "Addr", "fields": [
          {"name": "city", "type": "string"}, {"name": "zip", "type": ["null", "int"]}]}}
      ]}"""
    val st = SchemaProviders.fromAvro(avro)
    assert(st("id") === StructField("id", LongType, nullable = false))
    assert(st("name") === StructField("name", StringType, nullable = true))
    assert(st("qty").dataType === IntegerType)
    assert(st("price").dataType === DecimalType(12, 2))
    assert(st("day").dataType === DateType)
    assert(st("at").dataType === TimestampType)
    assert(st("flag").dataType === BooleanType)
    assert(st("blob").dataType === BinaryType)
    assert(st("status").dataType === StringType)
    assert(st("tags").dataType === ArrayType(StringType, containsNull = false))
    assert(st("attrs").dataType === MapType(StringType, DoubleType, valueContainsNull = true))
    assert(st("addr").dataType === StructType(Seq(
      StructField("city", StringType, nullable = false),
      StructField("zip", IntegerType, nullable = true))))

    // file dispatch: an Avro record file routes through fromAvro
    val f = tmpDir("schema").resolve("s.avsc")
    Files.write(f, avro.getBytes(UTF_8))
    assert(SchemaProviders.fromFile(f.toString) === st)
    // unsupported multi-type unions are refused, not mis-mapped
    intercept[IllegalArgumentException] {
      SchemaProviders.fromAvro("""{"type":"record","name":"R","fields":[
        {"name":"u","type":["string","long"]}]}""")
    }
  }

  test("provider schema fixes types for a headerless CSV drop") {
    val drop = tmpDir("csv_drop")
    Files.write(drop.resolve("batch1.csv"), "1,a,1.5\n2,b,2.5\n".getBytes(UTF_8))
    val schema = SchemaProviders.fromDdl("id BIGINT, name STRING, score DOUBLE")
    val src = new DfsSource(drop.toString, format = "csv", schema = Some(schema))
    val Some((df, _)) = src.fetchNext(spark, None)
    assert(df.schema === schema)
    assert(df.count() === 2)
    assert(df.filter(df("id") === 2).first().getString(1) === "b")
  }
}
