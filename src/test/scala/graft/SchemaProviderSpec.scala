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
