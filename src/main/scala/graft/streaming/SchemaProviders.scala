package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types.{DataType, StructType}

/** Schema providers for ingest sources — the reference's schema package
  * (reference hudi-utilities/.../schema/FilebasedSchemaProvider.java,
  * SchemaRegistryProvider.java; 11 files) reduced to its in-scope core:
  * the reference's currency is Avro schemas fetched from files or a
  * registry service; ours is Catalyst `StructType`, sourced from a DDL
  * string or a JSON schema file (registry services are out of scope —
  * zero-egress). The provider output plugs into [[DfsSource]]'s `schema`
  * parameter, fixing the schema for headerless CSV/JSON drops exactly
  * where the reference wires its provider into DeltaStreamer sources.
  */
object SchemaProviders {

  /** From a Spark DDL string: `"id BIGINT, name STRING, ts TIMESTAMP"`. */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  /** From a file containing either a Spark-JSON-serialized StructType
    * (`df.schema.json` output — the round-trippable form) or a DDL
    * string; the file-based analog of FilebasedSchemaProvider.
    */
  def fromFile(path: String): StructType = {
    val text = new String(Files.readAllBytes(Paths.get(path)), UTF_8).trim
    if (text.startsWith("{"))
      DataType.fromJson(text).asInstanceOf[StructType]
    else fromDdl(text)
  }
}
