package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.spark.sql.types._

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

  /** From a file containing a Spark-JSON-serialized StructType
    * (`df.schema.json` output), an Avro record schema (the reference's
    * own currency — FilebasedSchemaProvider parses the file with
    * `new Schema.Parser().parse(...)`), or a DDL string; the file-based
    * analog of FilebasedSchemaProvider.
    */
  def fromFile(path: String): StructType = {
    val text = new String(Files.readAllBytes(Paths.get(path)), UTF_8).trim
    if (text.startsWith("{")) {
      if (text.contains("\"record\"")) fromAvro(text)
      else DataType.fromJson(text).asInstanceOf[StructType]
    } else fromDdl(text)
  }

  /** Parse an Avro record schema (JSON) into a Catalyst StructType —
    * the type mapping Spark's own Avro integration documents publicly:
    * primitives map directly, unions with null map to nullable, enum and
    * fixed map to string/binary, and the date / timestamp-millis/micros /
    * decimal logical types map to their Catalyst counterparts.
    */
  def fromAvro(json: String): StructType = {
    val schema = new AvroSchema.Parser().parse(json)
    require(schema.getType == AvroSchema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    toStruct(schema)
  }

  private def toStruct(record: AvroSchema): StructType =
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toCatalyst(f.schema())
      StructField(f.name(), dt, nullable)
    })

  private def toCatalyst(s: AvroSchema): (DataType, Boolean) = {
    import AvroSchema.Type._
    s.getType match {
      case UNION =>
        val branches = s.getTypes.asScala.toSeq
        val (nulls, rest) = branches.partition(_.getType == NULL)
        require(rest.size == 1,
          s"only unions of null with one type are supported, got $s")
        (toCatalyst(rest.head)._1, nulls.nonEmpty)
      case RECORD => (toStruct(s), false)
      case ARRAY =>
        val (elem, elemNullable) = toCatalyst(s.getElementType)
        (ArrayType(elem, elemNullable), false)
      case MAP =>
        val (v, vNullable) = toCatalyst(s.getValueType)
        (MapType(StringType, v, vNullable), false)
      case STRING | ENUM => (StringType, false)
      case BYTES | FIXED => s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
      case INT => s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
      case LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
          (TimestampNTZType, false)
        case _ => (LongType, false)
      }
      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case BOOLEAN => (BooleanType, false)
      case NULL => (NullType, true)
      case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
    }
  }
}
