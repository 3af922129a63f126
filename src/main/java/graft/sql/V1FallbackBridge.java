package graft.sql;

/**
 * Java bridge onto Spark's {@code V2TableWithV1Fallback} streaming hook
 * (declared {@code private[sql]} at the Scala level but public bytecode;
 * javac checks only the latter). Lets a v2 catalog table hand streaming
 * resolution a v1 CatalogTable, exactly how Spark's own streaming
 * table-read path consumes it (catalyst RelationResolution).
 */
public abstract class V1FallbackBridge
    implements org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback {
}
