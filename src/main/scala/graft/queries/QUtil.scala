package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object QUtil {
  /** Read the events table, resolving the physical type of `ts` from the
    * data files rather than assuming it (the reference resolves table
    * schema from file footers per commit — reference hudi-common/.../
    * TableSchemaResolver.java:71-165). Testdata generations have shipped
    * `ts` as either parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader only accepts as a raw long via the legacy conf — or as
    * timestamp[us] (read as TIMESTAMP_NTZ). Normalize both to session-TZ
    * TimestampType (sessions run UTC) so every downstream query sees one
    * type; queries that surface `ts` format it to string on both the
    * Spark and oracle sides, which is precision-exact at µs grain.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val path = s"$d/events.parquet"
    val raw =
      try s.read.parquet(path)
      catch {
        // TIMESTAMP(NANOS) footers fail schema inference outright; only
        // then is the nanos-as-long legacy read needed
        case e: Exception if String.valueOf(e.getMessage).contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path)
      }
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long; µs-grained data → exact DIV
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => // naive µs; UTC session makes this lossless
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
