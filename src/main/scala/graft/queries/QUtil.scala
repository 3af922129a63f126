package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object QUtil {
  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader refuses. Read nanos as long (legacy conf) and
    * convert to a microsecond timestamp — the data is µs-grained, so the
    * conversion is lossless. DuckDB reads the same file as TIMESTAMP_NS
    * natively; queries that surface `ts` must format it to string on both
    * sides to compare across the precision gap.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000"))) // integer div: exact
  }
}
