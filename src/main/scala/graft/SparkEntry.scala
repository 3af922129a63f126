package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.queries.{PipelineQueries, Relational, TableOps}
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog aggregates three groups:
  *  - Relational: the query categories the reference delegates to Spark
  *  - TableOps: every write op / query type / table service (SURVEY §2)
  *  - PipelineQueries: LLM-data-pipeline operators (dedup, ANN, text, multimodal)
  */
object SparkEntry {

  /** Flagship on sf0.001: full engine round trip — bulk_insert a keyed
    * partitioned table, upsert a slice, snapshot-read it back, aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val p = "/tmp/graft_entry"
    WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(p))
    val t = GraftTable.create(spark, p, TableConfig(
      "entry", TableType.CopyOnWrite,
      Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val src = spark.read.parquet(s"$d/orders.parquet")
    t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    Readers.snapshot(t)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TableOps.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the probabilistic operators
    * (MinHash/SimHash/LSH/IVF, heuristic scores) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TableOps.oracles ++ PipelineQueries.oracles
}
