package graft.keygen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.core.{MetaCols, TableConfig}

/** Key generation as pure Catalyst column expressions — the analog of the
  * reference's KeyGenerator hierarchy (reference hudi-client-common/.../
  * keygen/SimpleKeyGenerator.java, ComplexKeyGenerator.java,
  * TimestampBasedAvroKeyGenerator.java:50-112) with no UDFs: everything
  * stays inside whole-stage codegen.
  *
  * - single key field  → `cast(col as string)`
  * - composite key     → `f1:v1,f2:v2` (reference ComplexKeyGenerator format)
  * - partition path    → arbitrary Spark SQL expression string from
  *                       TableConfig (e.g. `date_format(l_shipdate,'yyyy')`),
  *                       empty ⇒ non-partitioned (path "")
  */
object KeyGen {
  val NullRecordKeyPlaceholder = "__null__"
  val DefaultPartition = "default"

  def recordKeyCol(fields: Seq[String]): Column =
    // keyless table (reference UuidKeyGenerator — SQL tables created
    // without a primary key): every row gets a fresh synthetic key, so
    // writes are append-only and key-addressed ops are refused upstream
    if (fields.isEmpty) expr("uuid()")
    else if (fields.size == 1) col(fields.head).cast(StringType)
    else concat_ws(",", fields.map(f =>
      concat(lit(f + ":"),
        coalesce(col(f).cast(StringType), lit(NullRecordKeyPlaceholder)))): _*)

  def partitionPathCol(partitionPathExpr: String,
      urlEncode: Boolean = false, hiveStyleName: Option[String] = None): Column =
    if (partitionPathExpr == null || partitionPathExpr.isEmpty) lit("")
    else {
      val raw = coalesce(expr(partitionPathExpr).cast(StringType), lit(DefaultPartition))
      // opt-in value encoding (reference PartitionPathEncodeUtils via
      // hoodie.datasource.write.partitionpath.urlencode): a value
      // containing '/' would otherwise silently nest an extra directory
      // level; url_encode flattens it ('%2F') so one value = one level.
      // Without it, '/' in the EXPRESSION's output is the documented way
      // to build multi-level partitioning, exactly as in the reference.
      val encoded = if (urlEncode) url_encode(raw) else raw
      // hive-style `name=value` directories (reference
      // hoodie.datasource.write.hive_style_partitioning) — one level only;
      // multi-level values (a '/' in the evaluated output) keep plain
      // values per row, since prefixing only the first directory level
      // would mislabel the layout
      hiveStyleName match {
        case Some(n) =>
          when(encoded.contains("/"), encoded)
            .otherwise(concat(lit(n + "="), encoded))
        case None => encoded
      }
    }

  /** The hive-style partition name for a config: explicit prop, else the
    * expression itself when it is a bare column reference.
    */
  def hiveStyleNameOf(cfg: TableConfig): Option[String] =
    if (cfg.prop(graft.core.ConfigKeys.HiveStylePartitioning, "false") != "true") None
    else Some(cfg.prop(graft.core.ConfigKeys.PartitionName,
      if (cfg.partitionPathExpr.matches("[A-Za-z_][A-Za-z0-9_]*"))
        cfg.partitionPathExpr
      else "partition"))

  /** The identity partition columns to render hive-style PER LEVEL, when
    * the config combines hive-style naming with a MULTI-column identity
    * layout (the reference's MultiPartKeysValueExtractor shape —
    * `yr=1995/region=eu`); None everywhere else (single-level naming is
    * [[hiveStyleNameOf]]'s, expression layouts stay plain). Tables that
    * predate per-level rendering (plain `1995/eu` paths under the same
    * config) opt out via [[graft.core.ConfigKeys.HiveStyleMultiLevel]] =
    * false so their on-disk layout stays stable across the upgrade.
    */
  def hiveStyleLevelNames(cfg: TableConfig): Option[Seq[String]] = {
    val idCols = identityPartitionCols(cfg.partitionPathExpr)
    if (idCols.size > 1 &&
        cfg.prop(graft.core.ConfigKeys.HiveStylePartitioning, "false") == "true" &&
        cfg.prop(graft.core.ConfigKeys.HiveStyleMultiLevel, "true") == "true")
      Some(idCols)
    else None
  }

  /** The partition-path column a config renders — the ONE definition the
    * write path and the static-overwrite scope probe share. Multi-column
    * identity layouts with hive-style naming prefix EVERY level
    * (`yr=1995/region=eu`, nulls per level → the default partition);
    * everything else delegates to [[partitionPathCol]].
    */
  def partitionPathColFor(cfg: TableConfig): Column = {
    val urlEnc = cfg.prop(graft.core.ConfigKeys.UrlEncodePartitions, "false").toBoolean
    hiveStyleLevelNames(cfg) match {
      case Some(names) =>
        concat_ws("/", names.map { n =>
          val raw = coalesce(col(n).cast(StringType), lit(DefaultPartition))
          val encoded = if (urlEnc) url_encode(raw) else raw
          concat(lit(n + "="), encoded)
        }: _*)
      case None =>
        partitionPathCol(cfg.partitionPathExpr, urlEnc, hiveStyleNameOf(cfg))
    }
  }

  /** Append `_hoodie_record_key` and `_hoodie_partition_path`. */
  def withKeyColumns(df: DataFrame, cfg: TableConfig): DataFrame =
    df.withColumn(MetaCols.RecordKey, recordKeyCol(cfg.recordKeyFields))
      .withColumn(MetaCols.PartitionPath, partitionPathColFor(cfg))

  /** TimestampBasedAvroKeyGenerator analog (reference
    * keygen/TimestampBasedAvroKeyGenerator.java:50-112): build the
    * partition-path expression from (field, input interpretation, output
    * format). The reference configures this with properties; here the same
    * four input modes compile to a plain Spark SQL expression string that
    * plugs into TableConfig.partitionPathExpr.
    */
  def timestampPartitionExpr(field: String, timestampType: String,
      outputFormat: String, inputFormat: String = "yyyy-MM-dd"): String =
    timestampType match {
      case "UNIX_TIMESTAMP" => // seconds since epoch
        s"date_format(to_timestamp($field), '$outputFormat')"
      case "EPOCHMILLISECONDS" =>
        s"date_format(timestamp_millis(cast($field as bigint)), '$outputFormat')"
      case "DATE_STRING" =>
        s"date_format(to_timestamp($field, '$inputFormat'), '$outputFormat')"
      case "SCALAR" => // value counts days since epoch (reference's default scalar unit)
        s"date_format(timestamp_millis(cast($field as bigint) * 86400000), '$outputFormat')"
      case other =>
        throw new IllegalArgumentException(s"unknown timestamp type '$other'")
    }

  /** The IDENTITY partition columns of a partition expression, in layout
    * order: a bare column name, or the exact multi-level form the DSv2
    * catalog compiles `PARTITIONED BY (a, b)` into
    * (`concat_ws('/', cast(`a` as string), ...)`). Empty for true
    * expression partitioning. Shared by the v2 catalog (partition
    * transforms / static PARTITION scoping) and the metastore sync
    * (declared partition keys), so both see the same identity layout.
    */
  def identityPartitionCols(partitionPathExpr: String): Seq[String] = {
    val e = if (partitionPathExpr == null) "" else partitionPathExpr
    if (e.isEmpty) Seq.empty
    else if (e.matches("[A-Za-z_][A-Za-z0-9_]*")) Seq(e)
    else {
      val Multi = """concat_ws\('/', (.*)\)""".r
      val Col = """cast\(`([A-Za-z_][A-Za-z0-9_]*)` as string\)""".r
      e match {
        case Multi(inner) =>
          val cols = inner.split(", ").toSeq.map {
            case Col(n) => Some(n)
            case _ => None
          }
          if (cols.nonEmpty && cols.forall(_.isDefined)) cols.flatten
          else Seq.empty
        case _ => Seq.empty
      }
    }
  }
}
