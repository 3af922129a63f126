package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core._
import graft.keygen.KeyGen
import graft.read.Readers

/** Programmatic MERGE INTO — the reference implements this as a Catalyst
  * command that serializes matched/not-matched actions into the write
  * config and evaluates them per-record via Janino-compiled payloads
  * (reference MergeIntoHoodieTableCommand.scala:149-199,
  * ExpressionPayload.scala:53-160). Here the actions compile directly to
  * native Catalyst `when` chains over a `target ⋈ source` join, so the
  * whole merge stays inside whole-stage codegen and the standard write
  * pipeline routes the results.
  *
  * Conditions/assignments are Spark SQL strings; target columns are
  * reachable as `t.<col>`, source columns as `s.<col>`. Clauses apply in
  * declaration order, first match wins (ANSI MERGE semantics).
  *
  * {{{
  * table.mergeInto(source)
  *   .whenMatchedUpdate(Some("s.ver > t.ver"), Map("price" -> "s.price"))
  *   .whenMatchedDelete(Some("s.op = 'D'"))
  *   .whenNotMatchedInsert(None)   // insert source row as-is
  *   .execute()
  * }}}
  */
final class MergeInto private[table] (t: GraftTable, source: DataFrame) {
  private case class Clause(kind: String, condition: Option[String], assignments: Map[String, String])
  private var clauses = Vector[Clause]()
  private var evolve = false

  /** Additive schema evolution (ANSI `MERGE WITH SCHEMA EVOLUTION`, the
    * same contract as upsert's alignToTableSchema): extra source data
    * columns become new nullable table columns — star actions populate
    * them, carried-over target rows read null. Without this, extra
    * source columns are ignored (plain ANSI MERGE).
    */
  def withSchemaEvolution(): MergeInto = { evolve = true; this }

  /** `assignments`: target column -> SQL expr over t./s.; empty map ⇒
    * assign every source column to the same-named target column.
    */
  def whenMatchedUpdate(condition: Option[String] = None,
      assignments: Map[String, String] = Map.empty): MergeInto = {
    clauses :+= Clause("update", condition, assignments); this
  }

  def whenMatchedDelete(condition: Option[String] = None): MergeInto = {
    clauses :+= Clause("delete", condition, Map.empty); this
  }

  def whenNotMatchedInsert(condition: Option[String] = None,
      values: Map[String, String] = Map.empty): MergeInto = {
    clauses :+= Clause("insert", condition, values); this
  }

  /** Target rows with NO matching source row (Spark 4 / ANSI
    * `WHEN NOT MATCHED BY SOURCE` — beyond the 0.x reference, which
    * predates the clause). Conditions/assignments may reference `t.` only.
    * Assignments are mandatory for the update form: there is no source
    * row to star-assign from.
    */
  def whenNotMatchedBySourceUpdate(condition: Option[String] = None,
      assignments: Map[String, String]): MergeInto = {
    require(assignments.nonEmpty,
      "WHEN NOT MATCHED BY SOURCE ... UPDATE needs explicit assignments " +
        "(no source row to assign from)")
    clauses :+= Clause("nms_update", condition, assignments); this
  }

  def whenNotMatchedBySourceDelete(condition: Option[String] = None): MergeInto = {
    clauses :+= Clause("nms_delete", condition, Map.empty); this
  }

  /** NESTED additive evolution (same contract as upsert's batch
    * alignment, applied regardless of [[withSchemaEvolution]] — that
    * flag governs NEW top-level columns only): struct columns whose
    * source shape differs additively from the table's evolve BOTH join
    * sides to the merged type before any clause expression compiles, so
    * `s.meta`/`t.meta` agree structurally and the commit records the
    * widened schema. Non-additive drift refuses with the named
    * SchemaEvolution error instead of an opaque struct-cast failure.
    */
  private var evolvedTypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty

  private def colTypes: Map[String, org.apache.spark.sql.types.DataType] =
    t.dataSchema.map(_.fields.map(f => f.name -> f.dataType).toMap)
      .getOrElse(Map.empty) ++ evolvedTypes

  def execute(): String = {
    require(clauses.nonEmpty, "MERGE requires at least one WHEN clause")
    clauses.filter(_.kind == "insert").foreach { cl =>
      val dotted = cl.assignments.keys.filter(_.contains(".")).toSeq.sorted
      require(dotted.isEmpty,
        s"INSERT clause assigns whole columns — nested targets " +
          s"(${dotted.mkString(", ")}) belong to UPDATE clauses")
    }
    // additive schema evolution, the same contract as upsert's
    // alignToTableSchema: extra source data columns become new nullable
    // table columns (existing rows read null); the target side is padded
    // with typed nulls so carry-over projections resolve
    val targetCols = t.dataSchema.map(_.fieldNames.toSeq).getOrElse(Seq.empty)
    val srcData = source.columns.filterNot(MetaCols.All.contains).toSeq
    val newCols = if (!evolve || targetCols.isEmpty) Seq.empty
      else srcData.filterNot(targetCols.contains)
    val dataCols = if (targetCols.isEmpty) srcData else targetCols ++ newCols

    val tblTypes = t.dataSchema.map(_.fields.map(f => f.name -> f.dataType).toMap)
      .getOrElse(Map.empty[String, org.apache.spark.sql.types.DataType])
    evolvedTypes = srcData.flatMap { c =>
      tblTypes.get(c).flatMap { tdt =>
        val sdt = source.schema(c).dataType
        if (sdt != tdt && (SchemaEvolution.containsStruct(tdt) ||
            SchemaEvolution.containsStruct(sdt)))
          Some(c -> SchemaEvolution.mergeEvolvedType(c, tdt, sdt))
        else None
      }
    }.toMap
    val sourceAligned = evolvedTypes.foldLeft(source) { case (df, (c, m)) =>
      df.withColumn(c,
        SchemaEvolution.evolveColumn(col(s"`$c`"), source.schema(c).dataType, m))
    }

    // ANSI MERGE forbids a target row matching >1 source row. Collapse
    // duplicate source keys by precombine (highest wins, like the
    // reference's payload preCombine); without a precombine field a
    // multi-match would be nondeterministic, so it errors instead.
    val srcRaw = KeyGen.withKeyColumns(sourceAligned, t.cfg)
    val pc = t.cfg.precombineField
    // ONE aggregation job yields both the touched-partition list (for the
    // pruned target snapshot) and the per-partition max key multiplicity
    // (the ANSI multi-match check) — the partition set is invariant under
    // precombine dedup, so it can come from the raw source
    val partStats = srcRaw.groupBy(MetaCols.PartitionPath, MetaCols.RecordKey)
      .count()
      .groupBy(MetaCols.PartitionPath).agg(max(col("count")).as("_mx"))
      .collect()
    val parts = partStats.map(_.getString(0)).toSeq
    val srcKeyed =
      if (pc.nonEmpty && source.columns.contains(pc)) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(MetaCols.PartitionPath), col(MetaCols.RecordKey))
          .orderBy(col(pc).desc)
        srcRaw.withColumn("_graft_src_rn", row_number().over(w))
          .filter(col("_graft_src_rn") === 1).drop("_graft_src_rn")
      } else {
        require(partStats.forall(_.getLong(1) <= 1),
          "MERGE source has multiple rows for one record key and the table " +
            "has no precombine field to resolve them (ANSI MERGE multi-match)")
        srcRaw
      }
    // the keyed source feeds both join sides across several jobs (profile,
    // write) — cache it once
    srcKeyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val target0 = Readers.snapshot(t, partitions = Some(parts))
    val padded = newCols.foldLeft(target0)((df, c) =>
      df.withColumn(c, lit(null).cast(source.schema(c).dataType)))
    val target = evolvedTypes.foldLeft(padded) { case (df, (c, m)) =>
      df.withColumn(c, SchemaEvolution.evolveColumn(col(s"`$c`"), tblTypes(c), m))
    }

    try {
      if (t.cfg.isMor) executeTwoPass(target, srcKeyed, dataCols)
      else executeCow(target, srcKeyed, dataCols)
    } finally srcKeyed.unpersist()
  }

  private val keyCols = Seq(MetaCols.RecordKey, MetaCols.PartitionPath)

  /** First-match-wins application flags for a clause list. */
  private def applyFlags(cs: Seq[Clause]): Seq[(Clause, Column)] = {
    var remaining = lit(true)
    cs.map { c =>
      val cond = c.condition.map(expr).getOrElse(lit(true))
      val app = remaining && cond
      remaining = remaining && !coalesce(cond, lit(false))
      (c, app)
    }
  }

  /** Per-clause assignment split: top-level vs NESTED (dotted) targets,
    * validated against the table's (evolved) shape. `UPDATE SET
    * meta.pri = x` applies via withField — sibling fields carried, NULL
    * structs stay NULL — instead of silently no-oping on an unmatched
    * whole-column key.
    */
  private def splitFor(cl: Clause): (Map[String, String], Map[String, Seq[(String, String)]]) =
    SchemaEvolution.splitAssignments(
      org.apache.spark.sql.types.StructType(colTypes.toSeq.map { case (n, dt) =>
        org.apache.spark.sql.types.StructField(n, dt)
      }), cl.assignments)

  private def matchedValueCol(applied: Seq[(Clause, Column)], c: String): Column = {
    val chain = applied.foldLeft(when(lit(false), lit(null))) {
      case (acc, (cl, app)) =>
        val v =
          if (cl.kind.endsWith("delete")) col(s"t.$c")
          else if (cl.assignments.isEmpty)
            (if (source.columns.contains(c)) col(s"s.$c") else col(s"t.$c"))
          else {
            val (top, nested) = splitFor(cl)
            val start = top.get(c).map(expr).getOrElse(col(s"t.$c"))
            nested.get(c)
              .map(SchemaEvolution.applyNestedAssignments(start, _, expr))
              .getOrElse(start)
          }
        acc.when(app, v)
    }
    chain.otherwise(col(s"t.$c"))
  }

  private def insertValueCol(applied: Seq[(Clause, Column)], c: String): Column = {
    val chain = applied.foldLeft(when(lit(false), lit(null))) {
      case (acc, (cl, app)) =>
        val v =
          if (cl.assignments.isEmpty)
            (if (source.columns.contains(c)) col(s"s.$c") else lit(null))
          else cl.assignments.get(c).map(expr).getOrElse(lit(null))
        acc.when(app, v)
    }
    chain.otherwise(lit(null))
  }

  /** COW fast path: the target streams ONCE through a left-outer join
    * (source side broadcast-able — a full-outer would forbid it) and
    * comes out already merged — matched rows projected through their
    * first applicable clause, carried-over rows untouched with their
    * original commit stamps. Inserts come from a key-column anti join
    * (target read narrowly). No dedup pass and no read-back follows:
    * [[GraftTable.writeCompleteGroups]] skips groups where nothing
    * changed and rewrites the rest in a single shuffle. (The reference's
    * MergeHandle also streams the base file exactly once —
    * HoodieMergeHandle.java:201-326 — where the two-pass shape would scan
    * it three times.)
    */
  private def executeCow(target: DataFrame, srcKeyed: DataFrame,
      dataCols: Seq[String]): String = {
    val matchedClauses = clauses.filter(c => c.kind == "update" || c.kind == "delete")
    val insertClauses = clauses.filter(_.kind == "insert")
    val nmsClauses = clauses.filter(_.kind.startsWith("nms_"))

    val joined = target.alias("t").join(srcKeyed.alias("s"),
      keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "left_outer")
    val sM = col(s"s.${MetaCols.RecordKey}").isNotNull

    val mApplied = applyFlags(matchedClauses)
    val mAny = mApplied.map(_._2).reduceOption(_ || _).getOrElse(lit(false))
    val delFlag = mApplied.collect { case (c, app) if c.kind == "delete" => app }
      .reduceOption(_ || _).getOrElse(lit(false))
    // NOT MATCHED BY SOURCE rides the SAME left-outer stream: those rows
    // are exactly the s-null side, so no extra join or scan is needed
    val nApplied = applyFlags(nmsClauses)
    val nAny = nApplied.map(_._2).reduceOption(_ || _).getOrElse(lit(false))
    val nDelFlag = nApplied.collect { case (c, app) if c.kind == "nms_delete" => app }
      .reduceOption(_ || _).getOrElse(lit(false))

    // pin every data column to the table schema's type (assignment and
    // insert expressions may carry narrower source types; nested-evolved
    // columns pin to their MERGED type — both sides are pre-aligned)
    val colType = colTypes
    def typed(c: String, e: Column): Column =
      colType.get(c).map(e.cast).getOrElse(e).as(c)

    val modified = (sM && coalesce(mAny, lit(false))) ||
      (!sM && coalesce(nAny, lit(false)))
    val matchedAndCarried = joined.select(
      (Seq(
        when(modified, lit(null))
          .otherwise(col(s"t.${MetaCols.CommitTime}")).as(MetaCols.CommitTime),
        when(modified, lit(null))
          .otherwise(col(s"t.${MetaCols.CommitSeqno}")).as(MetaCols.CommitSeqno),
        col(s"t.${MetaCols.RecordKey}").as(MetaCols.RecordKey),
        col(s"t.${MetaCols.PartitionPath}").as(MetaCols.PartitionPath),
        substring_index(col(s"t.${MetaCols.FileName}"), "_", 1).as(WritePipeline.FileIdCol),
        when(modified, when(sM, delFlag).otherwise(nDelFlag))
          .otherwise(lit(false)).as(WritePipeline.DeleteCol),
        modified.as(WritePipeline.ModifiedCol)) ++
        dataCols.map(c =>
          typed(c, when(sM, matchedValueCol(mApplied, c))
            .otherwise(matchedValueCol(nApplied, c))))): _*)

    val resolved =
      if (insertClauses.isEmpty) matchedAndCarried
      else {
        val anti = srcKeyed.alias("s").join(target.alias("t"),
          keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "left_anti")
        val iApplied = applyFlags(insertClauses)
        val iAny = iApplied.map(_._2).reduce(_ || _)
        val inserts = anti.filter(iAny).select(
          (Seq(
            lit(null).cast("string").as(MetaCols.CommitTime),
            lit(null).cast("string").as(MetaCols.CommitSeqno),
            col(s"s.${MetaCols.RecordKey}").as(MetaCols.RecordKey),
            col(s"s.${MetaCols.PartitionPath}").as(MetaCols.PartitionPath),
            lit(null).cast("string").as(WritePipeline.FileIdCol),
            lit(false).as(WritePipeline.DeleteCol),
            lit(true).as(WritePipeline.ModifiedCol)) ++
            dataCols.map(c => typed(c, insertValueCol(iApplied, c)))): _*)
        matchedAndCarried.unionByName(inserts)
      }
    t.writeCompleteGroups(resolved, "merge")
  }

  /** MOR path: matched rows (inner join) and inserts (anti join) only —
    * the changed subset appends as delta files, so reading full groups
    * would be wasted IO there.
    */
  private def executeTwoPass(target: DataFrame, srcKeyed: DataFrame,
      dataCols: Seq[String]): String = {
    val matchedClauses = clauses.filter(c => c.kind == "update" || c.kind == "delete")
    val matched = if (matchedClauses.isEmpty) None else Some {
      val joined = target.alias("t").join(srcKeyed.alias("s"),
        keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "inner")
      val applied = applyFlags(matchedClauses)
      val anyApplied = applied.map(_._2).reduce(_ || _)
      val delFlag = applied.collect { case (c, app) if c.kind == "delete" => app }
        .reduceOption(_ || _).getOrElse(lit(false))
      val valueCols = dataCols.map(c => matchedValueCol(applied, c).as(c))
      joined.filter(anyApplied).select(
        (Seq(col(s"t.${MetaCols.RecordKey}").as(MetaCols.RecordKey),
          col(s"t.${MetaCols.PartitionPath}").as(MetaCols.PartitionPath),
          substring_index(col(s"t.${MetaCols.FileName}"), "_", 1).as(WritePipeline.FileIdCol),
          delFlag.as(WritePipeline.DeleteCol)) ++ valueCols): _*)
    }

    val insertClauses = clauses.filter(_.kind == "insert")
    val inserts = if (insertClauses.isEmpty) None else Some {
      val anti = srcKeyed.alias("s").join(target.alias("t"),
        keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "left_anti")
      val applied = applyFlags(insertClauses)
      val anyApplied = applied.map(_._2).reduce(_ || _)
      val valueCols = dataCols.map(c => insertValueCol(applied, c).as(c))
      anti.filter(anyApplied).select(
        (Seq(col(s"s.${MetaCols.RecordKey}").as(MetaCols.RecordKey),
          col(s"s.${MetaCols.PartitionPath}").as(MetaCols.PartitionPath),
          lit(null).cast("string").as(WritePipeline.FileIdCol),
          lit(false).as(WritePipeline.DeleteCol)) ++ valueCols): _*)
    }

    // NOT MATCHED BY SOURCE: target-side anti join (only clause group
    // that reads target rows the source cannot touch)
    val nmsClauses = clauses.filter(_.kind.startsWith("nms_"))
    val nms = if (nmsClauses.isEmpty) None else Some {
      val anti = target.alias("t").join(srcKeyed.alias("s"),
        keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "left_anti")
      val applied = applyFlags(nmsClauses)
      val anyApplied = applied.map(_._2).reduce(_ || _)
      val delFlag = applied.collect { case (c, app) if c.kind == "nms_delete" => app }
        .reduceOption(_ || _).getOrElse(lit(false))
      val valueCols = dataCols.map(c => matchedValueCol(applied, c).as(c))
      anti.filter(anyApplied).select(
        (Seq(col(s"t.${MetaCols.RecordKey}").as(MetaCols.RecordKey),
          col(s"t.${MetaCols.PartitionPath}").as(MetaCols.PartitionPath),
          substring_index(col(s"t.${MetaCols.FileName}"), "_", 1).as(WritePipeline.FileIdCol),
          delFlag.as(WritePipeline.DeleteCol)) ++ valueCols): _*)
    }

    val resolved = Seq(matched, inserts, nms).flatten
      .reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalArgumentException("no clauses"))
    t.writeResolved(resolved, "merge")
  }
}
