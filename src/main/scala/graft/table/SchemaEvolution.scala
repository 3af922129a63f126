package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-struct additive schema evolution — the type-merge and
  * column-rebuild rules behind [[GraftTable]]'s batch alignment
  * (reference hudi-common/.../TableSchemaResolver.java:71-165 resolves
  * the evolved writer schema per commit; hudi-spark's
  * TestCOWDataSource.scala:707 pins the additive contract).
  *
  * The merge is ADDITIVE-ONLY, table-first: for a struct column, table
  * nested fields keep their order (a batch missing one pads a typed
  * null), incoming extras append after them — recursively through
  * struct / array-of-struct / map-of-struct nesting. Leaf types may
  * take a lossless upcast (int→long, float→double: Catalyst's
  * `Cast.canUpCast`); anything else — a nested type conflict, struct vs
  * scalar, map key change — refuses with a named error at WRITE time
  * rather than surfacing as an unintelligible union/analysis failure
  * mid-plan (or, worse, a silently regressed commit schema).
  *
  * Everything here is pure expression rewriting: the padded struct is
  * rebuilt with `struct`/`transform`/`transform_values`, so evolution
  * stays inside whole-stage codegen — zero shuffle, no UDF, no
  * row-by-row conversion.
  */
object SchemaEvolution {

  /** Does the type carry a struct anywhere (itself, array elements, map
    * values)? Only such columns engage the evolution merge — plain leaf
    * mismatches keep the engine's existing union-coercion behavior.
    */
  def containsStruct(dt: DataType): Boolean = dt match {
    case _: StructType => true
    case ArrayType(e, _) => containsStruct(e)
    case MapType(_, v, _) => containsStruct(v)
    case _ => false
  }

  /** The evolved type of a column whose table (`tbl`) and incoming (`in`)
    * shapes differ: table fields first, incoming extras appended, all
    * nested fields nullable (old files backfill with null on read).
    * Throws `IllegalArgumentException` naming the exact nested `path` on
    * a non-additive change.
    */
  def mergeEvolvedType(path: String, tbl: DataType, in: DataType): DataType =
    (tbl, in) match {
      case (t: StructType, i: StructType) =>
        val inByName = i.fields.map(f => f.name -> f).toMap
        val merged = t.fields.map { tf =>
          inByName.get(tf.name) match {
            case Some(inf) => StructField(tf.name,
              mergeEvolvedType(s"$path.${tf.name}", tf.dataType, inf.dataType),
              nullable = true)
            case None => tf.copy(nullable = true)
          }
        }
        val tblNames = t.fieldNames.toSet
        val extras = i.fields.filterNot(f => tblNames.contains(f.name))
          .map(_.copy(nullable = true))
        StructType(merged ++ extras)
      case (ArrayType(te, tn), ArrayType(ie, inl)) =>
        ArrayType(mergeEvolvedType(s"$path.element", te, ie), tn || inl)
      case (MapType(tk, tv, tn), MapType(ik, iv, inl)) if tk == ik =>
        MapType(tk, mergeEvolvedType(s"$path.value", tv, iv), tn || inl)
      case (tdt, idt) if tdt == idt => tdt
      case (tdt, idt)
          if org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(idt, tdt) =>
        tdt
      case (tdt, idt) => throw new IllegalArgumentException(
        s"incompatible schema evolution at '$path': table has ${tdt.sql}, " +
          s"incoming batch has ${idt.sql} — only additive nested-field adds " +
          "and lossless upcasts evolve; rewrite the batch to the table's " +
          "shape or recreate the table")
    }

  /** Rebuild a column of type `from` as type `to` (a [[mergeEvolvedType]]
    * result): struct fields reorder by name with typed-null padding for
    * fields the batch lacks, arrays/maps rebuild element-wise via
    * `transform`/`transform_values`, leaves upcast. A null input stays
    * null (never a struct of nulls).
    */
  def evolveColumn(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if f == t => c
      case (f: StructType, t: StructType) =>
        val fromByName = f.fields.map(x => x.name -> x).toMap
        val rebuilt = struct(t.fields.toIndexedSeq.map { tf =>
          fromByName.get(tf.name) match {
            case Some(ff) =>
              evolveColumn(c.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        // field order already matches `to`, so the positional struct cast
        // is safe — it only normalizes nullability metadata
        when(c.isNull, lit(null).cast(t)).otherwise(rebuilt).cast(t)
      case (ArrayType(fe, _), at @ ArrayType(te, _)) =>
        transform(c, x => evolveColumn(x, fe, te)).cast(at)
      case (MapType(_, fv, _), mt @ MapType(_, tv, _)) =>
        transform_values(c, (_, v) => evolveColumn(v, fv, tv)).cast(mt)
      case (_, t) => c.cast(t)
    }

  /** Rewrite the struct at a nested path inside `dt` — the shared
    * navigation behind nested-field DDL ([[GraftTable.addColumns]] /
    * `changeColumn` / `dropColumn` with dotted names, reference's
    * top-level analog AlterHoodieTableAddColumnsCommand.scala:46).
    * `segs` names intermediate STRUCT fields; array elements and map
    * values descend transparently (so `tags.weight` reaches the struct
    * inside `tags array<struct<...>>`). `fn` receives the terminal
    * struct plus its printable path and returns the rewritten struct.
    * Unknown segments and non-struct terminals refuse with the exact
    * path named.
    */
  def rewriteStructAt(path: String, dt: DataType, segs: Seq[String],
      fn: (String, StructType) => StructType): DataType = dt match {
    case s: StructType if segs.isEmpty => fn(path, s)
    case s: StructType =>
      val i = s.fieldNames.indexOf(segs.head)
      if (i < 0) throw new IllegalArgumentException(
        s"no field '${segs.head}' at '$path' (has: ${s.fieldNames.mkString(", ")})")
      val f = s.fields(i)
      StructType(s.fields.updated(i, f.copy(dataType =
        rewriteStructAt(s"$path.${f.name}", f.dataType, segs.tail, fn))))
    case ArrayType(e, n) => ArrayType(rewriteStructAt(path, e, segs, fn), n)
    case MapType(k, v, n) => MapType(k, rewriteStructAt(path, v, segs, fn), n)
    case other => throw new IllegalArgumentException(
      s"'$path' is ${other.sql}, not a struct — nested ALTER paths traverse " +
        "struct fields (arrays of struct and map values descend transparently)")
  }

  /** Split a SQL assignment map into top-level assignments and NESTED
    * (dotted-key) assignments grouped by root column — the shared
    * front-end of `UPDATE SET meta.pri = x` and MERGE's UPDATE clauses.
    * Validates each nested path against the schema (root column exists,
    * intermediate segments are structs, the LEAF EXISTS — an UPDATE
    * never adds fields; that's ADD COLUMNS' job) and refuses assigning a
    * root column and one of its nested fields in the same statement
    * (ambiguous application order).
    */
  def splitAssignments(schema: StructType, set: Map[String, String])
      : (Map[String, String], Map[String, Seq[(String, String)]]) = {
    val (nested, top) = set.partition(_._1.contains("."))
    val byRoot = nested.toSeq.groupBy(_._1.split('.').head)
    byRoot.foreach { case (root, entries) =>
      require(!top.contains(root),
        s"cannot assign both '$root' and its nested field(s) " +
          s"${entries.map(_._1).sorted.mkString(", ")} in one statement")
      val idx = schema.fieldNames.indexOf(root)
      require(idx >= 0, s"column not found: $root")
      entries.foreach { case (key, _) =>
        val segs = key.split('.').toSeq
        val leaf = segs.last
        rewriteStructAt(root, schema.fields(idx).dataType,
          segs.tail.dropRight(1), { (p, s) =>
            require(s.fieldNames.contains(leaf),
              s"no field '$leaf' at '$p' (has: ${s.fieldNames.mkString(", ")}) — " +
                "UPDATE assigns existing nested fields; use ALTER TABLE ADD " +
                "COLUMNS to declare new ones")
            s
          })
      }
    }
    (top, byRoot)
  }

  /** Apply nested assignments to a struct column via `Column.withField`
    * (exact ANSI semantics: sibling fields keep their values; a NULL
    * struct stays NULL — setting a field never materializes a struct the
    * row didn't have).
    */
  def applyNestedAssignments(base: Column, entries: Seq[(String, String)],
      exprOf: String => Column): Column =
    entries.foldLeft(base) { case (acc, (key, e)) =>
      acc.withField(key.split('.').tail.mkString("."), exprOf(e))
    }

  /** Deep-nullable normalization for persisted commit schemas: every
    * nested field reads back nullable (parquet scans surface nullable
    * regardless of the writer frame, and evolution backfills nulls).
    */
  def asDeepNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, asDeepNullable(f.dataType), nullable = true, f.metadata)))
    case ArrayType(e, _) => ArrayType(asDeepNullable(e), containsNull = true)
    case MapType(k, v, _) => MapType(k, asDeepNullable(v), valueContainsNull = true)
    case other => other
  }
}
