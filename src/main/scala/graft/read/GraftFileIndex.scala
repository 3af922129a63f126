package graft.read

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{FileEntry, MetaCols}
import graft.core.Storage.PathOps

/** Metadata-driven `FileIndex` over a set of committed base files — the
  * analog of the reference's HoodieFileIndex
  * (reference hudi-spark/.../HoodieFileIndex.scala:68-137,199-229), built
  * from commit metadata instead of directory listing.
  *
  * `_hoodie_partition_path` is exposed as the partition column, so
  * Catalyst prunes partitions from WHERE clauses at plan time
  * (`listFiles(partitionFilters, …)` evaluates the predicates against the
  * partition values — zero IO), and parquet predicate pushdown / column
  * pruning come free from the HadoopFsRelation machinery. At 100 TB this
  * is the read path: a query touching one partition opens one partition's
  * files, however many the table has.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableBase: HPath,
    entries: Seq[FileEntry],
    // plan-time secondary-index pruning: for an equality/IN predicate on
    // one of these columns, the probe returns the live file groups that
    // may contain the values (None = index missing/stale → no pruning;
    // the probe is read-only, see SecondaryIndex.probeCurrentReadOnly)
    secondaryColumns: Set[String] = Set.empty,
    secondaryProbe: (String, Seq[String]) => Option[Set[(String, String)]] =
      (_, _) => None,
    // BUCKET layout: (key field, (partition, value) → bucket file id) — a
    // pushed equality/IN on the record-key field (or the key meta column)
    // keeps only the values' buckets. Driver-pure (the hash IS the
    // location); the partition argument lets the CONSISTENT engine route
    // per-partition covers (the FIXED engine ignores it).
    keyBucket: Option[(String, (String, String) => String)] = None,
    // EXPRESSION-index pruning: canonical SQL of each indexed expression
    // (resolved against the table schema, backticks stripped) → index
    // name. A pushed `expr = lit` / `expr IN (...)` whose expression
    // canonicalizes to a key probes that index like a column equality;
    // any mismatch in form just skips pruning (safe, never wrong)
    exprIndexes: Map[String, String] = Map.empty,
    // stats-answered count(*) gate: false for as-of reads at or before
    // the cleaner's earliest retained instant — the metadata still
    // records files the cleaner physically deleted, and a count answered
    // from it would silently succeed where the scan itself throws
    allowStatsAnswer: Boolean = true) extends FileIndex {

  private val byPartition: Map[String, Seq[FileEntry]] = entries.groupBy(_.partitionPath)

  /** Total rows across the indexed files when EXACTLY recoverable from
    * commit metadata: every entry is a base file with a recorded (>0)
    * row count. COW/read-optimized bases hold live rows only (tombstone
    * winners drop at merge), so the sum IS the scan's row count — this
    * powers the stats-answered `count(*)` optimization (zero IO, zero
    * tasks; see graft.sql.StatsAnswerRule). A zero count is treated as
    * "unrecorded" and disables the answer rather than risking a wrong 0.
    */
  lazy val exactRowCount: Option[Long] =
    if (!allowStatsAnswer) None
    else if (entries.isEmpty) Some(0L)
    else if (entries.forall(e => !e.isDelta && e.numRecords > 0))
      Some(entries.map(_.numRecords).sum)
    else None

  /** Exact per-column `(min, max, nonNullCount)` when recoverable from
    * commit metadata — stat strings as recorded from the footers, plus
    * the non-null row count. Powers stats-answered `min`/`max`/
    * `count(col)` (graft.sql.StatsAnswerRule). Answerable iff every
    * entry is a base file with recorded rows AND a recorded null count
    * for the column, and min/max are present wherever the file holds
    * non-null values (footers drop oversized stats → absent → bail).
    * Cross-file comparison is exact decimal for numeric/date/timestamp
    * stats and UTF8-byte order for strings — the SAME order Spark's
    * min/max on StringType use, and the order parquet recorded the
    * footer stats in. Unsupported types and parse failures return None.
    */
  def exactColumnStats(colName: String, dt: DataType)
      : Option[(Option[String], Option[String], Long)] = {
    if (!allowStatsAnswer) return None
    val numeric = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | TimestampType | TimestampNTZType | DateType => true
      case StringType => false
      case _ => return None
    }
    var nonNull = 0L
    var lo: String = null
    var hi: String = null
    var loD: BigDecimal = null
    var hiD: BigDecimal = null
    val it = entries.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e.isDelta || e.numRecords <= 0) return None
      val nulls = e.colNulls.get(colName) match {
        case Some(n) if n >= 0 && n <= e.numRecords => n
        case _ => return None
      }
      val nn = e.numRecords - nulls
      nonNull += nn
      if (nn > 0) {
        val (mn, mx) = (e.colMin.get(colName), e.colMax.get(colName)) match {
          case (Some(a), Some(b)) => (a, b)
          case _ => return None
        }
        if (numeric) {
          val mnD = scala.util.Try(BigDecimal(mn)).getOrElse(return None)
          val mxD = scala.util.Try(BigDecimal(mx)).getOrElse(return None)
          if (loD == null || mnD < loD) { loD = mnD; lo = mn }
          if (hiD == null || mxD > hiD) { hiD = mxD; hi = mx }
        } else {
          // byte-order fold, matching both the footer collation and Spark
          // SQL's UTF8_BINARY min/max semantics — stats are byte-order
          // correct at write time (Utf8Order fold in WritePipeline), so
          // the exact answer is provable for any string content
          if (lo == null || UTF8String.fromString(mn)
            .binaryCompare(UTF8String.fromString(lo)) < 0) lo = mn
          if (hi == null || UTF8String.fromString(mx)
            .binaryCompare(UTF8String.fromString(hi)) > 0) hi = mx
        }
      }
    }
    Some((Option(lo), Option(hi), nonNull))
  }

  /** Exact distinct value set (stat-string forms) + null-presence flag
    * for a column, when EVERY entry proves its set exhaustively via the
    * dictionary value index (all pages dictionary-encoded — superset AND
    * subset both hold, so this is the exact distinct set, not just a
    * pruning aid) and records a null count. Powers stats-answered
    * `SELECT DISTINCT col` for low-cardinality columns.
    */
  def exactDistinctValues(colName: String): Option[(Seq[String], Boolean)] = {
    if (!allowStatsAnswer) return None
    val values = scala.collection.mutable.LinkedHashSet.empty[String]
    var hasNull = false
    val it = entries.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e.isDelta || e.numRecords <= 0) return None
      e.colNulls.get(colName) match {
        case Some(n) if n >= 0 && n <= e.numRecords => if (n > 0) hasNull = true
        case _ => return None
      }
      e.colValues.get(colName) match {
        case Some(vs) => values ++= vs
        case None => return None // not provably exhaustive for this file
      }
      // per-file sets are capped (32) but the UNION isn't: a column with
      // high global cardinality across many files would otherwise build an
      // unbounded driver set — past this the scan is the better plan anyway
      if (values.size > 4096) return None
    }
    Some((values.toSeq, hasNull))
  }

  // one probe per (column, values) per query — listFiles can be invoked
  // more than once while a plan is optimized
  private val probeCache =
    scala.collection.mutable.Map.empty[(String, Seq[String]), Option[Set[(String, String)]]]

  override val partitionSchema: StructType =
    StructType(Seq(StructField(MetaCols.PartitionPath, StringType, nullable = false)))

  override def rootPaths: Seq[HPath] = Seq(tableBase)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind the partition-column attribute to slot 0 and evaluate per
    // partition value (the HoodieFileIndex.prunePartition approach)
    val predicate = partitionFilters.reduceOption(
      org.apache.spark.sql.catalyst.expressions.And).map { f =>
      Predicate.createInterpreted(f.transform {
        case a: Attribute if a.name == MetaCols.PartitionPath =>
          BoundReference(0, StringType, nullable = false)
      })
    }
    // secondary-index pruning: every successful probe restricts the file
    // set (top-level dataFilters are conjunctive), group-granular
    val allowed: Option[Set[(String, String)]] =
      secondaryLookups(dataFilters).flatMap { case (c, vs) =>
        probeCache.getOrElseUpdate((c, vs), secondaryProbe(c, vs))
      }.reduceOption(_ intersect _)
    // bucket-layout key pruning: equality on the key derives its bucket's
    // file id directly — no probe, no IO (per partition: covers differ
    // under the consistent engine)
    val keyHits: Option[(Seq[Seq[String]], (String, String) => String)] =
      keyBucket.flatMap { case (field, f) =>
        val hits = dataFilters.flatMap(keyValues(field, _))
        if (hits.isEmpty) None else Some((hits, f))
      }
    byPartition.toSeq.sortBy(_._1).flatMap { case (part, files) =>
      val row = InternalRow(UTF8String.fromString(part))
      if (predicate.forall(_.eval(row))) {
        val allowedBuckets: Option[Set[String]] = keyHits.map { case (hits, f) =>
          hits.map(_.map(v => f(part, v)).toSet).reduce(_ intersect _)
        }
        // data skipping: drop files whose recorded column ranges cannot
        // satisfy the pushed predicates (beyond-reference capability —
        // the stats ride in commit metadata, so this is zero-IO too)
        val kept = files
          .filter(f => allowed.forall(_.contains((part, f.fileId))))
          .filter(f => allowedBuckets.forall(_.contains(f.fileId)))
          .filter(f => dataFilters.forall(mayMatch(f, _)))
        if (kept.nonEmpty) Some(PartitionDirectory(row, kept.map(toStatus).toArray))
        else None
      } else None
    }
  }

  /** Probe values for the record-key field (or the key meta column) from
    * one pushed predicate — each returned list independently restricts
    * the bucket set. The value's string form must equal its key-string
    * cast, so only string/integral/boolean literals participate.
    */
  private def keyValues(field: String, filter: Expression): Option[Seq[String]] = {
    def lit(v: Any, t: DataType): Option[String] = t match {
      case _ if v == null => None
      case StringType | LongType | IntegerType | ShortType | ByteType | BooleanType =>
        Some(v.toString)
      case _ => None
    }
    def isKey(a: AttributeReference): Boolean =
      a.name == field || a.name == MetaCols.RecordKey
    filter match {
      case EqualTo(a: AttributeReference, Literal(v, t)) if isKey(a) =>
        lit(v, t).map(Seq(_))
      case EqualTo(Literal(v, t), a: AttributeReference) if isKey(a) =>
        lit(v, t).map(Seq(_))
      case In(a: AttributeReference, vs)
          if isKey(a) && vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ss = vs.map { case Literal(v, t) => lit(v, t) }
        if (ss.forall(_.isDefined)) Some(ss.flatten.toSeq) else None
      case _ => None
    }
  }

  /** Extract (indexed column, probe values) pairs from the pushed
    * predicates. Only literal shapes whose STRING form provably equals
    * the column's Spark string cast participate (strings, integrals,
    * booleans); anything else skips pruning rather than risking a
    * mismatched representation.
    */
  private def secondaryLookups(dataFilters: Seq[Expression]): Seq[(String, Seq[String])] = {
    def litStr(v: Any, t: DataType): Option[String] = t match {
      case _ if v == null => None
      case StringType | LongType | IntegerType | ShortType | ByteType | BooleanType =>
        Some(v.toString)
      case _ => None
    }
    if (secondaryColumns.isEmpty && exprIndexes.isEmpty) return Seq.empty
    // a non-attribute comparison side names an expression index when its
    // canonical SQL (Catalyst's own `.sql`, backticks stripped — the
    // same form the index registered) matches a registered expression
    def exprName(e: Expression): Option[String] =
      if (exprIndexes.isEmpty || e.isInstanceOf[AttributeReference]) None
      else exprIndexes.get(GraftFileIndex.canonicalSql(e.sql))
    // ColPath covers plain columns AND nested struct leaves (`meta.st`),
    // whose secondary indexes register under the same dotted name
    dataFilters.flatMap {
      case EqualTo(ColPath(p), Literal(v, t)) if secondaryColumns(p) =>
        litStr(v, t).map(s => p -> Seq(s))
      case EqualTo(Literal(v, t), ColPath(p)) if secondaryColumns(p) =>
        litStr(v, t).map(s => p -> Seq(s))
      case In(ColPath(p), vs)
          if secondaryColumns(p) && vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ss = vs.map { case Literal(v, t) => litStr(v, t) }
        if (ss.forall(_.isDefined)) Some(p -> ss.flatten.toSeq) else None
      case EqualTo(e, Literal(v, t)) if exprName(e).isDefined =>
        litStr(v, t).map(s => exprName(e).get -> Seq(s))
      case EqualTo(Literal(v, t), e) if exprName(e).isDefined =>
        litStr(v, t).map(s => exprName(e).get -> Seq(s))
      case In(e, vs) if exprName(e).isDefined &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ss = vs.map { case Literal(v, t) => litStr(v, t) }
        if (ss.forall(_.isDefined)) Some(exprName(e).get -> ss.flatten.toSeq) else None
      case _ => None
    }
  }

  /** The stats key for a predicate side: a column name, or the parquet
    * dot-path of a NESTED struct field (`meta.st` for
    * `GetStructField(meta, "st")` chains). Write-side stats record those
    * same dot-paths for struct-only leaves (WritePipeline.footerStats
    * r16), so `WHERE meta.st = 'X'` file-skips exactly like a top-level
    * predicate. Anything else (array/map access, computed expressions)
    * returns None and keeps the file.
    */
  private def statsPath(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case g: GetStructField => statsPath(g.child).map(p => s"$p.${g.extractFieldName}")
    case _ => None
  }

  private object ColPath {
    def unapply(e: Expression): Option[String] = statsPath(e)
  }

  /** Conservative range check: false only when the file's recorded
    * [min,max] for the predicate column (top-level or nested struct leaf)
    * provably excludes every match. Unknown shapes, missing stats, or
    * unsupported types keep the file.
    */
  private def mayMatch(f: FileEntry, filter: Expression): Boolean = filter match {
    case And(l, r) => mayMatch(f, l) && mayMatch(f, r)
    case Or(l, r) => mayMatch(f, l) || mayMatch(f, r)
    case EqualTo(ColPath(p), Literal(v, t)) => inRange(f, p, t, v, "=")
    case EqualTo(Literal(v, t), ColPath(p)) => inRange(f, p, t, v, "=")
    case GreaterThan(ColPath(p), Literal(v, t)) => inRange(f, p, t, v, ">")
    case GreaterThan(Literal(v, t), ColPath(p)) => inRange(f, p, t, v, "<")
    case GreaterThanOrEqual(ColPath(p), Literal(v, t)) => inRange(f, p, t, v, ">=")
    case GreaterThanOrEqual(Literal(v, t), ColPath(p)) => inRange(f, p, t, v, "<=")
    case LessThan(ColPath(p), Literal(v, t)) => inRange(f, p, t, v, "<")
    case LessThan(Literal(v, t), ColPath(p)) => inRange(f, p, t, v, ">")
    case LessThanOrEqual(ColPath(p), Literal(v, t)) => inRange(f, p, t, v, "<=")
    case LessThanOrEqual(Literal(v, t), ColPath(p)) => inRange(f, p, t, v, ">=")
    case In(ColPath(p), vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, t) => inRange(f, p, t, v, "=") }
    // null-count pruning: a file with zero nulls in the column can't
    // satisfy IS NULL; one that is ALL nulls can't satisfy IS NOT NULL
    // (footer-exact counts recorded at write time; unknown count → keep).
    // For a nested leaf the footer's numNulls counts rows null AT ANY
    // level (parent struct null or leaf null) — exactly `meta.st IS NULL`
    case IsNull(ColPath(p)) =>
      f.colNulls.get(p).forall(_ > 0L)
    case IsNotNull(ColPath(p)) =>
      f.colNulls.get(p).forall(n => f.numRecords <= 0L || n < f.numRecords)
    case _ => true
  }

  /** op is the comparison `col <op> lit`; answers "could any row match". */
  private def inRange(f: FileEntry, colName: String, t: DataType, lit: Any,
      op: String): Boolean = {
    if (lit == null) return true
    // dictionary value-set pruning: where the file recorded an EXHAUSTIVE
    // distinct set (WritePipeline.dictValueSets), equality is a membership
    // test — decisive even when [min,max] spans every file. The listed
    // types are exactly those whose literal string form equals the decoded
    // dictionary string form (strings/integrals; date as epoch days,
    // timestamp as epoch micros — Catalyst's internal literal values).
    if (op == "=") {
      val litStr: Option[String] = t match {
        case StringType | LongType | IntegerType | ShortType | ByteType |
            DateType | TimestampType | TimestampNTZType => Some(lit.toString)
        case _ => None
      }
      litStr.flatMap(v => f.colValues.get(colName).map(_.contains(v))) match {
        case Some(member) => return member
        case None => ()
      }
    }
    val (loS, hiS) = (f.colMin.get(colName), f.colMax.get(colName)) match {
      case (Some(lo), Some(hi)) => (lo, hi)
      case _ =>
        if (colName == MetaCols.RecordKey && f.minKey.nonEmpty && f.maxKey.nonEmpty)
          (f.minKey, f.maxKey)
        else return true
    }
    // exact decimal comparison (a double round-trip could mis-prune longs
    // past 2^53); unparseable stats (NaN/Infinity footers) keep the file
    def dec(s: String): Option[BigDecimal] =
      scala.util.Try(BigDecimal(s)).toOption
    val litDec: Option[BigDecimal] = t match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType =>
        scala.util.Try(BigDecimal(lit.toString)).toOption
      case TimestampType | TimestampNTZType => // stored/compared as epoch micros
        Some(BigDecimal(lit.asInstanceOf[Long]))
      case DateType => // days since epoch
        Some(BigDecimal(lit.asInstanceOf[Int]))
      case StringType =>
        // footer min/max are ordered by unsigned UTF-8 bytes; compare the
        // literal in the same collation or supplementary-plane values
        // mis-prune (see graft.core.Utf8Order)
        val v = lit.toString
        import graft.core.Utf8Order
        return op match {
          case "=" => Utf8Order.lteq(loS, v) && Utf8Order.lteq(v, hiS)
          case ">" => Utf8Order.gt(hiS, v)
          case ">=" => Utf8Order.gteq(hiS, v)
          case "<" => Utf8Order.lt(loS, v)
          case "<=" => Utf8Order.lteq(loS, v)
          case _ => true
        }
      case _ => return true
    }
    (dec(loS), dec(hiS), litDec) match {
      case (Some(lo), Some(hi), Some(v)) => op match {
        case "=" => lo <= v && v <= hi
        case ">" => hi > v
        case ">=" => hi >= v
        case "<" => lo < v
        case "<=" => lo <= v
        case _ => true
      }
      case _ => true
    }
  }

  private def toStatus(e: FileEntry): FileStatus =
    GraftFileIndex.entryStatus(tableBase, e)

  override def inputFiles: Array[String] =
    entries.map(e => tableBase.resolve(e.relPath).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_.sizeBytes).sum
}

object GraftFileIndex {
  /** Canonical comparison form for expression matching: Catalyst `.sql`
    * with backticks stripped. Both the registered index expressions
    * (resolved against the table schema at reader build) and the pushed
    * filter sides normalize through here.
    */
  def canonicalSql(sql: String): String = sql.replace("`", "")

  private[read] def entryStatus(tableBase: HPath, e: FileEntry): FileStatus =
    new FileStatus(e.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
      tableBase.resolve(e.relPath))
}
