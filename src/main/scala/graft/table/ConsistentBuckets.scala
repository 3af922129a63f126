package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Action, CommitMetadata, ConfigKeys, Json, MetaCols, Storage, TableConfig}

/** CONSISTENT bucket engine (`graft.index.bucket.engine=CONSISTENT` on a
  * BUCKET-indexed table) — the capability the reference line later shipped
  * as the consistent-hashing bucket index
  * (hudi-client-common/.../index/bucket/HoodieConsistentBucketIndex.java,
  * ConsistentBucketIdentifier.java): a partition's bucket count grows by
  * splitting ONE hot bucket (and shrinks by merging two cold siblings)
  * instead of the fixed engine's full-table rescale rewrite. At 100 TB a
  * full rewrite is off the table; a split rewrites exactly one file
  * group's rows, so capacity management stays O(hot data).
  *
  * Design (extendible hashing rather than the reference's hash ring — same
  * capability, simpler invariants):
  *  - A partition's layout is a COVER: a set of nodes `(d, v)` meaning
  *    "keys whose `hash mod 2^d == v`", with stable file-group id
  *    `bktd<d>v<v>`. Covers are prefix-free and complete by construction,
  *    so every key has exactly one group — the routing invariant the fixed
  *    engine gets from `mod N`. The initial cover is depth `log2(N)` (the
  *    table's `graft.index.bucket.num`, required to be a power of two for
  *    this engine).
  *  - SPLIT of `(d, v)` rewrites that group's live rows into children
  *    `(d+1, v)` / `(d+1, v + 2^d)` in one replacecommit (meta columns
  *    preserved — a layout change, not new data, like rescale/clustering).
  *    An empty child opens lazily on first write, like any bucket group.
  *  - MERGE of two sibling children rewrites them back into the REVIVED
  *    parent id (the view's replacement history makes revival visible).
  *  - Covers are derived, not authoritative state: each split/merge
  *    commit carries (partition, parent node) in its extras, and the
  *    current cover is the initial cover plus the timeline's split/merge
  *    replay. A `bucket_covers.json` snapshot (watermark + deviant
  *    partitions only) makes the replay O(replacecommits since last
  *    split) instead of O(history); it is a pure cache — routing is
  *    correct with the file deleted — and is rewritten only by split/merge
  *    commits themselves, so readers never write. As-of reads replay the
  *    timeline filtered to `ts <= asOf`, which is what makes time travel
  *    across layout changes exact.
  *
  * Routing stays row-local: partitions that never split use the same
  * zero-IO hash projection as the fixed engine; deviant partitions route
  * through a literal `when` chain over their cover nodes (one term per
  * node — cover sizes are split counts, not 2^depth). At extreme split
  * cardinalities (tens of thousands of nodes across partitions) the chain
  * should become a broadcast (partition, slot) equi-join; the depth cap
  * below keeps the expression form sound until then.
  */
object ConsistentBuckets {

  val OpSplit = "bucket_split"
  val OpMerge = "bucket_merge"
  val PartitionKey = "graft.bucket.partition"
  val ParentKey = "graft.bucket.parent"

  /** Split depth cap — 2^24 buckets per partition is far beyond any sane
    * layout and keeps hash arithmetic / literal covers bounded.
    */
  val MaxDepth = 24

  def enabled(cfg: TableConfig): Boolean =
    BucketIndex.enabled(cfg) &&
      cfg.prop(ConfigKeys.BucketIndexEngine, "FIXED") == "CONSISTENT"

  /** Initial cover depth: log2 of the creation-time bucket count. */
  def initialDepth(cfg: TableConfig): Int = {
    val n = BucketIndex.numBuckets(cfg)
    require((n & (n - 1)) == 0,
      s"${ConfigKeys.BucketIndexNumBuckets}=$n: the CONSISTENT engine " +
        "requires a power-of-two initial bucket count")
    java.lang.Long.numberOfTrailingZeros(n.toLong).toInt
  }

  /** One cover node: keys with `hash mod 2^d == v`. */
  final case class Node(d: Int, v: Long) {
    require(d >= 0 && d <= MaxDepth && v >= 0 && v < (1L << d),
      s"invalid bucket node (d=$d, v=$v)")
    def fileId: String = s"bktd${d}v$v"
    def children: (Node, Node) = (Node(d + 1, v), Node(d + 1, v + (1L << d)))
    def sibling: Node = Node(d, v ^ (1L << (d - 1)))
    def parent: Node = Node(d - 1, v & ((1L << (d - 1)) - 1))
  }

  object Node {
    private val Pat = "bktd([0-9]+)v([0-9]+)".r
    def parse(fileId: String): Option[Node] = fileId match {
      case Pat(d, v) => scala.util.Try(Node(d.toInt, v.toLong)).toOption
      case _ => None
    }
  }

  def defaultCover(cfg: TableConfig): Seq[Node] = {
    val d = initialDepth(cfg)
    (0L until (1L << d)).map(Node(d, _))
  }

  /** Deviant partitions only; absent partitions use [[defaultCover]]. */
  final case class CoverState(watermark: String, covers: Map[String, Seq[Node]]) {
    def coverFor(cfg: TableConfig, partition: String): Seq[Node] =
      covers.getOrElse(partition, defaultCover(cfg))
  }

  private final case class NodeJson(d: Int, v: Long)
  private final case class StateJson(watermark: String,
      covers: Map[String, Seq[NodeJson]])

  private[graft] def stateFile(base: Path): Path =
    new Path(new Path(base, ".graft"), "bucket_covers.json")

  /** Current covers: snapshot cache + catch-up replay of split/merge
    * replacecommits newer than its watermark (archived ones too, if the
    * cache lags behind the active timeline's start). Never writes — the
    * cache refresh belongs to the split/merge commits.
    */
  def state(t: GraftTable): CoverState = {
    val f = stateFile(t.basePath)
    val cached =
      if (!Storage.exists(f)) CoverState("0", Map.empty)
      else {
        val s = Json.read[StateJson](Storage.readString(f))
        CoverState(s.watermark, s.covers.map { case (p, ns) =>
          p -> ns.map(n => Node(n.d, n.v))
        })
      }
    catchUp(t, cached, None)
  }

  /** Covers as of an instant: full replay filtered to `ts <= asOf` (split
    * commits are rare; the replay reads only replacecommit metadata).
    */
  def stateAsOf(t: GraftTable, asOf: String): CoverState =
    catchUp(t, CoverState("0", Map.empty), Some(asOf))

  private def catchUp(t: GraftTable, from: CoverState,
      asOf: Option[String]): CoverState = {
    var st = from
    val upTo = (i: graft.core.GraftInstant) =>
      i.action == Action.ReplaceCommit && i.ts > st.watermark &&
        asOf.forall(i.ts <= _)
    // archived split commits matter only when the cache watermark predates
    // the active timeline (crash before cache write + heavy archival)
    val earliestActive = t.timeline.earliestActiveCompleted()
    val archived =
      if (earliestActive.forall(st.watermark >= _) && asOf.isEmpty) Seq.empty
      else t.timeline.archivedInstants().collect {
        case (i, content) if upTo(i) => (i, content)
      }
    val active = t.timeline.completedInstants().filter(upTo)
      .map(i => (i, t.timeline.readContent(i)))
    (archived ++ active).sortBy(_._1.ts).foreach { case (i, content) =>
      val md = CommitMetadata.fromJson(content)
      st = applyOp(t.cfg, st, i.ts, md)
    }
    st
  }

  private def applyOp(cfg: TableConfig, st: CoverState, ts: String,
      md: CommitMetadata): CoverState = {
    val next = md.operationType match {
      case OpSplit | OpMerge =>
        val part = md.extraMetadata(PartitionKey)
        val parent = Node.parse(md.extraMetadata(ParentKey)).getOrElse(
          sys.error(s"bad bucket parent in commit $ts"))
        val cover = st.coverFor(cfg, part)
        val updated =
          if (md.operationType == OpSplit) {
            val (a, b) = parent.children
            cover.filterNot(_ == parent) :+ a :+ b
          } else cover.filterNot(n => n.d == parent.d + 1 && n.parent == parent) :+ parent
        st.covers + (part -> updated.sortBy(n => (n.d, n.v)))
      case _ => st.covers
    }
    CoverState(ts, next)
  }

  /** Persist the cover cache (atomic tmp+rename; losing the race to a
    * concurrent split only leaves a staler cache for catch-up to close).
    */
  def saveState(base: Path, st: CoverState): Unit =
    Storage.atomicWrite(stateFile(base), Json.write(StateJson(st.watermark,
      st.covers.map { case (p, ns) => p -> ns.map(n => NodeJson(n.d, n.v)) })))

  // ---- routing ----

  private def hashCol(key: Column): Column = abs(xxhash64(key))

  /** Default-cover routing — the same zero-IO projection shape as the
    * fixed engine, under this engine's `bktd<d>v<v>` id namespace.
    */
  private def defaultCol(cfg: TableConfig, key: Column): Column = {
    val d = initialDepth(cfg)
    concat(lit(s"bktd${d}v"),
      pmod(hashCol(key), lit(1L << d)).cast("string"))
  }

  /** Row-local file-group id for a key under the partition's cover: a
    * `when` chain over deviant partitions' nodes, defaulting to the
    * initial-depth projection. Chain length = total deviant nodes.
    */
  def fileIdCol(st: CoverState, cfg: TableConfig, key: Column,
      part: Column): Column = {
    val h = hashCol(key)
    st.covers.toSeq.sortBy(_._1).foldRight(defaultCol(cfg, key)) {
      case ((p, cover), els) =>
        val inPart = cover.foldLeft(lit(null).cast("string")) { (acc, n) =>
          when(pmod(h, lit(1L << n.d)) === lit(n.v), lit(n.fileId)).otherwise(acc)
        }
        when(part === lit(p), inPart).otherwise(els)
    }
  }

  /** Route a keyed frame to its bucket groups; with `preserveExisting`,
    * rows already carrying a file id (tag-located updates) keep it.
    */
  def route(t: GraftTable, frame: DataFrame,
      preserveExisting: Boolean = false): DataFrame = {
    val computed = fileIdCol(state(t), t.cfg,
      col(MetaCols.RecordKey), col(MetaCols.PartitionPath))
    val v =
      if (preserveExisting && frame.columns.contains(WritePipeline.FileIdCol))
        coalesce(col(WritePipeline.FileIdCol), computed)
      else computed
    frame.withColumn(WritePipeline.FileIdCol, v)
  }

  /** Driver-side twin of [[fileIdCol]] (same XxHash64 + pmod discipline as
    * BucketIndex.bucketIdOf — parity pinned in ConsistentBucketSpec).
    */
  def bucketIdOf(st: CoverState, cfg: TableConfig, partition: String,
      keyString: String): String = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h0 = XxHash64(Seq(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(keyString))), 42L)
      .eval(null).asInstanceOf[Long]
    val h = math.abs(h0) // Long.MinValue stays negative; pmod below normalizes
    def m(d: Int): Long = { val n = 1L << d; ((h % n) + n) % n }
    st.coverFor(cfg, partition).find(n => m(n.d) == n.v)
      .getOrElse(sys.error(s"cover for '$partition' does not cover key " +
        s"'$keyString' — corrupt split history")).fileId
  }

  /** Plan-time pruning hook (partition-aware — a key's group depends on
    * the partition's cover, unlike the fixed engine's global `mod N`).
    */
  def keyFieldPruner(t: GraftTable): Option[(String, (String, String) => String)] =
    if (enabled(t.cfg) && t.cfg.recordKeyFields.size == 1) {
      val st = state(t)
      Some((t.cfg.recordKeyFields.head,
        (part: String, v: String) => bucketIdOf(st, t.cfg, part, v)))
    } else None
}
