package graft.table

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.core._

/** Write-path metrics — the analog of the reference's metrics subsystem
  * (reference hudi-client/hudi-client-common/.../metrics/HoodieMetrics.java,
  * Metrics.java, MetricsReporter.java). The reference wraps a Codahale
  * registry and publishes per-action gauges from commit metadata
  * (HoodieMetrics.java:135-165 updateCommitMetrics); reporters push to
  * console/JMX/Graphite/Datadog (MetricsReporterFactory.java).
  *
  * Design difference: in graft every published figure is a pure function
  * of the durable timeline, so the registry can always be REBUILT by
  * folding commit metadata ([[Metrics.replay]]) — a restarted driver
  * recovers its metrics without any external store. The live path is the
  * same fold applied incrementally: each refresh only reads instants newer
  * than the last one folded, so per-commit refresh cost is O(new instants),
  * not O(timeline), and the active timeline itself is bounded by archiving.
  *
  * Gauge naming follows the reference's `<table>.<action>.<metric>`
  * convention (HoodieMetrics.java getMetricsName). Per data action
  * (commit / deltacommit / replacecommit / compaction):
  *
  *   - `totalRecordsWritten`, `totalDeletes`, `totalBytesWritten`,
  *     `totalPartitionsWritten`, `totalFilesWritten` — from the commit's
  *     write stats (reference fetchTotal* on HoodieCommitMetadata)
  *   - `totalFilesInsert` / `totalFilesUpdate` — new vs pre-existing file
  *     groups, determined by the fold's running file-group set (the
  *     reference reads the same split from per-stat insert/update counts)
  *   - `duration` — the commit's recorded wall time (rides in commit
  *     metadata under [[GraftTable.DurationMsKey]])
  *   - `commitEpochMs` — publish time of the last commit of that action
  *
  * Gauges hold the LAST commit's figures per action (reference
  * registerGauge overwrite semantics); monotone history lives in
  * `<action>.count` / `<action>.totalRecordsCum` counters and, for full
  * per-commit history, [[TableAdmin.commits]]. Clean/rollback/restore
  * publish `numFilesDeleted` + `count` (updateCleanMetrics /
  * updateRollbackMetrics analogs).
  */
final class MetricsRegistry(val tableName: String) {
  private val values = new ConcurrentHashMap[String, Long]()
  // fold cursor: instants <= lastTs are already reflected in `values`
  @volatile private[table] var lastTs: String = ""
  // file groups seen by the fold so far (bounds: live+historical groups
  // of one table — the same cardinality the FS view already holds)
  private[table] val seenGroups = ConcurrentHashMap.newKeySet[String]()

  def setGauge(name: String, v: Long): Unit = values.put(s"$tableName.$name", v)
  def inc(name: String, delta: Long = 1L): Unit =
    values.merge(s"$tableName.$name", delta, (a, b) => a + b)
  def get(name: String): Option[Long] = Option(values.get(s"$tableName.$name"))

  /** Stable-ordered snapshot of all published metrics. */
  def snapshot: Seq[(String, Long)] =
    values.asScala.toSeq.sortBy(_._1).map { case (k, v) => (k, v) }
}

/** Publication transport (reference MetricsReporter.java). The reference
  * ships console/JMX/Graphite/Prometheus/Datadog; network sinks are out of
  * scope (zero egress), so: console, in-memory (tests), JMX (platform
  * MBeanServer — reference JmxMetricsReporter.java), and any user function
  * via [[Metrics.register]] with a custom implementation.
  */
trait MetricsReporter {
  def report(registry: MetricsRegistry): Unit
  def close(): Unit = ()
}

/** Reference ConsoleMetricsReporter.java analog. */
final class ConsoleMetricsReporter(out: String => Unit = Console.out.println)
    extends MetricsReporter {
  def report(r: MetricsRegistry): Unit =
    r.snapshot.foreach { case (k, v) => out(s"$k=$v") }
}

/** Reference InMemoryMetricsReporter.java analog — retains the last
  * snapshot for assertion.
  */
final class InMemoryMetricsReporter extends MetricsReporter {
  @volatile var last: Map[String, Long] = Map.empty
  def report(r: MetricsRegistry): Unit = last = r.snapshot.toMap
}

/** Reference JmxMetricsReporter.java analog: one dynamic MBean per table
  * under `graft.metrics:table=<name>`, metric names as read-only Long
  * attributes. Registering twice replaces the bean (re-sync safe).
  */
final class JmxMetricsReporter(tableName: String) extends MetricsReporter {
  import javax.management._
  private val server = java.lang.management.ManagementFactory.getPlatformMBeanServer
  private val objName = new ObjectName("graft.metrics", "table", ObjectName.quote(tableName))
  @volatile private var current: Map[String, Long] = Map.empty

  private object bean extends DynamicMBean {
    def getAttribute(name: String): Object =
      current.get(name).map(Long.box).getOrElse(throw new AttributeNotFoundException(name))
    def getAttributes(names: Array[String]): AttributeList = {
      val l = new AttributeList()
      names.foreach(n => current.get(n).foreach(v => l.add(new Attribute(n, Long.box(v)))))
      l
    }
    def setAttribute(a: Attribute): Unit = throw new UnsupportedOperationException
    def setAttributes(l: AttributeList): AttributeList = new AttributeList()
    def invoke(op: String, args: Array[Object], sig: Array[String]): Object =
      throw new UnsupportedOperationException
    def getMBeanInfo: MBeanInfo = {
      val attrs = current.keys.toArray.sorted.map(n =>
        new MBeanAttributeInfo(n, "java.lang.Long", n, true, false, false))
      new MBeanInfo(getClass.getName, s"graft metrics for $tableName",
        attrs, Array.empty, Array.empty, Array.empty)
    }
  }

  def report(r: MetricsRegistry): Unit = {
    current = r.snapshot.toMap
    if (!server.isRegistered(objName)) server.registerMBean(bean, objName)
  }
  override def close(): Unit =
    if (server.isRegistered(objName)) server.unregisterMBean(objName)
}

object Metrics {
  /** Table property gating publication (reference `hoodie.metrics.on`,
    * HoodieMetricsConfig.java — default false there and here; the replay
    * fold works regardless, the flag only controls the post-commit hook).
    */
  val OnProp = "graft.metrics.on"

  private val registries = new ConcurrentHashMap[String, MetricsRegistry]()
  private val reporters = new ConcurrentHashMap[String, List[MetricsReporter]]()

  def isOn(cfg: TableConfig): Boolean = cfg.props.get(OnProp).contains("true")

  /** The (JVM-wide) registry for the table at `basePath` — keyed by path,
    * not name, so two tables with one name never share counters.
    */
  def registryFor(t: GraftTable): MetricsRegistry =
    registries.computeIfAbsent(t.basePath.toString,
      _ => new MetricsRegistry(t.cfg.tableName))

  /** Attach a reporter; it fires after every refresh of this table. */
  def register(t: GraftTable, r: MetricsReporter): Unit =
    reporters.merge(t.basePath.toString, List(r), (a, b) => b ++ a)

  def unregisterAll(t: GraftTable): Unit =
    Option(reporters.remove(t.basePath.toString)).foreach(_.foreach(_.close()))

  /** Drop cached fold state (tests / table re-create under a reused path). */
  def reset(t: GraftTable): Unit = {
    registries.remove(t.basePath.toString)
    unregisterAll(t)
  }

  /** Fold all completed instants (archived first, then active) into a
    * fresh registry — the restart-recovery path. Pure function of the
    * timeline.
    */
  def replay(t: GraftTable): MetricsRegistry = {
    val r = new MetricsRegistry(t.cfg.tableName)
    val archived = t.timeline.archivedInstants()
      .filter(_._1.isCompleted).map { case (i, content) => (i, content) }
    val active = t.timeline.completedInstants()
      .map(i => (i, t.timeline.readContent(i)))
    (archived ++ active).sortBy(_._1.ts).foreach { case (i, c) => fold(r, i, c) }
    r.lastTs = (archived ++ active).map(_._1.ts).maxOption.getOrElse("")
    r
  }

  /** Post-action hook: refresh when the table opted in via the property
    * OR a registry already exists for it (API opt-in — registering a
    * reporter or calling refresh once keeps the table live).
    */
  def refreshIfOn(t: GraftTable): Unit =
    if (isOn(t.cfg) || registries.containsKey(t.basePath.toString)) { refresh(t); () }

  /** Incremental refresh of the table's live registry: folds only instants
    * newer than the cursor, then fires reporters. Called post-commit when
    * `graft.metrics.on=true`; safe to call any time.
    */
  def refresh(t: GraftTable): MetricsRegistry = {
    val r0 = registries.computeIfAbsent(t.basePath.toString, _ => replay(t))
    // fold + cursor advance serialize per registry: two concurrent callers
    // reading one lastTs cursor would fold the same fresh instant twice and
    // permanently inflate the cumulative gauges (breaking live == replay)
    val r = r0.synchronized {
      val fresh = t.timeline.completedInstants().filter(_.ts > r0.lastTs)
      // a rollback/restore REMOVES commit instants, so the incremental fold
      // would keep figures the surviving timeline no longer supports —
      // rebuild from scratch instead (rollbacks are rare; live == replay is
      // the subsystem's invariant)
      if (fresh.exists(i => i.action == Action.Rollback || i.action == Action.Restore)) {
        val rebuilt = replay(t)
        registries.put(t.basePath.toString, rebuilt)
        rebuilt
      } else {
        fresh.sortBy(_.ts).foreach(i => fold(r0, i, t.timeline.readContent(i)))
        fresh.map(_.ts).maxOption.foreach(ts => r0.lastTs = ts)
        r0
      }
    }
    Option(reporters.get(t.basePath.toString)).foreach(_.foreach(_.report(r)))
    r
  }

  /** Fold one completed instant into the registry (updateCommitMetrics /
    * updateCleanMetrics / updateRollbackMetrics analog).
    */
  private def fold(r: MetricsRegistry, i: GraftInstant, content: String): Unit =
    i.action match {
      case a if Action.DataActions.contains(a) =>
        val md = CommitMetadata.fromJson(content)
        val groups = md.writeStats.map(s => s"${s.partitionPath}/${s.fileId}").distinct
        val newGroups = groups.count(!r.seenGroups.contains(_))
        groups.foreach(r.seenGroups.add)
        r.setGauge(s"$a.totalRecordsWritten", md.writeStats.map(_.numWrites).sum)
        r.setGauge(s"$a.totalDeletes", md.writeStats.map(_.numDeletes).sum)
        r.setGauge(s"$a.totalBytesWritten", md.writeStats.map(_.fileSizeInBytes).sum)
        r.setGauge(s"$a.totalPartitionsWritten", md.partitions.size.toLong)
        r.setGauge(s"$a.totalFilesWritten", md.writeStats.size.toLong)
        r.setGauge(s"$a.totalFilesInsert", newGroups.toLong)
        r.setGauge(s"$a.totalFilesUpdate", (groups.size - newGroups).toLong)
        r.setGauge(s"$a.commitEpochMs", InstantTime.toEpochMilli(i.ts))
        md.extraMetadata.get(GraftTable.DurationMsKey)
          .foreach(d => r.setGauge(s"$a.duration", d.toLong))
        r.inc(s"$a.count")
        r.inc(s"$a.totalRecordsCum", md.writeStats.map(_.numWrites).sum)
      case Action.Clean =>
        val md = Json.read[CleanMetadata](content)
        r.setGauge("clean.numFilesDeleted", md.deletedPaths.size.toLong)
        r.inc("clean.count")
      case Action.Rollback | Action.Restore =>
        val md = Json.read[RollbackMetadata](content)
        r.setGauge(s"${i.action}.numFilesDeleted", md.deletedPaths.size.toLong)
        r.inc(s"${i.action}.count")
      case _ => () // savepoints carry no write work
    }
}
