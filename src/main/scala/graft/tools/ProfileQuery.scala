package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock breakdown of one catalog query — the measurement
  * harness behind the optimization rounds (guide §1: measure first).
  *
  * Runs `<name>` once to warm (codegen/page cache), then once instrumented:
  * a SparkListener records every job's [start, end] and its call site, and
  * the gaps BETWEEN jobs are attributed to driver-side work (planning,
  * footer stats, timeline IO). Output: one line per job plus a gap line per
  * inter-job hole ≥ 20 ms, then totals. Usage:
  *
  *   sbt "runMain graft.tools.ProfileQuery /root/testdata/sf0.1 <query> [iters]"
  */
object ProfileQuery {
  final case class JobSpan(id: Int, start: Long, var end: Long, site: String,
      var stages: List[(String, Long, Int)] = Nil)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B aid: extra session confs via SPARK_GRAFT_EXTRA_CONF="k=v;k=v" —
    // lets one binary profile both sides of a conf-gated engine change
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val fn = graft.SparkEntry.queries(name)

    // warm: codegen + page cache + ICU init
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobSpan]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties.getProperty("callSite.short")).getOrElse("?")
        jobs.put(j.jobId, JobSpan(j.jobId, j.time, j.time, site))
        order.add(j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobs.get(j.jobId); if (s != null) s.end = j.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        // attach to the owning job by id range (local mode: stages belong
        // to the most recent job that contains them)
        val jid = order.toArray.map(_.asInstanceOf[Int]).reverse
          .find(id => jobs.get(id) != null && info.submissionTime.exists(_ >= jobs.get(id).start))
        jid.foreach { id =>
          val s = jobs.get(id)
          val dur = (for (a <- info.submissionTime; b <- info.completionTime) yield b - a).getOrElse(0L)
          s.synchronized { s.stages = (info.name.takeWhile(_ != '\n'), dur, info.numTasks) :: s.stages }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // gap attribution: sample the query thread's stack every 10 ms while NO
    // job is running; bucket by the deepest "interesting" frame
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { running.incrementAndGet(); () }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { running.decrementAndGet(); () }
    })
    val qThread = Thread.currentThread()
    val gapBuckets = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        if (running.get() == 0) {
          val st = qThread.getStackTrace
          if (st.nonEmpty) {
            val interesting = st.find { e =>
              val c = e.getClassName
              c.startsWith("graft.") ||
              c.contains("catalyst.optimizer") || c.contains("catalyst.analysis") ||
              c.contains("QueryExecution") || c.contains("CodeGenerator") ||
              c.contains("ParquetFileReader") || c.contains("FileSystem") ||
              c.contains("adaptive") || c.contains("codegen")
            }.orElse(st.headOption)
            val key = interesting.map(e => s"${e.getClassName.split('.').takeRight(2).mkString(".")}.${e.getMethodName}").getOrElse("?")
            gapBuckets.merge(key, 10L, (a, b) => a + b)
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime()
      println(f"[profile] iter $i total ${(t1 - t0) / 1e9}%.3f s")
    }
    sampling = false
    spark.sparkContext.removeSparkListener(listener)
    locally {
      import scala.jdk.CollectionConverters._
      val top = gapBuckets.asScala.toSeq.sortBy(-_._2).take(25)
      println("[profile] driver-gap stack buckets (ms sampled @10ms):")
      top.foreach { case (k, v) => println(f"[profile]   $v%6d ms  $k") }
    }
    Thread.sleep(300) // let listener drain

    val spans = order.toArray.map(_.asInstanceOf[Int]).map(jobs.get).filter(_ != null)
    if (spans.nonEmpty) {
      val t0 = spans.head.start
      var prevEnd = t0
      println(f"[profile] ${spans.length} jobs; per-job (start offset, dur) + driver gaps >= 20ms:")
      for (s <- spans.sortBy(_.start)) {
        val gap = s.start - prevEnd
        if (gap >= 20) println(f"[profile]   --- driver gap ${gap}%5d ms")
        val stages = s.stages.reverse.map { case (n, d, t) => s"$n:${d}ms/${t}t" }.mkString(" | ")
        println(f"[profile]   job ${s.id}%3d +${s.start - t0}%6d ms  dur ${s.end - s.start}%5d ms  ${s.site}  [$stages]")
        prevEnd = math.max(prevEnd, s.end)
      }
      val jobTime = spans.map(s => s.end - s.start).sum
      println(f"[profile] sum(job dur) = ${jobTime} ms; wall (first start -> last end) = ${prevEnd - t0} ms")
    }
    spark.stop()
  }
}
