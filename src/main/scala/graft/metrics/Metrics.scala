package graft.metrics

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Metrics & reporters — the reference's instrumentation surface
  * (`src/metrics/metrics.hpp` entry accumulation,
  * `src/metrics/reps/basic_reporter.hpp` / `file_reporter.hpp` output
  * formats). Engine-level counters that GraphChi accumulates by hand
  * (task timings, I/O volumes) are harvested here from the Spark
  * scheduler bus via [[SparkMetricsListener]] — the Spark-first stand-in
  * for the reference's per-engine instrumentation, with the same
  * (value, count, min, max, avg) entry shape and the same
  * Numeric/Timings/Other report grouping.
  */
final class Metrics(val name: String) {

  /** One accumulating entry — `metrics_entry` (`metrics.hpp:52-100`):
    * latest/cumulative value, count, min, max.
    */
  final case class Entry(var value: Double = 0.0, var cum: Double = 0.0,
                         var count: Long = 0L,
                         var min: Double = Double.MaxValue,
                         var max: Double = Double.MinValue,
                         var isTime: Boolean = false)

  private val numeric = mutable.LinkedHashMap.empty[String, Entry]
  private val strings = mutable.LinkedHashMap.empty[String, String]

  def add(key: String, v: Double, isTime: Boolean = false): Unit = synchronized {
    val e = numeric.getOrElseUpdate(key, Entry(isTime = isTime))
    e.value += v; e.cum += v; e.count += 1
    e.min = math.min(e.min, v); e.max = math.max(e.max, v)
  }

  def set(key: String, v: Double): Unit = synchronized {
    val e = numeric.getOrElseUpdate(key, Entry())
    e.value = v; e.cum += v; e.count += 1
    e.min = math.min(e.min, v); e.max = math.max(e.max, v)
  }

  def setString(key: String, v: String): Unit = synchronized { strings(key) = v }

  def entries: Seq[(String, Entry)] = synchronized { numeric.toSeq }
  def stringEntries: Seq[(String, String)] = synchronized { strings.toSeq }
}

/** Scheduler-bus harvester: job/stage/task counts, task runtime & GC,
  * shuffle read/write volume, input/output volume, memory spill — the
  * counters the reference accumulates per engine run
  * (`graphchi_engine.hpp` runtime/io metrics) plus the shuffle-centric
  * ones that only exist on a distributed engine.
  */
final class SparkMetricsListener(name: String = "graft") extends SparkListener {
  val metrics = new Metrics(name)

  override def onJobEnd(end: SparkListenerJobEnd): Unit =
    metrics.add("jobs", 1)

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    metrics.add("stages", 1)
    metrics.add("stage_runtime", sc.stageInfo.taskMetrics.executorRunTime / 1e3,
      isTime = true)
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val tm = te.taskMetrics
    if (tm != null) {
      metrics.add("tasks", 1)
      metrics.add("task_runtime", tm.executorRunTime / 1e3, isTime = true)
      metrics.add("task_gc_time", tm.jvmGCTime / 1e3, isTime = true)
      metrics.add("shuffle_read_bytes", tm.shuffleReadMetrics.totalBytesRead.toDouble)
      metrics.add("shuffle_write_bytes", tm.shuffleWriteMetrics.bytesWritten.toDouble)
      metrics.add("input_bytes", tm.inputMetrics.bytesRead.toDouble)
      metrics.add("output_bytes", tm.outputMetrics.bytesWritten.toDouble)
      metrics.add("memory_spill_bytes", tm.memoryBytesSpilled.toDouble)
    }
    // Application accumulators in the graft namespace (e.g. the LSH
    // bucket-cap drop counters, Dedup.DroppedBuckets) surface in the
    // engine report automatically: sum the per-task deltas by name.
    te.taskInfo.accumulables.foreach { ai =>
      if (ai.name.exists(_.startsWith("graft.")))
        ai.update.foreach {
          case l: java.lang.Long => metrics.add(ai.name.get, l.toDouble)
          case _ =>
        }
    }
  }
}

object SparkMetricsListener {
  /** Attach a fresh listener to the session's scheduler bus. */
  def install(spark: SparkSession, name: String = "graft"): SparkMetricsListener = {
    val l = new SparkMetricsListener(name)
    spark.sparkContext.addSparkListener(l)
    l
  }
}

object MetricsReporter {

  /** `basic_reporter.hpp` format: `=== REPORT FOR name ===` header, then
    * [Numeric] / [Timings] / [Other] groups with
    * `value (count, min, max, avg)` lines.
    */
  def basic(m: Metrics): String = {
    val sb = new StringBuilder(s" === REPORT FOR ${m.name} ===\n")
    def fmt(selected: Seq[(String, m.Entry)], unit: String): Unit =
      selected.foreach { case (k, e) =>
        val agg = if (e.count > 1)
          f"\t(count: ${e.count}, min: ${e.min}%.6g$unit, max: ${e.max}%.6g$unit, avg: ${e.cum / e.count}%.6g$unit)"
        else ""
        sb.append(f"$k:\t\t${e.value}%.6g$unit$agg\n")
      }
    val (times, nums) = m.entries.partition(_._2.isTime)
    if (nums.nonEmpty) { sb.append("[Numeric]\n"); fmt(nums, "") }
    if (times.nonEmpty) { sb.append("[Timings]\n"); fmt(times, "s") }
    if (m.stringEntries.nonEmpty) {
      sb.append("[Other]\n")
      m.stringEntries.foreach { case (k, v) => sb.append(s"$k:\t\t$v\n") }
    }
    sb.toString
  }

  /** One flat JSON object: per-key {value, count, min, max, avg} maps
    * plus string entries — the machine-readable map the reference's
    * file/html reporters approximate.
    */
  def json(m: Metrics): String = {
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val nums = m.entries.map { case (k, e) =>
      s"${jstr(k)}:{" +
        s""""value":${e.value},"count":${e.count},"min":${e.min},""" +
        s""""max":${e.max},"avg":${e.cum / math.max(1, e.count)}}"""
    }
    val strs = m.stringEntries.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
    (Seq(s""""name":${jstr(m.name)}""") ++ nums ++ strs)
      .mkString("{", ",", "}")
  }

  /** `file_reporter.hpp` format: `key=value` lines written to a file. */
  def file(m: Metrics, path: String): Unit = {
    val lines = m.entries.map { case (k, e) => s"${m.name}.$k=${e.value}" } ++
      m.stringEntries.map { case (k, v) => s"${m.name}.$k=$v" }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n"))
  }
}
