package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Registry of named `graft.*` long accumulators — the engine-counter
  * surface the reference exposes through `metrics.hpp` entry maps. Any
  * accumulator registered here is harvested off the scheduler bus by
  * [[SparkMetricsListener]] (per-task deltas summed by name), so an
  * operator's observability counters land in the same report as the
  * engine's own (the surface q92 oracles). One accumulator per
  * (context, name); values accumulate across calls — read deltas around
  * a job, or reset between runs. These are observability counters, not
  * exactly-once statistics: task retries/speculation over-count
  * (standard non-result-stage accumulator semantics).
  */
object NamedAcc {
  private val regs =
    new ConcurrentHashMap[(SparkContext, String), LongAccumulator]
  // One cleanup listener per CONTEXT, not per (context, name): N counter
  // names on one context would otherwise add N redundant listeners to
  // the scheduler bus.
  private val hooked = new ConcurrentHashMap[SparkContext, java.lang.Boolean]

  /** The accumulator `name` for this context, created on first use.
    * First registration for a context also hooks application end so the
    * map never retains accumulators of stopped contexts (a slow leak
    * for harnesses cycling contexts).
    */
  def of(sc: SparkContext, name: String): LongAccumulator =
    regs.computeIfAbsent((sc, name), { case (c, n) =>
      hooked.computeIfAbsent(c, c2 => {
        c2.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            regs.keySet.removeIf(_._1 == c2)
            hooked.remove(c2)
          }
        })
        java.lang.Boolean.TRUE
      })
      c.longAccumulator(n)
    })
}
