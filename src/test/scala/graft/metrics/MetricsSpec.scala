package graft.metrics

import graft.SparkSpec

/** Metrics reporters (`src/metrics/metrics.hpp`, `src/metrics/reps`): the
  * scheduler-bus listener must harvest real task/shuffle counters, and
  * each reporter must emit its format.
  */
class MetricsSpec extends SparkSpec {

  test("listener harvests job/stage/task and shuffle counters") {
    val l = SparkMetricsListener.install(spark, "spec")
    import spark.implicits._
    // a shuffle-bearing job so shuffle counters move
    (1L to 10000L).toDF("id").repartition(8)
      .groupBy(($"id" % 7).as("k")).count().collect()
    // listener bus is async; poll until the task events land
    val deadline = System.nanoTime() + 30e9.toLong
    while (System.nanoTime() < deadline &&
      !l.metrics.entries.toMap.contains("tasks")) Thread.sleep(100)
    val e = l.metrics.entries.toMap
    assert(e("jobs").value >= 1.0)
    assert(e("tasks").count >= 8)
    assert(e("shuffle_write_bytes").value > 0)
    assert(e("task_runtime").isTime)
    spark.sparkContext.removeSparkListener(l)
  }

  test("listener surfaces graft.* accumulators (LSH bucket-cap drops)") {
    val l = SparkMetricsListener.install(spark, "spec-acc")
    import spark.implicits._
    graft.text.Dedup.DroppedBuckets.reset(spark.sparkContext)
    val docs = ((1L to 30L).map(i => (i, "identical boilerplate body")) ++
      Seq((100L, "something else entirely here"))).toDF("doc_id", "text")
    graft.text.Dedup.minHashDuplicatePairs(docs, "doc_id", "text",
      maxBucketSize = 10).count()
    org.apache.spark.sql.GraftShims.waitListenerBus(spark)
    val e = l.metrics.entries.toMap
    assert(e.contains("graft.lsh.dropped_rows"),
      s"expected drop counters in ${e.keys.toSeq.sorted}")
    // multiples, not exact values: the counting subtree sits on both
    // sides of the self-join and only exchange reuse single-counts it
    val buckets = e("graft.lsh.dropped_buckets").value
    assert(buckets > 0 && buckets % 8.0 == 0.0, s"buckets $buckets")
    assert(e("graft.lsh.dropped_rows").value == buckets * 30.0)
    spark.sparkContext.removeSparkListener(l)
  }

  test("reporters: basic grouping, json shape, file key=value") {
    val m = new Metrics("t")
    m.add("edges", 5); m.add("edges", 7)
    m.add("runtime", 1.5, isTime = true)
    m.setString("engine", "graft")
    val basic = MetricsReporter.basic(m)
    assert(basic.contains("=== REPORT FOR t ==="))
    assert(basic.indexOf("[Numeric]") < basic.indexOf("[Timings]"))
    assert(basic.contains("count: 2"))
    val js = MetricsReporter.json(m)
    assert(js.contains("\"edges\":{\"value\":12.0,\"count\":2,\"min\":5.0,\"max\":7.0"))
    assert(js.contains("\"engine\":\"graft\""))
    val f = java.nio.file.Files.createTempFile("graft_metrics", ".txt")
    MetricsReporter.file(m, f.toString)
    val lines = java.nio.file.Files.readString(f)
    assert(lines.contains("t.edges=12.0") && lines.contains("t.engine=graft"))
  }
}
