package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("GraphState: insert, tombstone-delete, compaction") {
    val base = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val st = new EdgeStream.GraphState(spark, base)
    // insert batch
    st.applyDelta(Seq((3L, 1L, false)).toDF("src", "dst", "deleted"))
    assert(st.liveEdges.count() == 3)
    // delete batch (tombstone)
    st.applyDelta(Seq((1L, 2L, true)).toDF("src", "dst", "deleted"))
    assert(st.liveEdges.count() == 2)
    // three more no-op batches trigger compaction at batch 5
    (1 to 3).foreach(_ => st.applyDelta(
      Seq.empty[(Long, Long, Boolean)].toDF("src", "dst", "deleted")))
    assert(st.batches == 5)
    assert(st.edges.filter(col("deleted")).count() == 0) // compacted away
    assert(st.liveEdges.count() == 2)
  }

  test("GraphState: replaying the same delta batch is set-idempotent (foreachBatch retry)") {
    // foreachBatch delivers at-least-once on retry: a replayed INSERT
    // batch duplicates rows in the buffered multiset, but the live edge
    // SET is unchanged, and compaction's distinct() collapses the
    // physical duplicates — so a retried micro-batch can never corrupt
    // the graph, only delay compaction by one cycle.
    val base = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val st = new EdgeStream.GraphState(spark, base)
    val batch = Seq((3L, 1L, false), (1L, 2L, true)).toDF("src", "dst", "deleted")
    st.applyDelta(batch, compactEvery = 3)
    val liveOnce = st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    st.applyDelta(batch, compactEvery = 3) // the retry
    val liveTwice = st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveTwice == liveOnce)
    assert(liveOnce == Set((2L, 3L), (3L, 1L)))
    // third batch compacts: tombstones AND replay duplicates both vanish
    st.applyDelta(Seq.empty[(Long, Long, Boolean)].toDF("src", "dst", "deleted"),
      compactEvery = 3)
    assert(st.edges.count() == 2) // physically deduped, not just logically
    assert(st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == liveOnce)
  }

  test("GraphState: replay ACROSS a compaction boundary is set-idempotent") {
    // The harder retry case: a batch is delivered, compaction runs (its
    // tombstoned edges are physically gone, duplicates collapsed), and
    // THEN the same batch replays. The replayed delete must be a no-op
    // against the compacted table (its target row no longer exists to
    // re-tombstone), and the replayed insert must only re-add rows that
    // are already logically present — live edge SET unchanged either
    // side of the boundary.
    val base = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val st = new EdgeStream.GraphState(spark, base)
    val batch = Seq((3L, 1L, false), (1L, 2L, true)).toDF("src", "dst", "deleted")
    st.applyDelta(batch, compactEvery = 2)                     // batch 1
    st.applyDelta(Seq.empty[(Long, Long, Boolean)]
      .toDF("src", "dst", "deleted"), compactEvery = 2)        // batch 2: compacts
    assert(st.edges.filter(col("deleted")).count() == 0)
    val compacted = st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compacted == Set((2L, 3L), (3L, 1L)))
    st.applyDelta(batch, compactEvery = 2)                     // batch 3: the replay
    assert(st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == compacted)
    st.applyDelta(Seq.empty[(Long, Long, Boolean)]
      .toDF("src", "dst", "deleted"), compactEvery = 2)        // batch 4: compacts again
    assert(st.edges.count() == 2) // replay duplicates physically collapsed
    assert(st.liveEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == compacted)
  }

  test("streamingPageRank processes edge-delta files incrementally") {
    val dir = Files.createTempDirectory("graftstream")
    val base = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val st = new EdgeStream.GraphState(spark, base)
    val q = EdgeStream.streamingPageRank(spark, st, dir.toString, prIters = 2)
    try {
      Seq((2L, 3L, false), (3L, 1L, false)).toDF("src", "dst", "deleted")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      assert(st.liveEdges.count() == 4)
      assert(st.ranks.count() == 3)
    } finally q.stop()
  }

  test("streamingDedupCounts drops a replayed batch across micro-batches") {
    // at-least-once delivery: batch 2 replays batch 1's events (same
    // event ids, in-watermark timestamps). Counts must see each id once.
    val dir = Files.createTempDirectory("graftdedup")
    val mk = (rows: Seq[(Long, Long, String)]) => rows
      .toDF("event_id", "user_id", "ts0")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts0")).as("ts"))
    val b1 = mk(Seq((1L, 10L, "2026-01-01 10:00:00"),
      (2L, 10L, "2026-01-01 10:01:00"), (3L, 20L, "2026-01-01 10:02:00")))
    b1.coalesce(1).write.mode("append").parquet(dir.toString)
    val src = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = Sessionize.streamingDedupCounts(src, watermark = "1 hour")
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_dedup_spec").start()
    try {
      q.processAllAvailable()
      // replay batch 1 plus one genuinely new event
      b1.union(mk(Seq((4L, 20L, "2026-01-01 10:03:00"))))
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val got = spark.table("graft_dedup_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == Map(10L -> 2L, 20L -> 2L))
    } finally q.stop()
  }

  test("windowedEventCounts compiles against a batch frame semantically") {
    // batch-mode equivalent of the streaming aggregation (same plan shape)
    val ev = Seq(("2026-01-01 10:05:00", "click", 1.0),
                 ("2026-01-01 10:45:00", "click", 2.0),
                 ("2026-01-01 11:05:00", "view", 3.0))
      .toDF("ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = EdgeStream.windowedEventCounts(ev, "1 hour")
      .select(col("window.start").cast("string").as("start"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2026-01-01 10:00:00", "click", 2L),
      ("2026-01-01 11:00:00", "view", 1L)))
  }
}
