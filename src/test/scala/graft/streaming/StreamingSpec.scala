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
